#!/usr/bin/env python
"""Per-shape conv microbench for the RN50 tower's hot convolutions.

Times each conv shape with a chain of dependent convs inside ONE jit
dispatch (same anti-dispatch-overhead trick as matmul_roofline.py) and
reports sustained TFLOP/s, fwd and — separately — the dX and dW
transposed convs at the same shape.  This attributes layer1/layer2's
~32 TF effective rate to specific ops before any kernel work.

Usage: python scripts/bench_convs.py [--batch 256] [--chain 8]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from _bench import fence, timed  # noqa: E402  (shared fenced timing)



def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, chain = args.batch, args.chain
    # (name, HW, Cin, Cout, k)
    shapes = [
        ("l1.conv1 56x256->64 1x1", 56, 256, 64, 1),
        ("l1.conv2 56x64->64 3x3", 56, 64, 64, 3),
        ("l1.conv3 56x64->256 1x1", 56, 64, 256, 1),
        ("l2.conv2 28x128->128 3x3", 28, 128, 128, 3),
        ("l2.b0.conv2 56x128->128 3x3", 56, 128, 128, 3),
        ("l3.conv2 14x256->256 3x3", 14, 256, 256, 3),
        ("stem.conv2 112x32->32 3x3", 112, 32, 32, 3),
    ]
    dn = ("NHWC", "HWIO", "NHWC")
    out = {"batch": B, "chain": chain, "backend": jax.default_backend(),
           "convs": {}}
    rng = np.random.default_rng(0)

    for name, hw, cin, cout, k in shapes:
        x = jnp.asarray(
            rng.standard_normal((B, hw, hw, cin)) * 0.1, jnp.bfloat16)
        # forward: chain convs Cin->Cout->Cin-> ... to stay in-jit
        w_f = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05,
                          jnp.bfloat16)
        w_b = jnp.asarray(rng.standard_normal((k, k, cout, cin)) * 0.05,
                          jnp.bfloat16)
        pad = "SAME" if k > 1 else "VALID"

        @jax.jit
        def fwd(x, w_f=w_f, w_b=w_b, pad=pad):
            acc = x
            for _ in range(chain):
                h = jax.lax.conv_general_dilated(
                    acc, w_f, (1, 1), pad, dimension_numbers=dn)
                acc = jax.lax.conv_general_dilated(
                    h, w_b, (1, 1), pad, dimension_numbers=dn) * 0.5
            return jnp.sum(acc.astype(jnp.float32))

        # dW shape: contract batch+spatial of x against cotangent g.
        # chain DISTINCT pre-built cotangents so XLA cannot CSE the
        # iterations — perturbing x inside the timed loop instead would
        # add a read+write of x per iteration and understate the
        # HBM-bound 1×1 rates this script exists to attribute.
        gs = [
            jnp.asarray(
                rng.standard_normal((B, hw, hw, cout)) * 0.1, jnp.bfloat16)
            for _ in range(chain)
        ]

        @jax.jit
        def dw(x, gs, k=k, pad=pad):
            acc = jnp.zeros((), jnp.float32)
            for gg in gs:
                # dW via the transpose conv XLA autodiff emits (the
                # objective is linear in w, so grad at zeros == dW):
                grad = jax.grad(
                    lambda w: jnp.sum(
                        jax.lax.conv_general_dilated(
                            x, w, (1, 1), pad, dimension_numbers=dn) * gg
                    )
                )(jnp.zeros((k, k, x.shape[-1], gg.shape[-1]), jnp.bfloat16))
                acc = acc + jnp.sum(grad.astype(jnp.float32))
            return acc

        n_out = B * hw * hw
        flops_one = 2 * n_out * (k * k * cin) * cout
        t_f = timed(fwd, x, steps=args.steps, warmup=1)
        tf_fwd = flops_one * 2 * chain / t_f / 1e12  # 2 convs per link
        t_w = timed(dw, x, gs, steps=args.steps, warmup=1)
        tf_dw = flops_one * chain / t_w / 1e12
        out["convs"][name] = {
            "fwd_tf": round(tf_fwd, 1),
            "dw_tf": round(tf_dw, 1),
        }
        print(json.dumps({name: out["convs"][name]}), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
