#!/usr/bin/env python
"""A/B microbench: one RN50 bottleneck block, fold_bn3 off vs on.

Times forward and forward+backward of a single layer1-shaped block
(bs 256, 56x56, 256->64->64->256) with both variants compiled in the
same process and timed interleaved, so tunnel/host drift cancels.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from _bench import fence, timed  # noqa: E402  (shared fenced timing)



def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hw", type=int, default=56)
    ap.add_argument("--planes", type=int, default=64)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--in-ch", type=int, default=0,
                    help="input channels (default planes*4)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparsify_clip_tpu.models.resnet import Bottleneck

    dtype = jnp.bfloat16
    in_ch = args.in_ch or args.planes * 4
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, args.hw, args.hw, in_ch)
        ),
        dtype,
    )

    fns = {}
    for fold in (False, True):
        model = Bottleneck(
            planes=args.planes, stride=args.stride, dtype=dtype, fold_bn3=fold)
        variables = model.init(jax.random.PRNGKey(0), x[:2], train=True)

        @jax.jit
        def fwd(v, x, model=model):
            y, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def fwdbwd(v, x, model=model):
            def loss(p):
                y, _ = model.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32))

            l, g = jax.value_and_grad(loss)(v["params"])
            return l + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                g, jnp.float32(0.0))

        # warm both
        fence(fwd(variables, x))
        fence(fwdbwd(variables, x))
        fns[fold] = (fwd, fwdbwd, variables)

    results = {False: {"fwd": [], "fwdbwd": []}, True: {"fwd": [], "fwdbwd": []}}
    for _ in range(args.rounds):
        for fold in (False, True):
            fwd, fwdbwd, variables = fns[fold]
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fwd(variables, x)
            fence(out)
            results[fold]["fwd"].append((time.perf_counter() - t0) / args.steps)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fwdbwd(variables, x)
            fence(out)
            results[fold]["fwdbwd"].append((time.perf_counter() - t0) / args.steps)

    out = {"batch": args.batch, "hw": args.hw, "planes": args.planes}
    for fold in (False, True):
        key = "folded" if fold else "plain"
        out[key] = {
            "fwd_ms": round(min(results[fold]["fwd"]) * 1e3, 2),
            "fwdbwd_ms": round(min(results[fold]["fwdbwd"]) * 1e3, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
