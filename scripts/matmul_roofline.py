#!/usr/bin/env python
"""True per-shape sustained matmul ceilings: one dispatch, many matmuls.

The per-dispatch tunnel overhead (~3 ms under axon) poisons small-chain
probes, so each shape runs `iters` dependent matmuls inside a single
jitted lax.fori_loop and is fenced with a scalar read.  Dependent
chains measure the rate a transformer's serial layer stack actually
sees; `independent` adds an 8-wide independent variant to bound any
dependency penalty.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    import jax
    import jax.numpy as jnp
    from jax import lax

    SHAPES = [
        (12800, 768, 768),    # ViT qkv/out-proj (B*L=256*50)
        (12800, 768, 3072),   # ViT mlp
        (19712, 512, 512),    # text qkv/out-proj (256*77)
        (19712, 512, 2048),   # text mlp
        (768, 12800, 768),    # dW shape: act.T @ dout
        (4096, 4096, 4096),   # square reference
    ]
    ITERS = 64
    out = {"backend": jax.default_backend(), "iters": ITERS}

    for (m, k, n) in SHAPES:
        a = jnp.full((m, k), 1.0 / k, jnp.bfloat16)
        b = jnp.full((k, n), 1.0, jnp.bfloat16)
        bt = jnp.full((n, k), 1.0 / n, jnp.bfloat16)

        @jax.jit
        def chain(a, b, bt):
            def body(_, x):
                y = x @ b          # (m,k)@(k,n) -> (m,n)
                return (y @ bt).astype(jnp.bfloat16)  # back to (m,k)

            x = lax.fori_loop(0, ITERS, body, a)
            return x.sum()

        # warmup/compile
        float(chain(a, b, bt))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            s = chain(a, b, bt)
        float(s)
        t = (time.perf_counter() - t0) / reps
        flops = 2 * m * k * n * ITERS + 2 * m * n * k * ITERS
        out[f"{m}x{k}x{n}"] = round(flops / t / 1e12, 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
