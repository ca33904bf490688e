#!/usr/bin/env python
"""int8-vs-bf16 MXU throughput probe (serving-quantization scoping).

The v5e datasheet rates int8 at 2× the bf16 MXU throughput; this
measures what XLA actually delivers for the encoder's matmul shapes,
with the same chained-in-one-dispatch methodology as
``matmul_roofline.py`` (the ~3 ms tunnel dispatch poisons naive
probes).  Each hop requantizes the accumulator back to the operand
dtype (int32→int8 / fp32→bf16) because that is what a real quantized
layer stack must do between layers — both dtypes pay it, so the ratio
is the decision number.

The measured answer (BASELINE.md "int8 serving") is 1.08–1.53×,
shape-dependent, which is why an int8 serving tower was scoped out:
after dynamic activation quantization overhead the end-to-end encode
win would be well under the ratio's ceiling.
"""

from __future__ import annotations

import json
import time

import _bench  # noqa: F401  (side effect: repo root on sys.path)


def bench(dtype_name, m, k, n, iters=64):
    import jax
    import jax.numpy as jnp
    from jax import lax

    if dtype_name == "int8":
        dtype, acc = jnp.int8, jnp.int32
        a = jnp.ones((m, k), dtype)
        b = jnp.ones((k, n), dtype)
        bt = jnp.ones((n, k), dtype)
    else:
        dtype, acc = jnp.bfloat16, jnp.float32
        a = jnp.full((m, k), 1.0 / k, dtype)
        b = jnp.full((k, n), 1.0, dtype)
        bt = jnp.full((n, k), 1.0 / n, dtype)

    @jax.jit
    def chain(a, b, bt):
        def body(_, x):
            y = lax.dot_general(
                x, b, (((1,), (0,)), ((), ())), preferred_element_type=acc)
            z = lax.dot_general(
                y.astype(dtype), bt, (((1,), (0,)), ((), ())),
                preferred_element_type=acc)
            return z.astype(dtype)
        return lax.fori_loop(0, iters, body, a).astype(jnp.float32).sum()

    float(chain(a, b, bt))  # compile + warm
    t0 = time.perf_counter()
    float(chain(a, b, bt))  # device→host scalar read = the honest fence
    dt = time.perf_counter() - t0
    return 2 * m * k * n * 2 * iters / dt / 1e12


def main():
    import jax

    shapes = [
        (12800, 768, 768),    # ViT-B qkv/out-proj (B*L = 256*50)
        (12800, 768, 3072),   # ViT-B mlp
        (4096, 4096, 4096),   # square reference
    ]
    out = {"backend": jax.default_backend(), "shapes": {}}
    for m, k, n in shapes:
        bf = bench("bf16", m, k, n)
        i8 = bench("int8", m, k, n)
        row = {"bf16_tflops": round(bf, 1), "int8_tops": round(i8, 1),
               "ratio": round(i8 / bf, 2)}
        out["shapes"][f"{m}x{k}x{n}"] = row
        print(json.dumps({f"{m}x{k}x{n}": row}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
