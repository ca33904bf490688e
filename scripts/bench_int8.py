#!/usr/bin/env python
"""int8-vs-bf16 MXU throughput probe (serving-quantization scoping).

The v5e datasheet rates int8 at 2× the bf16 MXU throughput; this
measures what XLA actually delivers for the encoder's matmul shapes,
with the same chained-in-one-dispatch methodology as
``matmul_roofline.py`` (the ~3 ms tunnel dispatch poisons naive
probes).  Each hop re-quantizes the accumulator back to the operand
dtype the way a real stack does between layers: the bf16 hop is a
plain downcast (all a bf16 stack pays), the int8 hop is genuine
DYNAMIC per-tensor quantization — fp32 abs-max reduction, scale,
clamp to [-127, 127], round, cast — because a wrapping
``astype(int8)`` is not a requantize (on all-ones data it collapses
the chain to zeros: 768 ≡ 0 mod 256), and a static scale only fits
the first hop's distribution (after one requant the operand std is
~33, so a fixed 5/√k scale saturates every later hop to ±127).  The
abs-max scale keeps every hop spread AND charges int8 the reduction
a real dynamic-quant serving stack pays per layer.

The measured answer (BASELINE.md "int8 serving") is ~1.1–1.6×,
shape-dependent, which is why an int8 serving tower was scoped out:
after per-layer dynamic activation quantization and accuracy cost the
end-to-end encode win would be well under the ratio's ceiling.
"""

from __future__ import annotations

import json
import time

import numpy as np

import _bench  # noqa: F401  (side effect: repo root on sys.path)
from _bench import wait_for_backend


def bench(dtype_name, m, k, n, iters=64):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    if dtype_name == "int8":
        dtype, acc = jnp.int8, jnp.int32
        a = jnp.asarray(rng.integers(-4, 5, (m, k)), dtype)
        b = jnp.asarray(rng.integers(-4, 5, (k, n)), dtype)
        bt = jnp.asarray(rng.integers(-4, 5, (n, k)), dtype)

        def requant(y):
            # dynamic per-tensor quantization: abs-max → [-127, 127].
            # Scale-free across hops (whatever the accumulator's spread,
            # the output uses the full int8 range), and it charges int8
            # the per-layer reduction a real dynamic-quant stack pays.
            yf = y.astype(jnp.float32)
            s = 127.0 / (jnp.max(jnp.abs(yf)) + 1e-6)
            return jnp.round(jnp.clip(yf * s, -127.0, 127.0)).astype(dtype)
    else:
        dtype, acc = jnp.bfloat16, jnp.float32
        a = jnp.asarray(rng.standard_normal((m, k)) / np.sqrt(k), dtype)
        b = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), dtype)
        bt = jnp.asarray(rng.standard_normal((n, k)) / np.sqrt(n), dtype)

        def requant(y):
            return y.astype(dtype)  # bf16 inter-layer cost is the downcast

    @jax.jit
    def chain(a, b, bt):
        def body(_, x):
            y = lax.dot_general(
                x, b, (((1,), (0,)), ((), ())), preferred_element_type=acc)
            z = lax.dot_general(
                requant(y), bt, (((1,), (0,)), ((), ())),
                preferred_element_type=acc)
            return requant(z)
        return lax.fori_loop(0, iters, body, a).astype(jnp.float32).sum()

    float(chain(a, b, bt))  # compile + warm
    t0 = time.perf_counter()
    float(chain(a, b, bt))  # device→host scalar read = the honest fence
    dt = time.perf_counter() - t0
    return 2 * m * k * n * 2 * iters / dt / 1e12


def main():
    wait_for_backend()  # ride out transient axon "Unavailable" init errors

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
