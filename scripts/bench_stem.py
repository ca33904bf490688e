#!/usr/bin/env python
"""A/B: space-to-depth stem vs plain 3×3-stride-2 stem on RN50.

Measures, on the real chip (bf16, bs256 by default):

1. the truncated stem stage (``ModifiedResNet(stop_after=0)``) forward
   and forward+backward with ``stem_s2d`` off/on — the directly
   affected milliseconds;
2. the FULL RN50 experiment-6 train step with ``stem_s2d`` off/on —
   what actually lands in pairs/s/chip.

The two variants are the same mathematical function with the same
parameter tree (models/resnet.py::s2d_pack_kernel; equality pinned by
tests/test_models.py::test_s2d_pack_kernel_unit), so any delta is pure
data-layout/compiler behavior.  Results → BASELINE.md.

Usage: python scripts/bench_stem.py [--batch 256] [--full-step]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from _bench import timed  # noqa: E402  (repo root on sys.path)


def bench_stem_stage(batch: int, steps: int, stem_s2d: bool):
    import jax
    import jax.numpy as jnp

    from sparsify_clip_tpu.models.resnet import ModifiedResNet

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.float32)
    model = ModifiedResNet(dtype=jnp.bfloat16, stop_after=0, stem_s2d=stem_s2d)
    variables = model.init(jax.random.PRNGKey(0), images[:2], train=True)

    @jax.jit
    def fwd(v, x):
        y, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def fwdbwd(v, x):
        def loss(p):
            y, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32))

        l, g = jax.value_and_grad(loss)(v["params"])
        return l + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g,
            jnp.float32(0.0))

    return {
        "fwd_ms": round(timed(fwd, variables, images, steps=steps) * 1e3, 2),
        "fwdbwd_ms": round(timed(fwdbwd, variables, images, steps=steps) * 1e3, 2),
    }


def bench_full_step(batch: int, steps: int, stem_s2d: bool):
    import jax

    from _bench import exp6_config, synthetic_batch
    from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from sparsify_clip_tpu.train import create_train_setup

    config = exp6_config("RN50", batch, epochs=1, stem_s2d=stem_s2d)
    mesh = create_mesh(data=1, model=1)
    setup = create_train_setup(config, steps_per_epoch=462, mesh=mesh)
    batch_d = shard_batch(synthetic_batch(batch, 224), mesh)

    state = setup.state
    # warm + steady-state: step in place, fence via the loss scalar
    import time
    for _ in range(3):
        state, metrics = setup.train_step(state, batch_d)
    float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = setup.train_step(state, batch_d)
    float(metrics["train_loss"])
    dt = (time.perf_counter() - t0) / steps
    return {"step_ms": round(dt * 1e3, 2), "pairs_per_sec": round(batch / dt, 1)}


def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--full-step", action="store_true")
    args = ap.parse_args()

    import jax

    out = {"batch": args.batch, "backend": jax.default_backend()}
    for variant in (False, True):
        key = "s2d" if variant else "conv"
        out[f"stem_{key}"] = bench_stem_stage(args.batch, args.steps, variant)
        print(json.dumps({f"stem_{key}": out[f"stem_{key}"]}), flush=True)
    if args.full_step:
        for variant in (False, True):
            key = "s2d" if variant else "conv"
            out[f"step_{key}"] = bench_full_step(args.batch, args.steps, variant)
            print(json.dumps({f"step_{key}": out[f"step_{key}"]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
