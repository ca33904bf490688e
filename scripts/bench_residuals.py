#!/usr/bin/env python
"""A/B the analyzed-but-unattacked single-chip residuals (VERDICT r4 #3/#4).

Measures, on the real chip, the FULL ViT-B/32 exp6 bs256 train step
(the flagship bench configuration) under:

1. ``base``          — round-4 defaults;
2. ``fused_ln_qkv``  — each block's ln_1 fused into its qkv projection
                       (ops/pallas_ln_qkv);
3. ``onehot_embed``  — text token-embedding lookup as a one-hot matmul
                       instead of gather/scatter-add;
4. ``no_l2norm``     — *opportunity-bound probe*: the embedding
                       l2-normalize (and its backward) replaced by
                       identity.  Not valid training math — it bounds
                       what fusing the normalize into the loss kernels
                       could ever recover; if the delta is ~0 the
                       fusion cannot win.
5. ``log_every``     — the SAME base program paced with a per-step
                       ``float()`` metric read (reference parity,
                       log_every_n_steps=1) vs reads batched every 10
                       steps: the host-fence cost VERDICT r4 #4 asks
                       to measure.

Results → BASELINE.md "Round-5 measurements", win-or-negative, like
stem_s2d.  Usage: python scripts/bench_residuals.py [--batch 256]
[--steps 20]
"""

from __future__ import annotations

import argparse
import json
import time

from _bench import exp6_config, synthetic_batch, wait_for_backend  # noqa: E402


def build_setup(batch: int, model: str = "ViT-B-32", **cfg_overrides):
    from sparsify_clip_tpu.models.clip import MODEL_REGISTRY
    from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from sparsify_clip_tpu.train import create_train_setup

    config = exp6_config(model, batch, epochs=1, **cfg_overrides)
    mesh = create_mesh(data=1, model=1)
    setup = create_train_setup(config, steps_per_epoch=462, mesh=mesh)
    image_size = MODEL_REGISTRY[model].image_size
    batch_d = shard_batch(synthetic_batch(batch, image_size), mesh)
    return setup, batch_d


def timed_steps(setup, batch_d, steps: int, read_every: int = 1):
    """Steady-state per-step seconds; metrics read every ``read_every``
    steps (the final read always fences the tail)."""
    state = setup.state
    for _ in range(3):
        state, metrics = setup.train_step(state, batch_d)
    float(metrics["train_loss"])  # fence warmup
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = setup.train_step(state, batch_d)
        if read_every == 1 or (i + 1) % read_every == 0:
            float(metrics["train_loss"])
    float(metrics["train_loss"])
    dt = (time.perf_counter() - t0) / steps
    setup.state = state
    return dt


def bench_variant(batch: int, steps: int, read_every: int = 1,
                  model: str = "ViT-B-32", **cfg_overrides):
    setup, batch_d = build_setup(batch, model, **cfg_overrides)
    dt = timed_steps(setup, batch_d, steps, read_every=read_every)
    return {"step_ms": round(dt * 1e3, 2), "pairs_per_sec": round(batch / dt, 1)}


def main():
    import os

    wait_for_backend()
    import jax

    # same persistent compile cache as bench.py: repeat runs skip the
    # 40s+ remote compiles
    cache_dir = os.environ.get("SPARSIFY_XLA_CACHE", "/tmp/sparsify_xla_cache")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--skip", nargs="*", default=[],
                    help="variant names to skip")
    ap.add_argument("--read-every", type=int, default=1,
                    help="metric-read cadence inside the timed loop; the "
                         "default per-step read adds a full tunnel RTT to "
                         "every step on this host (the log_every variant "
                         "measures that directly) — pass 10 for clean "
                         "device-side A/B deltas")
    args = ap.parse_args()

    import jax

    out = {"batch": args.batch, "model": args.model,
           "backend": jax.default_backend()}

    def run(name, fn):
        if name in args.skip:
            return
        out[name] = fn()
        print(json.dumps({name: out[name]}), flush=True)

    re_ = args.read_every
    m = args.model
    run("base", lambda: bench_variant(args.batch, args.steps, re_, m))
    run("base_repeat", lambda: bench_variant(args.batch, args.steps, re_, m))
    run("fused_ln_qkv", lambda: bench_variant(
        args.batch, args.steps, re_, m, fused_ln_qkv=True))
    run("onehot_embed", lambda: bench_variant(
        args.batch, args.steps, re_, m, onehot_embed=True))

    def no_l2norm():
        import jax.numpy as jnp

        import sparsify_clip_tpu.train as train_mod

        orig = train_mod.l2_normalize
        # identity with the same dtype contract as the real normalize
        train_mod.l2_normalize = lambda x: x.astype(jnp.float32)
        try:
            return bench_variant(args.batch, args.steps, re_, m)
        finally:
            train_mod.l2_normalize = orig

    run("no_l2norm", no_l2norm)

    def log_every():
        setup, batch_d = build_setup(args.batch)
        per_step = timed_steps(setup, batch_d, args.steps, read_every=1)
        batched = timed_steps(setup, batch_d, args.steps, read_every=10)
        return {
            "read_every_1_ms": round(per_step * 1e3, 2),
            "read_every_10_ms": round(batched * 1e3, 2),
            "fence_cost_ms": round((per_step - batched) * 1e3, 2),
        }

    run("log_every", log_every)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
