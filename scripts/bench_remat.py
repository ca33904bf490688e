#!/usr/bin/env python
"""Remat-policy sweep for one model: full train step A/B on the chip.

For each requested policy (plus an optional no-remat control) the
script builds the full experiment-6 train step via
``create_train_setup`` — exactly the step the CLI runs — and times it
steady-state on a device-resident batch with the device→host scalar
fence.  OOM variants are recorded, not fatal, so one process sweeps
the whole policy space (chip init ~100 s amortizes across variants).

The policies trade recompute for memory (config.remat_policy,
models/layers.py::resolve_remat_policy); which one wins is a per-model
empirical question this script answers for BASELINE.md.

Usage:
  python scripts/bench_remat.py --model ViT-L-14 --batch 128
  python scripts/bench_remat.py --model RN50x16 --batch 64 \
      --policies nothing,dots,dots_no_batch
  python scripts/bench_remat.py --model ViT-L-14 --batch 96,112,144 \
      --policies '' --no-remat-control   # batch curve, one process
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import _bench  # noqa: F401  (side effect: repo root on sys.path)


def bench_variant(model, batch, remat, policy, steps, mu_dtype="float32"):
    from _bench import exp6_config, synthetic_batch
    from sparsify_clip_tpu.models.clip import MODEL_REGISTRY
    from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from sparsify_clip_tpu.train import create_train_setup

    config = exp6_config(
        model, batch,
        remat=remat, remat_policy=policy, adam_mu_dtype=mu_dtype,
    )
    mesh = create_mesh(data=1, model=1)
    setup = create_train_setup(config, steps_per_epoch=462, mesh=mesh)

    size = MODEL_REGISTRY[model].image_size
    batch_d = shard_batch(synthetic_batch(batch, size), mesh)

    state = setup.state
    for _ in range(3):
        state, metrics = setup.train_step(state, batch_d)
    float(metrics["train_loss"])  # fence (donated buffers: CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = setup.train_step(state, batch_d)
    float(metrics["train_loss"])
    dt = (time.perf_counter() - t0) / steps
    del state, setup, batch_d
    return {"step_ms": round(dt * 1e3, 2), "pairs_per_sec": round(batch / dt, 1)}


def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-L-14")
    ap.add_argument("--batch", default="128",
                    help="batch size, or comma list to sweep in one process")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument(
        "--policies", default="nothing,dots,dots_no_batch,attn_out",
        help="comma list of remat policies to sweep (with remat on)")
    ap.add_argument("--no-remat-control", action="store_true",
                    help="also try remat off (may OOM; recorded, not fatal)")
    ap.add_argument(
        "--mu-dtypes", default="float32",
        help="comma list of adam_mu_dtype values to sweep per variant "
             "(bfloat16 = the optimizer-memory knob, config.py)")
    args = ap.parse_args()

    import jax

    batches = [int(b) for b in str(args.batch).split(",") if b]
    out = {"model": args.model, "batch": args.batch,
           "backend": jax.default_backend(), "variants": {}}
    variants = [(True, p) for p in args.policies.split(",") if p]
    if args.no_remat_control:
        variants.insert(0, (False, "nothing"))
    mu_dtypes = [d for d in args.mu_dtypes.split(",") if d]
    for batch in batches:
        for remat, policy in variants:
            for mu_dtype in mu_dtypes:
                key = f"remat={remat}:{policy}" if remat else "no_remat"
                if len(batches) > 1:
                    key = f"bs{batch}:{key}"
                if len(mu_dtypes) > 1:
                    key = f"{key}:mu={mu_dtype}"
                try:
                    out["variants"][key] = bench_variant(
                        args.model, batch, remat, policy, args.steps,
                        mu_dtype=mu_dtype)
                except Exception as exc:  # XlaRuntimeError OOM etc. — record & go on
                    out["variants"][key] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
                print(json.dumps({key: out["variants"][key]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
