#!/usr/bin/env python
"""Run every reference YAML end-to-end on the real TPU in --smoke mode
(VERDICT r4 #7): the full CLI path — config parse, model build, train
steps with the experiment's exact loss stack and schedules, eval,
save — on synthetic data, recording loss finiteness and the warm-phase
component pattern per experiment.  Results → benchmarks/r5 +
BASELINE.md.

Usage: python scripts/bench_yaml_smoke.py [--out DIR] [--configs GLOB]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import sys
import time

from _bench import wait_for_backend  # noqa: E402  (repo root on sys.path)

REFERENCE_CONFIG_DIRS = (
    "/root/reference/experiments_configs",
    "/root/reference/ablatation_configs",
)


def run_one(path: str, workdir: str):
    from sparsify_clip_tpu.cli import apply_smoke_overrides, main
    from sparsify_clip_tpu.config import load_config

    config = load_config(path)
    config = apply_smoke_overrides(config)
    # persistent compile cache shared across the sweep
    config.compilation_cache_dir = os.environ.get(
        "SPARSIFY_XLA_CACHE", "/tmp/sparsify_xla_cache"
    )
    t0 = time.time()
    metrics = main(config)
    elapsed = time.time() - t0

    # per-step loss records from the run's JSONL stream
    log_path = os.path.join(
        "logs", f"{config.run_name.replace('/', '_')}.jsonl"
    )
    steps = []
    if os.path.exists(log_path):
        with open(log_path) as fh:
            for line in fh:
                rec = json.loads(line)
                if "train_loss" in rec:
                    steps.append(rec)
    losses = [r["train_loss"] for r in steps]
    record = {
        "yaml": os.path.basename(path),
        "loss_type": config.loss_type,
        "only_lunif_epochs": config.only_lunif_epochs,
        "train_steps": len(steps),
        "losses": [round(l, 4) for l in losses],
        "all_finite": bool(losses) and all(math.isfinite(l) for l in losses),
        "final_eval": {
            k: v for k, v in (metrics or {}).items()
            if isinstance(v, (int, float))
        },
        "wall_s": round(elapsed, 1),
    }
    # warm-phase check: a 1-epoch smoke of an only_lunif_epochs>=1
    # experiment runs ENTIRELY in the warm phase, whose loss is the pure
    # uniformity potential — log-mean-exp of negative distances, always
    # < 0 on the sphere — while every anchor-bearing main-phase loss
    # starts near +ln(B) > 0.  The JSONL keeps the reference's exact
    # per-step schema (no component keys), so the sign IS the check.
    if losses and config.only_lunif_epochs >= 1:
        record["warm_phase_lunif_only"] = all(l < 0 for l in losses)
    return record


def main_cli():
    wait_for_backend()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/yaml_smoke_r5")
    ap.add_argument("--configs", default=None,
                    help="glob overriding the reference config dirs")
    args = ap.parse_args()

    if args.configs:
        paths = sorted(glob.glob(args.configs))
    else:
        paths = []
        for d in REFERENCE_CONFIG_DIRS:
            paths.extend(sorted(glob.glob(os.path.join(d, "*.yaml"))))
    # all_experiments.yaml is the reference's sweep-driver list, not an
    # experiment config — the CLI's dir-sweep mode handles it; skip here
    paths = [p for p in paths if os.path.basename(p) != "all_experiments.yaml"]

    os.makedirs(args.out, exist_ok=True)
    os.chdir(args.out)  # logs/checkpoints/etc. land in the scratch dir

    results = []
    for p in paths:
        print(f"=== {os.path.basename(p)}", flush=True)
        try:
            rec = run_one(p, args.out)
        except Exception as err:  # record, keep sweeping
            rec = {"yaml": os.path.basename(p), "error": f"{type(err).__name__}: {err}"}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = sum(1 for r in results if r.get("all_finite"))
    print(json.dumps({"total": len(results), "all_finite": ok}, indent=1))
    with open("yaml_smoke_results.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"results -> {os.path.join(args.out, 'yaml_smoke_results.json')}")


if __name__ == "__main__":
    main_cli()
