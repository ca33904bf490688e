#!/usr/bin/env python
"""System-level wall-clock breakdown of a REAL CLI run on the chip.

Drives ``cli.main()`` — the actual experiment loop: loader in the
loop, per-epoch eval with fp32 twins, embedding plots, periodic
(async) checkpoints — on a synthetic-data config, and reports where
the wall-clock went:

* ``setup_s``      — model/optimizer build + initial device put
* ``data_build_s`` — dataset/loader construction
* ``eval_s``       — all evaluate_model calls (compile included;
                     ``eval_first_s`` isolates the compile-heavy first
                     pass; plots happen inside eval and are also
                     broken out as ``plot_s``)
* ``ckpt_s``       — weights-npz + orbax full-state saves.  With
                     ``async_checkpoint`` (this script's default) this
                     is the SYNCHRONOUS portion only: the device→host
                     param fetch at enqueue plus the end-of-run
                     ``wait_for_async_saves`` drain; background
                     serialization that overlaps the epoch loop lands
                     in ``train_loop_s`` — that overlap being the
                     point of async saves, it is deliberately not
                     double-counted here
* ``train_loop_s`` — everything else inside the epoch loop: jit'd
                     steps + host data plane + step compile
* per-epoch device step stats from the run's own JSONL log
  (pairs_per_sec, step_time_ms)

This is the first number showing the SYSTEM — not just the
device-resident step — and it directly surfaces eval-recompile or
checkpoint stalls (reference anchor: the full train_model loop,
sparsify_clip.py:751-986).  NB: through the axon tunnel host→device
transfers run at 0.02-0.04 GB/s (BASELINE.md "Environment artifact"),
so the host-data share here is tunnel-dominated; the breakdown still
separates it from eval/checkpoint/compile costs.

Usage: python scripts/bench_system.py [--model ViT-B-32] [--batch 256]
           [--steps-per-epoch 10] [--epochs 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import _bench  # noqa: F401  (side effect: repo root on sys.path)
from _bench import wait_for_backend


class PhaseTimer:
    def __init__(self):
        self.totals = {}
        self.counts = {}
        self.first = {}

    def wrap(self, name, fn):
        @functools.wraps(fn)
        def timed(*a, **kw):
            t0 = time.perf_counter()
            try:
                return fn(*a, **kw)
            finally:
                dt = time.perf_counter() - t0
                self.totals[name] = self.totals.get(name, 0.0) + dt
                self.counts[name] = self.counts.get(name, 0) + 1
                self.first.setdefault(name, dt)
        return timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps-per-epoch", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--eval-samples", type=int, default=256)
    ap.add_argument("--log-dir", default="logs/bench_system")
    ap.add_argument("--device-augment", action="store_true",
                    help="uint8 staging images + on-device crop/flip/"
                         "normalize (4x smaller host->device transfers)")
    args = ap.parse_args()

    wait_for_backend()  # ride out transient axon "Unavailable" init errors

    import jax

    import sparsify_clip_tpu.checkpoints as checkpoints
    import sparsify_clip_tpu.eval as eval_mod
    import sparsify_clip_tpu.train as train_mod
    import sparsify_clip_tpu.viz as viz
    from sparsify_clip_tpu import cli
    from sparsify_clip_tpu.data import pipeline

    pt = PhaseTimer()
    # attribute lookups happen at call time inside cli.main, so module
    # attribute patches instrument the real run
    eval_mod.evaluate_model = pt.wrap("eval", eval_mod.evaluate_model)
    viz.plot_all_methods = pt.wrap("plot", viz.plot_all_methods)
    checkpoints.save_weights = pt.wrap("ckpt", checkpoints.save_weights)
    checkpoints.save_full = pt.wrap("ckpt", checkpoints.save_full)
    checkpoints.save_full_async = pt.wrap("ckpt", checkpoints.save_full_async)
    checkpoints.wait_for_async_saves = pt.wrap(
        "ckpt_wait", checkpoints.wait_for_async_saves)
    train_mod.create_train_setup = pt.wrap("setup", train_mod.create_train_setup)
    # cli.main imports dataset_loader from the package re-export
    wrapped_loader = pt.wrap("data_build", pipeline.dataset_loader)
    pipeline.dataset_loader = wrapped_loader
    import sparsify_clip_tpu.data as data_pkg

    data_pkg.dataset_loader = wrapped_loader

    from _bench import exp6_config

    run_name = "bench-system"
    config = exp6_config(
        args.model, args.batch,
        epochs=args.epochs,
        dataset="synthetic",
        num_train_samples=args.batch * args.steps_per_epoch,
        num_test_samples=args.eval_samples,
        run_name=run_name, log_dir=args.log_dir,
        checkpoint_dir=os.path.join(args.log_dir, "ckpt"),
        save_checkpoint_every_n_epochs=max(1, args.epochs - 1),
        async_checkpoint=True,
        plot_embeddings=True,
        log_backend="jsonl",
        device_augment=args.device_augment,
    )

    # RunLogger appends; a stale JSONL from a previous invocation with
    # the same log-dir would pollute per_epoch_device_step below
    log_path = os.path.join(args.log_dir, f"{run_name}.jsonl")
    if os.path.exists(log_path):
        os.remove(log_path)

    t0 = time.perf_counter()
    final = cli.main(config)
    total_s = time.perf_counter() - t0

    # per-epoch device step stats from the run's own JSONL log
    epochs = []
    if os.path.exists(log_path):
        with open(log_path) as fh:
            for line in fh:
                rec = json.loads(line)
                if "pairs_per_sec" in rec:
                    epochs.append({
                        "pairs_per_sec": rec["pairs_per_sec"],
                        "step_time_ms": rec["step_time_ms"],
                    })

    accounted = sum(
        pt.totals.get(k, 0.0)
        for k in ("setup", "data_build", "eval", "ckpt", "ckpt_wait")
    )
    out = {
        "model": args.model, "batch": args.batch,
        "backend": jax.default_backend(),
        "train_steps": args.steps_per_epoch * args.epochs,
        "total_s": round(total_s, 1),
        "setup_s": round(pt.totals.get("setup", 0.0), 1),
        "data_build_s": round(pt.totals.get("data_build", 0.0), 1),
        "eval_s": round(pt.totals.get("eval", 0.0), 1),
        "eval_calls": pt.counts.get("eval", 0),
        "eval_first_s": round(pt.first.get("eval", 0.0), 1),
        "plot_s": round(pt.totals.get("plot", 0.0), 1),
        "plot_calls": pt.counts.get("plot", 0),
        "ckpt_s": round(
            pt.totals.get("ckpt", 0.0) + pt.totals.get("ckpt_wait", 0.0), 1),
        "train_loop_s": round(total_s - accounted, 1),
        "per_epoch_device_step": epochs,
        "final_backward_r1": final.get("backward_r1"),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
