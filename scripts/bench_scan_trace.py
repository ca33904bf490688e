#!/usr/bin/env python
"""Trace+lower wall time: scan_layers vs unrolled at real depths.

The scan_layers knob claims constant program size in depth (asserted
structurally in tests/test_scan_layers.py); this measures the
wall-clock side of that claim — the time to trace and lower the
forward pass of real zoo towers on the host (tracing is Python-bound
and backend-independent; lowering emits StableHLO).  TPU compile time
scales with HLO size, so the lowered-bytes column is the portable
proxy for the remote-compile win.

Abstract init (jax.eval_shape) — no weights are allocated, so even
ViT-bigG-14 measures in seconds.

Usage: python scripts/bench_scan_trace.py [--models ViT-L-14,ViT-g-14,ViT-bigG-14]
"""

from __future__ import annotations

import argparse
import json
import time

import _bench  # noqa: F401  (side effect: repo root on sys.path)


def measure(model_name: str, scan: bool):
    import jax
    import jax.numpy as jnp

    from sparsify_clip_tpu.models.clip import CLIP, MODEL_REGISTRY

    cfg = MODEL_REGISTRY[model_name]
    model = CLIP(cfg=cfg, dtype=jnp.bfloat16, scan_layers=scan)
    size = cfg.image_size
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32), train=False,
        )
    )
    images = jax.ShapeDtypeStruct((8, size, size, 3), jnp.float32)
    tokens = jax.ShapeDtypeStruct((8, cfg.context_length), jnp.int32)

    def fwd(v, im, tk):
        return model.apply(v, im, tk, train=False)

    t0 = time.perf_counter()
    lowered = jax.jit(fwd).lower(variables, images, tokens)
    trace_lower_s = time.perf_counter() - t0
    hlo_bytes = len(lowered.as_text())
    return {"trace_lower_s": round(trace_lower_s, 2),
            "stablehlo_bytes": hlo_bytes}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="ViT-L-14,ViT-H-14,ViT-g-14,ViT-bigG-14")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # axon override: CLAUDE.md

    out = {}
    for name in args.models.split(","):
        row = {}
        for mode, scan in (("unrolled", False), ("scan", True)):
            row[mode] = measure(name, scan)
        row["hlo_ratio"] = round(
            row["unrolled"]["stablehlo_bytes"]
            / row["scan"]["stablehlo_bytes"], 1)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
