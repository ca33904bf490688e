#!/usr/bin/env python
"""Headline benchmark: image-text pairs/sec/chip for the flagship
ViT-B/32 train step with the experiment-6 loss stack
(SPARSIFICATION(1E)+ANCHOR+LALIGN+LUNIF(CENTROIDS)), bf16, batch 256.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured against the anchor derived in BASELINE.md
("GPU anchor — derivation"): the reference publishes no numbers
(README.md:1-49; BASELINE.json ``published: {}``), so the anchor is
FLOPs-bounded — 45 GFLOPs/pair through an A100's 312 TFLOP/s peak at a
30-45% eager-torch MFU band = [2080, 3120] pairs/s, midpoint 2500.
The north-star ≥5× targets the v5e-8 slice: 8-chip aggregate ÷ anchor
is reported in ``detail.vs_baseline_v5e8_projected`` (batch-DP; the
only cross-chip traffic is a 512-d all_gather + grad psum over ICI).
Replace with a measured number when a GPU reference run exists.
"""

from __future__ import annotations

import json
import time


# FLOPs-derived GPU-reference pairs/sec (BASELINE.md "GPU anchor").
GPU_REFERENCE_PAIRS_PER_SEC = 2500.0

BATCH_SIZE = 256
WARMUP_STEPS = 3
TIMED_STEPS = 20


def main() -> None:
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts")
    )
    from _bench import wait_for_backend

    wait_for_backend()  # ride out transient axon "Unavailable" init errors

    import jax

    # persistent compile cache: repeat bench runs (and anything else on
    # this host) skip the 40-90 s remote compiles; timing is unaffected
    # (only compilation is cached, the timed steps always execute)
    cache_dir = os.environ.get("SPARSIFY_XLA_CACHE", "/tmp/sparsify_xla_cache")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    from _bench import exp6_config, synthetic_batch
    from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from sparsify_clip_tpu.train import create_train_setup

    n_chips = len(jax.devices())
    mesh = create_mesh(data=n_chips, model=1)

    # the one exp6 definition every bench shares (scripts/_bench.py)
    config = exp6_config("ViT-B-32", BATCH_SIZE * n_chips)
    global_batch = config.batch_size

    setup = create_train_setup(config, steps_per_epoch=462, mesh=mesh)

    batch = shard_batch(synthetic_batch(global_batch, 224), mesh)

    state = setup.state
    for _ in range(WARMUP_STEPS):
        state, metrics = setup.train_step(state, batch)
    # force a device->host scalar read: under the axon tunnel,
    # block_until_ready on a donated buffer can return before the
    # compute chain drains, so a value read is the only honest fence
    float(metrics["train_loss"])

    t0 = time.perf_counter()
    for _ in range(TIMED_STEPS):
        state, metrics = setup.train_step(state, batch)
    float(metrics["train_loss"])  # fence (see above)
    elapsed = time.perf_counter() - t0

    step_time = elapsed / TIMED_STEPS
    pairs_per_sec = global_batch / step_time
    pairs_per_sec_per_chip = pairs_per_sec / n_chips

    print(json.dumps({
        "metric": "image-text pairs/sec/chip (ViT-B/32 exp6 train step, bf16, bs256)",
        "value": round(pairs_per_sec_per_chip, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec_per_chip / GPU_REFERENCE_PAIRS_PER_SEC, 3),
        "detail": {
            "chips": n_chips,
            "global_batch": global_batch,
            "step_time_ms": round(step_time * 1000, 2),
            "loss": round(float(metrics["train_loss"]), 4),
            "baseline_anchor": "FLOPs-derived A100 eager-torch anchor 2500 pairs/s, band [2080, 3120] (BASELINE.md; reference publishes none)",
            "roofline": "measured per-shape matmul ceiling puts this step at 94% of the physical v5e limit (~2699 pairs/s); see BASELINE.md",
            "vs_baseline_v5e8_projected": round(
                pairs_per_sec_per_chip * 8 / GPU_REFERENCE_PAIRS_PER_SEC, 2
            ),
        },
    }))


if __name__ == "__main__":
    # The axon remote-compile tunnel occasionally returns a transient
    # HTTP 500; retry once so unattended benchmark runs don't fail
    # spuriously.
    try:
        main()
    except Exception as exc:  # noqa: BLE001
        import sys
        import time as _time

        print(f"bench attempt 1 failed ({type(exc).__name__}); retrying", file=sys.stderr)
        _time.sleep(10)
        main()
