"""Subprocess worker for the REAL two-process multihost test.

Run as ``python tests/multihost_worker.py <mode> [args]``:

* ``dist <coordinator> <num_processes> <process_id>`` — join a
  multi-process CPU JAX cluster (gloo collectives), build the
  ('data','model') mesh over the GLOBAL device set, assemble this
  process's slice of the global batch via
  ``parallel.multihost`` (``jax.make_array_from_process_local_data``
  across processes — the path that degrades to device_put when
  single-process), run two train steps, print per-step losses.
* ``single <n_devices>`` — the control: same seed/data/mesh-size in one
  process (``jax_num_cpu_devices``), same code path.

Each step's loss is printed as ``LOSS <step> <float.hex>`` so the
parent can compare the two runs bit-for-bit.

Replaces the reference's single-machine DataParallel story
(/root/reference/sparsify_clip.py:703) with tested multi-process
input partitioning + global-view jit.
"""

from __future__ import annotations

import os
import sys

# hermetic CPU backend regardless of the axon TPU tunnel
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

GLOBAL_BATCH = 8
STEPS = 2


def _build_and_train(num_processes: int, process_id: int):
    import jax

    import numpy as np

    from sparsify_clip_tpu.config import ExperimentConfig
    from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
    from sparsify_clip_tpu.parallel.mesh import create_mesh
    from sparsify_clip_tpu.parallel.multihost import (
        epoch_order,
        local_batch_indices,
        make_global_batch,
    )
    from sparsify_clip_tpu.train import create_train_setup

    MODEL_REGISTRY.setdefault(
        "mh-tiny",
        CLIPConfig(
            name="mh-tiny", embed_dim=16, vision_kind="vit", image_size=32,
            vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
            vocab_size=256, context_length=12, text_width=16, text_heads=2,
            text_layers=2,
        ),
    )
    config = ExperimentConfig.from_dict({
        "model": "mh-tiny", "batch_size": GLOBAL_BATCH, "epochs": 1,
        "learning_rate": 1e-3, "seed": 0, "fp16": False,
        "loss_type": "only_lunif_n_then_anchor+lalign+lunif(centroids)",
        "only_lunif_epochs": 1,
    })
    mesh = create_mesh(data=len(jax.devices()), model=1)
    setup = create_train_setup(config, steps_per_epoch=STEPS, mesh=mesh)

    # Synthetic dataset every process derives identically, then each
    # process loads ONLY its slice of each global batch.
    rng = np.random.default_rng(7)
    n_examples = GLOBAL_BATCH * STEPS
    images = rng.standard_normal((n_examples, 32, 32, 3)).astype(np.float32)
    tokens = rng.integers(1, 250, size=(n_examples, 12)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    order = epoch_order(n_examples, seed=0, epoch=0, shuffle=True)

    state = setup.state
    for step in range(STEPS):
        idx = local_batch_indices(
            order, step, GLOBAL_BATCH,
            process_index=process_id, process_count=num_processes,
        )
        batch = make_global_batch(
            {"images": images[idx], "tokens": tokens[idx]}, mesh
        )
        state, metrics = setup.train_step(state, batch)
        loss = float(metrics["train_loss"])
        print(f"LOSS {step} {loss.hex()}", flush=True)


def main() -> None:
    mode = sys.argv[1]
    import jax

    if mode == "dist":
        coordinator, num_processes, process_id = (
            sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
        )
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator, num_processes=num_processes, process_id=process_id
        )
        assert jax.process_count() == num_processes
        _build_and_train(num_processes, process_id)
    elif mode == "single":
        n_devices = int(sys.argv[2])
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
        _build_and_train(1, 0)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    print("WORKER-DONE", flush=True)


if __name__ == "__main__":
    main()
