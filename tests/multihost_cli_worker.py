"""Subprocess worker for the two-process CLI multihost test.

Unlike tests/multihost_worker.py (which drives the train-step plumbing
directly), this worker runs the PRODUCT entry point — ``cli.main()`` —
end to end: config-driven ``multihost: true`` initialization, the
data loaders' per-process batch slicing, global-array assembly inside
``run_training``, multihost eval (cross-process embedding gather),
collective orbax checkpointing and primary-only JSONL logging.

Run as ``python tests/multihost_cli_worker.py <mode> <workdir> [args]``:

* ``dist <workdir> <coordinator> <num_processes> <process_id>`` — join
  a 2-process CPU cluster (gloo), one local CPU device each;
* ``single <workdir> <n_devices>`` — the control: same config,
  single-process over ``n_devices`` fake CPU devices.

Both modes print ``FINAL <json>`` with the final eval metrics; the
training trajectory lands in ``<workdir>/logs/*.jsonl`` (written only
by process 0 in dist mode), which the parent compares bit-for-bit.
"""

from __future__ import annotations

import json
import os
import sys

# hermetic CPU backend regardless of the axon TPU tunnel
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def main() -> None:
    mode, workdir = sys.argv[1], sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")
    extra = {}
    if mode == "dist":
        coordinator, num_processes, process_id = (
            sys.argv[3], int(sys.argv[4]), int(sys.argv[5])
        )
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        extra = {
            "multihost": True,
            "coordinator_address": coordinator,
            "num_processes": num_processes,
            "process_id": process_id,
        }
    elif mode == "single":
        jax.config.update("jax_num_cpu_devices", int(sys.argv[3]))
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    from sparsify_clip_tpu import cli
    from sparsify_clip_tpu.config import ExperimentConfig

    config = ExperimentConfig.from_dict({
        "project_name": "multihost-cli-test",
        "run_name": "mh-cli",
        "model": "tiny-test",
        "batch_size": 8,
        "epochs": 1,
        "num_train_samples": 16,   # 2 train steps
        "num_test_samples": 8,     # 1 eval batch
        "learning_rate": 1e-3,
        "seed": 0,
        "fp16": False,             # fp32: bit-for-bit comparable
        "loss_type": "anchor",
        "anchor_temperature_learnable": True,
        "dataset": "synthetic",
        "plot_embeddings": False,
        "eval_redraw_captions": False,
        "handle_preemption": False,
        "save_checkpoint_every_n_epochs": 1,  # exercise collective orbax save
        "log_backend": "jsonl",
        "log_dir": os.path.join(workdir, "logs"),
        "checkpoint_dir": os.path.join(workdir, "models"),
        **extra,
    })
    final = cli.main(config)
    print("FINAL " + json.dumps(final, sort_keys=True), flush=True)
    print("WORKER-DONE", flush=True)


if __name__ == "__main__":
    main()
