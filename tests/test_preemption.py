"""Graceful preemption (utils/preemption.py + run_training stop_fn):
SIGTERM mid-training finishes the step, checkpoints full state, exits
0, and a resume_checkpoint: "auto" restart continues step-exact."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from sparsify_clip_tpu.utils.preemption import GracefulShutdown


def test_graceful_shutdown_flags_sigterm_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown() as shutdown:
        assert shutdown.active and not shutdown.requested
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously
        assert shutdown.requested
        assert shutdown.requested_fn()
    assert signal.getsignal(signal.SIGTERM) is prev


def test_graceful_shutdown_degrades_off_main_thread():
    import threading

    seen = {}

    def worker():
        with GracefulShutdown() as shutdown:
            seen["active"] = shutdown.active
            seen["requested"] = shutdown.requested

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert seen == {"active": False, "requested": False}


_WORKER = """
import sys
sys.path.insert(0, {repo!r})
from sparsify_clip_tpu.cli import main
from sparsify_clip_tpu.config import ExperimentConfig

config = ExperimentConfig.from_dict({{
    "project_name": "test", "run_name": "preempt",
    "seed": 42, "learning_rate": "1e-3", "batch_size": 8,
    "model": "tiny-test", "num_train_samples": 32, "num_test_samples": 8,
    "epochs": 200, "loss_type": "anchor", "only_lunif_epochs": 0,
    "anchor_temperature": 0.1, "anchor_temperature_learnable": False,
    "save_checkpoint_every_n_epochs": 1000, "resume_checkpoint": {resume!r},
    "resume_epoch": 0,
    "fp16": False, "dataset": "synthetic",
    "log_dir": {log_dir!r}, "checkpoint_dir": {ckpt_dir!r},
    "log_backend": "jsonl", "plot_embeddings": False,
    "eval_redraw_captions": False,
}})
main(config, image_size=32)
print("WORKER-DONE")
"""


@pytest.mark.slow
def test_sigterm_checkpoints_and_auto_resume_continues(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    log_dir, ckpt_dir = str(tmp_path / "logs"), str(tmp_path / "models")
    script = _WORKER.format(
        repo=repo, resume=False, log_dir=log_dir, ckpt_dir=ckpt_dir
    )
    log_path = os.path.join(log_dir, "preempt.jsonl")

    proc = subprocess.Popen(
        [sys.executable, "-c", script], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait until a few train steps are on disk, then preempt
        deadline = time.time() + 300
        while time.time() < deadline:
            if os.path.exists(log_path):
                steps = [
                    l for l in open(log_path) if "train_loss" in l
                ]
                if len(steps) >= 3:
                    break
            time.sleep(0.5)
        else:
            proc.kill()
            pytest.fail(f"no train steps within 300s:\n{proc.stdout.read()}")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()

    assert proc.returncode == 0, out
    assert "[preemption] caught signal" in out, out
    assert "Preempted: training state checkpointed" in out, out
    assert "WORKER-DONE" in out, out
    # full-state checkpoint directory exists (auto-resume target)
    assert os.path.isdir(os.path.join(ckpt_dir, "preempt")), out
    records = [json.loads(l) for l in open(log_path)]
    assert any(r.get("preempted") == 1.0 for r in records)
    steps_before = len([r for r in records if "train_loss" in r])
    assert steps_before >= 3

    # --- restart with resume_checkpoint: "auto" ---------------------
    resume_script = _WORKER.format(
        repo=repo, resume="auto", log_dir=log_dir, ckpt_dir=ckpt_dir
    ).replace('"epochs": 200', '"epochs": 1')
    out2 = subprocess.run(
        [sys.executable, "-c", resume_script], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert out2.returncode == 0, out2.stdout + out2.stderr
    assert "Resumed full state" in out2.stdout, out2.stdout
    # it resumed FROM the preempted step, not from zero
    import re

    m = re.search(r"Resumed full state from .* at step (\d+)", out2.stdout)
    assert m and int(m.group(1)) >= 3, out2.stdout
    assert "Training complete." in out2.stdout, out2.stdout


def test_graceful_shutdown_sigint_flags_then_second_raises():
    """First Ctrl-C asks for a graceful checkpoint; a second one means
    'actually stop now' and raises KeyboardInterrupt."""
    prev = signal.getsignal(signal.SIGINT)
    with GracefulShutdown() as shutdown:
        os.kill(os.getpid(), signal.SIGINT)  # delivered synchronously
        assert shutdown.requested
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)
        assert shutdown.requested  # still flagged for the outer loop
    assert signal.getsignal(signal.SIGINT) is prev


def test_run_training_stopped_early_reflects_actual_early_stop():
    """cli's preempted branch keys off setup.stopped_early, not the raw
    signal flag: a run whose loop COMPLETED (e.g. SIGTERM landing during
    the final epoch's eval) must fall through to the final eval/save."""
    import numpy as np

    from sparsify_clip_tpu.config import ExperimentConfig
    from sparsify_clip_tpu.train import create_train_setup, run_training

    cfg = ExperimentConfig.from_dict({
        "project_name": "t", "run_name": "stopflag", "seed": 0,
        "learning_rate": "1e-3", "batch_size": 8, "model": "tiny-test",
        "epochs": 1, "loss_type": "anchor", "only_lunif_epochs": 0,
        "anchor_temperature": 0.1, "anchor_temperature_learnable": False,
        "save_checkpoint_every_n_epochs": 1000, "fp16": False,
    })
    setup = create_train_setup(cfg, steps_per_epoch=2, image_size=32)
    c = setup.model.cfg
    rng = np.random.default_rng(0)

    def batches(epoch):
        for _ in range(2):
            tokens = rng.integers(
                1, c.vocab_size - 2, size=(8, c.context_length)
            ).astype(np.int32)
            yield {
                "images": rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
                "tokens": tokens,
            }

    run_training(setup, batches)
    assert setup.stopped_early is False

    run_training(setup, batches, stop_fn=lambda: True)
    assert setup.stopped_early is True
