"""Multi-host input sharding: partition math + global-array assembly,
plus a REAL two-process run.

The partition invariants are tested directly (simulated process grid),
the assembly path in its single-process degradation on the 8-fake-
device mesh, and ``test_two_process_training_matches_single`` spawns
two actual JAX processes (``jax.distributed.initialize`` on localhost
CPU, gloo collectives) that assemble global batches with
``jax.make_array_from_process_local_data`` and train in lockstep —
asserting bit-for-bit the single-process trajectory.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.parallel.mesh import create_mesh
from sparsify_clip_tpu.parallel.multihost import (
    epoch_order,
    local_batch_indices,
    make_global_batch,
)


def test_slices_partition_the_global_batch():
    order = epoch_order(64, seed=3, epoch=1, shuffle=True)
    gb, procs = 16, 4
    for b in range(64 // gb):
        slices = [
            local_batch_indices(order, b, gb, process_index=p, process_count=procs)
            for p in range(procs)
        ]
        assert all(len(s) == gb // procs for s in slices)
        merged = np.concatenate(slices)
        np.testing.assert_array_equal(merged, order[b * gb : (b + 1) * gb])
        # disjoint
        assert len(set(merged.tolist())) == gb


def test_order_is_identical_across_processes_and_seeded():
    a = epoch_order(128, seed=7, epoch=2, shuffle=True)
    b = epoch_order(128, seed=7, epoch=2, shuffle=True)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, epoch_order(128, seed=7, epoch=3, shuffle=True))
    np.testing.assert_array_equal(
        epoch_order(16, seed=0, epoch=0, shuffle=False), np.arange(16)
    )


def test_ragged_global_batch_rejected():
    order = epoch_order(32, seed=0, epoch=0, shuffle=False)
    with pytest.raises(ValueError, match="divisible"):
        local_batch_indices(order, 0, 10, process_index=0, process_count=4)


def test_make_global_batch_single_process_sharding():
    mesh = create_mesh(data=8, model=1)
    batch = {
        "images": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
        "tokens": np.arange(8 * 2, dtype=np.int32).reshape(8, 2),
    }
    out = make_global_batch(batch, mesh)
    assert out["images"].sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(out["images"]), batch["images"])
    # usable in a jit reduction over the mesh
    with jax.sharding.set_mesh(mesh):
        s = jax.jit(lambda x: jnp.sum(x))(out["images"])
    assert float(s) == float(batch["images"].sum())


def test_loader_process_slices_reassemble_the_global_batch():
    """DataLoader(process_index/process_count): the union of the
    processes' slices must be bit-identical to the single-process batch
    — images, tokens AND caption choice (all draws key on the GLOBAL
    index, so which process loads an item cannot matter)."""
    from sparsify_clip_tpu.data.loader import DataLoader
    from sparsify_clip_tpu.data.synthetic import SyntheticCaptions
    from sparsify_clip_tpu.text import get_tokenizer

    ds = SyntheticCaptions(16, seed=3)
    tok = get_tokenizer("RN50")
    mk = lambda p, n: DataLoader(  # noqa: E731
        ds, 8, tok, train=True, seed=5, num_threads=1, image_size=32,
        process_index=p, process_count=n,
    )
    whole = list(mk(0, 1).epoch(1))
    parts = [list(mk(p, 2).epoch(1)) for p in range(2)]
    assert len(whole) == 2 and all(len(pp) == 2 for pp in parts)
    for b, (b0, b1) in enumerate(zip(*parts)):
        np.testing.assert_array_equal(
            np.concatenate([b0["images"], b1["images"]]), whole[b]["images"]
        )
        np.testing.assert_array_equal(
            np.concatenate([b0["tokens"], b1["tokens"]]), whole[b]["tokens"]
        )
        assert b0["captions"] + b1["captions"] == whole[b]["captions"]


def test_loader_process_kwargs_validated():
    from sparsify_clip_tpu.data.loader import DataLoader
    from sparsify_clip_tpu.data.synthetic import SyntheticCaptions
    from sparsify_clip_tpu.text import get_tokenizer

    ds, tok = SyntheticCaptions(8, seed=0), get_tokenizer("RN50")
    with pytest.raises(ValueError, match="divisible"):
        DataLoader(ds, 9, tok, train=True, process_count=2)
    with pytest.raises(ValueError, match="out of range"):
        DataLoader(ds, 8, tok, train=True, process_index=2, process_count=2)
    with pytest.raises(ValueError, match="drop_last"):
        DataLoader(ds, 8, tok, train=True, drop_last=False, process_count=2)


def test_multihost_config_rejects_grain_backend():
    from sparsify_clip_tpu.config import ExperimentConfig

    with pytest.raises(ValueError, match="grain"):
        ExperimentConfig.from_dict(
            {"multihost": True, "loader_backend": "grain"}
        )


def _ephemeral_coordinator_spawn(worker, build_cmds):
    """Probe a free port, spawn the distributed workers against it and
    return their (proc, (stdout, stderr)) results; retried on a port
    race (pattern shared with test_two_process_training_matches_single)."""
    import socket

    for attempt in range(3):
        probe = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        probe.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        probe.bind(("localhost", 0))
        port = probe.getsockname()[1]
        coordinator = f"localhost:{port}"
        try:
            procs = [
                subprocess.Popen(
                    cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                    text=True, env=env,
                )
                for cmd, env in build_cmds(coordinator)
            ]
        finally:
            probe.close()
        results = [p.communicate(timeout=600) for p in procs]
        if attempt < 2 and any(
            p.returncode != 0 and "address" in (err or "").lower()
            for p, (_, err) in zip(procs, results)
        ):
            continue
        return list(zip(procs, results))
    raise RuntimeError("coordinator port race, 3 attempts")


def _jsonl_trajectory(path):
    """The deterministic training/eval records of a run's JSONL log
    (timing fields and wall-clock keys stripped)."""
    drop = {"_time", "pairs_per_sec", "pairs_per_sec_per_chip",
            "step_time_ms", "train_time_s"}
    records = []
    with open(path) as fh:
        for line in fh:
            rec = json.loads(line)
            if any(k in rec for k in drop - {"_time"}):
                continue
            rec = {k: v for k, v in rec.items() if k not in drop}
            if rec.get("event") in ("run_start", "artifact"):
                rec.pop("config", None)
                rec.pop("path", None)
            records.append(rec)
    return records


@pytest.mark.slow
def test_two_process_cli_matches_single(tmp_path):
    """The PRODUCT multihost path: two real processes run ``cli.main``
    with ``multihost: true`` (config-driven jax.distributed init,
    per-process loader slicing, multihost eval gather, collective orbax
    save, primary-only logging) and must reproduce the single-process
    CLI run bit-for-bit — per-step losses, LR/temperature curves and
    the final eval metrics."""
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(os.path.dirname(__file__), "multihost_cli_worker.py")

    dist_dir = str(tmp_path / "dist")
    single_dir = str(tmp_path / "single")

    def build_cmds(coordinator):
        return [
            (
                [sys.executable, worker, "dist", dist_dir, coordinator, "2", str(i)],
                env,
            )
            for i in range(2)
        ]

    results = _ephemeral_coordinator_spawn(worker, build_cmds)
    finals = []
    for p, (stdout, stderr) in results:
        assert p.returncode == 0, f"dist CLI worker failed\n{stdout}\n{stderr}"
        assert "WORKER-DONE" in stdout
        finals.append(
            next(l for l in stdout.splitlines() if l.startswith("FINAL "))
        )
    # both processes return the identical final metrics dict
    assert finals[0] == finals[1]

    single = subprocess.run(
        [sys.executable, worker, "single", single_dir, "2"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert single.returncode == 0, f"single worker failed\n{single.stdout}\n{single.stderr}"
    final_single = next(
        l for l in single.stdout.splitlines() if l.startswith("FINAL ")
    )
    assert final_single == finals[0]

    # only process 0 logs; the trajectory is bit-for-bit the single run's
    dist_logs = sorted(os.listdir(os.path.join(dist_dir, "logs")))
    assert dist_logs == ["mh-cli.jsonl"]
    dist_traj = _jsonl_trajectory(os.path.join(dist_dir, "logs", "mh-cli.jsonl"))
    single_traj = _jsonl_trajectory(os.path.join(single_dir, "logs", "mh-cli.jsonl"))
    assert dist_traj == single_traj
    losses = [r["train_loss"] for r in dist_traj if "train_loss" in r]
    assert len(losses) == 2  # 16 samples / batch 8

    # the collective orbax save committed, and the primary wrote the npz
    ckpt_root = os.path.join(dist_dir, "models")
    assert any(d.startswith("step_") for d in os.listdir(os.path.join(ckpt_root, "mh-cli")))
    assert os.path.exists(os.path.join(ckpt_root, "mh-cli.npz"))


def _run_worker(args, env):
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "multihost_worker.py"), *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, (
        f"worker {args} failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "WORKER-DONE" in proc.stdout
    return [
        line.split() for line in proc.stdout.splitlines() if line.startswith("LOSS")
    ]


@pytest.mark.slow
def test_two_process_training_matches_single():
    """Two REAL processes (jax.distributed + gloo CPU collectives), each
    loading only its local slice of every global batch and assembling
    global arrays via make_array_from_process_local_data, must produce
    the exact single-process loss trajectory (same seed/data/mesh size).
    This is the live multi-process proof behind README "Scaling beyond
    one host" — the reference has no multi-host story at all
    (DataParallel, sparsify_clip.py:703)."""
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    # children control their own device counts; drop the pytest session's
    # 8-fake-device XLA_FLAGS and force a plain CPU platform
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    # ephemeral coordinator port: bind 0, let the OS pick, and HOLD the
    # probe socket until right before spawn (so a concurrent run probing
    # meanwhile gets a different port).  The residual race — another
    # process grabbing the port between probe close and the coordinator
    # bind, which happens a slow jax-import later — is handled by
    # retrying the whole spawn on a bind failure.
    import socket

    for attempt in range(3):
        probe = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        probe.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        probe.bind(("localhost", 0))
        port = probe.getsockname()[1]
        coordinator = f"localhost:{port}"
        try:
            procs = [
                subprocess.Popen(
                    [sys.executable,
                     os.path.join(
                         os.path.dirname(__file__), "multihost_worker.py"),
                     "dist", coordinator, "2", str(i)],
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                    env=env,
                )
                for i in range(2)
            ]
        finally:
            probe.close()
        outs = []
        results = [p.communicate(timeout=600) for p in procs]
        if attempt < 2 and any(
            p.returncode != 0 and "address" in (err or "").lower()
            for p, (_, err) in zip(procs, results)
        ):
            continue  # coordinator lost the port race; fresh port
        for p, (stdout, stderr) in zip(procs, results):
            assert p.returncode == 0, f"dist worker failed\n{stdout}\n{stderr}"
            assert "WORKER-DONE" in stdout
            outs.append(
                [l.split() for l in stdout.splitlines() if l.startswith("LOSS")]
            )
        break

    # both processes observe the identical replicated loss
    assert outs[0] == outs[1] and len(outs[0]) == 2

    single = _run_worker(["single", "2"], env)
    assert len(single) == 2
    # bit-for-bit: same mesh size, same partitioned data, same math —
    # process boundaries must not change a single ulp
    for (_, s_step, s_hex), (_, d_step, d_hex) in zip(single, outs[0]):
        assert s_step == d_step
        assert float.fromhex(s_hex) == float.fromhex(d_hex), (
            f"step {s_step}: single {float.fromhex(s_hex)!r} "
            f"!= dist {float.fromhex(d_hex)!r}"
        )
