"""Multi-host (multi-process) input sharding.

The reference is single-machine (`torch.nn.DataParallel`,
sparsify_clip.py:703); scaling past one host on TPU means one JAX
process per host, each seeing only its local devices.  Two pieces make
the input pipeline multihost-correct:

* **deterministic partition of the global batch**: every process seeds
  the same global shuffle (the loader's per-(seed, epoch) streams) and
  takes a disjoint contiguous slice of each global batch —
  :func:`local_batch_indices`.  No cross-host communication, identical
  math on every host, and the union of slices is exactly the global
  batch.

* **global array assembly**: :func:`make_global_batch` turns each
  process's local slice into a globally-sharded `jax.Array` via
  ``jax.make_array_from_process_local_data``.  In a single-process run
  it degrades to a plain ``device_put`` — the code path is the same
  from 1 chip to a multi-slice pod.

The train step itself needs NOTHING: it is global-view jit over the
('data', 'model') mesh either way (parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

from sparsify_clip_tpu.parallel.mesh import batch_sharding


def initialize_distributed(config) -> None:
    """Join the multi-process cluster (no-op unless ``config.multihost``
    or when already initialized — e.g. a test harness that called
    ``jax.distributed.initialize`` itself before handing over to
    ``cli.main``).

    With the rendezvous keys unset (empty ``coordinator_address``),
    jax.distributed's standard cluster auto-detection applies (TPU
    pods, GKE, Slurm).  Must run before the first device query — the
    CLI calls it first thing in ``main()``.
    """
    if not getattr(config, "multihost", False):
        return
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if config.coordinator_address:
        kwargs["coordinator_address"] = config.coordinator_address
    if config.num_processes > 0:
        kwargs["num_processes"] = config.num_processes
    if config.process_id >= 0:
        kwargs["process_id"] = config.process_id
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on the process that owns host-side side effects (logging,
    plots, weights-npz writes).  Always true single-process."""
    return jax.process_index() == 0


def allgather_to_host(x) -> np.ndarray:
    """The FULL value of a (possibly cross-process sharded) array as
    host numpy, identical on every process.

    Single-process arrays take the plain ``np.asarray`` path; under
    multiple processes this is a collective (every process must call
    it) — the eval/plot path uses it to materialize globally-sharded
    embeddings on each host.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def any_process_flag(flag: bool) -> bool:
    """Collective OR of a per-process host flag (preemption
    coordination: one host's SIGTERM must stop EVERY process's train
    loop at the same step, or the survivors deadlock in the next
    step's collectives).  Single-process: the flag itself.
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.int32(bool(flag)))
    return bool(np.asarray(flags).any())


def local_batch_indices(
    global_order: np.ndarray,
    batch_index: int,
    global_batch: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """This process's slice of global batch ``batch_index``.

    ``global_order`` is the epoch's (identically-seeded) global
    permutation.  The global batch is split into ``process_count``
    contiguous equal slices; process ``p`` loads the ``p``-th.  Raises
    if the global batch does not divide evenly (ragged per-host batches
    would deadlock collectives).
    """
    process_index = jax.process_index() if process_index is None else process_index
    process_count = jax.process_count() if process_count is None else process_count
    if global_batch % process_count:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{process_count} processes"
        )
    local = global_batch // process_count
    start = batch_index * global_batch + process_index * local
    return np.asarray(global_order[start : start + local])


def make_global_batch(local_batch: Any, mesh) -> Any:
    """Assemble per-process local arrays into data-sharded global
    jax.Arrays over ``mesh`` (single-process: plain device_put)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local_batch
        )

    def place(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(place, local_batch)


def epoch_order(
    dataset_len: int, seed: int, epoch: int, shuffle: bool
) -> np.ndarray:
    """The global example order every process derives identically
    (mirrors DataLoader.epoch's seeding)."""
    order = np.arange(dataset_len)
    if shuffle:
        order = np.random.default_rng(
            np.random.SeedSequence([seed, epoch])
        ).permutation(dataset_len)
    return order
