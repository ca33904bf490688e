"""Multi-host input sharding: partition math + global-array assembly.

Real multi-process JAX can't run in this single-host environment, so
the partition invariants are tested directly (simulated process grid)
and the assembly path is tested in its single-process degradation on
the 8-fake-device mesh.
"""

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
