"""Backend selection for the fused loss kernels.

Pallas kernels run compiled on TPU; off-TPU (and for
``use_pallas=False``) these dispatchers fall back to the XLA twins in
:mod:`sparsify_clip_tpu.losses`, which are the numerics goldens.  The
Pallas *interpreter* path is exercised by the kernel tests
(``tests/test_pallas_ops.py``), not by this dispatcher — interpreting
the kernels inside every CPU train step would be pure overhead since
the XLA twins are numerics-equal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.losses.contrastive import contrastive_loss
from sparsify_clip_tpu.losses.unif import lunif_loss


@functools.lru_cache()
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_FORCE_PALLAS_LOSSES = False


class force_pallas_losses:
    """Trace-time override: the dispatchers below route to the Pallas
    kernels regardless of ``jax.default_backend()``.  For
    cross-platform lowering tests that export TPU artifacts from the
    CPU host (the twin of pallas_attention.force_pallas_attention)."""

    def __enter__(self):
        global _FORCE_PALLAS_LOSSES
        self._prev = _FORCE_PALLAS_LOSSES
        _FORCE_PALLAS_LOSSES = True
        return self

    def __exit__(self, *exc):
        global _FORCE_PALLAS_LOSSES
        _FORCE_PALLAS_LOSSES = self._prev
        return False


def _pallas_route() -> bool:
    return _on_tpu() or _FORCE_PALLAS_LOSSES


def _kernel_mesh():
    """The abstract mesh a loss kernel must shard_map over, or None.

    Mosaic custom calls refuse AUTOMATIC partitioning outright: under a
    multi-device ShardingContext (any mesh with >1 device, even with
    fully-replicated operands) XLA raises "Mosaic kernels cannot be
    automatically partitioned" at lowering.  On a single device, or
    already inside a fully-manual shard_map (e.g. tests driving the
    kernels directly), the call is legal as-is.
    """
    am = jax.sharding.get_abstract_mesh()
    if am is None or am.empty or am.size == 1:
        return None
    if all(t == jax.sharding.AxisType.Manual for t in am.axis_types):
        return None
    return am


def _global_batch_kernel(kernel, arrays, scalars=()):
    """Run a whole-batch loss kernel on a multi-device mesh.

    The B×B losses need every pair, so the multi-chip form is
    gather-then-compute-replicated: shard_map over the FULL mesh (all
    axes manual — the only placement mosaic accepts), all_gather the
    batch-sharded embeddings over 'data' inside, and run the kernel on
    the global batch on every device.  The transpose of the gather is a
    reduce-scatter of the embedding grads, so backward is exact.  This
    mirrors what XLA's partitioner does for the XLA twins (the B×B
    matmul forces the same all-gather); the kernel itself stays the
    single-program version.
    """
    am = _kernel_mesh()
    if am is None:
        return kernel(*arrays, *scalars)

    from jax.sharding import PartitionSpec as P

    from sparsify_clip_tpu.parallel.mesh import DATA_AXIS

    def worker(arrs, scls):
        gathered = [
            jax.lax.all_gather(a, DATA_AXIS, axis=0, tiled=True) for a in arrs
        ]
        return kernel(*gathered, *scls)

    return jax.shard_map(
        worker,
        mesh=am,
        in_specs=(P(DATA_AXIS), P()),
        out_specs=P(),
        # pallas_call out_shapes carry no vma annotations
        check_vma=False,
    )(list(arrays), list(scalars))


def fused_lunif_loss(x: jnp.ndarray, t: float = 2.0, use_pallas: bool = True):
    if use_pallas and _pallas_route():
        from sparsify_clip_tpu.ops.pallas_lunif import lunif_loss_pallas

        return _global_batch_kernel(
            lambda g: lunif_loss_pallas(g, t), (x,)
        )
    return lunif_loss(x, t)


def fused_infonce_loss(
    img: jnp.ndarray, txt: jnp.ndarray, temperature, use_pallas: bool = True
):
    if use_pallas and _pallas_route():
        from sparsify_clip_tpu.ops.pallas_infonce import infonce_loss_pallas

        return _global_batch_kernel(
            infonce_loss_pallas, (img, txt),
            (jnp.asarray(temperature, jnp.float32),),
        )
    return contrastive_loss(img, txt, temperature)
