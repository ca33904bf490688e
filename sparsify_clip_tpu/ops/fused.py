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
from sparsify_clip_tpu.ops._overrides import flag_override


@functools.lru_cache()
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_FORCE_PALLAS_LOSSES = False


force_pallas_losses = flag_override(
    __name__, "_FORCE_PALLAS_LOSSES",
    "Trace-time override: the dispatchers below route to the Pallas "
    "kernels regardless of ``jax.default_backend()``.  For "
    "cross-platform lowering tests that export TPU artifacts from the "
    "CPU host (the twin of pallas_attention.force_pallas_attention).",
)


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
    gather-then-compute-replicated: constrain the embeddings to fully
    replicated (ONE all-gather per tensor per step — issued in regular
    SPMD space, so XLA CSEs it when several loss terms consume the same
    embeddings), then run the kernel inside a full-mesh shard_map (all
    axes manual — the only placement mosaic accepts) where each device
    already holds the global batch.  The gather's transpose
    reduce-scatters the embedding grads, so backward is exact.  NOTE
    the kernel's B×B block itself is REPLICATED across the mesh (dp×
    the loss FLOPs of the data-sharded XLA twins) — the loss block is
    tiny next to the towers, but the fully-distributed alternative
    lives in parallel/dist_losses.py (see docs/SCALING.md).
    """
    am = _kernel_mesh()
    if am is None:
        return kernel(*arrays, *scalars)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.parallel.mesh import DATA_AXIS

    if DATA_AXIS not in am.axis_names:
        raise ValueError(
            "the fused Pallas losses need the training mesh's "
            f"'{DATA_AXIS}' axis to place their one replicating gather; "
            f"got mesh axes {am.axis_names}.  Trace under the standard "
            "('data', 'model') mesh (parallel/mesh.py) or pass "
            "use_pallas=False for the XLA twins."
        )

    replicated = [
        jax.lax.with_sharding_constraint(a, NamedSharding(am, P()))
        for a in arrays
    ]

    def worker(arrs, scls):
        return kernel(*arrs, *scls)

    return jax.shard_map(
        worker,
        mesh=am,
        in_specs=(P(), P()),
        out_specs=P(),
        # pallas_call out_shapes carry no vma annotations
        check_vma=False,
    )(replicated, list(scalars))


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
