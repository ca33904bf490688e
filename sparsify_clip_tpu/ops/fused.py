"""Backend selection for the fused loss kernels.

Single device: the Pallas kernels (``ops/pallas_*``) — tiled, never
materializing the N×N block in HBM.  Multi-device (dp > 1): the
ring-chunked distributed formulations
(:mod:`sparsify_clip_tpu.parallel.dist_losses`) inside a full-mesh
shard_map — embeddings stay sharded over the data axis, chunks travel
the ppermute ring, and no device ever holds the (N, D) gathered
matrices or a replicated N² block.  Off-TPU (and for
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


def _require_data_axis(am):
    from sparsify_clip_tpu.parallel.mesh import DATA_AXIS

    if DATA_AXIS not in am.axis_names:
        raise ValueError(
            "the fused losses need the training mesh's "
            f"'{DATA_AXIS}' axis to lay out their ring / gather; "
            f"got mesh axes {am.axis_names}.  Trace under the standard "
            "('data', 'model') mesh (parallel/mesh.py) or pass "
            "use_pallas=False for the XLA twins."
        )
    return DATA_AXIS


def _global_batch_kernel(kernel, arrays, scalars=()):
    """Run a whole-batch loss kernel replicated on a multi-device mesh.

    FALLBACK path (dp == 1, or a global batch not divisible by dp — the
    dp > 1 default is :func:`_ring_loss`): constrain the embeddings to
    fully replicated (ONE all-gather per tensor per step — issued in
    regular SPMD space, so XLA CSEs it when several loss terms consume
    the same embeddings), then run the kernel inside a full-mesh
    shard_map (all axes manual — the only placement mosaic accepts)
    where each device already holds the global batch.  The gather's
    transpose reduce-scatters the embedding grads, so backward is
    exact.  With dp == 1 (the usual reason to be here) nothing is
    actually gathered over the data axis and the only redundancy is the
    standard loss replication across the model axis.
    """
    am = _kernel_mesh()
    if am is None:
        return kernel(*arrays, *scalars)

    from jax.sharding import NamedSharding, PartitionSpec as P

    _require_data_axis(am)

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


def _ring_loss(ring_fn, arrays, scalars=()):
    """Run a ring-chunked distributed loss on a multi-device mesh.

    The dp > 1 form of the fused losses: embeddings stay sharded over
    the data axis (in_specs P('data') — no (N, D) all-gather, no
    replicated N² block) and the per-shard ring formulation from
    :mod:`sparsify_clip_tpu.parallel.dist_losses` runs inside a
    full-mesh shard_map.  Each device computes only its local-rows ×
    visiting-chunk (b, b) blocks; softmax/pair statistics accumulate
    online around the ppermute ring and the partial sums psum.  Across
    the model axis the ring is replicated (standard loss replication
    under TP); across the data axis nothing is.
    """
    am = _kernel_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_axis = _require_data_axis(am)

    sharded = [
        jax.lax.with_sharding_constraint(a, NamedSharding(am, P(data_axis)))
        for a in arrays
    ]

    def worker(arrs, scls):
        return ring_fn(*arrs, *scls)

    # NOTE check_vma stays ON here (unlike _global_batch_kernel): the
    # ring body is pure XLA, and vma tracking is what makes the
    # transpose exact — with check_vma=False the untiled-output
    # cotangent is scaled 1/dp and replicated-input cotangents are
    # psum'd over the model axis, compounding to dp-wrong embedding
    # grads (measured 1/4 on a 4x2 mesh).
    return jax.shard_map(
        worker,
        mesh=am,
        in_specs=(P(data_axis), P()),
        out_specs=P(),
    )(sharded, list(scalars))


def _mesh_route(arrays):
    """None (single device) | 'ring' (dp > 1, divisible) | 'replicate'."""
    am = _kernel_mesh()
    if am is None:
        return None
    from sparsify_clip_tpu.parallel.mesh import DATA_AXIS

    dp = dict(am.shape).get(DATA_AXIS, 1)
    if dp > 1 and all(a.shape[0] % dp == 0 for a in arrays):
        return "ring"
    return "replicate"


def fused_lunif_loss(x: jnp.ndarray, t: float = 2.0, use_pallas: bool = True):
    if use_pallas and _pallas_route():
        route = _mesh_route((x,))
        if route == "ring":
            from sparsify_clip_tpu.parallel.dist_losses import ring_lunif_loss

            from sparsify_clip_tpu.parallel.mesh import DATA_AXIS

            return _ring_loss(
                lambda s: ring_lunif_loss(s, t, DATA_AXIS), (x,)
            )
        from sparsify_clip_tpu.ops.pallas_lunif import lunif_loss_pallas

        return _global_batch_kernel(
            lambda g: lunif_loss_pallas(g, t), (x,)
        )
    return lunif_loss(x, t)


def fused_infonce_loss(
    img: jnp.ndarray, txt: jnp.ndarray, temperature, use_pallas: bool = True
):
    if use_pallas and _pallas_route():
        route = _mesh_route((img, txt))
        if route == "ring":
            from sparsify_clip_tpu.parallel.dist_losses import ring_infonce_loss

            from sparsify_clip_tpu.parallel.mesh import DATA_AXIS

            return _ring_loss(
                lambda i, s, T: ring_infonce_loss(i, s, T, DATA_AXIS),
                (img, txt),
                (jnp.asarray(temperature, jnp.float32),),
            )
        from sparsify_clip_tpu.ops.pallas_infonce import infonce_loss_pallas

        return _global_batch_kernel(
            infonce_loss_pallas, (img, txt),
            (jnp.asarray(temperature, jnp.float32),),
        )
    return contrastive_loss(img, txt, temperature)
