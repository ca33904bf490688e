"""GPipe-style pipeline parallelism over the mesh 'model' axis.

The reference scales with ``torch.nn.DataParallel`` only
(sparsify_clip.py:703); tensor parallelism (mesh.py TP rules) already
covers wide towers.  This module adds the third axis the deep LAION
towers (ViT-H/g/bigG: 32-48 transformer blocks) want on small-HBM
chips: **stage parallelism** — each device holds ``L/S`` consecutive
blocks of a scan-layout tower and microbatches flow stage-to-stage
over ICI via ``ppermute``.

Design (TPU-first, not a port — the reference has no pipeline code):

* Parameters stay in the ``scan_layers`` stacked layout ``(L, ...)``
  (models/layers.py), sharded ``P('model')`` on the layer axis — the
  stage split IS the sharding; ``shard_map`` hands each device its
  ``(L/S, ...)`` slice with zero data movement.
* The schedule is a statically-unrolled loop of ``n_micro + S - 1``
  ticks.  Each tick every stage applies its blocks (lax.scan over the
  local layer slice — collective-free inside, so it composes with the
  CPU fake-device mesh, see CLAUDE.md) and hands its activation to the
  next stage with a single ``ppermute``.  Bubbles compute on zeros —
  the standard GPipe (Huang et al. 2019) utilization of
  ``n_micro / (n_micro + S - 1)``.
* The backward pass needs no scheduler: differentiating the pipelined
  forward gives the reversed ppermutes automatically (the transpose of
  a permutation collective is its inverse), i.e. backward microbatches
  flow last-stage-first exactly like GPipe's backward.
* Per-(microbatch, stage) rematerialization (``jax.checkpoint`` around
  the stage body) keeps live activations at one microbatch per stage —
  GPipe's memory profile — instead of ``n_micro`` full activations.

Losses, optimizer, and the surrounding train step stay in global-view
jit; only the block trunk runs under shard_map.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sparsify_clip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def stacked_layers(tree: Any) -> int:
    """Leading (layer) axis length of a scan-layout param tree."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        raise ValueError("empty parameter tree")
    return leaves[0].shape[0]


def validate_pipeline(
    n_layers: int, stages: int, local_batch: int, n_micro: int
) -> None:
    if n_micro < 1:
        raise ValueError(
            f"pipeline: pipeline_microbatches must be >= 1, got {n_micro}"
        )
    if n_layers % stages:
        raise ValueError(
            f"pipeline: {n_layers} layers not divisible by {stages} stages"
        )
    if local_batch % n_micro:
        raise ValueError(
            f"pipeline: per-data-shard batch {local_batch} not divisible "
            f"by {n_micro} microbatches"
        )


def gpipe_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    n_micro: Optional[int] = None,
    checkpoint_micro: bool = True,
) -> jnp.ndarray:
    """Apply a stacked block sequence as an S-stage GPipe pipeline.

    ``stage_fn(local_params, x) -> x`` applies one stage's worth of
    layers, where ``local_params`` is the ``(L/S, ...)`` slice of
    ``stacked_params`` that shard_map delivers to each device.
    ``x`` is the (global) activation batch, sharded over the data axis;
    output is identical in value to applying all ``L`` layers in order.

    ``n_micro`` defaults to the stage count (bubble fraction
    ``(S-1)/(2S-1)``); raise it to amortize bubbles at the cost of
    smaller per-tick matmuls.
    """
    stages = mesh.shape[MODEL_AXIS]
    dp = mesh.shape[DATA_AXIS]
    if n_micro is None:
        n_micro = max(stages, 1)
    n_layers = stacked_layers(stacked_params)
    if x.shape[0] % dp:
        raise ValueError(f"batch {x.shape[0]} not divisible by data axis {dp}")
    validate_pipeline(n_layers, stages, x.shape[0] // dp, n_micro)

    fn = jax.checkpoint(stage_fn) if checkpoint_micro else stage_fn
    fwd_perm = [(i, i + 1) for i in range(stages - 1)]

    def worker(local_params, x_local):
        stage = jax.lax.axis_index(MODEL_AXIS)
        b_local = x_local.shape[0]
        micro = x_local.reshape(
            n_micro, b_local // n_micro, *x_local.shape[1:]
        )
        zeros = jnp.zeros_like(micro[0])

        prev = zeros
        collected = []
        for t in range(n_micro + stages - 1):
            fed = micro[t] if t < n_micro else zeros
            if stages > 1:
                incoming = jax.lax.ppermute(prev, MODEL_AXIS, fwd_perm)
                x_in = jnp.where(stage == 0, fed, incoming)
            else:
                x_in = fed
            prev = fn(local_params, x_in)
            if t >= stages - 1:
                # microbatch t-(S-1) exits the last stage this tick;
                # mask-and-psum delivers it to every stage replica (the
                # head/loss run replicated over 'model')
                collected.append(
                    jnp.where(stage == stages - 1, prev, jnp.zeros_like(prev))
                )
        out = jax.lax.psum(jnp.stack(collected), MODEL_AXIS)
        return out.reshape(x_local.shape)

    return jax.shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        # pallas_call out_shapes carry no vma annotations, so the
        # varying-axes checker rejects the fused-attention kernel inside
        # the stage body (same reason as mha_pallas_sharded's wrapper)
        check_vma=False,
    )(stacked_params, x)
