"""Device mesh + sharding rules.

The reference's entire parallelism story is ``torch.nn.DataParallel``
(sparsify_clip.py:703) — single-process multi-GPU replicate/scatter,
which its own ``.module`` calls bypass anyway (SURVEY.md §2.4).  The
TPU-native replacement is a ``jax.sharding.Mesh`` with two axes:

* ``data`` — batch sharding (the axis that actually scales CLIP: the
  global B×B loss couples every pair, so embeddings are all-gathered
  over ICI while encoder FLOPs stay sharded);
* ``model`` — optional Megatron-style tensor parallelism of the MLP /
  attention projections, expressed purely as parameter sharding
  annotations (XLA inserts the collectives).  Size 1 (off) reproduces
  reference semantics; the axis exists so model scaling is a config
  change, not a rewrite.

Everything is global-view jit: code is written on full arrays,
shardings are annotations, and XLA emits psum/all-gather on ICI.
Explicit shard_map variants (for kernels that want manual collectives)
live in :mod:`sparsify_clip_tpu.parallel.dist_losses`.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data=-1`` uses all remaining devices.  On a single chip this
    yields a 1×1 mesh — the code path is identical from 1 to N chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1:
        raise ValueError(f"model axis must be >= 1, got {model}")
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules: param path regex → PartitionSpec.  Dense
# kernels are (in, out).  Column-parallel (shard out dim): qkv + mlp up.
# Row-parallel (shard in dim): attention out + mlp down.  Everything
# else (embeddings, LN, small heads) replicated.
_TP_RULES = [
    (re.compile(r".*(in_proj|c_fc)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*(out_proj|c_proj)/kernel$"), P(MODEL_AXIS, None)),
]


def _spec_for_path(path: str, model_parallel: bool) -> P:
    if model_parallel:
        for pattern, spec in _TP_RULES:
            if pattern.match(path):
                return spec
    return P()


def _path_str(key_path) -> str:
    return "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in key_path)


def param_shardings(params: Any, mesh: Mesh, pipeline: bool = False) -> Any:
    """Pytree of NamedShardings for a model param tree.

    With mesh model-axis size 1 everything is replicated (pure DP).
    With model > 1 the transformer matmul weights shard Megatron-style.
    The path rules also match the optimizer-moment copies of the same
    kernels (mu/nu mirror the param tree), so this works on any pytree
    that embeds param-shaped leaves — e.g. a whole TrainState.

    ``pipeline=True`` reinterprets the model axis as GPipe stages
    (parallel/pipeline.py): instead of the TP matmul-dim rules, the
    scan-layout block stacks (``layers_scan`` subtrees) shard their
    leading LAYER axis over 'model' — exactly the slice shard_map hands
    each stage, so the pipeline moves no parameter bytes.  Everything
    outside the stacks (embeddings, heads, LN) stays replicated.
    """
    model_parallel = mesh.shape[MODEL_AXIS] > 1
    stages = mesh.shape[MODEL_AXIS]

    def assign(key_path, leaf):
        path = _path_str(key_path)
        if pipeline:
            ndim = getattr(leaf, "ndim", 0)
            if (
                "layers_scan" in path and ndim >= 1
                and leaf.shape[0] % stages == 0
            ):
                return NamedSharding(mesh, P(MODEL_AXIS))
            return NamedSharding(mesh, P())
        spec = _spec_for_path(path, model_parallel)
        # scan-over-layers stacks kernels with a leading (layers, ...)
        # axis; the rank-2 TP rules still name the right matmul dims —
        # left-pad with None so (L, in, out) shards exactly like (in, out)
        ndim = getattr(leaf, "ndim", None)
        if len(spec) and ndim is not None and ndim > len(spec):
            spec = P(*([None] * (ndim - len(spec)) + list(spec)))
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_over_data(tree: Any, mesh: Mesh, base_shards: Any) -> Any:
    """Shard every array leaf of ``tree`` over the DATA axis, on top of
    whatever the TP rules already assigned in ``base_shards``.

    For each leaf, pick the largest dimension that (a) the base spec
    leaves unsharded and (b) is divisible by the data-axis size, and
    shard it over ``data``.  Scalars (Adam's ``count``, schedule steps,
    the temperature) and indivisible leaves keep their base sharding —
    partial coverage is fine, every sharded byte is HBM back.

    This one rule is both ZeRO-1 (applied to the optimizer moments,
    :func:`zero1_opt_shardings`) and FSDP (applied to the params too,
    ``fsdp: true`` in train.py): XLA turns the annotations into the
    per-layer all-gather / grad reduce-scatter exchanges over ICI.
    """
    dp = mesh.shape[DATA_AXIS]
    if dp == 1:
        return base_shards

    def assign(leaf, base: NamedSharding):
        ndim = getattr(leaf, "ndim", None)
        if not ndim:
            return base
        spec = list(base.spec) + [None] * (ndim - len(base.spec))
        candidates = [
            i for i in range(ndim)
            if spec[i] is None and leaf.shape[i] % dp == 0
        ]
        if not candidates:
            return base
        dim = max(candidates, key=lambda i: leaf.shape[i])
        spec[dim] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(assign, tree, base_shards)


def zero1_opt_shardings(opt_state: Any, mesh: Mesh, base_shards: Any) -> Any:
    """ZeRO-1 shardings for an optimizer-state tree: moments shard over
    the DATA axis on top of whatever the TP rules assigned.

    Correctness story: grads and params stay replicated, the moment
    EMAs are elementwise, so each device computes exactly the update
    slice it owns and XLA all-gathers the (param-sized) update once
    per step over ICI — the standard ZeRO-1 exchange (Rajbhandari et
    al. 2020), expressed purely as sharding annotations.  Trajectory
    equality vs replicated state is asserted in tests/test_zero1.py.
    """
    return shard_over_data(opt_state, mesh, base_shards)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh, sharded along the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
