"""Checkpointing: full train state via orbax + weights-only export.

The reference checkpoints weights only (``torch.save(state_dict)``
every N epochs, sparsify_clip.py:982-984) and resumes weights-only —
optimizer/scheduler/temperature restart from scratch (sparsify_clip.py:719-724,
SURVEY.md §3.4).  Here:

* ``save_full`` / ``restore_full`` — orbax checkpoints of the complete
  :class:`~sparsify_clip_tpu.train.TrainState` (params, BN stats,
  optimizer moments, temperature, step, PRNG key), so resume is exact;
* ``save_weights`` / ``load_weights`` — params-only export mirroring
  reference behavior (resume_epoch semantics included);
* ``load_torch_clip_state_dict`` — convert an open_clip/CLIP PyTorch
  ``state_dict`` into this framework's param tree for cross-checks.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_full(state, directory: str, step: Optional[int] = None) -> str:
    """Orbax-save the full TrainState under ``directory/step_{N}``."""
    step = int(state.step) if step is None else step
    path = os.path.join(_abs(directory), f"step_{step}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


_async_ckptr: Optional["ocp.AsyncCheckpointer"] = None


def save_full_async(state, directory: str, step: Optional[int] = None) -> str:
    """Non-blocking :func:`save_full`: the device→host snapshot happens
    now, serialization/disk IO proceed in a background thread so the
    train loop keeps stepping (the reference's torch.save blocks the
    step loop, sparsify_clip.py:982-984).  Call
    :func:`wait_for_async_saves` before reading the files or exiting.
    """
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    step = int(state.step) if step is None else step
    path = os.path.join(_abs(directory), f"step_{step}")
    _async_ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    return path


def wait_for_async_saves() -> None:
    """Block until every :func:`save_full_async` has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def restore_full(directory_or_path: str, abstract_state):
    """Restore a TrainState saved by :func:`save_full`.

    ``abstract_state`` is a matching TrainState of ShapeDtypeStructs or
    a concrete template (e.g. a freshly created state)."""
    path = _abs(directory_or_path)
    if not os.path.basename(path).startswith("step_"):
        steps = sorted(
            (int(d.split("_", 1)[1]), d)
            for d in os.listdir(path)
            if d.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"no step_* checkpoints under {path}")
        path = os.path.join(path, steps[-1][1])
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_state)


def latest_step(directory: str) -> Optional[int]:
    path = _abs(directory)
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_", 1)[1]) for d in os.listdir(path) if d.startswith("step_")
    ]
    return max(steps) if steps else None


# ---------------------------------------------------------------- weights-only
def collect_host_arrays(params: Any) -> Dict[str, np.ndarray]:
    """Flatten a param tree to ``{slash/path: np.ndarray}`` on the host.

    Multihost-safe: leaves sharded across processes (FSDP/ZeRO under
    ``multihost: true``) are all-gathered — a collective, so EVERY
    process must call this even if only process 0 writes the file.
    """
    multihost = jax.process_count() > 1
    if multihost:
        from sparsify_clip_tpu.parallel.multihost import allgather_to_host

    def to_host(leaf) -> np.ndarray:
        if multihost and isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
            return allgather_to_host(leaf)
        return np.asarray(leaf)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for key_path, leaf in flat:
        name = "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in key_path)
        arrays[name] = to_host(leaf)
    return arrays


def save_weights(params: Any, path: str) -> str:
    """Flat .npz export of a param tree (the reference's periodic
    ``torch.save(model.state_dict())`` equivalent).

    Under multihost every process must call this (the host gather is
    collective); only process 0 touches the filesystem.
    """
    arrays = collect_host_arrays(params)
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(_abs(path)) or ".", exist_ok=True)
        np.savez(_abs(path), **arrays)
    return path


def load_weights(params_template: Any, path: str) -> Any:
    """Load an .npz produced by :func:`save_weights` into the shape of
    ``params_template`` (weights-only resume, sparsify_clip.py:719-724)."""
    data = np.load(_abs(path) if path.endswith(".npz") else _abs(path) + ".npz")

    def fill(key_path, leaf):
        name = "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in key_path)
        arr = data[name]
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {name}: {arr.shape} vs {leaf.shape}")
        return jax.numpy.asarray(arr, dtype=leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, params_template)


# ------------------------------------------------------- torch interop
def export_torch_text_tower(params: Any) -> Dict[str, "np.ndarray"]:
    """Map this framework's text-tower params to open_clip/CLIP torch
    ``state_dict`` naming (inverse of :func:`load_torch_clip_state_dict`
    for the text side): dense kernels transposed back to (out, in).

    Enables loading a TPU-trained text tower into a torch CLIP for
    cross-framework numerics checks.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict[str, np.ndarray] = {}
    for key_path, leaf in flat:
        path = "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in key_path)
        arr = np.asarray(leaf)
        if not path.startswith("text/"):
            continue
        p = path[len("text/"):]
        if p == "token_embedding":
            out["token_embedding.weight"] = arr
        elif p == "positional_embedding":
            out["positional_embedding"] = arr
        elif p == "text_projection":
            out["text_projection"] = arr
        elif p.startswith("ln_final/ln/"):
            kind = "weight" if p.endswith("scale") else "bias"
            out[f"ln_final.{kind}"] = arr
        elif p.startswith("transformer/resblock_"):
            rest = p[len("transformer/resblock_"):]
            n, sub = rest.split("/", 1)
            prefix = f"transformer.resblocks.{n}"
            if sub.startswith(("ln_1/ln/", "ln_2/ln/")):
                ln = sub.split("/")[0]
                kind = "weight" if sub.endswith("scale") else "bias"
                out[f"{prefix}.{ln}.{kind}"] = arr
            elif sub == "attn/in_proj/kernel":
                out[f"{prefix}.attn.in_proj_weight"] = arr.T
            elif sub == "attn/in_proj/bias":
                out[f"{prefix}.attn.in_proj_bias"] = arr
            elif sub == "attn/out_proj/kernel":
                out[f"{prefix}.attn.out_proj.weight"] = arr.T
            elif sub == "attn/out_proj/bias":
                out[f"{prefix}.attn.out_proj.bias"] = arr
            elif sub.startswith("mlp/"):
                name = sub.split("/")[1]  # c_fc | c_proj
                if sub.endswith("kernel"):
                    out[f"{prefix}.mlp.{name}.weight"] = arr.T
                else:
                    out[f"{prefix}.mlp.{name}.bias"] = arr
    return out


def load_torch_clip_state_dict(state_dict: Dict[str, "np.ndarray"]) -> Dict[str, Any]:
    """Map an open_clip/OpenAI CLIP torch ``state_dict`` (tensors or
    ndarrays; ``module.``-prefixed keys accepted — the reference saves
    DataParallel-wrapped dicts, sparsify_clip.py:982) onto this
    framework's naming.  Returns a flat {our_path: array} dict; use
    together with :func:`fill_from_flat`.  Dense kernels are transposed
    from torch's (out, in) to flax's (in, out); conv kernels from OIHW
    to HWIO.

    Both visual towers are covered: ViT (``visual.transformer.*``) and
    the modified ResNet the reference's default ``model: "RN50"``
    instantiates (``visual.layer*`` / ``visual.attnpool.*``,
    sparsify_clip.py:686,982-984).  BatchNorm running statistics map
    into the flax ``batch_stats`` collection and are returned under a
    ``batch_stats/`` path prefix; torch's ``num_batches_tracked``
    counters have no flax equivalent and are dropped.
    """
    keys = [k[len("module."):] if k.startswith("module.") else k for k in state_dict]
    resnet_visual = any(
        k.startswith(("visual.layer", "visual.attnpool.")) for k in keys
    )
    out: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = np.asarray(getattr(value, "numpy", lambda: value)())
        if key.startswith("module."):
            key = key[len("module."):]
        if key == "logit_scale":
            out["logit_scale"] = arr
            continue
        parts = key.split(".")
        if parts[0] == "token_embedding":
            out["text/token_embedding"] = arr
        elif parts[0] == "positional_embedding":
            out["text/positional_embedding"] = arr
        elif parts[0] == "text_projection":
            out["text/text_projection"] = arr
        elif parts[0] == "ln_final":
            out[f"text/ln_final/ln/{'scale' if parts[1]=='weight' else 'bias'}"] = arr
        elif parts[0] == "transformer":
            # transformer.resblocks.N....
            n = parts[2]
            rest = ".".join(parts[3:])
            out.update(_map_resblock(f"text/transformer/resblock_{n}", rest, arr))
        elif parts[0] == "visual":
            rest = ".".join(parts[1:])
            if resnet_visual:
                out.update(_map_visual_resnet(rest, arr))
            else:
                out.update(_map_visual(rest, arr))
        else:
            out[f"_unmapped/{key}"] = arr
    return out


def fill_from_flat(template: Any, flat: Dict[str, Any], prefix: str = "") -> Any:
    """Fill a param/batch_stats tree from a flat ``{path: array}`` dict
    (as produced by :func:`load_torch_clip_state_dict`), path-joined
    with ``/`` and prefixed by ``prefix``.  Raises on missing keys or
    shape mismatches so silent partial loads are impossible."""
    import jax
    import jax.numpy as jnp

    def fill(key_path, leaf):
        name = prefix + "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in key_path
        )
        if name not in flat:
            raise KeyError(f"missing key {name!r} in converted state_dict")
        arr = np.asarray(flat[name])
        if arr.shape != leaf.shape:
            raise ValueError(f"shape mismatch for {name}: {arr.shape} vs {leaf.shape}")
        return jnp.asarray(arr, dtype=leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, template)


def _map_linear(prefix: str, rest: str, arr: np.ndarray) -> Dict[str, np.ndarray]:
    if rest.endswith("weight"):
        return {f"{prefix}/kernel": arr.T}
    return {f"{prefix}/bias": arr}


def _map_resblock(prefix: str, rest: str, arr: np.ndarray) -> Dict[str, np.ndarray]:
    if rest.startswith("attn.in_proj_"):
        return _map_linear(f"{prefix}/attn/in_proj", rest, arr)
    if rest.startswith("attn.out_proj"):
        return _map_linear(f"{prefix}/attn/out_proj", rest, arr)
    if rest.startswith("mlp.c_fc"):
        return _map_linear(f"{prefix}/mlp/c_fc", rest, arr)
    if rest.startswith("mlp.c_proj"):
        return _map_linear(f"{prefix}/mlp/c_proj", rest, arr)
    for ln in ("ln_1", "ln_2"):
        if rest.startswith(ln):
            kind = "scale" if rest.endswith("weight") else "bias"
            return {f"{prefix}/{ln}/ln/{kind}": arr}
    return {f"{prefix}/_unmapped/{rest}": arr}


def _map_bn(prefix: str, field: str, arr: np.ndarray) -> Dict[str, np.ndarray]:
    """torch BatchNorm2d → flax nn.BatchNorm: weight/bias are params
    (scale/bias); running stats live in the batch_stats collection
    (returned under a ``batch_stats/`` prefix); ``num_batches_tracked``
    has no flax equivalent and is dropped."""
    if field == "weight":
        return {f"{prefix}/scale": arr}
    if field == "bias":
        return {f"{prefix}/bias": arr}
    if field == "running_mean":
        return {f"batch_stats/{prefix}/mean": arr}
    if field == "running_var":
        return {f"batch_stats/{prefix}/var": arr}
    return {}


def _map_visual_resnet(rest: str, arr: np.ndarray) -> Dict[str, np.ndarray]:
    """Modified-ResNet visual tower (the reference's default RN50).

    torch naming (open_clip ModifiedResNet): 3-conv stem
    ``conv{1,2,3}/bn{1,2,3}``, stages ``layer{1-4}.{i}`` with bottleneck
    ``conv{1,2,3}/bn{1,2,3}`` and ``downsample.{0: conv, 1: bn}``
    (``downsample.-1`` is a parameterless AvgPool), and the attention
    pool ``attnpool.{positional_embedding,q/k/v/c_proj}``."""
    p = "visual"
    parts = rest.split(".")
    if parts[0].startswith("conv") and parts[-1] == "weight":
        return {f"{p}/stem_{parts[0]}/kernel": arr.transpose(2, 3, 1, 0)}
    if parts[0].startswith("bn"):
        return _map_bn(f"{p}/stem_{parts[0]}", parts[1], arr)
    if parts[0] == "attnpool":
        if parts[1] == "positional_embedding":
            return {f"{p}/attnpool/positional_embedding": arr}
        if parts[1] in ("q_proj", "k_proj", "v_proj", "c_proj"):
            return _map_linear(f"{p}/attnpool/{parts[1]}", parts[2], arr)
        return {f"{p}/_unmapped/{rest}": arr}
    if parts[0].startswith("layer"):
        prefix = f"{p}/{parts[0]}_block{parts[1]}"
        sub = parts[2]
        if sub.startswith("conv") and parts[3] == "weight":
            return {f"{prefix}/{sub}/kernel": arr.transpose(2, 3, 1, 0)}
        if sub.startswith("bn"):
            return _map_bn(f"{prefix}/{sub}", parts[3], arr)
        if sub == "downsample":
            if parts[3] == "0" and parts[4] == "weight":
                return {f"{prefix}/downsample_conv/kernel": arr.transpose(2, 3, 1, 0)}
            if parts[3] == "1":
                return _map_bn(f"{prefix}/downsample_bn", parts[4], arr)
    return {f"{p}/_unmapped/{rest}": arr}


def _map_visual(rest: str, arr: np.ndarray) -> Dict[str, np.ndarray]:
    p = "visual"
    if rest == "class_embedding":
        return {f"{p}/class_embedding": arr}
    if rest == "positional_embedding":
        return {f"{p}/positional_embedding": arr}
    if rest == "proj":
        return {f"{p}/proj": arr}
    if rest.startswith("conv1.weight"):
        return {f"{p}/conv1/kernel": arr.transpose(2, 3, 1, 0)}  # OIHW→HWIO
    for ln in ("ln_pre", "ln_post"):
        if rest.startswith(ln):
            kind = "scale" if rest.endswith("weight") else "bias"
            return {f"{p}/{ln}/ln/{kind}": arr}
    if rest.startswith("transformer.resblocks."):
        parts = rest.split(".")
        n = parts[2]
        return _map_resblock(f"{p}/transformer/resblock_{n}", ".".join(parts[3:]), arr)
    return {f"{p}/_unmapped/{rest}": arr}
