"""Deployment export: serialized, self-contained encoder artifacts.

The reference has no deployment story at all (its only inference is
the eval loop, sparsify_clip.py:534-676).  This module turns trained
towers into **jax.export artifacts** — StableHLO with the weights
baked in as constants — the TPU-native equivalent of a TorchScript /
ONNX export:

* serving hosts need the artifact + jax only: no model zoo, no config,
  no framework model code, no re-tracing;
* ``bake_params=False`` splits weights out into ``weights.npz`` and
  exports programs that take the variables pytree as an argument —
  KB-sized programs, shared/hot-swappable weights, and compatibility
  with stacks that cap program size (the axon remote-compile tunnel
  rejects GB-scale constant-folded programs with HTTP 413, for one);
* exports are **batch-polymorphic** by default (symbolic leading dim),
  so one artifact serves any batch size;
* ``platforms=["tpu", "cpu"]`` lowers one artifact for both targets
  (export does not need the target hardware present);
* outputs are the serving contract of
  :class:`sparsify_clip_tpu.inference.CLIPEncoder`: L2-normalized
  fp32 embeddings.

Symbolic-batch / multi-platform artifacts trace the towers through the
XLA einsum attention path (``force_xla_attention``): the Pallas MHA
grid is tiled against concrete shapes at trace time, so it cannot live
inside a shape-polymorphic program.  Pass a concrete ``batch`` to keep
the Pallas kernels in a TPU-only artifact.

CLI::

    python -m sparsify_clip_tpu.export \
        --model RN50 --weights models/run.npz --out exported/rn50 \
        [--batch 64] [--platforms tpu,cpu]
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from sparsify_clip_tpu.utils.numerics import l2_normalize

_IMAGE_FILE = "image_encoder.jaxexport"
_TEXT_FILE = "text_encoder.jaxexport"
_META_FILE = "export_meta.json"
_WEIGHTS_FILE = "weights.npz"


def _unflatten_variables(data) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree


def export_encoders(
    model,
    variables: Dict[str, Any],
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    bake_params: bool = True,
    uint8_input: bool = False,
) -> Dict[str, "jax_export.Exported"]:
    """Export both towers as jax.export programs.

    ``batch=None`` (default) exports with a symbolic batch dimension;
    an int pins it (and keeps Pallas kernels eligible on TPU).

    ``bake_params=True`` embeds the weights as program constants — one
    self-contained file per tower.  ``bake_params=False`` exports
    programs that take the variables pytree as their first argument:
    the artifact stays program-sized (KBs, not GBs), several exports
    can share one weights file, and serving stacks that cap program
    size (or hot-swap weights) keep working.

    ``uint8_input=True`` bakes CLIP pixel normalization into the image
    program: it takes RAW (B, H, W, 3) uint8 instead of normalized
    fp32 — serving hosts ship 4× less data and need no preprocessing
    constants at all.

    Returns ``{"image": Exported, "text": Exported}``.
    """
    from sparsify_clip_tpu.ops.pallas_attention import force_xla_attention

    cfg = model.cfg

    def _image_fwd(v, images):
        if uint8_input:
            from sparsify_clip_tpu.ops.image import normalize_batch

            images = normalize_batch(images.astype(jnp.float32) / 255.0)
        emb = model.apply(v, images, method=model.encode_image)
        return l2_normalize(emb.astype(jnp.float32))

    if bake_params:
        def encode_image(images):
            return _image_fwd(variables, images)

        def encode_text(tokens):
            emb = model.apply(variables, tokens, method=model.encode_text)
            return l2_normalize(emb.astype(jnp.float32))
    else:
        encode_image = _image_fwd

        def encode_text(v, tokens):
            emb = model.apply(v, tokens, method=model.encode_text)
            return l2_normalize(emb.astype(jnp.float32))

    poly = batch is None
    if poly:
        # separate scopes per export: the two programs don't share dims
        (b_img,) = jax_export.symbolic_shape("b")
        (b_txt,) = jax_export.symbolic_shape("b")
    else:
        b_img = b_txt = int(batch)
    img_spec = jax.ShapeDtypeStruct(
        (b_img, cfg.image_size, cfg.image_size, 3),
        jnp.uint8 if uint8_input else jnp.float32,
    )
    txt_spec = jax.ShapeDtypeStruct((b_txt, cfg.context_length), jnp.int32)
    var_spec = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), variables
    )
    img_args = (img_spec,) if bake_params else (var_spec, img_spec)
    txt_args = (txt_spec,) if bake_params else (var_spec, txt_spec)

    kwargs = {"platforms": list(platforms)} if platforms else {}
    # Pallas MHA is only eligible when the artifact targets exactly the
    # trace-time backend: any foreign platform in the list (not just a
    # multi-platform export) must lower through the portable XLA
    # attention path, or the program bakes in a TPU-only custom call.
    foreign_platform = bool(platforms) and (
        set(p.lower() for p in platforms) != {jax.default_backend()}
    )
    if poly or foreign_platform:
        with force_xla_attention():
            image = jax_export.export(jax.jit(encode_image), **kwargs)(*img_args)
            text = jax_export.export(jax.jit(encode_text), **kwargs)(*txt_args)
    else:
        image = jax_export.export(jax.jit(encode_image), **kwargs)(*img_args)
        text = jax_export.export(jax.jit(encode_text), **kwargs)(*txt_args)
    return {"image": image, "text": text}


def save_exported(
    model,
    variables: Dict[str, Any],
    out_dir: str,
    model_name: Optional[str] = None,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    bake_params: bool = True,
    uint8_input: bool = False,
) -> str:
    """Export + serialize both towers under ``out_dir``.

    Writes ``image_encoder.jaxexport`` / ``text_encoder.jaxexport``
    and ``export_meta.json``; with ``bake_params=False`` the weights
    land in a sibling ``weights.npz`` instead of inside the programs.
    """
    exported = export_encoders(
        model, variables, batch=batch, platforms=platforms,
        bake_params=bake_params, uint8_input=uint8_input,
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _IMAGE_FILE), "wb") as fh:
        fh.write(bytes(exported["image"].serialize()))
    with open(os.path.join(out_dir, _TEXT_FILE), "wb") as fh:
        fh.write(bytes(exported["text"].serialize()))
    if not bake_params:
        # same flat "/"-joined npz convention as every other weights
        # file in the framework (checkpoints.save_weights)
        from sparsify_clip_tpu.checkpoints import save_weights

        save_weights(variables, os.path.join(out_dir, _WEIGHTS_FILE))
    cfg = model.cfg
    meta = {
        "model": model_name or cfg.name,
        "image_size": cfg.image_size,
        "context_length": cfg.context_length,
        "embed_dim": cfg.embed_dim,
        "batch": batch,  # null = symbolic (any batch size)
        "baked_params": bake_params,
        "uint8_input": uint8_input,
        "platforms": list(exported["image"].platforms),
        "jax_version": jax.__version__,
        "output": "L2-normalized fp32 embeddings",
    }
    with open(os.path.join(out_dir, _META_FILE), "w") as fh:
        json.dump(meta, fh, indent=1)
    return out_dir


class ExportedEncoder:
    """Serving-side loader for a :func:`save_exported` directory.

    Calls run the deserialized programs directly — no model code, no
    tokenizer, no config needed beyond the artifact directory (pass a
    tokenizer only if you want :meth:`encode_texts` on raw strings).
    """

    def __init__(self, directory: str, tokenizer=None):
        with open(os.path.join(directory, _META_FILE)) as fh:
            self.meta = json.load(fh)
        with open(os.path.join(directory, _IMAGE_FILE), "rb") as fh:
            self._image = jax_export.deserialize(bytearray(fh.read()))
        with open(os.path.join(directory, _TEXT_FILE), "rb") as fh:
            self._text = jax_export.deserialize(bytearray(fh.read()))
        self._variables = None
        if not self.meta.get("baked_params", True):
            self._variables = _unflatten_variables(
                np.load(os.path.join(directory, _WEIGHTS_FILE))
            )
        self.tokenizer = tokenizer

    def encode_images(self, images: np.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) pixels → (B, D) unit fp32.  Normalized float32
        pixels normally; RAW uint8 when the artifact was exported with
        ``uint8_input=True`` (normalization is baked into the program —
        check ``meta["uint8_input"]``)."""
        dtype = jnp.uint8 if self.meta.get("uint8_input") else jnp.float32
        x = jnp.asarray(images, dtype)
        if self._variables is not None:
            return self._image.call(self._variables, x)
        return self._image.call(x)

    def encode_tokens(self, tokens: np.ndarray) -> jnp.ndarray:
        t = jnp.asarray(tokens, jnp.int32)
        if self._variables is not None:
            return self._text.call(self._variables, t)
        return self._text.call(t)

    def encode_texts(self, texts: Sequence[str]) -> jnp.ndarray:
        if self.tokenizer is None:
            raise ValueError("pass a tokenizer to encode raw strings")
        return self.encode_tokens(np.asarray(self.tokenizer(list(texts))))


def main(argv: Optional[Sequence[str]] = None) -> str:
    import argparse

    from sparsify_clip_tpu.checkpoints import load_weights
    from sparsify_clip_tpu.models import create_model

    ap = argparse.ArgumentParser(
        description="Export trained towers as self-contained jax.export "
        "artifacts (StableHLO, weights baked in)."
    )
    ap.add_argument("--model", required=True)
    ap.add_argument("--weights", help=".npz from save_weights (random init if omitted)")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--batch", type=int, default=None,
        help="pin a concrete batch size (default: symbolic, any batch)",
    )
    ap.add_argument(
        "--platforms", default=None,
        help="comma list, e.g. tpu,cpu (default: current backend only)",
    )
    ap.add_argument(
        "--no-bake-params", action="store_true",
        help="keep weights OUT of the programs (written to weights.npz; "
             "programs take the variables pytree as first argument) — "
             "KB-sized artifacts, shared/hot-swappable weights",
    )
    ap.add_argument(
        "--uint8-input", action="store_true",
        help="image program takes RAW uint8 pixels (CLIP normalization "
             "baked in) — 4x smaller inputs, no preprocessing constants "
             "on the serving host",
    )
    args = ap.parse_args(argv)

    model, variables = create_model(args.model, dtype=jnp.float32)
    if args.weights:
        variables = dict(variables)
        variables["params"] = load_weights(variables["params"], args.weights)
    platforms = args.platforms.split(",") if args.platforms else None
    out = save_exported(
        model, variables, args.out, model_name=args.model,
        batch=args.batch, platforms=platforms,
        bake_params=not args.no_bake_params,
        uint8_input=args.uint8_input,
    )
    print(f"exported {args.model} -> {out}")
    return out


if __name__ == "__main__":
    main()
