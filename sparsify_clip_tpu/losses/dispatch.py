"""loss_type string → jit-friendly loss function.

The reference dispatches on ``config["loss_type"]`` with an if/elif
chain inside the inner batch loop (sparsify_clip.py:775-938).  Here the
dispatch happens **once at trace time** — each experiment gets a single
compiled train step — and the ``only_lunif_epochs`` warm-phase switch
(a per-epoch Python condition in the reference, e.g.
sparsify_clip.py:796-799) becomes a ``lax.cond`` on a traced epoch
scalar, so the phase boundary does not trigger recompilation.

**Dead-elif semantics preserved** (SURVEY.md §2.6 landmine): the
reference tests the identical string
``"only_lunif_n_then_anchor+lalign+BETA*lunif(centroids)"`` twice
(sparsify_clip.py:813 and :833); Python takes the first branch, so both
experiment 7 and experiment 8 execute the **per-modality** β-weighted
uniformity and the true-centroid variant at :833-851 is unreachable.
We reproduce the executed semantics.  The unreachable centroid variant
is available under the non-reference name
``"__dead__anchor+lalign+BETA*lunif(centroids)"`` for study.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.losses.align import lalign_loss
from sparsify_clip_tpu.losses.centroids import normalized_centroids
from sparsify_clip_tpu.losses.contrastive import contrastive_loss
from sparsify_clip_tpu.losses.unif import lunif_loss

# Fused-kernel substitutes are injected per-experiment by make_loss_fn
# (sparsify_clip_tpu.ops.fused): same signatures, Pallas on TPU.

Aux = Dict[str, jnp.ndarray]
LossFn = Callable[..., Tuple[jnp.ndarray, Aux]]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LossContext:
    """Per-step scalars threaded into the loss (all traceable).

    Registered as a pytree so it can be passed through ``jit``.

    ``temperature`` is the raw divisor (possibly a learnable parameter,
    sparsify_clip.py:716-717).  ``beta``/``alpha`` come from
    :mod:`sparsify_clip_tpu.schedules` evaluated at the 1-based global
    batch index.  ``warm`` is the traced bool ``epoch <
    only_lunif_epochs``.
    """

    temperature: jnp.ndarray
    beta: jnp.ndarray
    alpha: jnp.ndarray
    warm: jnp.ndarray
    # Optional (B, B) row-stochastic soft-target matrix for the
    # "anchor-roberta" surface, supplied through the batch dict (the
    # reference derives it on host from RoBERTa sentence similarities,
    # sparsify_clip.py:135-157).  None for every other loss_type.
    soft_targets: jnp.ndarray = None
    # SigLIP scalars (loss_type "siglip" only, framework extension):
    # positive multiplier ``exp(t')`` of the learnable log-scale, and
    # the learnable bias.  None for every other loss_type.
    logit_scale: jnp.ndarray = None
    logit_bias: jnp.ndarray = None


def _zero() -> jnp.ndarray:
    return jnp.float32(0.0)


def _warm_lunif(img: jnp.ndarray, txt: jnp.ndarray, lunif=lunif_loss) -> Tuple[jnp.ndarray, Aux]:
    """The only_lunif warm phase: pure per-modality uniformity
    (e.g. sparsify_clip.py:796-799)."""
    lunif_img = lunif(img)
    lunif_txt = lunif(txt)
    loss = (lunif_img + lunif_txt) / 2.0
    return loss, {"anchor": _zero(), "lalign": _zero(), "lunif": loss}


def _anchor_only(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    loss = infonce(img, txt, ctx.temperature)
    return loss, {"anchor": loss, "lalign": _zero(), "lunif": _zero()}


def _anchor_lalign_lunif_modality(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    anchor = infonce(img, txt, ctx.temperature)
    lalign = lalign_loss(img, txt)
    lunif = (lunif(img) + lunif(txt)) / 2.0
    return anchor + lunif + lalign, {"anchor": anchor, "lalign": lalign, "lunif": lunif}


def _anchor_lalign_lunif_centroids(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    anchor = infonce(img, txt, ctx.temperature)
    lunif_c = lunif(normalized_centroids(img, txt))
    lalign = lalign_loss(img, txt)
    return anchor + lalign + lunif_c, {"anchor": anchor, "lalign": lalign, "lunif": lunif_c}


def _anchor_lalign_beta_lunif_modality(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    # Executed semantics of BOTH experiments 7 and 8 (dead-elif; see
    # module docstring / sparsify_clip.py:813-829).
    anchor = infonce(img, txt, ctx.temperature)
    lunif = (lunif(img) + lunif(txt)) / 2.0
    lalign = lalign_loss(img, txt)
    return anchor + lalign + ctx.beta * lunif, {
        "anchor": anchor, "lalign": lalign, "lunif": lunif,
    }


def _anchor_lalign_beta_lunif_centroids_dead(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    # The unreachable reference branch (sparsify_clip.py:833-851).
    anchor = infonce(img, txt, ctx.temperature)
    lunif_c = lunif(normalized_centroids(img, txt))
    lalign = lalign_loss(img, txt)
    return anchor + lalign + ctx.beta * lunif_c, {
        "anchor": anchor, "lalign": lalign, "lunif": lunif_c,
    }


def _anchor_alpha_lalign_beta_lunif_modality(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    # Experiment 9 (sparsify_clip.py:854-875).
    anchor = infonce(img, txt, ctx.temperature)
    lunif = (lunif(img) + lunif(txt)) / 2.0
    lalign = lalign_loss(img, txt)
    return anchor + ctx.alpha * lalign + ctx.beta * lunif, {
        "anchor": anchor, "lalign": lalign, "lunif": lunif,
    }


def _anchor_alpha_lalign_beta_lunif_centroids(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    # Experiment 10 (sparsify_clip.py:879-902).
    anchor = infonce(img, txt, ctx.temperature)
    lunif_c = lunif(normalized_centroids(img, txt))
    lalign = lalign_loss(img, txt)
    return anchor + ctx.alpha * lalign + ctx.beta * lunif_c, {
        "anchor": anchor, "lalign": lalign, "lunif": lunif_c,
    }


def _anchor_roberta(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    # The reference's "anchor-roberta" selection surface: it
    # conditionally loads a RoBERTa sentence encoder for this loss_type
    # (sparsify_clip.py:711-713) but the dispatch branch itself is
    # commented out (:1196-1202), so selecting it there crashes with an
    # undefined `loss`.  Here it is dispatchable: the (B, B) soft-target
    # matrix is host-supplied through the batch dict ("soft_targets").
    from sparsify_clip_tpu.losses.contrastive import contrastive_loss_roberta

    if ctx.soft_targets is None:
        raise ValueError(
            "loss_type 'anchor-roberta' needs a (B, B) 'soft_targets' "
            "matrix in the batch dict (host-computed sentence "
            "similarities, row-stochastic)."
        )
    loss = contrastive_loss_roberta(img, txt, ctx.soft_targets, ctx.temperature)
    return loss, {"anchor": loss, "lalign": _zero(), "lunif": _zero()}


def _siglip(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    # Framework extension (losses/sigmoid.py): pairwise sigmoid
    # contrastive loss with learnable scale/bias.  The scalars arrive
    # through the context (train.py threads them from
    # TrainState.loss_scalars); both must be set.
    from sparsify_clip_tpu.losses.sigmoid import siglip_loss

    if ctx.logit_scale is None or ctx.logit_bias is None:
        raise ValueError(
            "loss_type 'siglip' needs logit_scale/logit_bias in the "
            "LossContext (the train loop supplies them from "
            "TrainState.loss_scalars; direct callers must pass both)."
        )
    loss = siglip_loss(img, txt, ctx.logit_scale, ctx.logit_bias)
    return loss, {"anchor": loss, "lalign": _zero(), "lunif": _zero()}


def _anchor_lalign(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    # Ablation 1 (sparsify_clip.py:922-927).
    anchor = infonce(img, txt, ctx.temperature)
    lalign = lalign_loss(img, txt)
    return anchor + lalign, {"anchor": anchor, "lalign": lalign, "lunif": _zero()}


def _anchor_lunif_centroids(img, txt, ctx: LossContext, infonce=contrastive_loss, lunif=lunif_loss):
    # Ablation 2 (sparsify_clip.py:930-938).
    anchor = infonce(img, txt, ctx.temperature)
    lunif_c = lunif(normalized_centroids(img, txt))
    return anchor + lunif_c, {"anchor": anchor, "lalign": _zero(), "lunif": lunif_c}


# loss_type → (main-phase fn, has_warm_phase).  Strings are the exact
# reference spellings (sparsify_clip.py:778-930).
_DISPATCH: Dict[str, Tuple[LossFn, bool]] = {
    "anchor": (_anchor_only, False),
    "anchor-roberta": (_anchor_roberta, False),
    "only_lunif_n_then_anchor+lalign+lunif(text)+lunif(img)": (
        _anchor_lalign_lunif_modality, True),
    "only_lunif_n_then_anchor+lalign+lunif(centroids)": (
        _anchor_lalign_lunif_centroids, True),
    "only_lunif_n_then_anchor+lalign+BETA*lunif(centroids)": (
        _anchor_lalign_beta_lunif_modality, True),  # dead-elif semantics
    "only_lunif_n_then_anchor+ALPHA*lalign+BETA*(lunif(text)+lunif(img))": (
        _anchor_alpha_lalign_beta_lunif_modality, True),
    "only_lunif_n_then_anchor+ALPHA*lalign+BETA*lunif(centroids)": (
        _anchor_alpha_lalign_beta_lunif_centroids, True),
    "ANCHOR(IMAGE,TEXT)+LALIGN(IMAGE,TEXT)+LUNIF(CENTROIDS)": (
        _anchor_lalign_lunif_centroids, False),
    "ANCHOR(IMAGE,TEXT)+LALIGN(IMAGE,TEXT)": (_anchor_lalign, False),
    "ANCHOR(IMAGE,TEXT)+LUNIF(CENTROIDS)": (_anchor_lunif_centroids, False),
    # Non-reference extras:
    "__dead__anchor+lalign+BETA*lunif(centroids)": (
        _anchor_lalign_beta_lunif_centroids_dead, True),
    "lunif": (
        lambda img, txt, ctx, infonce=contrastive_loss, lunif=lunif_loss:
            _warm_lunif(img, txt, lunif),
        False,
    ),
    "siglip": (_siglip, False),
    "anchor+lunif": (
        lambda img, txt, ctx, infonce=contrastive_loss, lunif=lunif_loss: (
            lambda a, u: (a + u, {"anchor": a, "lalign": _zero(), "lunif": u})
        )(
            infonce(img, txt, ctx.temperature),
            (lunif(img) + lunif(txt)) / 2.0,
        ),
        False,
    ),
}

KNOWN_LOSS_TYPES = tuple(k for k in _DISPATCH if not k.startswith("__dead__"))


def make_loss_fn(loss_type: str, use_pallas: bool = False) -> LossFn:
    """Return ``fn(image_embeds, text_embeds, ctx) -> (loss, aux)``.

    ``aux`` always contains the scalar components ``anchor``,
    ``lalign``, ``lunif`` (zeros where a component does not apply) so
    the logging schema is uniform across experiments.

    ``use_pallas`` swaps the InfoNCE / uniformity terms for the fused
    Pallas kernels (:mod:`sparsify_clip_tpu.ops`) — TPU only; the XLA
    twins run elsewhere regardless.
    """
    if loss_type not in _DISPATCH:
        raise ValueError(
            f"Unknown loss_type {loss_type!r}. Known: {sorted(_DISPATCH)}"
        )
    main_fn, has_warm = _DISPATCH[loss_type]

    if use_pallas:
        from sparsify_clip_tpu.ops.fused import fused_infonce_loss, fused_lunif_loss

        def infonce(img, txt, temperature):
            return fused_infonce_loss(img, txt, temperature, use_pallas=True)

        def lunif(x):
            return fused_lunif_loss(x, use_pallas=True)
    else:
        infonce, lunif = contrastive_loss, lunif_loss

    if not has_warm:
        def fn(img, txt, ctx: LossContext):
            return main_fn(img, txt, ctx, infonce, lunif)
        return fn

    def fn(img, txt, ctx: LossContext):
        # lax.cond: only the live branch executes on device; the phase
        # switch costs no recompile.
        return jax.lax.cond(
            ctx.warm,
            lambda: _warm_lunif(img, txt, lunif),
            lambda: main_fn(img, txt, ctx, infonce, lunif),
        )

    return fn
