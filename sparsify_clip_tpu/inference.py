"""Inference / serving utilities: embedding, retrieval, zero-shot.

The reference has no inference surface beyond its eval loop; these are
the standard CLIP deployment entry points built on the same towers —
jitted batch encoders, a retrieval index over precomputed embeddings,
and prompt-ensemble zero-shot classification.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparsify_clip_tpu.utils.numerics import fp32_matmul, l2_normalize


class CLIPEncoder:
    """Jitted normalized-embedding encoders over trained variables."""

    def __init__(self, model, variables, tokenizer):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer

        @jax.jit
        def _encode_images(v, images):
            return l2_normalize(model.apply(v, images, method=model.encode_image))

        @jax.jit
        def _encode_images_u8(v, images_u8):
            # cast + CLIP-normalize (+ squash-resize if needed) FUSED
            # into the encode program: clients ship raw uint8 (4× less
            # host->device traffic than normalized fp32), one dispatch
            from sparsify_clip_tpu.ops.image import normalize_batch

            images = images_u8.astype(jnp.float32) / 255.0
            size = model.cfg.image_size
            if images.shape[1] != size or images.shape[2] != size:
                images = jax.image.resize(
                    images,
                    (images.shape[0], size, size, images.shape[3]),
                    method="linear",
                )  # the eval path's aspect-squashing Resize
            return l2_normalize(
                model.apply(v, normalize_batch(images), method=model.encode_image)
            )

        @jax.jit
        def _encode_tokens(v, tokens):
            return l2_normalize(model.apply(v, tokens, method=model.encode_text))

        self._encode_images = _encode_images
        self._encode_images_u8 = _encode_images_u8
        self._encode_tokens = _encode_tokens

    def encode_images(self, images: np.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) float32 (normalized pixels) → (B, D) unit vectors."""
        return self._encode_images(self.variables, jnp.asarray(images))

    def encode_images_u8(self, images_u8: np.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) uint8 raw pixels → (B, D) unit vectors; CLIP
        normalization (and squash-resize when H/W differ from the
        tower's input size) runs on device inside the same program."""
        return self._encode_images_u8(self.variables, jnp.asarray(images_u8))

    def encode_texts(self, texts: Sequence[str]) -> jnp.ndarray:
        tokens = jnp.asarray(self.tokenizer(list(texts)))
        return self._encode_tokens(self.variables, tokens)


class RetrievalIndex:
    """Exact dot-product retrieval over a bank of unit embeddings
    (the eval protocol's similarity machinery as a reusable API)."""

    def __init__(self, embeddings: jnp.ndarray, labels: Optional[List] = None):
        self.embeddings = jnp.asarray(embeddings, jnp.float32)
        self.labels = labels

    def search(self, queries: jnp.ndarray, k: int = 5) -> Tuple[np.ndarray, np.ndarray]:
        """→ (scores (Q, k), indices (Q, k)) by descending similarity."""
        sims = fp32_matmul(jnp.asarray(queries, jnp.float32), self.embeddings.T)
        k = min(k, self.embeddings.shape[0])
        scores, idx = jax.lax.top_k(sims, k)
        return np.asarray(scores), np.asarray(idx)


# The 7-template subset commonly used for quick CLIP zero-shot evals.
DEFAULT_TEMPLATES = (
    "a photo of a {}.",
    "a bad photo of a {}.",
    "a photo of many {}.",
    "a photo of the large {}.",
    "a photo of the small {}.",
    "art of the {}.",
    "a photo of a {} in a video game.",
)


def build_zero_shot_classifier(
    encoder: CLIPEncoder,
    class_names: Sequence[str],
    templates: Sequence[str] = DEFAULT_TEMPLATES,
) -> jnp.ndarray:
    """(num_classes, D) classifier: per class, the renormalized mean of
    the prompt-ensemble text embeddings (standard CLIP recipe)."""
    weights = []
    for name in class_names:
        prompts = [t.format(name) for t in templates]
        emb = encoder.encode_texts(prompts)
        weights.append(l2_normalize(jnp.mean(emb, axis=0)))
    return jnp.stack(weights)


def zero_shot_classify(
    encoder: CLIPEncoder,
    images: np.ndarray,
    classifier: jnp.ndarray,
    temperature: float = 0.01,
) -> Dict[str, np.ndarray]:
    """→ {"probs": (B, C), "predictions": (B,)} over the classifier."""
    img = encoder.encode_images(images)
    logits = fp32_matmul(img, classifier.T) / temperature
    probs = jax.nn.softmax(logits, axis=-1)
    return {
        "probs": np.asarray(probs),
        "predictions": np.asarray(jnp.argmax(logits, axis=-1)),
    }
