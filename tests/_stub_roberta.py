"""Deterministic stub sentence encoder for the anchor-roberta e2e test.

Stands in for the RoBERTa host encoder the reference conditionally
loads (sparsify_clip.py:711-713): hash each caption to a fixed vector,
cosine-similarity matrix, row softmax → the (B, B) row-stochastic
soft-target matrix the loss consumes (sparsify_clip.py:135-157).
"""

import hashlib

import numpy as np


def _embed(caption: str) -> np.ndarray:
    digest = hashlib.sha256(caption.encode("utf-8")).digest()
    v = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    v = v - v.mean()
    return v / (np.linalg.norm(v) + 1e-8)


def soft_targets(captions):
    e = np.stack([_embed(c) for c in captions])
    sims = e @ e.T
    ex = np.exp(5.0 * (sims - sims.max(axis=1, keepdims=True)))
    return ex / ex.sum(axis=1, keepdims=True)


def bad_shape(captions):
    return np.zeros((len(captions), 3), np.float32)
