"""sparsify_clip_tpu — a TPU-native (JAX/XLA/Pallas) CLIP training framework.

A ground-up rebuild of the capabilities of ``noostale/sparsify-clip``
(reference: /root/reference/sparsify_clip.py) designed TPU-first:

* two-tower CLIP encoders (ViT family + modified-ResNet family + text
  transformer) written in flax, bf16 on the MXU;
* the full contrastive / alignment / uniformity loss stack as pure
  functions over (B, D) embeddings, with fused Pallas kernels for the
  hot B×B paths;
* data-parallel training via ``jax.sharding.Mesh`` + jit'ed global-view
  train steps (XLA inserts the ICI collectives), plus explicit
  ``shard_map`` variants in :mod:`sparsify_clip_tpu.parallel`;
* the reference's experiment grid (``experiments_configs/*.yaml``,
  ``ablatation_configs/*.yaml``) runs unchanged through
  :mod:`sparsify_clip_tpu.config`.
"""

__version__ = "0.1.0"

from sparsify_clip_tpu.config import ExperimentConfig, load_config  # noqa: F401
