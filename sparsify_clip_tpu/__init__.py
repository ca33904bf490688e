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

from sparsify_clip_tpu.config import (  # noqa: F401
    ExperimentConfig,
    load_config,
    load_config_dir,
)
from sparsify_clip_tpu.losses import (  # noqa: F401
    KNOWN_LOSS_TYPES,
    LossContext,
    make_loss_fn,
)
from sparsify_clip_tpu.models import MODEL_REGISTRY, create_model  # noqa: F401
from sparsify_clip_tpu.parallel import create_mesh, shard_batch  # noqa: F401
from sparsify_clip_tpu.text import CLIPTokenizer, get_tokenizer  # noqa: F401


def __getattr__(name):
    # Heavier orchestration entry points resolve lazily so that
    # `import sparsify_clip_tpu` stays light for config/tokenizer use.
    if name in ("create_train_setup", "run_training", "TrainState"):
        from sparsify_clip_tpu import train

        return getattr(train, name)
    if name == "evaluate_model":
        from sparsify_clip_tpu.eval import evaluate_model

        return evaluate_model
    if name in ("save_exported", "export_encoders", "ExportedEncoder"):
        from sparsify_clip_tpu import export

        return getattr(export, name)
    if name in ("BatchingEncoderServer", "ServerStats"):
        from sparsify_clip_tpu import serving

        return getattr(serving, name)
    raise AttributeError(f"module 'sparsify_clip_tpu' has no attribute {name!r}")
