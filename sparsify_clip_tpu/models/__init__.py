from sparsify_clip_tpu.models.clip import (  # noqa: F401
    CLIP,
    CLIPConfig,
    MODEL_REGISTRY,
    create_model,
)
