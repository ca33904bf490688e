"""Loss library: pure functions over (B, D) embedding arrays.

All losses consume **L2-normalized** embeddings (normalization happens
in the train step, mirroring sparsify_clip.py:772-773) and compute in
float32 regardless of the encoders' compute dtype.
"""

from sparsify_clip_tpu.losses.contrastive import (  # noqa: F401
    contrastive_loss,
    contrastive_loss_roberta,
)
from sparsify_clip_tpu.losses.align import (  # noqa: F401
    lalign_loss,
    random_alignment_loss,
    centroid_alignment_loss,
)
from sparsify_clip_tpu.losses.unif import lunif_loss, sparsify_loss  # noqa: F401
from sparsify_clip_tpu.losses.sigmoid import siglip_loss  # noqa: F401
from sparsify_clip_tpu.losses.centroids import (  # noqa: F401
    compute_centroids,
    compute_centroids_only,
)
from sparsify_clip_tpu.losses.dispatch import (  # noqa: F401
    LossContext,
    make_loss_fn,
    KNOWN_LOSS_TYPES,
)
