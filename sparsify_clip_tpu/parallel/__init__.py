from sparsify_clip_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
)
from sparsify_clip_tpu.parallel.pipeline import gpipe_apply  # noqa: F401
from sparsify_clip_tpu.parallel.dist_losses import (  # noqa: F401
    global_contrastive_loss,
    global_lalign_loss,
    global_lunif_loss,
    ring_infonce_loss,
    ring_lunif_loss,
    ring_siglip_loss,
)
