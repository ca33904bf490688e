from sparsify_clip_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
)
from sparsify_clip_tpu.parallel.pipeline import gpipe_apply  # noqa: F401
