from sparsify_clip_tpu.metrics.unif_w2 import (  # noqa: F401
    eval_uniformity,
    unif_w2_abs_eig,
    unif_w2_eig_real,
    unif_w2_joint,
    unif_w2_single_svd,
)
