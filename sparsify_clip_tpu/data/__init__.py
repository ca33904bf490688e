from sparsify_clip_tpu.data.coco import CocoCaptions, CocoCaptionIndex  # noqa: F401
from sparsify_clip_tpu.data.loader import DataLoader  # noqa: F401
from sparsify_clip_tpu.data.synthetic import SyntheticCaptions  # noqa: F401
from sparsify_clip_tpu.data.pipeline import dataset_loader  # noqa: F401
