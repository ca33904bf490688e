"""Embedding-export CLI: checkpoint + images/texts → .npz embeddings."""

import os

import numpy as np

from sparsify_clip_tpu.checkpoints import save_weights
from sparsify_clip_tpu.data.synthetic import write_coco_fixture
from sparsify_clip_tpu.encode import main
from sparsify_clip_tpu.models import create_model
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY

MODEL_REGISTRY.setdefault(
    "encode-tiny",
    CLIPConfig(
        name="encode-tiny", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vocab_size=49408, context_length=77, text_width=16, text_heads=2,
        text_layers=2,
    ),
)


def test_encode_cli_end_to_end(tmp_path, capsys):
    root = write_coco_fixture(str(tmp_path / "coco"), num_train=0, num_val=5)
    img_dir = os.path.join(root, "images", "val2017")

    _, variables = create_model("encode-tiny")
    weights = save_weights(variables["params"], str(tmp_path / "w.npz"))

    texts = tmp_path / "texts.txt"
    texts.write_text("a red bus\na dog on grass\nan empty kitchen\n")

    out = main([
        "--model", "encode-tiny", "--weights", weights,
        "--images", img_dir, "--texts", str(texts),
        "--out", str(tmp_path / "emb.npz"), "--batch-size", "2",
    ])

    data = np.load(out)
    assert data["image_embeddings"].shape == (5, 16)
    assert data["text_embeddings"].shape == (3, 16)
    assert len(data["image_files"]) == 5
    # unit vectors
    np.testing.assert_allclose(
        np.linalg.norm(data["image_embeddings"], axis=1), 1.0, atol=1e-3
    )
    np.testing.assert_allclose(
        np.linalg.norm(data["text_embeddings"], axis=1), 1.0, atol=1e-3
    )
    assert "->" in capsys.readouterr().out  # retrieval smoke printed
