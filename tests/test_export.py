"""jax.export deployment artifacts (sparsify_clip_tpu/export.py):
round-trip parity with the live CLIPEncoder, batch polymorphism,
self-contained loading, CLI."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from sparsify_clip_tpu.export import ExportedEncoder, main as export_main, save_exported
from sparsify_clip_tpu.inference import CLIPEncoder
from sparsify_clip_tpu.models import create_model
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY

TINY = CLIPConfig(
    name="export-tiny", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
    vocab_size=256, context_length=12, text_width=16, text_heads=2, text_layers=2,
)
MODEL_REGISTRY.setdefault("export-tiny", TINY)

RNG = np.random.default_rng(3)


def _inputs(b):
    tokens = RNG.integers(1, 250, size=(b, TINY.context_length)).astype(np.int32)
    tokens[:, 0] = TINY.vocab_size - 2
    tokens[:, -1] = TINY.vocab_size - 1
    images = RNG.standard_normal((b, 32, 32, 3)).astype(np.float32)
    return images, tokens


@pytest.fixture(scope="module")
def exported_dir(tmp_path_factory):
    model, variables = create_model("export-tiny", dtype=jnp.float32)
    out = str(tmp_path_factory.mktemp("export") / "tiny")
    save_exported(model, variables, out, model_name="export-tiny")
    return out, model, variables


def test_artifact_files_and_meta(exported_dir):
    out, _, _ = exported_dir
    assert os.path.exists(os.path.join(out, "image_encoder.jaxexport"))
    assert os.path.exists(os.path.join(out, "text_encoder.jaxexport"))
    meta = json.load(open(os.path.join(out, "export_meta.json")))
    assert meta["model"] == "export-tiny"
    assert meta["image_size"] == 32
    assert meta["embed_dim"] == 16
    assert meta["batch"] is None  # symbolic


def test_roundtrip_matches_live_encoder(exported_dir):
    out, model, variables = exported_dir
    served = ExportedEncoder(out)
    live = CLIPEncoder(model, variables, tokenizer=None)

    images, tokens = _inputs(4)
    img_served = np.asarray(served.encode_images(images))
    txt_served = np.asarray(served.encode_tokens(tokens))
    img_live = np.asarray(live._encode_images(variables, jnp.asarray(images)))
    txt_live = np.asarray(live._encode_tokens(variables, jnp.asarray(tokens)))
    np.testing.assert_allclose(img_served, img_live, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(txt_served, txt_live, rtol=2e-5, atol=2e-6)
    # serving contract: unit-norm fp32
    assert img_served.dtype == np.float32
    np.testing.assert_allclose(
        np.linalg.norm(img_served, axis=1), 1.0, rtol=1e-5
    )


def test_batch_polymorphism(exported_dir):
    out, _, _ = exported_dir
    served = ExportedEncoder(out)
    for b in (1, 3, 7):
        images, tokens = _inputs(b)
        assert served.encode_images(images).shape == (b, TINY.embed_dim)
        assert served.encode_tokens(tokens).shape == (b, TINY.embed_dim)


def test_concrete_batch_export(tmp_path):
    model, variables = create_model("export-tiny", dtype=jnp.float32)
    out = str(tmp_path / "fixed")
    save_exported(model, variables, out, batch=4)
    served = ExportedEncoder(out)
    images, tokens = _inputs(4)
    assert served.encode_images(images).shape == (4, TINY.embed_dim)
    meta = json.load(open(os.path.join(out, "export_meta.json")))
    assert meta["batch"] == 4


def test_unbaked_params_export(tmp_path):
    """bake_params=False: programs take the variables pytree, weights
    live in weights.npz — same outputs, program-sized artifacts."""
    model, variables = create_model("export-tiny", dtype=jnp.float32)
    out = str(tmp_path / "unbaked")
    save_exported(model, variables, out, bake_params=False)
    assert os.path.exists(os.path.join(out, "weights.npz"))
    meta = json.load(open(os.path.join(out, "export_meta.json")))
    assert meta["baked_params"] is False

    served = ExportedEncoder(out)
    live = CLIPEncoder(model, variables, tokenizer=None)
    for b in (2, 5):  # symbolic batch holds for unbaked programs too
        images, tokens = _inputs(b)
        np.testing.assert_allclose(
            np.asarray(served.encode_images(images)),
            np.asarray(live._encode_images(variables, jnp.asarray(images))),
            rtol=2e-5, atol=2e-6,
        )
        np.testing.assert_allclose(
            np.asarray(served.encode_tokens(tokens)),
            np.asarray(live._encode_tokens(variables, jnp.asarray(tokens))),
            rtol=2e-5, atol=2e-6,
        )


def test_resnet_tower_exports_with_symbolic_batch(tmp_path):
    """BN (running stats) + attention-pool under a symbolic batch dim:
    the RN tower family exports and serves at multiple batch sizes."""
    rn = CLIPConfig(
        name="export-tiny-rn", embed_dim=16, vision_kind="resnet", image_size=32,
        vision_width=8, vision_layers=(1, 1, 1, 1), vision_heads=4,
        vocab_size=256, context_length=12, text_width=16, text_heads=2,
        text_layers=2,
    )
    MODEL_REGISTRY.setdefault("export-tiny-rn", rn)
    model, variables = create_model("export-tiny-rn", dtype=jnp.float32)
    out = str(tmp_path / "rn")
    save_exported(model, variables, out)
    served = ExportedEncoder(out)
    live = CLIPEncoder(model, variables, tokenizer=None)
    for b in (2, 5):
        images, _ = _inputs(b)
        got = np.asarray(served.encode_images(images))
        want = np.asarray(live._encode_images(variables, jnp.asarray(images)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_uint8_input_export(tmp_path):
    """uint8_input=True: the image program takes raw uint8 pixels and
    matches the live encoder fed host-normalized fp32 of the SAME
    bytes; the u8 server path rejects fp32 and meta records the mode."""
    from sparsify_clip_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    model, variables = create_model("export-tiny", dtype=jnp.float32)
    out = str(tmp_path / "u8")
    save_exported(model, variables, out, uint8_input=True)
    meta = json.load(open(os.path.join(out, "export_meta.json")))
    assert meta["uint8_input"] is True

    served = ExportedEncoder(out)
    live = CLIPEncoder(model, variables, tokenizer=None)
    raw = RNG.integers(0, 256, size=(3, 32, 32, 3)).astype(np.uint8)
    host_norm = ((raw.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD
    got = np.asarray(served.encode_images(raw))
    want = np.asarray(live._encode_images(variables, jnp.asarray(host_norm)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_cli_export(tmp_path):
    out = str(tmp_path / "cli")
    export_main(["--model", "export-tiny", "--out", out])
    served = ExportedEncoder(out)
    images, _ = _inputs(2)
    assert served.encode_images(images).shape == (2, TINY.embed_dim)


def test_foreign_platform_forces_xla_attention(monkeypatch, tmp_path):
    """A single NON-native platform in ``platforms`` must trace through
    the portable XLA attention path even with a concrete batch — the
    Pallas custom call cannot cross platforms (export.py guard)."""
    import contextlib

    import jax

    import sparsify_clip_tpu.ops.pallas_attention as pa
    from sparsify_clip_tpu.export import export_encoders

    calls = []
    real = pa.force_xla_attention

    @contextlib.contextmanager
    def spy():
        calls.append(True)
        with real():
            yield

    monkeypatch.setattr(pa, "force_xla_attention", spy)
    model, variables = create_model("export-tiny", dtype=jnp.float32)

    native = jax.default_backend()
    # native-only platform with a concrete batch: Pallas stays eligible
    export_encoders(model, variables, batch=2, platforms=[native])
    assert calls == []
    # one foreign platform: forced through XLA attention
    foreign = "tpu" if native != "tpu" else "cpu"
    export_encoders(model, variables, batch=2, platforms=[foreign])
    assert calls == [True]
