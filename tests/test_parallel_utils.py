"""Mesh/sharding helpers + profiling utilities + torch export roundtrip."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sparsify_clip_tpu.checkpoints import (
    export_torch_text_tower,
    load_torch_clip_state_dict,
)
from sparsify_clip_tpu.models import CLIP
from sparsify_clip_tpu.models.clip import CLIPConfig
from sparsify_clip_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_shardings,
    shard_batch,
)
from sparsify_clip_tpu.utils.profiling import ThroughputMeter, log_compile_time


def test_create_mesh_shapes():
    mesh = create_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_all = create_mesh(data=-1, model=1)
    assert mesh_all.shape["data"] == len(jax.devices())
    with pytest.raises(ValueError):
        create_mesh(data=16, model=1)  # more than available
    with pytest.raises(ValueError):
        create_mesh(data=-1, model=3)  # 8 % 3 != 0


def test_tp_rules_shard_transformer_kernels_only():
    mesh = create_mesh(data=4, model=2)
    params = {
        "transformer": {
            "resblock_0": {
                "attn": {"in_proj": {"kernel": jnp.zeros((8, 24)),
                                      "bias": jnp.zeros((24,))},
                         "out_proj": {"kernel": jnp.zeros((8, 8))}},
                "mlp": {"c_fc": {"kernel": jnp.zeros((8, 32))}},
            }
        },
        "token_embedding": jnp.zeros((16, 8)),
    }
    shards = param_shardings(params, mesh)
    blk = shards["transformer"]["resblock_0"]
    assert blk["attn"]["in_proj"]["kernel"].spec == P(None, "model")
    assert blk["attn"]["out_proj"]["kernel"].spec == P("model", None)
    assert blk["mlp"]["c_fc"]["kernel"].spec == P(None, "model")
    assert blk["attn"]["in_proj"]["bias"].spec == P()
    assert shards["token_embedding"].spec == P()


def test_tp_rules_replicate_everything_when_model_axis_1():
    mesh = create_mesh(data=8, model=1)
    params = {"attn": {"in_proj": {"kernel": jnp.zeros((8, 24))}}}
    shards = param_shardings(params, mesh)
    assert shards["attn"]["in_proj"]["kernel"].spec == P()


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh(data=8, model=1)
    batch = shard_batch({"x": np.zeros((16, 4), np.float32)}, mesh)
    assert batch["x"].sharding == batch_sharding(mesh)


def test_throughput_meter():
    meter = ThroughputMeter(window=10, n_chips=2)
    meter.start()
    for _ in range(5):
        time.sleep(0.01)
        meter.step(100)
    assert meter.pairs_per_sec > 0
    assert meter.pairs_per_sec_per_chip == pytest.approx(meter.pairs_per_sec / 2)
    assert meter.step_time_ms >= 10


def test_log_compile_time():
    f = jax.jit(lambda x: x * 2)
    out, seconds = log_compile_time(f, jnp.ones((4,)))
    assert seconds > 0
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_torch_export_import_roundtrip():
    tiny = CLIPConfig(
        name="rt-tiny", embed_dim=8, vision_kind="vit", image_size=32,
        vision_width=16, vision_layers=(1,), vision_heads=2, patch_size=16,
        vocab_size=64, context_length=8, text_width=8, text_heads=2,
        text_layers=1,
    )
    model = CLIP(cfg=tiny)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 8), jnp.int32), train=False,
    )
    sd = export_torch_text_tower(variables["params"])
    # canonical torch names present
    assert "token_embedding.weight" in sd
    assert "transformer.resblocks.0.attn.in_proj_weight" in sd
    assert sd["transformer.resblocks.0.attn.in_proj_weight"].shape == (24, 8)
    # importing the export maps back onto our paths with original shapes
    back = load_torch_clip_state_dict(sd)
    np.testing.assert_array_equal(
        back["text/token_embedding"],
        np.asarray(variables["params"]["text"]["token_embedding"]),
    )
    np.testing.assert_array_equal(
        back["text/transformer/resblock_0/attn/in_proj/kernel"],
        np.asarray(
            variables["params"]["text"]["transformer"]["resblock_0"]["attn"]
            ["in_proj"]["kernel"]
        ),
    )
