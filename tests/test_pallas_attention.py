"""Fused Pallas attention vs the einsum path (values + grads),
interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sparsify_clip_tpu.ops.pallas_attention import attention_core, mha_pallas

RNG = np.random.default_rng(13)


def _qkv(b, l, w):
    return jnp.asarray(RNG.standard_normal((b, l, 3 * w)).astype(np.float32) * 0.3)


def _einsum_ref(qkv, heads, causal):
    b, l, w3 = qkv.shape
    width = w3 // 3
    d = width // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, heads, d)
    k = k.reshape(b, l, heads, d)
    v = v.reshape(b, l, heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * (
        d ** -0.5
    )
    if causal:
        s = s + jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, l, width)


@pytest.mark.parametrize(
    "b,l,w,heads,causal",
    [
        (4, 50, 96, 12, False),   # ViT-like (50 tokens, head_dim 8)
        (4, 77, 64, 8, True),     # text-like (77 tokens, causal)
        (2, 16, 32, 2, False),
    ],
)
def test_forward_matches_einsum(b, l, w, heads, causal):
    qkv = _qkv(b, l, w)
    want = np.asarray(_einsum_ref(qkv, heads, causal))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(mha_pallas(qkv, heads, causal))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_einsum(causal):
    qkv = _qkv(2, 20, 32)
    heads = 4

    def loss_ref(x):
        return jnp.sum(jnp.square(_einsum_ref(x, heads, causal)))

    want = np.asarray(jax.grad(loss_ref)(qkv))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            jax.grad(lambda x: jnp.sum(jnp.square(mha_pallas(x, heads, causal))))(qkv)
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_per_head_routing_predicate():
    """ViT-L/14-336's 577-token bf16 qkv exceeds the whole-width
    budget and its head_dim (64) packs exactly into Mosaic's 128-lane
    blocks -> head-group grid; the other big towers stay whole-width
    (short seq), and an over-budget tower with an odd head_dim (88)
    cannot take the head-group path."""
    from sparsify_clip_tpu.ops import pallas_attention as pa

    assert pa._use_per_head(577, 3 * 1024, 2, 16)         # L-14-336 vision
    assert not pa._use_per_head(257, 3 * 1024, 2, 16)     # L-14 vision
    assert not pa._use_per_head(257, 3 * 1280, 2, 16)     # H-14 vision
    assert not pa._use_per_head(257, 3 * 1408, 2, 16)     # g-14 (head_dim 88)
    assert not pa._use_per_head(77, 3 * 768, 2, 12)       # text tower
    # hypothetical long odd-head-dim tower: over budget, but 88 lanes
    # don't pack into 128 -> whole-width (and its VMEM story) applies
    assert not pa._use_per_head(577, 3 * 1408, 2, 16)
    # head-group lane widths: 2x64 -> 128; 128 -> itself; test shapes cap
    assert pa._lane_group(1024, 64) == 128
    assert pa._lane_group(1280, 128) == 128
    assert pa._lane_group(32, 8) == 32


@pytest.mark.parametrize("causal", [False, True])
def test_per_head_forward_matches_einsum(monkeypatch, causal):
    from sparsify_clip_tpu.ops import pallas_attention as pa

    monkeypatch.setattr(pa, "_use_per_head", lambda *a: True)
    qkv = _qkv(2, 20, 32)
    heads = 4
    want = np.asarray(_einsum_ref(qkv, heads, causal))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pa.mha_pallas(qkv, heads, causal))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_per_head_grads_match_einsum(monkeypatch, causal):
    from sparsify_clip_tpu.ops import pallas_attention as pa

    monkeypatch.setattr(pa, "_use_per_head", lambda *a: True)
    qkv = _qkv(2, 20, 32)
    heads = 4

    want = np.asarray(
        jax.grad(lambda x: jnp.sum(jnp.square(_einsum_ref(x, heads, causal))))(qkv)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            jax.grad(
                lambda x: jnp.sum(jnp.square(pa.mha_pallas(x, heads, causal)))
            )(qkv)
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_attention_core_cpu_fallback_matches():
    qkv = _qkv(2, 10, 16)
    got = np.asarray(attention_core(qkv, heads=2, causal=True))
    want = np.asarray(_einsum_ref(qkv, 2, True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_causal_masks_future_tokens():
    """Changing a future position must not affect earlier outputs."""
    qkv = np.asarray(_qkv(1, 8, 16))
    heads = 2
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(mha_pallas(jnp.asarray(qkv), heads, True))
        mod = qkv.copy()
        mod[0, 7, :] += 5.0
        changed = np.asarray(mha_pallas(jnp.asarray(mod), heads, True))
    np.testing.assert_allclose(base[0, :7], changed[0, :7], atol=1e-6)
    assert np.abs(base[0, 7] - changed[0, 7]).max() > 1e-4


def test_sharded_kernel_matches_global_on_mesh():
    """mha_pallas_sharded under an 8-device data mesh == the global
    einsum path (interpret mode exercises the kernel on CPU)."""
    import numpy as np_
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.ops.pallas_attention import mha_pallas_sharded
    from sparsify_clip_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=8, model=1)
    qkv = _qkv(16, 20, 32)  # 2 samples per device
    want = np_.asarray(_einsum_ref(qkv, 4, True))

    with jax.sharding.set_mesh(mesh):
        x = jax.device_put(qkv, NamedSharding(mesh, P("data")))
        with pltpu.force_tpu_interpret_mode():
            got = np_.asarray(
                jax.jit(lambda v: mha_pallas_sharded(v, 4, True))(x)
            )
    np_.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_sharded_kernel_grads_on_mesh():
    import numpy as np_
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.ops.pallas_attention import mha_pallas_sharded
    from sparsify_clip_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=8, model=1)
    qkv = _qkv(16, 20, 32)
    want = np_.asarray(
        jax.grad(lambda v: jnp.sum(jnp.square(_einsum_ref(v, 4, False))))(qkv)
    )
    with jax.sharding.set_mesh(mesh):
        x = jax.device_put(qkv, NamedSharding(mesh, P("data")))
        with pltpu.force_tpu_interpret_mode():
            got = np_.asarray(
                jax.jit(
                    jax.grad(lambda v: jnp.sum(jnp.square(mha_pallas_sharded(v, 4, False))))
                )(x)
            )
    np_.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_kernel_inside_enclosing_shard_map():
    """Regression guard for the pipeline-on-TPU breakage: called INSIDE
    an enclosing shard_map (the GPipe trunk, parallel/pipeline.py), the
    abstract mesh's axes are Manual and the batch is already
    device-local — mha_pallas_sharded must NOT nest a second shard_map
    over 'data' (which re-splits the local microbatch and fails to
    lower).  Review finding, round 4."""
    import numpy as np_
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.ops.pallas_attention import mha_pallas_sharded
    from sparsify_clip_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=4, model=2)
    qkv = _qkv(16, 20, 32)
    want = np_.asarray(_einsum_ref(qkv, 4, True))

    def worker(x_local):
        # inside shard_map: axis types are Manual, batch is B/dp
        return mha_pallas_sharded(x_local, 4, True)

    with jax.sharding.set_mesh(mesh):
        x = jax.device_put(qkv, NamedSharding(mesh, P("data")))
        with pltpu.force_tpu_interpret_mode():
            fn = jax.shard_map(
                worker, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                check_vma=False,
            )
            got = np_.asarray(jax.jit(fn)(x))
    np_.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
