"""Fused LN+qkv kernel (ops/pallas_ln_qkv) and the A/B knobs of
VERDICT r4 #3: numerics vs the XLA twin, block-level integration with
an identical param tree, the one-hot token-embedding lookup."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from sparsify_clip_tpu.ops.pallas_ln_qkv import (
    force_pallas_ln_qkv,
    ln_qkv_pallas,
    ln_qkv_reference,
)

RNG = np.random.default_rng(11)


def _inputs(n=300, w=128, w3=384, dtype=jnp.float32):
    x = jnp.asarray(RNG.standard_normal((n, w)), dtype)
    scale = jnp.asarray(1.0 + 0.1 * RNG.standard_normal(w), jnp.float32)
    bias = jnp.asarray(0.1 * RNG.standard_normal(w), jnp.float32)
    kernel = jnp.asarray(RNG.standard_normal((w, w3)) * w ** -0.5, jnp.float32)
    kbias = jnp.asarray(0.1 * RNG.standard_normal(w3), jnp.float32)
    return x, scale, bias, kernel, kbias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(dtype):
    # n=300 exercises the row-tile padding (not a multiple of TM=256)
    x, scale, bias, kernel, kbias = _inputs(dtype=dtype)
    want = ln_qkv_reference(x, scale, bias, kernel, kbias, 1e-5, dtype)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(
            lambda *a: ln_qkv_pallas(*a, 1e-5, dtype)
        )(x, scale, bias, kernel, kbias)
    assert got.dtype == want.dtype
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_kernel_grads_are_reference_grads():
    """The fusion is forward-only: the custom VJP routes through the
    XLA twin, so all five gradients match it exactly."""
    x, scale, bias, kernel, kbias = _inputs(n=256)

    def loss_p(*a):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(jnp.square(ln_qkv_pallas(*a, 1e-5, jnp.float32)))

    def loss_r(*a):
        return jnp.sum(jnp.square(ln_qkv_reference(*a, 1e-5, jnp.float32)))

    got = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, scale, bias, kernel, kbias)
    want = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, scale, bias, kernel, kbias)
    # the cotangent entering the shared VJP comes from the Pallas
    # forward's output, so values differ at fp32 rounding order
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-5)


def test_block_fused_path_matches_unfused():
    """ResidualAttentionBlock with fused_ln_qkv=True must produce the
    unfused block's output from the SAME param tree (init always runs
    unfused; apply reads ln_1/in_proj params through the scope)."""
    from sparsify_clip_tpu.models.layers import ResidualAttentionBlock

    x = jnp.asarray(RNG.standard_normal((4, 10, 64)), jnp.float32)
    base = ResidualAttentionBlock(width=64, heads=2)
    fused = ResidualAttentionBlock(width=64, heads=2, fused_ln_qkv=True)
    params = base.init(jax.random.PRNGKey(0), x)
    # identical param trees (the fused knob must not change the tree)
    assert jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), x)
    ) == jax.tree_util.tree_structure(params)

    want = base.apply(params, x)
    with force_pallas_ln_qkv(), pltpu.force_tpu_interpret_mode():
        got = fused.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_block_fused_grads_match_unfused():
    from sparsify_clip_tpu.models.layers import ResidualAttentionBlock

    x = jnp.asarray(RNG.standard_normal((2, 8, 64)), jnp.float32)
    base = ResidualAttentionBlock(width=64, heads=2)
    fused = ResidualAttentionBlock(width=64, heads=2, fused_ln_qkv=True)
    params = base.init(jax.random.PRNGKey(0), x)

    def loss(mod, p):
        return jnp.sum(jnp.square(mod.apply(p, x)))

    want = jax.grad(lambda p: loss(base, p))(params)
    with force_pallas_ln_qkv(), pltpu.force_tpu_interpret_mode():
        got = jax.grad(lambda p: loss(fused, p))(params)
    jax.tree_util.tree_map(
        lambda g, w: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-6
        ),
        got, want,
    )


def test_mesh_sharded_value_and_grad_export_for_tpu():
    """dp>1 routing: the shard_map'd kernel must EXPORT for platform
    'tpu' on an 8-device AbstractMesh — value and full grads — with the
    mosaic kernel serialized and the replicated weight cotangent's
    cross-shard reduction present.  (Executing the interpret-mode
    kernel on *sharded* operands inside shard_map wedges the fake CPU
    mesh, so like every other TPU-only composition in this repo the
    multi-device leg is proven by jax.export — tests/test_tpu_lowering
    pattern; single-device execution equality is pinned above.)"""
    from jax import export as jax_export
    from jax.sharding import AbstractMesh, NamedSharding, PartitionSpec as P

    from sparsify_clip_tpu.ops.pallas_ln_qkv import ln_qkv_core

    amesh = AbstractMesh((8, 1), ("data", "model"))
    b, l, w, w3 = 16, 8, 64, 192

    def fused_sum(xx, s, bi, k, kb):
        out = ln_qkv_core(xx, s, bi, k, kb, epsilon=1e-5, dtype=jnp.float32)
        return jnp.sum(jnp.square(out))

    shard = NamedSharding(amesh, P("data"))
    repl = NamedSharding(amesh, P())
    args = (
        jax.ShapeDtypeStruct((b, l, w), jnp.float32, sharding=shard),
        jax.ShapeDtypeStruct((w,), jnp.float32, sharding=repl),
        jax.ShapeDtypeStruct((w,), jnp.float32, sharding=repl),
        jax.ShapeDtypeStruct((w, w3), jnp.float32, sharding=repl),
        jax.ShapeDtypeStruct((w3,), jnp.float32, sharding=repl),
    )
    with force_pallas_ln_qkv():
        with jax.sharding.use_abstract_mesh(amesh):
            exp = jax_export.export(
                jax.jit(jax.value_and_grad(fused_sum, argnums=(0, 1, 2, 3, 4))),
                platforms=["tpu"],
            )(*args)
    module = exp.mlir_module()
    assert "tpu_custom_call" in module, "mosaic LN+qkv kernel not serialized"
    assert "all-reduce" in module or "all_reduce" in module, (
        "replicated weight cotangent lost its cross-shard reduction"
    )


def test_onehot_embed_matches_gather():
    """onehot_embed (VERDICT r4 #3b): identical embeddings and
    token-table grads, only the lowering differs (matmul vs
    gather/scatter-add)."""
    from sparsify_clip_tpu.models.text import TextTransformer

    kw = dict(vocab_size=64, context_length=8, width=32, heads=2, layers=1,
              embed_dim=16)
    tokens = jnp.asarray(RNG.integers(1, 62, size=(4, 8)), jnp.int32)
    tokens = tokens.at[:, -1].set(63)
    gather = TextTransformer(**kw)
    onehot = TextTransformer(onehot_embed=True, **kw)
    params = gather.init(jax.random.PRNGKey(0), tokens)
    assert jax.tree_util.tree_structure(
        onehot.init(jax.random.PRNGKey(0), tokens)
    ) == jax.tree_util.tree_structure(params)

    want = gather.apply(params, tokens)
    got = onehot.apply(params, tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def loss(mod, p):
        return jnp.sum(jnp.square(mod.apply(p, tokens)))

    g_want = jax.grad(lambda p: loss(gather, p))(params)
    g_got = jax.grad(lambda p: loss(onehot, p))(params)
    emb_w = g_want["params"]["token_embedding"]
    emb_g = g_got["params"]["token_embedding"]
    np.testing.assert_allclose(np.asarray(emb_g), np.asarray(emb_w), rtol=1e-4, atol=1e-6)
