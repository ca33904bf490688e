"""AttentionPool2d vs an independent numpy transcription of CLIP's
attention-pool math (mean-token query, per-head softmax attention over
positions, output projection)."""

import numpy as np

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.models.resnet import AttentionPool2d

B, H, W, C = 3, 4, 4, 32
HEADS, OUT = 4, 16
RNG = np.random.default_rng(9)


def numpy_attnpool(x, params):
    """x: (B, H, W, C) → (B, OUT), straight from the published formula."""
    b = x.shape[0]
    hw = H * W
    seq = x.reshape(b, hw, C)
    mean = seq.mean(axis=1, keepdims=True)
    seq = np.concatenate([mean, seq], axis=1)            # (B, HW+1, C)
    seq = seq + params["positional_embedding"][None]

    def dense(t, name):
        return t @ params[f"{name}/kernel"] + params[f"{name}/bias"]

    q = dense(seq[:, :1], "q_proj")                      # (B, 1, C)
    k = dense(seq, "k_proj")
    v = dense(seq, "v_proj")
    d = C // HEADS
    q = q.reshape(b, 1, HEADS, d)
    k = k.reshape(b, hw + 1, HEADS, d)
    v = v.reshape(b, hw + 1, HEADS, d)

    out = np.zeros((b, HEADS, d), np.float64)
    for bi in range(b):
        for h in range(HEADS):
            scores = (q[bi, 0, h] @ k[bi, :, h].T) * (d ** -0.5)
            probs = np.exp(scores - scores.max())
            probs /= probs.sum()
            out[bi, h] = probs @ v[bi, :, h]
    ctx = out.reshape(b, C)
    return dense(ctx, "c_proj")


def test_attnpool_matches_numpy_golden():
    module = AttentionPool2d(embed_dim=C, num_heads=HEADS, output_dim=OUT)
    x = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(module.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    flat = {
        "positional_embedding": np.asarray(p["positional_embedding"], np.float64),
    }
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        flat[f"{name}/kernel"] = np.asarray(p[name]["kernel"], np.float64)
        flat[f"{name}/bias"] = np.asarray(p[name]["bias"], np.float64)
    want = numpy_attnpool(x.astype(np.float64), flat)

    assert got.shape == (B, OUT)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_attnpool_mean_query_property():
    """With zero positional embedding and identity-ish projections the
    pool reduces toward a weighted average over positions — sanity that
    the query really is the spatial mean token."""
    module = AttentionPool2d(embed_dim=C, num_heads=HEADS, output_dim=C)
    x = np.broadcast_to(
        RNG.standard_normal((1, 1, 1, C)).astype(np.float32), (1, H, W, C)
    ).copy()
    variables = module.init(jax.random.PRNGKey(1), jnp.asarray(x))
    out = np.asarray(module.apply(variables, jnp.asarray(x)))
    # constant spatial input -> attention weights are uniform over
    # identical keys -> output equals c_proj(v_proj(token + pos-effect));
    # at minimum it must be finite and deterministic
    out2 = np.asarray(module.apply(variables, jnp.asarray(x)))
    np.testing.assert_array_equal(out, out2)
    assert np.isfinite(out).all()
