"""Model zoo: shapes, dtype policy, EOT pooling, BN mutation, registry."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsify_clip_tpu.models import CLIP, CLIPConfig, MODEL_REGISTRY, create_model

TINY_VIT = CLIPConfig(
    name="tiny-vit", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=24, vision_layers=(2,), vision_heads=2, patch_size=16,
    vocab_size=512, context_length=16, text_width=16, text_heads=2, text_layers=2,
)
TINY_RN = CLIPConfig(
    name="tiny-rn", embed_dim=16, vision_kind="resnet", image_size=32,
    vision_width=8, vision_layers=(1, 1, 1, 1), vision_heads=4,
    vocab_size=512, context_length=16, text_width=16, text_heads=2, text_layers=2,
)


def _init(cfg, dtype=jnp.float32, batch=2):
    model = CLIP(cfg=cfg, dtype=dtype)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    tokens = np.zeros((batch, cfg.context_length), np.int32)
    tokens[:, 0] = cfg.vocab_size - 2
    tokens[0, 1:4] = [5, 9, cfg.vocab_size - 1]
    tokens[1, 1:3] = [7, cfg.vocab_size - 1]
    tokens = jnp.asarray(tokens)
    variables = model.init(jax.random.PRNGKey(0), images, tokens, train=False)
    return model, variables, images, tokens


@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_forward_shapes(cfg):
    model, variables, images, tokens = _init(cfg)
    img_emb, txt_emb = model.apply(variables, images, tokens, train=False)
    assert img_emb.shape == (2, cfg.embed_dim)
    assert txt_emb.shape == (2, cfg.embed_dim)
    assert np.isfinite(np.asarray(img_emb)).all()
    assert np.isfinite(np.asarray(txt_emb)).all()
    # embeddings leave the tower in fp32
    assert img_emb.dtype == jnp.float32
    assert txt_emb.dtype == jnp.float32


def test_encode_methods_match_call():
    model, variables, images, tokens = _init(TINY_VIT)
    img_emb, txt_emb = model.apply(variables, images, tokens, train=False)
    img2 = model.apply(variables, images, method=model.encode_image)
    txt2 = model.apply(variables, tokens, method=model.encode_text)
    np.testing.assert_allclose(np.asarray(img_emb), np.asarray(img2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(txt_emb), np.asarray(txt2), rtol=1e-6)


def test_eot_pooling_ignores_post_eot_tokens():
    model, variables, _, tokens = _init(TINY_VIT)
    base = model.apply(variables, tokens, method=model.encode_text)
    # mutate a padding position AFTER the EOT token — must not change
    # the pooled embedding (causal mask + argmax pooling)
    toks = np.asarray(tokens).copy()
    toks[0, 10] = 3
    changed = model.apply(variables, jnp.asarray(toks), method=model.encode_text)
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(changed[0]), atol=1e-6)


def test_pre_eot_tokens_do_matter():
    model, variables, _, tokens = _init(TINY_VIT)
    base = model.apply(variables, tokens, method=model.encode_text)
    toks = np.asarray(tokens).copy()
    toks[0, 1] = 11  # before EOT
    changed = model.apply(variables, jnp.asarray(toks), method=model.encode_text)
    assert np.abs(np.asarray(base[0]) - np.asarray(changed[0])).max() > 1e-6


def test_bf16_compute_fp32_params():
    model, variables, images, tokens = _init(TINY_VIT, dtype=jnp.bfloat16)
    img_emb, txt_emb = model.apply(variables, images, tokens, train=False)
    assert img_emb.dtype == jnp.float32  # towers upcast on exit
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert np.isfinite(np.asarray(img_emb)).all()


def test_resnet_batch_stats_update():
    model, variables, images, tokens = _init(TINY_RN)
    assert "batch_stats" in variables
    (img_emb, _), new_state = model.apply(
        variables, images, tokens, train=True, mutable=["batch_stats"]
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(old, new))


def test_vit_has_no_batch_stats():
    _, variables, _, _ = _init(TINY_VIT)
    assert "batch_stats" not in variables


def test_registry_contains_reference_surface():
    assert "RN50" in MODEL_REGISTRY  # every reference YAML
    assert "ViT-B-32" in MODEL_REGISTRY  # north-star config
    assert MODEL_REGISTRY["RN50"].embed_dim == 1024
    assert MODEL_REGISTRY["ViT-B-32"].embed_dim == 512
    assert MODEL_REGISTRY["RN50"].vision_layers == (3, 4, 6, 3)


@pytest.mark.parametrize(
    "name,want_embed",
    [("RN50", 1024), ("ViT-B-32", 512), ("RN50x4", 640), ("RN50x16", 768),
     ("RN101", 512), ("ViT-B-16", 512), ("ViT-L-14", 768),
     ("RN50x64", 1024), ("ViT-L-14-336", 768), ("ViT-H-14", 1024),
     ("ViT-g-14", 1024), ("ViT-bigG-14", 1280)],
)
def test_full_model_shapes_via_eval_shape(name, want_embed):
    cfg = MODEL_REGISTRY[name]
    model = CLIP(cfg=cfg, dtype=jnp.bfloat16)
    size = cfg.image_size  # native resolution (RN50x4=288, RN50x16=384)

    variables_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((4, size, size, 3)),
                           jnp.zeros((4, 77), jnp.int32), train=False)
    )
    out_shape = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((4, size, size, 3)),
                              jnp.zeros((4, 77), jnp.int32), train=False),
        variables_shape,
    )
    assert out_shape[0].shape == (4, want_embed)
    assert out_shape[1].shape == (4, want_embed)

    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(variables_shape["params"])
    )
    # open_clip param counts where known; sanity floor otherwise.
    want = {"RN50": 102_000_000, "ViT-B-32": 151_300_000,
            "RN50x64": 623_300_000, "ViT-L-14-336": 427_900_000,
            "ViT-H-14": 986_100_000, "ViT-g-14": 1_366_700_000,
            "ViT-bigG-14": 2_539_600_000}.get(name)
    if want is not None:
        assert abs(n_params - want) / want < 0.03, f"{name}: {n_params:,} params"
    else:
        assert n_params > 100_000_000, f"{name}: {n_params:,} params"


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        create_model("GPT-7")


def test_rn_remat_numerics_neutral():
    """remat on the RN tower is memory-for-recompute only: identical
    outputs and param grads (it OOM-gates RN50x16 @384², BASELINE.md)."""
    model_p, variables, images, tokens = _init(TINY_RN)
    model_r = CLIP(cfg=TINY_RN, dtype=jnp.float32, remat=True)

    def loss_fn(model):
        def f(params):
            (img, txt), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, tokens, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.tanh(img)) + jnp.sum(jnp.tanh(txt))
        return f

    l_p, g_p = jax.value_and_grad(loss_fn(model_p))(variables["params"])
    l_r, g_r = jax.value_and_grad(loss_fn(model_r))(variables["params"])
    assert float(l_p) == pytest.approx(float(l_r), rel=1e-6)
    jax.tree_util.tree_map_with_path(
        lambda k, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7, err_msg=str(k)
        ),
        g_p, g_r,
    )


class TestBatchNormHalf:
    """BatchNormHalf (fp32 stats, compute-dtype normalize, plain
    autodiff backward) must match flax ``nn.BatchNorm`` in fp32:
    forward, updated batch_stats, and gradients w.r.t. x/scale/bias."""

    def _setup(self):
        import flax.linen as nn

        from sparsify_clip_tpu.models.resnet import BatchNormHalf

        rng = np.random.default_rng(5)
        x = jnp.asarray(
            rng.standard_normal((8, 6, 6, 12)) * 2.0 + 0.5, jnp.float32
        )
        bn_h = BatchNormHalf(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)
        bn_f = nn.BatchNorm(use_running_average=False, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32)
        params = {
            "scale": jnp.asarray(rng.uniform(0.5, 1.5, 12), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(12) * 0.3, jnp.float32),
        }
        stats = {
            "mean": jnp.asarray(rng.standard_normal(12) * 0.1, jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, 12), jnp.float32),
        }
        variables = {"params": params, "batch_stats": stats}
        return bn_h, bn_f, variables, x

    def test_forward_and_stats(self):
        bn_h, bn_f, variables, x = self._setup()
        y_h, s_h = bn_h.apply(variables, x, mutable=["batch_stats"])
        y_f, s_f = bn_f.apply(variables, x, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(y_h), np.asarray(y_f), rtol=1e-5, atol=1e-6
        )
        # running mean: flax convention == torch convention
        np.testing.assert_allclose(
            np.asarray(s_h["batch_stats"]["mean"]),
            np.asarray(s_f["batch_stats"]["mean"]),
            rtol=1e-5, atol=1e-7,
        )
        # running var: BatchNormHalf tracks the UNBIASED variance like
        # torch BatchNorm2d; flax tracks the biased one — reconstruct
        # the expected value from the flax update.
        n = x.size // x.shape[-1]
        ra0 = np.asarray(variables["batch_stats"]["var"])
        flax_var = np.asarray(s_f["batch_stats"]["var"])
        batch_biased = (flax_var - 0.9 * ra0) / 0.1
        want = 0.9 * ra0 + 0.1 * batch_biased * n / (n - 1)
        np.testing.assert_allclose(
            np.asarray(s_h["batch_stats"]["var"]), want, rtol=1e-5, atol=1e-7
        )

    def test_running_var_matches_torch_batchnorm2d(self):
        """The running-statistics update (momentum + unbiased var) must
        match torch.nn.BatchNorm2d exactly — the reference's BN
        (open_clip ModifiedResNet via sparsify_clip.py:686)."""
        torch = pytest.importorskip("torch")
        bn_h, _bn_f, variables, x = self._setup()
        _y, s_h = bn_h.apply(variables, x, mutable=["batch_stats"])

        tbn = torch.nn.BatchNorm2d(12, eps=1e-5, momentum=0.1)  # torch momentum = 1-0.9
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(np.asarray(variables["params"]["scale"])))
            tbn.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["bias"])))
            tbn.running_mean.copy_(
                torch.from_numpy(np.asarray(variables["batch_stats"]["mean"])))
            tbn.running_var.copy_(
                torch.from_numpy(np.asarray(variables["batch_stats"]["var"])))
        tbn.train()
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)  # NHWC→NCHW
        tbn(xt)
        np.testing.assert_allclose(
            np.asarray(s_h["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(s_h["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-5, atol=1e-6,
        )

    def test_grads_match_autodiff_reference(self):
        bn_h, bn_f, variables, x = self._setup()

        def loss(bn):
            def f(params, x):
                y, _ = bn.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, mutable=["batch_stats"],
                )
                return jnp.sum(jnp.tanh(y))
            return f

        g_h = jax.grad(loss(bn_h), argnums=(0, 1))(variables["params"], x)
        g_f = jax.grad(loss(bn_f), argnums=(0, 1))(variables["params"], x)
        jax.tree_util.tree_map_with_path(
            lambda k, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
                err_msg=str(k),
            ),
            g_h, g_f,
        )

    def test_eval_mode_matches(self):
        bn_h, bn_f, variables, x = self._setup()
        y_h = dataclasses.replace(bn_h, use_running_average=True).apply(
            variables, x
        )
        y_f = bn_f.clone(use_running_average=True).apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(y_h), np.asarray(y_f), rtol=1e-5, atol=1e-6
        )


class TestFoldedConvBN:
    """conv3+bn3 folded through the input moments == plain conv->BN.

    The fold (models/resnet.py::_conv1x1_bn_folded) reassociates the
    batch statistics of a linear map; in fp32 the two forms agree to
    accumulation order.  Checked: forward, updated batch_stats, and
    all parameter gradients, on both a stride-1 and a stride-2 block.
    """

    def _pair(self, stride):
        from sparsify_clip_tpu.models.resnet import Bottleneck

        folded = Bottleneck(planes=4, stride=stride, fold_bn3=True)
        plain = Bottleneck(planes=4, stride=stride, fold_bn3=False)
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((4, 8, 8, 16)), jnp.float32
        )
        variables = plain.init(jax.random.PRNGKey(2), x, train=True)
        # identical trees by construction
        v2 = folded.init(jax.random.PRNGKey(2), x, train=True)
        assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
        return folded, plain, variables, x

    @pytest.mark.parametrize("stride", [1, 2])
    def test_forward_and_stats_match(self, stride):
        folded, plain, variables, x = self._pair(stride)
        y1, s1 = plain.apply(variables, x, train=True, mutable=["batch_stats"])
        y2, s2 = folded.apply(variables, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-4, atol=2e-5)
        jax.tree_util.tree_map_with_path(
            lambda k, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5, err_msg=str(k)
            ),
            s1, s2,
        )

    def test_eval_mode_matches(self):
        folded, plain, variables, x = self._pair(1)
        y1 = plain.apply(variables, x, train=False)
        y2 = folded.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("stride", [1, 2])
    def test_grads_match(self, stride):
        folded, plain, variables, x = self._pair(stride)

        def loss(model):
            def f(p):
                y, _ = model.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(jnp.tanh(y))
            return f

        g1 = jax.grad(loss(plain))(variables["params"])
        g2 = jax.grad(loss(folded))(variables["params"])
        jax.tree_util.tree_map_with_path(
            lambda k, a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=str(k)
            ),
            g1, g2,
        )


@pytest.mark.parametrize("policy", ["nothing", "dots", "dots_no_batch", "attn_out"])
def test_remat_policies_preserve_numerics(policy):
    """Selective remat policies change what the backward pass
    recomputes, never the math: loss and grads must equal the
    remat-off model bit-for-bit shape-wise and to fp tolerance."""
    from sparsify_clip_tpu.models import create_model

    def build(remat, remat_policy=None):
        return create_model(
            "vit-policy-tiny", rng=jax.random.PRNGKey(3),
            remat=remat, remat_policy=remat_policy,
        )

    from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
    MODEL_REGISTRY.setdefault(
        "vit-policy-tiny",
        CLIPConfig(
            name="vit-policy-tiny", embed_dim=16, vision_kind="vit",
            image_size=32, vision_width=32, vision_layers=(2,),
            vision_heads=2, patch_size=16, vocab_size=256,
            context_length=12, text_width=16, text_heads=2, text_layers=2,
        ),
    )
    model_off, variables = build(remat=False)
    model_p, v2 = build(remat=True, remat_policy=policy)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    tokens = rng.integers(1, 250, size=(4, 12)).astype(np.int32)
    tokens[:, 0], tokens[:, -1] = 254, 255
    tokens = jnp.asarray(tokens)

    def loss_fn(model):
        def f(params):
            img, txt = model.apply({"params": params}, images, tokens, train=False)
            return jnp.sum(jnp.tanh(img)) + jnp.sum(jnp.tanh(txt))
        return f

    l_off, g_off = jax.value_and_grad(loss_fn(model_off))(variables["params"])
    l_p, g_p = jax.value_and_grad(loss_fn(model_p))(variables["params"])
    assert float(l_off) == pytest.approx(float(l_p), rel=1e-6)
    jax.tree_util.tree_map_with_path(
        lambda k, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7, err_msg=str(k)
        ),
        g_off, g_p,
    )


def test_remat_policy_unknown_name_rejected():
    from sparsify_clip_tpu.models.layers import resolve_remat_policy

    with pytest.raises(ValueError, match="remat_policy"):
        resolve_remat_policy("bogus")
    assert resolve_remat_policy(None) is None
    assert resolve_remat_policy("nothing") is None
    assert resolve_remat_policy("dots") is not None


def test_stem_s2d_exactly_matches_conv_stem():
    """The space-to-depth stem (2×2 conv over s2d(2) input with the
    in-graph repacked kernel) is the SAME function as the 3×3 stride-2
    stem conv: identical param tree, outputs and gradients."""
    model_p, variables, images, tokens = _init(TINY_RN)
    model_s = CLIP(cfg=TINY_RN, dtype=jnp.float32, stem_s2d=True)
    v2 = model_s.init(jax.random.PRNGKey(0), images, tokens, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)
    # identical initializer stream for the shared param path
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["visual"]["stem_conv1"]["kernel"].shape),
        np.asarray(v2["params"]["visual"]["stem_conv1"]["kernel"].shape),
    )

    def loss_fn(model):
        def f(params):
            (img, txt), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, tokens, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.tanh(img)) + jnp.sum(jnp.tanh(txt))
        return f

    # Bit-level equivalence of the stem itself is pinned by
    # test_s2d_pack_kernel_unit and the stop_after=0 check below; the
    # full tower comparisons allow for ~1e-7 contraction-order noise
    # amplified through four BatchNorm stages of a tiny random model.
    from sparsify_clip_tpu.models.resnet import ModifiedResNet

    stem_kw = dict(layers=(1, 1, 1, 1), width=8, image_size=32,
                   embed_dim=16, heads=4, stop_after=0)
    sv = {"params": variables["params"]["visual"],
          "batch_stats": variables["batch_stats"]["visual"]}
    s_p = ModifiedResNet(**stem_kw).apply(sv, images, train=False)
    s_s = ModifiedResNet(**stem_kw, stem_s2d=True).apply(sv, images, train=False)
    np.testing.assert_allclose(
        np.asarray(s_p), np.asarray(s_s), rtol=1e-5, atol=2e-6
    )

    l_p, g_p = jax.value_and_grad(loss_fn(model_p))(variables["params"])
    l_s, g_s = jax.value_and_grad(loss_fn(model_s))(variables["params"])
    assert float(l_p) == pytest.approx(float(l_s), rel=1e-3)
    del g_p, g_s  # full-tower grad trees sit at this tiny random
    # model's chaos floor (width-8 BN stages amplify the conv's ~1e-7
    # reassociation noise arbitrarily); gradient equivalence is pinned
    # tightly at the stem level instead:

    def stem_loss(variant):
        def f(params):
            out = ModifiedResNet(**stem_kw, stem_s2d=variant).apply(
                {"params": params, "batch_stats": sv["batch_stats"]},
                images, train=False,
            )
            return jnp.sum(jnp.tanh(out))
        return f

    gs_p = jax.grad(stem_loss(False))(sv["params"])
    gs_s = jax.grad(stem_loss(True))(sv["params"])
    np.testing.assert_allclose(
        np.asarray(gs_p["stem_conv1"]["kernel"]),
        np.asarray(gs_s["stem_conv1"]["kernel"]),
        rtol=1e-4, atol=1e-5,
    )

    # eval-mode forward (running stats path)
    e_p = model_p.apply(variables, images, method=model_p.encode_image)
    e_s = model_s.apply(variables, images, method=model_s.encode_image)
    np.testing.assert_allclose(
        np.asarray(e_p), np.asarray(e_s), rtol=2e-3, atol=1e-4
    )


def test_s2d_pack_kernel_unit():
    """Direct conv-level check: 3×3 stride-2 pad-1 conv == 2×2 conv on
    s2d input with the repacked kernel, on an odd non-square batch."""
    from sparsify_clip_tpu.models.resnet import s2d_pack_kernel, space_to_depth

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 16, 24, 5)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)) * 0.2, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 2), s2d_pack_kernel(w), (1, 1),
        ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_mlp_hidden_override_shapes_and_forward():
    """vision_mlp_hidden/text_mlp_hidden (the ViT-g/bigG non-4x MLPs)
    change exactly the c_fc/c_proj shapes and the forward still runs."""
    cfg = CLIPConfig(
        name="tiny-g", embed_dim=16, vision_kind="vit", image_size=32,
        vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
        vision_mlp_hidden=112,  # != 4*32
        vocab_size=64, context_length=8, text_width=16, text_heads=2,
        text_layers=2, text_mlp_hidden=48,  # != 4*16
    )
    model = CLIP(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
        jnp.zeros((2, 8), jnp.int32), train=False,
    )
    p = variables["params"]
    vis_mlp = p["visual"]["transformer"]["resblock_0"]["mlp"]
    txt_mlp = p["text"]["transformer"]["resblock_0"]["mlp"]
    assert vis_mlp["c_fc"]["kernel"].shape == (32, 112)
    assert vis_mlp["c_proj"]["kernel"].shape == (112, 32)
    assert txt_mlp["c_fc"]["kernel"].shape == (16, 48)
    assert txt_mlp["c_proj"]["kernel"].shape == (48, 16)
    img, txt = model.apply(
        variables, jnp.ones((2, 32, 32, 3)),
        jnp.ones((2, 8), jnp.int32), train=False,
    )
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    assert np.isfinite(np.asarray(img)).all()
