"""Cross-framework forward parity for the ViT visual tower and the
text transformer.

The reference's model surface is open_clip's CLIP (instantiated at
sparsify_clip.py:685-692): a VisionTransformer visual tower and a
causal text transformer with EOT-argmax pooling.  This test builds an
independent torch transcription of both towers (written from the
architecture spec, state_dict keys in open_clip naming), randomizes
every parameter, converts through ``load_torch_clip_state_dict``, and
asserts both frameworks produce the same embeddings — completing the
interop matrix next to the RN50 visual test
(tests/test_torch_rn50_interop.py) and the text-tower param roundtrip
(tests/test_parallel_utils.py).

Activation note: plain (non-quickgelu) open_clip configs use torch's
default exact (erf) GELU; the flax towers use ``gelu_exact`` to match
(models/layers.py) — this test is what pins that.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.checkpoints import fill_from_flat, load_torch_clip_state_dict
from sparsify_clip_tpu.models.text import TextTransformer
from sparsify_clip_tpu.models.vit import VisionTransformer

WIDTH, HEADS, LAYERS, EMBED = 64, 2, 2, 32
IMAGE, PATCH = 32, 16
VOCAB, CTX = 128, 12


class TorchResblock(tnn.Module):
    """Pre-LN block with CLIP's fused in_proj attention naming."""

    def __init__(self, width, heads):
        super().__init__()
        self.heads = heads
        self.ln_1 = tnn.LayerNorm(width)
        self.attn = tnn.MultiheadAttention(width, heads, batch_first=True)
        self.ln_2 = tnn.LayerNorm(width)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(width, width * 4))
        self.mlp.add_module("gelu", tnn.GELU())  # exact erf
        self.mlp.add_module("c_proj", tnn.Linear(width * 4, width))

    def forward(self, x, attn_mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False, attn_mask=attn_mask)
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TorchVisual(tnn.Module):
    def __init__(self):
        super().__init__()
        grid = IMAGE // PATCH
        scale = WIDTH ** -0.5
        self.conv1 = tnn.Conv2d(3, WIDTH, PATCH, stride=PATCH, bias=False)
        self.class_embedding = tnn.Parameter(scale * torch.randn(WIDTH))
        self.positional_embedding = tnn.Parameter(
            scale * torch.randn(grid * grid + 1, WIDTH)
        )
        self.ln_pre = tnn.LayerNorm(WIDTH)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            TorchResblock(WIDTH, HEADS) for _ in range(LAYERS)
        )
        self.ln_post = tnn.LayerNorm(WIDTH)
        self.proj = tnn.Parameter(scale * torch.randn(WIDTH, EMBED))

    def forward(self, x):  # NCHW
        x = self.conv1(x)
        x = x.reshape(x.shape[0], WIDTH, -1).permute(0, 2, 1)  # (B, L, W)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, WIDTH)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding[None]
        x = self.ln_pre(x)
        for block in self.transformer.resblocks:
            x = block(x)
        return self.ln_post(x[:, 0]) @ self.proj


class TorchText(tnn.Module):
    def __init__(self):
        super().__init__()
        self.token_embedding = tnn.Embedding(VOCAB, WIDTH)
        self.positional_embedding = tnn.Parameter(0.01 * torch.randn(CTX, WIDTH))
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            TorchResblock(WIDTH, HEADS) for _ in range(LAYERS)
        )
        self.ln_final = tnn.LayerNorm(WIDTH)
        self.text_projection = tnn.Parameter(WIDTH ** -0.5 * torch.randn(WIDTH, EMBED))

    def forward(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding[None]
        # CLIP's additive causal mask (float -inf upper triangle)
        mask = torch.full((CTX, CTX), float("-inf")).triu(1)
        for block in self.transformer.resblocks:
            x = block(x, attn_mask=mask)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.text_projection


def _randomize(model, seed):
    torch.manual_seed(seed)
    for p in model.parameters():
        p.data.normal_(0.0, 0.05)


def test_vit_visual_embeddings_match_torch():
    tmodel = TorchVisual()
    _randomize(tmodel, 11)
    tmodel.eval()

    fmodel = VisionTransformer(
        image_size=IMAGE, patch_size=PATCH, width=WIDTH, layers=LAYERS,
        heads=HEADS, embed_dim=EMBED,
    )
    variables = fmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMAGE, IMAGE, 3))
    )
    sd = {f"visual.{k}": v.detach().clone() for k, v in tmodel.state_dict().items()}
    flat = load_torch_clip_state_dict(sd)
    assert not [k for k in flat if "_unmapped" in k]
    params = fill_from_flat(variables["params"], flat, prefix="visual/")

    rng = np.random.default_rng(2)
    images = rng.standard_normal((4, IMAGE, IMAGE, 3)).astype(np.float32)
    ours = fmodel.apply({"params": params}, jnp.asarray(images))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(images.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=2e-4, atol=2e-5
    )


def test_text_tower_embeddings_match_torch():
    tmodel = TorchText()
    _randomize(tmodel, 13)
    tmodel.eval()

    fmodel = TextTransformer(
        vocab_size=VOCAB, context_length=CTX, width=WIDTH, heads=HEADS,
        layers=LAYERS, embed_dim=EMBED,
    )
    variables = fmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CTX), jnp.int32)
    )
    # text keys carry no "visual." prefix in CLIP state_dicts
    sd = {k: v.detach().clone() for k, v in tmodel.state_dict().items()}
    flat = load_torch_clip_state_dict(sd)
    assert not [k for k in flat if "_unmapped" in k]
    params = fill_from_flat(variables["params"], flat, prefix="text/")

    rng = np.random.default_rng(3)
    tokens = rng.integers(1, VOCAB - 2, size=(4, CTX)).astype(np.int32)
    tokens[:, 0] = VOCAB - 2
    tokens[:, 5] = VOCAB - 1  # EOT mid-sequence exercises argmax pooling
    ours = fmodel.apply({"params": params}, jnp.asarray(tokens))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(tokens.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=2e-4, atol=2e-5
    )


def test_exact_gelu_matches_torch_default():
    """The towers' activation is exact (erf) GELU, not flax's default
    tanh approximation — the open_clip plain configs use torch
    nn.GELU() (exact).  A tanh-GELU would fail this at ~3e-4."""
    from sparsify_clip_tpu.models.layers import gelu_exact

    x = np.linspace(-4, 4, 101, dtype=np.float32)
    want = F.gelu(torch.from_numpy(x)).numpy()
    got = np.asarray(gelu_exact(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# Train-mode lockstep: the full two-tower ViT CLIP — fused-in_proj
# attention x exact GELU x EOT-argmax pooling x raw learnable
# temperature x AdamW(wd on everything) — must track torch end to end,
# completing the trajectory-parity story next to the RN50 lockstep
# (tests/test_torch_rn50_interop.py).  Reference train loop:
# sparsify_clip.py:682-986 (temperature param :716-717, AdamW :727-730).


def test_vit_clip_train_mode_adamw_lockstep_vs_torch():
    """5 fp32 AdamW steps of the symmetric contrastive loss on identical
    image/token batches in train mode, BOTH towers plus the raw
    learnable temperature in the optimizer: per-step losses, the final
    temperature and final params must agree."""
    import optax

    from sparsify_clip_tpu.losses import LossContext, make_loss_fn
    from sparsify_clip_tpu.utils.numerics import l2_normalize

    B, STEPS, LR = 8, 5, 1e-3

    class TorchCLIP(tnn.Module):
        def __init__(self):
            super().__init__()
            self.visual = TorchVisual()
            self.text = TorchText()
            # raw temperature divisor, a la sparsify_clip.py:716-717
            self.temperature = tnn.Parameter(torch.tensor(0.1))

        def forward(self, images, tokens):
            img = self.visual(images)
            txt = self.text(tokens)
            img = img / img.norm(dim=-1, keepdim=True)
            txt = txt / txt.norm(dim=-1, keepdim=True)
            sim = img @ txt.T / self.temperature
            lbl = torch.arange(img.shape[0])
            return (
                F.cross_entropy(sim, lbl) + F.cross_entropy(sim.T, lbl)
            ) / 2

    tmodel = TorchCLIP()
    _randomize(tmodel, 17)
    with torch.no_grad():
        tmodel.temperature.copy_(torch.tensor(0.1))
    tmodel.train()

    fvis = VisionTransformer(
        image_size=IMAGE, patch_size=PATCH, width=WIDTH, layers=LAYERS,
        heads=HEADS, embed_dim=EMBED,
    )
    ftxt = TextTransformer(
        vocab_size=VOCAB, context_length=CTX, width=WIDTH, heads=HEADS,
        layers=LAYERS, embed_dim=EMBED,
    )
    vis_vars = fvis.init(jax.random.PRNGKey(0), jnp.zeros((1, IMAGE, IMAGE, 3)))
    txt_vars = ftxt.init(jax.random.PRNGKey(1), jnp.zeros((1, CTX), jnp.int32))

    # snapshot (live views!) and convert through the real machinery
    sd = {
        k.replace("text.", "", 1) if k.startswith("text.") else k:
            v.detach().clone()
        for k, v in tmodel.state_dict().items()
    }
    flat = load_torch_clip_state_dict(sd)
    trainables = {
        "visual": fill_from_flat(vis_vars["params"], flat, prefix="visual/"),
        "text": fill_from_flat(txt_vars["params"], flat, prefix="text/"),
        "temperature": jnp.float32(0.1),
    }

    rng = np.random.default_rng(23)
    images = rng.standard_normal((STEPS, B, IMAGE, IMAGE, 3)).astype(np.float32)
    tokens = rng.integers(1, VOCAB - 2, size=(STEPS, B, CTX)).astype(np.int32)
    tokens[..., 0] = VOCAB - 2
    tokens[..., -1] = VOCAB - 1

    # --- torch side
    opt_t = torch.optim.AdamW(tmodel.parameters(), lr=LR)
    torch_losses = []
    for s in range(STEPS):
        loss = tmodel(
            torch.from_numpy(images[s].transpose(0, 3, 1, 2)),
            torch.from_numpy(tokens[s].astype(np.int64)),
        )
        torch_losses.append(float(loss.detach()))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()

    # --- our side
    loss_core = make_loss_fn("anchor")

    def loss_of(tr, x, tok):
        img = fvis.apply({"params": tr["visual"]}, x)
        txt = ftxt.apply({"params": tr["text"]}, tok)
        ctx = LossContext(
            temperature=tr["temperature"], beta=jnp.float32(0.0),
            alpha=jnp.float32(0.0), warm=jnp.array(False),
        )
        loss, _ = loss_core(l2_normalize(img), l2_normalize(txt), ctx)
        return loss

    opt = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    opt_state = opt.init(trainables)

    @jax.jit
    def step(tr, os_, x, tok):
        loss, grads = jax.value_and_grad(loss_of)(tr, x, tok)
        updates, os_ = opt.update(grads, os_, tr)
        return loss, optax.apply_updates(tr, updates), os_

    jax_losses = []
    for s in range(STEPS):
        loss, trainables, opt_state = step(
            trainables, opt_state, jnp.asarray(images[s]),
            jnp.asarray(tokens[s]),
        )
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        float(trainables["temperature"]), float(tmodel.temperature),
        rtol=1e-3,
    )

    # final params through the same converter
    sd_after = {
        (k.replace("text.", "", 1) if k.startswith("text.") else k): v
        for k, v in tmodel.state_dict().items()
    }
    flat_after = load_torch_clip_state_dict(sd_after)
    want = {
        "visual": fill_from_flat(vis_vars["params"], flat_after, prefix="visual/"),
        "text": fill_from_flat(txt_vars["params"], flat_after, prefix="text/"),
    }
    for tower in ("visual", "text"):
        for (path, ours), (_, w) in zip(
            jax.tree_util.tree_leaves_with_path(trainables[tower]),
            jax.tree_util.tree_leaves_with_path(want[tower]),
        ):
            key = jax.tree_util.keystr(path)
            ours, w = np.asarray(ours), np.asarray(w)
            if "in_proj" in key and "bias" in key:
                # the key third of the fused qkv bias has a mathematically
                # ZERO gradient (softmax is shift-invariant over keys);
                # both frameworks walk it O(lr) in Adam-noise directions —
                # compare the q and v thirds only (same exclusion as the
                # RN50 lockstep's k_proj.bias)
                ours = np.concatenate([ours[:WIDTH], ours[2 * WIDTH:]])
                w = np.concatenate([w[:WIDTH], w[2 * WIDTH:]])
            np.testing.assert_allclose(
                ours, w, rtol=2e-3, atol=1.2 * LR,
                err_msg=f"{tower} param {key}",
            )
