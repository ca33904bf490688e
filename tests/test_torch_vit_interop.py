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
