"""JAX CLIP tower tests: structure, weight-port parity vs a tiny torch CLIP."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from pcdiff.models.clip import (
    CLIPConfig,
    CLIPModel,
    ImageCLIP,
    import_clip_torch_state,
    preprocess_image,
    quick_gelu,
)

TINY = CLIPConfig(
    embed_dim=16, image_resolution=32, vision_width=32, vision_layers=2,
    vision_patch=16, text_width=32, text_layers=2, text_heads=4,
    vocab_size=64, context_length=12, vision_heads=4,
)


def _tiny_torch_clip():
    """A minimal torch CLIP with OpenAI naming, for weight-port parity."""

    class Block(nn.Module):
        def __init__(self, w, h):
            super().__init__()
            self.ln_1 = nn.LayerNorm(w)
            self.ln_2 = nn.LayerNorm(w)
            self.attn = nn.MultiheadAttention(w, h, batch_first=False)
            self.mlp = nn.ModuleDict(
                dict(c_fc=nn.Linear(w, w * 4), c_proj=nn.Linear(w * 4, w))
            )

        def forward(self, x, mask=None):
            h = self.ln_1(x)
            a, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
            x = x + a
            h = self.mlp["c_fc"](self.ln_2(x))
            h = h * torch.sigmoid(1.702 * h)  # quick gelu
            return x + self.mlp["c_proj"](h)

    cfg = TINY

    class TorchCLIP(nn.Module):
        def __init__(self):
            super().__init__()
            w, tw = cfg.vision_width, cfg.text_width
            self.visual = nn.Module()
            self.visual.conv1 = nn.Conv2d(3, w, cfg.vision_patch,
                                          cfg.vision_patch, bias=False)
            self.visual.class_embedding = nn.Parameter(torch.randn(w) * 0.1)
            self.visual.positional_embedding = nn.Parameter(
                torch.randn(cfg.grid_size**2 + 1, w) * 0.1
            )
            self.visual.ln_pre = nn.LayerNorm(w)
            self.visual.ln_post = nn.LayerNorm(w)
            self.visual.proj = nn.Parameter(torch.randn(w, cfg.embed_dim) * 0.1)
            self.visual.transformer = nn.Module()
            self.visual.transformer.resblocks = nn.ModuleList(
                [Block(w, cfg.vision_heads) for _ in range(cfg.vision_layers)]
            )
            self.token_embedding = nn.Embedding(cfg.vocab_size, tw)
            self.positional_embedding = nn.Parameter(
                torch.randn(cfg.context_length, tw) * 0.1
            )
            self.transformer = nn.Module()
            self.transformer.resblocks = nn.ModuleList(
                [Block(tw, cfg.text_heads) for _ in range(cfg.text_layers)]
            )
            self.ln_final = nn.LayerNorm(tw)
            self.text_projection = nn.Parameter(
                torch.randn(tw, cfg.embed_dim) * 0.1
            )
            self.logit_scale = nn.Parameter(torch.tensor(2.6593))

        def encode_image(self, px):
            v = self.visual
            x = v.conv1(px)  # [B, w, g, g]
            x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
            cls = v.class_embedding[None, None].expand(x.shape[0], 1, -1)
            x = torch.cat([cls, x], dim=1) + v.positional_embedding[None]
            x = v.ln_pre(x).permute(1, 0, 2)
            for blk in v.transformer.resblocks:
                x = blk(x)
            x = x.permute(1, 0, 2)
            return v.ln_post(x[:, 0]) @ v.proj

        def encode_text(self, tokens):
            x = self.token_embedding(tokens) + self.positional_embedding[None]
            n = x.shape[1]
            mask = torch.full((n, n), float("-inf")).triu(1)
            x = x.permute(1, 0, 2)
            for blk in self.transformer.resblocks:
                x = blk(x, mask)
            x = x.permute(1, 0, 2)
            x = self.ln_final(x)
            eot = tokens.argmax(dim=-1)
            return x[torch.arange(x.shape[0]), eot] @ self.text_projection

    torch.manual_seed(0)
    m = TorchCLIP()
    m.eval()
    # rename MHA keys to OpenAI state_dict convention
    sd = {}
    for k, v in m.state_dict().items():
        k = k.replace("mlp.c_fc", "mlp.c_fc").replace("mlp.c_proj", "mlp.c_proj")
        sd[k] = v
    return m, sd


@pytest.fixture(scope="module")
def towers():
    ref, sd = _tiny_torch_clip()
    variables = import_clip_torch_state(sd, "ViT-L/14") if False else None
    # import with the tiny layer counts: patch the config-dependent loop
    from pcdiff.models import clip as clip_mod

    visual = {
        "conv1": {"kernel": sd["visual.conv1.weight"].numpy().transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"].numpy(),
        "positional_embedding": sd["visual.positional_embedding"].numpy(),
        "ln_pre": {"scale": sd["visual.ln_pre.weight"].numpy(),
                   "bias": sd["visual.ln_pre.bias"].numpy()},
        "ln_post": {"scale": sd["visual.ln_post.weight"].numpy(),
                    "bias": sd["visual.ln_post.bias"].numpy()},
        "proj": sd["visual.proj"].numpy(),
    }
    for i in range(TINY.vision_layers):
        visual[f"block_{i}"] = clip_mod._clip_block(
            sd, f"visual.transformer.resblocks.{i}"
        )
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"].numpy()},
        "positional_embedding": sd["positional_embedding"].numpy(),
        "ln_final": {"scale": sd["ln_final.weight"].numpy(),
                     "bias": sd["ln_final.bias"].numpy()},
        "text_projection": sd["text_projection"].numpy(),
    }
    for i in range(TINY.text_layers):
        text[f"block_{i}"] = clip_mod._clip_block(sd, f"transformer.resblocks.{i}")
    variables = {"params": {"visual": visual, "text": text,
                            "logit_scale": sd["logit_scale"].numpy()}}
    return ref, CLIPModel(TINY), variables


def test_vision_tower_parity(towers, rng):
    ref, model, variables = towers
    px = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_image(torch.from_numpy(px).permute(0, 3, 1, 2)).numpy()
    got = model.apply(variables, jnp.asarray(px), method=CLIPModel.encode_image)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_text_tower_parity(towers, rng):
    ref, model, variables = towers
    tokens = rng.integers(1, 60, (2, 12))
    tokens[:, -1] = 63  # EOT = max id
    with torch.no_grad():
        want = ref.encode_text(torch.from_numpy(tokens)).numpy()
    got = model.apply(
        variables, jnp.asarray(tokens, dtype=jnp.int32),
        method=CLIPModel.encode_text,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_grid_tap_shape(towers, rng):
    _, model, variables = towers
    px = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    grid = model.apply(
        variables, jnp.asarray(px), return_grid=True,
        method=CLIPModel.encode_image,
    )
    assert grid.shape == (2, TINY.grid_size**2, TINY.vision_width)


def test_image_clip_wrapper_mixed_batch(towers, rng):
    _, model, variables = towers
    from pcdiff.models import clip as clip_mod

    wrapper = clip_mod.ImageCLIP.__new__(clip_mod.ImageCLIP)
    wrapper.config = TINY
    wrapper.clip_name = "tiny"
    wrapper.model = model
    wrapper.variables = variables
    wrapper.tokenizer = None
    import jax as _jax

    wrapper._encode_image = _jax.jit(
        lambda px: model.apply(variables, px, method=CLIPModel.encode_image)
    )
    wrapper._encode_grid = _jax.jit(
        lambda px: model.apply(variables, px, return_grid=True,
                               method=CLIPModel.encode_image)
    )
    wrapper._encode_text = _jax.jit(
        lambda tok: model.apply(variables, tok, method=CLIPModel.encode_text)
    )

    emb = rng.standard_normal((TINY.embed_dim,)).astype(np.float32)
    out = wrapper(3, images=[rng.integers(0, 255, (40, 40, 3)), None, None],
                  embeddings=[None, emb, None])
    out = np.asarray(out)
    assert out.shape == (3, TINY.embed_dim)
    np.testing.assert_allclose(out[1], emb, rtol=1e-6)
    np.testing.assert_allclose(out[2], 0.0, atol=1e-8)
    assert np.abs(out[0]).max() > 0


def test_preprocess_image_shape(rng):
    img = rng.integers(0, 255, (100, 80, 3)).astype(np.uint8)
    out = preprocess_image(img, resolution=32)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
