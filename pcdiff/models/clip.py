"""CLIP (ViT-L/14 or ViT-B/32) in JAX/flax for Point-E conditioning.

Replaces the reference's wrapper around the OpenAI ``clip`` package
(``/root/reference/models/pretrained_clip.py:13-270``). The towers replicate
the OpenAI architecture (quick-GELU MLPs, pre-LN residual blocks, causal text
mask, EOT-token text pooling) so published CLIP checkpoints load via
:func:`import_clip_torch_state`.

Surfaces match the reference wrapper:
- ``embed_text``   -> L2-normalized [N, feature_dim]
- ``embed_images`` -> L2-normalized [N, feature_dim] (preprocessed pixels in)
- ``embed_images_grid`` -> the post-transformer, pre-ln_post token grid
  WITHOUT the CLS token, [N, grid_size**2, width] channels-last
  (the reference taps the same activations, ``pretrained_clip.py:193-213``,
  but returns channels-first [N, C, L])
- mixed-modality batching with per-element presence flags
  (``ImageCLIP.forward`` / ``_static_multimodal_embed``, ``:67-157``).

Image preprocessing (resize/center-crop/normalize) is a host-side numpy
helper; BPE tokenization requires the standard CLIP vocab file (pass
tokenized ids directly when it is unavailable).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .attention import (
    _DenseParams,
    _LNParams,
    _ln_dense_multi,
    fuse_ln_dense_enabled,
)

__all__ = [
    "CLIPConfig",
    "CLIP_CONFIGS",
    "CLIPTextTower",
    "CLIPVisionTower",
    "CLIPModel",
    "ImageCLIP",
    "import_clip_torch_state",
    "preprocess_image",
]


class CLIPConfig:
    def __init__(self, *, embed_dim, image_resolution, vision_width,
                 vision_layers, vision_patch, text_width, text_layers,
                 text_heads, vocab_size=49408, context_length=77,
                 vision_heads=None):
        self.embed_dim = embed_dim
        self.image_resolution = image_resolution
        self.vision_width = vision_width
        self.vision_layers = vision_layers
        self.vision_patch = vision_patch
        self.vision_heads = vision_heads or vision_width // 64
        self.text_width = text_width
        self.text_layers = text_layers
        self.text_heads = text_heads
        self.vocab_size = vocab_size
        self.context_length = context_length

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch


CLIP_CONFIGS = {
    "ViT-L/14": CLIPConfig(
        embed_dim=768, image_resolution=224, vision_width=1024,
        vision_layers=24, vision_patch=14, text_width=768, text_layers=12,
        text_heads=12,
    ),
    "ViT-B/32": CLIPConfig(
        embed_dim=512, image_resolution=224, vision_width=768,
        vision_layers=12, vision_patch=32, text_width=512, text_layers=12,
        text_heads=8,
    ),
}


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class _CLIPAttention(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 *, ln=None):
        """With ``ln``, ``x`` is UN-normalized and the pre-LN fuses into
        in_proj (contiguous-thirds qkv; 1/sqrt(Dh) folded into the q
        panel). Works for both the unmasked vision path and the masked
        text path (the projection fuses either way)."""
        B, N, _ = x.shape
        H, Dh = self.heads, self.width // self.heads
        if ln is not None:
            c = x.shape[-1]
            kernel, bias = _DenseParams(
                3 * self.width, kernel_init=nn.initializers.lecun_normal(),
                name="in_proj",
            )(c)
            W = self.width
            panels = [(kernel[:, i * W:(i + 1) * W], bias[i * W:(i + 1) * W])
                      for i in range(3)]
            q, k, v = _ln_dense_multi(x, ln, panels, self.dtype,
                                      out_scales=[Dh**-0.5, None, None])
        else:
            qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q * (Dh**-0.5)
        if mask is None:
            # vision tower: unmasked -> fused multi-head kernel
            from ..ops.flash_attention import fused_attention_mh

            out = fused_attention_mh(q, k, v, H)
        else:
            q = q.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
            k = k.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
            v = v.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits + mask
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class _CLIPBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        attn = _CLIPAttention(self.width, self.heads, self.dtype, name="attn")
        if fuse_ln_dense_enabled():
            ln1 = _LNParams(name="ln_1")(x.shape[-1])
            x = x + attn(x, mask, ln=ln1)
            ln2 = _LNParams(name="ln_2")(x.shape[-1])
            fc = _DenseParams(
                self.width * 4, kernel_init=nn.initializers.lecun_normal(),
                name="c_fc",
            )(x.shape[-1])
            (h,) = _ln_dense_multi(x, ln2, [fc], self.dtype,
                                   acts=["quick_gelu"])
        else:
            x = x + attn(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x),
                mask,
            )
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
            h = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(h)
            h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, return_grid: bool = False):
        """pixels: [B, H, W, 3] preprocessed. Returns [B, D] embedding, or
        the [B, grid**2, width] pre-ln_post token grid when ``return_grid``."""
        cfg = self.config
        B = pixels.shape[0]
        x = nn.Conv(
            cfg.vision_width, (cfg.vision_patch, cfg.vision_patch),
            strides=(cfg.vision_patch, cfg.vision_patch), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(pixels.astype(self.dtype))
        x = x.reshape(B, -1, cfg.vision_width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(cfg.vision_width**-0.5),
            (cfg.vision_width,),
        ).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.vision_width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(cfg.vision_width**-0.5),
            (cfg.grid_size**2 + 1, cfg.vision_width),
        ).astype(self.dtype)
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(cfg.vision_layers):
            x = _CLIPBlock(cfg.vision_width, cfg.vision_heads, self.dtype,
                           name=f"block_{i}")(x)
        if return_grid:
            # reference grid tap: post-transformer, pre-ln_post, CLS dropped
            return x[:, 1:, :].astype(jnp.float32)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(
            x[:, 0, :]
        )
        proj = self.param(
            "proj", nn.initializers.normal(cfg.vision_width**-0.5),
            (cfg.vision_width, cfg.embed_dim),
        ).astype(self.dtype)
        return x @ proj


class CLIPTextTower(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray):
        """tokens: [B, context_length] int32 -> [B, embed_dim] (EOT-pooled)."""
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.text_width, dtype=self.dtype,
                     name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.text_width),
        ).astype(self.dtype)
        x = x + pos[None, : x.shape[1]]
        n = x.shape[1]
        mask = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)
        for i in range(cfg.text_layers):
            x = _CLIPBlock(cfg.text_width, cfg.text_heads, self.dtype,
                           name=f"block_{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        # pool at the EOT token (highest token id per sequence)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(cfg.text_width**-0.5),
            (cfg.text_width, cfg.embed_dim),
        ).astype(self.dtype)
        return x @ proj


class CLIPModel(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = CLIPVisionTower(self.config, self.dtype)
        self.text = CLIPTextTower(self.config, self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ()
        )

    def encode_image(self, pixels, return_grid: bool = False):
        return self.visual(pixels, return_grid=return_grid)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, pixels, tokens):
        return self.encode_image(pixels), self.encode_text(tokens)


# --------------------------------------------------------------- user-facing

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def preprocess_image(img: np.ndarray, resolution: int = 224) -> np.ndarray:
    """uint8 HWC image -> resized/center-cropped/normalized float32 HWC.

    Bilinear resize of the short side to ``resolution`` then center crop —
    the torchvision transform CLIP ships with.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    scale = resolution / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    # bilinear resize in numpy
    ys = np.linspace(0, h - 1, nh)
    xs = np.linspace(0, w - 1, nw)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    im = img.astype(np.float32)
    top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
    bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    oy, ox = (nh - resolution) // 2, (nw - resolution) // 2
    out = out[oy : oy + resolution, ox : ox + resolution]
    return (((out / 255.0) - _CLIP_MEAN) / _CLIP_STD).astype(np.float32)


class ImageCLIP:
    """Batch-mixing wrapper over the JAX CLIP towers.

    Mirrors the reference ``ImageCLIP`` / ``FrozenImageCLIP`` surface; absent
    modalities contribute zero embeddings per element (the DDP-graph trick of
    ``_static_multimodal_embed`` is unnecessary under SPMD jit — presence is
    a multiplicative mask, identical on every shard).
    """

    def __init__(self, variables, clip_name: str = "ViT-L/14",
                 tokenizer=None, bpe_path: Optional[str] = None):
        assert clip_name in CLIP_CONFIGS
        if tokenizer is None and bpe_path is not None:
            from ..tokenizer import SimpleTokenizer

            tokenizer = SimpleTokenizer(bpe_path)
        self.config = CLIP_CONFIGS[clip_name]
        self.clip_name = clip_name
        self.model = CLIPModel(self.config)
        self.variables = variables
        self.tokenizer = tokenizer
        self._encode_image = jax.jit(
            lambda px: self.model.apply(
                self.variables, px, method=CLIPModel.encode_image
            )
        )
        self._encode_grid = jax.jit(
            lambda px: self.model.apply(
                self.variables, px, return_grid=True,
                method=CLIPModel.encode_image,
            )
        )
        self._encode_text = jax.jit(
            lambda tok: self.model.apply(
                self.variables, tok, method=CLIPModel.encode_text
            )
        )

    @property
    def feature_dim(self) -> int:
        return self.config.embed_dim

    @property
    def grid_size(self) -> int:
        return self.config.grid_size

    @property
    def grid_feature_dim(self) -> int:
        return self.config.vision_width

    def _tokenize(self, texts):
        if self.tokenizer is None:
            raise RuntimeError(
                "no tokenizer configured; pass pre-tokenized ids or provide a "
                "CLIP BPE tokenizer"
            )
        return self.tokenizer(texts)

    def embed_images(self, images: np.ndarray) -> jnp.ndarray:
        """Preprocessed pixels [N, H, W, 3] -> L2-normalized [N, D]."""
        out = self._encode_image(jnp.asarray(images))
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    def embed_text(self, prompts) -> jnp.ndarray:
        tokens = (
            prompts if isinstance(prompts, (np.ndarray, jnp.ndarray))
            else self._tokenize(list(prompts))
        )
        out = self._encode_text(jnp.asarray(tokens, dtype=jnp.int32))
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    def embed_images_grid(self, images: np.ndarray) -> jnp.ndarray:
        """Preprocessed pixels -> [N, grid**2, width] token grid
        (channels-last; the reference returns [N, width, grid**2])."""
        return self._encode_grid(jnp.asarray(images))

    def __call__(self, batch_size: int, images=None, texts=None,
                 embeddings=None) -> jnp.ndarray:
        """Mixed-modality batch embedding with per-element zero fallback."""
        result = np.zeros((batch_size, self.feature_dim), dtype=np.float32)
        image_seq = [None] * batch_size if images is None else list(images)
        text_seq = [None] * batch_size if texts is None else list(texts)
        emb_seq = [None] * batch_size if embeddings is None else list(embeddings)
        assert len(image_seq) == len(text_seq) == len(emb_seq) == batch_size
        img_idx = [(i, im) for i, im in enumerate(image_seq) if im is not None]
        txt_idx = [(i, tx) for i, tx in enumerate(text_seq) if tx is not None]
        for i, (im, tx, em) in enumerate(zip(image_seq, text_seq, emb_seq)):
            assert sum(x is not None for x in (im, tx, em)) < 2, (
                "only one modality may be non-None per batch element"
            )
            if em is not None:
                result[i] = np.asarray(em)
        if img_idx:
            embs = np.asarray(self.embed_images(
                np.stack([preprocess_image(im, self.config.image_resolution)
                          for _, im in img_idx])
            ))
            for (i, _), e in zip(img_idx, embs):
                result[i] = e
        if txt_idx:
            embs = np.asarray(self.embed_text([tx for _, tx in txt_idx]))
            for (i, _), e in zip(txt_idx, embs):
                result[i] = e
        return jnp.asarray(result)


# ------------------------------------------------------------- torch import

def _t(x) -> np.ndarray:
    return (x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)).astype(np.float32)


def _clip_block(sd, prefix) -> Dict[str, Any]:
    return {
        "ln_1": {"scale": _t(sd[f"{prefix}.ln_1.weight"]),
                 "bias": _t(sd[f"{prefix}.ln_1.bias"])},
        "ln_2": {"scale": _t(sd[f"{prefix}.ln_2.weight"]),
                 "bias": _t(sd[f"{prefix}.ln_2.bias"])},
        "attn": {
            "in_proj": {"kernel": _t(sd[f"{prefix}.attn.in_proj_weight"]).T,
                        "bias": _t(sd[f"{prefix}.attn.in_proj_bias"])},
            "out_proj": {"kernel": _t(sd[f"{prefix}.attn.out_proj.weight"]).T,
                         "bias": _t(sd[f"{prefix}.attn.out_proj.bias"])},
        },
        "c_fc": {"kernel": _t(sd[f"{prefix}.mlp.c_fc.weight"]).T,
                 "bias": _t(sd[f"{prefix}.mlp.c_fc.bias"])},
        "c_proj": {"kernel": _t(sd[f"{prefix}.mlp.c_proj.weight"]).T,
                   "bias": _t(sd[f"{prefix}.mlp.c_proj.bias"])},
    }


def import_clip_torch_state(state_dict, clip_name: str = "ViT-L/14") -> Dict[str, Any]:
    """Convert an OpenAI CLIP state_dict to this module's flax variables."""
    sd = state_dict
    cfg = CLIP_CONFIGS[clip_name]
    visual: Dict[str, Any] = {
        "conv1": {"kernel": _t(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _t(sd["visual.class_embedding"]),
        "positional_embedding": _t(sd["visual.positional_embedding"]),
        "ln_pre": {"scale": _t(sd["visual.ln_pre.weight"]),
                   "bias": _t(sd["visual.ln_pre.bias"])},
        "ln_post": {"scale": _t(sd["visual.ln_post.weight"]),
                    "bias": _t(sd["visual.ln_post.bias"])},
        "proj": _t(sd["visual.proj"]),
    }
    for i in range(cfg.vision_layers):
        visual[f"block_{i}"] = _clip_block(sd, f"visual.transformer.resblocks.{i}")

    text: Dict[str, Any] = {
        "token_embedding": {"embedding": _t(sd["token_embedding.weight"])},
        "positional_embedding": _t(sd["positional_embedding"]),
        "ln_final": {"scale": _t(sd["ln_final.weight"]),
                     "bias": _t(sd["ln_final.bias"])},
        "text_projection": _t(sd["text_projection"]),
    }
    for i in range(cfg.text_layers):
        text[f"block_{i}"] = _clip_block(sd, f"transformer.resblocks.{i}")

    return {"params": {"visual": visual, "text": text,
                       "logit_scale": _t(sd["logit_scale"])}}
