"""Point-E ViT-style diffusion transformer family (flax.linen).

TPU re-design of the inherited Point-E denoisers
(``/root/reference/models/transformer.py:23-494``), preserving the
numerically-load-bearing details:

- split-scaled attention (q and k each scaled by ``1/sqrt(sqrt(head_dim))``
  before the product — fp16/bf16-stable) with fp32 softmax (``:73-84``);
- init: normal(std = init_scale * sqrt(1/width)) on all projections, with
  zero-initialized output projection (``:191-193``);
- conditioning either as prepended tokens or as an added embedding, tokens
  stripped after the backbone (``:205-226``);
- training-time conditioning dropout per model (``:277-279`` etc.).

Activation rematerialization replaces the reference's custom autograd
checkpoint (``models/checkpoint.py``): set ``remat=True`` to wrap each
residual block in ``nn.remat``.

CLIP-conditioned variants take precomputed embeddings (channels-last
[B, D] vectors or [B, L, D] grids); the CLIP tower itself lives in
:mod:`pcdiff.models.clip`.

Layout: points are channels-last [B, N, C] (the reference is [B, C, N]).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import (
    LayerNorm,
    _DenseParams,
    _LNParams,
    _ln_dense_multi,
    fuse_ln_dense_enabled,
    fuse_ln_mlp_enabled,
    gelu_act,
    gelu_approximate,
)
from .embeddings import timestep_embedding

__all__ = [
    "PointEAttention",
    "PointEMLP",
    "ResidualAttentionBlock",
    "PointETransformer",
    "PointDiffusionTransformer",
    "CLIPImagePointDiffusionTransformer",
    "CLIPImageGridPointDiffusionTransformer",
    "UpsamplePointDiffusionTransformer",
    "CLIPImageGridUpsamplePointDiffusionTransformer",
]


def _init(init_scale: float):
    return nn.initializers.normal(stddev=init_scale)


class PointEAttention(nn.Module):
    """Fused-QKV self-attention with split scaling and fp32 softmax."""

    width: int
    heads: int
    init_scale: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, ln=None) -> jnp.ndarray:
        """With ``ln`` (an ``_LNParams`` tuple), ``x`` is UN-normalized and
        the pre-LN is fused into the qkv projection. The checkpoint's
        ``c_qkv`` kernel interleaves (q, k, v) PER HEAD ([C, H, 3, ch]
        column order); the fused path de-interleaves it into head-major
        wq/wk/wv panels at trace time (loop-invariant, hoisted by XLA), so
        the param tree and torch-port layout are unchanged."""
        B, N, _ = x.shape
        H = self.heads
        ch = self.width // H
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        from ..ops.flash_attention import fused_attention_mh

        if ln is not None:
            c = x.shape[-1]
            kernel, bias = _DenseParams(
                self.width * 3, kernel_init=_init(self.init_scale),
                name="c_qkv",
            )(c)
            k4 = kernel.reshape(c, H, 3, ch)
            b4 = bias.reshape(H, 3, ch)
            panels = [
                (k4[:, :, i, :].reshape(c, self.width),
                 b4[:, i, :].reshape(self.width))
                for i in range(3)
            ]
            # the reference's split scaling (q*s)(k*s) folds into wq as s^2
            q, k, v = _ln_dense_multi(
                x, ln, panels, self.dtype,
                out_scales=[scale * scale, None, None])
            out = fused_attention_mh(q, k, v, H)
        else:
            qkv = nn.Dense(
                self.width * 3, dtype=self.dtype,
                kernel_init=_init(self.init_scale), name="c_qkv",
            )(x)
            qkv = qkv.reshape(B, N, H, 3 * ch)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = fused_attention_mh(
                (q * (scale * scale)).reshape(B, N, self.width),
                k.reshape(B, N, self.width),
                v.reshape(B, N, self.width),
                H,
            )
        return nn.Dense(
            self.width, dtype=self.dtype, kernel_init=_init(self.init_scale),
            name="c_proj",
        )(out)


class PointEMLP(nn.Module):
    width: int
    init_scale: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, ln=None) -> jnp.ndarray:
        if ln is not None and fuse_ln_mlp_enabled():
            # whole pre-LN MLP in one kernel (hidden activation stays in
            # VMEM); param tree identical to the split/unfused graphs
            from ..ops.ln_dense import fused_ln_mlp

            fc = _DenseParams(
                self.width * 4, kernel_init=_init(self.init_scale),
                name="c_fc",
            )(x.shape[-1])
            proj = _DenseParams(
                self.width, kernel_init=_init(self.init_scale),
                name="c_proj",
            )(self.width * 4)
            scale, bias, eps = ln
            return fused_ln_mlp(x, scale, bias, fc[0], fc[1],
                                proj[0], proj[1], eps, self.dtype,
                                gelu_act())
        if ln is not None:
            # pre-LN fused into c_fc with the GELU epilogue on the f32
            # accumulator (exact erf by default; attention.set_gelu_impl)
            fc = _DenseParams(
                self.width * 4, kernel_init=_init(self.init_scale),
                name="c_fc",
            )(x.shape[-1])
            (h,) = _ln_dense_multi(x, ln, [fc], self.dtype,
                                   acts=[gelu_act()])
        else:
            h = nn.Dense(
                self.width * 4, dtype=self.dtype,
                kernel_init=_init(self.init_scale), name="c_fc",
            )(x)
            h = nn.gelu(h, approximate=gelu_approximate())
        return nn.Dense(
            self.width, dtype=self.dtype, kernel_init=_init(self.init_scale),
            name="c_proj",
        )(h)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        attn = PointEAttention(
            self.width, self.heads, self.init_scale, self.dtype, name="attn"
        )
        mlp = PointEMLP(self.width, self.init_scale, self.dtype, name="mlp")
        if fuse_ln_dense_enabled():
            ln1 = _LNParams(name="ln_1")(x.shape[-1])
            x = x + attn(x, ln=ln1)
            ln2 = _LNParams(name="ln_2")(x.shape[-1])
            x = x + mlp(x, ln=ln2)
        else:
            x = x + attn(LayerNorm(dtype=self.dtype, name="ln_1")(x))
            x = x + mlp(LayerNorm(dtype=self.dtype, name="ln_2")(x))
        return x


class PointETransformer(nn.Module):
    """Stack of residual attention blocks; init scale ~ 1/sqrt(width)."""

    width: int
    layers: int
    heads: int
    init_scale: float = 0.25
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init_scale = self.init_scale * math.sqrt(1.0 / self.width)
        block_cls = (
            nn.remat(ResidualAttentionBlock) if self.remat else ResidualAttentionBlock
        )
        for i in range(self.layers):
            x = block_cls(
                self.width, self.heads, init_scale, self.dtype,
                name=f"resblock_{i}",
            )(x)
        return x


class PointDiffusionTransformer(nn.Module):
    """Base Point-E denoiser: point tokens + (token or added) time cond."""

    input_channels: int = 3
    output_channels: int = 3
    n_ctx: int = 1024
    width: int = 512
    layers: int = 12
    heads: int = 8
    init_scale: float = 0.25
    time_token_cond: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def _time_mlp(self, t: jnp.ndarray) -> jnp.ndarray:
        return PointEMLP(
            self.width, self.init_scale * math.sqrt(1.0 / self.width),
            self.dtype, name="time_embed",
        )(timestep_embedding(t, self.width).astype(self.dtype))

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert x.shape[1] == self.n_ctx
        t_embed = self._time_mlp(t)
        return self._forward_with_cond(x, [(t_embed, self.time_token_cond)])

    def _forward_with_cond(self, x, cond_as_token) -> jnp.ndarray:
        h = nn.Dense(
            self.width, dtype=self.dtype,
            kernel_init=_init(self.init_scale * math.sqrt(1.0 / self.width)),
            name="input_proj",
        )(x.astype(self.dtype))
        for emb, as_token in cond_as_token:
            if not as_token:
                h = h + emb[:, None]
        extra = [
            (emb[:, None] if emb.ndim == 2 else emb)
            for emb, as_token in cond_as_token
            if as_token
        ]
        n_extra = sum(e.shape[1] for e in extra)
        if extra:
            h = jnp.concatenate(extra + [h], axis=1)
        h = LayerNorm(dtype=self.dtype, name="ln_pre")(h)
        h = PointETransformer(
            self.width, self.layers, self.heads, self.init_scale,
            remat=self.remat, dtype=self.dtype, name="backbone",
        )(h)
        h = LayerNorm(dtype=self.dtype, name="ln_post")(h)
        if extra:
            h = h[:, n_extra:]
        return nn.Dense(
            self.output_channels, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="output_proj",
        )(h)

    def _cond_dropout(self, emb, train: bool, cond_drop_prob: float):
        if not train or cond_drop_prob <= 0.0:
            return emb
        key = self.make_rng("cond_drop")
        mask = jax.random.uniform(key, (emb.shape[0],)) >= cond_drop_prob
        return emb * mask.reshape((-1,) + (1,) * (emb.ndim - 1)).astype(emb.dtype)


class CLIPImagePointDiffusionTransformer(PointDiffusionTransformer):
    """Conditioned on a single CLIP vector (text or image embedding)."""

    token_cond: bool = False
    cond_drop_prob: float = 0.0
    clip_feature_dim: int = 768

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray,
        embeddings: Optional[jnp.ndarray] = None, train: bool = False,
    ) -> jnp.ndarray:
        assert x.shape[1] == self.n_ctx
        assert embeddings is not None, "pass precomputed CLIP embeddings"
        t_embed = self._time_mlp(t)
        clip_out = self._cond_dropout(embeddings, train, self.cond_drop_prob)
        # rescale features to unit variance (reference transformer.py:282)
        clip_out = math.sqrt(clip_out.shape[1]) * clip_out
        clip_embed = nn.Dense(
            self.width, dtype=self.dtype,
            kernel_init=_init(self.init_scale * math.sqrt(1.0 / self.width)),
            name="clip_embed",
        )(clip_out.astype(self.dtype))
        cond = [(clip_embed, self.token_cond), (t_embed, self.time_token_cond)]
        return self._forward_with_cond(x, cond)


class CLIPImageGridPointDiffusionTransformer(PointDiffusionTransformer):
    """Conditioned on the CLIP ViT token grid [B, L, D] (channels-last)."""

    cond_drop_prob: float = 0.0
    grid_size: int = 16
    grid_feature_dim: int = 1024

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray,
        embeddings: Optional[jnp.ndarray] = None, train: bool = False,
    ) -> jnp.ndarray:
        assert x.shape[1] == self.n_ctx
        assert embeddings is not None, "pass precomputed CLIP grid embeddings"
        t_embed = self._time_mlp(t)
        clip_out = self._cond_dropout(embeddings, train, self.cond_drop_prob)
        h = LayerNorm(dtype=self.dtype, name="clip_embed_ln")(
            clip_out.astype(self.dtype)
        )
        clip_embed = nn.Dense(
            self.width, dtype=self.dtype,
            kernel_init=_init(self.init_scale * math.sqrt(1.0 / self.width)),
            name="clip_embed",
        )(h)
        cond = [(t_embed, self.time_token_cond), (clip_embed, True)]
        return self._forward_with_cond(x, cond)


class UpsamplePointDiffusionTransformer(PointDiffusionTransformer):
    """Upsampler: denoises n_ctx new points given low_res cond points."""

    cond_input_channels: Optional[int] = None
    cond_ctx: int = 1024
    channel_scales: Optional[Sequence[float]] = None
    channel_biases: Optional[Sequence[float]] = None

    def _embed_low_res(self, low_res: jnp.ndarray) -> jnp.ndarray:
        x = low_res
        if self.channel_scales is not None:
            x = x * jnp.asarray(self.channel_scales, dtype=x.dtype)[None, None, :]
        if self.channel_biases is not None:
            x = x + jnp.asarray(self.channel_biases, dtype=x.dtype)[None, None, :]
        return nn.Dense(
            self.width, dtype=self.dtype,
            kernel_init=_init(self.init_scale * math.sqrt(1.0 / self.width)),
            name="cond_point_proj",
        )(x.astype(self.dtype))

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, *,
        low_res: jnp.ndarray, train: bool = False,
    ) -> jnp.ndarray:
        assert x.shape[1] == self.n_ctx
        t_embed = self._time_mlp(t)
        low_res_embed = self._embed_low_res(low_res)
        cond = [(t_embed, self.time_token_cond), (low_res_embed, True)]
        return self._forward_with_cond(x, cond)


class CLIPImageGridUpsamplePointDiffusionTransformer(UpsamplePointDiffusionTransformer):
    """Upsampler additionally conditioned on a CLIP token grid."""

    cond_drop_prob: float = 0.0
    grid_size: int = 16
    grid_feature_dim: int = 1024

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, *,
        low_res: jnp.ndarray, embeddings: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        assert x.shape[1] == self.n_ctx
        t_embed = self._time_mlp(t)
        low_res_embed = self._embed_low_res(low_res)
        if embeddings is None:
            # unconditional generation support (reference :478-484)
            embeddings = jnp.zeros(
                (x.shape[0], self.grid_size**2, self.grid_feature_dim),
                dtype=x.dtype,
            )
        clip_out = self._cond_dropout(embeddings, train, self.cond_drop_prob)
        h = LayerNorm(dtype=self.dtype, name="clip_embed_ln")(
            clip_out.astype(self.dtype)
        )
        clip_embed = nn.Dense(
            self.width, dtype=self.dtype,
            kernel_init=_init(self.init_scale * math.sqrt(1.0 / self.width)),
            name="clip_embed",
        )(h)
        cond = [(t_embed, self.time_token_cond), (clip_embed, True),
                (low_res_embed, True)]
        return self._forward_with_cond(x, cond)
