"""SimplePerceiver: cross-attention-only stack (flax.linen).

Parity with ``/root/reference/models/perceiver.py:11-146``: query/data
projections with split-scaled attention, fp32 softmax, residual MLP. Used by
the SDF decoder to let query points attend to encoded cloud latents.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import (
    LayerNorm,
    _DenseParams,
    _LNParams,
    _ln_dense_multi,
    fuse_ln_dense_enabled,
)
from .point_e import PointEMLP, _init

__all__ = ["MultiheadCrossAttention", "ResidualCrossAttentionBlock", "SimplePerceiver"]


class MultiheadCrossAttention(nn.Module):
    width: int
    heads: int
    init_scale: float
    data_width: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, data: jnp.ndarray, *, q_ln=None, kv_ln=None
    ) -> jnp.ndarray:
        """With ``q_ln``/``kv_ln``, inputs are UN-normalized and the
        pre-LNs fuse into c_q / c_kv (the checkpoint's c_kv interleaves
        (k, v) per head; de-interleaved at trace time, tree unchanged)."""
        B, N_q, _ = x.shape
        N_d = data.shape[1]
        H = self.heads
        ch = self.width // H
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        from ..ops.flash_attention import fused_attention_mh

        if q_ln is not None:
            cq = x.shape[-1]
            cd = data.shape[-1]
            wq = _DenseParams(
                self.width, kernel_init=_init(self.init_scale), name="c_q"
            )(cq)
            kernel, bias = _DenseParams(
                self.width * 2, kernel_init=_init(self.init_scale), name="c_kv"
            )(cd)
            k4 = kernel.reshape(cd, H, 2, ch)
            b4 = bias.reshape(H, 2, ch)
            panels = [
                (k4[:, :, i, :].reshape(cd, self.width),
                 b4[:, i, :].reshape(self.width))
                for i in range(2)
            ]
            # split scaling (q*s)(k*s) folds into c_q as s^2
            (q,) = _ln_dense_multi(x, q_ln, [wq], self.dtype,
                                   out_scales=[scale * scale])
            k, v = _ln_dense_multi(data, kv_ln, panels, self.dtype)
            out = fused_attention_mh(q, k, v, H)
        else:
            q = nn.Dense(
                self.width, dtype=self.dtype,
                kernel_init=_init(self.init_scale), name="c_q",
            )(x).reshape(B, N_q, H, ch)
            kv = nn.Dense(
                self.width * 2, dtype=self.dtype,
                kernel_init=_init(self.init_scale), name="c_kv",
            )(data).reshape(B, N_d, H, 2 * ch)
            k, v = jnp.split(kv, 2, axis=-1)
            # fused multi-head kernel; split scaling folded into the query
            out = fused_attention_mh(
                (q * (scale * scale)).reshape(B, N_q, self.width),
                k.reshape(B, N_d, self.width),
                v.reshape(B, N_d, self.width),
                H,
            )
        return nn.Dense(
            self.width, dtype=self.dtype, kernel_init=_init(self.init_scale),
            name="c_proj",
        )(out)


class ResidualCrossAttentionBlock(nn.Module):
    width: int
    heads: int
    init_scale: float = 1.0
    data_width: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
        attn = MultiheadCrossAttention(
            self.width, self.heads, self.init_scale, self.data_width,
            self.dtype, name="attn",
        )
        mlp = PointEMLP(self.width, self.init_scale, self.dtype, name="mlp")
        if fuse_ln_dense_enabled():
            ln1 = _LNParams(name="ln_1")(x.shape[-1])
            ln2 = _LNParams(name="ln_2")(data.shape[-1])
            x = x + attn(x, data, q_ln=ln1, kv_ln=ln2)
            ln3 = _LNParams(name="ln_3")(x.shape[-1])
            x = x + mlp(x, ln=ln3)
        else:
            x = x + attn(
                LayerNorm(dtype=self.dtype, name="ln_1")(x),
                LayerNorm(dtype=self.dtype, name="ln_2")(data),
            )
            x = x + mlp(LayerNorm(dtype=self.dtype, name="ln_3")(x))
        return x


class SimplePerceiver(nn.Module):
    """Cross-attention-only stack: queries repeatedly attend to data."""

    width: int
    layers: int
    heads: int
    init_scale: float = 0.25
    data_width: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
        init_scale = self.init_scale * math.sqrt(1.0 / self.width)
        for i in range(self.layers):
            x = ResidualCrossAttentionBlock(
                self.width, self.heads, init_scale, self.data_width,
                self.dtype, name=f"resblock_{i}",
            )(x, data)
        return x
