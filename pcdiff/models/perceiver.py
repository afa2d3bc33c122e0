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

from .attention import LayerNorm
from .point_e import PointEMLP, _init

__all__ = ["MultiheadCrossAttention", "ResidualCrossAttentionBlock", "SimplePerceiver"]


class MultiheadCrossAttention(nn.Module):
    width: int
    heads: int
    init_scale: float
    data_width: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
        B, N_q, _ = x.shape
        N_d = data.shape[1]
        H = self.heads
        ch = self.width // H
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        q = nn.Dense(
            self.width, dtype=self.dtype, kernel_init=_init(self.init_scale),
            name="c_q",
        )(x).reshape(B, N_q, H, ch)
        kv = nn.Dense(
            self.width * 2, dtype=self.dtype, kernel_init=_init(self.init_scale),
            name="c_kv",
        )(data).reshape(B, N_d, H, 2 * ch)
        k, v = jnp.split(kv, 2, axis=-1)
        # fused multi-head kernel; split scaling folded into the query
        from ..ops.flash_attention import fused_attention_mh

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
        x = x + MultiheadCrossAttention(
            self.width, self.heads, self.init_scale, self.data_width,
            self.dtype, name="attn",
        )(
            LayerNorm(dtype=self.dtype, name="ln_1")(x),
            LayerNorm(dtype=self.dtype, name="ln_2")(data),
        )
        x = x + PointEMLP(self.width, self.init_scale, self.dtype, name="mlp")(
            LayerNorm(dtype=self.dtype, name="ln_3")(x)
        )
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
