"""Rotary-position partial-cloud encoder (alternative, flag-selectable).

Port of the reference's unused-but-preserved rotary encoder option
(``/root/reference/models/rotaryencoderpcd.py:6-165``): 3D rotary position
embedding rotating the first 6 head dims by xyz * pi, a rotary transformer
encoder over the points, and learned-query token extraction.

Note on the reference's ``decoder_attn``: it is invoked with the queries as
tokens and the raw point cloud as ``pos`` (``rotaryencoderpcd.py:157``),
which only broadcasts when ``num_tokens == num_points`` — the module was
never exercised. Here the query-extraction stage uses cross-attention from
queries to the rotary-encoded points (the evident intent), keeping the
rotary self-attention for the encoder/refiner stages.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import CrossAttention, LayerNorm, Mlp, default_kernel_init

__all__ = ["apply_rotary_pos_emb", "RotarySelfAttention", "RotaryTransformerLayer",
           "RotaryPartialPointCloudEncoder"]


def apply_rotary_pos_emb(q: jnp.ndarray, k: jnp.ndarray, coords: jnp.ndarray):
    """Rotate the first 6 head dims (3 axis pairs) of q/k by xyz * pi.

    q, k: [B, H, N, D_head]; coords: [B, N, 3] (roughly in [-1, 1]).
    """
    theta = coords * math.pi  # [B, N, 3]
    sin = jnp.sin(theta)[:, None]  # [B, 1, N, 3]
    cos = jnp.cos(theta)[:, None]

    def rotate(x):
        x_rot, x_rest = x[..., :6], x[..., 6:]
        x1, x2 = x_rot[..., 0::2], x_rot[..., 1::2]
        rotated = jnp.concatenate(
            [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
        )
        return jnp.concatenate([rotated, x_rest], axis=-1)

    return rotate(q), rotate(k)


class RotarySelfAttention(nn.Module):
    dim: int
    heads: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, N, D = x.shape
        H = self.heads
        Dh = D // H
        assert Dh >= 6 and Dh % 2 == 0, "head dim must be even and >= 6 for RoPE"
        # NOTE(reference parity): scale is dim**-0.5, not head_dim**-0.5
        # (rotaryencoderpcd.py:64)
        scale = D**-0.5
        qkv = nn.Dense(D * 3, dtype=self.dtype, kernel_init=default_kernel_init,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, k = apply_rotary_pos_emb(q, k, pos)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        w = nn.Dropout(self.dropout)(w, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, kernel_init=default_kernel_init,
                        name="out_proj")(out)


class RotaryTransformerLayer(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        x = x + RotarySelfAttention(
            self.dim, self.heads, self.dropout, self.dtype, name="attn"
        )(LayerNorm(dtype=self.dtype, name="norm1")(x), pos,
          deterministic=deterministic)
        x = x + Mlp(
            int(self.dim * self.mlp_ratio), drop=self.dropout, dtype=self.dtype,
            name="mlp",
        )(LayerNorm(dtype=self.dtype, name="norm2")(x),
          deterministic=deterministic)
        return x


class RotaryPartialPointCloudEncoder(nn.Module):
    """Partial cloud [B, N, 3] -> [B, num_tokens, D] with rotary positions."""

    input_dim: int = 3
    embed_dim: int = 256
    num_tokens: int = 256
    num_layers: int = 6
    num_heads: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pcd: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B = pcd.shape[0]
        h = nn.Dense(self.embed_dim // 2, dtype=self.dtype,
                     kernel_init=default_kernel_init, name="in_fc1")(
            pcd.astype(self.dtype)
        )
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.embed_dim, dtype=self.dtype,
                     kernel_init=default_kernel_init, name="in_fc2")(h)
        x = nn.gelu(h, approximate=False)

        for i in range(self.num_layers):
            x = RotaryTransformerLayer(
                self.embed_dim, self.num_heads, dropout=self.dropout,
                dtype=self.dtype, name=f"encoder_{i}",
            )(x, pcd, deterministic=deterministic)

        queries = self.param(
            "token_queries", nn.initializers.xavier_uniform(),
            (1, self.num_tokens, self.embed_dim),
        ).astype(self.dtype)
        tokens = jnp.broadcast_to(queries, (B,) + queries.shape[1:])
        tokens = CrossAttention(
            self.embed_dim, num_heads=self.num_heads, qkv_bias=True,
            dtype=self.dtype, name="decoder_attn",
        )(tokens, x, deterministic=deterministic)

        for i in range(self.num_layers // 2):
            tokens = RotaryTransformerLayer(
                self.embed_dim, self.num_heads, dropout=self.dropout,
                dtype=self.dtype, name=f"refiner_{i}",
            )(tokens, pcd[:, : self.num_tokens], deterministic=deterministic)

        tokens = nn.Dense(self.embed_dim, dtype=self.dtype,
                          kernel_init=default_kernel_init, name="token_proj")(tokens)
        return LayerNorm(dtype=self.dtype, name="ln_output")(tokens)
