"""Conditioning-modality encoders for the two-stream denoiser (flax.linen).

Parity targets (``/root/reference/models/model.py``):
- ``ClassEmbedding`` (:217): embedding + LayerNorm -> one token
- ``ViewAngleEmbedding`` (:234): 3 -> D MLP -> one token
- ``PartialPointCloudEncoder`` (:261): point proj -> [CLS|N] deep encoder ->
  learned-query decoder -> query refiner -> [CLS|T-1] tokens
- ``DepthMapEncoder`` (:334): conv patchify + fixed 2D sin-cos PE -> mixer ->
  learned-query decoder -> refiner -> [CLS|T-1] tokens
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .attention import DecoderLayer, EncoderLayer, LayerNorm, default_kernel_init
from .embeddings import build_2d_sincos_position_embedding

__all__ = [
    "ClassEmbedding",
    "ViewAngleEmbedding",
    "PartialPointCloudEncoder",
    "DepthMapEncoder",
]


class ClassEmbedding(nn.Module):
    """Class label -> one normalized conditioning token [B, 1, D]."""

    num_classes: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, class_labels: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        emb = nn.Embed(
            self.num_classes, self.embed_dim,
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype, name="embedding",
        )(class_labels.astype(jnp.int32))
        return LayerNorm(dtype=self.dtype, name="norm")(emb)[:, None, :]


class ViewAngleEmbedding(nn.Module):
    """Camera viewpoint vector -> one conditioning token [B, 1, D]."""

    input_dim: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, view_angles: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = view_angles.astype(self.dtype)
        h = nn.Dense(
            self.embed_dim // 2, dtype=self.dtype,
            kernel_init=default_kernel_init, name="fc1",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.embed_dim, dtype=self.dtype,
            kernel_init=default_kernel_init, name="fc2",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.embed_dim, dtype=self.dtype,
            kernel_init=default_kernel_init, name="fc3",
        )(h)
        return LayerNorm(dtype=self.dtype, name="norm")(h)[:, None, :]


class _QueryDecoder(nn.Module):
    """Shared tail of both heavy encoders: learned queries cross-attend
    to encoded tokens, get residual-refined, then join the CLS token."""

    embed_dim: int
    num_tokens: int
    num_layers: int  # decoder/refiner depth = num_layers // 2 each
    num_heads: int
    drop: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(
        self, cls_out: jnp.ndarray, patch_tokens: jnp.ndarray, deterministic: bool
    ) -> jnp.ndarray:
        B = patch_tokens.shape[0]
        queries = self.param(
            "token_queries", nn.initializers.xavier_uniform(),
            (1, self.num_tokens - 1, self.embed_dim),
        ).astype(self.dtype)
        tokens = jnp.broadcast_to(queries, (B,) + queries.shape[1:])
        for i in range(self.num_layers // 2):
            tokens = DecoderLayer(
                self.embed_dim, self.num_heads, drop=self.drop, dtype=self.dtype,
                name=f"decoder_{i}",
            )(tokens, patch_tokens, deterministic=deterministic)
        refined = tokens
        for i in range(self.num_layers // 2):
            refined = EncoderLayer(
                self.embed_dim, self.num_heads, drop=self.drop, dtype=self.dtype,
                name=f"refiner_{i}",
            )(refined, deterministic=deterministic)
        tokens = tokens + refined
        tokens = jnp.concatenate([cls_out, tokens], axis=1)  # [B, T, D]
        tokens = nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=default_kernel_init,
            name="proj_out",
        )(tokens)
        return LayerNorm(dtype=self.dtype, name="ln_out")(tokens)


class PartialPointCloudEncoder(nn.Module):
    """Partial-scan point cloud [B, N, 3] -> ``num_tokens`` cond tokens."""

    input_dim: int = 3
    embed_dim: int = 256
    num_tokens: int = 256
    num_layers: int = 8
    num_heads: int = 8
    drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pcd: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B = pcd.shape[0]
        x = nn.Dense(
            self.embed_dim, dtype=self.dtype, kernel_init=default_kernel_init,
            name="input_proj",
        )(pcd.astype(self.dtype))

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, self.embed_dim)
        ).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)), x], axis=1
        )
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.embed_dim, self.num_heads, drop=self.drop, dtype=self.dtype,
                name=f"encoder_{i}",
            )(x, deterministic=deterministic)

        return _QueryDecoder(
            self.embed_dim, self.num_tokens, self.num_layers, self.num_heads,
            self.drop, self.dtype, name="query_decoder",
        )(x[:, 0:1, :], x[:, 1:, :], deterministic)


class DepthMapEncoder(nn.Module):
    """Depth map [B, H, W, 1] (channels-last) -> ``num_tokens`` cond tokens."""

    in_channels: int = 1
    embed_dim: int = 256
    num_tokens: int = 64
    patch: int = 32
    image_size: int = 512
    num_layers: int = 8
    num_heads: int = 8
    drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, depth_maps: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B = depth_maps.shape[0]
        x = nn.Conv(
            self.embed_dim, kernel_size=(self.patch, self.patch),
            strides=(self.patch, self.patch), dtype=self.dtype,
            kernel_init=nn.initializers.kaiming_normal(), name="patch_proj",
        )(depth_maps.astype(self.dtype))
        x = x.reshape(B, -1, self.embed_dim)  # [B, HW, D]

        g = self.image_size // self.patch
        pe = jnp.asarray(
            build_2d_sincos_position_embedding(g, g, self.embed_dim),
            dtype=self.dtype,
        )
        x = x + pe[None]

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, self.embed_dim)
        ).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)), x], axis=1
        )
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.embed_dim, self.num_heads, drop=self.drop, dtype=self.dtype,
                name=f"mixer_{i}",
            )(x, deterministic=deterministic)

        return _QueryDecoder(
            self.embed_dim, self.num_tokens, self.num_layers, self.num_heads,
            self.drop, self.dtype, name="query_decoder",
        )(x[:, 0:1, :], x[:, 1:, :], deterministic)
