"""RIN-style two-stream denoiser backbone (flax.linen).

Re-design of the reference's Recurrent Interface Network blocks
(``/root/reference/models/modules.py:65-244``): a cheap x-stream of N point
tokens exchanged with a compute-heavy z-stream of latent tokens via
read/write cross-attentions — interface attention is linear in N, quadratic
cost lives only on the latents. This is the architecture's own scaling story
(SURVEY.md section 5.7); sharding the x-stream over devices composes
naturally later.

Functionally-important initialization carried over: ``ln_latent`` is
zero-initialized (scale AND bias) so latent self-conditioning is an exact
no-op at init (reference ``modules.py:189-190``).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .attention import (
    AttentionFn,
    CrossAttention,
    LayerNorm,
    Mlp,
    _LNParams,
    default_kernel_init,
    dot_product_attention,
    fuse_ln_dense_enabled,
)
from .embeddings import timestep_embedding

__all__ = [
    "ComputeBlock", "ReadBlock", "WriteBlock", "RCWBlock", "DenoiserBackbone",
    "stack_rcw_block_params", "unstack_rcw_block_params",
]


class ComputeBlock(nn.Module):
    """Latent self-attention + MLP (reference ``Compute_Block``).

    ``attention_fn`` selects the implementation — the hook for head-parallel
    tensor parallelism (:func:`pcdiff.parallel.xsp.sharded_head_attention`).
    """

    z_dim: int
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_fn: AttentionFn = staticmethod(dot_product_attention)

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = CrossAttention(
            self.z_dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            attention_fn=self.attention_fn, name="attn",
        )
        mlp = Mlp(
            int(self.z_dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
            name="mlp",
        )
        if fuse_ln_dense_enabled():
            ln1 = _LNParams(name="norm_z1")(z.shape[-1])
            z = z + attn(z, z, deterministic=deterministic, q_ln=ln1, kv_ln=ln1)
            ln2 = _LNParams(name="norm_z2")(z.shape[-1])
            z = z + mlp(z, deterministic=deterministic, ln=ln2)
        else:
            zn = LayerNorm(dtype=self.dtype, name="norm_z1")(z)
            z = z + attn(zn, zn, deterministic=deterministic)
            z = z + mlp(
                LayerNorm(dtype=self.dtype, name="norm_z2")(z),
                deterministic=deterministic,
            )
        return z


class ReadBlock(nn.Module):
    """z <- cross-attend(x): pull information from the point stream."""

    z_dim: int
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_fn: AttentionFn = staticmethod(dot_product_attention)

    @nn.compact
    def __call__(
        self, z: jnp.ndarray, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        attn = CrossAttention(
            self.z_dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            attention_fn=self.attention_fn, name="attn",
        )
        mlp = Mlp(
            int(self.z_dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
            name="mlp",
        )
        if fuse_ln_dense_enabled():
            ln_z = _LNParams(name="norm_z1")(z.shape[-1])
            ln_x = _LNParams(name="norm_x")(x.shape[-1])
            z = z + attn(z, x, deterministic=deterministic, q_ln=ln_z, kv_ln=ln_x)
            ln2 = _LNParams(name="norm_z2")(z.shape[-1])
            z = z + mlp(z, deterministic=deterministic, ln=ln2)
        else:
            z = z + attn(
                LayerNorm(dtype=self.dtype, name="norm_z1")(z),
                LayerNorm(dtype=self.dtype, name="norm_x")(x),
                deterministic=deterministic,
            )
            z = z + mlp(
                LayerNorm(dtype=self.dtype, name="norm_z2")(z),
                deterministic=deterministic,
            )
        return z


class WriteBlock(nn.Module):
    """x <- cross-attend(z): push computed features back to the points."""

    x_dim: int
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_fn: AttentionFn = staticmethod(dot_product_attention)

    @nn.compact
    def __call__(
        self, z: jnp.ndarray, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        attn = CrossAttention(
            self.x_dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.drop, dtype=self.dtype,
            attention_fn=self.attention_fn, name="attn",
        )
        mlp = Mlp(
            int(self.x_dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
            name="mlp",
        )
        if fuse_ln_dense_enabled():
            ln_x = _LNParams(name="norm_x1")(x.shape[-1])
            ln_z = _LNParams(name="norm_z")(z.shape[-1])
            x = x + attn(x, z, deterministic=deterministic, q_ln=ln_x, kv_ln=ln_z)
            ln2 = _LNParams(name="norm_x2")(x.shape[-1])
            x = x + mlp(x, deterministic=deterministic, ln=ln2)
        else:
            x = x + attn(
                LayerNorm(dtype=self.dtype, name="norm_x1")(x),
                LayerNorm(dtype=self.dtype, name="norm_z")(z),
                deterministic=deterministic,
            )
            x = x + mlp(
                LayerNorm(dtype=self.dtype, name="norm_x2")(x),
                deterministic=deterministic,
            )
        return x


class RCWBlock(nn.Module):
    """read -> K x compute -> write (reference ``RCW_Block``).

    ``read_attention_fn`` / ``write_attention_fn`` select the attention
    implementation for the interface attentions — the hook for x-stream
    sequence parallelism (:mod:`pcdiff.parallel.xsp`).
    """

    z_dim: int
    x_dim: int
    num_compute_layers: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    read_attention_fn: AttentionFn = staticmethod(dot_product_attention)
    write_attention_fn: AttentionFn = staticmethod(dot_product_attention)
    compute_attention_fn: AttentionFn = staticmethod(dot_product_attention)

    @nn.compact
    def __call__(
        self, z: jnp.ndarray, x: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        common = dict(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, drop=self.drop, attn_drop=self.attn_drop,
            dtype=self.dtype,
        )
        z = ReadBlock(
            self.z_dim, name="read", attention_fn=self.read_attention_fn,
            **common,
        )(z, x, deterministic)
        for i in range(self.num_compute_layers):
            z = ComputeBlock(
                self.z_dim, name=f"compute_{i}",
                attention_fn=self.compute_attention_fn, **common,
            )(z, deterministic)
        x = WriteBlock(
            self.x_dim, name="write", attention_fn=self.write_attention_fn,
            **common,
        )(z, x, deterministic)
        return z, x


class _RCWScanBody(nn.Module):
    """One ``nn.scan`` step: carry ``(z, x)`` through a single RCWBlock.

    The inner block is named ``block`` so the scanned parameter tree is
    ``blocks/block/...`` with a leading ``num_blocks`` axis on every leaf —
    the layout :func:`stack_rcw_block_params` produces from the unrolled
    ``block_0..block_{n-1}`` groups.
    """

    z_dim: int
    x_dim: int
    num_compute_layers: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop: float
    attn_drop: float
    dtype: Any
    read_attention_fn: AttentionFn
    write_attention_fn: AttentionFn
    compute_attention_fn: AttentionFn
    deterministic: bool

    @nn.compact
    def __call__(self, carry, _):
        z, x = carry
        z, x = RCWBlock(
            self.z_dim, self.x_dim,
            num_compute_layers=self.num_compute_layers,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, drop=self.drop, attn_drop=self.attn_drop,
            dtype=self.dtype,
            read_attention_fn=self.read_attention_fn,
            write_attention_fn=self.write_attention_fn,
            compute_attention_fn=self.compute_attention_fn,
            name="block",
        )(z, x, self.deterministic)
        return (z, x), None


_BLOCK_KEY = re.compile(r"block_\d+")


def stack_rcw_block_params(tree):
    """Unrolled ``block_0..block_{n-1}`` groups -> scanned ``blocks/block``.

    Pure layout transform (recursive over the param pytree): wherever a dict
    level holds the full ``block_i`` family, those subtrees are stacked along
    a new leading axis (scan-iteration order == block index) under
    ``blocks/block``. Enables loading any unrolled checkpoint — orbax saves
    and the torch importer alike — into a ``scan_blocks=True`` model.
    """
    if not isinstance(tree, dict):
        return tree
    block_keys = sorted(
        (k for k in tree if isinstance(k, str) and _BLOCK_KEY.fullmatch(k)),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    out = {k: stack_rcw_block_params(v) for k, v in tree.items()
           if k not in block_keys}
    if block_keys:
        assert [int(k.rsplit("_", 1)[1]) for k in block_keys] == list(
            range(len(block_keys))), f"non-contiguous block ids: {block_keys}"
        out["blocks"] = {"block": jax.tree.map(
            lambda *leaves: jnp.stack(leaves, axis=0),
            *(tree[k] for k in block_keys))}
    return out


def unstack_rcw_block_params(tree):
    """Inverse of :func:`stack_rcw_block_params` (scanned -> unrolled)."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if (k == "blocks" and isinstance(v, dict) and set(v) == {"block"}):
            stacked = v["block"]
            n = jax.tree.leaves(stacked)[0].shape[0]
            for i in range(n):
                out[f"block_{i}"] = jax.tree.map(lambda leaf: leaf[i], stacked)
        else:
            out[k] = unstack_rcw_block_params(v)
    return out


class DenoiserBackbone(nn.Module):
    """RIN denoiser over a point stream x and latent stream z.

    Reference parity (``/root/reference/models/modules.py:145-244``):
    z = [learned z_init | cond tokens | time token] + LN0(prev_latent +
    MLP(stop_grad(prev_latent))); then ``num_blocks`` RCW rounds; the final z
    is returned as the next step's self-conditioning latent.
    """

    input_channels: int = 3
    output_channels: int = 3
    num_z: int = 256
    num_x: int = 4096
    z_dim: int = 768
    x_dim: int = 512
    num_blocks: int = 6
    num_compute_layers: int = 4
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Compile-wall lever (docs/performance.md "Round-4 compile wall"): run
    # the num_blocks identical RCW rounds as ONE lax.scan over stacked
    # params instead of Python-unrolled copies — ~6x fewer jaxpr equations
    # per denoiser copy, math-identical. Param layout changes to
    # blocks/block/... with a leading block axis; convert existing
    # checkpoints with stack_rcw_block_params/unstack_rcw_block_params.
    scan_blocks: bool = False
    read_attention_fn: AttentionFn = staticmethod(dot_product_attention)
    write_attention_fn: AttentionFn = staticmethod(dot_product_attention)
    compute_attention_fn: AttentionFn = staticmethod(dot_product_attention)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        cond: jnp.ndarray,
        prev_latent: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, num_x, C_in], t: [B], cond: [B, num_cond, z_dim],
        prev_latent: [B, num_z + num_cond + 1, z_dim] or None.

        Returns (x_denoised [B, num_x, C_out], z [B, num_z+num_cond+1, z_dim]).
        """
        B, num_x, _ = x.shape
        assert num_x == self.num_x, (num_x, self.num_x)
        num_cond = cond.shape[1]
        num_latent = self.num_z + num_cond + 1
        if prev_latent is None:
            prev_latent = jnp.zeros((B, num_latent, self.z_dim), dtype=self.dtype)
        assert prev_latent.shape[1] == num_latent

        # timestep token [B, 1, z_dim]
        t_embed = Mlp(
            int(self.z_dim * self.mlp_ratio), out_dim=self.z_dim,
            dtype=self.dtype, name="time_embed",
        )(timestep_embedding(t, self.z_dim).astype(self.dtype))[:, None, :]

        # project points into the x-stream
        x = nn.Dense(
            self.x_dim, dtype=self.dtype, kernel_init=default_kernel_init,
            name="input_proj",
        )(x.astype(self.dtype))
        x = LayerNorm(dtype=self.dtype, name="ln_pre")(x)

        # latent stream + self-conditioning (ln_latent zero-init => no-op at init)
        z_init = self.param(
            "z_init", nn.initializers.normal(stddev=0.02), (1, self.num_z, self.z_dim)
        ).astype(self.dtype)
        z = jnp.concatenate(
            [jnp.broadcast_to(z_init, (B, self.num_z, self.z_dim)), cond, t_embed],
            axis=1,
        )
        prev_latent = prev_latent + Mlp(
            int(self.z_dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
            name="latent_mlp",
        )(lax.stop_gradient(prev_latent), deterministic=deterministic)
        z = z + LayerNorm(
            dtype=self.dtype,
            scale_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="ln_latent",
        )(prev_latent)

        block_kwargs = dict(
            z_dim=self.z_dim, x_dim=self.x_dim,
            num_compute_layers=self.num_compute_layers,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, drop=self.drop, attn_drop=self.attn_drop,
            dtype=self.dtype,
            read_attention_fn=self.read_attention_fn,
            write_attention_fn=self.write_attention_fn,
            compute_attention_fn=self.compute_attention_fn,
        )
        if self.scan_blocks:
            body = nn.scan(
                _RCWScanBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.num_blocks,
            )(deterministic=deterministic, name="blocks", **block_kwargs)
            (z, x), _ = body((z, x), None)
        else:
            for i in range(self.num_blocks):
                z, x = RCWBlock(name=f"block_{i}", **block_kwargs)(
                    z, x, deterministic)

        x = LayerNorm(dtype=self.dtype, name="ln_post")(x)
        x_denoised = nn.Dense(
            self.output_channels, dtype=jnp.float32,
            kernel_init=default_kernel_init, name="output_proj",
        )(x)
        return x_denoised, z
