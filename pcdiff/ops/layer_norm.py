"""Fused LayerNorm Pallas TPU kernel.

Why: the round-2 device trace (docs/performance.md "Measured breakdown")
shows XLA's LayerNorm fusions co-dominating the sampler with attention:
76 convert_reduce fusions per denoiser call cost 31.4 ms — 3.5x what the
identical LN(+projection) pattern costs in isolation — because XLA folds
each LN into a 3-output mega-fusion carrying residuals and gather tables
whose layout choices are pessimal. This kernel computes LN standalone in
VMEM (single HBM read + write per tensor at bf16), which splits those
fusions and returns the LN class to its memory-bound floor.

Numerics match flax.linen.LayerNorm (v0.12, ``force_float32_reductions``):
fp32 statistics with the fast-variance formula ``max(0, E[x^2] - E[x]^2)``,
fp32 application of the (fp32) scale/bias, output cast to the module dtype.
The torch-parity epsilon (1e-5) is supplied by the caller
(:func:`pcdiff.models.attention.LayerNorm`); reference semantics:
``/root/reference/models/modules.py`` (torch ``nn.LayerNorm``).

Backward is a custom VJP: an in-VMEM Pallas kernel on TPU (the training
backward's "LN/residual soup" is the same trace-measured bottleneck class),
XLA elsewhere. d(scale)/d(bias) cross-row reductions are returned as
per-grid-cell partials and summed outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_layer_norm",
    "set_layernorm_backend",
    "layernorm_backend",
]

_BACKEND = "auto"  # auto | pallas | xla


def set_layernorm_backend(name: str) -> None:
    """Select the LayerNorm implementation: 'auto', 'pallas', or 'xla'."""
    global _BACKEND
    assert name in ("auto", "pallas", "xla")
    _BACKEND = name


def layernorm_backend() -> str:
    return _BACKEND


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _use_pallas_ln(rows: int, c: int, dtype) -> bool:
    if _BACKEND != "pallas":
        # auto: XLA. Same end-to-end verdict as the round-1 per-head
        # attention kernel: in ISOLATION this kernel wins, but A/B on the
        # full 64-step bf16 sampler measures 3.50 clouds/s with XLA LN vs
        # 3.32 with the kernel dispatched — splitting XLA's LN mega-fusions
        # does not remove their residual/gather work, it adds two HBM
        # round-trips per LN. The in-context fusion penalty must be claimed
        # by fusing LN INTO the following projection (ops/ln_dense), not by
        # standalone LN. Opt in via set_layernorm_backend("pallas").
        return False
    if c % 128 or c > 4096:
        return False  # feature dim must tile the lane register; bound VMEM
    if dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return False
    return rows >= 1


def _block_rows(rows: int) -> int:
    # Big row blocks amortize per-cell overhead (same finding as the
    # attention kernel's fat cells); cap the fp32 working set to ~4 MB at
    # c=256. Edge cells are masked by Pallas automatically (LN is per-row,
    # so padded rows never contaminate real outputs; backward masks its
    # cross-row reductions explicitly).
    return min(_round_up(rows, 8), 1024)


# -------------------------------------------------------------------------
# forward
# -------------------------------------------------------------------------


def _ln_fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, epsilon: float):
    x = x_ref[...].astype(jnp.float32)  # [BR, C]
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / c)
    mean2 = jnp.sum(x * x, axis=-1, keepdims=True) * (1.0 / c)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    mul = jax.lax.rsqrt(var + epsilon) * s_ref[...].astype(jnp.float32)
    y = (x - mean) * mul + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _pallas_layer_norm(x2, scale, bias, epsilon: float, out_dtype):
    rows, c = x2.shape
    br = _block_rows(rows)
    grid = (pl.cdiv(rows, br),)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, epsilon=epsilon),
        out_shape=jax.ShapeDtypeStruct((rows, c), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x2, scale.reshape(1, c), bias.reshape(1, c))


def _xla_layer_norm(x, scale, bias, epsilon: float, out_dtype):
    """Reference implementation, op-for-op the flax/_normalize math."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    mul = jax.lax.rsqrt(var + epsilon) * scale.astype(jnp.float32)
    y = (x32 - mean) * mul + bias.astype(jnp.float32)
    return y.astype(out_dtype)


# -------------------------------------------------------------------------
# backward
# -------------------------------------------------------------------------


def _ln_bwd_kernel(x_ref, s_ref, g_ref, dx_ref, ds_ref, db_ref, *,
                   epsilon: float, rows: int):
    x = x_ref[...].astype(jnp.float32)  # [BR, C]
    g = g_ref[...].astype(jnp.float32)
    br, c = x.shape
    # mask rows past the real row count: their dx writes are dropped by
    # Pallas, but the ds/db cross-row partial sums must exclude them
    row = jax.lax.broadcasted_iota(jnp.int32, (br, 1), 0) + pl.program_id(0) * br
    live = row < rows  # bool [BR, 1]; where-masking (not *) so padded-row
    # garbage (possibly NaN/inf) cannot poison the partial sums via NaN*0
    mean = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / c)
    mean2 = jnp.sum(x * x, axis=-1, keepdims=True) * (1.0 / c)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    inv = jax.lax.rsqrt(var + epsilon)
    xhat = (x - mean) * inv
    gs = g * s_ref[...].astype(jnp.float32)
    m1 = jnp.sum(gs, axis=-1, keepdims=True) * (1.0 / c)
    m2 = jnp.sum(gs * xhat, axis=-1, keepdims=True) * (1.0 / c)
    dx_ref[...] = (inv * (gs - m1 - xhat * m2)).astype(dx_ref.dtype)
    ds_ref[...] = jnp.sum(jnp.where(live, g * xhat, 0.0), axis=0, keepdims=True)
    db_ref[...] = jnp.sum(jnp.where(live, g, 0.0), axis=0, keepdims=True)


def _pallas_layer_norm_bwd(x2, scale, g2, epsilon: float):
    rows, c = x2.shape
    br = _block_rows(rows)
    ncells = pl.cdiv(rows, br)
    row_spec = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, ds_part, db_part = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, epsilon=epsilon, rows=rows),
        out_shape=(
            jax.ShapeDtypeStruct((rows, c), x2.dtype),
            jax.ShapeDtypeStruct((ncells, c), jnp.float32),
            jax.ShapeDtypeStruct((ncells, c), jnp.float32),
        ),
        grid=(ncells,),
        in_specs=[
            row_spec,
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=(
            row_spec,
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x2, scale.reshape(1, c), g2)
    return dx, jnp.sum(ds_part, axis=0), jnp.sum(db_part, axis=0)


def _xla_layer_norm_bwd(x, scale, g, epsilon: float):
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    inv = jax.lax.rsqrt(var + epsilon)
    xhat = (x32 - mean) * inv
    gs = g32 * scale.astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = inv * (gs - m1 - xhat * m2)
    red = tuple(range(x.ndim - 1))
    ds = jnp.sum(g32 * xhat, axis=red)
    db = jnp.sum(g32, axis=red)
    return dx, ds, db


# -------------------------------------------------------------------------
# public entry (custom VJP)
# -------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layer_norm(x, scale, bias, epsilon: float, out_dtype):
    """LayerNorm over the last axis; flax-v0.12 numerics (fp32 stats,
    fast variance, fp32 scale/bias application, output cast to out_dtype).

    x: [..., C]; scale, bias: [C] (any float dtype — applied in fp32).
    """
    c = x.shape[-1]
    rows = x.size // c
    if _use_pallas_ln(rows, c, x.dtype):
        y2 = _pallas_layer_norm(
            x.reshape(rows, c), scale, bias, epsilon, out_dtype
        )
        return y2.reshape(x.shape)
    return _xla_layer_norm(x, scale, bias, epsilon, out_dtype)


def _fln_fwd(x, scale, bias, epsilon, out_dtype):
    return fused_layer_norm(x, scale, bias, epsilon, out_dtype), (x, scale, bias)


def _fln_bwd(epsilon, out_dtype, res, g):
    x, scale, bias = res
    c = x.shape[-1]
    rows = x.size // c
    if _use_pallas_ln(rows, c, x.dtype) and _use_pallas_ln(rows, c, g.dtype):
        dx2, ds, db = _pallas_layer_norm_bwd(
            x.reshape(rows, c), scale, g.reshape(rows, c), epsilon
        )
        dx = dx2.reshape(x.shape).astype(x.dtype)
    else:
        dx, ds, db = _xla_layer_norm_bwd(x, scale, g, epsilon)
        dx = dx.astype(x.dtype)
    return dx, ds.astype(scale.dtype), db.astype(bias.dtype)


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)
