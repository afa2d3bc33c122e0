"""Fused attention Pallas TPU kernel.

Why: all attention in this framework is dense full attention over short
sequences (x-stream 1024 points, z-stream ~643 latents, encoders <=1025
tokens; SURVEY.md section 5.7). At these lengths XLA materializes the
[B, H, Nq, Nk] score tensor in HBM twice per layer (write + read around the
softmax) — ~2 GB of traffic per backbone attention at the benchmark batch.
This kernel keeps scores in VMEM: one grid cell per (batch*head, q-block),
the whole K/V panel resident, fp32 softmax, single pass.

The sequence lengths involved make the simple whole-KV form optimal (K/V
panels are <=2 MB); there is no need for online-softmax streaming until
Nk * D * 4B approaches VMEM. Backward is an exact custom VJP computed with
standard XLA ops (training throughput is not the headline metric; sampling
is forward-only).

Numerics: q is expected PRE-SCALED (matching
:func:`pcdiff.models.attention.dot_product_attention`); softmax in float32
regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_attention",
    "fused_attention_mh",
    "set_attention_backend",
    "attention_backend",
    "set_attention_softmax_dtype",
    "attention_softmax_dtype",
]

_BACKEND = "auto"  # auto | pallas | xla
_SOFTMAX_DTYPE = "float32"  # float32 | bfloat16


def set_attention_backend(name: str) -> None:
    """Select the attention implementation: 'auto', 'pallas', or 'xla'."""
    global _BACKEND
    assert name in ("auto", "pallas", "xla")
    _BACKEND = name


def attention_backend() -> str:
    return _BACKEND


def set_attention_softmax_dtype(name: str) -> None:
    """Dtype of the softmax exp panel inside the MH kernel. 'bfloat16'
    computes exp on the max-subtracted scores in bf16 (halves the VPU
    transcendental + panel-pass cost); the normalizing sum and reciprocal
    stay fp32. Numerics change — quality-gate on a trained checkpoint
    before defaulting (docs/trained_gates.json)."""
    global _SOFTMAX_DTYPE
    assert name in ("float32", "bfloat16")
    _SOFTMAX_DTYPE = name


def attention_softmax_dtype() -> str:
    return _SOFTMAX_DTYPE


def _use_pallas(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    if _BACKEND == "xla":
        return False
    on_tpu = jax.default_backend() == "tpu"
    if _BACKEND == "pallas":
        return True
    # auto: XLA by default. In ISOLATION this kernel beats XLA at every
    # flagship shape with 1024-row q-blocks (2.82 vs 3.62 ms at 643x643,
    # 3.07 vs 4.55 at 643x1024, 3.59 vs 4.78 at 1024x643), but END-TO-END
    # the full sampler is slower (1.36 vs 1.52 clouds/sec): the custom call
    # breaks XLA's fusion of the surrounding projections/residuals and the
    # K/V pad-copies add traffic. Opt in via set_attention_backend("pallas")
    # for isolated-attention workloads; see docs/performance.md.
    del on_tpu
    return False


def _xla_attention(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, nk_actual: int):
    """One (batch*head, q-block) cell: full-KV fused attention in VMEM.

    A batched-over-heads variant (grid over batch, [H, BQ, D] blocks) was
    tried and exceeds Mosaic's scoped-VMEM stack estimates at head_dim 32
    because the batched dot pads both operand panels to full lane tiles.
    """
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [NKp, D]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, NKp] fp32
    nkp = scores.shape[-1]
    if nk_actual != nkp:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < nk_actual, scores, -jnp.inf)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    w = jnp.exp(scores)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    BH = B * H

    nk_pad = _round_up(Nk, 8)
    # Big q-blocks win: fewer grid cells amortize per-cell overhead (measured
    # on v5e at the flagship shapes: cap 1024 beats XLA by 22-33%, cap 512
    # loses on the self-attention case). Bound the fp32 score panel to ~4 MB.
    score_budget = (4 * 1024 * 1024) // (nk_pad * 4)
    block_q = min(_round_up(Nq, 8), 1024, max(8, (score_budget // 8) * 8))
    nq_pad = _round_up(Nq, block_q)

    qf = q.reshape(BH, Nq, D)
    kf = k.reshape(BH, Nk, D)
    vf = v.reshape(BH, Nk, D)
    if nq_pad != Nq:
        qf = jnp.pad(qf, ((0, 0), (0, nq_pad - Nq), (0, 0)))
    if nk_pad != Nk:
        kf = jnp.pad(kf, ((0, 0), (0, nk_pad - Nk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_pad - Nk), (0, 0)))

    grid = (BH, nq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, nk_actual=Nk),
        out_shape=jax.ShapeDtypeStruct((BH, nq_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )(qf, kf, vf)
    return out[:, :Nq].reshape(B, H, Nq, D)


# --------------------------------------------------------------------------
# Multi-head fused attention in [B, N, H*D] layout.
#
# Keeping the head dimension folded into the feature axis removes the
# [B,N,H,D] <-> [B,H,N,D] relayouts XLA must otherwise materialize around a
# custom call (~67 MB per tensor per attention at the flagship benchmark
# shapes — comparable to the attention's own traffic), and makes the grid
# one fat cell per batch row (64 cells at the CFG benchmark batch instead of
# 1024), which amortizes per-cell overhead. Per cell the kernel loops over
# heads; each head's score panel lives only in VMEM.
# --------------------------------------------------------------------------

# Score panels and operand blocks must fit comfortably in VMEM (v5e: 128 MB,
# shared with Pallas double-buffering of the in/out blocks).
_MH_VMEM_BUDGET = 96 * 1024 * 1024


def _mh_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, mxu_dtype,
               softmax_dtype=jnp.float32):
    """One batch row: all heads, whole KV panel resident, fp32 softmax.

    ``mxu_dtype=bfloat16`` feeds the MXU single-pass bf16 operands with fp32
    accumulation — the same arithmetic XLA's DEFAULT matmul precision uses
    for fp32 einsums on TPU, so this matches the XLA path's numerics class
    while tripling matmul throughput over multi-pass fp32.

    ``softmax_dtype=bfloat16`` computes the exp panel in bf16 after the
    fp32 max-subtraction (normalizing sum/reciprocal stay fp32); opt-in,
    quality-gated (see set_attention_softmax_dtype).
    """
    hd = q_ref.shape[-1]
    d = hd // num_heads
    q = q_ref[0].astype(mxu_dtype)  # [BQ, H*D]
    k = k_ref[0].astype(mxu_dtype)  # [NK, H*D]
    v = v_ref[0].astype(mxu_dtype)
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, NK] fp32
        s = (s - jnp.max(s, axis=-1, keepdims=True)).astype(softmax_dtype)
        p = jnp.exp(s)
        # normalize on the [BQ, D] output, not the [BQ, NK] panel — saves a
        # full panel read+write pass on the VPU
        recip = pl.reciprocal(
            jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
            approx=False)
        o = jax.lax.dot_general(
            p.astype(mxu_dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o * recip).astype(o_ref.dtype)


def _mh_vmem_bytes(nq: int, nk: int, hd: int, num_heads: int, itemsize: int) -> int:
    blocks = 2 * (nq + 2 * nk + nq) * hd * itemsize  # double-buffered in/out
    scores = nq * _round_up(nk, 128) * 4  # one head's fp32 panel (+ exp copy)
    return blocks + 2 * scores


def _use_pallas_mh(q: jnp.ndarray, num_heads: int, nk: int) -> bool:
    if _BACKEND == "xla":
        return False
    if _BACKEND != "pallas" and jax.default_backend() != "tpu":
        return False
    hd = q.shape[-1]
    d = hd // num_heads
    if hd % num_heads or d % 32 or hd % 128:
        return False  # head slices must be lane-register aligned
    return _mh_vmem_bytes(q.shape[1], nk, hd, num_heads, q.dtype.itemsize) <= (
        _MH_VMEM_BUDGET
    )


def _pallas_attention_mh(q, k, v, num_heads: int, mxu_dtype=jnp.bfloat16):
    B, nq, hd = q.shape
    nk = k.shape[1]
    softmax_dtype = (jnp.bfloat16 if _SOFTMAX_DTYPE == "bfloat16"
                     else jnp.float32)
    out = pl.pallas_call(
        functools.partial(_mh_kernel, num_heads=num_heads, mxu_dtype=mxu_dtype,
                          softmax_dtype=softmax_dtype),
        out_shape=jax.ShapeDtypeStruct((B, nq, hd), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, nq, hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hd), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, hd), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # v5e has 128 MB VMEM; the default 16 MB scoped limit is far too
            # small for whole-KV panels plus double-buffered blocks
            vmem_limit_bytes=_MH_VMEM_BUDGET,
        ),
    )(q, k, v)
    return out


def _split_heads(x, num_heads):
    B, N, hd = x.shape
    return x.reshape(B, N, num_heads, hd // num_heads)


def _xla_attention_mh(q, k, v, num_heads: int):
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    if _SOFTMAX_DTYPE == "bfloat16":
        # Same numerics class as the Pallas kernel's opt-in bf16 exp panel
        # (set_attention_softmax_dtype): exp on the fp32 max-subtracted
        # scores in bf16; the normalizing sum stays fp32. Keeps the
        # quality gate meaningful on shapes the kernel rejects (d % 32).
        s = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(s.astype(jnp.bfloat16))
        w = (p.astype(jnp.float32)
             / jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True))
        w = w.astype(q.dtype)
    else:
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(q.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_mh(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int
) -> jnp.ndarray:
    """softmax(q k^T) v per head over [B, N, H*D] inputs; q pre-scaled.

    Heads are folded in the feature axis so no head-split relayout ever
    reaches HBM. fp32 softmax regardless of input dtype.
    """
    if _use_pallas_mh(q, num_heads, k.shape[1]):
        return _pallas_attention_mh(q, k, v, num_heads)
    return _xla_attention_mh(q, k, v, num_heads)


def _mh_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                   num_heads: int, mxu_dtype):
    """One batch row of the attention backward, score panels only in VMEM.

    Recomputes the forward softmax per head (flash-attention-style: cheaper
    than storing [B, Nq, Nk] probabilities to HBM) and forms
    dv = P^T g, ds = P (dp - rowsum(dp P)), dq = ds K, dk = ds^T Q with the
    same bf16-operand / fp32-accumulate MXU arithmetic as the forward.
    """
    hd = q_ref.shape[-1]
    d = hd // num_heads
    q = q_ref[0].astype(mxu_dtype)  # [NQ, H*D]
    k = k_ref[0].astype(mxu_dtype)  # [NK, H*D]
    v = v_ref[0].astype(mxu_dtype)
    g = g_ref[0]
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [NQ, NK] fp32
        p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        P = p * pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True), approx=False)
        gh = g[:, sl].astype(mxu_dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            P.astype(mxu_dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)  # [NK, D]
        dp = jax.lax.dot_general(
            gh, v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [NQ, NK]
        ds = P * (dp - jnp.sum(dp * P, axis=-1, keepdims=True))
        ds = ds.astype(mxu_dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _mh_bwd_vmem_bytes(nq: int, nk: int, hd: int, itemsize: int) -> int:
    # double-buffered in (q, g: nq; k, v: nk) + out (dq: nq; dk, dv: nk)
    blocks = 2 * (3 * nq + 4 * nk) * hd * itemsize
    scores = nq * _round_up(nk, 128) * 4  # s/p/P/dp/ds panels (fp32)
    return blocks + 4 * scores


def _use_pallas_mh_bwd(q, num_heads: int, nk: int) -> bool:
    if not _use_pallas_mh(q, num_heads, nk):
        return False
    return _mh_bwd_vmem_bytes(
        q.shape[1], nk, q.shape[-1], q.dtype.itemsize
    ) <= _MH_VMEM_BUDGET


def _pallas_attention_mh_bwd(q, k, v, g, num_heads: int,
                             mxu_dtype=jnp.bfloat16):
    B, nq, hd = q.shape
    nk = k.shape[1]
    spec_q = pl.BlockSpec((1, nq, hd), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, nk, hd), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mh_bwd_kernel, num_heads=num_heads,
                          mxu_dtype=mxu_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((B, nq, hd), q.dtype),
            jax.ShapeDtypeStruct((B, nk, hd), k.dtype),
            jax.ShapeDtypeStruct((B, nk, hd), v.dtype),
        ),
        grid=(B,),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=(spec_q, spec_k, spec_k),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_MH_VMEM_BUDGET,
        ),
    )(q, k, v, g)


def _mh_fwd(q, k, v, num_heads):
    return fused_attention_mh(q, k, v, num_heads), (q, k, v)


def _mh_bwd(num_heads, res, g):
    """Exact backward via recomputation: Pallas in-VMEM kernel when the
    shapes fit (training hot path), XLA einsums otherwise."""
    q, k, v = res
    if _use_pallas_mh_bwd(q, num_heads, k.shape[1]):
        return _pallas_attention_mh_bwd(q, k, v, g, num_heads)
    qh = _split_heads(q, num_heads)
    kh = _split_heads(k, num_heads)
    vh = _split_heads(v, num_heads)
    gh = _split_heads(g, num_heads).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", w, gh).astype(v.dtype).reshape(v.shape)
    dw = jnp.einsum("bqhd,bkhd->bhqk", gh, vh.astype(jnp.float32))
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = (
        jnp.einsum("bhqk,bkhd->bqhd", ds, kh.astype(jnp.float32))
        .astype(q.dtype).reshape(q.shape)
    )
    dk = (
        jnp.einsum("bhqk,bqhd->bkhd", ds, qh.astype(jnp.float32))
        .astype(k.dtype).reshape(k.shape)
    )
    return dq, dk, dv


fused_attention_mh.defvjp(_mh_fwd, _mh_bwd)


@jax.custom_vjp
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """softmax(q k^T) v with fp32 softmax; q pre-scaled. [B,H,N,D] layout."""
    if _use_pallas(q, k):
        return _pallas_attention(q, k, v)
    return _xla_attention(q, k, v)


def _fwd(q, k, v):
    return fused_attention(q, k, v), (q, k, v)


def _bwd(res, g):
    """Exact attention backward via recomputation (standard XLA ops)."""
    q, k, v = res
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", w, g32).astype(v.dtype)
    dw = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


fused_attention.defvjp(_fwd, _bwd)
