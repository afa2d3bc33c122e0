"""Fused LayerNorm -> Dense projection(s) Pallas TPU kernel.

Why: the round-2/3 device traces (docs/performance.md) show XLA's
LayerNorm fusions co-dominating the sampler with attention (31.4 vs
32.4 ms per denoiser call) at 3.5x their isolated cost: around each
attention custom call XLA builds 3-output mega-fusions carrying the LN
statistics, residuals, and gather tables with pessimal layouts. The fix
is to fuse the LN INTO the projection(s) that consume it — every pre-LN
in this framework feeds one or more Dense layers (q/k/v projections,
MLP fc1) — so the normalized tensor never exists in HBM at all.

Hard-won boundary lessons (round-3 trace of a naive 2D version, which
LOST 2x end-to-end at kernel-level speed-of-light):

- The kernel must consume the model's NATIVE [B, N, C] layout. An
  ``x.reshape(B*N, C)`` is a real relayout copy whenever N is not a
  sublane multiple (z-stream N=643), and padding B*N up to a block
  multiple adds pad+slice copies: ~100 us/site of pure traffic.
- Multiple projections of one normalized tensor must be SEPARATE kernel
  outputs. A concatenated [.., 3C] output needs an XLA ``split`` whose
  slices are materialized before the attention custom call.
- Epilogues must ride along. A standalone ``gelu`` between two custom
  calls materializes an f32 copy of the [B, N, 4C] MLP activation
  (XLA kept the erfc result in f32 for the consuming fc2: 337 MB of
  traffic, 1.25 ms/site). The kernel applies bias + exact-erf GELU on
  the f32 accumulator in VMEM and writes only the compute-dtype result.
- Constant output scales (the attention 1/sqrt(d) on q) fold into the
  weights at trace time, killing one more elementwise pass.

Numerics: fp32 fast-variance row statistics (flax
``force_float32_reductions`` class), fp32 affine, cast to the compute
dtype for the MXU, matmul with fp32 accumulation, bias + activation on
the fp32 accumulator, single cast to the output dtype. At fp32 this is
bit-class-identical to ``FusedLayerNorm`` + ``nn.Dense``; at bf16 the
f32-epilogue is slightly MORE accurate than the unfused graph (which
adds bias/gelu in bf16) — the bf16 path is quality-gated on the trained
checkpoint, not bit-compared.

Backward: custom VJP that recomputes through the reference XLA
composition — gradient correctness is inherited from autodiff, no
hand-derived formulas to drift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_ln_denses",
    "fused_ln_mlp",
    "set_lndense_backend",
    "lndense_backend",
    "set_lndense_bwd_backend",
    "lndense_bwd_backend",
    "use_ln_dense",
    "use_ln_mlp",
]

_BACKEND = "auto"  # auto | pallas | xla

# Resident W panels + double-buffered row blocks must fit VMEM.
_VMEM_BUDGET = 96 * 1024 * 1024


def set_lndense_backend(name: str) -> None:
    """Select the LN+Dense implementation: 'auto', 'pallas', or 'xla'."""
    global _BACKEND
    assert name in ("auto", "pallas", "xla")
    _BACKEND = name


def lndense_backend() -> str:
    return _BACKEND


def use_ln_dense(n: int, c: int, fs, dtype) -> bool:
    """Trace-time dispatch decision for [B, N, C] @ [C, F_i] fused LN+Dense."""
    if _BACKEND == "xla":
        return False
    if _BACKEND != "pallas" and jax.default_backend() != "tpu":
        return False
    if c % 128 or any(f % 128 for f in fs):
        return False  # lane-register alignment
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    fsum = sum(fs)
    vmem = (
        c * fsum * itemsize  # resident weight panels
        + 2 * n * (c + fsum) * itemsize  # double-buffered in/out blocks
        + 3 * n * c * 4  # fp32 x copy + normalized copy
        + n * max(fs) * 4  # fp32 accumulator
    )
    return vmem <= _VMEM_BUDGET


# XLA's f32 erf rational approximation (xla/client/lib/math.cc ErfImpl32),
# reproduced because Mosaic has no erf lowering. Max error ~1 ulp over the
# clamped [-4, 4] range; validated against lax.erf in tests.
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145, 1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 0.000023547966471313185,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)


def _poly(x, coeffs):
    acc = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + c
    return acc


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    return x * _poly(x2, _ERF_ALPHA) / _poly(x2, _ERF_BETA)


def _apply_act(o32, act, erf=jax.lax.erf):
    if act is None:
        return o32
    if act == "gelu":
        # exact (erf) GELU, matching nn.gelu(approximate=False)
        return o32 * 0.5 * (1.0 + erf(o32 * (2.0**-0.5)))
    # The sigmoid-form epilogues clamp exp's argument to +-30: sigmoid(30)
    # rounds to 1.0/0.0 in f32, so the forward matches the unclamped form
    # to within ~1e-13 absolute in the saturated tail (the unclamped form
    # returns an exact -0.0 once exp overflows to inf — pre-activation
    # < ~-17.6 for quick_gelu, < ~-6.5 for gelu_tanh — where the clamped
    # form returns x*~9.4e-14), while AUTODIFF through the unclamped form
    # is inf*0=NaN there. Inside the clamp the gradient is exact; outside,
    # clip's zero-grad makes it the saturated 0/1 — the true gradient.
    if act == "quick_gelu":
        # x * sigmoid(1.702 x) (CLIP), via exp (Mosaic has no logistic)
        return o32 / (1.0 + jnp.exp(jnp.clip(-1.702 * o32, -30.0, 30.0)))
    if act == "gelu_tanh":
        # tanh-approx GELU (torch approximate='tanh'), rewritten through
        # sigmoid so it rides the hardware exp instead of the 12-term erf
        # rational: 0.5x(1+tanh(u)) == x*sigmoid(2u),
        # u = sqrt(2/pi)(x + 0.044715 x^3). |err| <= 1.5e-3 abs vs exact
        # erf GELU (sub-bf16-epsilon on the bf16 activation path).
        u2 = 1.5957691216057308 * (o32 + 0.044715 * o32 * o32 * o32)
        return o32 / (1.0 + jnp.exp(jnp.clip(-u2, -30.0, 30.0)))
    raise ValueError(f"unknown activation {act!r}")


def _ln_denses_kernel(*refs, epsilon: float, mxu_dtype, acts, nw, has_bias):
    x_ref, s_ref, b_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3:3 + nw]
    bias_refs = refs[3 + nw:3 + nw + sum(has_bias)]
    o_refs = refs[3 + nw + sum(has_bias):]

    x = x_ref[0].astype(jnp.float32)  # [N, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # fast variance max(0, E[x^2] - E[x]^2) — flax force_float32_reductions
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y = y.astype(mxu_dtype)
    bi = 0
    for i, (w_ref, o_ref) in enumerate(zip(w_refs, o_refs)):
        o32 = jax.lax.dot_general(
            y, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bias[i]:
            o32 = o32 + bias_refs[bi][...].astype(jnp.float32)
            bi += 1
        o_ref[0] = _apply_act(o32, acts[i], erf=_erf_f32).astype(o_ref.dtype)


def _pallas_ln_denses(x, scale, bias, kernels, biases, epsilon, out_dtype,
                      acts):
    b, n, c = x.shape
    fs = tuple(k.shape[1] for k in kernels)
    mxu_dtype = jnp.bfloat16 if out_dtype != jnp.float32 else jnp.float32
    has_bias = tuple(bb is not None for bb in biases)
    kern = functools.partial(
        _ln_denses_kernel, epsilon=epsilon, mxu_dtype=mxu_dtype,
        acts=tuple(acts), nw=len(kernels), has_bias=has_bias,
    )
    in_specs = [
        pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, scale.reshape(1, c), bias.reshape(1, c)]
    for k in kernels:
        in_specs.append(
            pl.BlockSpec((c, k.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(k.astype(mxu_dtype))
    for bb in biases:
        if bb is not None:
            in_specs.append(
                pl.BlockSpec((1, bb.shape[0]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM))
            operands.append(bb.reshape(1, -1).astype(jnp.float32))
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, n, f), out_dtype) for f in fs),
        grid=(b,),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for f in fs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_BUDGET,
        ),
    )(*operands)
    return list(outs)


def _xla_ln_denses(x, scale, bias, kernels, biases, epsilon, out_dtype, acts):
    """Reference composition with the SAME math as the kernel: fp32 LN
    stats/affine, compute-dtype matmul with fp32 accumulation, fp32
    bias + activation epilogue, single cast out."""
    mxu_dtype = jnp.bfloat16 if out_dtype != jnp.float32 else jnp.float32
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = y.astype(mxu_dtype)
    outs = []
    for k, bb, act in zip(kernels, biases, acts):
        o32 = jax.lax.dot_general(
            y, k.astype(mxu_dtype), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if bb is not None:
            o32 = o32 + bb.astype(jnp.float32)
        outs.append(_apply_act(o32, act).astype(out_dtype))
    return outs


def _dispatch(x, scale, bias, kernels, biases, epsilon, out_dtype, acts):
    if x.ndim == 3 and use_ln_dense(
            x.shape[1], x.shape[2], [k.shape[1] for k in kernels], out_dtype):
        return _pallas_ln_denses(
            x, scale, bias, kernels, biases, epsilon, out_dtype, acts)
    return _xla_ln_denses(
        x, scale, bias, kernels, biases, epsilon, out_dtype, acts)


# ---------------------------------------------------------------------------
# Backward kernel: one pass per batch row computing dx and accumulating
# dscale/dbias/dW_i/db_i across the (sequential) grid. Targets the train
# step's 128 ms of backward LN/residual elementwise chains
# (docs/performance.md "Training throughput"). Default 'auto' = Pallas on
# TPU: A/B-measured on hardware it is BOTH faster (487 -> 384.5 ms/step on
# the flagship train step) and smaller — the XLA autodiff recompute through
# the fused-forward custom call pins residuals XLA can no longer
# rematerialize, which OOMs the flagship B=32 train step on a 16 GB v5e
# (15.95 G needed). Flip with set_lndense_bwd_backend("xla") to reproduce.
# ---------------------------------------------------------------------------

_BWD_BACKEND = "auto"  # xla | pallas | auto (auto = pallas on TPU)


def set_lndense_bwd_backend(name: str) -> None:
    """Backward implementation for fused_ln_denses: 'auto' (default:
    in-VMEM Pallas backward on TPU, autodiff recompute elsewhere),
    'pallas' (force), or 'xla' (autodiff recompute)."""
    global _BWD_BACKEND
    assert name in ("xla", "pallas", "auto")
    _BWD_BACKEND = name


def lndense_bwd_backend() -> str:
    return _BWD_BACKEND


def _act_grad(z32, act):
    """d act(z) / dz at f32, matching the composition's autodiff class."""
    if act is None:
        return None
    if act == "gelu":
        phi = jnp.exp(z32 * z32 * -0.5) * 0.3989422804014327  # 1/sqrt(2*pi)
        cdf = 0.5 * (1.0 + _erf_f32(z32 * (2.0**-0.5)))
        return cdf + z32 * phi
    if act == "quick_gelu":
        s = 1.0 / (1.0 + jnp.exp(jnp.clip(-1.702 * z32, -30.0, 30.0)))
        return s * (1.0 + 1.702 * z32 * (1.0 - s))
    if act == "gelu_tanh":
        # f = z * sigmoid(2u), u = k(z + a z^3) =>
        # f' = s + 2 z k (1 + 3a z^2) s(1-s); sech^2(u) == 4 s(1-s)
        # keeps this identical to the tanh form's derivative. Same exp-
        # argument clamp as _apply_act (saturated s is exactly 0/1).
        u2 = 1.5957691216057308 * (z32 + 0.044715 * z32 * z32 * z32)
        s = 1.0 / (1.0 + jnp.exp(jnp.clip(-u2, -30.0, 30.0)))
        up = 0.7978845608028654 * (1.0 + 0.134145 * z32 * z32)
        return s + 2.0 * z32 * up * s * (1.0 - s)
    raise ValueError(f"unknown activation {act!r}")


def _ln_denses_bwd_kernel(*refs, epsilon: float, mxu_dtype, acts, nw,
                          has_bias):
    nb = sum(has_bias)
    x_ref, s_ref, b_ref = refs[0], refs[1], refs[2]
    w_refs = refs[3:3 + nw]
    bias_refs = refs[3 + nw:3 + nw + nb]
    g_refs = refs[3 + nw + nb:3 + 2 * nw + nb]
    outs = refs[3 + 2 * nw + nb:]
    dx_ref, dscale_ref, dbias_ref = outs[0], outs[1], outs[2]
    dw_refs = outs[3:3 + nw]
    db_refs = outs[3 + nw:]

    first = pl.program_id(0) == 0

    x = x_ref[0].astype(jnp.float32)  # [N, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    rstd = jax.lax.rsqrt(var + epsilon)
    xhat = (x - mean) * rstd
    s32 = s_ref[...].astype(jnp.float32)
    y32 = xhat * s32 + b_ref[...].astype(jnp.float32)
    y = y32.astype(mxu_dtype)

    dy = jnp.zeros_like(x)
    bi = 0
    for i in range(nw):
        w = w_refs[i][...]
        g32 = g_refs[i][0].astype(jnp.float32)  # [N, F]
        if acts[i] is not None:
            z = jax.lax.dot_general(
                y, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if has_bias[i]:
                z = z + bias_refs[bi][...].astype(jnp.float32)
            g32 = g32 * _act_grad(z, acts[i])
        gz = g32.astype(mxu_dtype)
        if has_bias[i]:
            db = jnp.sum(g32, axis=0, keepdims=True)  # [1, F]
            db_refs[bi][...] = jnp.where(first, db, db_refs[bi][...] + db)
            bi += 1
        dw = jax.lax.dot_general(  # y^T @ gz -> [C, F]
            y, gz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw_refs[i][...] = jnp.where(first, dw, dw_refs[i][...] + dw)
        dy = dy + jax.lax.dot_general(  # gz @ W^T -> [N, C]
            gz, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    ds = jnp.sum(dy * xhat, axis=0, keepdims=True)  # [1, C]
    dbb = jnp.sum(dy, axis=0, keepdims=True)
    dscale_ref[...] = jnp.where(first, ds, dscale_ref[...] + ds)
    dbias_ref[...] = jnp.where(first, dbb, dbias_ref[...] + dbb)

    dxhat = dy * s32
    c = x.shape[-1]
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) / c
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) / c
    dx_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _pallas_ln_denses_bwd(x, scale, bias, kernels, biases, g, epsilon,
                          out_dtype, acts):
    b, n, c = x.shape
    fs = tuple(k.shape[1] for k in kernels)
    mxu_dtype = jnp.bfloat16 if out_dtype != jnp.float32 else jnp.float32
    has_bias = tuple(bb is not None for bb in biases)
    kern = functools.partial(
        _ln_denses_bwd_kernel, epsilon=epsilon, mxu_dtype=mxu_dtype,
        acts=tuple(acts), nw=len(kernels), has_bias=has_bias,
    )
    in_specs = [
        pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, scale.reshape(1, c), bias.reshape(1, c)]
    for k in kernels:
        in_specs.append(pl.BlockSpec((c, k.shape[1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(k.astype(mxu_dtype))
    for bb in biases:
        if bb is not None:
            in_specs.append(pl.BlockSpec((1, bb.shape[0]), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(bb.reshape(1, -1).astype(jnp.float32))
    for gi, f in zip(g, fs):
        in_specs.append(pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(gi)

    out_shape = [
        jax.ShapeDtypeStruct((b, n, c), x.dtype),  # dx
        jax.ShapeDtypeStruct((1, c), jnp.float32),  # dscale
        jax.ShapeDtypeStruct((1, c), jnp.float32),  # dbias
    ]
    out_specs = [
        pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    for f in fs:
        out_shape.append(jax.ShapeDtypeStruct((c, f), jnp.float32))
        out_specs.append(pl.BlockSpec((c, f), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    for f, hb in zip(fs, has_bias):
        if hb:
            out_shape.append(jax.ShapeDtypeStruct((1, f), jnp.float32))
            out_specs.append(pl.BlockSpec((1, f), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(b,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            # sequential grid: weight-grad blocks accumulate across cells
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_BUDGET,
        ),
    )(*operands)
    dx, dscale, dbias = outs[0], outs[1], outs[2]
    dws = list(outs[3:3 + len(kernels)])
    dbs_present = list(outs[3 + len(kernels):])
    dbs = []
    for hb in has_bias:
        dbs.append(dbs_present.pop(0).reshape(-1) if hb else None)
    return (dx, dscale.reshape(-1), dbias.reshape(-1), tuple(dws),
            tuple(dbs))


def _use_bwd_pallas(x, kernels, out_dtype) -> bool:
    if _BWD_BACKEND == "xla":
        return False
    if _BWD_BACKEND != "pallas" and jax.default_backend() != "tpu":
        return False
    return x.ndim == 3 and use_ln_dense(
        x.shape[1], x.shape[2], [k.shape[1] for k in kernels], out_dtype)


# ---------------------------------------------------------------------------
# Fully-fused LN -> fc1 -> act -> fc2 (the whole pre-LN MLP in one kernel).
# Why: with only LN+fc1 fused, the [B, N, F] activation round-trips HBM
# between the fc1 custom call and fc2's XLA fusion — at the flagship
# z-stream shape that is ~168 MB of traffic per MLP site that a VMEM-
# resident hidden block avoids entirely (docs/performance.md, round-3
# trace: fc2/out-proj fusions ~10 ms of a 64 ms denoiser call).
# ---------------------------------------------------------------------------


def use_ln_mlp(n: int, c: int, f: int, o: int, dtype) -> bool:
    """Trace-time dispatch decision for LN[B,N,C] -> [C,F] -> act -> [F,O]."""
    if _BACKEND == "xla":
        return False
    if _BACKEND != "pallas" and jax.default_backend() != "tpu":
        return False
    if c % 128 or f % 128 or o % 128:
        return False  # lane-register alignment
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return False
    itemsize = jnp.dtype(dtype).itemsize
    vmem = (
        (c * f + f * o) * itemsize  # resident weight panels
        + 2 * n * (c + o) * itemsize  # double-buffered in/out blocks
        + 3 * n * c * 4  # fp32 x copy + normalized copy
        + n * f * 4 + n * f * itemsize  # fp32 hidden accumulator + cast copy
    )
    return vmem <= _VMEM_BUDGET


def _ln_mlp_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *, epsilon: float, mxu_dtype, act):
    x = x_ref[0].astype(jnp.float32)  # [N, C]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y = y.astype(mxu_dtype)
    h32 = jax.lax.dot_general(
        y, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    a = _apply_act(h32, act, erf=_erf_f32).astype(mxu_dtype)
    o32 = jax.lax.dot_general(
        a, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[0] = o32.astype(o_ref.dtype)


def _pallas_ln_mlp(x, scale, bias, w1, b1, w2, b2, epsilon, out_dtype, act):
    b, n, c = x.shape
    f, o = w2.shape
    mxu_dtype = jnp.bfloat16 if out_dtype != jnp.float32 else jnp.float32
    kern = functools.partial(
        _ln_mlp_kernel, epsilon=epsilon, mxu_dtype=mxu_dtype, act=act)
    in_specs = [
        pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((f, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, o), out_dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_BUDGET,
        ),
    )(x, scale.reshape(1, c), bias.reshape(1, c),
      w1.astype(mxu_dtype), b1.reshape(1, f).astype(jnp.float32),
      w2.astype(mxu_dtype), b2.reshape(1, o).astype(jnp.float32))


def _xla_ln_mlp(x, scale, bias, w1, b1, w2, b2, epsilon, out_dtype, act):
    """Reference composition with the SAME math as the kernel: the fc1
    stage is exactly ``_xla_ln_denses`` (whose output dtype equals the
    kernel's mxu dtype for both f32 and bf16), then a compute-dtype fc2
    matmul with fp32 accumulation, fp32 bias, single cast out."""
    mxu_dtype = jnp.bfloat16 if out_dtype != jnp.float32 else jnp.float32
    (a,) = _xla_ln_denses(x, scale, bias, (w1,), (b1,), epsilon, out_dtype,
                          (act,))
    o32 = jax.lax.dot_general(
        a.astype(mxu_dtype), w2.astype(mxu_dtype),
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    return o32.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_ln_mlp(x, scale, bias, w1, b1, w2, b2, epsilon, out_dtype, act):
    """``act(LN(x) @ w1 + b1) @ w2 + b2`` with the hidden [B, N, F]
    activation never leaving VMEM on TPU.

    x: [B, N, C]; w1: [C, F]; w2: [F, O]; biases required. Dispatches to
    the in-VMEM Pallas kernel for lane-aligned shapes that fit the VMEM
    budget, the equivalent XLA composition otherwise.
    """
    if x.ndim == 3 and use_ln_mlp(
            x.shape[1], x.shape[2], w1.shape[1], w2.shape[1], out_dtype):
        return _pallas_ln_mlp(x, scale, bias, w1, b1, w2, b2, epsilon,
                              out_dtype, act)
    return _xla_ln_mlp(x, scale, bias, w1, b1, w2, b2, epsilon, out_dtype,
                       act)


def _mlp_fwd(x, scale, bias, w1, b1, w2, b2, epsilon, out_dtype, act):
    out = fused_ln_mlp(x, scale, bias, w1, b1, w2, b2, epsilon, out_dtype,
                       act)
    return out, (x, scale, bias, w1, b1, w2, b2)


def _mlp_bwd(epsilon, out_dtype, act, res, g):
    """Rematerializing backward built from the proven pieces: the fc1
    stage's gradient rides ``fused_ln_denses``' own custom VJP (the
    in-VMEM Pallas backward on TPU), fc2's grads are two MXU matmuls in
    the forward's compute class (bf16 operands, fp32 accumulation)."""
    x, scale, bias, w1, b1, w2, b2 = res
    mxu_dtype = jnp.bfloat16 if out_dtype != jnp.float32 else jnp.float32

    def f1(x_, s_, b_, w1_, b1_):
        return fused_ln_denses(x_, s_, b_, (w1_,), (b1_,), epsilon,
                               out_dtype, (act,))[0]

    a, vjp1 = jax.vjp(f1, x, scale, bias, w1, b1)
    dw2 = jax.lax.dot_general(
        a.astype(mxu_dtype), g.astype(mxu_dtype),
        (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w2.dtype)
    db2 = g.astype(jnp.float32).sum(axis=(0, 1)).astype(b2.dtype)
    g_a = jax.lax.dot_general(
        g.astype(mxu_dtype), w2.astype(mxu_dtype),
        (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(a.dtype)
    dx, dscale, dbias, dw1, db1 = vjp1(g_a)
    return dx, dscale, dbias, dw1, db1, dw2, db2


fused_ln_mlp.defvjp(_mlp_fwd, _mlp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_ln_denses(x, scale, bias, kernels, biases, epsilon, out_dtype,
                    acts):
    """``[act_i(LN(x; scale, bias, eps) @ K_i + b_i)]`` without
    materializing LN(x).

    x: [B, N, C]; kernels: tuple of [C, F_i]; biases: tuple of [F_i]
    or None; acts: tuple of None | 'gelu' (exact erf) | 'gelu_tanh'
    (tanh approx via hardware exp) | 'quick_gelu'. Returns a list of
    [B, N, F_i] arrays in ``out_dtype``. Dispatches to the in-VMEM
    Pallas kernel on TPU for lane-aligned shapes, XLA otherwise.

    To fold a constant output scale (e.g. attention's 1/sqrt(d) on q),
    pre-scale that K_i and b_i at trace time — weights are loop-
    invariant so XLA hoists the multiply out of sampler loops.
    """
    return _dispatch(x, scale, bias, tuple(kernels), tuple(biases), epsilon,
                     out_dtype, tuple(acts))


def _fwd(x, scale, bias, kernels, biases, epsilon, out_dtype, acts):
    out = fused_ln_denses(x, scale, bias, kernels, biases, epsilon,
                          out_dtype, acts)
    return out, (x, scale, bias, tuple(kernels), tuple(biases))


def _bwd(epsilon, out_dtype, acts, res, g):
    x, scale, bias, kernels, biases = res
    if _use_bwd_pallas(x, kernels, out_dtype):
        return _pallas_ln_denses_bwd(
            x, scale, bias, kernels, biases, list(g), epsilon, out_dtype,
            acts)

    def ref(x_, s_, b_, ks_, bs_):
        return _xla_ln_denses(x_, s_, b_, ks_, bs_, epsilon, out_dtype, acts)

    _, vjp = jax.vjp(ref, x, scale, bias, kernels, biases)
    return vjp(list(g))


fused_ln_denses.defvjp(_fwd, _bwd)
