"""Re-profile the fused multi-head attention kernel against a corrected
speed-of-light model (VERDICT r3 #1).

Round-3's performance.md estimated per-z-site SOL at ~0.2-0.3 ms assuming
full-depth MXU matmuls and blamed the 0.9-1.0 ms measured on fp32 softmax
exp — but the bf16-exp A/B was throughput-neutral, contradicting that. This
script decomposes the kernel cost with an incremental ablation ladder (each
rung adds one stage, all rungs write an output so nothing dead-code
eliminates) and prints an analytic SOL that models the REAL MXU constraint:
a 128x128 systolic array contracting over head_dim=32 (QK^T) or emitting 32
output lanes (PV) runs at <= 32/128 = 25% of dense peak. Lane-packing
tricks (block-diagonal head packing) provably break even: packing p heads
multiplies FLOPs by p while efficiency rises by min(1, 32p/128).

Rungs (per head, per batch-row grid cell):
  qk        S = Q K^T                      (MXU, k=32)
  qk_max    + row max                      (VPU panel pass)
  qk_exp    + subtract, exp                (VPU transcendental pass)
  qk_sum    + row sum of exp               (VPU panel pass)
  full      + P V matmul, o * 1/sum        (MXU n=32 + epilogue)  == shipped
  nomax     full minus the max pass        (unsafe numerics; timing only)
  grid2     full, but grid (B, 2): 4 heads/cell (128-lane aligned blocks) —
            tests whether smaller cells pipeline DMA/compute better
  xla       jnp einsum comparator (what auto-dispatch would fall back to)

Timing: chained-call slope inside one jit (lax.scan carrying q <- f(q)+eps,
length 2 vs 12), host-fetch to force completion (block_until_ready lies
under the axon tunnel), inputs from os.urandom so the axon execution cache
cannot dedupe runs.

Usage: python scripts/attn_profile.py [--shapes z,read,write] [--iters 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcdiff.ops.flash_attention import _MH_VMEM_BUDGET, _mh_kernel

# Flagship attention shapes (B at the CFG bench batch, H=8, D=32):
#   z-compute: 643 x 643   (24 of 36 sites per denoiser call)
#   read     : 643q x 1024k (6 sites)
#   write    : 1024q x 643k (6 sites)
SHAPES = {
    "z": (64, 643, 643, 8, 256),
    "read": (64, 643, 1024, 8, 256),
    "write": (64, 1024, 643, 8, 256),
}

# v5e single chip
PEAK_BF16 = 197e12  # dense bf16 FLOP/s
HBM_BW = 800e9      # ~measured achievable
VPU_F32 = 4.9e12 / 4  # ~1.2e12 fp32 elementwise ops/s (8x128 lanes ~1.2GHz)


def _ladder_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, rung: str,
                   mxu_dtype=jnp.bfloat16):
    """Incremental ablation of _mh_kernel; every rung writes o_ref."""
    hd = q_ref.shape[-1]
    d = hd // num_heads
    q = q_ref[0].astype(mxu_dtype)
    k = k_ref[0].astype(mxu_dtype)
    v = v_ref[0].astype(mxu_dtype)
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, NK] fp32
        if rung == "qk":
            # cheap d-lane slice write so every rung pays the same out cost
            o_ref[0, :, sl] = s[:, :d].astype(o_ref.dtype)
        elif rung == "qk_max":
            m = jnp.max(s, axis=-1, keepdims=True)
            o_ref[0, :, sl] = jnp.broadcast_to(m, (s.shape[0], d)).astype(
                o_ref.dtype)
        elif rung == "qk_exp":
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            o_ref[0, :, sl] = p[:, :d].astype(o_ref.dtype)
        elif rung == "qk_sum":
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            r = jnp.sum(p, axis=-1, keepdims=True)
            o_ref[0, :, sl] = jnp.broadcast_to(r, (s.shape[0], d)).astype(
                o_ref.dtype)
        elif rung == "nomax":
            p = jnp.exp(s)
            recip = pl.reciprocal(jnp.sum(p, axis=-1, keepdims=True),
                                  approx=False)
            o = jax.lax.dot_general(
                p.astype(mxu_dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = (o * recip).astype(o_ref.dtype)
        else:
            raise ValueError(rung)


def _make_pallas(rung: str, B: int, nq: int, nk: int, H: int, hd: int,
                 heads_per_cell: int | None = None):
    """pallas_call for a ladder rung (or the shipped kernel for 'full')."""
    if rung == "full":
        kern = functools.partial(_mh_kernel, num_heads=H,
                                 mxu_dtype=jnp.bfloat16)
    else:
        kern = functools.partial(_ladder_kernel, num_heads=H, rung=rung)

    if heads_per_cell is not None:
        # grid (B, H // heads_per_cell): feature-axis blocks of
        # heads_per_cell*d lanes (must be a 128 multiple).
        hpc = heads_per_cell
        d = hd // H
        assert (hpc * d) % 128 == 0, (hpc, d)
        groups = H // hpc
        if rung == "full":
            kern = functools.partial(_mh_kernel, num_heads=hpc,
                                     mxu_dtype=jnp.bfloat16)
        else:
            kern = functools.partial(_ladder_kernel, num_heads=hpc, rung=rung)
        bw = hpc * d
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, nq, hd), jnp.bfloat16),
            grid=(B, groups),
            in_specs=[
                pl.BlockSpec((1, nq, bw), lambda b, g: (b, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, bw), lambda b, g: (b, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, bw), lambda b, g: (b, 0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nq, bw), lambda b, g: (b, 0, g),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=_MH_VMEM_BUDGET,
            ),
        )

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, nq, hd), jnp.bfloat16),
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
            vmem_limit_bytes=_MH_VMEM_BUDGET,
        ),
    )


def _xla_mh(q, k, v, H):
    B, nq, hd = q.shape
    d = hd // H
    qh = q.reshape(B, nq, H, d)
    kh = k.reshape(B, k.shape[1], H, d)
    vh = v.reshape(B, v.shape[1], H, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, nq, hd)


def _chained(op, q0, k, v, n: int):
    """jit program applying op n times with a data dependency between calls."""

    def body(q, _):
        o = op(q, k, v)
        # feed the output back (same [B, nq, hd] shape); tiny drift keeps
        # panels in a sane numeric range across 12 steps
        return (q + o.astype(q.dtype) * jnp.bfloat16(1e-3), None)

    def prog(q):
        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    return jax.jit(prog)


def _time(fn, q0, iters: int) -> float:
    fn(q0)  # compile + warm
    best = float("inf")
    for _ in range(iters):
        q = q0 + jnp.bfloat16(np.random.default_rng(
            int.from_bytes(os.urandom(4), "little")).uniform(0.01, 0.05))
        t0 = time.perf_counter()
        float(fn(q))  # host fetch forces completion under the axon tunnel
        best = min(best, time.perf_counter() - t0)
    return best


def measure(op, B, nq, nk, hd, iters, rng) -> float:
    """Marginal per-call ms via the n=4 vs n=64 chained slope (the long
    chain keeps tunnel RTT jitter, ~several ms/run, out of the slope)."""
    q0 = jnp.asarray(rng.standard_normal((B, nq, hd)) * 0.05, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, nk, hd)) * 0.05, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, nk, hd)) * 0.05, jnp.bfloat16)
    t_lo = _time(_chained(op, q0, k, v, 4), q0, iters)
    t_hi = _time(_chained(op, q0, k, v, 64), q0, iters)
    return (t_hi - t_lo) / 60.0 * 1e3


def sol_table(B, nq, nk, H, hd):
    """Analytic floor with the lane-granularity MXU model."""
    d = hd // H
    qk_eff = min(1.0, d / 128)        # contraction depth k=d
    pv_eff = min(1.0, d / 128)        # output lanes n=d
    qk_flop = 2 * B * H * nq * nk * d
    pv_flop = 2 * B * H * nq * nk * d
    t_mxu = qk_flop / (PEAK_BF16 * qk_eff) + pv_flop / (PEAK_BF16 * pv_eff)
    # VPU panel passes over [nq, nk] fp32 per head: max (1 read+reduce),
    # subtract+exp (~7 ops/elt for exp), sum (1). ~10 ops/element total.
    panel = B * H * nq * nk
    t_vpu = 10 * panel / VPU_F32
    # HBM: q + k + v + o once (bf16)
    bytes_hbm = 2 * (B * nq * hd + 2 * B * nk * hd + B * nq * hd)
    t_hbm = bytes_hbm / HBM_BW
    return t_mxu * 1e3, t_vpu * 1e3, t_hbm * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="z,read,write")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--rungs", default="qk,qk_max,qk_exp,qk_sum,full,nomax,"
                                       "grid2,xla")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))

    for sname in args.shapes.split(","):
        B, nq, nk, H, hd = SHAPES[sname]
        t_mxu, t_vpu, t_hbm = sol_table(B, nq, nk, H, hd)
        print(f"\n== {sname}: B={B} nq={nq} nk={nk} H={H} hd={hd} ==")
        print(f"SOL model: mxu(lane-limited {hd//H}/128)={t_mxu:.3f} ms  "
              f"vpu(10 ops/elt)={t_vpu:.3f} ms  hbm={t_hbm:.3f} ms  "
              f"serial-sum={t_mxu + t_vpu:.3f} ms", flush=True)
        for rung in args.rungs.split(","):
            try:
                if rung == "xla":
                    op = functools.partial(_xla_mh, H=H)
                elif rung == "grid2":
                    pc = _make_pallas("full", B, nq, nk, H, hd,
                                      heads_per_cell=4)
                    op = lambda q, k, v: pc(q, k, v)  # noqa: E731
                else:
                    pc = _make_pallas(rung, B, nq, nk, H, hd)
                    op = lambda q, k, v: pc(q, k, v)  # noqa: E731
                ms = measure(op, B, nq, nk, hd, args.iters, rng)
                print(f"  {rung:8s} {ms:8.3f} ms/call", flush=True)
            except Exception as e:
                print(f"  {rung:8s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
