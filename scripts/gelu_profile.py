"""Measure the marginal cost of the GELU epilogue variants inside the
fused LN+Dense kernel at the flagship MLP fc1 site shapes.

Round-4 context: the denoiser-call trace attributes ~13.3 ms of the 64 ms
call to the LN->fc1+GELU kernels and flags them "VPU erf-bound, not
bandwidth" (docs/performance.md) — the exact-erf GELU costs a ~12-term
rational polynomial + divide per element of the [B, N, 4C] accumulator,
while the TPU VPU has a hardware exp. This script A/Bs the epilogue alone,
holding everything else in the kernel fixed:

  none       LN -> fc1 (+bias), no activation       (lower bound)
  gelu       exact-erf epilogue                     (shipped default)
  gelu_tanh  tanh-approx via sigmoid/hardware exp   (candidate)

Timing: chained-call slope inside one jit (lax.scan carrying
x <- x + o[..., :C] * 1e-3, length 4 vs 64), host-fetch per timed call
(block_until_ready lies under the axon tunnel), inputs from os.urandom so
the axon execution cache cannot dedupe runs. The feedback slice costs the
same for every variant, so it cancels in the A/B delta.

Usage: python scripts/gelu_profile.py [--iters 3] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pcdiff.ops import ln_dense as ld

# Flagship fc1 sites at the CFG bench batch (B=64 = 2x32):
#   z-stream MLP : [64, 643, 256] -> 1024  (6 sites/denoiser call)
#   x-stream MLP : [64, 1024, 256] -> 1024 (6 sites/denoiser call)
SHAPES = {
    "z": (64, 643, 256, 1024),
    "x": (64, 1024, 256, 1024),
}


def _chained(act, x0, scale, bias, k, kb, out_dtype, n: int):
    c = x0.shape[-1]

    def body(x, _):
        (o,) = ld.fused_ln_denses(x, scale, bias, (k,), (kb,), 1e-5,
                                  out_dtype, (act,))
        return (x + o[..., :c].astype(x.dtype) * x.dtype.type(1e-3), None)

    def prog(x):
        out, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    return jax.jit(prog)


def _time(fn, x0, iters: int) -> float:
    fn(x0)  # compile + warm
    best = float("inf")
    for _ in range(iters):
        x = x0 + x0.dtype.type(np.random.default_rng(
            int.from_bytes(os.urandom(4), "little")).uniform(0.01, 0.05))
        t0 = time.perf_counter()
        float(fn(x))  # host fetch forces completion under the axon tunnel
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--shapes", default="z,x")
    ap.add_argument("--acts", default="none,gelu,gelu_tanh")
    args = ap.parse_args()
    out_dtype = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"out_dtype={out_dtype}", flush=True)
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))

    for sname in args.shapes.split(","):
        b, n, c, f = SHAPES[sname]
        print(f"\n== {sname}: [{b}, {n}, {c}] -> {f} ==", flush=True)
        x0 = jnp.asarray(rng.standard_normal((b, n, c)) * 0.05, out_dtype)
        scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((c, f)) * 0.05, jnp.float32)
        kb = jnp.asarray(rng.standard_normal((f,)) * 0.05, jnp.float32)
        base = None
        for act_name in args.acts.split(","):
            act = None if act_name == "none" else act_name
            t_lo = _time(_chained(act, x0, scale, bias, k, kb, out_dtype, 4),
                         x0, args.iters)
            t_hi = _time(_chained(act, x0, scale, bias, k, kb, out_dtype, 64),
                         x0, args.iters)
            ms = (t_hi - t_lo) / 60.0 * 1e3
            extra = "" if base is None else f"  (epilogue +{ms - base:.3f})"
            if base is None:
                base = ms
            print(f"  {act_name:10s} {ms:8.3f} ms/call{extra}", flush=True)


if __name__ == "__main__":
    main()
