"""Does the axon server compile two programs CONCURRENTLY?

The one compile-wall lever that could beat the sublinear size scaling
(docs/performance.md "Round-4 compile wall") is splitting the
guidance-interval program into per-segment programs compiled in parallel.
That only pays if two remote_compile requests overlap server-side. Probe:
AOT-compile two distinct medium programs (odd shapes from os.urandom so
the server cache can't hit) serially, then two more from two threads,
and compare walls.

Usage: python scripts/compile_concurrency_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _program(m: int, k: int, n: int, depth: int = 48):
    """A scan of chained matmuls + nonlinearities — a few seconds of real
    XLA optimization work at odd shapes."""

    def step(x, w):
        y = jnp.tanh(x @ w)
        return y + 0.1 * x, jnp.sum(y)

    def fn(x, ws):
        out, s = jax.lax.scan(step, x, ws)
        return jnp.sum(out) + jnp.sum(s)

    x = jax.ShapeDtypeStruct((m, k), jnp.bfloat16)
    ws = jax.ShapeDtypeStruct((depth, k, k), jnp.bfloat16)
    return jax.jit(fn), (x, ws)


def _fresh_dims(rng):
    # odd, cache-busting sizes
    return (int(rng.integers(900, 1400)) | 1,
            int(rng.integers(500, 900)) | 1)


def _compile_one(rng):
    m, k = _fresh_dims(rng)
    fn, args = _program(m, k, k)
    t0 = time.perf_counter()
    fn.lower(*args).compile()
    return time.perf_counter() - t0, (m, k)


def main():
    print(f"devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    # warm the pipeline once (client lowering paths, tunnel setup)
    _compile_one(rng)

    t0 = time.perf_counter()
    t_a, dims_a = _compile_one(rng)
    t_b, dims_b = _compile_one(rng)
    serial = time.perf_counter() - t0
    print(f"serial: {t_a:.1f}s {dims_a} + {t_b:.1f}s {dims_b} "
          f"= {serial:.1f}s", flush=True)

    rngs = [np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
            for _ in range(2)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(_compile_one, r) for r in rngs]
        results = [f.result() for f in futs]
    conc = time.perf_counter() - t0
    per = ", ".join(f"{t:.1f}s {d}" for t, d in results)
    print(f"concurrent (2 threads): wall={conc:.1f}s  [{per}]", flush=True)
    ratio = serial / max(conc, 1e-9)
    print(f"speedup={ratio:.2f}x -> server compiles "
          f"{'CONCURRENTLY' if ratio > 1.4 else 'serially (or the client '
          'serializes requests)'}", flush=True)


if __name__ == "__main__":
    main()
