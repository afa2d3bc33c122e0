"""Micro-bench: fused_attention_mh (pallas) vs XLA at flagship shapes.

Run on the real TPU. Inputs derived from os.urandom; each timed iteration
mixes the loop carry into the inputs to defeat the axon execution cache.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pcdiff.ops import flash_attention as fa

B, H, D = 64, 8, 32
HD = H * D
SHAPES = [("read(z<-x)", 643, 1024), ("compute", 643, 643), ("write(x<-z)", 1024, 643)]


def seed():
    return int.from_bytes(os.urandom(4), "little")


def bench(fn, q, k, v, iters=20):
    # warmup/compile
    out = fn(q, k, v)
    out.block_until_ready()

    def loop(q, k, v):
        def body(carry, _):
            qq = q + carry * 1e-6
            o = fn(qq, k, v)
            return jnp.mean(o), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    run = jax.jit(loop)
    c = run(q, k, v)
    c.block_until_ready()
    t0 = time.perf_counter()
    c = run(q, k, v)
    c.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt, float(c)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(seed())
    for name, nq, nk in SHAPES:
        q = jnp.asarray(rng.standard_normal((B, nq, HD)), jnp.float32) * 0.18
        k = jnp.asarray(rng.standard_normal((B, nk, HD)), jnp.float32) * 0.2
        v = jnp.asarray(rng.standard_normal((B, nk, HD)), jnp.float32)

        # correctness on-device
        got = fa._pallas_attention_mh(q, k, v, H)
        want = fa._xla_attention_mh(q, k, v, H)
        err = float(jnp.max(jnp.abs(got - want)))

        t_pallas, _ = bench(lambda a, b, c: fa._pallas_attention_mh(a, b, c, H), q, k, v)
        t_xla, _ = bench(lambda a, b, c: fa._xla_attention_mh(a, b, c, H), q, k, v)
        # old path for comparison: bhqd layout incl. the transposes
        def old_xla(a, b, c):
            qh = a.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
            kh = b.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
            vh = c.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
            o = fa._xla_attention(qh, kh, vh)
            return o.transpose(0, 2, 1, 3).reshape(a.shape)
        t_old, _ = bench(old_xla, q, k, v)
        print(
            f"{name:14s} nq={nq:4d} nk={nk:4d}: pallas {t_pallas*1e3:7.3f} ms | "
            f"xla-mh {t_xla*1e3:7.3f} ms | xla-bhqd+T {t_old*1e3:7.3f} ms | "
            f"max_abs_err {err:.2e}"
        )


if __name__ == "__main__":
    main()
