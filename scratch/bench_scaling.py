"""Does measured latency scale with chained attention count? If not, the
runtime is serving cached/elided results."""

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
NQ, NK = 643, 1024


def entropy():
    return int.from_bytes(os.urandom(4), "little")


def main():
    rng = np.random.default_rng(entropy())
    q = jnp.asarray(rng.standard_normal((B, NQ, HD)), jnp.float32) * 0.18
    k = jnp.asarray(rng.standard_normal((B, NK, HD)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, NK, HD)), jnp.float32)

    for impl_name, impl in [
        ("xla", lambda a, b, c: fa._xla_attention_mh(a, b, c, H)),
        ("pallas", lambda a, b, c: fa._pallas_attention_mh(a, b, c, H)),
    ]:
        for n in [1, 4, 16]:
            @jax.jit
            def call(q, k, v, s, _n=n, _impl=impl):
                x = q + s
                for _ in range(_n):
                    o = _impl(x, k, v)
                    # data dependency: feed output back as queries
                    x = o * 1e-3 + q
                return jnp.mean(o)

            call(q, k, v, jnp.float32(1e-6 * (entropy() % 97))).block_until_ready()
            ts = []
            for _ in range(5):
                s = jnp.float32(np.float32(rng.standard_normal() * 1e-4))
                t0 = time.perf_counter()
                call(q, k, v, s).block_until_ready()
                ts.append(time.perf_counter() - t0)
            print(f"{impl_name:6s} n={n:2d}: min {min(ts)*1e3:8.3f} ms  "
                  f"per-attn {min(ts)/n*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
