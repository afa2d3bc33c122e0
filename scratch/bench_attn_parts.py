"""Isolate kernel cost components, axon-cache-proof: every timed call gets a
fresh scalar seed that perturbs the inputs inside the jitted program."""

import os
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

B, H, D = 64, 8, 32
HD = H * D
ITERS = 8


def entropy():
    return int.from_bytes(os.urandom(4), "little")


def make_kernel(mode):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0].astype(jnp.bfloat16)
        k = k_ref[0].astype(jnp.bfloat16)
        v = v_ref[0].astype(jnp.bfloat16)
        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if mode == "full":
                s = s - jnp.max(s, axis=-1, keepdims=True)
                w = jnp.exp(s)
                w = w / jnp.sum(w, axis=-1, keepdims=True)
            elif mode == "exp_only":
                w = jnp.exp(s)
            elif mode == "max_only":
                w = s - jnp.max(s, axis=-1, keepdims=True)
            else:  # matmul_only
                w = s
            o_ref[0, :, sl] = jax.lax.dot_general(
                w.astype(jnp.bfloat16), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
    return kernel


def timed(pallas_fn, q, k, v):
    @jax.jit
    def call(q, k, v, s):
        return jnp.mean(pallas_fn(q + s, k, v))

    call(q, k, v, jnp.float32(entropy() % 97 * 1e-6)).block_until_ready()
    ts = []
    for i in range(ITERS):
        s = jnp.float32((entropy() % 9973) * 1e-7)
        t0 = time.perf_counter()
        call(q, k, v, s).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def run(mode, nq, nk):
    rng = np.random.default_rng(entropy())
    q = jnp.asarray(rng.standard_normal((B, nq, HD)), jnp.float32) * 0.18
    k = jnp.asarray(rng.standard_normal((B, nk, HD)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, nk, HD)), jnp.float32)

    fn = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((B, nq, HD), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, nq, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, HD), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )
    return timed(fn, q, k, v)


def xla_run(nq, nk):
    rng = np.random.default_rng(entropy())
    q = jnp.asarray(rng.standard_normal((B, nq, HD)), jnp.float32) * 0.18
    k = jnp.asarray(rng.standard_normal((B, nk, HD)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, nk, HD)), jnp.float32)
    from pcdiff.ops import flash_attention as fa
    return timed(lambda a, b, c: fa._xla_attention_mh(a, b, c, H), q, k, v)


def main():
    for nq, nk in [(643, 1024), (640, 1024), (643, 643), (1024, 643)]:
        row = f"nq={nq:4d} nk={nk:4d}: "
        for mode in ["matmul_only", "full"]:
            dt = run(mode, nq, nk)
            row += f"{mode} {dt*1e3:6.3f} | "
        row += f"xla {xla_run(nq, nk)*1e3:6.3f} ms"
        print(row)


if __name__ == "__main__":
    main()
