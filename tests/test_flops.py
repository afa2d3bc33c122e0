"""Pin pcdiff.utils.flops — the MFU derivation in the bench record.

Hand-computable programs first (a dense, a batched einsum, a conv, a scan,
a pallas_call with a grid), then the structural property the bench relies
on: the XLA and Pallas attention dispatches count identically, and a small
sampler program's count matches the closed-form call-count model.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.utils.flops import count_jaxpr_dot_flops, traced_dot_flops


def test_single_dense():
    f = lambda x, w: x @ w
    x = jnp.zeros((7, 13))
    w = jnp.zeros((13, 5))
    assert traced_dot_flops(f, x, w) == 2 * 7 * 13 * 5


def test_batched_einsum():
    f = lambda a, b: jnp.einsum("bhqd,bhkd->bhqk", a, b)
    a = jnp.zeros((2, 3, 5, 7))
    b = jnp.zeros((2, 3, 11, 7))
    assert traced_dot_flops(f, a, b) == 2 * (2 * 3) * 5 * 11 * 7


def test_conv():
    f = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = jnp.zeros((2, 8, 8, 3))
    k = jnp.zeros((3, 3, 3, 4))
    out_spatial = 6 * 6
    assert traced_dot_flops(f, x, k) == 2 * (2 * out_spatial * 4) * 3 * (3 * 3)


def test_scan_multiplies_length():
    w = jnp.zeros((4, 4))

    def f(x):
        def body(c, _):
            return c @ w, None
        c, _ = jax.lax.scan(body, x, None, length=9)
        return c

    assert traced_dot_flops(f, jnp.zeros((4, 4))) == 9 * 2 * 4 * 4 * 4


def test_cond_takes_max_branch():
    w = jnp.zeros((4, 4))

    def f(x, p):
        return jax.lax.cond(p, lambda c: c @ w @ w, lambda c: c @ w, x)

    assert traced_dot_flops(f, jnp.zeros((4, 4)), True) == 2 * (2 * 4**3)


def test_jit_and_remat_descend():
    w = jnp.zeros((4, 4))
    f = jax.jit(jax.checkpoint(lambda x: x @ w))
    assert traced_dot_flops(f, jnp.zeros((4, 4))) == 2 * 4**3


def test_pallas_grid_multiplies():
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = jnp.dot(
            x_ref[...], x_ref[...], preferred_element_type=jnp.float32
        )

    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            grid=(4,),
            in_specs=[pl.BlockSpec((128, 128), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0)),
        )(x)

    # trace-only: the kernel is counted, never executed
    assert traced_dot_flops(f, jnp.zeros((128, 128))) == 4 * 2 * 128**3


def test_attention_dispatches_count_identically():
    """The bench's MFU must not depend on which backend traced."""
    from pcdiff.ops import flash_attention as fa

    q = jnp.zeros((2, 64, 256), jnp.bfloat16)
    k = jnp.zeros((2, 48, 256), jnp.bfloat16)

    def run(backend):
        fa.set_attention_backend(backend)
        try:
            return traced_dot_flops(
                lambda a, b: fa.fused_attention_mh(a, b, b, 8), q, k
            )
        finally:
            fa.set_attention_backend("auto")

    n_xla = run("xla")
    n_pallas = run("pallas")
    expected = 2 * 2 * 8 * (64 * 48 * 32 + 64 * 48 * 32)
    assert n_xla == expected
    assert n_pallas == expected


def test_sampler_program_matches_call_count_model():
    """A tiny guided-interval reuse program's dot count equals
    calls_2B * per_2B_call + calls_B * per_B_call (the closed-form the
    performance docs quote)."""
    from pcdiff.diffusion.karras import (
        get_sigmas_karras,
        half_model_kwargs,
        sample_guided_interval,
        guided_denoise_fn,
    )

    B, N, C, F = 2, 16, 3, 8
    w = jnp.zeros((C, F))
    w2 = jnp.zeros((F, C))

    calls = {"n": 0}

    def base_denoise(x, s, state):
        return (x @ w) @ w2, state

    per_row_flops = 2 * N * C * F + 2 * N * F * C

    steps = 8
    sigmas = get_sigmas_karras(steps, 1e-3, 120.0)
    interval = (0.1, 10.0)
    denoise_cfg = guided_denoise_fn(base_denoise, 3.0)

    def program(x, key):
        return sample_guided_interval(
            base_denoise, denoise_cfg, x, sigmas, key,
            guidance_interval=interval, sampler="heun_reuse", cond_batch=B,
        )["x"]

    flops = traced_dot_flops(
        program, jnp.zeros((B, N, C)), jax.random.PRNGKey(0)
    )

    # closed-form call counts: per segment of m steps, reuse-heun does m+1
    # denoiser calls (2 on its first step, 1 per later step, +1 final Euler
    # on the last segment)
    n = steps
    use_cfg = [interval[0] <= float(sigmas[i]) <= interval[1] for i in range(n)]
    seg, segs = 1, []
    for i in range(1, n):
        if use_cfg[i] == use_cfg[i - 1]:
            seg += 1
        else:
            segs.append((seg, use_cfg[i - 1]))
            seg = 1
    segs.append((seg, use_cfg[n - 1]))
    calls_2b = sum(m + 1 for m, on in segs if on)
    calls_b = sum(m + 1 for m, on in segs if not on)
    expected = calls_2b * 2 * B * per_row_flops + calls_b * B * per_row_flops
    assert flops == expected
