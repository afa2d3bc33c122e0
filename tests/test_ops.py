"""Pallas kernel tests (interpret mode on CPU) + backend dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.ops import flash_attention as fa


@pytest.fixture
def qkv(rng):
    B, H, Nq, Nk, D = 2, 3, 37, 53, 32
    q = rng.standard_normal((B, H, Nq, D)).astype(np.float32) * 0.2
    k = rng.standard_normal((B, H, Nk, D)).astype(np.float32) * 0.2
    v = rng.standard_normal((B, H, Nk, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_pallas_kernel_matches_xla_interpret(qkv, monkeypatch):
    q, k, v = qkv
    want = fa._xla_attention(q, k, v)
    # run the pallas kernel in interpreter mode on CPU
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = fa._pallas_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_gradients_match_xla(qkv):
    q, k, v = qkv

    def loss_fused(q, k, v):
        return jnp.sum(fa.fused_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(fa._xla_attention(q, k, v) ** 2)

    # on CPU both forward paths are XLA; this validates the custom VJP math
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_backend_switch(qkv):
    q, k, v = qkv
    fa.set_attention_backend("xla")
    try:
        out = fa.fused_attention(q, k, v)
        assert out.shape == q.shape
    finally:
        fa.set_attention_backend("auto")
    assert fa.attention_backend() == "auto"
