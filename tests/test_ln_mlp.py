"""Fully-fused LN->fc1->GELU->fc2 kernel and Mlp-module fusion tests (CPU).

Same strategy as test_ln_dense.py: the Pallas kernel runs in interpret
mode against the XLA mirror (same math), gradients are checked against
the plain composition, and the Mlp module must produce ONE param tree
and matching outputs under the fused / split / unfused graphs so
checkpoints are interchangeable across all three dispatches.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.models import attention as attn_mod
from pcdiff.ops import ln_dense as ld


@pytest.fixture
def mlp_fusion_on():
    attn_mod.set_ln_dense_fusion("on")
    attn_mod.set_ln_mlp_fusion("on")
    yield
    attn_mod.set_ln_mlp_fusion("auto")
    attn_mod.set_ln_dense_fusion("auto")


def _mk(rng, b, n, c, f, o):
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, f)), jnp.float32) * 0.1
    b1 = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, o)), jnp.float32) * 0.1
    b2 = jnp.asarray(rng.standard_normal((o,)), jnp.float32)
    return x, scale, bias, w1, b1, w2, b2


def _ref_mlp(x, scale, bias, w1, b1, w2, b2, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    h = y @ w1 + b1
    a = nn.gelu(h, approximate=False)
    return a @ w2 + b2


def test_pallas_ln_mlp_matches_xla_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    # n=70: not a sublane multiple — exercises Mosaic's ragged-N handling
    b, n, c, f, o = 3, 70, 128, 256, 128
    x, scale, bias, w1, b1, w2, b2 = _mk(rng, b, n, c, f, o)
    want = ld._xla_ln_mlp(x, scale, bias, w1, b1, w2, b2, 1e-5,
                          jnp.float32, "gelu")
    with pltpu.force_tpu_interpret_mode():
        got = ld._pallas_ln_mlp(x, scale, bias, w1, b1, w2, b2, 1e-5,
                                jnp.float32, "gelu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_xla_ln_mlp_matches_plain_composition(rng):
    b, n, c, f, o = 2, 11, 64, 96, 64
    x, scale, bias, w1, b1, w2, b2 = _mk(rng, b, n, c, f, o)
    got = ld._xla_ln_mlp(x, scale, bias, w1, b1, w2, b2, 1e-5,
                         jnp.float32, "gelu")
    want = _ref_mlp(x, scale, bias, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_ln_mlp_grads_match_composition(rng):
    b, n, c, f, o = 2, 11, 64, 96, 64
    args = _mk(rng, b, n, c, f, o)

    def loss_fused(*a):
        return jnp.sum(
            ld.fused_ln_mlp(*a, 1e-5, jnp.float32, "gelu") ** 2)

    def loss_ref(*a):
        return jnp.sum(_ref_mlp(*a) ** 2)

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_mlp_module_fused_matches_unfused(rng, mlp_fusion_on):
    """One param tree; fused (whole-MLP), split (fc1-only), and unfused
    graphs agree. Checkpoints interchangeable across all three."""
    b, n, c = 2, 9, 64
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    class PreLNMlp(nn.Module):
        @nn.compact
        def __call__(self, x):
            mlp = attn_mod.Mlp(hidden_dim=128, dtype=jnp.float32, name="mlp")
            if attn_mod.fuse_ln_dense_enabled():
                ln = attn_mod._LNParams(name="norm")(x.shape[-1])
                return mlp(x, ln=ln)
            xn = attn_mod.LayerNorm(name="norm")(x)
            return mlp(xn)

    params = PreLNMlp().init(jax.random.PRNGKey(0), x)
    fused = PreLNMlp().apply(params, x)

    attn_mod.set_ln_mlp_fusion("off")  # split path: fused fc1, XLA fc2
    split = PreLNMlp().apply(params, x)

    attn_mod.set_ln_dense_fusion("off")  # plain pre-LN graph
    plain = PreLNMlp().apply(params, x)

    np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)


def test_point_e_mlp_fused_matches_unfused(rng, mlp_fusion_on):
    from pcdiff.models.point_e import PointEMLP

    b, n, c = 2, 9, 64
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    class PreLN(nn.Module):
        @nn.compact
        def __call__(self, x):
            mlp = PointEMLP(width=c, init_scale=0.5, name="mlp")
            if attn_mod.fuse_ln_dense_enabled():
                ln = attn_mod._LNParams(name="norm")(x.shape[-1])
                return mlp(x, ln=ln)
            return mlp(attn_mod.LayerNorm(name="norm")(x))

    params = PreLN().init(jax.random.PRNGKey(0), x)
    fused = PreLN().apply(params, x)
    attn_mod.set_ln_mlp_fusion("off")
    split = PreLN().apply(params, x)
    attn_mod.set_ln_dense_fusion("off")
    plain = PreLN().apply(params, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=2e-5, atol=2e-5)


def test_mlp_module_dropout_falls_back(rng, mlp_fusion_on):
    """Active dropout between fc1 and fc2 cannot cross the kernel
    boundary: non-deterministic apply with drop>0 must take the split
    path (smoke: it runs and differs from the deterministic output)."""
    b, n, c = 2, 9, 64
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    class PreLNMlp(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True):
            ln = attn_mod._LNParams(name="norm")(x.shape[-1])
            return attn_mod.Mlp(hidden_dim=128, drop=0.5, name="mlp")(
                x, deterministic=deterministic, ln=ln)

    m = PreLNMlp()
    params = m.init(jax.random.PRNGKey(0), x)
    det = m.apply(params, x, deterministic=True)
    stoch = m.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert det.shape == stoch.shape
    assert not np.allclose(np.asarray(det), np.asarray(stoch))


def test_use_ln_mlp_vmem_and_alignment_gates():
    attn_mod.set_ln_dense_fusion("on")
    ld.set_lndense_backend("pallas")
    try:
        assert ld.use_ln_mlp(643, 256, 1024, 256, jnp.bfloat16)
        assert ld.use_ln_mlp(1024, 256, 1024, 256, jnp.bfloat16)
        assert not ld.use_ln_mlp(643, 250, 1024, 256, jnp.bfloat16)  # lane
        assert not ld.use_ln_mlp(100_000, 256, 1024, 256, jnp.bfloat16)
    finally:
        ld.set_lndense_backend("auto")
        attn_mod.set_ln_dense_fusion("auto")
