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


@pytest.mark.parametrize(
    "nq,nk,heads,hd",
    [(643, 1024, 8, 256), (37, 53, 4, 128), (257, 129, 2, 256)],
)
def test_pallas_mh_kernel_matches_xla_interpret(rng, nq, nk, heads, hd):
    from jax.experimental.pallas import tpu as pltpu

    B = 2
    q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((B, nk, hd)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, nk, hd)), jnp.float32)
    want = fa._xla_attention_mh(q, k, v, heads)
    with pltpu.force_tpu_interpret_mode():
        # fp32 MXU passes in interpret mode for an exact-tolerance check
        got = fa._pallas_attention_mh(q, k, v, heads, mxu_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_mh_bf16_softmax_panel(rng):
    """Opt-in bf16 exp panel: close to the fp32 softmax (bf16-class
    error), and the knob resets cleanly."""
    from jax.experimental.pallas import tpu as pltpu

    B, nq, nk, heads, hd = 2, 127, 65, 4, 128
    q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((B, nk, hd)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, nk, hd)), jnp.float32)
    want = fa._xla_attention_mh(q, k, v, heads)
    try:
        fa.set_attention_softmax_dtype("bfloat16")
        assert fa.attention_softmax_dtype() == "bfloat16"
        with pltpu.force_tpu_interpret_mode():
            got = fa._pallas_attention_mh(q, k, v, heads,
                                          mxu_dtype=jnp.float32)
    finally:
        fa.set_attention_softmax_dtype("float32")
    err = np.abs(np.asarray(got) - np.asarray(want))
    # bf16 exp panel: relative error bounded by bf16 eps on the weights;
    # outputs are convex combinations of v (|v| ~ N(0,1))
    assert err.max() < 0.05, err.max()
    assert np.sqrt((err ** 2).mean()) < 0.01


def test_xla_mh_bf16_softmax_panel(rng):
    """The bf16 exp-panel knob must also apply on the XLA MH path (shapes
    the Pallas kernel rejects, e.g. head_dim 16, fall back to XLA; the
    quality gate would otherwise silently measure a no-op — found when a
    trained-checkpoint gate came back bit-identical to its baseline)."""
    B, nq, nk, heads, hd = 2, 63, 33, 8, 128  # head_dim 16: kernel-rejected
    assert not fa._use_pallas_mh(
        jnp.zeros((B, nq, hd), jnp.float32), heads, nk)
    q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((B, nk, hd)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, nk, hd)), jnp.float32)
    want = fa._xla_attention_mh(q, k, v, heads)
    try:
        fa.set_attention_softmax_dtype("bfloat16")
        got = fa._xla_attention_mh(q, k, v, heads)
    finally:
        fa.set_attention_softmax_dtype("float32")
    diff = np.abs(np.asarray(got) - np.asarray(want))
    assert diff.max() > 0, "knob must change the XLA-path program"
    assert diff.max() < 0.05, diff.max()  # bf16-class error only


def test_fused_attention_mh_matches_bhqd_layout(rng):
    """The mh layout must compute exactly the bhqd attention, reshaped."""
    B, H, Nq, Nk, D = 2, 4, 19, 31, 32
    q = jnp.asarray(rng.standard_normal((B, Nq, H * D)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((B, Nk, H * D)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, Nk, H * D)), jnp.float32)
    got = fa.fused_attention_mh(q, k, v, H)
    qh = q.reshape(B, Nq, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Nk, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Nk, H, D).transpose(0, 2, 1, 3)
    want = fa._xla_attention(qh, kh, vh).transpose(0, 2, 1, 3).reshape(B, Nq, H * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_fused_attention_mh_gradients_match_xla(rng):
    B, H, Nq, Nk, D = 2, 4, 17, 23, 32
    q = jnp.asarray(rng.standard_normal((B, Nq, H * D)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((B, Nk, H * D)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, Nk, H * D)), jnp.float32)

    g_fused = jax.grad(
        lambda *a: jnp.sum(fa.fused_attention_mh(*a, H) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    g_xla = jax.grad(
        lambda *a: jnp.sum(fa._xla_attention_mh(*a, H) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_mh_dispatch_gating():
    """Unaligned head dims and oversized panels must fall back to XLA."""
    q = jnp.zeros((2, 16, 96))  # 96 not a lane multiple
    assert not fa._use_pallas_mh(q, 3, 16)
    q = jnp.zeros((1, 16384, 512))  # score panel too large for the budget
    assert not fa._use_pallas_mh(q, 8, 16384)


def test_backend_switch(qkv):
    q, k, v = qkv
    fa.set_attention_backend("xla")
    try:
        out = fa.fused_attention(q, k, v)
        assert out.shape == q.shape
    finally:
        fa.set_attention_backend("auto")
    assert fa.attention_backend() == "auto"


@pytest.mark.parametrize(
    "nq,nk,heads,hd",
    [(643, 1024, 8, 256), (37, 53, 4, 128), (129, 257, 2, 256)],
)
def test_pallas_mh_bwd_kernel_matches_xla_interpret(rng, nq, nk, heads, hd):
    """The in-VMEM backward kernel == the XLA einsum backward (fp32 MXU in
    interpret mode for an exact-tolerance check)."""
    from jax.experimental.pallas import tpu as pltpu

    B = 2
    q = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.float32) * 0.2
    k = jnp.asarray(rng.standard_normal((B, nk, hd)), jnp.float32) * 0.2
    v = jnp.asarray(rng.standard_normal((B, nk, hd)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, nq, hd)), jnp.float32)
    # reference: the XLA einsum path (computed directly)
    qh = fa._split_heads(q, heads)
    kh = fa._split_heads(k, heads)
    vh = fa._split_heads(v, heads)
    gh = fa._split_heads(g, heads).astype(jnp.float32)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", w, gh).reshape(v.shape)
    dw = jnp.einsum("bqhd,bkhd->bhqk", gh, vh.astype(jnp.float32))
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kh.astype(jnp.float32)).reshape(q.shape)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qh.astype(jnp.float32)).reshape(k.shape)
    with pltpu.force_tpu_interpret_mode():
        got_dq, got_dk, got_dv = fa._pallas_attention_mh_bwd(
            q, k, v, g, heads, mxu_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(dv),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dq), np.asarray(dq),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dk), np.asarray(dk),
                               rtol=1e-4, atol=1e-4)


def test_mh_bwd_dispatch_gating():
    """Backward gating is at least as strict as forward gating."""
    q = jnp.zeros((2, 16, 96))
    assert not fa._use_pallas_mh_bwd(q, 3, 16)
    q = jnp.zeros((1, 16384, 512))
    assert not fa._use_pallas_mh_bwd(q, 8, 16384)
