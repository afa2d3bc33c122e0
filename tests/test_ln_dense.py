"""Fused LN+Dense kernel and module-graph fusion tests (CPU).

The Pallas kernel runs in interpret mode; the module-level fusion flag is
exercised with the XLA fallback, which is the same math. The load-bearing
property: the fused graph and the plain pre-LN graph share ONE param tree
(identical paths/shapes) and agree numerically, so weight-ported
checkpoints behave identically under either dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.models import attention as attn_mod
from pcdiff.ops import ln_dense as ld


@pytest.fixture
def fusion_on():
    attn_mod.set_ln_dense_fusion("on")
    yield
    attn_mod.set_ln_dense_fusion("auto")


def _ln_ref(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mean * mean, 0.0)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _mk(rng, b, n, c, fs, biases=(True, True, True)):
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    ks = tuple(jnp.asarray(rng.standard_normal((c, f)), jnp.float32) * 0.1
               for f in fs)
    bs = tuple(
        jnp.asarray(rng.standard_normal((f,)), jnp.float32) if use else None
        for f, use in zip(fs, biases))
    return x, scale, bias, ks, bs


def test_pallas_ln_denses_matches_xla_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    # n=70: not a sublane multiple — exercises the ragged-N masking
    b, n, c = 3, 70, 128
    fs = (256, 128, 128)
    acts = ("gelu", None, None)
    x, scale, bias, ks, bs = _mk(rng, b, n, c, fs, biases=(True, False, True))
    want = ld._xla_ln_denses(x, scale, bias, ks, bs, 1e-5, jnp.float32, acts)
    with pltpu.force_tpu_interpret_mode():
        got = ld._pallas_ln_denses(x, scale, bias, ks, bs, 1e-5, jnp.float32,
                                   acts)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_fused_ln_denses_grads_match_composition(rng):
    b, n, c = 2, 11, 64
    fs = (96, 64)
    acts = ("gelu", None)
    x, scale, bias, ks, bs = _mk(rng, b, n, c, fs, biases=(True, True))

    def loss_fused(x, s, b_, ks, bs):
        outs = ld.fused_ln_denses(x, s, b_, ks, bs, 1e-5, jnp.float32, acts)
        return sum(jnp.sum(o ** 2) for o in outs)

    def loss_ref(x, s, b_, ks, bs):
        y = _ln_ref(x, s, b_, 1e-5)
        tot = 0.0
        h = y @ ks[0] + bs[0]
        tot += jnp.sum(jax.nn.gelu(h, approximate=False) ** 2)
        tot += jnp.sum((y @ ks[1] + bs[1]) ** 2)
        return tot

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, scale, bias, ks, bs)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, scale, bias, ks, bs)
    for a, b_ in zip(jax.tree_util.tree_leaves(got),
                     jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("block_name", ["compute", "read", "write"])
def test_rin_block_fusion_graph_parity(rng, block_name, fusion_on):
    """Same params, fused vs plain graph: identical trees, equal outputs."""
    from pcdiff.models.rin import ComputeBlock, ReadBlock, WriteBlock

    B, Nz, Nx, C = 2, 13, 29, 64
    z = jnp.asarray(rng.standard_normal((B, Nz, C)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, Nx, C)), jnp.float32)
    if block_name == "compute":
        mod = ComputeBlock(C, num_heads=4, qkv_bias=True, name=None)
        args = (z,)
    elif block_name == "read":
        mod = ReadBlock(C, num_heads=4, qkv_bias=True)
        args = (z, x)
    else:
        mod = WriteBlock(C, num_heads=4, qkv_bias=True)
        args = (z, x)

    variables = mod.init(jax.random.PRNGKey(0), *args)
    out_fused = mod.apply(variables, *args)

    attn_mod.set_ln_dense_fusion("off")
    variables_plain = mod.init(jax.random.PRNGKey(0), *args)
    out_plain = mod.apply(variables, *args)

    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(variables_plain)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables),
        jax.tree_util.tree_leaves_with_path(variables_plain),
    ):
        assert pa == pb and a.shape == b.shape and a.dtype == b.dtype
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_plain),
                               rtol=2e-5, atol=2e-5)


def test_backbone_fusion_parity_and_grads(rng, fusion_on):
    """Full DenoiserBackbone: fused graph == plain graph on the same params,
    forward AND a training-style gradient."""
    from pcdiff.models.rin import DenoiserBackbone

    kw = dict(num_z=8, num_x=32, z_dim=64, x_dim=64, num_blocks=2,
              num_compute_layers=1, num_heads=4)
    B = 2
    x = jnp.asarray(rng.standard_normal((B, 32, 3)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    cond = jnp.asarray(rng.standard_normal((B, 5, 64)), jnp.float32)

    model = DenoiserBackbone(**kw)
    variables = model.init(jax.random.PRNGKey(1), x, t, cond)

    def loss(v, model):
        out, zlat = model.apply(v, x, t, cond)
        return jnp.sum(out ** 2) + jnp.sum(zlat ** 2)

    out_f, z_f = model.apply(variables, x, t, cond)
    g_f = jax.grad(loss)(variables, model)

    attn_mod.set_ln_dense_fusion("off")
    out_p, z_p = model.apply(variables, x, t, cond)
    g_p = jax.grad(loss)(variables, model)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_p),
                               rtol=2e-5, atol=2e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_f),
        jax.tree_util.tree_leaves_with_path(g_p),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-5,
            err_msg=str(pa),
        )


def test_use_ln_dense_alignment_gate():
    assert not ld.use_ln_dense(64, 130, [256], jnp.float32)  # c not aligned
    assert not ld.use_ln_dense(64, 256, [130], jnp.float32)  # f not aligned
    assert not ld.use_ln_dense(64, 256, [256], jnp.float16)  # bad dtype


def test_point_e_block_fusion_graph_parity(rng, fusion_on):
    """Point-E ResidualAttentionBlock: fused graph == plain graph on one
    param tree (incl. the per-head qkv de-interleave), forward and grads."""
    from pcdiff.models.point_e import ResidualAttentionBlock

    B, N, W, H = 2, 17, 64, 4
    x = jnp.asarray(rng.standard_normal((B, N, W)), jnp.float32)
    mod = ResidualAttentionBlock(W, H, init_scale=0.5)
    variables = mod.init(jax.random.PRNGKey(0), x)

    def loss(v):
        return jnp.sum(mod.apply(v, x) ** 2)

    out_f = mod.apply(variables, x)
    g_f = jax.grad(loss)(variables)

    attn_mod.set_ln_dense_fusion("off")
    variables_plain = mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(variables_plain)
    out_p = mod.apply(variables, x)
    g_p = jax.grad(loss)(variables)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_f),
        jax.tree_util.tree_leaves_with_path(g_p),
    ):
        a, b = np.asarray(a), np.asarray(b)
        # leaf-scaled atol: the K-bias grad is analytically ~0 (softmax is
        # shift-invariant per query), so both graphs produce cancellation
        # noise there — compare against the leaf's magnitude, not zero
        atol = 2e-4 * max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=atol,
                                   err_msg=str(pa))


@pytest.mark.parametrize("layer", ["encoder", "decoder"])
def test_encoder_decoder_layer_fusion_graph_parity(rng, layer, fusion_on):
    """Conditioning encoder/decoder layers: fused == plain on one tree
    (decoder cross-attention keeps memory un-normalized by design)."""
    from pcdiff.models.attention import DecoderLayer, EncoderLayer

    B, N, M, C = 2, 19, 11, 64
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((B, M, C)), jnp.float32)
    if layer == "encoder":
        mod = EncoderLayer(C, num_heads=4, drop=0.0)
        args = (x,)
    else:
        mod = DecoderLayer(C, num_heads=4, drop=0.0)
        args = (x, mem)

    variables = mod.init(jax.random.PRNGKey(0), *args)
    out_f = mod.apply(variables, *args)

    attn_mod.set_ln_dense_fusion("off")
    variables_plain = mod.init(jax.random.PRNGKey(0), *args)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(variables_plain)
    out_p = mod.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)


def test_perceiver_block_fusion_graph_parity(rng, fusion_on):
    """SimplePerceiver cross-attention block: fused == plain on one tree
    (c_kv per-head (k, v) de-interleave, s^2 query-scale fold)."""
    from pcdiff.models.perceiver import ResidualCrossAttentionBlock

    B, Nq, Nd, W, H = 2, 9, 23, 64, 4
    x = jnp.asarray(rng.standard_normal((B, Nq, W)), jnp.float32)
    data = jnp.asarray(rng.standard_normal((B, Nd, W)), jnp.float32)
    mod = ResidualCrossAttentionBlock(W, H, init_scale=0.5)
    variables = mod.init(jax.random.PRNGKey(0), x, data)
    out_f = mod.apply(variables, x, data)

    attn_mod.set_ln_dense_fusion("off")
    variables_plain = mod.init(jax.random.PRNGKey(0), x, data)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(variables_plain)
    out_p = mod.apply(variables, x, data)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_clip_block_fusion_graph_parity(rng, masked, fusion_on):
    """CLIP block (quick_gelu MLP, contiguous-thirds in_proj): fused ==
    plain on one tree, with and without the text-tower causal mask."""
    from pcdiff.models.clip import _CLIPBlock

    B, N, W, H = 2, 12, 64, 4
    x = jnp.asarray(rng.standard_normal((B, N, W)), jnp.float32)
    mask = None
    if masked:
        mask = jnp.triu(jnp.full((N, N), -jnp.inf), k=1)[None, None]
    mod = _CLIPBlock(W, H)
    variables = mod.init(jax.random.PRNGKey(0), x, mask)
    out_f = mod.apply(variables, x, mask)

    attn_mod.set_ln_dense_fusion("off")
    variables_plain = mod.init(jax.random.PRNGKey(0), x, mask)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(variables_plain)
    out_p = mod.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)


def test_quick_gelu_act_matches_reference(rng):
    from pcdiff.models.clip import quick_gelu

    x = jnp.asarray(rng.standard_normal((64,)) * 20, jnp.float32)
    got = ld._apply_act(x, "quick_gelu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(quick_gelu(x)),
                               rtol=1e-6, atol=1e-7)


def test_gelu_tanh_act_matches_jax_tanh_gelu(rng):
    """The sigmoid rewrite 'x*sigmoid(2u)' is mathematically identical to
    jax.nn.gelu(approximate=True)'s '0.5x(1+tanh(u))'; check both the
    forward and the hand-derived gradient, plus saturation at |x|>>1."""
    x = jnp.asarray(
        np.concatenate([rng.standard_normal(256) * 4, [-40.0, 40.0, 0.0]]),
        jnp.float32)
    got = ld._apply_act(x, "gelu_tanh")
    want = jax.nn.gelu(x, approximate=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # |gelu_tanh - exact erf gelu| <= ~1.5e-3 abs (kernel-comment claim)
    exact = jax.nn.gelu(x, approximate=False)
    assert float(jnp.max(jnp.abs(want - exact))) < 1.6e-3

    g_got = ld._act_grad(x, "gelu_tanh")
    g_want = jax.vmap(jax.grad(lambda z: jax.nn.gelu(z, approximate=True)))(x)
    assert np.isfinite(np.asarray(g_got)).all()
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-5, atol=1e-5)
    # the exp-argument clamp keeps AUTODIFF through the sigmoid form
    # finite in the saturated tails (unclamped: exp overflow -> inf*0=NaN
    # at x < ~-11 for gelu_tanh, < ~-52 for quick_gelu)
    for act in ("gelu_tanh", "quick_gelu"):
        g_auto = jax.vmap(jax.grad(lambda z: ld._apply_act(z, act)))(x)
        assert np.isfinite(np.asarray(g_auto)).all(), act
    np.testing.assert_allclose(
        np.asarray(jax.vmap(jax.grad(lambda z: ld._apply_act(z, "gelu_tanh")))(x)),
        np.asarray(g_want), rtol=1e-5, atol=1e-5)


def test_pallas_ln_denses_gelu_tanh_fwd_bwd(rng):
    """gelu_tanh epilogue through the Pallas forward AND fused backward
    (interpret) == autodiff through the XLA composition."""
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = 2, 24, 128
    fs = (256,)
    acts = ("gelu_tanh",)
    x, scale, bias, ks, bs = _mk(rng, b, n, c, fs, biases=(True,))
    want = ld._xla_ln_denses(x, scale, bias, ks, bs, 1e-5, jnp.float32, acts)
    with pltpu.force_tpu_interpret_mode():
        got = ld._pallas_ln_denses(x, scale, bias, ks, bs, 1e-5, jnp.float32,
                                   acts)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)

    g = [jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32) for f in fs]

    def ref(x_, s_, b_, ks_, bs_):
        return ld._xla_ln_denses(x_, s_, b_, ks_, bs_, 1e-5, jnp.float32,
                                 acts)

    _, vjp = jax.vjp(ref, x, scale, bias, ks, bs)
    want_g = vjp(list(g))
    with pltpu.force_tpu_interpret_mode():
        got_g = ld._pallas_ln_denses_bwd(x, scale, bias, ks, bs, g, 1e-5,
                                         jnp.float32, acts)
    for a, w in zip(jax.tree_util.tree_leaves(got_g),
                    jax.tree_util.tree_leaves(want_g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-4,
            atol=2e-4 * max(1.0, float(np.abs(np.asarray(w)).max())))


def test_gelu_impl_knob_graph_parity(rng, fusion_on):
    """set_gelu_impl('tanh'): fused and unfused Mlp graphs share the param
    tree and agree with each other; vs the erf default the output moves by
    at most the documented 1.5e-3 activation error (propagated)."""
    from pcdiff.models.attention import Mlp, set_gelu_impl

    B, N, C = 2, 17, 64
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ln_scale = jnp.ones((C,), jnp.float32)
    ln_bias = jnp.zeros((C,), jnp.float32)
    mod = Mlp(hidden_dim=4 * C, drop=0.0)
    variables = mod.init(jax.random.PRNGKey(0), x, ln=(ln_scale, ln_bias, 1e-5))
    out_erf = mod.apply(variables, x, ln=(ln_scale, ln_bias, 1e-5))
    try:
        set_gelu_impl("tanh")
        out_f = mod.apply(variables, x, ln=(ln_scale, ln_bias, 1e-5))
        attn_mod.set_ln_dense_fusion("off")
        # unfused path needs the normalization applied by the caller
        out_p = mod.apply(variables, _ln_ref(x, ln_scale, ln_bias, 1e-5))
    finally:
        set_gelu_impl("erf")
        attn_mod.set_ln_dense_fusion("on")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-5, atol=2e-5)
    # tanh vs erf: small but nonzero drift
    d = float(jnp.max(jnp.abs(out_f - out_erf)))
    assert 0 < d < 0.05, d


def test_pallas_ln_denses_bwd_matches_autodiff(rng):
    """Fused Pallas backward (interpret) == autodiff through the XLA
    composition: dx, dscale, dbias, per-output dW/db, with activation
    epilogues, a biasless output, and ragged N."""
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = 3, 70, 128
    fs = (256, 128, 128)
    acts = ("gelu", None, "quick_gelu")
    x, scale, bias, ks, bs = _mk(rng, b, n, c, fs, biases=(True, False, True))
    g = [jnp.asarray(rng.standard_normal((b, n, f)), jnp.float32) for f in fs]

    def ref(x_, s_, b_, ks_, bs_):
        return ld._xla_ln_denses(x_, s_, b_, ks_, bs_, 1e-5, jnp.float32,
                                 acts)

    _, vjp = jax.vjp(ref, x, scale, bias, ks, bs)
    want = vjp(list(g))

    with pltpu.force_tpu_interpret_mode():
        got = ld._pallas_ln_denses_bwd(x, scale, bias, ks, bs, g, 1e-5,
                                       jnp.float32, acts)
    names = ["dx", "dscale", "dbias", "dW", "db"]
    for name, a, w in zip(names, got, want):
        for al, wl in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(w)):
            np.testing.assert_allclose(
                np.asarray(al), np.asarray(wl), rtol=2e-4,
                atol=2e-4 * max(1.0, float(np.abs(np.asarray(wl)).max())),
                err_msg=name)


def test_lndense_bwd_dispatch_through_custom_vjp(rng):
    """backend='pallas' routes the custom VJP through the fused backward
    (interpret mode) and matches the default XLA recompute path."""
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = 2, 16, 128
    fs = (128,)
    acts = ("gelu",)
    x, scale, bias, ks, bs = _mk(rng, b, n, c, fs, biases=(True,))

    def loss(x, s, b_, ks, bs):
        outs = ld.fused_ln_denses(x, s, b_, ks, bs, 1e-5, jnp.float32, acts)
        return sum(jnp.sum(o ** 2) for o in outs)

    want = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, scale, bias, ks, bs)
    try:
        ld.set_lndense_backend("pallas")
        ld.set_lndense_bwd_backend("pallas")
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                x, scale, bias, ks, bs)
    finally:
        ld.set_lndense_backend("auto")
        ld.set_lndense_bwd_backend("xla")
    for a, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), rtol=2e-4,
            atol=2e-4 * max(1.0, float(np.abs(np.asarray(w)).max())))
