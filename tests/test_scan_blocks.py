"""scan_blocks compile-wall lever: lax.scan over RCW blocks must be
math-identical to the Python-unrolled path (same params, same op sequence
per block), with lossless layout converters in both directions.

Context: docs/performance.md "Round-4 compile wall" — the ~4.1k-equation
denoiser is inlined up to ~10x into sampler programs; scanning the 6
identical RCW rounds shrinks every copy ~6x. The lever only counts if it
is EXACTLY the same function, which is what this file pins.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pcdiff.models import TwoStreamDenoiser
from pcdiff.models.rin import (
    DenoiserBackbone,
    stack_rcw_block_params,
    unstack_rcw_block_params,
)

from .test_models import SMALL, make_inputs, make_model

BB = dict(
    input_channels=3, output_channels=3, num_z=8, num_x=32, z_dim=32,
    x_dim=16, num_blocks=3, num_compute_layers=2, num_heads=4,
)


def _bb_inputs(B=2):
    rng = np.random.default_rng(7)
    return (
        jnp.asarray(rng.standard_normal((B, 32, 3)), jnp.float32),
        jnp.asarray([5, 42]),
        jnp.asarray(rng.standard_normal((B, 4, 32)), jnp.float32),
    )


def test_converter_roundtrip_bitwise():
    model = DenoiserBackbone(**BB)
    params = model.init(jax.random.PRNGKey(0), *_bb_inputs())
    stacked = stack_rcw_block_params(params)
    assert "block_0" not in stacked["params"]
    leaf = jax.tree.leaves(stacked["params"]["blocks"]["block"])[0]
    assert leaf.shape[0] == BB["num_blocks"]
    back = unstack_rcw_block_params(stacked)
    assert jax.tree.structure(back) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_backbone_scan_matches_unrolled_forward():
    x, t, cond = _bb_inputs()
    unrolled = DenoiserBackbone(**BB)
    scanned = DenoiserBackbone(**BB, scan_blocks=True)
    params = unrolled.init(jax.random.PRNGKey(1), x, t, cond)
    out_u, z_u = unrolled.apply(params, x, t, cond)
    out_s, z_s = scanned.apply(stack_rcw_block_params(params), x, t, cond)
    # same op sequence per block; XLA fuses the scan body differently than
    # the unrolled graph, so agreement is fp32-rounding-tight, not bitwise
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_u),
                               rtol=1e-4, atol=1e-5)


def test_backbone_scan_init_unstacks_to_unrolled():
    """Init NATIVELY in scan layout -> unstack -> unrolled apply agrees."""
    x, t, cond = _bb_inputs()
    scanned = DenoiserBackbone(**BB, scan_blocks=True)
    unrolled = DenoiserBackbone(**BB)
    params = scanned.init(jax.random.PRNGKey(2), x, t, cond)
    out_s, _ = scanned.apply(params, x, t, cond)
    out_u, _ = unrolled.apply(unstack_rcw_block_params(params), x, t, cond)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               rtol=1e-6, atol=1e-6)


def test_backbone_scan_grad_parity():
    x, t, cond = _bb_inputs()
    unrolled = DenoiserBackbone(**BB)
    scanned = DenoiserBackbone(**BB, scan_blocks=True)
    params = unrolled.init(jax.random.PRNGKey(3), x, t, cond)

    def loss_u(p):
        out, z = unrolled.apply(p, x, t, cond)
        return jnp.sum(out ** 2) + jnp.sum(z ** 2)

    def loss_s(p):
        out, z = scanned.apply(p, x, t, cond)
        return jnp.sum(out ** 2) + jnp.sum(z ** 2)

    g_u = jax.grad(loss_u)(params)
    g_s = unstack_rcw_block_params(jax.grad(loss_s)(stack_rcw_block_params(params)))
    assert jax.tree.structure(g_s) == jax.tree.structure(g_u)
    # scale-aware: the sum-of-squares loss makes grads O(1e4); fp32
    # reassociation noise scales with the leaf, a block-order bug would not
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_u)):
        a, b = np.asarray(a), np.asarray(b)
        bound = 1e-4 * (1.0 + np.abs(b).max())
        assert np.abs(a - b).max() <= bound, (np.abs(a - b).max(), bound)


def test_two_stream_scan_matches_unrolled():
    """Full flagship module: converters reach through the backbone nesting."""
    model = make_model()
    scanned = make_model(scan_blocks=True)
    inputs = make_inputs()
    variables = model.init(jax.random.PRNGKey(4), **inputs)
    eps_u, lat_u = model.apply(variables, **inputs)
    stacked = stack_rcw_block_params(variables)
    assert "blocks" in stacked["params"]["backbone"]
    eps_s, lat_s = scanned.apply(stacked, **inputs)
    np.testing.assert_allclose(np.asarray(eps_s), np.asarray(eps_u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat_u),
                               rtol=1e-4, atol=1e-5)


def test_two_stream_scan_param_count_identical():
    model = make_model()
    scanned = make_model(scan_blocks=True)
    inputs = make_inputs()
    n_u = sum(x.size for x in jax.tree.leaves(model.init(jax.random.PRNGKey(5), **inputs)))
    n_s = sum(x.size for x in jax.tree.leaves(scanned.init(jax.random.PRNGKey(5), **inputs)))
    assert n_u == n_s


def test_scan_blocks_shrinks_jaxpr():
    """The point of the lever: strictly fewer unique equations to compile."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from compile_wall import _count_eqns

    x, t, cond = _bb_inputs()
    unrolled = DenoiserBackbone(**BB)
    scanned = DenoiserBackbone(**BB, scan_blocks=True)
    params = unrolled.init(jax.random.PRNGKey(6), x, t, cond)
    stacked = stack_rcw_block_params(params)
    n_u = _count_eqns(jax.make_jaxpr(lambda p: unrolled.apply(p, x, t, cond))(params))
    n_s = _count_eqns(jax.make_jaxpr(lambda p: scanned.apply(p, x, t, cond))(stacked))
    # 3 identical blocks collapse to ~1 scanned body + glue
    assert n_s < 0.6 * n_u, (n_s, n_u)


def test_scan_blocks_composes_with_sharded_attention():
    """scan_blocks + x-stream sequence parallelism: shard_map attention fns
    inside the nn.scan body must reproduce the dense unrolled backbone."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from pcdiff.parallel import make_mesh
    from pcdiff.parallel.xsp import sharded_read_attention, sharded_write_attention

    mesh = make_mesh(data_parallel=1, model_parallel=8)
    base = dict(num_x=64, num_z=8, z_dim=32, x_dim=32, num_blocks=2,
                num_compute_layers=1, num_heads=4)
    dense = DenoiserBackbone(**base)
    sharded_scan = DenoiserBackbone(
        **base, scan_blocks=True,
        read_attention_fn=partial(sharded_read_attention, mesh=mesh),
        write_attention_fn=partial(sharded_write_attention, mesh=mesh),
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    t = jnp.asarray([3, 70])
    cond = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    params = dense.init(jax.random.PRNGKey(0), x, t, cond)
    out_d, z_d = dense.apply(params, x, t, cond)
    x_sh = jax.device_put(x, NamedSharding(mesh, P(None, "model", None)))
    out_s, z_s = jax.jit(lambda p, x, t, c: sharded_scan.apply(p, x, t, c))(
        stack_rcw_block_params(params), x_sh, t, cond)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_d),
                               rtol=1e-4, atol=1e-5)
