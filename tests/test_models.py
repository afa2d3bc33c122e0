"""Model tests: embedding golden parity, shapes, conditioning semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pcdiff.models import (
    DenoiserBackbone,
    TwoStreamDenoiser,
    build_2d_sincos_position_embedding,
    timestep_embedding,
)

from .reference_import import ref_module

ref_util = ref_module("models.util")
ref_model = ref_module("models.model")


def test_timestep_embedding_matches_reference():
    t = np.array([0, 1, 10, 500, 999.5], dtype=np.float32)
    got = np.asarray(timestep_embedding(jnp.asarray(t), 64))
    want = ref_util.timestep_embedding(torch.from_numpy(t), 64).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_timestep_embedding_odd_dim():
    t = jnp.asarray([3.0])
    out = timestep_embedding(t, 7)
    assert out.shape == (1, 7)
    assert float(out[0, -1]) == 0.0


def test_2d_sincos_matches_reference():
    got = build_2d_sincos_position_embedding(16, 16, 256)
    want = ref_model.build_2d_sincos_position_embedding(16, 16, 256).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


SMALL = dict(
    num_points=64, num_latents=16, latent_dim=32, x_dim=32, num_blocks=2,
    num_compute_layers=2, num_heads=4, num_classes=10, num_tokens_ppcd=8,
    num_tokens_depth=4, depth_image_size=64, depth_patch=16,
)


def make_model(**over):
    cfg = dict(SMALL, **over)
    return TwoStreamDenoiser(**cfg)


def make_inputs(B=2, num_points=64):
    rng = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(rng.standard_normal((B, num_points, 3)), dtype=jnp.float32),
        t=jnp.asarray([3, 77]),
        class_labels=jnp.asarray([1, 4]),
        viewpoints=jnp.asarray(rng.standard_normal((B, 3)), dtype=jnp.float32),
        partial_pcd=jnp.asarray(
            rng.standard_normal((B, 32, 3)), dtype=jnp.float32
        ),
        depth_maps=jnp.asarray(
            rng.random((B, 64, 64, 1)), dtype=jnp.float32
        ),
    )


def test_two_stream_shapes():
    model = make_model()
    inp = make_inputs()
    params = model.init(jax.random.PRNGKey(0), **inp)
    eps, latent = model.apply(params, **inp)
    assert eps.shape == (2, 64, 3)
    # latent: num_latents + (1 + 1 + 8 + 4) cond + 1 time = 16 + 14 + 1
    assert latent.shape == (2, 31, 32)


def test_self_conditioning_noop_at_init():
    """ln_latent zero-init: prev_latent must not change the output at init."""
    model = make_model()
    inp = make_inputs()
    params = model.init(jax.random.PRNGKey(0), **inp)
    eps0, latent = model.apply(params, **inp)
    eps1, _ = model.apply(params, prev_latent=latent, **inp)
    np.testing.assert_allclose(np.asarray(eps0), np.asarray(eps1), atol=1e-6)


def test_presence_mask_zeroes_condition():
    """All-zero modality input == explicitly absent (reference semantics)."""
    model = make_model()
    inp = make_inputs()
    params = model.init(jax.random.PRNGKey(0), **inp)

    zeroed = dict(inp, depth_maps=jnp.zeros_like(inp["depth_maps"]))
    none_d = dict(inp, depth_maps=None)
    eps_zero, _ = model.apply(params, **zeroed)
    eps_none, _ = model.apply(params, **none_d)
    np.testing.assert_allclose(
        np.asarray(eps_zero), np.asarray(eps_none), atol=1e-6
    )

    # presence override forces the same result even with nonzero input
    eps_force, _ = model.apply(
        params, presence={"depth": jnp.zeros((2,))}, **inp
    )
    np.testing.assert_allclose(
        np.asarray(eps_force), np.asarray(eps_none), atol=1e-6
    )


def test_cached_cond_tokens_equal_inline():
    model = make_model()
    inp = make_inputs()
    params = model.init(jax.random.PRNGKey(0), **inp)
    cond = model.apply(
        params, 2,
        class_labels=inp["class_labels"], viewpoints=inp["viewpoints"],
        partial_pcd=inp["partial_pcd"], depth_maps=inp["depth_maps"],
        method=TwoStreamDenoiser.encode_conditioning,
    )
    eps_inline, lat_inline = model.apply(params, **inp)
    eps_cached, lat_cached = model.apply(
        params, x=inp["x"], t=inp["t"], cond_tokens=cond
    )
    np.testing.assert_allclose(
        np.asarray(eps_inline), np.asarray(eps_cached), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(lat_inline), np.asarray(lat_cached), atol=1e-6
    )


def test_train_mode_cfg_dropout_changes_output():
    model = make_model(cond_drop_prob=0.5)
    inp = make_inputs()
    params = model.init(jax.random.PRNGKey(0), **inp)
    outs = []
    for seed in range(2):
        eps, _ = model.apply(
            params, train=True,
            rngs={"cond_drop": jax.random.PRNGKey(seed),
                  "dropout": jax.random.PRNGKey(100 + seed)},
            **inp,
        )
        outs.append(np.asarray(eps))
    assert not np.allclose(outs[0], outs[1])


def test_wrong_num_points_asserts():
    model = make_model()
    inp = make_inputs()
    bad = dict(inp, x=inp["x"][:, :32])
    with pytest.raises(AssertionError):
        model.init(jax.random.PRNGKey(0), **bad)


def test_backbone_latent_roundtrip_shapes():
    bb = DenoiserBackbone(
        num_x=64, num_z=16, z_dim=32, x_dim=32, num_blocks=1,
        num_compute_layers=1, num_heads=4,
    )
    x = jnp.zeros((2, 64, 3))
    t = jnp.asarray([0, 5])
    cond = jnp.zeros((2, 6, 32))
    params = bb.init(jax.random.PRNGKey(0), x, t, cond)
    out, z = bb.apply(params, x, t, cond)
    assert out.shape == (2, 64, 3)
    assert z.shape == (2, 16 + 6 + 1, 32)
    # feeding z back works
    out2, _ = bb.apply(params, x, t, cond, prev_latent=z)
    assert out2.shape == out.shape
