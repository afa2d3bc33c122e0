"""Segmented precompiled guidance-interval sampler: parity vs the
monolithic jitted program, key-threading, and the validation surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.data import synthetic_batch
from pcdiff.diffusion import diffusion_from_betas
from pcdiff.diffusion.precompile import precompile_segmented_sampler
from pcdiff.diffusion.sampler import PointCloudSampler
from pcdiff.models import TwoStreamDenoiser
from pcdiff.models.wrapper import BoundTwoStream

SMALL = dict(
    num_points=32, num_latents=8, latent_dim=16, x_dim=16, num_blocks=1,
    num_compute_layers=1, num_heads=2, num_classes=10, num_tokens_ppcd=4,
    num_tokens_depth=2, depth_image_size=32, depth_patch=16,
)
B = 2


@pytest.fixture(scope="module")
def bound_model():
    model = TwoStreamDenoiser(**SMALL)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, batch_size=B, num_points=32, num_partial=16,
                            depth_size=32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["target"]),
        jnp.zeros((B,), jnp.int32),
        class_labels=jnp.asarray(batch["class_labels"]),
        viewpoints=jnp.asarray(batch["viewpoints"]),
        partial_pcd=jnp.asarray(batch["partial_pcd"]),
        depth_maps=jnp.asarray(batch["depth_maps"]),
    )
    kwargs = {
        "class_labels": jnp.asarray(batch["class_labels"]),
        "viewpoints": jnp.asarray(batch["viewpoints"]),
        "partial_pcd": jnp.asarray(batch["partial_pcd"]),
        "depth_maps": jnp.asarray(batch["depth_maps"]),
    }
    return BoundTwoStream(model, params), kwargs


def make_sampler(bound, **over):
    cfg = dict(
        models=[bound], diffusions=[diffusion_from_betas("linear", 50)],
        num_points=[32], aux_channels=[], guidance_scale=[3.0],
        clip_denoised=True, use_karras=[True], karras_steps=[8],
        sigma_min=[1e-3], sigma_max=[120.0], s_churn=[0.0],
        guidance_interval=(0.1, 10.0),
    )
    cfg.update(over)
    return PointCloudSampler(**cfg)


@pytest.mark.parametrize("solver", ["heun", "heun_reuse"])
def test_segmented_matches_monolithic(bound_model, solver):
    """The concurrently-compiled per-segment pipeline must reproduce the
    monolithic jitted sample_batch trajectory (same ops, same key-split
    order; only XLA program boundaries differ)."""
    bound, kwargs = bound_model
    sampler = make_sampler(bound, sampler=solver)
    key = jax.random.PRNGKey(42)

    mono = jax.jit(lambda kw, k: sampler.sample_batch(B, kw, k))(kwargs, key)

    seg = precompile_segmented_sampler(sampler, B, kwargs)
    assert len(seg.compile_seconds) == 1 + 3  # setup + off/on/off segments
    out = seg(kwargs, key)

    # identical op sequence and key order; only XLA program boundaries
    # (and thus fusion choices) differ — observed worst case ~1.7e-5 for
    # heun_reuse on CPU f32
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mono), rtol=1e-4, atol=5e-5
    )


def test_segmented_is_reusable_across_keys(bound_model):
    """The AOT executables are key/input-agnostic: a second call with a new
    key runs without retracing and produces a different trajectory."""
    bound, kwargs = bound_model
    sampler = make_sampler(bound, sampler="heun")
    seg = precompile_segmented_sampler(sampler, B, kwargs)
    a = seg(kwargs, jax.random.PRNGKey(0))
    b = seg(kwargs, jax.random.PRNGKey(1))
    assert a.shape == b.shape == (B, 32, 3)
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_segmented_validation_surface(bound_model):
    bound, kwargs = bound_model
    with pytest.raises(ValueError):
        precompile_segmented_sampler(
            make_sampler(bound, guidance_interval=None), B, kwargs
        )
    with pytest.raises(NotImplementedError):
        precompile_segmented_sampler(
            make_sampler(bound, sampler="dpm"), B, kwargs
        )
    with pytest.raises(NotImplementedError):
        precompile_segmented_sampler(
            make_sampler(bound, s_churn=[1.0], sampler="heun"), B, kwargs
        )
