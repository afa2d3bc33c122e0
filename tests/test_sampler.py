"""PointCloudSampler tests: end-to-end sampling with the real (small) model,
CFG caching equivalence, multi-stage plumbing, output conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.data import synthetic_batch
from pcdiff.diffusion import diffusion_from_betas
from pcdiff.diffusion.sampler import PointCloudSampler
from pcdiff.geometry import PointCloud
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
        clip_denoised=True, use_karras=[True], karras_steps=[4],
        sigma_min=[1e-3], sigma_max=[120.0], s_churn=[0.0],
    )
    cfg.update(over)
    return PointCloudSampler(**cfg)


def test_karras_cfg_sampling(bound_model):
    bound, kwargs = bound_model
    sampler = make_sampler(bound)
    out = sampler.sample_batch(B, kwargs, jax.random.PRNGKey(0))
    assert out.shape == (B, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_unguided_sampling(bound_model):
    bound, kwargs = bound_model
    sampler = make_sampler(bound, guidance_scale=[0.0])
    out = sampler.sample_batch(B, kwargs, jax.random.PRNGKey(0))
    assert out.shape == (B, 32, 3)


def test_ancestral_sampling(bound_model):
    bound, kwargs = bound_model
    sampler = make_sampler(bound, use_karras=[False], guidance_scale=[3.0])
    out = sampler.sample_batch(B, kwargs, jax.random.PRNGKey(0))
    assert out.shape == (B, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_cached_cfg_kwargs_equal_naive(bound_model):
    """The cond-token fast path must equal raw per-step encoding."""
    bound, kwargs = bound_model

    class NaiveModel:
        """No cond-token caching: raw modality inputs are zero-duplicated and
        the encoders run inside every denoiser forward (the reference's
        behavior), with explicit per-row presence marking the uncond half.
        (Batch-level presence inference cannot see that the uncond rows of a
        fused 2B batch are absent — exactly why presence is an explicit input
        in this framework.)"""

        def __call__(self, x, t, **kw):
            return bound(x, t, **kw)

        def init_latent(self, n):
            return bound.init_latent(n)

        def cfg_model_kwargs(self, n, kwargs):
            out = {
                k: jnp.concatenate([v, jnp.zeros_like(v)], axis=0)
                for k, v in kwargs.items()
            }
            out["presence"] = {
                m: jnp.concatenate([jnp.ones((n,)), jnp.zeros((n,))])
                for m in ("class", "view", "partial_pcd", "depth")
            }
            return out

    fast = make_sampler(bound)
    naive = make_sampler(NaiveModel())
    out_fast = fast.sample_batch(B, kwargs, jax.random.PRNGKey(7))
    out_naive = naive.sample_batch(B, kwargs, jax.random.PRNGKey(7))
    # tolerance: the two paths compile to differently-fused programs; a few
    # ODE steps through clipping amplify ~1e-7 fusion noise to ~1e-4
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_naive), rtol=1e-3, atol=5e-4
    )


def test_multi_stage_base_plus_upsampler():
    """The Point-E two-stage path: base model then low_res-conditioned
    upsampler, outputs concatenated along the point axis."""
    from pcdiff.models.point_e import (
        PointDiffusionTransformer,
        UpsamplePointDiffusionTransformer,
    )

    base = PointDiffusionTransformer(
        n_ctx=16, width=32, layers=1, heads=2, time_token_cond=True
    )
    upsampler = UpsamplePointDiffusionTransformer(
        n_ctx=16, cond_ctx=16, width=32, layers=1, heads=2,
        time_token_cond=True,
    )
    key = jax.random.PRNGKey(0)
    base_params = base.init(key, jnp.zeros((B, 16, 3)), jnp.zeros((B,), jnp.int32))
    up_params = upsampler.init(
        key, jnp.zeros((B, 16, 3)), jnp.zeros((B,), jnp.int32),
        low_res=jnp.zeros((B, 16, 3)),
    )

    def base_fn(x, t, **kw):
        return base.apply(base_params, x, t)

    def up_fn(x, t, low_res=None, **kw):
        return upsampler.apply(up_params, x, t, low_res=low_res)

    sampler = PointCloudSampler(
        models=[base_fn, up_fn],
        diffusions=[diffusion_from_betas("linear", 50)] * 2,
        num_points=[16, 16], aux_channels=[], guidance_scale=[0.0],
        clip_denoised=True, use_karras=[True], karras_steps=[2],
        sigma_min=[1e-3], sigma_max=[120.0], s_churn=[0.0],
    )
    outs = list(sampler.sample_batch_progressive(B, {}, jax.random.PRNGKey(0)))
    assert outs[0].shape == (B, 16, 3)
    assert outs[1].shape == (B, 32, 3)  # low_res ++ stage-2 points
    np.testing.assert_allclose(
        np.asarray(outs[1][:, :16]), np.asarray(outs[0]), atol=1e-6
    )


def test_output_to_point_clouds(bound_model):
    bound, _ = bound_model
    sampler = make_sampler(bound, aux_channels=["R", "G", "B"])
    fake = jnp.concatenate(
        [jnp.zeros((2, 32, 3)), jnp.full((2, 32, 3), 128.0)], axis=-1
    )
    pcs = sampler.output_to_point_clouds(fake)
    assert len(pcs) == 2 and isinstance(pcs[0], PointCloud)
    assert set(pcs[0].channels) == {"R", "G", "B"}
    np.testing.assert_allclose(pcs[0].channels["R"], 128 / 255.0, rtol=1e-6)
