"""Guidance-interval CFG (arXiv:2404.07724): the unconditional branch runs
only while sigma is inside [lo, hi]; outside, cond-only segments at half the
batch. Pins: full-interval == plain solver bit-tight, empty-interval ==
cond-only bit-tight, per-segment denoiser-call accounting, state threading
(uncond rows untouched outside the interval), and the end-to-end
karras_sample / PointCloudSampler surfaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.diffusion import diffusion_from_betas
from pcdiff.diffusion.karras import (
    get_sigmas_karras,
    half_model_kwargs,
    karras_sample,
    sample_guided_interval,
    sample_heun,
    sample_heun_reuse,
)

B = 3
SHAPE = (B, 5, 2)
_SOLVERS = {"heun": sample_heun, "heun_reuse": sample_heun_reuse}


def _fns():
    """Toy denoisers whose state counts calls: cond rows [:B] on every
    call, uncond rows [B:] only on CFG calls."""

    def denoise_cfg(x, s, st):  # st: [2B]
        return 0.5 * x, st + 1.0

    def denoise_cond(x, s, st):  # st: [B] (sliced by the segment wrapper)
        return 0.5 * x, st + 1.0

    return denoise_cfg, denoise_cond


def _tree_equal(a, b):
    return all(
        jnp.array_equal(x, y)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


@pytest.mark.parametrize("sampler", ["heun", "heun_reuse"])
def test_full_interval_is_plain_solver(sampler):
    sigmas = get_sigmas_karras(8, 1e-3, 120.0)
    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    cfg, cond = _fns()
    state0 = jnp.zeros((2 * B,))
    plain = _SOLVERS[sampler](
        cfg, x_T, sigmas, jax.random.split(key)[1], state=state0
    )
    gi = sample_guided_interval(
        cond, cfg, x_T, sigmas, key, state=state0,
        guidance_interval=(0.0, float("inf")), sampler=sampler, cond_batch=B,
    )
    assert _tree_equal(plain, gi)


@pytest.mark.parametrize("sampler", ["heun", "heun_reuse"])
def test_empty_interval_is_cond_only(sampler):
    """Interval matching no sigma: one cond-only segment, bit-identical x to
    the plain solver (toy denoisers agree), uncond state rows untouched."""
    sigmas = get_sigmas_karras(8, 1e-3, 120.0)
    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    cfg, cond = _fns()
    state0 = jnp.zeros((2 * B,))
    plain = _SOLVERS[sampler](
        cfg, x_T, sigmas, jax.random.split(key)[1], state=state0
    )
    gi = sample_guided_interval(
        cond, cfg, x_T, sigmas, key, state=state0,
        guidance_interval=(-2.0, -1.0), sampler=sampler, cond_batch=B,
    )
    assert jnp.array_equal(plain["x"], gi["x"])
    assert jnp.array_equal(gi["state"][B:], jnp.zeros((B,)))  # never called
    assert jnp.array_equal(gi["state"][:B], plain["state"][:B])


@pytest.mark.parametrize(
    "sampler,cond_calls,uncond_calls",
    [
        # 8-step grid split [0,2) cond / [2,6) cfg / [6,8) cond+final:
        # heun: 2m per non-final segment, 2(m-1)+1 for the final
        ("heun", 4 + 8 + 3, 8),
        # heun_reuse: m+1 per segment (full-Heun restart at each segment
        # boundary breaks the reuse chain; the final segment's +1 is the
        # fresh-call Euler to 0)
        ("heun_reuse", 3 + 5 + 3, 5),
    ],
)
def test_mid_interval_call_accounting(sampler, cond_calls, uncond_calls):
    sigmas = get_sigmas_karras(8, 1e-3, 120.0)
    lo, hi = float(sigmas[5]), float(sigmas[2])
    assert [bool(lo <= s <= hi) for s in sigmas[:8]] == [
        False, False, True, True, True, True, False, False,
    ]
    cfg, cond = _fns()
    x_T = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    gi = sample_guided_interval(
        cond, cfg, x_T, sigmas, jax.random.PRNGKey(1),
        state=jnp.zeros((2 * B,)), guidance_interval=(lo, hi),
        sampler=sampler, cond_batch=B,
    )
    assert gi["state"][:B].tolist() == [cond_calls] * B
    assert gi["state"][B:].tolist() == [uncond_calls] * B
    assert np.isfinite(np.asarray(gi["x"])).all()


@pytest.mark.parametrize("sampler", ["heun", "heun_reuse"])
def test_mid_interval_progressive_trajectory(sampler):
    """Per-step yields on the segmented solver (VERDICT r3 #9): n trajectory
    entries across segments, last entry == final x, anchor sigmas == grid,
    and progressive does not perturb the sample (same RNG splits)."""
    steps = 8
    sigmas = get_sigmas_karras(steps, 1e-3, 120.0)
    lo, hi = float(sigmas[5]), float(sigmas[2])
    cfg, cond = _fns()
    x_T = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    common = dict(
        state=jnp.zeros((2 * B,)), guidance_interval=(lo, hi),
        sampler=sampler, cond_batch=B,
    )
    plain = sample_guided_interval(
        cond, cfg, x_T, sigmas, jax.random.PRNGKey(1), **common
    )
    gi = sample_guided_interval(
        cond, cfg, x_T, sigmas, jax.random.PRNGKey(1), progressive=True,
        **common
    )
    traj = gi["trajectory"]
    assert traj["x"].shape == (steps,) + SHAPE
    assert traj["pred_xstart"].shape == (steps,) + SHAPE
    np.testing.assert_array_equal(
        np.asarray(traj["sigma"]), sigmas[:steps].astype(np.float32)
    )
    assert jnp.array_equal(traj["x"][-1], gi["x"])
    assert jnp.array_equal(plain["x"], gi["x"])
    assert jnp.array_equal(plain["state"], gi["state"])


def test_full_interval_progressive_matches_plain_heun_trajectory():
    """Covering interval == one cfg segment: the whole progressive
    trajectory must be bit-identical to the plain solver's."""
    sigmas = get_sigmas_karras(6, 1e-3, 120.0)
    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    cfg, cond = _fns()
    state0 = jnp.zeros((2 * B,))
    plain = sample_heun(
        cfg, x_T, sigmas, jax.random.split(key)[1], state=state0,
        progressive=True,
    )
    gi = sample_guided_interval(
        cond, cfg, x_T, sigmas, key, state=state0,
        guidance_interval=(0.0, float("inf")), sampler="heun", cond_batch=B,
        progressive=True,
    )
    assert _tree_equal(plain["trajectory"], gi["trajectory"])


def test_karras_sample_interval_progressive_end_to_end():
    """The karras_sample surface: progressive under guidance_interval yields
    an unscaled n-entry trajectory whose last x equals the sample."""
    diff = diffusion_from_betas("linear", 100)

    def model(x, t, cond=None, prev_latent=None):
        eps = 0.05 * x + 0.01 * cond[:, :, None]
        return eps, prev_latent + 1.0

    kw = {"cond": jnp.concatenate([jnp.ones((B, 1)), jnp.zeros((B, 1))])}
    common = dict(
        shape=SHAPE, steps=6, key=jax.random.PRNGKey(3), sigma_min=1e-3,
        sigma_max=120.0, model_kwargs=kw, guidance_scale=3.0,
        init_state=jnp.zeros((2 * B, 4)), sampler="heun_reuse",
        guidance_interval=(0.1, 10.0),
    )
    plain = karras_sample(diff, model, **common)
    prog = karras_sample(diff, model, progressive=True, **common)
    traj = prog["trajectory"]
    assert traj["x"].shape == (6,) + SHAPE
    assert jnp.array_equal(traj["x"][-1], prog["x"])  # both unscaled
    assert jnp.array_equal(plain["x"], prog["x"])


def test_half_model_kwargs_slices_only_doubled_leaves():
    kw = {
        "a": jnp.arange(2 * B)[:, None],
        "b": jnp.ones((B, 4)),
        "c": 7,
    }
    half = half_model_kwargs(kw, B)
    assert half["a"].shape == (B, 1) and half["a"][0, 0] == 0
    assert half["b"].shape == (B, 4)
    assert half["c"] == 7


@pytest.mark.parametrize("sampler", ["heun", "heun_reuse"])
def test_karras_sample_interval_matches_plain_when_covering(sampler):
    """End-to-end through karras_sample with a self-conditioning toy model:
    guidance_interval covering every sigma reproduces the plain guided path
    bit-tight (s_churn=0 => churn noise is exactly zero)."""
    diff = diffusion_from_betas("linear", 100)

    def model(x, t, cond=None, prev_latent=None):
        eps = 0.05 * x + 0.01 * cond[:, :, None]
        return eps, prev_latent + 1.0

    kw = {"cond": jnp.concatenate([jnp.ones((B, 1)), jnp.zeros((B, 1))])}
    init = jnp.zeros((2 * B, 4))
    common = dict(
        shape=SHAPE, steps=6, key=jax.random.PRNGKey(3), sigma_min=1e-3,
        sigma_max=120.0, model_kwargs=kw, guidance_scale=3.0,
        init_state=init, sampler=sampler,
    )
    plain = karras_sample(diff, model, **common)
    gi = karras_sample(diff, model, guidance_interval=(0.0, 1e9), **common)
    assert jnp.array_equal(plain["x"], gi["x"])
    # mid-interval run: finite, and the uncond latent rows advanced less
    mid = karras_sample(diff, model, guidance_interval=(0.1, 10.0), **common)
    assert np.isfinite(np.asarray(mid["x"])).all()
    assert float(mid["state"][B:].max()) < float(mid["state"][:B].max())


def test_karras_sample_interval_rejects_unsupported():
    diff = diffusion_from_betas("linear", 100)

    def model(x, t, prev_latent=None):
        return 0.05 * x, prev_latent

    common = dict(
        shape=SHAPE, steps=4, key=jax.random.PRNGKey(0), model_kwargs={},
        guidance_scale=3.0, init_state=jnp.zeros((2 * B, 2)),
        guidance_interval=(0.1, 10.0),
    )
    with pytest.raises(NotImplementedError):
        karras_sample(diff, model, sampler="dpm", **common)
    with pytest.raises(NotImplementedError):
        karras_sample(diff, model, sampler="heun", s_churn=1.0, **common)


def test_point_cloud_sampler_interval(small_two_stream):
    """PointCloudSampler surface: interval sampling runs the real (small)
    model and stays finite; an unguided stage ignores the interval."""
    from pcdiff.diffusion.sampler import PointCloudSampler

    bound, kwargs = small_two_stream
    common = dict(
        models=[bound], diffusions=[diffusion_from_betas("linear", 50)],
        num_points=[32], aux_channels=[], clip_denoised=True,
        use_karras=[True], karras_steps=[4], sigma_min=[1e-3],
        sigma_max=[120.0], s_churn=[0.0], sampler="heun_reuse",
    )
    out = PointCloudSampler(
        guidance_scale=[3.0], guidance_interval=(0.1, 10.0), **common
    ).sample_batch(2, kwargs, jax.random.PRNGKey(0))
    assert out.shape == (2, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    out_unguided = PointCloudSampler(
        guidance_scale=[0.0], guidance_interval=(0.1, 10.0), **common
    ).sample_batch(2, kwargs, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out_unguided)).all()


@pytest.fixture(scope="module")
def small_two_stream():
    from pcdiff.data import synthetic_batch
    from pcdiff.models import TwoStreamDenoiser
    from pcdiff.models.wrapper import BoundTwoStream

    model = TwoStreamDenoiser(
        num_points=32, num_latents=8, latent_dim=16, x_dim=16, num_blocks=1,
        num_compute_layers=1, num_heads=2, num_classes=10, num_tokens_ppcd=4,
        num_tokens_depth=2, depth_image_size=32, depth_patch=16,
    )
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, batch_size=2, num_points=32, num_partial=16,
                            depth_size=32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["target"]),
        jnp.zeros((2,), jnp.int32),
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
