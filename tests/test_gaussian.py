"""Golden-value tests: GaussianDiffusion functions vs the torch reference.

Layout note: our framework is channels-last [B, N, C]; the reference is
channels-first [B, C, N]. Elementwise/table-gather math is layout-invariant,
so those are compared on identical arrays; chamfer/mean_flat paths transpose.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pcdiff.diffusion.gaussian import GaussianDiffusion
from pcdiff.diffusion.schedules import get_named_beta_schedule

from .reference_import import ref_module

ref_gd = ref_module("diffusion.gaussian_diffusion")

B, N, C = 4, 16, 3
T = 100


def make_pair(model_var_type="fixed_small", model_mean_type="epsilon", **kw):
    betas = get_named_beta_schedule("linear", T)
    common = dict(
        betas=betas, model_mean_type=model_mean_type,
        model_var_type=model_var_type, loss_type="mse", **kw,
    )
    return GaussianDiffusion(**common), ref_gd.GaussianDiffusion(**common)


@pytest.fixture
def data(rng):
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    noise = rng.standard_normal((B, N, C)).astype(np.float32)
    t = rng.integers(0, T, size=(B,)).astype(np.int64)
    return x, noise, t


def test_q_sample_matches(data):
    x, noise, t = data
    ours, theirs = make_pair()
    got = np.asarray(ours.q_sample(jnp.asarray(x), jnp.asarray(t), jnp.asarray(noise)))
    want = theirs.q_sample(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(noise))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-6)


def test_q_mean_variance_matches(data):
    x, _, t = data
    ours, theirs = make_pair()
    got = ours.q_mean_variance(jnp.asarray(x), jnp.asarray(t))
    want = theirs.q_mean_variance(torch.from_numpy(x), torch.from_numpy(t))
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(g), w.shape), w.numpy(), rtol=1e-6, atol=1e-6
        )


def test_q_posterior_matches(data):
    x, noise, t = data
    ours, theirs = make_pair()
    x_t = x + noise
    got = ours.q_posterior_mean_variance(
        jnp.asarray(x), jnp.asarray(x_t), jnp.asarray(t)
    )
    want = theirs.q_posterior_mean_variance(
        torch.from_numpy(x), torch.from_numpy(x_t), torch.from_numpy(t)
    )
    np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(got[1]), want[1].shape), want[1].numpy(),
        rtol=1e-6, atol=1e-7,
    )


def _dummy_eps_model_jax(x, t, **kw):
    return 0.1 * x + 0.01 * t.astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))


def _dummy_eps_model_torch(x, t, **kw):
    return 0.1 * x + 0.01 * t.float().reshape((-1,) + (1,) * (x.ndim - 1))


@pytest.mark.parametrize("mean_type", ["epsilon", "x_start", "x_prev"])
@pytest.mark.parametrize("var_type", ["fixed_small", "fixed_large"])
@pytest.mark.parametrize("clip", [False, True])
def test_p_mean_variance_matches(data, mean_type, var_type, clip):
    x, _, t = data
    ours, theirs = make_pair(model_var_type=var_type, model_mean_type=mean_type)
    got = ours.p_mean_variance(
        _dummy_eps_model_jax, jnp.asarray(x), jnp.asarray(t), clip_denoised=clip
    )
    want = theirs.p_mean_variance(
        _dummy_eps_model_torch, torch.from_numpy(x), torch.from_numpy(t),
        clip_denoised=clip,
    )
    for key in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), rtol=2e-5, atol=1e-5, err_msg=key
        )


def test_p_mean_variance_learned_range(data):
    x, _, t = data
    ours, theirs = make_pair(model_var_type="learned_range")

    # ours splits on the last (channel) axis; reference on dim 1 of [B,C,N]
    def jax_model(xx, tt, **kw):
        return jnp.concatenate([0.1 * xx, jnp.tanh(xx)], axis=-1)

    def torch_model(xx, tt, **kw):
        return torch.cat([0.1 * xx, torch.tanh(xx)], dim=1)

    got = ours.p_mean_variance(jax_model, jnp.asarray(x), jnp.asarray(t))
    x_cf = np.swapaxes(x, 1, 2)  # [B, C, N]
    want = theirs.p_mean_variance(
        torch_model, torch.from_numpy(x_cf), torch.from_numpy(t)
    )
    for key in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(
            np.asarray(got[key]),
            np.swapaxes(want[key].numpy(), 1, 2),
            rtol=2e-5, atol=1e-5, err_msg=key,
        )


def test_ddim_sample_eta0_matches(data):
    x, _, t = data
    ours, theirs = make_pair()
    import jax

    got = ours.ddim_sample(
        _dummy_eps_model_jax, jnp.asarray(x), jnp.asarray(t),
        jax.random.PRNGKey(0), eta=0.0,
    )
    want = theirs.ddim_sample(
        _dummy_eps_model_torch, torch.from_numpy(x), torch.from_numpy(t), eta=0.0
    )
    np.testing.assert_allclose(
        np.asarray(got["sample"]), want["sample"].numpy(), rtol=2e-5, atol=1e-5
    )


def test_training_losses_mse_matches(data):
    x, noise, t = data
    ours, theirs = make_pair()

    def jax_model(xx, tt, **kw):
        return 0.1 * xx, None  # (output, latent) tuple like the fork's model

    def torch_model(xx, tt, **kw):
        return 0.1 * xx, None

    got = ours.training_losses(
        jax_model, jnp.asarray(x), jnp.asarray(t), noise=jnp.asarray(noise)
    )
    x_cf, noise_cf = np.swapaxes(x, 1, 2), np.swapaxes(noise, 1, 2)
    want = theirs.training_losses(
        torch_model, torch.from_numpy(x_cf), torch.from_numpy(t),
        noise=torch.from_numpy(noise_cf),
    )
    np.testing.assert_allclose(
        np.asarray(got["mse"]), want["mse"].numpy(), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["loss"]), want["loss"].numpy(), rtol=2e-5, atol=1e-6
    )


def test_training_losses_with_chamfer_matches(data):
    x, noise, t = data
    ours, theirs = make_pair()

    def jax_model(xx, tt, **kw):
        return 0.1 * xx, None

    def torch_model(xx, tt, **kw):
        return 0.1 * xx, None

    got = ours.training_losses(
        jax_model, jnp.asarray(x), jnp.asarray(t), noise=jnp.asarray(noise),
        use_cd_xyz_loss=True,
    )
    x_cf, noise_cf = np.swapaxes(x, 1, 2), np.swapaxes(noise, 1, 2)
    want = theirs.training_losses(
        torch_model, torch.from_numpy(x_cf), torch.from_numpy(t),
        noise=torch.from_numpy(noise_cf), use_cd_xyz_loss=True,
    )
    np.testing.assert_allclose(
        np.asarray(got["c_dist"]), want["c_dist"].numpy(), rtol=2e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["loss"]), want["loss"].numpy(), rtol=2e-3, atol=1e-4,
    )


def test_channel_scale_roundtrip(data):
    x, _, _ = data
    betas = get_named_beta_schedule("linear", T)
    ours = GaussianDiffusion(
        betas=betas, model_mean_type="epsilon", model_var_type="fixed_small",
        loss_type="mse",
        channel_scales=np.array([2.0, 2.0, 2.0]),
        channel_biases=np.array([0.1, 0.0, -0.1]),
    )
    xs = ours.scale_channels(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(xs), x * 2.0 + [0.1, 0.0, -0.1], rtol=1e-6, atol=1e-6
    )
    back = ours.unscale_channels(xs)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-5, atol=1e-6)


def test_p_sample_loop_and_ddim_loop_shapes():
    import jax

    ours, _ = make_pair()

    def model(x, tt, **kw):
        return 0.1 * x

    out = ours.p_sample_loop(model, (2, 8, 3), jax.random.PRNGKey(0))
    assert out.shape == (2, 8, 3)
    prog = ours.ddim_sample_loop(
        model, (2, 8, 3), jax.random.PRNGKey(0), progressive=True
    )
    assert prog["sample"].shape == (T, 2, 8, 3)
    assert prog["pred_xstart"].shape == (T, 2, 8, 3)
    assert np.isfinite(np.asarray(prog["sample"])).all()


def test_calc_bpd_loop_structure():
    import jax

    # linear is undefined at T=10 (beta_end = 2.0); cosine works at any T
    betas = get_named_beta_schedule("cosine", 10)
    ours = GaussianDiffusion(
        betas=betas, model_mean_type="epsilon", model_var_type="fixed_small",
        loss_type="mse",
    )

    def model(x, tt, **kw):
        return 0.1 * x

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 3)),
                    dtype=jnp.float32)
    out = ours.calc_bpd_loop(model, x, jax.random.PRNGKey(0))
    assert out["vb"].shape == (2, 10)
    assert out["mse"].shape == (2, 10)
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vb"].sum(axis=1) + out["prior_bpd"]),
        rtol=1e-5,
    )


def test_spaced_diffusion_sampling_end_to_end():
    """Respaced DDIM sampling remaps timesteps through timestep_map."""
    import jax

    from pcdiff.diffusion.schedules import space_timesteps
    from pcdiff.diffusion.gaussian import SpacedDiffusion

    betas = get_named_beta_schedule("cosine", 100)
    spaced = SpacedDiffusion(
        use_timesteps=space_timesteps(100, "ddim10"), betas=betas,
        model_mean_type="epsilon", model_var_type="fixed_small",
        loss_type="mse",
    )
    assert spaced.num_timesteps == 10
    seen_ts = []

    def model(x, tt, **kw):
        seen_ts.append(tt)
        return 0.1 * x

    out = spaced.ddim_sample_loop(model, (1, 4, 3), jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 3)
