"""Golden-value tests: Karras sigma schedule, sigma->t mapping, ODE samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pcdiff.diffusion import karras
from pcdiff.diffusion.gaussian import GaussianDiffusion
from pcdiff.diffusion.schedules import get_named_beta_schedule

from .reference_import import ref_module

ref_kd = ref_module("diffusion.k_diffusion")

B, N, C = 2, 8, 3


def test_sigmas_karras_match():
    ours = karras.get_sigmas_karras(64, 1e-3, 120.0, rho=7.0)
    theirs = ref_kd.get_sigmas_karras(64, 1e-3, 120.0, rho=7.0).numpy()
    assert ours.shape == theirs.shape == (65,)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-8)


def test_sigma_to_t_matches_reference():
    betas = get_named_beta_schedule("linear", 1000)
    diff = GaussianDiffusion(
        betas=betas, model_mean_type="epsilon", model_var_type="fixed_small",
        loss_type="mse",
    )
    ref_diff = ref_module("diffusion.gaussian_diffusion").GaussianDiffusion(
        betas=betas, model_mean_type="epsilon", model_var_type="fixed_small",
        loss_type="mse",
    )
    wrapper = ref_kd.GaussianToKarrasDenoiser(model=None, diffusion=ref_diff)
    sigmas = np.array(
        [1e-4, 1e-3, 0.01, 0.1, 0.5, 1.0, 3.0, 10.0, 80.0, 120.0, 500.0],
        dtype=np.float32,
    )
    got = np.asarray(karras.sigma_to_t(diff, jnp.asarray(sigmas)))
    want = np.array([int(wrapper.sigma_to_t(float(s))) for s in sigmas])
    np.testing.assert_array_equal(got, want)


def test_karras_scalings_match():
    ours = karras.KarrasDenoiser(sigma_data=0.5)
    theirs = ref_kd.KarrasDenoiser(sigma_data=0.5)
    sig = np.array([1e-3, 0.5, 3.0, 120.0], dtype=np.float32)
    for g, w in zip(
        ours.get_scalings(jnp.asarray(sig)), theirs.get_scalings(torch.from_numpy(sig))
    ):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-5)


def test_ancestral_step_matches():
    got = karras.get_ancestral_step(jnp.float32(3.0), jnp.float32(1.0))
    want = ref_kd.get_ancestral_step(torch.tensor(3.0), torch.tensor(1.0))
    np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), want[1].numpy(), rtol=1e-6)


def _linear_denoiser_jax(x, sigma, state):
    # deterministic pseudo-denoiser: shrink towards a fixed point
    return 0.9 * x / (1.0 + sigma.reshape((-1,) + (1,) * (x.ndim - 1))), state


def _linear_denoiser_torch(x, sigma):
    return 0.9 * x / (1.0 + sigma.reshape((-1,) + (1,) * (x.ndim - 1)))


@pytest.mark.parametrize("sampler_name", ["heun", "dpm"])
@pytest.mark.parametrize("steps", [1, 2, 8])
def test_ode_samplers_match_reference_trajectories(sampler_name, steps):
    """With s_churn=0 both solvers are deterministic given x_T: exact parity."""
    sigmas = karras.get_sigmas_karras(steps, 1e-3, 10.0)
    x_T = np.random.default_rng(1).standard_normal((B, N, C)).astype(np.float32) * 10.0

    ours_fn = {"heun": karras.sample_heun, "dpm": karras.sample_dpm}[sampler_name]
    out = ours_fn(
        _linear_denoiser_jax, jnp.asarray(x_T), sigmas, jax.random.PRNGKey(0),
        progressive=True,
    )

    ref_fn = {"heun": ref_kd.sample_heun, "dpm": ref_kd.sample_dpm}[sampler_name]
    last = None
    ref_pred = []
    for y in ref_fn(
        _linear_denoiser_torch, torch.from_numpy(x_T),
        torch.from_numpy(sigmas.astype(np.float32)),
    ):
        last = y
        key = "pred_xstart" if "pred_xstart" in y else "denoised"
        ref_pred.append(y[key].numpy())

    np.testing.assert_allclose(
        np.asarray(out["x"]), last["x"].numpy(), rtol=1e-4, atol=1e-5
    )
    # the reference's final consumed value is its last yield's pred_xstart
    np.testing.assert_allclose(
        np.asarray(out["pred_xstart"]), ref_pred[-1], rtol=1e-4, atol=1e-5
    )


def test_euler_ancestral_terminal_property():
    """Final x equals the last denoised (sigma_up=0 and full step at the end)."""
    sigmas = karras.get_sigmas_karras(8, 1e-3, 10.0)
    x_T = np.random.default_rng(2).standard_normal((B, N, C)).astype(np.float32) * 10.0
    out = karras.sample_euler_ancestral(
        _linear_denoiser_jax, jnp.asarray(x_T), sigmas, jax.random.PRNGKey(0),
        progressive=True,
    )
    assert out["x"].shape == (B, N, C)
    assert out["trajectory"]["x"].shape[0] == 8
    # last update: x = denoised exactly (d*(0-sigma) collapses onto denoised)
    last_x = np.asarray(out["trajectory"]["x"][-1])
    expected = np.asarray(
        _linear_denoiser_jax(
            out["trajectory"]["x"][-2],
            jnp.full((B,), float(sigmas[-2])),
            None,
        )[0]
    )
    np.testing.assert_allclose(np.asarray(out["x"]), last_x, rtol=1e-6)
    np.testing.assert_allclose(last_x, expected, rtol=1e-4, atol=1e-6)


def test_guided_denoise_fused_equals_two_calls():
    """One 2B-batched CFG forward == reference's two separate calls."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((C, C)).astype(np.float32)

    def batched_model(x, sigma, state):
        y = jnp.einsum("bnc,cd->bnd", x, jnp.asarray(w))
        new_state = (state + 1.0) if state is not None else None
        return y, new_state

    x = rng.standard_normal((B, N, C)).astype(np.float32)
    sigma = jnp.full((B,), 2.0)
    scale = 3.0
    guided = karras.guided_denoise_fn(batched_model, scale)
    state0 = jnp.zeros((2 * B,))
    got, state1 = guided(jnp.asarray(x), sigma, state0)

    cond, _ = batched_model(jnp.asarray(x), sigma, None)
    uncond, _ = batched_model(jnp.asarray(x), sigma, None)
    want = uncond + scale * (cond - uncond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state1), 1.0)


def test_heun_threads_state_through_both_calls():
    """State must advance on predictor AND corrector calls, in order."""
    calls = []

    def counting_denoiser(x, sigma, state):
        return x * 0.5, state + 1

    sigmas = karras.get_sigmas_karras(4, 1e-3, 10.0)
    x_T = jnp.ones((1, 4, 3))
    out = karras.sample_heun(
        counting_denoiser, x_T, sigmas, jax.random.PRNGKey(0), state=jnp.int32(0)
    )
    # 3 interior steps x 2 calls + 1 final Euler call = 7
    assert int(out["state"]) == 7


def test_karras_training_losses_match():
    """EDM-space training losses (reference k_diffusion.py:47-69)."""
    rng2 = np.random.default_rng(9)
    x = rng2.standard_normal((B, N, C)).astype(np.float32)
    noise = rng2.standard_normal((B, N, C)).astype(np.float32)
    sig = np.abs(rng2.standard_normal(B)).astype(np.float32) + 0.1

    ours = karras.KarrasDenoiser(sigma_data=0.5)
    theirs = ref_kd.KarrasDenoiser(sigma_data=0.5)

    def jax_model(xx, tt, **kw):
        return 0.3 * xx

    def torch_model(xx, tt, **kw):
        return 0.3 * xx

    got = ours.training_losses(
        jax_model, jnp.asarray(x), jnp.asarray(sig), noise=jnp.asarray(noise)
    )
    want = theirs.training_losses(
        torch_model, torch.from_numpy(np.swapaxes(x, 1, 2)),
        torch.from_numpy(sig), noise=torch.from_numpy(np.swapaxes(noise, 1, 2)),
    )
    for key in ("mse", "xs_mse", "loss"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), rtol=2e-4, atol=1e-5,
            err_msg=key,
        )


# ------------------------------------------------------------------ heun_reuse


def test_heun_reuse_call_count_and_state_threading():
    """n+1 denoiser calls at n steps (vs heun's 2(n-1)+1), state advancing
    through every call."""

    def counting_denoiser(x, sigma, state):
        return x * 0.5, state + 1

    sigmas = karras.get_sigmas_karras(8, 1e-3, 10.0)
    x_T = jnp.ones((1, 4, 3))
    out = karras.sample_heun_reuse(
        counting_denoiser, x_T, sigmas, jax.random.PRNGKey(0), state=jnp.int32(0)
    )
    assert int(out["state"]) == 9  # 2 (step 0) + 6 (reuse steps) + 1 (final)


@pytest.mark.parametrize("steps", [1, 2])
def test_heun_reuse_degenerates_to_heun_at_tiny_step_counts(steps):
    """With <=2 steps there is no interior reuse step: same math as heun
    (float-level differences only — heun's body lives in a lax.scan, the
    degenerate reuse path is unrolled, so fusion order differs)."""
    sigmas = karras.get_sigmas_karras(steps, 1e-3, 10.0)
    x_T = np.random.default_rng(7).standard_normal((B, N, C)).astype(np.float32) * 10.0
    got = karras.sample_heun_reuse(
        _linear_denoiser_jax, jnp.asarray(x_T), sigmas, jax.random.PRNGKey(0)
    )
    want = karras.sample_heun(
        _linear_denoiser_jax, jnp.asarray(x_T), sigmas, jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        np.asarray(got["x"]), np.asarray(want["x"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["pred_xstart"]), np.asarray(want["pred_xstart"]),
        rtol=1e-5, atol=1e-6,
    )


def test_heun_reuse_second_order_accuracy():
    """At equal NFE the reuse sampler must beat plain heun: reuse at n steps
    costs about as many calls as heun at n/2 steps, and its solution error
    against a fine-grid truth must be smaller. Also: error within a small
    factor of full heun at the SAME grid (the O(h^2) slope perturbation must
    not change the error class)."""
    x_T = np.random.default_rng(11).standard_normal((B, N, C)).astype(np.float32) * 10.0

    def solve(fn, steps):
        sigmas = karras.get_sigmas_karras(steps, 1e-3, 10.0)
        return np.asarray(
            fn(_linear_denoiser_jax, jnp.asarray(x_T), sigmas,
               jax.random.PRNGKey(0))["x"]
        )

    truth = solve(karras.sample_heun, 256)
    err_reuse_16 = np.abs(solve(karras.sample_heun_reuse, 16) - truth).max()
    err_heun_16 = np.abs(solve(karras.sample_heun, 16) - truth).max()
    err_heun_8 = np.abs(solve(karras.sample_heun, 8) - truth).max()
    # equal-NFE comparison: reuse@16 (17 calls) vs heun@8 (15 calls)
    assert err_reuse_16 < err_heun_8
    # same-grid comparison: within 3x of full heun@16
    assert err_reuse_16 < 3.0 * err_heun_16


def test_heun_reuse_progressive_trajectory_shapes():
    steps = 6
    sigmas = karras.get_sigmas_karras(steps, 1e-3, 10.0)
    x_T = np.random.default_rng(13).standard_normal((B, N, C)).astype(np.float32)
    out = karras.sample_heun_reuse(
        _linear_denoiser_jax, jnp.asarray(x_T), sigmas, jax.random.PRNGKey(0),
        progressive=True,
    )
    assert out["trajectory"]["x"].shape == (steps, B, N, C)
    assert out["trajectory"]["sigma"].shape == (steps,)
    np.testing.assert_array_equal(
        np.asarray(out["trajectory"]["x"][-1]), np.asarray(out["x"])
    )


def test_heun_reuse_rejects_churn():
    sigmas = karras.get_sigmas_karras(4, 1e-3, 10.0)
    with pytest.raises(NotImplementedError):
        karras.sample_heun_reuse(
            _linear_denoiser_jax, jnp.ones((1, 4, 3)), sigmas,
            jax.random.PRNGKey(0), s_churn=1.0,
        )
