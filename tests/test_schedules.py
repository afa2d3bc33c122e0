"""Golden-value tests: noise schedules and coefficient tables vs reference."""

import numpy as np
import pytest

from pcdiff.diffusion import schedules
from pcdiff.diffusion.gaussian import GaussianDiffusion, SpacedDiffusion

from .reference_import import ref_module

ref_gd = ref_module("diffusion.gaussian_diffusion")


@pytest.mark.parametrize("name", ["linear", "cosine"])
@pytest.mark.parametrize("T", [10, 100, 1000])
def test_named_beta_schedules_match_reference(name, T):
    ours = schedules.get_named_beta_schedule(name, T)
    theirs = ref_gd.get_named_beta_schedule(name, T)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize(
    "spec",
    ["ddim50", "exact0,10,999", "10,15,20", [25], [10, 15, 20], "100"],
)
def test_space_timesteps_matches_reference(spec):
    assert schedules.space_timesteps(1000, spec) == ref_gd.space_timesteps(1000, spec)


def test_space_timesteps_errors():
    with pytest.raises(ValueError):
        schedules.space_timesteps(10, "exact99")
    with pytest.raises(ValueError):
        schedules.space_timesteps(10, [100])


COEF_TABLES = [
    "betas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "alphas_cumprod_next",
    "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod",
    "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod",
    "sqrt_recipm1_alphas_cumprod",
    "posterior_variance",
    "posterior_log_variance_clipped",
    "posterior_mean_coef1",
    "posterior_mean_coef2",
]


@pytest.mark.parametrize("name", ["linear", "cosine"])
def test_coefficient_tables_bitwise_match(name):
    betas = schedules.get_named_beta_schedule(name, 1000)
    ours = GaussianDiffusion(
        betas=betas, model_mean_type="epsilon", model_var_type="fixed_small",
        loss_type="mse",
    )
    theirs = ref_gd.GaussianDiffusion(
        betas=betas, model_mean_type="epsilon", model_var_type="fixed_small",
        loss_type="mse",
    )
    for table in COEF_TABLES:
        np.testing.assert_array_equal(
            getattr(ours, table), getattr(theirs, table), err_msg=table
        )


def test_spaced_diffusion_matches_reference():
    betas = schedules.get_named_beta_schedule("cosine", 1000)
    use = schedules.space_timesteps(1000, "ddim50")
    ours = SpacedDiffusion(
        use_timesteps=use, betas=betas, model_mean_type="epsilon",
        model_var_type="fixed_small", loss_type="mse",
    )
    theirs = ref_gd.SpacedDiffusion(
        use_timesteps=use, betas=betas, model_mean_type="epsilon",
        model_var_type="fixed_small", loss_type="mse",
    )
    assert ours.timestep_map == theirs.timestep_map
    np.testing.assert_array_equal(ours.betas, theirs.betas)
    np.testing.assert_array_equal(ours.alphas_cumprod, theirs.alphas_cumprod)
