"""Diffusion processes and samplers (pure functions, scan-fused loops)."""

from .gaussian import (
    GaussianDiffusion,
    SpacedDiffusion,
    diffusion_from_betas,
    mean_flat,
    normal_kl,
)
from .karras import (
    KarrasDenoiser,
    get_sigmas_karras,
    karras_sample,
    sample_dpm,
    sample_euler_ancestral,
    sample_heun,
    sample_heun_reuse,
    sigma_to_t,
)
from .parallel import sample_heun_parallel
from .schedules import betas_for_alpha_bar, get_named_beta_schedule, space_timesteps

__all__ = [
    "GaussianDiffusion",
    "SpacedDiffusion",
    "diffusion_from_betas",
    "mean_flat",
    "normal_kl",
    "KarrasDenoiser",
    "get_sigmas_karras",
    "karras_sample",
    "sample_heun",
    "sample_heun_parallel",
    "sample_heun_reuse",
    "sample_dpm",
    "sample_euler_ancestral",
    "sigma_to_t",
    "get_named_beta_schedule",
    "betas_for_alpha_bar",
    "space_timesteps",
]
