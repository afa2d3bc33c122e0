"""Parallel-in-time (Picard) Heun sampler vs the sequential scan sampler.

The parallel sampler must reproduce ``sample_heun`` exactly at ``tol=0``
(the frontier-advance argument in pcdiff/diffusion/parallel.py), stay close
at practical tolerances while using FEWER sequential denoiser rounds, and
shard its window axis over the device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pcdiff.diffusion import (
    KarrasDenoiser,
    get_sigmas_karras,
    karras_sample,
    sample_heun,
    sample_heun_parallel,
)
from pcdiff.parallel import make_mesh

B, N, C = 4, 16, 3
STEPS = 12


def _toy_denoise(x, sigmas, state):
    """Stateless smooth contraction toward a fixed attractor."""
    target = jnp.sin(jnp.arange(N * C, dtype=x.dtype)).reshape(1, N, C)
    s = sigmas.reshape(-1, 1, 1)
    return (x + s * target) / (1.0 + s), state


def _toy_denoise_stateful(x, sigmas, state):
    """State feeds back into the output so threading bugs change results."""
    base, _ = _toy_denoise(x, sigmas, None)
    out = base + 0.05 * jnp.tanh(state)
    new_state = 0.9 * state + 0.1 * jnp.mean(x, axis=1, keepdims=True) * jnp.ones_like(state)
    return out, new_state


def _x_T(key, sigma_max):
    return jax.random.normal(key, (B, N, C)) * sigma_max


def test_tol0_matches_sequential_stateless():
    sigmas = get_sigmas_karras(STEPS, 1e-3, 40.0)
    x_T = _x_T(jax.random.PRNGKey(0), 40.0)
    key = jax.random.PRNGKey(1)
    ref = sample_heun(_toy_denoise, x_T, sigmas, key)
    par = sample_heun_parallel(_toy_denoise, x_T, sigmas, key, window=4,
                               tol=0.0)
    np.testing.assert_allclose(par["x"], ref["x"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(par["pred_xstart"], ref["pred_xstart"],
                               rtol=2e-5, atol=2e-6)
    assert int(par["parallel_iters"]) <= STEPS


def test_tol0_matches_sequential_stateful():
    sigmas = get_sigmas_karras(STEPS, 1e-3, 40.0)
    x_T = _x_T(jax.random.PRNGKey(2), 40.0)
    state0 = jnp.zeros((B, 1, C))
    key = jax.random.PRNGKey(3)
    ref = sample_heun(_toy_denoise_stateful, x_T, sigmas, key, state=state0)
    par = sample_heun_parallel(_toy_denoise_stateful, x_T, sigmas, key,
                               state=state0, window=4, tol=0.0)
    np.testing.assert_allclose(par["x"], ref["x"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(par["state"], ref["state"], rtol=2e-5,
                               atol=2e-6)


def test_tolerance_cuts_iterations():
    sigmas = get_sigmas_karras(STEPS, 1e-3, 40.0)
    x_T = _x_T(jax.random.PRNGKey(4), 40.0)
    key = jax.random.PRNGKey(5)
    ref = sample_heun(_toy_denoise, x_T, sigmas, key)
    par = sample_heun_parallel(_toy_denoise, x_T, sigmas, key, window=6,
                               tol=1e-2)
    assert int(par["parallel_iters"]) < STEPS
    rms = float(jnp.sqrt(jnp.mean((par["x"] - ref["x"]) ** 2)))
    assert rms < 1e-2


def test_karras_sample_integration_cfg():
    """heun_parallel through karras_sample with CFG matches heun (tol=0)."""
    diffusion = KarrasDenoiser()

    def model(x, t, cond=None):
        shift = 0.0 if cond is None else cond.reshape(-1, 1, 1)
        return jnp.tanh(x * 0.1) + shift

    kwargs = {"cond": jnp.concatenate([jnp.ones((B,)), jnp.zeros((B,))])}
    common = dict(
        diffusion=diffusion, model=model, shape=(B, N, C), steps=STEPS,
        key=jax.random.PRNGKey(7), model_kwargs=kwargs, sigma_min=1e-3,
        sigma_max=40.0, guidance_scale=2.0,
    )
    ref = karras_sample(sampler="heun", **common)
    par = karras_sample(sampler="heun_parallel",
                        parallel_options=dict(window=4, tol=0.0), **common)
    np.testing.assert_allclose(par["x"], ref["x"], rtol=2e-5, atol=2e-6)


def test_window_sharded_over_mesh():
    """W axis sharded over the data axis of an 8-device mesh; same result."""
    mesh = make_mesh(data_parallel=8, model_parallel=1)
    sigmas = get_sigmas_karras(STEPS, 1e-3, 40.0)
    x_T = _x_T(jax.random.PRNGKey(8), 40.0)
    key = jax.random.PRNGKey(9)
    dense = sample_heun_parallel(_toy_denoise, x_T, sigmas, key, window=8,
                                 tol=1e-3)
    run = jax.jit(lambda x: sample_heun_parallel(
        _toy_denoise, x, sigmas, key, window=8, tol=1e-3,
        window_spec=P("data"), mesh=mesh,
    ))
    with mesh:
        sharded = run(x_T)
    np.testing.assert_allclose(sharded["x"], dense["x"], rtol=1e-5, atol=1e-6)
    assert int(sharded["parallel_iters"]) == int(dense["parallel_iters"])


def test_point_cloud_sampler_heun_parallel_matches_heun():
    """Full stack: tiny TwoStreamDenoiser + CFG + latent threading through
    PointCloudSampler with sampler='heun_parallel' vs 'heun' (tol=0)."""
    from pcdiff.diffusion import diffusion_from_betas
    from pcdiff.diffusion.sampler import PointCloudSampler
    from pcdiff.models import TwoStreamDenoiser
    from pcdiff.models.wrapper import BoundTwoStream

    cfg = dict(
        num_points=16, num_latents=4, latent_dim=8, x_dim=8, num_blocks=1,
        num_compute_layers=1, num_heads=2, num_classes=3, num_tokens_ppcd=2,
        num_tokens_depth=2, depth_image_size=32, depth_patch=16,
    )
    model = TwoStreamDenoiser(**cfg)
    Bc = 2
    rng = np.random.default_rng(0)
    batch = dict(
        class_labels=jnp.zeros((Bc,), jnp.int32),
        viewpoints=jnp.asarray(rng.standard_normal((Bc, 3)), jnp.float32),
        partial_pcd=jnp.asarray(
            rng.standard_normal((Bc, cfg["num_points"], 3)), jnp.float32
        ),
        depth_maps=jnp.asarray(rng.random((Bc, 32, 32, 1)), jnp.float32),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((Bc, cfg["num_points"], 3)), jnp.zeros((Bc,), jnp.int32),
        **batch,
    )
    bound = BoundTwoStream(model, params)
    diffusion = diffusion_from_betas("linear", 100)

    def make(sampler, **opts):
        return PointCloudSampler(
            models=[bound], diffusions=[diffusion],
            num_points=[cfg["num_points"]], aux_channels=[],
            guidance_scale=[3.0], use_karras=[True], karras_steps=[6],
            sigma_min=[1e-3], sigma_max=[40.0], s_churn=[0.0],
            sampler=sampler, **opts,
        )

    key = jax.random.PRNGKey(42)
    ref = make("heun").sample_batch(Bc, batch, key)
    par = make(
        "heun_parallel", parallel_options=dict(window=3, tol=0.0)
    ).sample_batch(Bc, batch, key)
    # The vmapped window evaluation compiles the model forward with different
    # fp reduction orders than the scan body; over 6 solver steps with CFG x3
    # that reordering grows to ~5e-4 on [-0.5, 0.5]-range outputs (window=1
    # already shows 1e-4 with identical logic). Logic-level parity is pinned
    # bit-tight by the toy-model tests above.
    np.testing.assert_allclose(np.asarray(par), np.asarray(ref), atol=1e-3)


def test_composed_picard_x_sequence_parallel():
    """Both parallelisms at once on a 2D (data x model) mesh: Picard step
    windows sharded over `data` while the denoiser's read/write attentions
    run sequence-parallel over `model` (shard_map inside the vmapped window
    inside the while_loop). Must match the dense sequential solve."""
    from functools import partial

    from pcdiff.diffusion import diffusion_from_betas
    from pcdiff.diffusion.sampler import PointCloudSampler
    from pcdiff.models import TwoStreamDenoiser
    from pcdiff.models.wrapper import BoundTwoStream
    from pcdiff.parallel.xsp import (
        sharded_read_attention,
        sharded_write_attention,
    )

    mesh = make_mesh(data_parallel=4, model_parallel=2)
    cfg = dict(
        num_points=32, num_latents=8, latent_dim=16, x_dim=16, num_blocks=1,
        num_compute_layers=1, num_heads=2, num_classes=3, num_tokens_ppcd=2,
        num_tokens_depth=2, depth_image_size=32, depth_patch=16,
    )
    dense = TwoStreamDenoiser(**cfg)
    sp = TwoStreamDenoiser(
        **cfg,
        read_attention_fn=partial(sharded_read_attention, mesh=mesh),
        write_attention_fn=partial(sharded_write_attention, mesh=mesh),
    )
    Bc = 2
    rng = np.random.default_rng(0)
    batch = dict(
        class_labels=jnp.zeros((Bc,), jnp.int32),
        viewpoints=jnp.asarray(rng.standard_normal((Bc, 3)), jnp.float32),
        partial_pcd=jnp.asarray(rng.standard_normal((Bc, 32, 3)), jnp.float32),
        depth_maps=jnp.asarray(rng.random((Bc, 32, 32, 1)), jnp.float32),
    )
    params = dense.init(jax.random.PRNGKey(0), jnp.zeros((Bc, 32, 3)),
                        jnp.zeros((Bc,), jnp.int32), **batch)
    diffusion = diffusion_from_betas("linear", 100)

    def make(model, sampler, **opts):
        return PointCloudSampler(
            models=[BoundTwoStream(model, params)], diffusions=[diffusion],
            num_points=[32], aux_channels=[], guidance_scale=[3.0],
            use_karras=[True], karras_steps=[6], sigma_min=[1e-3],
            sigma_max=[40.0], s_churn=[0.0], sampler=sampler, **opts,
        )

    key = jax.random.PRNGKey(5)
    ref = np.asarray(make(dense, "heun").sample_batch(Bc, batch, key))
    with mesh:
        comp = jax.jit(lambda k: make(
            sp, "heun_parallel",
            parallel_options=dict(window=4, tol=1e-3,
                                  window_spec=P("data"), mesh=mesh),
        ).sample_batch(Bc, batch, k))(key)
    np.testing.assert_allclose(np.asarray(comp), ref, atol=1e-3)


def test_churn_rejected():
    sigmas = get_sigmas_karras(STEPS, 1e-3, 40.0)
    x_T = _x_T(jax.random.PRNGKey(10), 40.0)
    with pytest.raises(NotImplementedError):
        sample_heun_parallel(_toy_denoise, x_T, sigmas,
                             jax.random.PRNGKey(11), s_churn=1.0)
