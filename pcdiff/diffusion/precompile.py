"""Concurrently-compiled per-segment sampling programs (cold-start lever).

The guidance-interval sampler's monolithic program is ~45.5k jaxpr
equations and costs a ~475-680 s server-side cold compile (docs/
performance.md "Round-4 compile wall"); the reference pays ~0 because
eager torch has no compile step. XLA compile scales SUBLINEARLY in
program size, so splitting alone loses — but the axon server overlaps
concurrent compile requests (measured 1.79x,
``scripts/compile_concurrency_probe.py``), so splitting the trajectory at
its natural guidance-interval segment boundaries and compiling every
segment program IN PARALLEL turns the wall into ~max(segment walls)
instead of their sum.

Two requirements make this a separate path from the monolithic jit:

- Params and conditioning must be explicit jit ARGUMENTS. The monolithic
  path closes over the bound model's params, which embed as jaxpr
  constants and would ship the full parameter set inside every one of the
  concurrent compile requests (the same failure mode as the bench's
  HTTP-413 fix).
- PRNG-key splits are threaded through the programs (each returns its
  carry key) in exactly the order the monolithic
  :func:`~pcdiff.diffusion.karras.sample_guided_interval` performs them,
  so the segmented trajectory is numerically identical to the monolithic
  one (pinned by ``tests/test_precompile.py``).

No reference analogue (the reference has no compile wall to attack).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .karras import (
    _SAMPLERS,
    cond_segment_denoise_fn,
    gaussian_denoise_fn,
    get_sigmas_karras,
    gi_segment_runs,
    guided_denoise_fn,
    half_model_kwargs,
)

__all__ = ["precompile_segmented_sampler", "SegmentedGISampler"]


def _abstract(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), tree
    )


class SegmentedGISampler:
    """AOT-compiled per-segment guidance-interval sampling pipeline.

    Built by :func:`precompile_segmented_sampler`; call with
    ``(model_kwargs, key)`` like the jitted ``sampler.sample_batch``
    closure the CLIs build. ``compile_seconds`` records each program's
    compile wall (concurrent, so the cold cost is ~their max).
    """

    def __init__(self, params, setup_exec, segment_execs, compile_seconds):
        self._params = params
        self._setup = setup_exec
        self._segments = segment_execs
        self.compile_seconds = compile_seconds

    def __call__(self, model_kwargs: Dict[str, Any], key: jax.Array):
        kw, x, state, key = self._setup(self._params, dict(model_kwargs), key)
        for seg in self._segments[:-1]:
            x, state, key = seg(self._params, kw, x, state, key)
        return self._segments[-1](self._params, kw, x, state, key)


def precompile_segmented_sampler(
    sampler,
    batch_size: int,
    example_model_kwargs: Dict[str, Any],
    *,
    stage: int = 0,
    example_key: Optional[jax.Array] = None,
    compile_workers: Optional[int] = None,
) -> SegmentedGISampler:
    """Split ``sampler``'s guidance-interval program into per-segment jits
    and compile them concurrently.

    ``sampler`` must be a single-stage karras :class:`PointCloudSampler`
    with ``guidance_interval`` active, solver ``heun``/``heun_reuse``,
    ``s_churn == 0``, and a bound model exposing ``module``/``params``
    plus the caching hooks (:class:`pcdiff.models.wrapper.BoundTwoStream`).
    The returned callable matches ``jax.jit(lambda kw, k:
    sampler.sample_batch(batch_size, kw, k))`` numerically.
    """
    if sampler.num_stages != 1:
        raise NotImplementedError("segmented precompile is single-stage only")
    if not sampler.use_karras[stage]:
        raise NotImplementedError("segmented precompile requires karras mode")
    guidance = sampler.guidance_scale[stage]
    if sampler.guidance_interval is None or guidance in (0.0, 1.0):
        raise ValueError("sampler has no active guidance interval")
    if sampler.sampler not in ("heun", "heun_reuse"):
        raise NotImplementedError("guidance_interval supports heun/heun_reuse")
    if sampler.s_churn[stage] != 0.0:
        raise NotImplementedError("guidance_interval requires s_churn == 0")

    model = sampler.models[stage]
    if not (hasattr(model, "module") and hasattr(model, "params")):
        raise TypeError(
            "segmented precompile needs a bound model exposing module/params"
        )
    rebind = lambda params: type(model)(model.module, params)

    diffusion = sampler.diffusions[stage]
    B = batch_size
    shape = (B, sampler.num_points[stage], 3 + len(sampler.aux_channels))
    sigma_max = sampler.sigma_max[stage]
    sigmas = get_sigmas_karras(
        sampler.karras_steps[stage], sampler.sigma_min[stage], sigma_max
    )
    runs = gi_segment_runs(sigmas, sampler.guidance_interval)
    n = len(sigmas) - 1
    solver = _SAMPLERS[sampler.sampler]
    clip = sampler.clip_denoised

    kw_filter = sampler.model_kwargs_key_filter[stage]

    def setup(params, model_kwargs, key):
        # mirrors PointCloudSampler._stage_sample's conditioning block and
        # key-split order (sampler.py: stage split, then x_T init split)
        bound = rebind(params)
        kwargs = dict(model_kwargs)
        if kw_filter != "*":
            use = set(kw_filter.split(","))
            kwargs = {k: v for k, v in kwargs.items() if k in use}
        kwargs = bound.cached_model_kwargs(B, kwargs)
        kwargs = bound.cfg_model_kwargs(B, kwargs)
        init_state = bound.init_latent(2 * B)
        key, sub = jax.random.split(key)
        carry_key, init_key = jax.random.split(sub)
        x_T = jax.random.normal(init_key, shape) * sigma_max
        return kwargs, x_T, init_state, carry_key

    def make_segment(a, b, cfg_on, is_last):
        def segment(params, kwargs, x, state, key):
            bound = rebind(params)
            base = gaussian_denoise_fn(
                bound, diffusion, clip_denoised=clip, model_kwargs=kwargs
            )
            if cfg_on:
                denoise = guided_denoise_fn(base, guidance)
            else:
                denoise = cond_segment_denoise_fn(
                    gaussian_denoise_fn(
                        bound, diffusion, clip_denoised=clip,
                        model_kwargs=half_model_kwargs(kwargs, B),
                    ),
                    B,
                )
            key, sub = jax.random.split(key)
            out = solver(
                denoise, x, sigmas[a : b + 1], sub,
                state=state, final_to_zero=(b == n),
            )
            if is_last:
                return diffusion.unscale_channels(out["pred_xstart"])
            return out["x"], out["state"], key

        return segment

    segment_fns = [
        make_segment(a, b, cfg_on, i == len(runs) - 1)
        for i, (a, b, cfg_on) in enumerate(runs)
    ]

    # --- abstract signatures (client-side tracing only) ---
    if example_key is None:
        example_key = jax.random.PRNGKey(0)
    params_abs = _abstract(model.params)
    kwargs_in_abs = _abstract(dict(example_model_kwargs))
    key_abs = _abstract(example_key)
    kw_abs, x_abs, state_abs, _ = jax.eval_shape(
        setup, params_abs, kwargs_in_abs, key_abs
    )

    lowered = [
        jax.jit(setup).lower(params_abs, kwargs_in_abs, key_abs)
    ] + [
        jax.jit(fn).lower(params_abs, kw_abs, x_abs, state_abs, key_abs)
        for fn in segment_fns
    ]

    # --- server-side compiles, overlapped ---
    import time

    def compile_one(low):
        t0 = time.perf_counter()
        ex = low.compile()
        return ex, time.perf_counter() - t0

    workers = compile_workers or len(lowered)
    with ThreadPoolExecutor(workers) as pool:
        results = list(pool.map(compile_one, lowered))

    execs = [r[0] for r in results]
    walls = [r[1] for r in results]
    return SegmentedGISampler(model.params, execs[0], execs[1:], walls)
