"""Karras (EDM) sigma-space samplers as fused ``lax.scan`` programs.

TPU-first re-design of the reference's k-diffusion port
(``/root/reference/diffusion/k_diffusion.py``). Key idiomatic shifts:

- The whole ODE solve is ONE jitted program: a ``lax.scan`` over steps
  instead of a Python loop of per-step dispatches.
- Classifier-free guidance runs the conditional and unconditional branches
  as a single 2B-batched forward (one model call per solver sub-step), not
  two sequential calls (reference ``:182-207``) — identical math, half the
  dispatches, full MXU utilization.
- The RIN latent self-conditioning state is threaded *functionally* through
  the scan carry. The reference mutates two nonlocal ``prev_latent`` vars and
  updates them on every denoiser invocation including Heun's correction call
  (``:197-203`` with ``sample_heun:296,306``) — we reproduce exactly that
  update order via the ``state`` carry.
- The sigma -> t mapping (reference ``:85-96``, scipy ``interp1d``) becomes a
  ``jnp.interp`` over the float64-precomputed ``alphas_cumprod`` table, fully
  inside the compiled program.

Stateful denoiser contract used throughout::

    denoise_fn(x, sigma_batch, state) -> (denoised_x0, new_state)

``state`` is an arbitrary pytree with fixed structure (use ``None`` when the
model carries no state).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import GaussianDiffusion, mean_flat, _split_model_output

__all__ = [
    "get_sigmas_karras",
    "KarrasDenoiser",
    "sigma_to_t",
    "sample_heun",
    "sample_heun_reuse",
    "sample_dpm",
    "sample_euler_ancestral",
    "sample_guided_interval",
    "gi_segment_runs",
    "cond_segment_denoise_fn",
    "half_model_kwargs",
    "karras_sample",
]

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]]


def get_sigmas_karras(
    n: int, sigma_min: float, sigma_max: float, rho: float = 7.0
) -> np.ndarray:
    """The rho-spaced noise schedule of Karras et al. (2022), with a final 0.

    Computed in float64 on the host; length n+1.
    """
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.append(sigmas, 0.0)


def to_d(x: jnp.ndarray, sigma: jnp.ndarray, denoised: jnp.ndarray) -> jnp.ndarray:
    """Convert a denoiser output to the Karras ODE derivative dx/dsigma."""
    return (x - denoised) / _append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from: jnp.ndarray, sigma_to: jnp.ndarray):
    """(sigma_down, sigma_up) for an ancestral step from sigma_from to sigma_to."""
    sigma_up = jnp.sqrt(
        sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2
    )
    sigma_down = jnp.sqrt(sigma_to**2 - sigma_up**2)
    return sigma_down, sigma_up


def _append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    return x.reshape(x.shape + (1,) * (target_ndim - x.ndim))


class KarrasDenoiser:
    """EDM preconditioning (c_skip / c_out / c_in) and sigma-space training loss.

    Parity target: ``/root/reference/diffusion/k_diffusion.py:31-76``.
    """

    def __init__(self, sigma_data: float = 0.5):
        self.sigma_data = sigma_data

    def get_snr(self, sigmas):
        return sigmas**-2

    def get_sigmas(self, sigmas):
        return sigmas

    def get_scalings(self, sigma):
        c_skip = self.sigma_data**2 / (sigma**2 + self.sigma_data**2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + self.sigma_data**2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)
        return c_skip, c_out, c_in

    def denoise(self, model, x_t, sigmas, **model_kwargs):
        nd = x_t.ndim
        c_skip, c_out, c_in = [
            _append_dims(c, nd) for c in self.get_scalings(sigmas)
        ]
        rescaled_t = 1000 * 0.25 * jnp.log(sigmas + 1e-44)
        model_output, _ = _split_model_output(
            model(c_in * x_t, rescaled_t, **model_kwargs)
        )
        denoised = c_out * model_output + c_skip * x_t
        return model_output, denoised

    def training_losses(self, model, x_start, sigmas, noise, model_kwargs=None):
        model_kwargs = model_kwargs or {}
        nd = x_start.ndim
        x_t = x_start + noise * _append_dims(sigmas, nd)
        c_skip, c_out, _ = [_append_dims(c, nd) for c in self.get_scalings(sigmas)]
        model_output, denoised = self.denoise(model, x_t, sigmas, **model_kwargs)
        target = (x_start - c_skip * x_t) / c_out
        terms = {
            "mse": mean_flat((model_output - target) ** 2),
            "xs_mse": mean_flat((denoised - x_start) ** 2),
        }
        terms["loss"] = terms["mse"]
        return terms


def sigma_to_t(diffusion: GaussianDiffusion, sigma: jnp.ndarray) -> jnp.ndarray:
    """Map EDM sigma to the (truncated) discrete DDPM timestep.

    Piecewise-linear interpolation of alphas_cumprod -> t with boundary
    clamping, truncated toward zero — matching the reference's
    ``interp1d`` + cast-to-long semantics (``k_diffusion.py:85-103``).
    """
    alpha_cumprod = 1.0 / (sigma.astype(jnp.float32) ** 2 + 1.0)
    # alphas_cumprod is decreasing; jnp.interp needs ascending xp.
    xp = jnp.asarray(diffusion.alphas_cumprod[::-1].copy(), dtype=jnp.float32)
    fp = jnp.arange(diffusion.num_timesteps - 1, -1, -1, dtype=jnp.float32)
    t_float = jnp.interp(alpha_cumprod, xp, fp)
    return t_float.astype(jnp.int32)


def gaussian_denoise_fn(
    model,
    diffusion: GaussianDiffusion,
    clip_denoised: bool = True,
    model_kwargs: Optional[Dict[str, Any]] = None,
    state_key: str = "prev_latent",
) -> DenoiseFn:
    """Adapt a DDPM model+process into a stateful sigma-space denoiser.

    The model's tuple extra (the RIN latent) becomes the threaded state,
    passed back in as ``model_kwargs[state_key]`` on the next call —
    functional equivalent of ``GaussianToKarrasDenoiser.denoise`` plus the
    nonlocal prev-latent threading (``k_diffusion.py:98-108,189-203``).
    """
    model_kwargs = dict(model_kwargs or {})
    model_kwargs.pop(state_key, None)

    def denoise(x_t, sigmas, state):
        t = sigma_to_t(diffusion, sigmas)
        c_in = _append_dims(1.0 / jnp.sqrt(sigmas**2 + 1.0), x_t.ndim)
        kwargs = dict(model_kwargs)
        if state is not None:
            kwargs[state_key] = state
        out = diffusion.p_mean_variance(
            model, x_t * c_in, t, clip_denoised=clip_denoised, model_kwargs=kwargs
        )
        new_state = out["extra"] if out["extra"] is not None else state
        return out["pred_xstart"], new_state

    return denoise


def guided_denoise_fn(denoise_fn: DenoiseFn, guidance_scale: float) -> DenoiseFn:
    """Classifier-free guidance over a 2B-batched denoiser.

    Expects x of shape [B, ...] and a denoiser whose conditioning kwargs are
    already 2B-batched (cond rows then zeroed rows). Runs ONE fused forward
    of 2B rows per call; both branches' self-conditioning states live in the
    single [2B, ...] state pytree.
    """

    def denoise(x, sigmas, state):
        x2 = jnp.concatenate([x, x], axis=0)
        s2 = jnp.concatenate([sigmas, sigmas], axis=0)
        x0_2, state = denoise_fn(x2, s2, state)
        cond_x0, uncond_x0 = jnp.split(x0_2, 2, axis=0)
        return uncond_x0 + guidance_scale * (cond_x0 - uncond_x0), state

    return denoise


def _churn(x, key, sigma, next_gamma, s_noise):
    """Apply s_churn noise injection; returns (x_hat, sigma_hat)."""
    sigma_hat = sigma * (next_gamma + 1.0)
    eps = jax.random.normal(key, x.shape, dtype=x.dtype) * s_noise
    bump = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
    return x + eps * bump, sigma_hat


def _gamma_for(sigma, n_steps, s_churn, s_tmin, s_tmax):
    gamma_const = min(s_churn / n_steps, 2**0.5 - 1)
    in_range = (s_tmin <= sigma) & (sigma <= s_tmax)
    return jnp.where(in_range, gamma_const, 0.0)


def sample_heun(
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    sigmas: np.ndarray,
    key: jax.Array,
    *,
    state: Any = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    progressive: bool = False,
    final_to_zero: bool = True,
):
    """Karras Algorithm 2 (Heun) as one scan + a final Euler step.

    All interior steps do the two-call Heun update; the last step (to
    sigma=0) is pure Euler, exactly as the reference branches on
    ``sigmas[i+1] == 0`` (``k_diffusion.py:300-309``). State is updated by
    BOTH the predictor and corrector denoiser calls, in order.

    ``final_to_zero=False`` runs a SEGMENT of a larger grid (the passed
    ``sigmas`` end mid-trajectory, not at 0): every step is a uniform
    two-call Heun step, the final-Euler special case is skipped, and
    ``pred_xstart`` is None (segment consumers read ``x``/``state`` only;
    ``progressive`` still yields the per-step trajectory of the segment).
    Used by :func:`sample_guided_interval`.

    Returns dict with ``x`` (final sample) and ``pred_xstart`` (the last
    main-call denoised — the value the reference's consumer reads), plus
    stacked per-step trajectories when ``progressive``.
    """
    n = len(sigmas) - 1
    B = x_T.shape[0]
    sig = jnp.asarray(sigmas, dtype=jnp.float32)
    s_in = jnp.ones((B,), dtype=x_T.dtype)

    def step(carry, i):
        x, k, st = carry
        k, k_eps = jax.random.split(k)
        sigma_i, sigma_next = sig[i], sig[i + 1]
        gamma = _gamma_for(sigma_i, n, s_churn, s_tmin, s_tmax)
        x, sigma_hat = _churn(x, k_eps, sigma_i, gamma, s_noise)
        denoised, st = denoise_fn(x, sigma_hat * s_in, st)
        d = to_d(x, sigma_hat, denoised)
        dt = sigma_next - sigma_hat
        x_2 = x + d * dt
        denoised_2, st = denoise_fn(x_2, sigma_next * s_in, st)
        d_2 = to_d(x_2, sigma_next, denoised_2)
        x = x + (d + d_2) / 2.0 * dt
        ys = (x, denoised, sigma_i) if progressive else None
        return (x, k, st), ys

    if not final_to_zero:
        (x, key, state), ys = jax.lax.scan(step, (x_T, key, state), jnp.arange(n))
        out = {"x": x, "pred_xstart": None, "state": state}
        if progressive:
            out["trajectory"] = {"x": ys[0], "pred_xstart": ys[1], "sigma": ys[2]}
        return out

    (x, key, state), ys = jax.lax.scan(
        step, (x_T, key, state), jnp.arange(n - 1)
    )

    # Final step to sigma=0: Euler only.
    key, k_eps = jax.random.split(key)
    sigma_i = sig[n - 1]
    gamma = _gamma_for(sigma_i, n, s_churn, s_tmin, s_tmax)
    x, sigma_hat = _churn(x, k_eps, sigma_i, gamma, s_noise)
    denoised, state = denoise_fn(x, sigma_hat * s_in, state)
    x = x + to_d(x, sigma_hat, denoised) * (0.0 - sigma_hat)

    out = {"x": x, "pred_xstart": denoised, "state": state}
    if progressive:
        out["trajectory"] = {
            "x": jnp.concatenate([ys[0], x[None]], axis=0),
            "pred_xstart": jnp.concatenate([ys[1], denoised[None]], axis=0),
            "sigma": jnp.concatenate([ys[2], sigma_i[None]], axis=0),
        }
    return out


def sample_heun_reuse(
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    sigmas: np.ndarray,
    key: jax.Array,
    *,
    state: Any = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    progressive: bool = False,
    final_to_zero: bool = True,
):
    """Heun on the Karras grid with PFDiff-style past-score reuse
    (arXiv:2408.08822's past-gradient replacement, specialised to Heun).

    Each interior step's PREDICTOR score is not re-evaluated: the previous
    step's corrector already called the denoiser at this sigma, at the Euler
    point x-tilde that sits only O(h^2) from the accepted x. Re-anchoring
    that denoised prediction at the accepted x perturbs the predictor slope
    by O(h^2), so the per-step O(h^3) local error class of Heun is
    preserved while the denoiser call count drops from ``2(n-1)+1`` to
    ``n+1`` — a ~2x NFE cut at the same step grid. Step 0 does the full
    two-call Heun update (no past score exists) and the final step to
    sigma=0 is a fresh-call Euler exactly like :func:`sample_heun`.

    Numerics change (it is an approximation of heun, not a reparenthesising
    of it), so the scheme is quality-gated on a trained checkpoint before
    any default uses it: see ``scripts/trained_gates.py`` / the "reuse" rows
    of ``docs/trained_gates.json``.

    ``s_churn`` must be 0: churn bumps x with fresh noise BEFORE the
    predictor slope is taken, which invalidates the reused score.
    """
    if s_churn != 0.0:
        raise NotImplementedError("heun_reuse requires s_churn == 0")
    del s_tmin, s_tmax, s_noise, key  # no churn -> no noise draws
    n = len(sigmas) - 1
    B = x_T.shape[0]
    sig = jnp.asarray(sigmas, dtype=jnp.float32)
    s_in = jnp.ones((B,), dtype=x_T.dtype)

    x = x_T
    ys0 = ys = None
    min_full = 2 if final_to_zero else 1
    if n >= min_full:
        # step 0: full two-call Heun (no past score exists yet)
        sigma0, sigma1 = sig[0], sig[1]
        denoised, state = denoise_fn(x, sigma0 * s_in, state)
        d = to_d(x, sigma0, denoised)
        dt = sigma1 - sigma0
        x_2 = x + d * dt
        denoised_prev, state = denoise_fn(x_2, sigma1 * s_in, state)
        d_2 = to_d(x_2, sigma1, denoised_prev)
        x = x + (d + d_2) / 2.0 * dt
        if progressive:
            ys0 = (x[None], denoised[None], sigma0[None])

        def step(carry, i):
            x, den_prev, st = carry
            sigma_i, sigma_next = sig[i], sig[i + 1]
            d = to_d(x, sigma_i, den_prev)  # reused score, fresh anchor
            dt = sigma_next - sigma_i
            x_2 = x + d * dt
            denoised_2, st = denoise_fn(x_2, sigma_next * s_in, st)
            d_2 = to_d(x_2, sigma_next, denoised_2)
            x_new = x + (d + d_2) / 2.0 * dt
            ys_i = (x_new, den_prev, sigma_i) if progressive else None
            return (x_new, denoised_2, st), ys_i

        scan_hi = n - 1 if final_to_zero else n
        (x, _, state), ys = jax.lax.scan(
            step, (x, denoised_prev, state), jnp.arange(1, scan_hi)
        )

    if not final_to_zero:
        # Segment of a larger grid (see sample_heun): no final-Euler
        # special case; every remaining step was a reuse-Heun step.
        out = {"x": x, "pred_xstart": None, "state": state}
        if progressive:
            parts = [p for p in (ys0, ys) if p is not None]
            out["trajectory"] = {
                "x": jnp.concatenate([p[0] for p in parts], axis=0),
                "pred_xstart": jnp.concatenate([p[1] for p in parts], axis=0),
                "sigma": jnp.concatenate([p[2] for p in parts], axis=0),
            }
        return out

    # Final step to sigma=0: fresh-call Euler, matching sample_heun (the
    # pred_xstart the consumer reads comes from a real denoiser call).
    sigma_i = sig[n - 1]
    denoised, state = denoise_fn(x, sigma_i * s_in, state)
    x = x + to_d(x, sigma_i, denoised) * (0.0 - sigma_i)

    out = {"x": x, "pred_xstart": denoised, "state": state}
    if progressive:
        parts_x = [x[None]]
        parts_p = [denoised[None]]
        parts_s = [sigma_i[None]]
        if ys is not None:
            parts_x.insert(0, ys[0])
            parts_p.insert(0, ys[1])
            parts_s.insert(0, ys[2])
        if ys0 is not None:
            parts_x.insert(0, ys0[0])
            parts_p.insert(0, ys0[1])
            parts_s.insert(0, ys0[2])
        out["trajectory"] = {
            "x": jnp.concatenate(parts_x, axis=0),
            "pred_xstart": jnp.concatenate(parts_p, axis=0),
            "sigma": jnp.concatenate(parts_s, axis=0),
        }
    return out


def sample_dpm(
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    sigmas: np.ndarray,
    key: jax.Array,
    *,
    state: Any = None,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    progressive: bool = False,
):
    """DPM-Solver-2-style midpoint sampler as one fused scan.

    The midpoint sigma is strictly positive even on the final step, so the
    scan body is uniform across all n steps (reference
    ``k_diffusion.py:314-351``).
    """
    n = len(sigmas) - 1
    B = x_T.shape[0]
    sig = jnp.asarray(sigmas, dtype=jnp.float32)
    s_in = jnp.ones((B,), dtype=x_T.dtype)

    def step(carry, i):
        x, k, st, _ = carry
        k, k_eps = jax.random.split(k)
        sigma_i, sigma_next = sig[i], sig[i + 1]
        gamma = _gamma_for(sigma_i, n, s_churn, s_tmin, s_tmax)
        x, sigma_hat = _churn(x, k_eps, sigma_i, gamma, s_noise)
        denoised, st = denoise_fn(x, sigma_hat * s_in, st)
        d = to_d(x, sigma_hat, denoised)
        sigma_mid = ((sigma_hat ** (1 / 3) + sigma_next ** (1 / 3)) / 2.0) ** 3
        dt_1 = sigma_mid - sigma_hat
        dt_2 = sigma_next - sigma_hat
        x_2 = x + d * dt_1
        denoised_2, st = denoise_fn(x_2, sigma_mid * s_in, st)
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        x = x + d_2 * dt_2
        ys = (x, denoised, sigma_i) if progressive else None
        return (x, k, st, denoised), ys

    (x, _, state, last_denoised), ys = jax.lax.scan(
        step, (x_T, key, state, jnp.zeros_like(x_T)), jnp.arange(n)
    )
    # The value the reference's consumer reads is the last main-call denoised.
    out = {"x": x, "pred_xstart": last_denoised, "state": state}
    if progressive:
        out["trajectory"] = {"x": ys[0], "pred_xstart": ys[1], "sigma": ys[2]}
    return out


def sample_euler_ancestral(
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    sigmas: np.ndarray,
    key: jax.Array,
    *,
    state: Any = None,
    progressive: bool = False,
):
    """Ancestral sampling with Euler steps as one fused scan
    (reference ``k_diffusion.py:248-266``)."""
    n = len(sigmas) - 1
    B = x_T.shape[0]
    sig = jnp.asarray(sigmas, dtype=jnp.float32)
    s_in = jnp.ones((B,), dtype=x_T.dtype)

    def step(carry, i):
        x, k, st = carry
        k, k_noise = jax.random.split(k)
        sigma_i, sigma_next = sig[i], sig[i + 1]
        denoised, st = denoise_fn(x, sigma_i * s_in, st)
        sigma_down, sigma_up = get_ancestral_step(sigma_i, sigma_next)
        d = to_d(x, sigma_i, denoised)
        x = x + d * (sigma_down - sigma_i)
        x = x + jax.random.normal(k_noise, x.shape, dtype=x.dtype) * sigma_up
        ys = (x, denoised, sigma_i) if progressive else None
        return (x, k, st), ys

    (x, _, state), ys = jax.lax.scan(step, (x_T, key, state), jnp.arange(n))
    out = {"x": x, "pred_xstart": x, "state": state}
    if progressive:
        out["trajectory"] = {"x": ys[0], "pred_xstart": ys[1], "sigma": ys[2]}
    return out


_SAMPLERS = {
    "heun": sample_heun,
    "heun_reuse": sample_heun_reuse,
    "dpm": sample_dpm,
    "ancestral": sample_euler_ancestral,
}


def half_model_kwargs(model_kwargs, batch_size: int):
    """The conditional half of 2B-batched CFG model kwargs.

    CFG kwargs are built as [cond rows | zeroed rows]
    (``pcdiff.diffusion.sampler``/``models.wrapper``, mirroring reference
    ``sampler.py:133-136``); any leaf whose leading dim is 2B is sliced to
    its first B rows, everything else passes through.
    """
    def half(v):
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 \
                and v.shape[0] == 2 * batch_size:
            return v[:batch_size]
        return v

    return {k: half(v) for k, v in (model_kwargs or {}).items()}


def gi_segment_runs(
    sigmas: np.ndarray, guidance_interval: Tuple[float, float]
):
    """Static segmentation of a sigma grid by CFG membership.

    Returns ``[(first_step, last_step_exclusive, cfg_on)]`` — contiguous
    runs of steps whose anchor sigma is inside/outside ``[lo, hi]``. Host
    computation over the static grid; shared by the monolithic
    :func:`sample_guided_interval` and the concurrently-compiled
    per-segment programs (:mod:`pcdiff.diffusion.precompile`).
    """
    lo, hi = guidance_interval
    n = len(sigmas) - 1
    use_cfg = [bool(lo <= float(sigmas[i]) <= hi) for i in range(n)]
    runs = []
    i = 0
    while i < n:
        j = i
        while j < n and use_cfg[j] == use_cfg[i]:
            j += 1
        runs.append((i, j, use_cfg[i]))
        i = j
    return runs


def cond_segment_denoise_fn(denoise_cond: DenoiseFn, B: int) -> DenoiseFn:
    """Wrap a B-row conditional denoiser to run against a 2B CFG state:
    reads/writes the first B state rows, leaves the unconditional rows
    untouched (they resume, one segment stale, when CFG re-engages)."""

    def cond_segment_denoise(x, s, full_state):
        if full_state is None:
            return denoise_cond(x, s, None)
        half = jax.tree.map(lambda l: l[:B], full_state)
        x0, half = denoise_cond(x, s, half)
        merged = jax.tree.map(
            lambda full, h: jax.lax.dynamic_update_slice_in_dim(
                full, h.astype(full.dtype), 0, axis=0
            ),
            full_state,
            half,
        )
        return x0, merged

    return cond_segment_denoise


def sample_guided_interval(
    denoise_cond: DenoiseFn,
    denoise_cfg: DenoiseFn,
    x_T: jnp.ndarray,
    sigmas: np.ndarray,
    key: jax.Array,
    *,
    state: Any = None,
    guidance_interval: Tuple[float, float],
    sampler: str = "heun_reuse",
    cond_batch: Optional[int] = None,
    progressive: bool = False,
):
    """CFG restricted to a sigma interval (Kynkaanniemi et al. 2024,
    arXiv:2404.07724 "Applying guidance in a limited interval").

    Steps whose anchor sigma lies in ``[lo, hi]`` use the guided denoiser
    (2B-row fused cond/uncond forward, ``denoise_cfg``); all other steps
    call ``denoise_cond`` — the conditional branch ALONE at B rows, i.e.
    the unconditional half of the network cost vanishes outside the
    interval. The sigma grid is static, so the trajectory splits into
    static contiguous segments, each compiled as its own fused scan
    (``final_to_zero`` marks the true last segment) — no data-dependent
    control flow ever reaches XLA.

    State threading: ``state`` covers the 2B CFG rows; cond-only segments
    read/write its first B rows and leave the unconditional rows untouched
    (they resume, one-segment stale, when the interval re-engages). Like
    the reuse solver this changes sampler numerics vs always-on CFG, so it
    is quality-gated on a trained checkpoint (docs/trained_gates.json)
    before any default uses it.

    ``denoise_cond`` must close over the COND-HALF model kwargs
    (:func:`half_model_kwargs`) and expect B-row states.

    ``progressive`` concatenates the per-segment step trajectories into one
    n-entry trajectory — the same per-step yield surface as the plain
    solvers (reference ``sampler.py:165-171`` semantics).
    """
    runs = gi_segment_runs(sigmas, guidance_interval)
    n = len(sigmas) - 1
    B = int(cond_batch if cond_batch is not None else x_T.shape[0])
    cond_segment_denoise = cond_segment_denoise_fn(denoise_cond, B)

    solver = _SAMPLERS[sampler]
    x, out = x_T, None
    trajectories = []
    for a, b, cfg_on in runs:
        key, sub = jax.random.split(key)
        out = solver(
            denoise_cfg if cfg_on else cond_segment_denoise,
            x,
            sigmas[a : b + 1],
            sub,
            state=state,
            final_to_zero=(b == n),
            progressive=progressive,
        )
        x, state = out["x"], out["state"]
        if progressive:
            trajectories.append(out["trajectory"])
    if progressive:
        # One step-per-entry trajectory across all segments (n entries
        # total), matching the single-segment solvers' progressive layout.
        out["trajectory"] = {
            k: jnp.concatenate([t[k] for t in trajectories], axis=0)
            for k in ("x", "pred_xstart", "sigma")
        }
    return out


def karras_sample(
    diffusion,
    model,
    shape,
    steps: int,
    key: jax.Array,
    *,
    clip_denoised: bool = True,
    model_kwargs: Optional[Dict[str, Any]] = None,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    sampler: str = "heun",
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    guidance_scale: float = 0.0,
    guidance_interval: Optional[Tuple[float, float]] = None,
    init_state: Any = None,
    progressive: bool = False,
    parallel_options: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """End-to-end Karras sampling (reference ``karras_sample_progressive``,
    ``k_diffusion.py:118-222``) as a single jittable program.

    With guidance, ``model_kwargs`` must already be 2B-batched (conditional
    rows then zeroed rows — see :class:`pcdiff.diffusion.sampler.PointCloudSampler`)
    and ``shape`` is the UNDOUBLED [B, N, C]; ``init_state`` (if the model is
    self-conditioning) must cover the 2B rows.
    """
    sigmas = get_sigmas_karras(steps, sigma_min, sigma_max, rho)
    key, init_key = jax.random.split(key)
    x_T = jax.random.normal(init_key, tuple(shape)) * sigma_max

    def make_base(kw):
        if isinstance(diffusion, KarrasDenoiser):
            def base(x_t, s, state):
                _, denoised = diffusion.denoise(model, x_t, s, **(kw or {}))
                if clip_denoised:
                    denoised = jnp.clip(denoised, -1.0, 1.0)
                return denoised, state
            return base
        if isinstance(diffusion, GaussianDiffusion):
            return gaussian_denoise_fn(
                model, diffusion, clip_denoised=clip_denoised, model_kwargs=kw
            )
        raise NotImplementedError(type(diffusion))

    base_denoise = make_base(model_kwargs)

    if guidance_scale not in (0.0, 1.0):
        denoise = guided_denoise_fn(base_denoise, guidance_scale)
    else:
        denoise = base_denoise

    if guidance_interval is not None and guidance_scale not in (0.0, 1.0):
        if sampler not in ("heun", "heun_reuse"):
            # heun_parallel is excluded by design: its Picard sweeps revisit
            # every step each iteration, so there is no per-step "final"
            # value to yield until convergence — no progressive mode either.
            raise NotImplementedError(
                "guidance_interval supports heun/heun_reuse only"
            )
        if s_churn != 0.0:
            raise NotImplementedError("guidance_interval requires s_churn == 0")
        B = int(shape[0])
        denoise_cond = make_base(half_model_kwargs(model_kwargs, B))
        out = sample_guided_interval(
            denoise_cond, denoise, x_T, sigmas, key,
            state=init_state, guidance_interval=guidance_interval,
            sampler=sampler, cond_batch=B, progressive=progressive,
        )
        if isinstance(diffusion, GaussianDiffusion):
            out["x"] = diffusion.unscale_channels(out["x"])
            if out.get("pred_xstart") is not None:
                out["pred_xstart"] = diffusion.unscale_channels(out["pred_xstart"])
            if progressive:
                out["trajectory"]["x"] = diffusion.unscale_channels(
                    out["trajectory"]["x"]
                )
                out["trajectory"]["pred_xstart"] = diffusion.unscale_channels(
                    out["trajectory"]["pred_xstart"]
                )
        return out

    if sampler == "heun_parallel":
        from .parallel import sample_heun_parallel

        if progressive:
            raise NotImplementedError("heun_parallel has no progressive mode")
        out = sample_heun_parallel(
            denoise, x_T, sigmas, key, state=init_state, s_churn=s_churn,
            **(parallel_options or {}),
        )
    else:
        kwargs = dict(state=init_state, progressive=progressive)
        if sampler != "ancestral":
            kwargs.update(
                s_churn=s_churn, s_tmin=s_tmin, s_tmax=s_tmax, s_noise=s_noise
            )
        out = _SAMPLERS[sampler](denoise, x_T, sigmas, key, **kwargs)

    if isinstance(diffusion, GaussianDiffusion):
        out["x"] = diffusion.unscale_channels(out["x"])
        if out.get("pred_xstart") is not None:
            out["pred_xstart"] = diffusion.unscale_channels(out["pred_xstart"])
        if progressive:
            out["trajectory"]["x"] = diffusion.unscale_channels(out["trajectory"]["x"])
            out["trajectory"]["pred_xstart"] = diffusion.unscale_channels(
                out["trajectory"]["pred_xstart"]
            )
    return out
