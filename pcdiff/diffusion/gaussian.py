"""Gaussian (DDPM) diffusion as pure functions over precomputed tables.

TPU-first re-design of the reference's DDPM machinery
(``/root/reference/diffusion/gaussian_diffusion.py:127-1095``), keeping its
math bit-compatible where it matters:

- coefficient tables are computed once in float64 numpy (reference
  ``:162-196``) and enter jitted programs as float32 constants;
- ``model_mean_type`` in {epsilon, x_start, x_prev}, ``model_var_type`` in
  {fixed_small, fixed_large, learned, learned_range}, ``loss_type`` in
  {mse, rescaled_mse, kl, rescaled_kl} (reference ``:291-341, 762-863``);
- the fork's chamfer auxiliary losses scaled by ``sqrt(alpha_bar_t)``
  (reference ``:848-860``);
- ``SpacedDiffusion`` timestep respacing (reference ``:1044-1095``).

Layout convention: this framework is channels-LAST (``[B, N, C]``) everywhere;
the reference is channels-first (``[B, C, N]``). Channel scales/biases and the
learned-variance split therefore act on axis -1.

Sampling loops (ancestral and DDIM) are single fused ``lax.scan`` programs:
one XLA compilation, zero per-step Python dispatch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.ops import chamfer_distance_color, chamfer_distance_xyz
from .schedules import get_named_beta_schedule, space_timesteps

__all__ = [
    "GaussianDiffusion",
    "SpacedDiffusion",
    "diffusion_from_betas",
    "mean_flat",
    "normal_kl",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
]

# A model function maps (x, t, **kwargs) -> output array, or a tuple whose
# first element is the output (extras — e.g. the RIN latent — ride along).
ModelFn = Callable[..., Any]


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes -> [B]."""
    return x.reshape(x.shape[0], -1).mean(axis=1)


def normal_kl(mean1, logvar1, mean2, logvar2) -> jnp.ndarray:
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)), broadcasting all args."""
    mean1, logvar1, mean2, logvar2 = map(jnp.asarray, (mean1, logvar1, mean2, logvar2))
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-based fast approximation of the standard normal CDF."""
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales) -> jnp.ndarray:
    """Log-likelihood of a Gaussian discretized to 1/255 bins on [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    log_cdf_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, min=1e-12))
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, log_cdf_delta),
    )


def _split_model_output(out: Any) -> Tuple[jnp.ndarray, Any]:
    """Normalize model output to (array, extra)."""
    if isinstance(out, tuple):
        return out[0], (out[1] if len(out) == 2 else out[1:])
    return out, None


class GaussianDiffusion:
    """Diffusion-process coefficient tables plus pure sampling/loss functions.

    Instances are cheap, immutable Python objects holding float64 numpy
    tables; methods are pure jnp functions safe to close over inside ``jit``.
    """

    def __init__(
        self,
        *,
        betas: Sequence[float],
        model_mean_type: str = "epsilon",
        model_var_type: str = "fixed_small",
        loss_type: str = "mse",
        discretized_t0: bool = False,
        channel_scales: Optional[np.ndarray] = None,
        channel_biases: Optional[np.ndarray] = None,
    ):
        assert model_mean_type in ("epsilon", "x_start", "x_prev")
        assert model_var_type in ("fixed_small", "fixed_large", "learned", "learned_range")
        assert loss_type in ("mse", "rescaled_mse", "kl", "rescaled_kl")
        self.model_mean_type = model_mean_type
        self.model_var_type = model_var_type
        self.loss_type = loss_type
        self.discretized_t0 = discretized_t0
        self.channel_scales = (
            None if channel_scales is None else np.asarray(channel_scales, dtype=np.float64)
        )
        self.channel_biases = (
            None if channel_biases is None else np.asarray(channel_biases, dtype=np.float64)
        )

        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        self.betas = betas
        self.num_timesteps = int(betas.shape[0])

        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas, axis=0)
        self.alphas_cumprod_prev = np.append(1.0, self.alphas_cumprod[:-1])
        self.alphas_cumprod_next = np.append(self.alphas_cumprod[1:], 0.0)

        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)
        self.log_one_minus_alphas_cumprod = np.log(1.0 - self.alphas_cumprod)
        self.sqrt_recip_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod)
        self.sqrt_recipm1_alphas_cumprod = np.sqrt(1.0 / self.alphas_cumprod - 1)

        self.posterior_variance = (
            betas * (1.0 - self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        # log is clipped: posterior variance is 0 at the chain's start
        self.posterior_log_variance_clipped = np.log(
            np.append(self.posterior_variance[1], self.posterior_variance[1:])
        )
        self.posterior_mean_coef1 = (
            betas * np.sqrt(self.alphas_cumprod_prev) / (1.0 - self.alphas_cumprod)
        )
        self.posterior_mean_coef2 = (
            (1.0 - self.alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - self.alphas_cumprod)
        )
        # "fixed_large" variance tables (better decoder likelihood at t=0)
        self.fixed_large_variance = np.append(self.posterior_variance[1], betas[1:])
        self.fixed_large_log_variance = np.log(self.fixed_large_variance)

    # ---------------------------------------------------------------- tables

    @staticmethod
    def _extract(table: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """Gather float32 table values at t and broadcast to ndim dims."""
        vals = jnp.take(jnp.asarray(table, dtype=jnp.float32), t, axis=0)
        return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))

    def get_sigmas(self, t: jnp.ndarray) -> jnp.ndarray:
        return self._extract(self.sqrt_recipm1_alphas_cumprod, t, t.ndim)

    # -------------------------------------------------------------- q-process

    def q_mean_variance(self, x_start: jnp.ndarray, t: jnp.ndarray):
        """Moments of q(x_t | x_0)."""
        nd = x_start.ndim
        mean = self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
        variance = self._extract(1.0 - self.alphas_cumprod, t, nd)
        log_variance = self._extract(self.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Sample x_t ~ q(x_t | x_0) with the given standard-normal noise."""
        nd = x_start.ndim
        return (
            self._extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + self._extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_posterior_mean_variance(self, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray):
        """Moments of the diffusion posterior q(x_{t-1} | x_t, x_0)."""
        nd = x_t.ndim
        mean = (
            self._extract(self.posterior_mean_coef1, t, nd) * x_start
            + self._extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        variance = self._extract(self.posterior_variance, t, nd)
        log_variance = self._extract(self.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    # -------------------------------------------------------------- p-process

    def p_mean_variance(
        self,
        model: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool = False,
        denoised_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """Moments of p(x_{t-1} | x_t) plus the model's x_0 prediction.

        Returns dict with mean / variance / log_variance / pred_xstart / extra.
        """
        model_kwargs = model_kwargs or {}
        nd = x.ndim
        model_output, extra = _split_model_output(model(x, t, **model_kwargs))

        if self.model_var_type in ("learned", "learned_range"):
            C = x.shape[-1]
            assert model_output.shape[-1] == 2 * C
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            if self.model_var_type == "learned":
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = self._extract(self.posterior_log_variance_clipped, t, nd)
                max_log = self._extract(np.log(self.betas), t, nd)
                frac = (model_var_values + 1.0) / 2.0  # model output in [-1, 1]
                model_log_variance = frac * max_log + (1.0 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            var_table, logvar_table = {
                "fixed_large": (self.fixed_large_variance, self.fixed_large_log_variance),
                "fixed_small": (self.posterior_variance, self.posterior_log_variance_clipped),
            }[self.model_var_type]
            model_variance = self._extract(var_table, t, nd) * jnp.ones_like(x)
            model_log_variance = self._extract(logvar_table, t, nd) * jnp.ones_like(x)

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                xs = jnp.clip(xs, -1.0, 1.0)
            return xs

        if self.model_mean_type == "x_prev":
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x_t=x, t=t, xprev=model_output)
            )
            model_mean = model_output
        else:
            if self.model_mean_type == "x_start":
                pred_xstart = process_xstart(model_output)
            else:  # epsilon
                pred_xstart = process_xstart(
                    self._predict_xstart_from_eps(x_t=x, t=t, eps=model_output)
                )
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
            "extra": extra,
        }

    def _predict_xstart_from_eps(self, x_t, t, eps):
        nd = x_t.ndim
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        nd = x_t.ndim
        return (
            self._extract(1.0 / self.posterior_mean_coef1, t, nd) * xprev
            - self._extract(self.posterior_mean_coef2 / self.posterior_mean_coef1, t, nd) * x_t
        )

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        nd = x_t.ndim
        return (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
        ) / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    # ----------------------------------------------------- guided conditioning

    def condition_mean(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Shift the mean by variance * grad(log p(y|x)) (Sohl-Dickstein)."""
        gradient = cond_fn(x, t, **(model_kwargs or {}))
        return p_mean_var["mean"] + p_mean_var["variance"] * gradient

    def condition_score(self, cond_fn, p_mean_var, x, t, model_kwargs=None):
        """Condition the implied score function (Song et al. 2020)."""
        nd = x.ndim
        alpha_bar = self._extract(self.alphas_cumprod, t, nd)
        eps = self._predict_eps_from_xstart(x, t, p_mean_var["pred_xstart"])
        eps = eps - jnp.sqrt(1.0 - alpha_bar) * cond_fn(x, t, **(model_kwargs or {}))
        out = dict(p_mean_var)
        out["pred_xstart"] = self._predict_xstart_from_eps(x, t, eps)
        out["mean"], _, _ = self.q_posterior_mean_variance(out["pred_xstart"], x, t)
        return out

    # ------------------------------------------------------------- ancestral

    def p_sample(
        self,
        model: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        key: jax.Array,
        clip_denoised: bool = False,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
    ) -> Dict[str, jnp.ndarray]:
        """One ancestral step: sample x_{t-1} given x_t."""
        out = self.p_mean_variance(
            model, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t, model_kwargs=model_kwargs)
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def p_sample_loop(
        self,
        model: ModelFn,
        shape: Sequence[int],
        key: jax.Array,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = False,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        progressive: bool = False,
    ):
        """Full ancestral sampling chain as one fused ``lax.scan``.

        Returns the final sample, or (if ``progressive``) a dict of per-step
        stacked ``sample`` / ``pred_xstart`` trajectories (T leading axis,
        ordered from t=T-1 down to t=0) — the scan-native equivalent of the
        reference's ``p_sample_loop_progressive`` generator (``:499-547``).
        """
        key, init_key = jax.random.split(key)
        x_T = noise if noise is not None else jax.random.normal(init_key, tuple(shape))
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        B = shape[0]

        def step(carry, t_scalar):
            x, k = carry
            k, sub = jax.random.split(k)
            t_batch = jnp.full((B,), t_scalar, dtype=jnp.int32)
            out = self.p_sample(
                model, x, t_batch, sub, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, cond_fn=cond_fn, model_kwargs=model_kwargs,
            )
            ys = (out["sample"], out["pred_xstart"]) if progressive else None
            return (out["sample"], k), ys

        (x_final, _), ys = jax.lax.scan(step, (x_T, key), ts)
        if progressive:
            return {"sample": ys[0], "pred_xstart": ys[1]}
        return x_final

    # ------------------------------------------------------------------ DDIM

    def ddim_sample(
        self,
        model: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        key: jax.Array,
        clip_denoised: bool = False,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
    ) -> Dict[str, jnp.ndarray]:
        """One DDIM step (eta=0 is deterministic)."""
        out = self.p_mean_variance(
            model, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t, model_kwargs=model_kwargs)
        nd = x.ndim
        eps = self._predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = self._extract(self.alphas_cumprod, t, nd)
        alpha_bar_prev = self._extract(self.alphas_cumprod_prev, t, nd)
        sigma = (
            eta
            * jnp.sqrt((1.0 - alpha_bar_prev) / (1.0 - alpha_bar))
            * jnp.sqrt(1.0 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1.0 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
        sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self,
        model: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool = False,
        denoised_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
    ) -> Dict[str, jnp.ndarray]:
        """One reverse-ODE (encoding) DDIM step; requires eta=0."""
        assert eta == 0.0, "reverse ODE only for deterministic path"
        out = self.p_mean_variance(
            model, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_kwargs=model_kwargs,
        )
        nd = x.ndim
        eps = (
            self._extract(self.sqrt_recip_alphas_cumprod, t, nd) * x
            - out["pred_xstart"]
        ) / self._extract(self.sqrt_recipm1_alphas_cumprod, t, nd)
        alpha_bar_next = self._extract(self.alphas_cumprod_next, t, nd)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1.0 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    def ddim_sample_loop(
        self,
        model: ModelFn,
        shape: Sequence[int],
        key: jax.Array,
        noise: Optional[jnp.ndarray] = None,
        clip_denoised: bool = False,
        denoised_fn=None,
        cond_fn=None,
        model_kwargs=None,
        eta: float = 0.0,
        progressive: bool = False,
    ):
        """Full DDIM chain as one fused ``lax.scan``."""
        key, init_key = jax.random.split(key)
        x_T = noise if noise is not None else jax.random.normal(init_key, tuple(shape))
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        B = shape[0]

        def step(carry, t_scalar):
            x, k = carry
            k, sub = jax.random.split(k)
            t_batch = jnp.full((B,), t_scalar, dtype=jnp.int32)
            out = self.ddim_sample(
                model, x, t_batch, sub, clip_denoised=clip_denoised,
                denoised_fn=denoised_fn, cond_fn=cond_fn,
                model_kwargs=model_kwargs, eta=eta,
            )
            ys = (out["sample"], out["pred_xstart"]) if progressive else None
            return (out["sample"], k), ys

        (x_final, _), ys = jax.lax.scan(step, (x_T, key), ts)
        if progressive:
            return {"sample": ys[0], "pred_xstart": ys[1]}
        return x_final

    # ------------------------------------------------------------------- VLB

    def _vb_terms_bpd(
        self, model, x_start, x_t, t, clip_denoised=False, model_kwargs=None
    ) -> Dict[str, Any]:
        """Per-sample variational-bound term at timestep t, in bits."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(
            model, x_t, t, clip_denoised=clip_denoised, model_kwargs=model_kwargs
        )
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)

        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        if not self.discretized_t0:
            decoder_nll = jnp.zeros_like(decoder_nll)
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)

        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"], "extra": out["extra"]}

    # ---------------------------------------------------------------- losses

    def training_losses(
        self,
        model: ModelFn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
        model_kwargs: Optional[Dict[str, Any]] = None,
        use_cd_xyz_loss: Union[bool, jnp.ndarray] = False,
        use_cd_color_loss: Union[bool, jnp.ndarray] = False,
    ) -> Dict[str, jnp.ndarray]:
        """Per-sample training losses at timesteps t.

        ``x_start``/``noise``: [B, N, C] channels-last. ``use_cd_*_loss`` may
        be Python bools or traced boolean scalars (the chamfer term is always
        computed when the flag is traced, then masked — trace-stable
        curriculum gating of the reference's epoch>start_chamfer switch,
        ``/root/reference/train.py:212-231``).
        """
        model_kwargs = model_kwargs or {}
        x_start = self.scale_channels(x_start)
        x_t = self.q_sample(x_start, t, noise=noise)
        terms: Dict[str, jnp.ndarray] = {}

        if self.loss_type in ("kl", "rescaled_kl"):
            vb = self._vb_terms_bpd(
                model, x_start=x_start, x_t=x_t, t=t, clip_denoised=False,
                model_kwargs=model_kwargs,
            )
            terms["loss"] = vb["output"]
            if self.loss_type == "rescaled_kl":
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output, extra = _split_model_output(model(x_t, t, **model_kwargs))

        if self.model_var_type in ("learned", "learned_range"):
            C = x_t.shape[-1]
            assert model_output.shape[-1] == 2 * C
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            # Learn variance via the VLB without letting it move the mean.
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            terms["vb"] = self._vb_terms_bpd(
                model=lambda *_a, **_k: frozen,
                x_start=x_start, x_t=x_t, t=t, clip_denoised=False,
            )["output"]
            if self.loss_type == "rescaled_mse":
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        target = {
            "x_prev": lambda: self.q_posterior_mean_variance(x_start, x_t, t)[0],
            "x_start": lambda: x_start,
            "epsilon": lambda: noise,
        }[self.model_mean_type]()
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]

        if isinstance(extra, dict) and "losses" in extra:
            for k, (loss, scale) in extra["losses"].items():
                terms[k] = loss
                terms["loss"] = terms["loss"] + loss * scale

        # Fork-added chamfer auxiliary losses on the implied x0 prediction,
        # scaled by sqrt(alpha_bar_t) so early (noisy) steps contribute less.
        if self.model_mean_type == "epsilon" and (
            use_cd_xyz_loss is not False or use_cd_color_loss is not False
        ):
            rc_scale = self._extract(self.sqrt_alphas_cumprod, t, 1)
            x_start_pred = self._predict_xstart_from_eps(x_t, t, model_output)
            if use_cd_xyz_loss is not False:
                cd = rc_scale * chamfer_distance_xyz(x_start_pred, x_start)
                gate = jnp.asarray(use_cd_xyz_loss, dtype=cd.dtype)
                terms["c_dist"] = gate * cd
                terms["loss"] = terms["loss"] + terms["c_dist"]
            if use_cd_color_loss is not False:
                cdc = rc_scale * chamfer_distance_color(x_start_pred, x_start)
                gate = jnp.asarray(use_cd_color_loss, dtype=cdc.dtype)
                terms["c_dist_color"] = gate * cdc
                terms["loss"] = terms["loss"] + terms["c_dist_color"]

        return terms

    def _prior_bpd(self, x_start: jnp.ndarray) -> jnp.ndarray:
        """Prior KL term of the VLB in bits per dim."""
        B = x_start.shape[0]
        t = jnp.full((B,), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / np.log(2.0)

    def calc_bpd_loop(
        self, model: ModelFn, x_start: jnp.ndarray, key: jax.Array,
        clip_denoised: bool = False, model_kwargs=None,
    ) -> Dict[str, jnp.ndarray]:
        """Whole-chain VLB evaluation as one ``lax.scan`` over t = T-1..0."""
        B = x_start.shape[0]
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def step(k, t_scalar):
            k, sub = jax.random.split(k)
            t_batch = jnp.full((B,), t_scalar, dtype=jnp.int32)
            noise = jax.random.normal(sub, x_start.shape, dtype=x_start.dtype)
            x_t = self.q_sample(x_start, t_batch, noise=noise)
            out = self._vb_terms_bpd(
                model, x_start=x_start, x_t=x_t, t=t_batch,
                clip_denoised=clip_denoised, model_kwargs=model_kwargs,
            )
            eps = self._predict_eps_from_xstart(x_t, t_batch, out["pred_xstart"])
            return k, (
                out["output"],
                mean_flat((out["pred_xstart"] - x_start) ** 2),
                mean_flat((eps - noise) ** 2),
            )

        _, (vb, xstart_mse, mse) = jax.lax.scan(step, key, ts)
        vb = jnp.swapaxes(vb, 0, 1)  # [B, T]
        prior_bpd = self._prior_bpd(x_start)
        return {
            "total_bpd": vb.sum(axis=1) + prior_bpd,
            "prior_bpd": prior_bpd,
            "vb": vb,
            "xstart_mse": jnp.swapaxes(xstart_mse, 0, 1),
            "mse": jnp.swapaxes(mse, 0, 1),
        }

    # -------------------------------------------------------- channel scaling

    def _channel_reshape(self, arr: np.ndarray, ndim: int) -> jnp.ndarray:
        # channels-last layout: scale/bias broadcast over leading axes
        return jnp.asarray(arr, dtype=jnp.float32).reshape((1,) * (ndim - 1) + (-1,))

    def scale_channels(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.channel_scales is not None:
            x = x * self._channel_reshape(self.channel_scales, x.ndim)
        if self.channel_biases is not None:
            x = x + self._channel_reshape(self.channel_biases, x.ndim)
        return x

    def unscale_channels(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.channel_biases is not None:
            x = x - self._channel_reshape(self.channel_biases, x.ndim)
        if self.channel_scales is not None:
            x = x / self._channel_reshape(self.channel_scales, x.ndim)
        return x

    def unscale_out_dict(self, out: Dict[str, Any]) -> Dict[str, Any]:
        return {
            k: (self.unscale_channels(v) if isinstance(v, jnp.ndarray) else v)
            for k, v in out.items()
        }


class SpacedDiffusion(GaussianDiffusion):
    """A diffusion process that skips steps of a base process.

    Builds rescaled betas over the retained timesteps and remaps model
    timesteps through ``timestep_map`` (reference ``:1044-1095``).
    """

    def __init__(self, use_timesteps: Iterable[int], **kwargs):
        self.use_timesteps = set(use_timesteps)
        self.original_num_steps = len(kwargs["betas"])

        base = GaussianDiffusion(**kwargs)
        last_alpha_cumprod = 1.0
        new_betas = []
        self.timestep_map: list[int] = []
        for i, alpha_cumprod in enumerate(base.alphas_cumprod):
            if i in self.use_timesteps:
                new_betas.append(1 - alpha_cumprod / last_alpha_cumprod)
                last_alpha_cumprod = alpha_cumprod
                self.timestep_map.append(i)
        kwargs = dict(kwargs, betas=np.array(new_betas))
        super().__init__(**kwargs)

    def _wrap_model(self, model: ModelFn) -> ModelFn:
        timestep_map = jnp.asarray(self.timestep_map, dtype=jnp.int32)

        def wrapped(x, ts, **kw):
            return model(x, jnp.take(timestep_map, ts), **kw)

        return wrapped

    def p_mean_variance(self, model, *args, **kwargs):
        return super().p_mean_variance(self._wrap_model(model), *args, **kwargs)

    def training_losses(self, model, *args, **kwargs):
        return super().training_losses(self._wrap_model(model), *args, **kwargs)

    def condition_mean(self, cond_fn, *args, **kwargs):
        return super().condition_mean(self._wrap_model(cond_fn), *args, **kwargs)

    def condition_score(self, cond_fn, *args, **kwargs):
        return super().condition_score(self._wrap_model(cond_fn), *args, **kwargs)


def diffusion_from_betas(
    schedule: str = "linear",
    timesteps: int = 1000,
    *,
    respacing: Union[str, Sequence[int], None] = None,
    **kwargs,
) -> GaussianDiffusion:
    """Convenience constructor from a named schedule + optional respacing."""
    betas = get_named_beta_schedule(schedule, timesteps)
    if respacing:
        return SpacedDiffusion(
            use_timesteps=space_timesteps(timesteps, respacing), betas=betas, **kwargs
        )
    return GaussianDiffusion(betas=betas, **kwargs)
