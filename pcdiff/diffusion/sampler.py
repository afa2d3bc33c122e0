"""Multi-stage point-cloud sampling orchestration.

Re-design of the reference ``PointCloudSampler``
(``/root/reference/diffusion/sampler.py:16-291``): the same multi-stage
(base -> upsampler) surface, per-stage parameter broadcasting, CFG kwarg
zero-duplication (``prev_latent`` excluded, ``sampler.py:133-136``), and
``pred_xstart``-per-step progressive semantics — but each stage's entire
sampling loop is ONE jitted XLA program, and conditioning tokens for
self-conditioning two-stream models are encoded ONCE per stage instead of at
every ODE sub-step.

Models are duck-typed callables ``model(x, t, **kwargs) -> out | (out, latent)``
plus optional hooks:

- ``cached_model_kwargs(batch_size, model_kwargs)`` — precompute expensive
  conditioning (reference hook, ``models/model.py:478``);
- ``init_latent(batch_size)`` — zeros for the self-conditioning latent carry;
- ``cfg_model_kwargs(batch_size, model_kwargs)`` — produce the 2B-batched
  conditional/unconditional kwargs (defaults to zero-duplication).

:class:`pcdiff.models.wrapper.BoundTwoStream` implements all three for the
flagship model.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.point_cloud import PointCloud
from .gaussian import GaussianDiffusion, _split_model_output
from .karras import (
    gaussian_denoise_fn,
    get_sigmas_karras,
    guided_denoise_fn,
    half_model_kwargs,
    sample_dpm,
    sample_euler_ancestral,
    sample_guided_interval,
    sample_heun,
    sample_heun_reuse,
)
from .parallel import sample_heun_parallel

__all__ = ["PointCloudSampler"]


def _broadcast(value, n: int, name: str) -> list:
    seq = list(value) if isinstance(value, (list, tuple)) else [value]
    if len(seq) == 1 and n > 1:
        if name == "guidance_scale":
            # don't guide the upsamplers by default (reference sampler.py:46-48)
            seq = seq + [1.0] * (n - 1)
        else:
            seq = seq * n
    assert len(seq) == n, f"{name}: expected {n} entries, got {len(seq)}"
    return seq


def _default_cfg_kwargs(model_kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Reference CFG duplication: every cond kwarg doubled with zeros."""
    return {
        k: jnp.concatenate([v, jnp.zeros_like(v)], axis=0)
        for k, v in model_kwargs.items()
        if k != "prev_latent"
    }


class PointCloudSampler:
    """Wraps a stack of (model, diffusion) stages into sampling programs."""

    def __init__(
        self,
        models: Sequence[Callable],
        diffusions: Sequence[GaussianDiffusion],
        num_points: Sequence[int],
        aux_channels: Sequence[str] = (),
        model_kwargs_key_filter: Sequence[str] = ("*",),
        guidance_scale: Union[float, Sequence[float]] = (3.0, 3.0),
        clip_denoised: bool = True,
        use_karras: Union[bool, Sequence[bool]] = (True, True),
        karras_steps: Union[int, Sequence[int]] = (64, 64),
        sigma_min: Union[float, Sequence[float]] = (1e-3, 1e-3),
        sigma_max: Union[float, Sequence[float]] = (120, 160),
        s_churn: Union[float, Sequence[float]] = (3, 0),
        sampler: str = "heun",
        parallel_options: Optional[Dict[str, Any]] = None,
        guidance_interval: Optional[Tuple[float, float]] = None,
    ):
        n = len(models)
        assert n > 0 and len(diffusions) == n
        self.models = list(models)
        self.diffusions = list(diffusions)
        self.num_points = _broadcast(num_points, n, "num_points")
        self.aux_channels = list(aux_channels)
        self.guidance_scale = _broadcast(guidance_scale, n, "guidance_scale")
        self.clip_denoised = clip_denoised
        self.use_karras = _broadcast(use_karras, n, "use_karras")
        self.karras_steps = _broadcast(karras_steps, n, "karras_steps")
        self.sigma_min = _broadcast(sigma_min, n, "sigma_min")
        self.sigma_max = _broadcast(sigma_max, n, "sigma_max")
        self.s_churn = _broadcast(s_churn, n, "s_churn")
        kf = list(model_kwargs_key_filter) or ["*"] * n
        self.model_kwargs_key_filter = _broadcast(kf, n, "model_kwargs_key_filter")
        self.sampler = sampler
        self.parallel_options = dict(parallel_options or {})
        self.guidance_interval = (
            tuple(guidance_interval) if guidance_interval else None
        )

    @property
    def num_stages(self) -> int:
        return len(self.models)

    # ------------------------------------------------------------ stage loop

    def _stage_sample(
        self,
        stage: int,
        batch_size: int,
        model_kwargs: Dict[str, Any],
        key: jax.Array,
        low_res: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Run one stage end-to-end; returns final pred_xstart [B, N, C]."""
        model = self.models[stage]
        diffusion = self.diffusions[stage]
        guidance = self.guidance_scale[stage]
        C = 3 + len(self.aux_channels)
        shape = (batch_size, self.num_points[stage], C)

        kwargs = dict(model_kwargs)
        if self.model_kwargs_key_filter[stage] != "*":
            use = set(self.model_kwargs_key_filter[stage].split(","))
            kwargs = {k: v for k, v in kwargs.items() if k in use}
        if low_res is not None:
            kwargs["low_res"] = low_res
        if hasattr(model, "cached_model_kwargs"):
            kwargs = model.cached_model_kwargs(batch_size, kwargs)

        guided = guidance not in (0.0, 1.0)
        if guided:
            if hasattr(model, "cfg_model_kwargs"):
                kwargs = model.cfg_model_kwargs(batch_size, kwargs)
            else:
                kwargs = _default_cfg_kwargs(kwargs)

        state_batch = batch_size * (2 if guided else 1)
        init_state = (
            model.init_latent(state_batch) if hasattr(model, "init_latent") else None
        )

        if self.use_karras[stage]:
            return self._karras_stage(
                model, diffusion, shape, kwargs, key, guidance, init_state, stage
            )
        return self._ancestral_stage(
            model, diffusion, shape, kwargs, key, guidance, init_state
        )

    def _karras_stage(
        self, model, diffusion, shape, kwargs, key, guidance, init_state, stage
    ):
        base = gaussian_denoise_fn(
            model, diffusion, clip_denoised=self.clip_denoised, model_kwargs=kwargs
        )
        denoise = guided_denoise_fn(base, guidance) if guidance not in (0.0, 1.0) else base
        sigmas = get_sigmas_karras(
            self.karras_steps[stage], self.sigma_min[stage], self.sigma_max[stage]
        )
        key, init_key = jax.random.split(key)
        x_T = jax.random.normal(init_key, shape) * self.sigma_max[stage]
        if self.guidance_interval is not None and guidance not in (0.0, 1.0):
            if self.sampler not in ("heun", "heun_reuse"):
                raise NotImplementedError(
                    "guidance_interval supports heun/heun_reuse only"
                )
            if self.s_churn[stage] != 0.0:
                raise NotImplementedError("guidance_interval requires s_churn == 0")
            B = shape[0]
            denoise_cond = gaussian_denoise_fn(
                model, diffusion, clip_denoised=self.clip_denoised,
                model_kwargs=half_model_kwargs(kwargs, B),
            )
            out = sample_guided_interval(
                denoise_cond, denoise, x_T, sigmas, key,
                state=init_state, guidance_interval=self.guidance_interval,
                sampler=self.sampler, cond_batch=B,
            )
            return diffusion.unscale_channels(out["pred_xstart"])
        fn = {"heun": sample_heun, "heun_reuse": sample_heun_reuse,
              "dpm": sample_dpm, "ancestral": sample_euler_ancestral,
              "heun_parallel": sample_heun_parallel}[self.sampler]
        if self.sampler == "ancestral":
            extra = {}
        elif self.sampler == "heun_parallel":
            extra = {"s_churn": self.s_churn[stage], **self.parallel_options}
        else:
            extra = {"s_churn": self.s_churn[stage]}
        out = fn(denoise, x_T, sigmas, key, state=init_state, **extra)
        return diffusion.unscale_channels(out["pred_xstart"])

    def _ancestral_stage(
        self, model, diffusion, shape, kwargs, key, guidance, init_state
    ):
        """DDPM ancestral chain with fused-CFG epsilon and latent threading
        (reference ``sampler.py:153-164,194-233``)."""
        B = shape[0]
        guided = guidance not in (0.0, 1.0)

        def eps_fn(x, t_batch, state):
            if guided:
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t_batch, t_batch], axis=0)
                out, new_state = _split_model_output(
                    model(x2, t2, prev_latent=state, **kwargs)
                )
                cond_eps, uncond_eps = jnp.split(out, 2, axis=0)
                eps = uncond_eps + guidance * (cond_eps - uncond_eps)
            else:
                out, new_state = _split_model_output(
                    model(x, t_batch, prev_latent=state, **kwargs)
                )
                eps = out
            if new_state is None:
                new_state = state
            return eps, new_state

        key, init_key = jax.random.split(key)
        x_T = jax.random.normal(init_key, tuple(shape))
        ts = jnp.arange(diffusion.num_timesteps - 1, -1, -1)

        def step(carry, t_scalar):
            x, k, state = carry
            k, sub = jax.random.split(k)
            t_batch = jnp.full((B,), t_scalar, dtype=jnp.int32)
            eps, state = eps_fn(x, t_batch, state)
            out = diffusion.p_sample(
                lambda *_a, **_k: eps, x, t_batch, sub,
                clip_denoised=self.clip_denoised,
            )
            return (out["sample"], k, state), out["pred_xstart"]

        (x, _, _), preds = jax.lax.scan(step, (x_T, key, init_state), ts)
        return diffusion.unscale_channels(preds[-1])

    # ------------------------------------------------------------ public API

    def sample_batch(
        self,
        batch_size: int,
        model_kwargs: Dict[str, Any],
        key: jax.Array,
    ) -> jnp.ndarray:
        """Final samples [B, num_points_total, 3+aux] across all stages.

        Each stage's previous output feeds the next via ``low_res``; outputs
        are concatenated along the point axis (reference ``sampler.py:165-171``).
        """
        samples = None
        for stage in range(self.num_stages):
            key, sub = jax.random.split(key)
            out = self._stage_sample(stage, batch_size, model_kwargs, sub,
                                     low_res=samples)
            if samples is not None:
                out = jnp.concatenate([samples, out], axis=1)
            samples = out
        return samples

    def sample_batch_progressive(
        self, batch_size: int, model_kwargs: Dict[str, Any], key: jax.Array
    ):
        """Yield per-stage final samples (stage granularity; within-stage
        progressive trajectories are available via karras progressive mode)."""
        samples = None
        for stage in range(self.num_stages):
            key, sub = jax.random.split(key)
            out = self._stage_sample(stage, batch_size, model_kwargs, sub,
                                     low_res=samples)
            if samples is not None:
                out = jnp.concatenate([samples, out], axis=1)
            samples = out
            yield samples

    # ---------------------------------------------------------- conversions

    def split_model_output(
        self, output: jnp.ndarray, rescale_colors: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Split [B, N, 3+aux] into positions + named aux channels."""
        assert 3 + len(self.aux_channels) == output.shape[-1]
        pos, joined_aux = output[..., :3], output[..., 3:]
        aux = {}
        for i, name in enumerate(self.aux_channels):
            v = joined_aux[..., i]
            if name in {"R", "G", "B", "A"}:
                v = jnp.round(jnp.clip(v, 0, 255))
                if rescale_colors:
                    v = v / 255.0
            aux[name] = v
        return pos, aux

    def output_to_point_clouds(self, output: jnp.ndarray) -> List[PointCloud]:
        pos, aux = self.split_model_output(output, rescale_colors=True)
        pos_np = np.asarray(pos)
        aux_np = {k: np.asarray(v) for k, v in aux.items()}
        return [
            PointCloud(
                coords=pos_np[i],
                channels={k: v[i] for k, v in aux_np.items()},
            )
            for i in range(pos_np.shape[0])
        ]

    @classmethod
    def combine(cls, *samplers: "PointCloudSampler") -> "PointCloudSampler":
        assert all(s.aux_channels == samplers[0].aux_channels for s in samplers[1:])
        assert all(s.clip_denoised == samplers[0].clip_denoised for s in samplers[1:])
        cat = lambda attr: [x for s in samplers for x in getattr(s, attr)]
        return cls(
            models=cat("models"),
            diffusions=cat("diffusions"),
            num_points=cat("num_points"),
            aux_channels=samplers[0].aux_channels,
            model_kwargs_key_filter=cat("model_kwargs_key_filter"),
            guidance_scale=cat("guidance_scale"),
            clip_denoised=samplers[0].clip_denoised,
            use_karras=cat("use_karras"),
            karras_steps=cat("karras_steps"),
            sigma_min=cat("sigma_min"),
            sigma_max=cat("sigma_max"),
            s_churn=cat("s_churn"),
        )

    def with_options(
        self,
        guidance_scale,
        clip_denoised: bool,
        use_karras=(True, True),
        karras_steps=(64, 64),
        sigma_min=(1e-3, 1e-3),
        sigma_max=(120, 160),
        s_churn=(3, 0),
    ) -> "PointCloudSampler":
        return PointCloudSampler(
            models=self.models,
            diffusions=self.diffusions,
            num_points=self.num_points,
            aux_channels=self.aux_channels,
            model_kwargs_key_filter=self.model_kwargs_key_filter,
            guidance_scale=guidance_scale,
            clip_denoised=clip_denoised,
            use_karras=use_karras,
            karras_steps=karras_steps,
            sigma_min=sigma_min,
            sigma_max=sigma_max,
            s_churn=s_churn,
        )
