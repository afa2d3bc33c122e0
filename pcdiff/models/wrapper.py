"""Bound-model wrappers: flax module + params as a plain callable.

These adapt flax modules to the duck-typed model interface the diffusion
layer expects (``model(x, t, **kwargs) -> (out, latent)``), and implement the
sampler hooks:

- ``cached_model_kwargs``: encode conditioning ONCE per sampling run instead
  of at every ODE sub-step (the reference re-encodes every step; its hook is
  a passthrough, ``/root/reference/models/model.py:478``) — a pure-win
  optimization since cond tokens are independent of (x_t, t);
- ``cfg_model_kwargs``: the unconditional half's cond tokens are exactly
  zeros in eval mode (zero tokens + presence-masked type embeddings), so CFG
  duplication is a zero-concat of the cached tokens;
- ``init_latent``: zeros for the RIN self-conditioning carry.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .two_stream import TwoStreamDenoiser

__all__ = ["BoundTwoStream"]

_COND_KEYS = ("class_labels", "viewpoints", "partial_pcd", "depth_maps", "presence")


class BoundTwoStream:
    """TwoStreamDenoiser bound to params, with sampling-time caching hooks."""

    def __init__(self, module: TwoStreamDenoiser, params):
        self.module = module
        self.params = params

    def __call__(self, x, t, **kwargs):
        return self.module.apply(self.params, x, t, **kwargs)

    def encode_conditioning(self, batch_size: int, **kwargs) -> jnp.ndarray:
        return self.module.apply(
            self.params, batch_size,
            method=TwoStreamDenoiser.encode_conditioning, **kwargs,
        )

    def cached_model_kwargs(
        self, batch_size: int, model_kwargs: Dict[str, Any]
    ) -> Dict[str, Any]:
        """Replace raw modality inputs with precomputed cond tokens."""
        if "cond_tokens" in model_kwargs:
            return model_kwargs
        cond = self.encode_conditioning(
            batch_size,
            class_labels=model_kwargs.get("class_labels"),
            viewpoints=model_kwargs.get("viewpoints"),
            partial_pcd=model_kwargs.get("partial_pcd"),
            depth_maps=model_kwargs.get("depth_maps"),
            presence=model_kwargs.get("presence"),
            train=False,
        )
        out = {k: v for k, v in model_kwargs.items() if k not in _COND_KEYS}
        out["cond_tokens"] = cond
        return out

    def cfg_model_kwargs(
        self, batch_size: int, model_kwargs: Dict[str, Any]
    ) -> Dict[str, Any]:
        """2B-batched kwargs for CFG: cond rows then the all-absent rows.

        Equivalent to the reference's zero-duplication of every raw cond
        kwarg followed by two model calls (``sampler.py:133-136`` +
        ``k_diffusion.py:182-207``): with every modality input zero, eval-mode
        conditioning tokens are exactly zero.
        """
        kwargs = self.cached_model_kwargs(batch_size, model_kwargs)
        out = dict(kwargs)
        out["cond_tokens"] = jnp.concatenate(
            [kwargs["cond_tokens"], jnp.zeros_like(kwargs["cond_tokens"])], axis=0
        )
        for k, v in kwargs.items():
            if k in ("cond_tokens", "prev_latent"):
                continue
            out[k] = jnp.concatenate([v, jnp.zeros_like(v)], axis=0)
        return out

    def init_latent(self, batch_size: int) -> jnp.ndarray:
        # dtype must match the backbone's returned latent for scan carries
        return jnp.zeros(
            (batch_size, self.module.latent_tokens, self.module.latent_dim),
            dtype=self.module.dtype,
        )
