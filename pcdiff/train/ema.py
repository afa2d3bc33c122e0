"""Exponential moving average of parameters.

An improvement over the reference (which keeps no EMA; SURVEY.md section
7.1) — standard practice for diffusion-model sample quality. Pure pytree
math, safe inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_update", "init_ema"]


def init_ema(params):
    """EMA state initialized to a COPY of the params.

    Must not alias the train-state buffers: the jitted train step donates
    its input state, which would delete aliased EMA buffers.
    """
    return jax.tree.map(lambda x: jnp.array(x, copy=True), params)


def ema_update(ema_params, params, decay: float = 0.9999):
    """ema <- decay * ema + (1 - decay) * params, leaf-wise."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params,
    )
