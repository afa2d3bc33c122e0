"""Train state and optimizer construction.

Optimizer parity with the reference (``/root/reference/train.py:140-146``):
AdamW betas (0.9, 0.95), weight decay 0.01, cosine annealing from peak lr to
1e-6 over total steps. State is a standard flax ``TrainState`` so the whole
(params, opt_state, step) pytree checkpoints and shards uniformly.
"""

from __future__ import annotations

from typing import Optional

import optax
from flax.training import train_state

__all__ = [
    "create_train_state",
    "cosine_annealing_schedule",
    "warmup_cosine_schedule",
]


def cosine_annealing_schedule(
    peak_lr: float, total_steps: int, eta_min: float = 1e-6
) -> optax.Schedule:
    """CosineAnnealingLR equivalent: lr(t) = eta_min + (peak-eta_min)/2 *
    (1 + cos(pi * t / T))."""
    return optax.cosine_decay_schedule(
        init_value=peak_lr, decay_steps=total_steps, alpha=eta_min / peak_lr
    )


def warmup_cosine_schedule(
    peak_lr: float,
    total_steps: int,
    warmup_ratio: float = 0.05,
    lr_floor: float = 0.01,
) -> optax.Schedule:
    """Linear warm-up then cosine decay bottoming at ``lr_floor * peak_lr``
    (the reference's commented-out alternative scheduler,
    ``/root/reference/models/util.py:112-160``)."""
    warmup_steps = max(1, int(total_steps * warmup_ratio))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=lr_floor * peak_lr,
    )


def create_train_state(
    model,
    params,
    *,
    lr: float = 3e-4,
    weight_decay: float = 0.01,
    total_steps: int = 100_000,
    eta_min: float = 1e-6,
    grad_clip: Optional[float] = None,
) -> train_state.TrainState:
    schedule = cosine_annealing_schedule(lr, total_steps, eta_min)
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(learning_rate=schedule, b1=0.9, b2=0.95,
                    weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    return train_state.TrainState.create(
        apply_fn=model.apply, params=params, tx=tx
    )
