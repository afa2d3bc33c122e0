"""The jitted training step: self-conditioning bootstrap + diffusion loss.

Mirrors the reference hot loop (``/root/reference/train.py:164-239``) as one
XLA program per step:

- t ~ U[0, T), fresh Gaussian noise, x_t = q_sample(target, t, noise);
- with probability ``self_conditioning_prob`` (one scalar draw per step,
  matching ``train.py:181``), a stop-gradient bootstrap forward produces
  ``prev_latent``; the bootstrap omits ``partial_pcd`` by default (the
  reference quirk at ``train.py:184-191``, preserved behind a flag). The
  untaken branch is skipped at runtime via ``lax.cond``;
- epsilon-MSE loss, plus the chamfer-XYZ curriculum term once
  ``epoch > start_chamfer`` (gate passed as a traced scalar so one compiled
  program serves both phases);
- under a sharded-batch jit the gradient all-reduce over the data axis is
  inserted by XLA (the DDP/NCCL equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax.training.train_state import TrainState

from ..diffusion.gaussian import GaussianDiffusion

__all__ = ["make_train_step", "make_loss_fn", "make_device_data_step"]

_BOOTSTRAP_EXCLUDES_PPCD_KEYS = ("class_labels", "viewpoints", "depth_maps")


def make_loss_fn(
    model,
    diffusion: GaussianDiffusion,
    *,
    self_conditioning_prob: float = 0.6,
    bootstrap_include_partial_pcd: bool = False,
    share_cond_encoders: bool = True,
):
    """Build the per-step loss function over (params, batch, key, use_cd).

    ``share_cond_encoders`` (default on) runs the modality encoders ONCE per
    step and shares the encoded tokens between the self-conditioning
    bootstrap and the main forward (the reference re-encodes per forward,
    ``train.py:184-194``; the depth/class/view tokens are identical across
    the two since the bootstrap only omits ``partial_pcd``). Each forward
    still draws its own CFG-dropout mask; the shared encoders use one
    train-dropout draw instead of two independent ones — quality-gated on
    the trained harness (docs/trained_gates.json).
    """
    share = share_cond_encoders and hasattr(model, "encode_modalities")

    def loss_fn(params, batch: Dict[str, jnp.ndarray], key, use_cd_xyz):
        target = batch["target"]  # [B, N, 3] channels-last
        B = target.shape[0]
        (k_t, k_noise, k_sc, k_drop, k_cdrop, k_bdrop, k_bcdrop,
         k_enc) = jax.random.split(key, 8)

        t = jax.random.randint(k_t, (B,), 0, diffusion.num_timesteps)
        noise = jax.random.normal(k_noise, target.shape, dtype=target.dtype)
        x_t = diffusion.q_sample(target, t, noise=noise)

        cond_kwargs = dict(
            class_labels=batch.get("class_labels"),
            viewpoints=batch.get("viewpoints"),
            partial_pcd=batch.get("partial_pcd"),
            depth_maps=batch.get("depth_maps"),
        )

        if share:
            raw = model.apply(
                params, B, train=True, rngs={"dropout": k_enc},
                method="encode_modalities", **cond_kwargs,
            )
            boot_raw = dict(raw)
            if not bootstrap_include_partial_pcd:
                boot_raw["partial_pcd"] = None

        # --- latent self-conditioning bootstrap (scalar per-step coin) ---
        def bootstrap(_):
            if share:
                cond_b = model.apply(
                    params, boot_raw, B, train=True,
                    rngs={"cond_drop": k_bcdrop},
                    method="assemble_conditioning",
                )
                _, latent = model.apply(
                    params, x_t, t, train=True, cond_tokens=cond_b,
                    rngs={"dropout": k_bdrop},
                )
            else:
                boot_kwargs = dict(cond_kwargs)
                if not bootstrap_include_partial_pcd:
                    boot_kwargs["partial_pcd"] = None
                _, latent = model.apply(
                    params, x_t, t, train=True,
                    rngs={"dropout": k_bdrop, "cond_drop": k_bcdrop},
                    **boot_kwargs,
                )
            return jax.lax.stop_gradient(latent)

        def no_bootstrap(_):
            # dtype must match the bootstrap branch's latent for lax.cond
            return jnp.zeros(
                (B, model.latent_tokens, model.latent_dim), dtype=model.dtype
            )

        use_sc = jax.random.uniform(k_sc, ()) < self_conditioning_prob
        prev_latent = jax.lax.cond(use_sc, bootstrap, no_bootstrap, None)

        def model_fn(x, tt, **kw):
            if share:
                cond_m = model.apply(
                    params, raw, B, train=True,
                    rngs={"cond_drop": k_cdrop},
                    method="assemble_conditioning",
                )
                return model.apply(
                    params, x, tt, train=True, cond_tokens=cond_m,
                    rngs={"dropout": k_drop},
                    prev_latent=prev_latent, **kw,
                )
            return model.apply(
                params, x, tt, train=True,
                rngs={"dropout": k_drop, "cond_drop": k_cdrop},
                prev_latent=prev_latent, **cond_kwargs, **kw,
            )

        terms = diffusion.training_losses(
            model_fn, target, t, noise=noise, use_cd_xyz_loss=use_cd_xyz
        )
        loss = terms["loss"].mean()
        metrics = {k: v.mean() for k, v in terms.items()}
        metrics["self_conditioned"] = use_sc.astype(jnp.float32)
        return loss, metrics

    return loss_fn


def make_train_step(
    model,
    diffusion: GaussianDiffusion,
    *,
    self_conditioning_prob: float = 0.6,
    bootstrap_include_partial_pcd: bool = False,
    share_cond_encoders: bool = True,
    donate: bool = True,
):
    """A jitted (state, batch, key, use_cd) -> (state, metrics) step."""
    loss_fn = make_loss_fn(
        model, diffusion,
        self_conditioning_prob=self_conditioning_prob,
        bootstrap_include_partial_pcd=bootstrap_include_partial_pcd,
        share_cond_encoders=share_cond_encoders,
    )

    def step(state: TrainState, batch, key, use_cd_xyz) -> Tuple[TrainState, Dict[str, Any]]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(state.params, batch, key, use_cd_xyz)
        state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_device_data_step(
    model,
    diffusion: GaussianDiffusion,
    *,
    self_conditioning_prob: float = 0.6,
    bootstrap_include_partial_pcd: bool = False,
    share_cond_encoders: bool = True,
    donate: bool = True,
):
    """A jitted ``(state, data, idx, key, use_cd) -> (state, metrics)`` step
    gathering its batch from a DEVICE-RESIDENT dataset.

    Streaming a fresh ~33 MB host batch through the axon tunnel every step
    both bottlenecks the step (740 ms observed vs 384.5 ms device time on
    the flagship config) and leaks client RSS at exactly one batch per
    step (the 125 GB OOM kill of the first flagship run, 2026-08-20); for
    fixture-scale datasets the whole normalized tensor set fits HBM
    (~1 GB at flagship scale), so only an int32 index row crosses the
    tunnel per step. ``data`` is a jit ARGUMENT (a closure would embed it
    as compile-request constants).

    The per-item random point permutation of ``target`` (the loader path
    applies it in ``ModelnetDataset.__getitem__``, mirroring the reference
    dataloader's augmentation) moves on-device: a fresh
    ``jax.random.permutation`` per sample per step — the same
    distribution, a different (functional) RNG stream.
    """
    loss_fn = make_loss_fn(
        model, diffusion,
        self_conditioning_prob=self_conditioning_prob,
        bootstrap_include_partial_pcd=bootstrap_include_partial_pcd,
        share_cond_encoders=share_cond_encoders,
    )

    def step(state: TrainState, data, idx, key, use_cd_xyz):
        key, k_perm = jax.random.split(key)
        batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
        perm_keys = jax.random.split(k_perm, idx.shape[0])
        batch["target"] = jax.vmap(
            lambda k, t: jax.random.permutation(k, t, axis=0)
        )(perm_keys, batch["target"])
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, metrics), grads = grad_fn(state.params, batch, key, use_cd_xyz)
        state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
