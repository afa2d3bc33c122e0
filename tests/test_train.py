"""Train-step tests: loss decreases, curriculum gating, DP sharding on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.data import synthetic_batch
from pcdiff.diffusion import diffusion_from_betas
from pcdiff.models import TwoStreamDenoiser
from pcdiff.parallel import make_mesh, replicate, shard_batch
from pcdiff.train import create_train_state, make_train_step

SMALL = dict(
    num_points=32, num_latents=8, latent_dim=16, x_dim=16, num_blocks=1,
    num_compute_layers=1, num_heads=2, num_classes=10, num_tokens_ppcd=4,
    num_tokens_depth=2, depth_image_size=32, depth_patch=16,
)


def _to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def make_setup(B=8):
    model = TwoStreamDenoiser(**SMALL)
    rng = np.random.default_rng(0)
    batch = _to_jnp(
        synthetic_batch(rng, batch_size=B, num_points=32, num_partial=16,
                        depth_size=32)
    )
    params = model.init(
        jax.random.PRNGKey(0), batch["target"], jnp.zeros((B,), jnp.int32),
        class_labels=batch["class_labels"], viewpoints=batch["viewpoints"],
        partial_pcd=batch["partial_pcd"], depth_maps=batch["depth_maps"],
    )
    diffusion = diffusion_from_betas("linear", 100)
    return model, params, diffusion, batch


def test_train_step_reduces_loss():
    model, params, diffusion, batch = make_setup()
    state = create_train_state(model, params, lr=1e-3, total_steps=50)
    step = make_train_step(model, diffusion, self_conditioning_prob=0.6)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(12):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub, jnp.asarray(False))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_chamfer_curriculum_gate():
    model, params, diffusion, batch = make_setup(B=4)
    state = create_train_state(model, params, lr=1e-3, total_steps=50)
    step = make_train_step(model, diffusion, self_conditioning_prob=0.0,
                           donate=False)
    _, m_off = step(state, batch, jax.random.PRNGKey(1), jnp.asarray(False))
    _, m_on = step(state, batch, jax.random.PRNGKey(1), jnp.asarray(True))
    # same compiled program; gated chamfer term zero when off, positive when on
    assert float(m_off["c_dist"]) == 0.0
    assert float(m_on["c_dist"]) > 0.0
    assert float(m_on["loss"]) > float(m_off["loss"])


def test_train_step_dp_sharded_matches_single_device():
    """The DDP equivalent: batch sharded over an 8-device mesh must produce
    the same loss and gradients (up to float reduction-order noise) as
    single-device execution. Gradients are the right invariant — Adam's
    sign-like first-step normalization amplifies ~1e-7 reduction noise into
    sign flips on near-zero entries, so post-update params are not."""
    from pcdiff.train import make_loss_fn

    model, params, diffusion, batch = make_setup(B=8)
    loss_fn = make_loss_fn(model, diffusion, self_conditioning_prob=0.0)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    def run(shard: bool):
        p, b = params, batch
        if shard:
            mesh = make_mesh()
            b = shard_batch(mesh, batch)
            p = replicate(mesh, params)
        (loss, _), grads = grad_fn(p, b, jax.random.PRNGKey(3), jnp.asarray(False))
        return float(loss), jax.tree.map(np.asarray, grads)

    loss_single, g_single = run(False)
    loss_sharded, g_sharded = run(True)
    assert np.isclose(loss_single, loss_sharded, rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(a, b_, rtol=5e-3, atol=1e-6)


def test_self_conditioning_bootstrap_executes():
    model, params, diffusion, batch = make_setup(B=4)
    state = create_train_state(model, params, lr=1e-3, total_steps=50)
    step = make_train_step(model, diffusion, self_conditioning_prob=1.0,
                           donate=False)
    _, metrics = step(state, batch, jax.random.PRNGKey(0), jnp.asarray(False))
    assert float(metrics["self_conditioned"]) == 1.0
    step0 = make_train_step(model, diffusion, self_conditioning_prob=0.0)
    state = create_train_state(model, params, lr=1e-3, total_steps=50)
    _, metrics0 = step0(state, batch, jax.random.PRNGKey(0), jnp.asarray(False))
    assert float(metrics0["self_conditioned"]) == 0.0


def test_warmup_cosine_schedule_shape():
    from pcdiff.train.state import warmup_cosine_schedule

    sched = warmup_cosine_schedule(3e-4, total_steps=100, warmup_ratio=0.1)
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(10)), 3e-4, rtol=1e-5)  # peak after warmup
    assert np.isclose(float(sched(100)), 3e-6, rtol=1e-2)  # floor = 1% peak


def test_encode_modalities_assemble_matches_encode_conditioning():
    """The shared-encoder split must be a pure refactor of the one-shot
    encoder path under identical rng streams (train and eval modes)."""
    model, params, _, batch = make_setup(B=4)
    kwargs = dict(
        class_labels=batch["class_labels"], viewpoints=batch["viewpoints"],
        partial_pcd=batch["partial_pcd"], depth_maps=batch["depth_maps"],
    )
    for train, rngs in [
        (False, {}),
        (True, {"dropout": jax.random.PRNGKey(7),
                "cond_drop": jax.random.PRNGKey(8)}),
    ]:
        want = model.apply(
            params, 4, train=train, rngs=rngs,
            method="encode_conditioning", **kwargs,
        )
        raw = model.apply(
            params, 4, train=train,
            rngs={k: v for k, v in rngs.items() if k == "dropout"},
            method="encode_modalities", **kwargs,
        )
        got = model.apply(
            params, raw, 4, train=train,
            rngs={k: v for k, v in rngs.items() if k == "cond_drop"},
            method="assemble_conditioning",
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_shared_and_unshared_encoder_steps_both_train():
    model, params, diffusion, batch = make_setup(B=4)
    from pcdiff.train import create_train_state

    for share in (True, False):
        state = create_train_state(model, params, lr=1e-3, total_steps=50)
        step = make_train_step(
            model, diffusion, self_conditioning_prob=1.0,
            share_cond_encoders=share, donate=False,
        )
        losses = []
        key = jax.random.PRNGKey(3)
        for i in range(8):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub, jnp.asarray(False))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all(), share
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), share
