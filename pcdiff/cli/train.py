"""Training entry point.

The TPU-native analogue of ``/root/reference/train.py:83-341``: builds the
TwoStreamDenoiser + GaussianDiffusion from config, iterates sharded batches
over the device mesh with one jitted train step, follows the reference's
chamfer curriculum and periodic checkpoint/sample cadence — with full-state
(params+optimizer+step+RNG) orbax checkpoints instead of weights-only.

Usage: ``python -m pcdiff.cli.train [--config cfg.yaml] [key.path=value ...]``
"""

from __future__ import annotations

import argparse
import datetime
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import (
    load_torch_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from ..core.config import Config, load_config, save_config
from ..data import (
    BatchLoader,
    ModelNetCompletion,
    MultiModalCompletion,
    MVPCompletion,
    make_modelnet_fixture,
)
from ..diffusion import diffusion_from_betas
from ..models import TwoStreamDenoiser
from ..parallel import fold_in_process, make_mesh, replicate, shard_batch
from ..parallel.mesh import batch_sharding
from ..train import create_train_state, make_device_data_step, make_train_step

logger = logging.getLogger("pcdiff.train")

# 'auto' device_data threshold: the stacked normalized tensors must leave
# most of a 16 GB chip for the train step's activations
_DEVICE_DATA_MAX_BYTES = 2e9


def stack_dataset(dataset, seed: int):
    """One normalized host copy of every dataset item, stacked per key.

    The per-item random target permutation inside ``__getitem__`` is
    re-randomized on-device every step by the device-data path, so the
    fixed build-time rng here adds no bias."""
    rng = np.random.default_rng(seed)
    items = [dataset.__getitem__(i, rng=rng) for i in range(len(dataset))]
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _device_data_enabled(cfg: Config, dataset) -> bool:
    mode = getattr(cfg.train, "device_data", "auto")
    if mode == "off":
        return False
    if jax.process_count() > 1:
        # multi-host runs stream per-host shards (each host's transfers are
        # local, not tunnel round trips)
        if mode == "on":
            logger.warning("train.device_data=on ignored: multi-process run")
        return False
    if mode == "on":
        return True
    sample = dataset.__getitem__(0, rng=np.random.default_rng(0))
    total = sum(np.asarray(v).nbytes for v in sample.values()) * len(dataset)
    return total < _DEVICE_DATA_MAX_BYTES


def build_model(cfg: Config) -> TwoStreamDenoiser:
    m = cfg.model
    # process-global kernel knob: set unconditionally so successive
    # build_model calls in one process (gate sweeps) don't inherit state
    from ..models.attention import set_gelu_impl
    from ..ops.flash_attention import set_attention_softmax_dtype

    set_attention_softmax_dtype(getattr(m, "softmax_dtype", "float32"))
    set_gelu_impl(getattr(m, "gelu_impl", "erf"))
    return TwoStreamDenoiser(
        num_points=m.num_points, num_latents=m.num_latents,
        cond_drop_prob=m.cond_drop_prob, input_channels=m.input_channels,
        output_channels=m.output_channels, latent_dim=m.latent_dim,
        x_dim=m.x_dim, num_blocks=m.num_blocks,
        num_compute_layers=m.num_compute_layers, num_classes=m.num_classes,
        num_heads=m.num_heads, num_tokens_ppcd=m.num_tokens_ppcd,
        num_tokens_depth=m.num_tokens_depth,
        depth_image_size=m.depth_image_size, depth_patch=m.depth_patch,
        active_modalities=tuple(m.active_modalities),
        dtype=jnp.bfloat16 if m.compute_dtype == "bfloat16" else jnp.float32,
        scan_blocks=getattr(m, "scan_blocks", False),
    )


def build_dataset(cfg: Config):
    name = cfg.data.dataset
    if name == "modelnet":
        return ModelNetCompletion(cfg.data.h5_path, split="train")
    if name == "mvp":
        return MVPCompletion(cfg.data.h5_path, prefix="train",
                             n_samples=cfg.model.num_points)
    if name == "multimodal":
        return MultiModalCompletion(cfg.data.h5_path)
    if name == "synthetic":
        path = cfg.data.h5_path or "/tmp/pcdiff_synthetic.h5"
        if not os.path.exists(path):
            make_modelnet_fixture(
                path, num_points=cfg.model.num_points,
                depth_size=cfg.model.depth_image_size,
            )
        return ModelNetCompletion(path, split="train", skip_classes=None)
    raise ValueError(f"unknown dataset: {name}")


def init_params(model: TwoStreamDenoiser, cfg: Config, key):
    m = cfg.model
    B = 2
    dummy = dict(
        x=jnp.zeros((B, m.num_points, 3)),
        t=jnp.zeros((B,), jnp.int32),
        class_labels=jnp.zeros((B,), jnp.int32),
        viewpoints=jnp.zeros((B, 3)),
        partial_pcd=jnp.zeros((B, m.num_points, 3)),
        depth_maps=jnp.zeros((B, m.depth_image_size, m.depth_image_size, 1)),
    )
    # ALWAYS jit init: eager flagship init is thousands of op dispatches
    # through the axon tunnel (~5-10 min of pure latency; bench.py docstring)
    return jax.jit(model.init)(key, **dummy)


def main(cfg: Config) -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s [%(levelname)s] %(message)s",
                        force=True)
    timestamp = datetime.datetime.now().strftime("%d-%m-%Y_%H-%M")
    run_dir = os.path.join(cfg.train.output_dir, f"run_{timestamp}")
    if jax.process_index() == 0:
        os.makedirs(run_dir, exist_ok=True)
        save_config(cfg, os.path.join(run_dir, "config_used.yaml"))
        logger.info("starting run: %s", run_dir)

    mesh = make_mesh()
    key = fold_in_process(jax.random.PRNGKey(cfg.train.seed))

    model = build_model(cfg)
    diffusion = diffusion_from_betas(
        cfg.diffusion.schedule, cfg.diffusion.timesteps,
        model_mean_type=cfg.diffusion.gaussiandiffusion.model_mean_type,
        model_var_type=cfg.diffusion.gaussiandiffusion.model_var_type,
        loss_type=cfg.diffusion.gaussiandiffusion.loss_type,
    )

    dataset = build_dataset(cfg)
    loader = BatchLoader(
        dataset, cfg.train.batch_size, seed=cfg.train.seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    total_steps = len(loader) * cfg.train.epochs

    key, init_key = jax.random.split(key)
    params = init_params(model, cfg, init_key)
    if cfg.train.continue_training and cfg.train.load_checkpoint_path:
        path = cfg.train.load_checkpoint_path
        if path.endswith(".pt"):
            logger.info("importing reference torch checkpoint: %s", path)
            params = load_torch_checkpoint(path)
        else:
            params = None  # restored below as full state

    state = create_train_state(
        model, params if params is not None else init_params(model, cfg, init_key),
        lr=cfg.train.lr, weight_decay=cfg.train.weight_decay,
        total_steps=total_steps,
    )
    resumed_step = 0
    restored_ema = None
    if cfg.train.continue_training and params is None:
        state, resumed_step = restore_checkpoint(
            cfg.train.load_checkpoint_path, state)
        # a true resume continues the epoch counter (curriculum gates,
        # save cadence) and the metrics step axis from where the run died
        logger.info("restored full train state at step %d", resumed_step)
        ema_dir = os.path.join(
            os.path.dirname(os.path.normpath(cfg.train.load_checkpoint_path)),
            "ema",
        )
        if cfg.train.ema_decay > 0 and os.path.isdir(ema_dir):
            restored_ema, ema_step = restore_checkpoint(
                ema_dir, jax.device_get(state.params))
            logger.info("restored EMA shadow at step %d", ema_step)

    state = replicate(mesh, state)
    use_device_data = _device_data_enabled(cfg, dataset)
    if use_device_data:
        step_fn = make_device_data_step(
            model, diffusion,
            self_conditioning_prob=cfg.train.self_conditioning_prob,
            bootstrap_include_partial_pcd=cfg.train.bootstrap_include_partial_pcd,
        )
        host_data = stack_dataset(dataset, cfg.train.seed)
        # data replicated over the mesh; the per-step int32 index row is
        # sharded over the data axis, so the gathered batch (and therefore
        # the whole step) stays data-parallel exactly like shard_batch
        data_dev = replicate(
            mesh, {k: jnp.asarray(v) for k, v in host_data.items()}
        )
        idx_sharding = batch_sharding(mesh)
        logger.info(
            "device-resident dataset: %d items, %.2f GB on device",
            len(dataset),
            sum(v.nbytes for v in host_data.values()) / 1e9,
        )
    else:
        step_fn = make_train_step(
            model, diffusion,
            self_conditioning_prob=cfg.train.self_conditioning_prob,
            bootstrap_include_partial_pcd=cfg.train.bootstrap_include_partial_pcd,
        )

    from ..core.logging import MetricsLogger, profile_trace
    from ..train import ema_update, init_ema

    mlog = MetricsLogger(
        run_dir, project=cfg.wandb.project, run_name=os.path.basename(run_dir),
        config=None, use_wandb=cfg.wandb.enabled,
        is_lead_host=jax.process_index() == 0,
    )
    if cfg.train.ema_decay > 0:
        ema_params = (replicate(mesh, restored_ema)
                      if restored_ema is not None else init_ema(state.params))
    else:
        ema_params = None
    ema_fn = (
        jax.jit(lambda e, p: ema_update(e, p, cfg.train.ema_decay))
        if ema_params is not None else None
    )

    global_step = resumed_step
    start_epoch = resumed_step // max(len(loader), 1)
    for epoch in range(start_epoch, cfg.train.epochs):
        loader.set_epoch(epoch)
        use_cd = jnp.asarray(epoch + 1 > cfg.train.start_chamfer)
        t0 = time.time()
        last_batch = None
        step_metrics = []  # device scalars; fetched in ONE bulk get below
        profiling = bool(cfg.train.profile_dir) and epoch == 1
        with profile_trace(cfg.train.profile_dir or None, enabled=profiling):
            if use_device_data:
                idx_table = loader.epoch_indices()
                for b in range(len(idx_table)):
                    idx = jax.device_put(
                        jnp.asarray(idx_table[b]), idx_sharding
                    )
                    key, sub = jax.random.split(key)
                    state, metrics = step_fn(state, data_dev, idx, sub, use_cd)
                    if ema_fn is not None:
                        ema_params = ema_fn(ema_params, state.params)
                    step_metrics.append(metrics)
                if len(idx_table):
                    last_batch = {
                        k: v[idx_table[-1]] for k, v in host_data.items()
                    }
            else:
                for batch in loader:
                    last_batch = batch
                    batch = shard_batch(
                        mesh, {k: jnp.asarray(v) for k, v in batch.items()}
                    )
                    key, sub = jax.random.split(key)
                    state, metrics = step_fn(state, batch, sub, use_cd)
                    if ema_fn is not None:
                        ema_params = ema_fn(ema_params, state.params)
                    step_metrics.append(metrics)
            # Fetching metrics per step costs a tunnel round trip that
            # serializes the device queue (~2.5x the device step time
            # measured on the flagship run); one bulk device_get per epoch
            # keeps the steps pipelined and the logs identical. Inside the
            # profile scope so a profiled epoch captures completed steps.
            host_metrics = jax.device_get(step_metrics)
        n_batches = len(step_metrics)
        epoch_loss = 0.0
        for m in host_metrics:
            loss = float(m["loss"])
            epoch_loss += loss
            global_step += 1
            mlog.log({"loss": loss, "mse": float(m["mse"])},
                     step=global_step)
        if (
            jax.process_index() == 0
            and last_batch is not None
            and (epoch + 1) % cfg.train.sample_every == 0
        ):
            key, sub = jax.random.split(key)
            _sample_last_batch(cfg, model, state, diffusion, last_batch,
                               run_dir, epoch + 1, sub)
        if jax.process_index() == 0 and n_batches:
            logger.info(
                "epoch %d: avg loss %.4f (%d steps, %.1fs)",
                epoch + 1, epoch_loss / n_batches, n_batches, time.time() - t0,
            )
            if (epoch + 1) % cfg.train.save_every == 0 and cfg.train.save_full_state:
                ckpt_dir = os.path.join(run_dir, "checkpoints")
                payload = jax.device_get(state)
                save_checkpoint(ckpt_dir, global_step, payload)
                if ema_params is not None:
                    save_checkpoint(
                        os.path.join(run_dir, "ema"), global_step,
                        jax.device_get(ema_params),
                    )
                logger.info("saved checkpoint at step %d", global_step)
    mlog.finish()


def _sample_last_batch(cfg, model, state, diffusion, batch, run_dir, epoch, key):
    """In-training qualitative sampling on the epoch's last batch
    (reference train.py:299-337): save partials, targets, and samples as
    PLYs for visual inspection."""
    from ..diffusion.sampler import PointCloudSampler
    from ..models.wrapper import BoundTwoStream
    from ..utils.io import save_samples, save_target_point_clouds

    bound = BoundTwoStream(model, jax.device_get(state.params))
    sampler = PointCloudSampler(
        models=[bound], diffusions=[diffusion],
        num_points=[cfg.model.num_points], aux_channels=[],
        guidance_scale=[cfg.sample.guidance_scale], clip_denoised=True,
        use_karras=[cfg.sample.use_karras],
        karras_steps=[cfg.sample.karras_steps],
        sigma_min=[cfg.sample.sigma_min], sigma_max=[cfg.sample.sigma_max],
        s_churn=[cfg.sample.s_churn],
    )
    kwargs = {
        k: jnp.asarray(batch[k])
        for k in ("class_labels", "viewpoints", "partial_pcd", "depth_maps")
        if k in batch
    }
    B = len(batch["target"])
    samples = sampler.sample_batch(B, kwargs, key)
    save_target_point_clouds(
        batch["partial_pcd"], os.path.join(run_dir, f"partial_pcd_epoch_{epoch}"),
        prefix="partial_pcd",
    )
    save_target_point_clouds(
        batch["target"], os.path.join(run_dir, f"target_points_epoch_{epoch}"),
        prefix="target_points",
    )
    save_samples(np.asarray(samples), os.path.join(run_dir, f"samples_epoch_{epoch}"))
    logger.info("saved qualitative samples for epoch %d", epoch)


def cli():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    main(load_config(args.config, args.overrides))


if __name__ == "__main__":
    cli()
