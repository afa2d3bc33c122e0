"""Batch sampling to PLY/NPZ (the reference's ``run.py`` equivalent).

Loads a checkpoint (orbax full-state or reference ``.pt``), samples the test
set conditioned on partial scans, and saves targets/partials/samples
(``/root/reference/run.py:29-172``).

Usage: ``python -m pcdiff.cli.sample [--config cfg.yaml] [key.path=value ...]``
"""

from __future__ import annotations

import argparse
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import load_torch_checkpoint, restore_checkpoint
from ..core.config import Config, load_config
from ..data import BatchLoader, ModelNetCompletion
from ..diffusion import diffusion_from_betas
from ..diffusion.sampler import PointCloudSampler
from ..geometry import PointCloud
from ..models.wrapper import BoundTwoStream
from ..train import create_train_state
from .train import build_model

logger = logging.getLogger("pcdiff.sample")


def load_params(cfg: Config, model, key):
    path = cfg.sample.load_checkpoint_path
    if not path:
        raise FileNotFoundError("sample.load_checkpoint_path is not set")
    # Checkpoints are conventionally written in the unrolled
    # block_0..block_{n-1} layout, but a model.scan_blocks=true training run
    # saves the stacked blocks/block layout (train.py saves state as-is).
    # Detect the on-disk layout, restore against a matching-layout template,
    # then convert to the model's layout (both directions are lossless —
    # pcdiff.models.rin.stack/unstack_rcw_block_params).
    scanned = getattr(model, "scan_blocks", False)

    def _finish(variables, on_disk_scanned: bool):
        from ..models.rin import (
            stack_rcw_block_params,
            unstack_rcw_block_params,
        )

        if scanned and not on_disk_scanned:
            return stack_rcw_block_params(variables)
        if on_disk_scanned and not scanned:
            return unstack_rcw_block_params(variables)
        return variables

    if path.endswith(".pt"):
        return _finish(load_torch_checkpoint(path), False)
    from ..core.checkpoint import detect_bare_params, detect_scanned_layout
    from .train import init_params

    detected = detect_scanned_layout(path)
    # Undetectable metadata: assume the documented unrolled convention
    # first, fall back to the stacked template on structure mismatch.
    layouts = [detected] if detected is not None else [False, True]
    # EMA shadows (run_dir/ema) are bare variables pytrees, not TrainStates.
    bare = detect_bare_params(path)
    kinds = [bare] if bare is not None else [False, True]
    last_err = None
    for on_disk_scanned in layouts:
        base = (model if on_disk_scanned == scanned
                else model.clone(scan_blocks=on_disk_scanned))
        variables_tpl = init_params(base, cfg, key)
        for is_bare in kinds:
            template = variables_tpl if is_bare else create_train_state(
                base, variables_tpl, lr=1e-4, total_steps=1)
            try:
                restored, _ = restore_checkpoint(path, template)
            except Exception as e:  # orbax raises on tree-structure mismatch
                last_err = e
                continue
            tree = restored if is_bare else restored.params
            params = tree["params"] if "params" in tree else tree
            return _finish({"params": params}, on_disk_scanned)
    raise last_err


def save_cloud_batch(points: np.ndarray, out_dir: str, prefix: str,
                     fmt: str = "ply") -> None:
    os.makedirs(out_dir, exist_ok=True)
    for i, pts in enumerate(points):
        pc = PointCloud(coords=np.asarray(pts))
        path = os.path.join(out_dir, f"{prefix}_{i + 1}.{fmt}")
        if fmt == "ply":
            with open(path, "wb") as f:
                pc.write_ply(f)
        else:
            pc.save(path)


def main(cfg: Config) -> None:
    logging.basicConfig(level=logging.INFO)
    key = jax.random.PRNGKey(cfg.train.seed)
    model = build_model(cfg)
    key, load_key = jax.random.split(key)
    variables = load_params(cfg, model, load_key)
    bound = BoundTwoStream(model, variables)

    diffusion = diffusion_from_betas(
        cfg.diffusion.schedule, cfg.diffusion.timesteps,
        model_mean_type=cfg.diffusion.gaussiandiffusion.model_mean_type,
        model_var_type=cfg.diffusion.gaussiandiffusion.model_var_type,
        loss_type=cfg.diffusion.gaussiandiffusion.loss_type,
    )
    sampler = PointCloudSampler(
        models=[bound], diffusions=[diffusion],
        num_points=[cfg.model.num_points], aux_channels=[],
        guidance_scale=[cfg.sample.guidance_scale], clip_denoised=True,
        use_karras=[cfg.sample.use_karras],
        karras_steps=[cfg.sample.karras_steps],
        sigma_min=[cfg.sample.sigma_min], sigma_max=[cfg.sample.sigma_max],
        s_churn=[cfg.sample.s_churn],
        sampler=cfg.sample.sampler,
        parallel_options=dict(window=cfg.sample.parallel_window,
                              tol=cfg.sample.parallel_tol),
        guidance_interval=(
            (cfg.sample.guidance_interval_lo, cfg.sample.guidance_interval_hi)
            if cfg.sample.guidance_interval_hi > cfg.sample.guidance_interval_lo
            else None
        ),
    )

    dataset = ModelNetCompletion(cfg.data.h5_path, split="test")
    loader = BatchLoader(dataset, cfg.sample.num_samples, shuffle=False,
                         seed=cfg.train.seed, prefetch=1)
    out_dir = cfg.sample.output_dir
    fmt = cfg.sample.save_format

    # jit per batch size (the last batch may be ragged): eager dispatch
    # through the axon tunnel costs ~2 min/batch; the compiled program
    # samples in seconds (same math — see cli/evaluate.py).
    run_cache: dict = {}
    for bi, batch in enumerate(loader):
        kwargs = dict(
            class_labels=jnp.asarray(batch["class_labels"]),
            viewpoints=jnp.asarray(batch["viewpoints"]),
            partial_pcd=jnp.asarray(batch["partial_pcd"]),
            depth_maps=jnp.asarray(batch["depth_maps"]),
        )
        key, sub = jax.random.split(key)
        n = len(batch["target"])
        run = run_cache.get(n)
        if run is None:
            run = run_cache[n] = jax.jit(
                lambda kw, k, n=n: sampler.sample_batch(n, kw, k)
            )
        samples = run(kwargs, sub)
        base = os.path.join(out_dir, f"batch_{bi:04d}")
        save_cloud_batch(batch["target"], os.path.join(base, "targets"),
                         "target", fmt)
        save_cloud_batch(batch["partial_pcd"], os.path.join(base, "partials"),
                         "partial", fmt)
        save_cloud_batch(np.asarray(samples), os.path.join(base, "samples"),
                         "sample", fmt)
        logger.info("saved batch %d (%d samples) to %s", bi,
                    len(batch["target"]), base)
        break  # one fixed subset, matching run.py's single pass


def cli():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    main(load_config(args.config, args.overrides))


if __name__ == "__main__":
    cli()
