"""Quantitative evaluation (the reference's ``evaluation.py`` equivalent).

Samples the test set and reports overall + per-class CD (squared-L2) and
F1@0.03, with FPS-downsampled variants for >1024-point samples; predictions
clamped to +-0.5 before metrics (``/root/reference/evaluation.py:76-196``).
Writes a log file next to stdout output.

Usage: ``python -m pcdiff.cli.evaluate [--config cfg.yaml] [key.path=value ...]``
"""

from __future__ import annotations

import argparse
import datetime
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config, load_config
from ..data import BatchLoader, ModelNetCompletion
from ..diffusion import diffusion_from_betas
from ..diffusion.sampler import PointCloudSampler
from ..evals import CompletionMetrics
from ..models.wrapper import BoundTwoStream
from ..ops import attention_backend
from .sample import load_params
from .train import build_model

logger = logging.getLogger("pcdiff.evaluate")


def main(cfg: Config) -> dict:
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    # Dual file+stream logger scoped to this module (the reference's
    # evaluation.py:19-31 pattern) — NOT the root logger, so third-party
    # INFO noise (orbax, jax) stays out of the committed evaluation logs.
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")
    for handler in logger.handlers:
        handler.close()  # scripts call main() repeatedly in one process
    logger.handlers.clear()
    logger.setLevel(logging.INFO)
    logger.propagate = False
    for handler in (
        logging.StreamHandler(),
        logging.FileHandler(f"evaluation_log_{timestamp}.txt"),
    ):
        handler.setFormatter(fmt)
        logger.addHandler(handler)
    logger.info(
        "evaluate: checkpoint=%s data=%s points=%d karras_steps=%d "
        "guidance=%.2f batch=%d attention_backend=%s",
        cfg.sample.load_checkpoint_path, cfg.data.h5_path,
        cfg.model.num_points, cfg.sample.karras_steps,
        cfg.sample.guidance_scale, cfg.sample.num_samples,
        attention_backend(),
    )
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
    label_to_class = {v: k for k, v in dataset.class_to_label.items()}
    loader = BatchLoader(dataset, cfg.sample.num_samples, shuffle=False,
                         seed=cfg.train.seed, drop_last=False)
    metrics = CompletionMetrics(fps_points=1024)

    # One compiled program per batch size (the last batch may be ragged):
    # outside jit, every encoder/solver op dispatches eagerly through the
    # device tunnel — ~2 min/batch of pure dispatch latency on axon vs
    # seconds for the compiled program (same math; bench.py does the same).
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
        pred = np.clip(np.asarray(samples), -0.5, 0.5)
        metrics.update(pred, batch["target"], batch["class_labels"])
        logger.info("evaluated batch %d (%d samples)", bi, len(pred))

    summary = metrics.summary(class_names=label_to_class)
    logger.info("overall: %s", json.dumps(summary["overall"], indent=2))
    for cls, vals in summary["per_class"].items():
        logger.info(
            "%s: cd_full=%.6f f1_full=%.6f", cls, vals["cd_full"], vals["f1_full"]
        )
    return summary


def cli():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    main(load_config(args.config, args.overrides))


if __name__ == "__main__":
    cli()
