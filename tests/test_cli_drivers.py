"""CLI driver tests: the evaluate driver end-to-end over the synthetic
fixture with a checkpointed tiny model (CPU mesh)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.core.checkpoint import save_checkpoint
from pcdiff.core.config import load_config
from pcdiff.data import make_modelnet_fixture
from pcdiff.train import create_train_state

TINY_OVERRIDES = [
    "model.num_points=64", "model.num_latents=8", "model.latent_dim=32",
    "model.x_dim=32", "model.num_blocks=1", "model.num_compute_layers=1",
    "model.num_heads=4", "model.num_tokens_ppcd=4", "model.num_tokens_depth=4",
    "model.depth_image_size=64", "model.depth_patch=16",
    "diffusion.timesteps=50",
    "sample.karras_steps=2", "sample.num_samples=10", "sample.sigma_max=20",
]


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    h5 = make_modelnet_fixture(str(root / "synth.h5"))
    cfg = load_config(None, TINY_OVERRIDES + [f"data.h5_path={h5}"])

    from pcdiff.cli.train import build_model, init_params

    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    state = create_train_state(model, params, lr=1e-3, total_steps=10)
    ckpt_dir = str(root / "checkpoints")
    save_checkpoint(ckpt_dir, 1, jax.device_get(state))
    return cfg, ckpt_dir


def test_evaluate_driver_end_to_end(tiny_setup, tmp_path, monkeypatch):
    cfg, ckpt_dir = tiny_setup
    monkeypatch.chdir(tmp_path)  # evaluation log file lands here
    from pcdiff.core.config import apply_overrides
    from pcdiff.cli.evaluate import main as eval_main

    cfg = apply_overrides(cfg, [f"sample.load_checkpoint_path={ckpt_dir}"])
    summary = eval_main(cfg)
    assert summary["overall"]["count"] == 30
    assert np.isfinite(summary["overall"]["cd_full"])
    assert set(summary["per_class"]) == {
        "airplane", "bench", "bottle", "car", "monitor"
    }
    logs = glob.glob(str(tmp_path / "evaluation_log_*.txt"))
    assert logs and os.path.getsize(logs[0]) > 0


def test_sample_driver_end_to_end(tiny_setup, tmp_path):
    cfg, ckpt_dir = tiny_setup
    from pcdiff.core.config import apply_overrides
    from pcdiff.cli.sample import main as sample_main

    out_dir = str(tmp_path / "samples")
    cfg = apply_overrides(cfg, [
        f"sample.load_checkpoint_path={ckpt_dir}",
        f"sample.output_dir={out_dir}",
    ])
    sample_main(cfg)
    plys = glob.glob(os.path.join(out_dir, "batch_0000", "samples", "*.ply"))
    assert len(plys) == 10
    partials = glob.glob(os.path.join(out_dir, "batch_0000", "partials", "*.ply"))
    assert len(partials) == 10
