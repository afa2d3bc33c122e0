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


@pytest.mark.parametrize("device_data", ["on", "off"])
def test_train_driver_end_to_end(tiny_setup, tmp_path, device_data):
    """cli.train.main: 2 epochs on the tiny fixture — per-step metrics land
    in metrics.jsonl (bulk-fetched per epoch), the orbax checkpoint and the
    EMA shadow both save, and the checkpoint restores via load_params.
    Covers BOTH batch paths: device-resident data (sharded index gather)
    and the streaming loader."""
    import json

    from pcdiff.core.config import apply_overrides
    from pcdiff.cli.sample import load_params
    from pcdiff.cli.train import build_model, main as train_main

    cfg, _ = tiny_setup
    out_root = str(tmp_path / f"train_runs_{device_data}")
    cfg = apply_overrides(cfg, [
        f"train.output_dir={out_root}", "train.epochs=2",
        "train.batch_size=8",  # must divide the 8-device test mesh
        "train.save_every=2", "train.ema_decay=0.9",
        "train.sample_every=1000", "train.start_chamfer=1",
        f"train.device_data={device_data}",
    ])
    train_main(cfg)
    run_dir = glob.glob(os.path.join(out_root, "run_*"))[0]
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(lines) == 2 * 3  # 30 fixture samples / batch 8, drop_last
    assert [l["step"] for l in lines] == list(range(1, 7))
    assert all(np.isfinite(l["loss"]) for l in lines)
    assert os.path.isdir(os.path.join(run_dir, "checkpoints"))
    assert os.path.isdir(os.path.join(run_dir, "ema"))

    cfg_load = apply_overrides(cfg, [
        "sample.load_checkpoint_path=" + os.path.join(run_dir, "checkpoints")
    ])
    variables = load_params(cfg_load, build_model(cfg_load),
                            jax.random.PRNGKey(0))
    assert "params" in variables

    # The EMA shadow is a BARE params pytree (no TrainState); load_params
    # must detect that from checkpoint metadata and restore it too. After
    # ema_decay=0.9 x 6 steps from an init copy, EMA != raw params.
    cfg_ema = apply_overrides(cfg, [
        "sample.load_checkpoint_path=" + os.path.join(run_dir, "ema")
    ])
    ema_vars = load_params(cfg_ema, build_model(cfg_ema),
                           jax.random.PRNGKey(0))
    raw_leaves = jax.tree.leaves(variables)
    ema_leaves = jax.tree.leaves(ema_vars)
    assert len(raw_leaves) == len(ema_leaves)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(raw_leaves, ema_leaves)
    )


def test_train_driver_resume(tiny_setup, tmp_path):
    """continue_training resumes the epoch counter, metrics step axis and
    the EMA shadow from the restored step instead of restarting at 0."""
    import json

    from pcdiff.core.config import apply_overrides
    from pcdiff.cli.train import main as train_main

    cfg, _ = tiny_setup
    out_root = str(tmp_path / "resume_runs")
    base = apply_overrides(cfg, [
        f"train.output_dir={out_root}", "train.epochs=2",
        "train.batch_size=8", "train.save_every=2", "train.ema_decay=0.9",
        "train.sample_every=1000", "train.start_chamfer=1",
    ])
    train_main(base)
    run1 = glob.glob(os.path.join(out_root, "run_*"))[0]

    out_root2 = str(tmp_path / "resume_runs2")
    cfg2 = apply_overrides(base, [
        f"train.output_dir={out_root2}",
        "train.epochs=4", "train.continue_training=true",
        "train.load_checkpoint_path=" + os.path.join(run1, "checkpoints"),
    ])
    train_main(cfg2)
    run2 = glob.glob(os.path.join(out_root2, "run_*"))[0]
    lines = [json.loads(l)
             for l in open(os.path.join(run2, "metrics.jsonl"))]
    # resumed at step 6 (2 epochs x 3 steps) -> logs steps 7..12 only
    assert [l["step"] for l in lines] == list(range(7, 13))


def test_load_params_scan_trained_checkpoint(tiny_setup, tmp_path):
    """A model.scan_blocks=true training run saves the STACKED blocks/block
    layout; load_params must detect it and restore for both scanned and
    unrolled sampling (ADVICE r4: previously only unrolled->stacked worked)."""
    from pcdiff.core.config import apply_overrides
    from pcdiff.cli.sample import load_params
    from pcdiff.cli.train import build_model, init_params

    cfg, _ = tiny_setup
    cfg_scan = apply_overrides(cfg, ["model.scan_blocks=true",
                                     "model.num_blocks=2"])
    model_scan = build_model(cfg_scan)
    params = init_params(model_scan, cfg_scan, jax.random.PRNGKey(3))
    assert "blocks" in params["params"]["backbone"]  # stacked on disk
    state = create_train_state(model_scan, params, lr=1e-3, total_steps=10)
    ckpt_dir = str(tmp_path / "scan_ckpt")
    save_checkpoint(ckpt_dir, 1, jax.device_get(state))

    from pcdiff.core.checkpoint import detect_scanned_layout

    assert detect_scanned_layout(ckpt_dir) is True

    cfg_load = apply_overrides(cfg_scan,
                               [f"sample.load_checkpoint_path={ckpt_dir}"])
    restored_scan = load_params(cfg_load, model_scan, jax.random.PRNGKey(4))
    for a, b in zip(jax.tree.leaves(restored_scan), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg_unrolled = apply_overrides(cfg_load, ["model.scan_blocks=false"])
    model_unrolled = build_model(cfg_unrolled)
    restored_unrolled = load_params(cfg_unrolled, model_unrolled,
                                    jax.random.PRNGKey(4))
    assert "block_0" in restored_unrolled["params"]["backbone"]
    from pcdiff.models.rin import stack_rcw_block_params

    for a, b in zip(jax.tree.leaves(stack_rcw_block_params(restored_unrolled)),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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


def test_sample_driver_heun_parallel(tiny_setup, tmp_path):
    """sample.sampler=heun_parallel reaches the Picard solver from the CLI
    config surface and writes the same file layout."""
    cfg, ckpt_dir = tiny_setup
    from pcdiff.core.config import apply_overrides
    from pcdiff.cli.sample import main as sample_main

    out_dir = str(tmp_path / "samples_par")
    cfg = apply_overrides(cfg, [
        f"sample.load_checkpoint_path={ckpt_dir}",
        f"sample.output_dir={out_dir}",
        "sample.sampler=heun_parallel",
        "sample.parallel_window=2", "sample.parallel_tol=0.001",
    ])
    sample_main(cfg)
    plys = glob.glob(os.path.join(out_dir, "batch_0000", "samples", "*.ply"))
    assert len(plys) == 10


def test_sample_driver_ply_output_parity(tiny_setup, tmp_path):
    """The PLY files a full sample run writes must decode to exactly the
    samples the sampler computes for the same checkpoint/config/RNG stream
    (pins checkpoint load -> sampling -> PLY encode end-to-end)."""
    import jax.numpy as jnp

    from pcdiff.core.config import apply_overrides
    from pcdiff.cli.sample import load_params, main as sample_main
    from pcdiff.cli.train import build_model
    from pcdiff.data import BatchLoader, ModelNetCompletion
    from pcdiff.diffusion import diffusion_from_betas
    from pcdiff.diffusion.sampler import PointCloudSampler
    from pcdiff.geometry import PointCloud
    from pcdiff.models.wrapper import BoundTwoStream

    cfg, ckpt_dir = tiny_setup
    out_dir = str(tmp_path / "samples")
    cfg = apply_overrides(cfg, [
        f"sample.load_checkpoint_path={ckpt_dir}",
        f"sample.output_dir={out_dir}",
    ])
    sample_main(cfg)

    # reproduce the driver's exact RNG stream and sampler configuration
    key = jax.random.PRNGKey(cfg.train.seed)
    key, load_key = jax.random.split(key)
    model = build_model(cfg)
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
    )
    dataset = ModelNetCompletion(cfg.data.h5_path, split="test")
    loader = BatchLoader(dataset, cfg.sample.num_samples, shuffle=False,
                         seed=cfg.train.seed, prefetch=1)
    batch = next(iter(loader))
    kwargs = dict(
        class_labels=jnp.asarray(batch["class_labels"]),
        viewpoints=jnp.asarray(batch["viewpoints"]),
        partial_pcd=jnp.asarray(batch["partial_pcd"]),
        depth_maps=jnp.asarray(batch["depth_maps"]),
    )
    key, sub = jax.random.split(key)
    # jit exactly as the driver does (cli/sample.py): eager vs jitted
    # execution differs at fp32-fusion rounding, and this pin is bitwise
    n = len(batch["target"])
    want = np.asarray(
        jax.jit(lambda kw, k: sampler.sample_batch(n, kw, k))(kwargs, sub)
    ).astype(np.float32)

    from pcdiff.geometry.ply import read_ply

    for i in range(len(want)):
        with open(os.path.join(out_dir, "batch_0000", "samples",
                               f"sample_{i + 1}.ply"), "rb") as f:
            fields = read_ply(f)
        np.testing.assert_array_equal(fields["coords"], want[i])

    # targets round-trip too (written from the dataset batch directly)
    with open(os.path.join(out_dir, "batch_0000", "targets",
                           "target_1.ply"), "rb") as f:
        fields = read_ply(f)
    np.testing.assert_array_equal(
        fields["coords"], batch["target"][0].astype(np.float32)
    )


def test_evaluate_pfid_cli_matches_torch_pipeline(tmp_path, monkeypatch, capsys):
    """Stream two sharded npz batches through the P-FID CLI with a random
    torch PointNet++ checkpoint and check the printed FID against the torch
    reference pipeline (ref model forward + ref FID math) on the same data."""
    import torch

    from .reference_import import ref_module

    ref_cls = ref_module("evals.pointnet2_cls_ssg")
    ref_fid = ref_module("evals.fid_is")

    torch.manual_seed(0)
    ref_model = ref_cls.get_model(num_class=40, normal_channel=False, width_mult=2)
    ref_model.eval()
    for m in ref_model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    ckpt = str(tmp_path / "pointnet.pt")
    torch.save({"model_state_dict": ref_model.state_dict()}, ckpt)

    rng = np.random.default_rng(0)
    n, p = 24, 64
    batch1 = rng.standard_normal((n, p, 3)).astype(np.float32)
    batch2 = (rng.standard_normal((n, p, 3)) * 1.2 + 0.1).astype(np.float32)
    # batch 1 split over two shards to exercise the glob streaming path
    np.savez(tmp_path / "a_000.npz", arr_0=batch1[: n // 2])
    np.savez(tmp_path / "a_001.npz", arr_0=batch1[n // 2 :])
    np.savez(tmp_path / "b_000.npz", arr_0=batch2)

    from pcdiff.cli.evaluate_pfid import main as pfid_main

    monkeypatch.setattr(
        "sys.argv",
        ["evaluate_pfid", str(tmp_path / "a_*.npz"), str(tmp_path / "b_000.npz"),
         "--checkpoint", ckpt],
    )
    pfid_main()
    printed = capsys.readouterr().out
    got = float(printed.strip().splitlines()[-1].split("P-FID:")[1])

    # torch reference pipeline on the same data: normalize
    # (feature_extractor.py:114-119) -> eval-mode forward -> FID
    def ref_feats(batch):
        pc = batch - batch.mean(axis=1, keepdims=True)
        pc = pc / np.sqrt((pc**2).sum(-1, keepdims=True)).max(axis=1, keepdims=True)
        with torch.no_grad():
            _, _, feats = ref_model(
                torch.from_numpy(pc).permute(0, 2, 1), features=True
            )
        return feats.numpy()

    want = ref_fid.compute_statistics(ref_feats(batch1)).frechet_distance(
        ref_fid.compute_statistics(ref_feats(batch2))
    )
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=2e-3)
