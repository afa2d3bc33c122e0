"""Auxiliary subsystems: H5 QA audit, EMA, metrics logging, pc->mesh."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcdiff.core.logging import MetricsLogger, profile_trace
from pcdiff.data import make_modelnet_fixture
from pcdiff.data.qa import audit_modelnet_h5
from pcdiff.train import ema_update, init_ema


def test_audit_clean_fixture(tmp_path):
    path = make_modelnet_fixture(str(tmp_path / "clean.h5"))
    report = audit_modelnet_h5(path, expected_points=64, expected_scans=3)
    assert report.ok()
    assert "airplane" in report.value_ranges
    assert report.scan_counts["airplane"] == [3, 3]


def test_audit_detects_incomplete_instance(tmp_path):
    import h5py

    path = make_modelnet_fixture(str(tmp_path / "broken.h5"))
    with h5py.File(path, "a") as f:
        del f["airplane"]["airplane_0000"]["partials"]["scan_0001"]["pointcloud"]
        del f["bench"]["bench_0001"]["ground_truth"]
    report = audit_modelnet_h5(path, expected_points=64, expected_scans=3)
    assert not report.ok()
    joined = " ".join(report.incomplete_instances)
    assert "airplane/airplane_0000/scan_0001" in joined
    assert "bench/bench_0001" in joined


def test_ema_update_moves_towards_params():
    params = {"w": jnp.ones((4,)) * 2.0}
    ema = init_ema({"w": jnp.zeros((4,))})
    for _ in range(10):
        ema = ema_update(ema, params, decay=0.5)
    np.testing.assert_allclose(np.asarray(ema["w"]), 2.0, atol=1e-2)


def test_metrics_logger_jsonl(tmp_path):
    mlog = MetricsLogger(str(tmp_path), use_wandb=False)
    mlog.log({"loss": 1.5}, step=1)
    mlog.log({"loss": jnp.asarray(0.5)}, step=2)
    mlog.finish()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 1
    assert lines[1]["loss"] == 0.5


def test_metrics_logger_non_lead_noop(tmp_path):
    mlog = MetricsLogger(str(tmp_path / "x"), is_lead_host=False)
    mlog.log({"loss": 1.0})  # must not crash or write
    mlog.finish()
    assert not os.path.exists(tmp_path / "x")


def test_pc_to_mesh_sphere_sdf():
    """End-to-end pc->mesh with a trivial analytic 'model'."""
    from pcdiff.geometry import PointCloud
    from pcdiff.utils.pc_to_mesh import marching_cubes_mesh

    rng = np.random.default_rng(0)
    sphere_pts = rng.standard_normal((64, 3))
    sphere_pts = 0.3 * sphere_pts / np.linalg.norm(sphere_pts, axis=1, keepdims=True)
    pc = PointCloud(coords=sphere_pts.astype(np.float32),
                    channels={"R": np.ones(64) * 0.5})
    mesh = marching_cubes_mesh(
        pc,
        encode_fn=lambda clouds: {},
        predict_fn=lambda q, enc: jnp.linalg.norm(q, axis=-1) - 0.3,
        batch_size=2048, grid_size=24,
        side_length=1.0, fill_vertex_channels=True,
    )
    assert len(mesh.verts) > 50 and len(mesh.faces) > 50
    radii = np.linalg.norm(mesh.verts, axis=1)
    assert abs(radii.mean() - 0.3) < 0.02
    assert "R" in mesh.vertex_channels
    np.testing.assert_allclose(mesh.vertex_channels["R"], 0.5)


def test_profile_trace_noop():
    with profile_trace(None):
        pass
    with profile_trace("/tmp/x", enabled=False):
        pass
