"""Tests for geometry ops: chamfer / F-score parity, FPS, IO round-trips."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pcdiff.geometry import (
    PointCloud,
    TriMesh,
    chamfer_distance_xyz,
    farthest_point_sample,
    fps,
    fscore,
    fscore_squared,
    knn,
    read_ply,
    square_distance,
    write_ply,
)

from .reference_import import ref_module

ref_pn2 = ref_module("evals.pointnet2_utils")

B, N, M = 3, 32, 24


@pytest.fixture
def clouds(rng):
    a = rng.standard_normal((B, N, 3)).astype(np.float32)
    b = rng.standard_normal((B, M, 3)).astype(np.float32)
    return a, b


def test_square_distance_matches_reference(clouds):
    a, b = clouds
    got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = ref_pn2.square_distance(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_chamfer_matches_reference(clouds):
    a, b = clouds
    ref_util = ref_module("models.util")
    got = np.asarray(chamfer_distance_xyz(jnp.asarray(a), jnp.asarray(b)))
    # reference takes channels-first [B, C, N]
    want = ref_util.chamfer_distance_xyz(
        torch.from_numpy(np.swapaxes(a, 1, 2)), torch.from_numpy(np.swapaxes(b, 1, 2))
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fscore_matches_reference(clouds):
    a, b = clouds
    ref_util = ref_module("models.util")
    got = fscore(jnp.asarray(a), jnp.asarray(b), threshold=0.5)
    want = ref_util.fscore_point_cloud_batch(
        torch.from_numpy(a), torch.from_numpy(b), threshold=0.5
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-5, atol=1e-6)


def test_fscore_squared_matches_reference(clouds):
    a, b = clouds
    ref_util = ref_module("models.util")
    got = fscore_squared(jnp.asarray(a), jnp.asarray(b), threshold=0.3)
    want = ref_util.fscore_point_cloud_batch_squared(
        torch.from_numpy(a), torch.from_numpy(b), threshold=0.3
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-5, atol=1e-6)


def test_fps_deterministic_matches_reference(clouds):
    a, _ = clouds
    got = np.asarray(farthest_point_sample(jnp.asarray(a), 8, deterministic=True))
    want = ref_pn2.farthest_point_sample(
        torch.from_numpy(a), 8, deterministic=True
    ).numpy()
    np.testing.assert_array_equal(got, want)


def test_native_fps_matches_jax_kernel(rng):
    """The C++ host FPS (native/fps.cpp) must be index-exact with the jitted
    deterministic kernel, including non-trivial start indices."""
    from pcdiff.geometry.fps_native import native_available, native_fps_indices

    if not native_available():
        pytest.skip("native/libfps.so not built (make -C native)")
    pts = rng.standard_normal((5, 37, 3)).astype(np.float32)
    got = native_fps_indices(pts, 8)
    want = np.asarray(
        farthest_point_sample(jnp.asarray(pts), 8, deterministic=True)
    )
    np.testing.assert_array_equal(got, want)
    # chunk-style starts path used by the MVP precache
    starts = np.arange(5, dtype=np.int32) % 2
    got2 = native_fps_indices(pts, 8, starts=starts)
    assert (got2[:, 0] == starts).all()
    for row in got2:
        assert len(np.unique(row)) == 8


def test_fps_random_is_spread(clouds):
    a, _ = clouds
    out = fps(jnp.asarray(a), 8, key=jax.random.PRNGKey(0))
    assert out.shape == (B, 8, 3)
    # all selected points distinct per batch
    for row in np.asarray(out):
        assert len(np.unique(row, axis=0)) == 8


def test_knn_sorted(clouds):
    a, b = clouds
    d, idx = knn(jnp.asarray(a), jnp.asarray(b), k=4)
    d = np.asarray(d)
    assert (np.diff(d, axis=-1) >= -1e-6).all()
    full = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(d[..., 0], full.min(-1), rtol=1e-5, atol=1e-6)


def test_ply_roundtrip(rng):
    coords = rng.standard_normal((10, 3)).astype(np.float32)
    rgb = rng.random((10, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    buf = io.BytesIO()
    write_ply(buf, coords, rgb=rgb, faces=faces)
    buf.seek(0)
    out = read_ply(buf)
    np.testing.assert_allclose(out["coords"], coords, rtol=1e-6)
    np.testing.assert_allclose(out["rgb"], np.round(rgb * 255.499) / 255.0, atol=1e-6)
    np.testing.assert_array_equal(out["faces"], faces)


def test_ply_matches_reference_writer(rng):
    ref_ply = ref_module("util.ply_util")
    coords = rng.standard_normal((7, 3)).astype(np.float32)
    rgb = rng.random((7, 3)).astype(np.float32)
    ours, theirs = io.BytesIO(), io.BytesIO()
    write_ply(ours, coords, rgb=rgb)
    ref_ply.write_ply(theirs, coords=coords, rgb=rgb)
    assert ours.getvalue() == theirs.getvalue()


def test_point_cloud_npz_roundtrip(rng, tmp_path):
    pc = PointCloud(
        coords=rng.standard_normal((20, 3)).astype(np.float32),
        channels={"R": rng.random(20), "G": rng.random(20), "B": rng.random(20)},
    )
    path = str(tmp_path / "pc.npz")
    pc.save(path)
    back = PointCloud.load(path)
    np.testing.assert_array_equal(back.coords, pc.coords)
    assert set(back.channels) == {"R", "G", "B"}


def test_point_cloud_fps_subsample(rng):
    pc = PointCloud(coords=rng.standard_normal((100, 3)).astype(np.float32))
    sub = pc.farthest_point_sample(10, init_idx=0)
    assert len(sub) == 10
    assert (sub.coords[0] == pc.coords[0]).all()


def test_trimesh_roundtrip(rng, tmp_path):
    mesh = TriMesh(
        verts=rng.standard_normal((12, 3)).astype(np.float32),
        faces=np.array([[0, 1, 2], [2, 3, 4]], dtype=np.int64),
        vertex_channels={"R": rng.random(12)},
    )
    path = str(tmp_path / "mesh.npz")
    mesh.save(path)
    back = TriMesh.load(path)
    np.testing.assert_array_equal(back.verts, mesh.verts)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    assert "R" in back.vertex_channels
