"""Marching cubes: exhaustive 256-config watertightness, sphere geometry,
orientation conventions (reference ``util/pc_to_mesh.py:70-94``)."""

import numpy as np
import pytest

from pcdiff.utils.marching import marching_cubes, _MC_CORNERS


def _check_closed_oriented(verts, faces):
    """Every directed edge appears exactly once, and its reverse exactly
    once — the mesh is a closed, consistently oriented 2-manifold."""
    assert len(faces) > 0
    directed = set()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            assert e not in directed, f"duplicate directed edge {e}"
            directed.add(e)
    for e in directed:
        assert (e[1], e[0]) in directed, f"unmatched edge {e}"


def _trilinear(volume, pts):
    base = np.minimum(pts.astype(np.int64), np.array(volume.shape) - 2)
    f = pts - base
    out = np.zeros(len(pts))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                out += w * volume[base[:, 0] + dx, base[:, 1] + dy, base[:, 2] + dz]
    return out


def test_all_256_configs_watertight_and_on_levelset():
    """Embed every cube configuration in a padded 4^3 volume; the resulting
    mesh must be closed, consistently oriented, and lie on the level set —
    this exhaustively validates the generated lookup table including
    consistency across neighboring cube configs."""
    for config in range(1, 256):
        volume = np.ones((4, 4, 4), dtype=np.float64)
        for c, (ox, oy, oz) in enumerate(_MC_CORNERS):
            if (config >> c) & 1:
                volume[1 + ox, 1 + oy, 1 + oz] = -1.0
        verts, faces, normals = marching_cubes(volume, level=0.0)
        _check_closed_oriented(verts, faces)
        np.testing.assert_allclose(_trilinear(volume, verts), 0.0, atol=1e-9)
        # no degenerate faces
        a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        areas = np.linalg.norm(np.cross(b - a, c - a), axis=1)
        assert (areas > 1e-9).all(), config
        assert np.isfinite(normals).all()


def test_random_volumes_watertight():
    rng = np.random.default_rng(0)
    for _ in range(5):
        volume = rng.standard_normal((6, 6, 6))
        volume[0, :, :] = volume[-1, :, :] = 1.0
        volume[:, 0, :] = volume[:, -1, :] = 1.0
        volume[:, :, 0] = volume[:, :, -1] = 1.0
        verts, faces, _ = marching_cubes(volume, level=0.0)
        _check_closed_oriented(verts, faces)
        # float32 vertex quantization bounds the level-set residual
        np.testing.assert_allclose(_trilinear(volume, verts), 0.0, atol=1e-5)


def _sphere_volume(n=33, r=0.35):
    axis = np.linspace(-0.5, 0.5, n)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    sdf = np.sqrt(x**2 + y**2 + z**2) - r  # negative inside
    return sdf, axis[1] - axis[0]


def test_sphere_geometry_and_topology():
    sdf, h = _sphere_volume()
    r = 0.35
    verts, faces, normals = marching_cubes(sdf, level=0.0, spacing=(h, h, h))
    verts_c = verts - 0.5  # center the coordinate frame
    _check_closed_oriented(verts, faces)

    radii = np.linalg.norm(verts_c, axis=1)
    np.testing.assert_allclose(radii, r, atol=h)

    # Euler characteristic of a sphere = 2
    edges = set()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            edges.add(frozenset(e))
    assert len(verts) - len(edges) + len(faces) == 2

    # surface area within a few percent of 4 pi r^2
    a, b, c = verts_c[faces[:, 0]], verts_c[faces[:, 1]], verts_c[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    assert abs(area - 4 * np.pi * r**2) / (4 * np.pi * r**2) < 0.03

    # faces wound right-hand/outward (the reference's post-fix convention)
    centroids = (a + b + c) / 3
    fn = np.cross(b - a, c - a)
    assert (np.sum(fn * centroids, axis=1) > 0).all()

    # default (descent) vertex normals point toward decreasing SDF = inward
    assert (np.sum(normals * verts_c, axis=1) < 0).all()
    _, _, asc = marching_cubes(
        sdf, level=0.0, spacing=(h, h, h), gradient_direction="ascent"
    )
    assert (np.sum(asc * verts_c, axis=1) > 0).all()


def test_two_components():
    axis = np.linspace(-1.0, 1.0, 33)
    x, y, z = np.meshgrid(axis, axis, axis, indexing="ij")
    s1 = np.sqrt((x + 0.5) ** 2 + y**2 + z**2) - 0.3
    s2 = np.sqrt((x - 0.5) ** 2 + y**2 + z**2) - 0.3
    verts, faces, _ = marching_cubes(np.minimum(s1, s2), level=0.0)
    _check_closed_oriented(verts, faces)
    edges = set()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            edges.add(frozenset(e))
    # two spheres: Euler characteristic 2 + 2
    assert len(verts) - len(edges) + len(faces) == 4


def test_nonzero_level_and_empty():
    sdf, h = _sphere_volume()
    verts, faces, _ = marching_cubes(sdf, level=0.1)
    assert len(faces) > 0
    v0, f0, n0 = marching_cubes(np.ones((4, 4, 4)), level=0.0)
    assert len(v0) == 0 and len(f0) == 0 and len(n0) == 0


def test_pc_to_mesh_uses_marching_cubes():
    """End-to-end pc->mesh on an analytic sphere SDF produces a closed mesh
    with vertex channels filled from the cloud."""
    import jax.numpy as jnp

    from pcdiff.geometry.point_cloud import PointCloud
    from pcdiff.utils.pc_to_mesh import marching_cubes_mesh

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((256, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True) / 0.35
    pc = PointCloud(
        coords=pts, channels={"R": np.ones(256, np.float32)}
    )

    encode = lambda clouds: None
    predict = lambda q, enc: jnp.linalg.norm(q, axis=-1) - 0.35
    mesh = marching_cubes_mesh(
        pc, encode_fn=encode, predict_fn=predict, grid_size=24, batch_size=2048
    )
    _check_closed_oriented(mesh.verts, mesh.faces)
    np.testing.assert_allclose(
        np.linalg.norm(mesh.verts, axis=1), 0.35, atol=0.05
    )
    assert mesh.vertex_channels["R"].shape == (len(mesh.verts),)
