"""Vectorized isosurface extraction (marching tetrahedra, pure numpy).

Replaces the reference's host-side ``skimage.measure.marching_cubes`` call
(``/root/reference/util/pc_to_mesh.py:70``; skimage is not a dependency of
this framework). Each grid cube is split into 6 tetrahedra; each tetrahedron
contributes 0-2 triangles with vertices linearly interpolated onto the zero
level set. Produces a valid triangulation of the same isosurface (more
triangles than marching cubes, identical geometry up to triangulation).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["marching_tetrahedra"]

# Cube corners numbered idx = cx + 2*cy + 4*cz over these offsets:
_CORNER_OFFSETS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
        [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1],
    ],
    dtype=np.int32,
)
# A consistent 6-tetrahedra split of the cube, all sharing the 0-7 diagonal:
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    dtype=np.int32,
)


def _interp(p1, p2, v1, v2, level):
    t = (level - v1) / np.where(np.abs(v2 - v1) < 1e-12, 1e-12, v2 - v1)
    t = np.clip(t, 0.0, 1.0)[..., None]
    return p1 + t * (p2 - p1)


def marching_tetrahedra(
    volume: np.ndarray, level: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the ``level`` isosurface of a 3D scalar field.

    volume: [X, Y, Z] float array (values at integer grid coordinates).
    Returns (verts [V, 3] in index coordinates, faces [F, 3] int32) with
    faces oriented so normals point toward decreasing field values.
    """
    volume = np.asarray(volume, dtype=np.float64)
    nx, ny, nz = volume.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # all cube origins
    gx, gy, gz = np.meshgrid(
        np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1), indexing="ij"
    )
    origins = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [C, 3]

    # corner values per cube: [C, 8]
    corner_coords = origins[:, None, :] + _CORNER_OFFSETS[None]  # [C, 8, 3]
    vals = volume[
        corner_coords[..., 0], corner_coords[..., 1], corner_coords[..., 2]
    ]

    # quick reject cubes fully on one side
    keep = ~(
        np.all(vals > level, axis=1) | np.all(vals < level, axis=1)
    )
    corner_coords = corner_coords[keep].astype(np.float64)
    vals = vals[keep]
    if len(vals) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    tris = []
    for tet in _TETS:
        p = corner_coords[:, tet, :]  # [C, 4, 3]
        v = vals[:, tet]  # [C, 4]
        inside = v < level  # [C, 4]
        count = inside.sum(axis=1)

        # one vertex inside (or one outside): single triangle
        for flip, cnt in ((False, 1), (True, 3)):
            sel = count == cnt
            if not sel.any():
                continue
            pi, vi, ins = p[sel], v[sel], inside[sel]
            # the lone corner (inside if cnt==1 else outside)
            lone_mask = ins if cnt == 1 else ~ins
            lone_idx = np.argmax(lone_mask, axis=1)
            others = np.argsort(~lone_mask, axis=1)[:, :3]  # the 3 non-lone
            a = np.take_along_axis(pi, lone_idx[:, None, None].repeat(3, -1), 1)[:, 0]
            va = np.take_along_axis(vi, lone_idx[:, None], 1)[:, 0]
            tri_pts = []
            for j in range(3):
                b = np.take_along_axis(pi, others[:, j][:, None, None].repeat(3, -1), 1)[:, 0]
                vb = np.take_along_axis(vi, others[:, j][:, None], 1)[:, 0]
                tri_pts.append(_interp(a, b, va, vb, level))
            tri = np.stack(tri_pts, axis=1)  # [M, 3, 3]
            if flip:
                tri = tri[:, ::-1]
            tris.append(tri)

        # two inside / two outside: quad -> two triangles
        sel = count == 2
        if sel.any():
            pi, vi, ins = p[sel], v[sel], inside[sel]
            in_idx = np.argsort(~ins, axis=1)[:, :2]   # two inside corners
            out_idx = np.argsort(ins, axis=1)[:, :2]   # two outside corners

            def gp(idx):
                return np.take_along_axis(pi, idx[:, None, None].repeat(3, -1), 1)[:, 0]

            def gv(idx):
                return np.take_along_axis(vi, idx[:, None], 1)[:, 0]

            a0, a1 = gp(in_idx[:, 0]), gp(in_idx[:, 1])
            b0, b1 = gp(out_idx[:, 0]), gp(out_idx[:, 1])
            va0, va1 = gv(in_idx[:, 0]), gv(in_idx[:, 1])
            vb0, vb1 = gv(out_idx[:, 0]), gv(out_idx[:, 1])
            e00 = _interp(a0, b0, va0, vb0, level)
            e01 = _interp(a0, b1, va0, vb1, level)
            e10 = _interp(a1, b0, va1, vb0, level)
            e11 = _interp(a1, b1, va1, vb1, level)
            tris.append(np.stack([e00, e01, e11], axis=1))
            tris.append(np.stack([e00, e11, e10], axis=1))

    if not tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    all_tris = np.concatenate(tris, axis=0)  # [T, 3, 3]

    # drop degenerate triangles
    e1 = all_tris[:, 1] - all_tris[:, 0]
    e2 = all_tris[:, 2] - all_tris[:, 0]
    area2 = np.linalg.norm(np.cross(e1, e2), axis=1)
    all_tris = all_tris[area2 > 1e-12]

    # deduplicate vertices
    flat = all_tris.reshape(-1, 3)
    rounded = np.round(flat, 6)
    uniq, inverse = np.unique(rounded, axis=0, return_inverse=True)
    faces = inverse.reshape(-1, 3).astype(np.int32)
    return uniq.astype(np.float32), faces
