"""Isosurface extraction + PLY export for shape extraction.

The reference pipeline writes sigma volumes as .mrc and meshes them
externally (extract_shapes.py imports skimage.measure / plyfile — neither is
available here). This module provides a self-contained mesher using
MARCHING TETRAHEDRA: each voxel cell splits into 6 tetrahedra; a tet with k
corners above the iso level contributes 0/1/2 triangles whose vertices are
edge interpolations — no 256-entry case table required, and the surface is
watertight across cells. Vectorized numpy.
"""
from __future__ import annotations

import os

import numpy as np

# 6-tetrahedra decomposition of the unit cube (corner indices into the
# standard corner ordering below); all share the main diagonal 0-7 so faces
# match between neighboring tets and cells
_CUBE_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.int64)
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], dtype=np.int64)


def _tet_triangles(values, verts, level):
    """Triangulate one batch of tetrahedra.

    values: (N, 4) corner scalar values; verts: (N, 4, 3) corner positions.
    Returns (M, 3, 3) triangle vertices.
    """
    inside = values > level  # (N, 4)
    code = (inside * (1 << np.arange(4))).sum(axis=1)

    tris = []

    def edge_point(vi, vj):
        a = values[sel, vi]
        b = values[sel, vj]
        t = (level - a) / np.where(np.abs(b - a) < 1e-12, 1e-12, b - a)
        t = np.clip(t, 0.0, 1.0)[:, None]
        return verts[sel, vi] * (1 - t) + verts[sel, vj] * t

    # enumerate the 14 non-trivial sign patterns; single-corner cases give
    # one triangle, two-corner cases give a quad (two triangles)
    for c in range(1, 15):
        sel = np.nonzero(code == c)[0]
        if sel.size == 0:
            continue
        ins = [i for i in range(4) if c & (1 << i)]
        outs = [i for i in range(4) if not c & (1 << i)]
        if len(ins) == 3:  # symmetric to one-outside
            ins, outs = outs, ins
        if len(ins) == 1:
            i = ins[0]
            p = [edge_point(i, o) for o in outs]
            tris.append(np.stack([p[0], p[1], p[2]], axis=1))
        else:  # 2 in / 2 out -> quad
            i0, i1 = ins
            o0, o1 = outs
            a = edge_point(i0, o0)
            b = edge_point(i0, o1)
            cc = edge_point(i1, o1)
            d = edge_point(i1, o0)
            tris.append(np.stack([a, b, cc], axis=1))
            tris.append(np.stack([a, cc, d], axis=1))
    if not tris:
        return np.zeros((0, 3, 3), np.float32)
    return np.concatenate(tris, axis=0).astype(np.float32)


def marching_tetrahedra(volume: np.ndarray, level: float,
                        spacing: tuple[float, float, float] = (1, 1, 1),
                        origin: tuple[float, float, float] = (0, 0, 0),
                        max_cells_per_batch: int = 2_000_000):
    """volume (nz, ny, nx) -> (vertices (V, 3), faces (F, 3)).

    Only cells straddling the level are triangulated; vertices are de-duped
    by quantized position so the mesh is watertight.
    """
    vol = np.asarray(volume, np.float32)
    nz, ny, nx = vol.shape
    # cells whose 8 corners straddle the level
    c = vol
    mx = np.maximum.reduce([
        c[:-1, :-1, :-1], c[1:, :-1, :-1], c[:-1, 1:, :-1], c[:-1, :-1, 1:],
        c[1:, 1:, :-1], c[1:, :-1, 1:], c[:-1, 1:, 1:], c[1:, 1:, 1:]])
    mn = np.minimum.reduce([
        c[:-1, :-1, :-1], c[1:, :-1, :-1], c[:-1, 1:, :-1], c[:-1, :-1, 1:],
        c[1:, 1:, :-1], c[1:, :-1, 1:], c[:-1, 1:, 1:], c[1:, 1:, 1:]])
    zz, yy, xx = np.nonzero((mn <= level) & (mx > level))
    if zz.size == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    all_tris = []
    for s in range(0, zz.size, max_cells_per_batch):
        z, y, x = zz[s:s + max_cells_per_batch], yy[s:s + max_cells_per_batch], \
            xx[s:s + max_cells_per_batch]
        base = np.stack([x, y, z], axis=1)  # (C, 3) in xyz order
        corners = base[:, None, :] + _CUBE_CORNERS[None]  # (C, 8, 3) xyz
        vals = vol[corners[..., 2], corners[..., 1], corners[..., 0]]  # (C,8)
        pos = corners.astype(np.float32)
        for tet in _TETS:
            all_tris.append(_tet_triangles(vals[:, tet], pos[:, tet], level))
    tris = np.concatenate(all_tris, axis=0)  # (M, 3, 3) xyz in voxel coords

    # weld vertices (quantize to kill float jitter on shared edges)
    flat = tris.reshape(-1, 3)
    key = np.round(flat * 1024.0).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    # representative positions: first occurrence
    first = np.zeros(len(uniq), np.int64)
    seen = np.full(len(uniq), -1, np.int64)
    order = np.arange(len(inv))
    np.minimum.at(seen, inv, order)
    verts = flat[seen]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) \
        & (faces[:, 0] != faces[:, 2])
    faces = faces[good]

    sp = np.asarray(spacing, np.float32)
    og = np.asarray(origin, np.float32)
    return verts * sp[None] + og[None], faces


def write_ply(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    """Minimal binary-less ASCII PLY writer (plyfile replacement)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in vertices:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
