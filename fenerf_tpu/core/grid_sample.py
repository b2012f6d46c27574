"""Trilinear 3D grid sampling (TPU-friendly torch.grid_sample equivalent).

Matches torch.nn.functional.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=True) on 5D inputs as used by reference sample_from_3dgrid
(/root/reference/siren/siren.py:314-330): grid layout (C, D, H, W) with
normalized coords (x, y, z) indexing (W, H, D).

Implemented as 8-corner gathers on a flattened voxel axis — XLA lowers these
to dynamic-gather which is fine for the 96^3x32 texture cube; the Pallas path
(ops/) can later fuse this with the color branch if profiling demands.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_3d(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample `grid` (C, D, H, W) at `coords` (..., 3) in [-1, 1].

    coords[..., 0]=x -> W axis, [..., 1]=y -> H, [..., 2]=z -> D
    (align_corners=True: index = (c+1)/2 * (size-1); zeros outside).
    Returns (..., C).
    """
    c, d, h, w = grid.shape
    batch_shape = coords.shape[:-1]
    xyz = coords.reshape(-1, 3)

    sizes = jnp.array([w, h, d], dtype=coords.dtype)
    idx = (xyz + 1.0) / 2.0 * (sizes - 1.0)  # (N, 3) float indices

    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1

    def in_bounds(i, size):
        return (i >= 0) & (i < size)

    # per-axis validity + clamped indices (zeros padding outside)
    valid0 = [in_bounds(i0[:, a], s) for a, s in enumerate((w, h, d))]
    valid1 = [in_bounds(i1[:, a], s) for a, s in enumerate((w, h, d))]
    c0 = [jnp.clip(i0[:, a], 0, s - 1) for a, s in enumerate((w, h, d))]
    c1 = [jnp.clip(i1[:, a], 0, s - 1) for a, s in enumerate((w, h, d))]

    flat = grid.reshape(c, -1)  # (C, D*H*W)

    out = 0.0
    for bz, (zi, zv) in enumerate(((c0[2], valid0[2]), (c1[2], valid1[2]))):
        wz = (1.0 - frac[:, 2]) if bz == 0 else frac[:, 2]
        for by, (yi, yv) in enumerate(((c0[1], valid0[1]), (c1[1], valid1[1]))):
            wy = (1.0 - frac[:, 1]) if by == 0 else frac[:, 1]
            for bx, (xi, xv) in enumerate(((c0[0], valid0[0]), (c1[0], valid1[0]))):
                wx = (1.0 - frac[:, 0]) if bx == 0 else frac[:, 0]
                lin = (zi * h + yi) * w + xi  # (N,)
                vals = jnp.take(flat, lin, axis=1)  # (C, N)
                weight = wz * wy * wx * (zv & yv & xv).astype(coords.dtype)
                out = out + vals * weight[None, :]

    return out.T.reshape(*batch_shape, c)


def grid_sample_2d(grid: jax.Array, coords: jax.Array,
                   align_corners: bool = False) -> jax.Array:
    """Sample `grid` (C, H, W) at `coords` (..., 2) = (x, y) in [-1, 1].

    align_corners=False (torch default) as used by the latent-grid models'
    sample_local_latents (/root/reference/siren/siren.py:479-499):
    index = ((c + 1) * size - 1) / 2; zeros padding outside. Returns (..., C).
    """
    c, h, w = grid.shape
    batch_shape = coords.shape[:-1]
    xy = coords.reshape(-1, 2)

    sizes = jnp.array([w, h], dtype=coords.dtype)
    if align_corners:
        idx = (xy + 1.0) / 2.0 * (sizes - 1.0)
    else:
        idx = ((xy + 1.0) * sizes - 1.0) / 2.0

    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1

    valid0 = [(i0[:, a] >= 0) & (i0[:, a] < s) for a, s in enumerate((w, h))]
    valid1 = [(i1[:, a] >= 0) & (i1[:, a] < s) for a, s in enumerate((w, h))]
    c0 = [jnp.clip(i0[:, a], 0, s - 1) for a, s in enumerate((w, h))]
    c1 = [jnp.clip(i1[:, a], 0, s - 1) for a, s in enumerate((w, h))]

    flat = grid.reshape(c, -1)
    out = 0.0
    for by, (yi, yv) in enumerate(((c0[1], valid0[1]), (c1[1], valid1[1]))):
        wy = (1.0 - frac[:, 1]) if by == 0 else frac[:, 1]
        for bx, (xi, xv) in enumerate(((c0[0], valid0[0]), (c1[0], valid1[0]))):
            wx = (1.0 - frac[:, 0]) if bx == 0 else frac[:, 0]
            lin = yi * w + xi
            vals = jnp.take(flat, lin, axis=1)
            weight = wy * wx * (yv & xv).astype(coords.dtype)
            out = out + vals * weight[None, :]
    return out.T.reshape(*batch_shape, c)
