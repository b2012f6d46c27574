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

import os
from functools import lru_cache

import jax
import jax.numpy as jnp

# Pallas table-cotangent fold kernel (ops/zexp_fold.py): built, measured
# SLOWER than the XLA slice fold at the flagship grid (14.5 vs 12.2 ms —
# the 4-partial-output write amplification + 97-sublane block padding beat
# the VMEM locality win; PROFILE_ZEXP.json), and kept only for equivalence
# testing and re-measurement on future stacks. FENERF_FOLD_KERNEL=1 enables
# it on TPU; identical math either way. Read LAZILY at dispatch time (not
# import time) so tests/launchers that set the env var after import work.
def _fold_kernel_requested() -> bool:
    return os.environ.get("FENERF_FOLD_KERNEL", "0") == "1"


_FOLD_FALLBACK_LOGGED = False


def _log_fold_fallback(reason: str) -> None:
    """Warn ONCE when FENERF_FOLD_KERNEL=1 is set but dispatch falls back to
    the XLA fold (non-f32 out_dtype or non-TPU backend) — a silent fallback
    would invalidate the re-measurement the flag exists for."""
    global _FOLD_FALLBACK_LOGGED
    if not _FOLD_FALLBACK_LOGGED:
        _FOLD_FALLBACK_LOGGED = True
        import warnings

        warnings.warn(
            f"FENERF_FOLD_KERNEL=1 requested but falling back to the XLA "
            f"slice fold: {reason}")


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

    # voxel-major table: each gather pulls one contiguous C-vector row
    # (lane-aligned), which TPU gathers service far faster than column picks
    flat = grid.reshape(c, -1).T  # (D*H*W, C)

    out = 0.0
    for bz, (zi, zv) in enumerate(((c0[2], valid0[2]), (c1[2], valid1[2]))):
        wz = (1.0 - frac[:, 2]) if bz == 0 else frac[:, 2]
        for by, (yi, yv) in enumerate(((c0[1], valid0[1]), (c1[1], valid1[1]))):
            wy = (1.0 - frac[:, 1]) if by == 0 else frac[:, 1]
            for bx, (xi, xv) in enumerate(((c0[0], valid0[0]), (c1[0], valid1[0]))):
                wx = (1.0 - frac[:, 0]) if bx == 0 else frac[:, 0]
                lin = (zi * h + yi) * w + xi  # (N,)
                vals = jnp.take(flat, lin, axis=0)  # (N, C)
                weight = wz * wy * wx * (zv & yv & xv).astype(coords.dtype)
                out = out + vals * weight[:, None]

    return out.reshape(*batch_shape, c)


def _build_zexp_rows(grid: jax.Array, table_dtype) -> jax.Array:
    """The z-expanded table as pure data movement, laid out channel-minor
    from the start: one small (C, D+2, H+2, W+2) -> (D+2, H+2, W+2, C)
    transpose of the padded grid, then 8 shifted VIEWS concatenated on the
    minor axis. XLA fuses the concat into a single pass over the output.

    The round-4 original (stack 8 corners channel-MAJOR, then transpose the
    full (8, C, D+1, H+1, W+1) expansion) relayouted the 8x-expanded tensor
    (~20ms per build at the 96^3x32 flagship grid on v5e); moving the
    transpose BEFORE the 8x expansion does the same job on 1/8th the bytes.
    """
    c, d, h, w = grid.shape
    p = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (1, 1)))
    if table_dtype is not None:
        p = p.astype(table_dtype)
    pt = p.transpose(1, 2, 3, 0)  # (D+2, H+2, W+2, C), channels minor
    # row (z, y, x) col (k*C + c) = P[c, z+dz, y+dy, x+dx], k = dz*4+dy*2+dx
    table = jnp.concatenate(
        [pt[dz:dz + d + 1, dy:dy + h + 1, dx:dx + w + 1]
         for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
        axis=-1)
    return table.reshape((d + 1) * (h + 1) * (w + 1), 8 * c)


def zexp_table_adjoint(dtable: jax.Array, grid_shape: tuple[int, ...],
                       out_dtype=jnp.float32) -> jax.Array:
    """Exact adjoint of the (linear) z-expanded table build: fold a table
    cotangent ((D+1)(H+1)(W+1), 8C) back to a grid cotangent (C, D, H, W).

    dgrid[c, z, y, x] = sum_k dtable[(z+1-dz, y+1-dy, x+1-dx), k*C + c] —
    all 8 shifted indices land in range, so this is 8 static slice-reads
    summed in f32 plus ONE (D, H, W, C) -> (C, D, H, W) transpose of the
    un-expanded result. XLA's automatic transpose of the builder instead
    relayouts the full 8x-expanded cotangent (~57ms of the 32px train step
    at the flagship grid, round-4 G-phase ablation PROFILE_TRAIN.json);
    this hand adjoint is ~10x cheaper and accumulates the 8 corner terms
    in f32 regardless of the (possibly bf16) table dtype.

    On TPU the fold dispatches to a Pallas kernel (ops/zexp_fold.py) that
    reads each cotangent element once VMEM-locally instead of XLA's
    8-scattered-reads-per-output loop; FENERF_FOLD_KERNEL=0 restores the
    XLA slice fold (both paths compute the identical sum, f32 accumulation
    either way).
    """
    if _fold_kernel_requested():
        if out_dtype != jnp.float32:
            _log_fold_fallback(f"out_dtype={out_dtype} (kernel is f32-only)")
        elif jax.default_backend() != "tpu":
            _log_fold_fallback(
                f"backend={jax.default_backend()} (kernel is TPU-only)")
        else:
            from fenerf_tpu.ops.zexp_fold import fold_zexp

            return fold_zexp(dtable, grid_shape)
    return zexp_table_adjoint_xla(dtable, grid_shape, out_dtype)


def zexp_table_adjoint_xla(dtable: jax.Array, grid_shape: tuple[int, ...],
                           out_dtype=jnp.float32) -> jax.Array:
    """The XLA slice-fold formulation (kernel-dispatch bypassed): the
    reference both for the Pallas kernel's parity tests and for the
    FENERF_FOLD_KERNEL=0 escape hatch."""
    c, d, h, w = grid_shape
    dt = dtable.reshape(d + 1, h + 1, w + 1, 8 * c)
    out = None
    for k, (dz, dy, dx) in enumerate(
            (dz, dy, dx) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)):
        t = dt[1 - dz:1 - dz + d, 1 - dy:1 - dy + h, 1 - dx:1 - dx + w,
               k * c:(k + 1) * c].astype(out_dtype)
        out = t if out is None else out + t
    return out.transpose(3, 0, 1, 2)


@lru_cache(maxsize=32)
def _make_zexp_builder(grid_shape, grid_dtype, table_dtype):
    """One custom-VJP builder per (shape, dtype) — statics live in the
    closure because custom_vjp residuals must be JAX types."""
    @jax.custom_vjp
    def build(grid):
        # force materialization: without the barrier XLA fuses the
        # pad/concat into every gather consumer and recomputes the table
        # per use, which is catastrophic inside the full render graph
        return jax.lax.optimization_barrier(
            _build_zexp_rows(grid, table_dtype))

    build.defvjp(
        lambda grid: (build(grid), None),
        lambda _, dtable: (zexp_table_adjoint(dtable, grid_shape,
                                              grid_dtype),))
    return build


def build_zexp_table(grid: jax.Array, table_dtype=None) -> jax.Array:
    """Build the z-expanded gather table for `grid` (C, D, H, W):
    ((D+1)(H+1)(W+1), 8C), where row (z, y, x) holds the full 2x2x2
    zero-padded neighborhood in corner order (dz, dy, dx), channels minor.

    Linear data movement both ways; a custom VJP supplies the hand adjoint
    (zexp_table_adjoint) because XLA's mechanical transpose of the builder
    relayouts the 8x-expanded cotangent (see the adjoint's docstring).
    Callers on a hot path must still build ONCE per program/step via
    fields.with_grid_table and reuse; see train/loop.py.
    """
    dt = None if table_dtype is None else jnp.dtype(table_dtype)
    return _make_zexp_builder(grid.shape, grid.dtype, dt)(grid)


def sample_zexp_table(table: jax.Array, grid_shape: tuple[int, ...],
                      coords: jax.Array) -> jax.Array:
    """Trilinear sample from a prebuilt z-expanded `table` (build_zexp_table)
    of a (C, D, H, W) grid: one row-gather + an (N, 8)x(8C) weighted reduce.
    Semantics match grid_sample_3d (align_corners=True, zeros padding)."""
    c, d, h, w = grid_shape
    hp, wp = h + 1, w + 1
    batch_shape = coords.shape[:-1]
    xyz = coords.reshape(-1, 3)

    sizes = jnp.array([w, h, d], dtype=coords.dtype)
    idx = (xyz + 1.0) / 2.0 * (sizes - 1.0)
    i0 = jnp.floor(idx)
    fx, fy, fz = (idx - i0).T
    x0, y0, z0 = i0.astype(jnp.int32).T

    # a row is valid where clip() does not move the base corner; points with
    # both neighbors outside the grid are exactly zero under zeros-padding
    mask = ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1)
            & (z0 >= -1) & (z0 <= d - 1))

    xp = jnp.clip(x0 + 1, 0, w)   # into [0, W] of the W+1 expanded axis
    yp = jnp.clip(y0 + 1, 0, h)
    zp = jnp.clip(z0 + 1, 0, d)
    rows = jnp.take(table, (zp * hp + yp) * wp + xp, axis=0)  # (N, 8C)

    dt = coords.dtype
    wzs, wys, wxs = (1 - fz, fz), (1 - fy, fy), (1 - fx, fx)
    m = mask.astype(dt)
    # weighted corner reduce as 8 slice+mul terms instead of an einsum over
    # a (N, 8, C) reshape: the (N, 8C) -> (N, 8, C) relayout broke fusion
    # with the gather and its consumers (~20ms/step of pure copies in the
    # round-4 train trace); slices along the minor axis fuse cleanly
    out = None
    for k in range(8):
        dz, dy, dx = (k >> 2) & 1, (k >> 1) & 1, k & 1
        w = (wzs[dz] * wys[dy] * wxs[dx] * m)[:, None]
        term = rows[:, k * c:(k + 1) * c].astype(dt) * w
        out = term if out is None else out + term
    return out.reshape(*batch_shape, c)


def grid_sample_3d_fast(grid: jax.Array, coords: jax.Array,
                        table_dtype=None) -> jax.Array:
    """grid_sample_3d with ONE row-gather instead of 8 (TPU: gather cost
    scales with gather COUNT — round-1 measured 155ms -> 64ms going 8 -> 2;
    the fully z-expanded table here halves that again and dominated the
    flagship render profile, PROFILE_FIELD.json).

    8x the grid's HBM (96^3 x 32ch: 934MB f32 / 467MB bf16) buys the halved
    gather count — the classic TPU memory-for-gathers trade. The zero border
    realizes torch's padding_mode='zeros' for one-cell overflow; points
    further outside are masked (their result is zero either way).
    Differentiable w.r.t. grid (pad/stack/gather). table_dtype=bf16 halves
    table bytes; the bf16 compute paths already quantize grid feats to bf16
    at the next matmul, so it costs nothing there. Numerics otherwise match
    grid_sample_3d to f32 rounding.

    NOTE: this convenience composition rebuilds the table per call — fine
    for one-shot programs, ruinous inside a chunk loop or a training step
    (the build is ~20ms at the flagship grid). Hot paths pass a prebuilt
    table via fields.with_grid_table instead.
    """
    table = build_zexp_table(grid, table_dtype)
    return sample_zexp_table(table, grid.shape, coords)


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
