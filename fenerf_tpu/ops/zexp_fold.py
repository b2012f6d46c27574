"""Pallas kernel for the z-exp table-cotangent fold (dtable -> dgrid).

The hand adjoint of the texture-table build (core/grid_sample.py::
zexp_table_adjoint) is 8 shifted narrow-column slices of a ~935MB cotangent
summed into a (C, D, H, W) grid gradient. Under XLA that fuses into one
loop whose every output element reads 8 scattered (row, lane-offset)
locations — measured 11.5 ms at the flagship 96^3x32 grid vs a ~1.3 ms
memory floor (PROFILE_ZEXP.json; the no-shift lane-reduce lower bound runs
5.5 ms). This kernel restructures the fold so each dtable element is read
ONCE, VMEM-locally:

  * the 8 corner terms differ by a z-shift (major axis: free row
    addressing), a y-shift (ditto), an x-shift (sublane slice) and a
    lane-column offset (k*C..(k+1)*C of the 8C minor axis);
  * the kernel keeps the x/lane work (the part XLA serializes) and emits
    FOUR partial sums Q[dz,dy] — one per (z, y) shift combination — over
    un-shifted (z', y') coordinates, so input blocks never overlap (no
    halos);
  * a tiny XLA epilogue applies the z/y shifts as 4 static slice-adds
    (~460MB traffic) and transposes to the (C, D, H, W) parameter layout
    (measured free — it fuses with the adds).

    Q[dz,dy][z', y', x, c] = sum_dx dt[z', y', x+1-dx, (4dz+2dy+dx)*C + c]
    dgrid[c, z, y, x]      = sum_{dz,dy} Q[dz,dy][z+1-dz, y+1-dy, x, c]

MEASURED OUTCOME (v5e, flagship 96^3x32 grid, PROFILE_ZEXP.json): the
direct lane-slice kernel ran 13.8 ms and this MXU-selector variant 14.5 ms
vs 12.2 ms for the XLA slice fold — the 4-partial-output write
amplification (460MB written + re-read by the epilogue vs XLA's direct
113MB) plus the 97-sublane block padding eat the VMEM-locality win, and
Mosaic's lane handling adds nothing over XLA's fused loop here. Kept
NON-DEFAULT (env FENERF_FOLD_KERNEL=1 enables, core/grid_sample.py) for
equivalence testing and re-measurement on stacks with cheaper narrow-lane
writes; parity-tested in interpret mode (tests/test_zexp_fold.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_YTILE = 16


def fold_zexp(dtable: jax.Array, grid_shape: tuple[int, ...],
              ytile: int = DEFAULT_YTILE,
              interpret: bool = False) -> jax.Array:
    """Fold a table cotangent ((D+1)(H+1)(W+1), 8C) to a grid cotangent
    (C, D, H, W) in f32. Exact same math as the 8-slice XLA adjoint
    (grid_sample.zexp_table_adjoint reference formulation)."""
    c, d, h, w = grid_shape
    dp, hp, wp = d + 1, h + 1, w + 1
    assert dtable.shape == (dp * hp * wp, 8 * c), (dtable.shape, grid_shape)
    dt = dtable.reshape(dp, hp, wp, 8 * c)

    ytile = min(ytile, hp)
    n_yt = -(-hp // ytile)
    hpad = n_yt * ytile

    # one-hot selectors routing the column selection through the MXU: for
    # each dx, column (4dz+2dy+dx)*C + cc of dt maps to group (2dz+dy)*C + cc
    # of the dot result (the direct lane-slice formulation made Mosaic emit
    # per-corner lane shuffles on the full block — measured 13.8 ms vs the
    # XLA fold's 11.3; the dots keep the lane work on the small result)
    import numpy as np

    sels = np.zeros((2, 8 * c, 4 * c), np.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                k, g = dz * 4 + dy * 2 + dx, dz * 2 + dy
                sels[dx, k * c:(k + 1) * c, g * c:(g + 1) * c] = np.eye(c)
    sel0, sel1 = jnp.asarray(sels[0]), jnp.asarray(sels[1])

    def kernel(dt_ref, s0_ref, s1_ref, *q_refs):
        blk = dt_ref[...].astype(jnp.float32)  # (1, ytile, Wp, 8C)
        yt = blk.shape[1]
        acc = None
        for dx, s_ref in ((0, s0_ref), (1, s1_ref)):
            x = blk[0, :, 1 - dx:1 - dx + w, :].reshape(yt * w, 8 * c)
            # HIGHEST precision: the default TPU f32 matmul rounds inputs
            # to bf16 for one MXU pass, which silently bf16-rounds the
            # GRADIENT this kernel folds (~1e-2 abs error at O(1) scale —
            # caught by the round-5 on-device ragged parity check;
            # interpret-mode parity is exact f32 and cannot see it). The
            # selector is one-hot, so HIGHEST makes the routing exact.
            r = jnp.dot(x, s_ref[...], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            acc = r if acc is None else acc + r
        r4 = acc.reshape(1, yt, w, 4 * c)
        for g in range(4):
            q_refs[g][...] = r4[..., g * c:(g + 1) * c]

    qs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((dp, hpad, w, c), jnp.float32)
            for _ in range(4)),
        grid=(dp, n_yt),
        in_specs=[
            pl.BlockSpec((1, ytile, wp, 8 * c), lambda z, t: (z, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * c, 4 * c), lambda z, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * c, 4 * c), lambda z, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, ytile, w, c), lambda z, t: (z, t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)),
        cost_estimate=pl.CostEstimate(
            flops=2 * dp * hpad * w * 8 * c * 4 * c * 2,
            bytes_accessed=(dp * hp * wp * 8 * c * dtable.dtype.itemsize
                            + 4 * dp * hpad * w * c * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(dt, sel0, sel1)

    # epilogue: z/y shifts as static slice-adds, then to parameter layout.
    # RAGGED-Hp INVARIANT (when hp % ytile != 0): the tail y-block reads
    # Pallas OOB-padded input rows whose contents are UNSPECIFIED, so output
    # rows [hp, hpad) of each Q hold garbage BY DESIGN. They are never
    # observed: the slices below take rows [1-dy, 1-dy+h] and
    # 1-dy+h <= h+1 = hp, so the garbage band is sliced away. If this
    # epilogue is ever changed to read past row hp, the kernel must zero the
    # tail instead. (Parity vs zexp_table_adjoint_xla is interpret-mode
    # tested where padding happens to be zeros — re-verify a ragged hp
    # on-device if the kernel is ever re-measured on hardware;
    # scripts/profile_zexp_adjoint.py --ragged does exactly that.)
    out = None
    for dz in (0, 1):
        for dy in (0, 1):
            t = qs[dz * 2 + dy][1 - dz:1 - dz + d, 1 - dy:1 - dy + h]
            out = t if out is None else out + t
    return out.transpose(3, 0, 1, 2)
