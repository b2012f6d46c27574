"""Microbench formulations of the z-exp table-cotangent fold (dtable ->
dgrid), the ~53ms term the round-4 G-phase ablation exposed in the 32px
train step (PROFILE_TRAIN.json gfold delta).

In-dispatch methodology (BASELINE.md): loop the op inside one jitted
program with a data dependency, 3 warmups per program.

Variants:
  slices       current zexp_table_adjoint (8 shifted 3D slices, f32 sum,
               final (D,H,W,C)->(C,D,H,W) transpose)
  noshift      dt.reshape(rows,8,C).sum(1) + transpose — no spatial shifts:
               isolates the lane-split/narrow-minor cost
  notrans      slices without the final transpose: isolates the transpose
  matmul       8 shifted 3D slices (minor axis kept FULL 8C, aligned) each
               contracted with a one-hot (8C, C) selector on the MXU
  xla_vjp      jax.vjp of the builder (what the round-4 code shipped)

Usage: python scripts/profile_zexp_adjoint.py [--c 32 --d 96 --iters 8]
Writes PROFILE_ZEXP.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fenerf_jax_cache"))

from fenerf_tpu.core.grid_sample import (_build_zexp_rows,
                                          zexp_table_adjoint_xla)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def corner_offsets():
    return [(dz, dy, dx) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]


def fold_noshift(dt, shape):
    c, d, h, w = shape
    s = dt.reshape(-1, 8, c).sum(1)
    return s.reshape(d + 1, h + 1, w + 1, c)[:d, :h, :w].transpose(3, 0, 1, 2)


def fold_notrans(dt, shape):
    c, d, h, w = shape
    t = dt.reshape(d + 1, h + 1, w + 1, 8 * c)
    out = None
    for k, (dz, dy, dx) in enumerate(corner_offsets()):
        x = t[1 - dz:1 - dz + d, 1 - dy:1 - dy + h, 1 - dx:1 - dx + w,
              k * c:(k + 1) * c]
        out = x if out is None else out + x
    return out


def fold_matmul(dt, shape):
    c, d, h, w = shape
    t = dt.reshape(d + 1, h + 1, w + 1, 8 * c)
    sel = np.zeros((8, 8 * c, c), np.float32)
    for k in range(8):
        sel[k, k * c:(k + 1) * c] = np.eye(c, dtype=np.float32)
    sel = jnp.asarray(sel)
    out = None
    for k, (dz, dy, dx) in enumerate(corner_offsets()):
        x = t[1 - dz:1 - dz + d, 1 - dy:1 - dy + h, 1 - dx:1 - dx + w, :]
        term = jax.lax.dot_general(
            x, sel[k], (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    return out.transpose(3, 0, 1, 2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--c", type=int, default=32)
    p.add_argument("--d", type=int, default=96)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--ragged", action="store_true",
                   help="one-off ON-DEVICE parity check of the Pallas fold "
                        "kernel vs the XLA slice fold at a ragged hp "
                        "(hp %% ytile != 0) — validates the documented "
                        "garbage-band invariant (ops/zexp_fold.py epilogue) "
                        "under real OOB padding, which interpret-mode tests "
                        "cannot (their padding is zeros)")
    args = p.parse_args()
    c, d = args.c, args.d
    shape = (c, d, d, d)
    rows = (d + 1) ** 3

    key = jax.random.key(0)
    dt = jax.random.normal(key, (rows, 8 * c), jnp.float32)
    log(f"dtable {dt.shape} f32 = {dt.size * 4 / 1e6:.0f} MB")

    def xla_vjp(dtab, shp):
        _, vjp = jax.vjp(lambda g: _build_zexp_rows(g, None),
                         jnp.zeros(shp, jnp.float32))
        return vjp(dtab)[0]

    from fenerf_tpu.ops.zexp_fold import fold_zexp

    variants = {
        "kernel": lambda t: fold_zexp(t, shape),
        "slices": lambda t: zexp_table_adjoint_xla(t, shape),
        "noshift": lambda t: fold_noshift(t, shape),
        "notrans": lambda t: fold_notrans(t, shape),
        "matmul": lambda t: fold_matmul(t, shape),
        "xla_vjp": lambda t: xla_vjp(t, shape),
    }

    res = {"c": c, "d": d, "iters": args.iters,
           "dtable_mb": round(dt.size * 4 / 1e6)}

    if args.ragged:
        from fenerf_tpu.ops.zexp_fold import DEFAULT_YTILE
        hp = d + 1
        if hp % DEFAULT_YTILE == 0:
            log(f"--ragged: hp={hp} is a multiple of ytile={DEFAULT_YTILE}; "
                f"pick a --d with (d+1) % {DEFAULT_YTILE} != 0")
            sys.exit(2)
        got = np.asarray(jax.jit(lambda t: fold_zexp(t, shape))(dt))
        want = np.asarray(
            jax.jit(lambda t: zexp_table_adjoint_xla(t, shape))(dt))
        diff = float(np.max(np.abs(got - want)))
        res["ragged_hp"] = hp
        res["ragged_parity_max_abs_diff"] = diff
        log(f"[ragged] hp={hp} ytile={DEFAULT_YTILE} max|kernel-xla|={diff:.3e}")
        assert diff < 1e-4, f"ragged-hp parity FAILED: {diff}"
    for name, fn in variants.items():
        # data-dependent loop keeps every iteration on-device in one
        # dispatch: each iteration writes one output element back into the
        # input (a real dependency — `x + o.sum()*0` gets folded away, and
        # a single-element read of o lets XLA DCE the rest of the fold).
        # Sync via float(): block_until_ready does NOT block on the
        # tunneled axon platform (round-4 finding — it returned in 0.03ms
        # on a 935MB reduce).
        def run(t, fn=fn):
            def body(i, t):
                o = fn(t)
                return t.at[0, 0].add(o.sum().astype(t.dtype))
            return jax.lax.fori_loop(0, args.iters, body, t)[0, 0]

        jf = jax.jit(run)
        t0 = time.perf_counter()
        float(jf(dt))
        log(f"[{name}] compile+first {time.perf_counter() - t0:.1f}s")
        for _ in range(3):
            float(jf(dt))
        t0 = time.perf_counter()
        float(jf(dt))
        ms = (time.perf_counter() - t0) / args.iters * 1000.0
        res[name + "_ms"] = round(ms, 2)
        log(f"  {ms:.2f} ms/fold")

    with open(os.path.join(REPO, "PROFILE_ZEXP.json"), "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
