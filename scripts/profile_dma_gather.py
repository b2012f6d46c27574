"""Scattered-row DMA gather on TPU: feasibility + rate (ROADMAP #3b).

Goal: hide the flagship texture gather (34% of render, XLA jnp.take at
~51M 512B-rows/s, serialized with compute) under the field kernel's MXU
time by DMA-ing rows inside a Pallas kernel.

Constraints discovered on hardware:
  * HBM slices must be 8-sublane aligned -> table stored as (ROWS, 8, 128)
    padded tiles (one row = one legal 2KB DMA; channels live in sublanes
    0-1, consumed by two 128-wide matmuls — no relayout);
  * UNBOUNDED outstanding DMAs (start all, wait all) wedge the device; a
    rotating ring of DMA semaphores with <= RING in flight is stable
    (/tmp/dma_min3.py pattern, verified correct vs numpy);
  * identical-arg dispatches are elided by the tunneled runtime, and
    dispatch overhead is ~9-30ms -> fresh args per timed call, per-element
    data deps, (dt16 - dt8)/8 timing.

Variants: ring_dma_r{R}   pure ring-DMA gather rate, ring size R
          xla_take        jnp.take at identical shapes (2KB rows)
          ring_overlap    ring gather + 11-layer bf16 chain in ONE kernel

Writes PROFILE_DMA.json.  Run alone (one TPU process at a time).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fenerf_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

ROWS = 97 * 97 * 97
N = 1 << 18
TILE = 1024
LAYERS = 11
H = 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ring_dma_gather(table, idx, ring=64, ws=None, overlap=False):
    """idx lives in HBM (a full-array scalar-prefetch of >256K indices
    overflows the 1MB SMEM); each grid step first DMAs its (TILE,) index
    block into SMEM scratch, then ring-DMAs the rows."""
    n = idx.shape[0]
    n_w = len(ws) if ws is not None else 0

    def kernel(idx_ref, *refs):
        table_ref = refs[0]
        wrefs = refs[1:1 + n_w]
        x_ref = refs[1 + n_w]
        out_ref = refs[2 + n_w]
        act_ref = refs[3 + n_w] if overlap else None
        idx_smem, sems, idx_sem = refs[-3:]
        t = pl.program_id(0)

        idx_cp = pltpu.make_async_copy(
            idx_ref.at[pl.ds(t * TILE, TILE)], idx_smem, idx_sem)
        idx_cp.start()
        idx_cp.wait()

        def body(i, _):
            @pl.when(i >= ring)
            def _wait_prev():
                r_prev = idx_smem[i - ring]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(r_prev, 1)],
                    out_ref.at[pl.ds(i - ring, 1)],
                    sems.at[i % ring]).wait()
            r = idx_smem[i]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(r, 1)], out_ref.at[pl.ds(i, 1)],
                sems.at[i % ring]).start()
            return 0

        jax.lax.fori_loop(0, TILE, body, 0)

        if overlap:
            a = x_ref[...]
            for i in range(n_w):
                a = jnp.dot(a, wrefs[i][...],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            act_ref[...] = a

        def drain(i, _):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(0, 1)], out_ref.at[pl.ds(0, 1)],
                sems.at[i]).wait()
            return 0

        jax.lax.fori_loop(0, ring, drain, 0)

    out_shapes = [jax.ShapeDtypeStruct((n, 8, 128), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((TILE, 8, 128), lambda t: (t, 0, 0),
                              memory_space=pltpu.VMEM)]
    if overlap:
        out_shapes.append(jax.ShapeDtypeStruct((n, H), jnp.bfloat16))
        out_specs.append(pl.BlockSpec((TILE, H), lambda t: (t, 0),
                                      memory_space=pltpu.VMEM))

    x = jnp.zeros((n, H), jnp.bfloat16)
    args = (idx, table) + tuple(ws or ()) + (x,)
    out = pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((H, H), lambda t: (0, 0),
                        memory_space=pltpu.VMEM) for _ in range(n_w)]
        + [pl.BlockSpec((TILE, H), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((TILE,), jnp.int32),
                        pltpu.SemaphoreType.DMA((ring,)),
                        pltpu.SemaphoreType.DMA(())],
        out_shape=tuple(out_shapes),
    )(*args)
    return out[0]


def timed(gather_fn, table, label):
    def make_run(iters):
        @jax.jit
        def run(tbl, idx0):
            def body(_, i):
                rows = gather_fn(tbl, i)
                step = (rows[:, :2, :].astype(jnp.float32)
                        .sum((-1, -2)).astype(jnp.int32))
                return jnp.abs(i + 1 + step) % ROWS
            return jax.lax.fori_loop(0, iters, body, idx0)
        return run

    run8, run16 = make_run(8), make_run(16)
    k = jax.random.key(2)
    mk = lambda s: jax.random.randint(jax.random.fold_in(k, s), (N,), 0,
                                      ROWS, dtype=jnp.int32)
    try:
        float(jnp.sum(run8(table, mk(0))))
        float(jnp.sum(run16(table, mk(1))))
        t0 = time.perf_counter()
        float(jnp.sum(run8(table, mk(2))))
        dt8 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(run16(table, mk(3))))
        dt16 = time.perf_counter() - t0
    except Exception as e:
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    dt = (dt16 - dt8) / 8
    log(f"{label}: {dt * 1e3:.2f} ms/iter (dt8 {dt8 * 1e3:.0f} dt16 "
        f"{dt16 * 1e3:.0f}), {N / dt / 1e6:.1f} Mrows/s")
    return round(N / dt / 1e6, 1)


def main():
    log(f"devices: {jax.devices()}")
    k = jax.random.key(0)
    table = jax.random.normal(k, (ROWS, 8, 128), dtype=jnp.bfloat16)
    ws = [(jax.random.normal(jax.random.fold_in(k, 10 + i), (H, H))
           / jnp.sqrt(H)).astype(jnp.bfloat16) for i in range(LAYERS)]

    res = {}
    rings = (16, 64, 128) if os.environ.get("FENERF_DMA_ESC") != "1" \
        else (256, 512)
    for ring in rings:
        res[f"ring_dma_r{ring}"] = timed(
            functools.partial(ring_dma_gather, ring=ring), table,
            f"ring_dma_r{ring}")
    if os.environ.get("FENERF_DMA_ESC") == "1":
        res["ring_overlap_r256"] = timed(
            functools.partial(ring_dma_gather, ring=256, ws=ws,
                              overlap=True), table, "ring_overlap_r256")
    else:
        res["xla_take"] = timed(
            lambda t, i: jnp.take(t, i, axis=0), table, "xla_take")
        res["ring_overlap_r128"] = timed(
            functools.partial(ring_dma_gather, ring=128, ws=ws,
                              overlap=True), table, "ring_overlap_r128")

    with open(os.path.join(REPO, "PROFILE_DMA.json"), "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    log(json.dumps(res))


if __name__ == "__main__":
    main()
