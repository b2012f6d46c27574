"""Can per-row async DMAs beat (or hide) the XLA gather?

The flagship render serializes texture-gather (XLA jnp.take, ~51M 512B
rows/s) with the fused field kernel — together 73% of render time. If a
Pallas kernel can DMA scattered table rows from HBM while the MXU computes,
the gather cost disappears into the matmul time. The unknown is the
per-descriptor DMA overhead for 512B scattered rows.

Measurement notes (hard-won on this tunneled runtime):
  * the runtime ELIDES a dispatch repeated with identical arguments — every
    timed call gets fresh index data;
  * iterations chain through a per-element data dependency (next indices
    derive from every gathered byte), so nothing can be sliced or hoisted;
  * per-iter time = (dt_16iters - dt_8iters) / 8 — the ~9-30ms dispatch
    overhead cancels;
  * the table is a jit ARGUMENT (closing over it embeds 448MB of literals
    in the HLO -> remote-compile HTTP 413).

Variants:
  dma_gather    grid over point tiles; per tile issue TILE row DMAs
                (scalar-prefetched indices) into the VMEM output block,
                then wait — pure DMA-gather rate
  xla_gather    jnp.take at the same shapes
  chain_only    11-layer Pallas bf16 matmul chain (the MXU reference)
  dma_overlap   DMA starts + the 11-layer chain + waits in ONE kernel:
                if per-descriptor cost is low the gather hides under MXU

Writes PROFILE_DMA.json. Run alone (one TPU process at a time).
"""
from __future__ import annotations

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
C = 256
N = 1 << 19
TILE = 1024
LAYERS = 11
H = 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def dma_gather(table, idx, ws=None, overlap=False):
    n = idx.shape[0]
    tiles = n // TILE
    n_w = len(ws) if ws is not None else 0

    def kernel(idx_ref, *refs):
        table_ref = refs[0]
        wrefs = refs[1:1 + n_w]
        x_ref = refs[1 + n_w]
        out_ref = refs[2 + n_w]
        act_ref = refs[3 + n_w] if overlap else None
        sem = refs[-1]
        t = pl.program_id(0)

        def start_one(i, _):
            r = idx_ref[t * TILE + i]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(r, 1)], out_ref.at[pl.ds(i, 1)], sem
            ).start()
            return 0

        jax.lax.fori_loop(0, TILE, start_one, 0)

        if overlap:
            a = x_ref[...]
            for i in range(n_w):
                a = jnp.dot(a, wrefs[i][...],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            act_ref[...] = a

        def wait_one(i, _):
            pltpu.make_async_copy(
                table_ref.at[pl.ds(0, 1)], out_ref.at[pl.ds(0, 1)], sem
            ).wait()
            return 0

        jax.lax.fori_loop(0, TILE, wait_one, 0)

    out_shapes = [jax.ShapeDtypeStruct((n, C), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((TILE, C), lambda t, *_: (t, 0),
                              memory_space=pltpu.VMEM)]
    if overlap:
        out_shapes.append(jax.ShapeDtypeStruct((n, H), jnp.bfloat16))
        out_specs.append(pl.BlockSpec((TILE, H), lambda t, *_: (t, 0),
                                      memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec((H, H), lambda t, *_: (0, 0),
                        memory_space=pltpu.VMEM) for _ in range(n_w)]
        + [pl.BlockSpec((TILE, H), lambda t, *_: (t, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    x = jnp.zeros((n, H), jnp.bfloat16)
    args = (idx, table) + tuple(ws or ()) + (x,)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=tuple(out_shapes),
    )(*args)
    return out[0]


def chain_only(x, ws):
    tiles = x.shape[0] // TILE

    def kernel(x_ref, *refs):
        wrefs = refs[:-1]
        out_ref = refs[-1]
        a = x_ref[...]
        for i in range(len(ws)):
            a = jnp.dot(a, wrefs[i][...],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        out_ref[...] = a

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((TILE, H), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((H, H), lambda t: (0, 0), memory_space=pltpu.VMEM)
           for _ in ws],
        out_specs=pl.BlockSpec((TILE, H), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )(x, *ws)


def timed(gather_fn, table, label):
    def make_run(iters):
        @jax.jit
        def run(tbl, idx0):
            def body(_, i):
                rows = gather_fn(tbl, i)
                # every element of every row feeds the next indices
                step = rows.astype(jnp.float32).sum(-1).astype(jnp.int32)
                return jnp.abs(i + 1 + step) % ROWS
            return jax.lax.fori_loop(0, iters, body, idx0)
        return run

    run8, run16 = make_run(8), make_run(16)
    k = jax.random.key(2)
    mk = lambda s: jax.random.randint(jax.random.fold_in(k, s), (N,), 0,
                                      ROWS, dtype=jnp.int32)
    try:
        run8(table, mk(0)).block_until_ready()    # compile 8
        run16(table, mk(1)).block_until_ready()   # compile 16
        t0 = time.perf_counter()
        run8(table, mk(2)).block_until_ready()
        dt8 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run16(table, mk(3)).block_until_ready()
        dt16 = time.perf_counter() - t0
    except Exception as e:
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    dt = (dt16 - dt8) / 8
    log(f"{label}: {dt * 1e3:.2f} ms/iter (dt8 {dt8 * 1e3:.0f} dt16 "
        f"{dt16 * 1e3:.0f}), {N / dt / 1e6:.1f} Mrows/s")
    return round(N / dt / 1e6, 1)


def timed_chain(table, ws, label):
    def make_run(iters):
        @jax.jit
        def run(tbl, x0):
            def body(_, x):
                return chain_only(x, ws)
            return jax.lax.fori_loop(0, iters, body, x0)
        return run

    run8, run16 = make_run(8), make_run(16)
    k = jax.random.key(3)
    mk = lambda s: (jax.random.normal(jax.random.fold_in(k, s), (N, H))
                    * 0.1).astype(jnp.bfloat16)
    run8(table, mk(0)).block_until_ready()
    run16(table, mk(1)).block_until_ready()
    t0 = time.perf_counter()
    run8(table, mk(2)).block_until_ready()
    dt8 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run16(table, mk(3)).block_until_ready()
    dt16 = time.perf_counter() - t0
    dt = (dt16 - dt8) / 8
    log(f"{label}: {dt * 1e3:.2f} ms/iter (dt8 {dt8 * 1e3:.0f} dt16 "
        f"{dt16 * 1e3:.0f}), {N / dt / 1e6:.1f} Mrows/s")
    return round(N / dt / 1e6, 1)


def main():
    log(f"devices: {jax.devices()}")
    k = jax.random.key(0)
    table = jax.random.normal(k, (ROWS, C), dtype=jnp.bfloat16)
    ws = [(jax.random.normal(jax.random.fold_in(k, 10 + i), (H, H))
           / jnp.sqrt(H)).astype(jnp.bfloat16) for i in range(LAYERS)]

    res = {}
    res["xla_gather"] = timed(lambda t, i: jnp.take(t, i, axis=0), table,
                              "xla_gather")
    res["dma_gather"] = timed(lambda t, i: dma_gather(t, i), table,
                              "dma_gather")
    res["chain_only"] = timed_chain(table, ws, "chain_only")
    res["dma_overlap"] = timed(
        lambda t, i: dma_gather(t, i, ws=ws, overlap=True), table,
        "dma_overlap")

    with open(os.path.join(REPO, "PROFILE_DMA.json"), "w") as f:
        json.dump(res, f, indent=1)
    log(json.dumps(res))


if __name__ == "__main__":
    main()
