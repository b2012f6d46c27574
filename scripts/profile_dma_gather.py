"""Can per-row async DMAs beat (or hide) the XLA gather?

The flagship render serializes texture-gather (XLA jnp.take, ~51M 512B
rows/s) with the fused field kernel — together 73% of render time. If a
Pallas kernel can DMA scattered table rows from HBM while the MXU computes,
the gather cost disappears into the matmul time. The unknown is the
per-descriptor DMA overhead for 512B scattered rows.

Variants:
  dma_gather       grid over point tiles; per tile issue TILE row DMAs
                   (scalar-prefetched indices) into the VMEM output block,
                   then wait — pure DMA gather rate
  xla_gather       jnp.take baseline at the same shapes
  dma_overlap      dma_gather + an 11-layer matmul chain between start and
                   wait: does the DMA hide under MXU time?

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
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def dma_gather(table, idx, ws=None, overlap=False):
    n = idx.shape[0]
    tiles = n // TILE
    n_w = len(ws) if ws is not None else 0

    def kernel(idx_ref, *refs):
        # refs: table, ws*n_w, x, out, (act if overlap), sem
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

        jax.lax.fori_loop(0, TILE, start_one, 0, unroll=8)

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

        jax.lax.fori_loop(0, TILE, wait_one, 0, unroll=8)

    out_shapes = [jax.ShapeDtypeStruct((n, C), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((TILE, C), lambda t: (t, 0),
                              memory_space=pltpu.VMEM)]
    if overlap:
        out_shapes.append(jax.ShapeDtypeStruct((n, H), jnp.bfloat16))
        out_specs.append(pl.BlockSpec((TILE, H), lambda t: (t, 0),
                                      memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec((H, H), lambda t: (0, 0), memory_space=pltpu.VMEM)
           for _ in range(n_w)]
        + [pl.BlockSpec((TILE, H), lambda t: (t, 0),
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


def timed(gather_fn, label, rows=N):
    """In-dispatch loop; the next iteration's indices depend on the previous
    gather's output so iterations serialize (the tunneled runtime both
    elides dropped dispatches and adds ~9-30 ms per dispatch)."""
    @jax.jit
    def run(idx0):
        def body(_, i):
            rows_out = gather_fn(i)
            dep = rows_out[0, :1].astype(jnp.int32)[0] * 0
            return (i + 1 + dep) % ROWS
        return jax.lax.fori_loop(0, ITERS, body, idx0)

    idx = jax.random.randint(jax.random.key(1), (N,), 0, ROWS,
                             dtype=jnp.int32)
    try:
        out = run(idx).block_until_ready()
        t0 = time.perf_counter()
        out = run(idx).block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    log(f"{label}: {dt * 1e3:.2f} ms, {rows / dt / 1e6:.1f} Mrows/s")
    return round(rows / dt / 1e6, 1)


def main():
    log(f"devices: {jax.devices()}")
    k = jax.random.key(0)
    table = jax.random.normal(k, (ROWS, C), dtype=jnp.bfloat16)
    ws = [(jax.random.normal(jax.random.fold_in(k, 10 + i), (H, H))
           / jnp.sqrt(H)).astype(jnp.bfloat16) for i in range(LAYERS)]

    res = {}
    res["dma_gather"] = timed(lambda i: dma_gather(table, i), "dma_gather")
    res["xla_gather"] = timed(lambda i: jnp.take(table, i, axis=0),
                              "xla_gather")
    res["dma_overlap"] = timed(
        lambda i: dma_gather(table, i, ws=ws, overlap=True), "dma_overlap")

    with open(os.path.join(REPO, "PROFILE_DMA.json"), "w") as f:
        json.dump(res, f, indent=1)
    log(json.dumps(res))


if __name__ == "__main__":
    main()
