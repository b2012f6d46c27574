"""MXU-utilization experiments for the fused field kernel (ROADMAP #2).

PROFILE_FIELD.json shows the fused kernel already matches a pure
11-matmul-chain baseline (~50 TF on a v5e whose bf16 peak is ~197 TF), so
the remaining headroom is in how the serial (tile,256)x(256,256) chain maps
to the MXU, not in the epilogue. Hypotheses tested here, all in-dispatch:

  chain_t{T}      serial 11-matmul chain at row-tile T (pipeline-bubble
                  amortization: bigger T = longer MXU occupancy per layer
                  vs fixed drain latency)
  ilv2_t{T}       2-way interleave: two independent row tiles advance
                  through the layers alternately inside one kernel, giving
                  the MXU independent work during each chain dependency
  wide_t{T}       single (T,512)x(512,512) matmul chain with the same FLOPs
                  per point (2 layers packed into one) — tests whether
                  wider K/N improves MXU packing

Writes PROFILE_MXU.json. Run alone (one TPU process at a time).
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

H = 256
LAYERS = 11
N_PTS = 1 << 20
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_chain(x, ws, tile, interleave=1):
    n, h = x.shape
    tiles = n // tile

    def kernel(x_ref, *refs):
        wrefs = refs[:-1]
        out_ref = refs[-1]
        if interleave == 1:
            a = x_ref[...]
            for i in range(LAYERS):
                a = jnp.dot(a, wrefs[i][...],
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
            out_ref[...] = a
        else:
            half = tile // interleave
            parts = [x_ref[j * half:(j + 1) * half] for j in range(interleave)]
            for i in range(LAYERS):
                w = wrefs[i][...]
                parts = [jnp.dot(p, w, preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16) for p in parts]
            out_ref[...] = jnp.concatenate(parts, axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.bfloat16),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((tile, h), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((h, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
           for _ in range(LAYERS)],
        out_specs=pl.BlockSpec((tile, h), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )(x, *ws)


def run_wide(x, ws, tile):
    """Half the layers at 2x width: same FLOPs/pt as the 256 chain."""
    n, h = x.shape
    tiles = n // tile
    nlayers = len(ws)

    def kernel(x_ref, *refs):
        wrefs = refs[:-1]
        out_ref = refs[-1]
        a = x_ref[...]
        for i in range(nlayers):
            a = jnp.dot(a, wrefs[i][...],
                        preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        out_ref[...] = a

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.bfloat16),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((tile, h), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((h, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
           for _ in range(nlayers)],
        out_specs=pl.BlockSpec((tile, h), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )(x, *ws)


def timed(fn, x, ws, label=""):
    @jax.jit
    def run(x0):
        def body(_, a):
            return fn(a, ws)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    try:
        out = run(x).block_until_ready()
        t0 = time.perf_counter()
        out = run(x).block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None
    n = x.shape[0]
    h2 = x.shape[1]
    flops = 2 * n * h2 * h2 * LAYERS if h2 == H else 2 * n * h2 * h2 * (LAYERS // 2)
    tf = flops / dt / 1e12
    log(f"{label}: {dt * 1e3:.2f} ms, {tf:.1f} TFLOP/s")
    return round(tf, 1)


def main():
    log(f"devices: {jax.devices()}")
    k = jax.random.key(0)
    x = (jax.random.normal(k, (N_PTS, H)) * 0.1).astype(jnp.bfloat16)
    ws = [(jax.random.normal(jax.random.fold_in(k, i), (H, H))
           / jnp.sqrt(H)).astype(jnp.bfloat16) for i in range(LAYERS)]

    res = {}
    for tile in (512, 1024, 2048, 4096):
        res[f"chain_t{tile}"] = timed(
            functools.partial(run_chain, tile=tile), x, ws,
            label=f"chain_t{tile}")
    for tile in (1024, 2048, 4096):
        for ilv in (2, 4):
            res[f"ilv{ilv}_t{tile}"] = timed(
                functools.partial(run_chain, tile=tile, interleave=ilv),
                x, ws, label=f"ilv{ilv}_t{tile}")

    # wide: (N,512) x (512,512), 5 layers ~= same flops/pt as 10 narrow
    x2 = (jax.random.normal(jax.random.fold_in(k, 99), (N_PTS // 2, 2 * H))
          * 0.1).astype(jnp.bfloat16)
    ws2 = [(jax.random.normal(jax.random.fold_in(k, 100 + i),
                              (2 * H, 2 * H)) / jnp.sqrt(2 * H)
            ).astype(jnp.bfloat16) for i in range(LAYERS // 2)]
    for tile in (1024, 2048):
        res[f"wide_t{tile}"] = timed(
            functools.partial(run_wide, tile=tile), x2, ws2,
            label=f"wide_t{tile}")

    with open(os.path.join(REPO, "PROFILE_MXU.json"), "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    log(json.dumps(res))


if __name__ == "__main__":
    main()
