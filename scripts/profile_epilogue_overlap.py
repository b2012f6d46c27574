"""Can Mosaic overlap the FiLM+sin epilogue (VPU) with the next matmul (MXU)?

profile_mxu_chain showed a pure Pallas bf16 matmul chain runs ~110 TF — the
production fused kernel's ~50 TF is NOT an MXU ceiling. Model: per layer the
VPU epilogue (bias + freq*y + phase, poly-sin, bf16 cast) costs about as much
time as the matmul, and a single dependent chain serializes them:
1/(1/VPU + 1/MXU) ~= measured. Interleaving k independent row sub-tiles gives
the scheduler VPU work for tile B while the MXU runs tile A.

Variants (11 layers, h=256, film epilogue, f32 epilogue math as production):
  epi_ilv{k}_t{T}    k-way interleave at row tile T
  fold_ilv{k}_t{T}   algebraic fold: sin(f*(Wx+b)+p) == sin((W*f)x + (f*b+p))
                     -> per-tile scaled weights, epilogue = 1 add + sin

Writes PROFILE_EPI.json. Run alone (one TPU process at a time).
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

from fenerf_tpu.ops.fast_math import _poly_sin, _reduce

H = 256
LAYERS = 11
N_PTS = 1 << 20
ITERS = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fsin(v):
    return _poly_sin(_reduce(v))


def run_epi(x, ws, bs, f, p, tile, interleave=1, fold=False):
    """x (N, H) bf16; ws LAYERS x (H, H) bf16; bs/f/p (LAYERS, H) f32."""
    n, h = x.shape
    tiles = n // tile

    def kernel(x_ref, w_ref_first, *refs):
        wrefs = (w_ref_first,) + refs[:LAYERS - 1]
        b_ref, f_ref, p_ref = refs[LAYERS - 1:LAYERS + 2]
        out_ref = refs[-1]
        sub = tile // interleave
        parts = [x_ref[j * sub:(j + 1) * sub] for j in range(interleave)]
        if fold:
            # fold film scale into the weights once per tile; fold bias+phase
            scaled = [wrefs[i][...] * f_ref[i][None, :].astype(jnp.bfloat16)
                      for i in range(LAYERS)]
            fbp = [f_ref[i] * b_ref[i] + p_ref[i] for i in range(LAYERS)]
            for i in range(LAYERS):
                ys = [jnp.dot(q, scaled[i], preferred_element_type=jnp.float32)
                      for q in parts]
                parts = [_fsin(y + fbp[i][None, :]).astype(jnp.bfloat16)
                         for y in ys]
        else:
            for i in range(LAYERS):
                w = wrefs[i][...]
                ys = [jnp.dot(q, w, preferred_element_type=jnp.float32)
                      for q in parts]
                parts = [
                    _fsin(f_ref[i][None, :] * (y + b_ref[i][None, :])
                          + p_ref[i][None, :]).astype(jnp.bfloat16)
                    for y in ys]
        out_ref[...] = (jnp.concatenate(parts, axis=0) if interleave > 1
                        else parts[0])

    vec_spec = pl.BlockSpec((LAYERS, h), lambda t: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h), jnp.bfloat16),
        grid=(tiles,),
        in_specs=[pl.BlockSpec((tile, h), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((h, h), lambda t: (0, 0), memory_space=pltpu.VMEM)
           for _ in range(LAYERS)]
        + [vec_spec, vec_spec, vec_spec],
        out_specs=pl.BlockSpec((tile, h), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
    )(x, *ws, bs, f, p)


def timed(fn, x, args, label):
    @jax.jit
    def run(x0):
        def body(_, a):
            return fn(a, *args)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    try:
        out = run(x).block_until_ready()
        t0 = time.perf_counter()
        out = run(x).block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
    except Exception as e:
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    flops = 2 * N_PTS * H * H * LAYERS
    tf = flops / dt / 1e12
    mpts = N_PTS / dt / 1e6 * (1472512 / (2 * H * H * LAYERS)) ** 0  # raw
    log(f"{label}: {dt * 1e3:.2f} ms, {tf:.1f} TF ({N_PTS / dt / 1e6:.0f} "
        f"Mrows/s)")
    return round(tf, 1)


def main():
    log(f"devices: {jax.devices()}")
    k = jax.random.key(0)
    x = (jax.random.normal(k, (N_PTS, H)) * 0.1).astype(jnp.bfloat16)
    ws = [(jax.random.normal(jax.random.fold_in(k, i), (H, H))
           / jnp.sqrt(H)).astype(jnp.bfloat16) for i in range(LAYERS)]
    bs = jax.random.normal(jax.random.fold_in(k, 50), (LAYERS, H)) * 0.1
    f = jax.random.normal(jax.random.fold_in(k, 51), (LAYERS, H)) * 15 + 30
    p = jax.random.normal(jax.random.fold_in(k, 52), (LAYERS, H))

    res = {}
    for tile in (1024, 2048):
        for ilv in (1, 2, 4):
            res[f"epi_ilv{ilv}_t{tile}"] = timed(
                functools.partial(run_epi, tile=tile, interleave=ilv),
                x, (ws, bs, f, p), f"epi_ilv{ilv}_t{tile}")
    for tile in (1024, 2048):
        for ilv in (1, 2):
            res[f"fold_ilv{ilv}_t{tile}"] = timed(
                functools.partial(run_epi, tile=tile, interleave=ilv,
                                  fold=True),
                x, (ws, bs, f, p), f"fold_ilv{ilv}_t{tile}")

    with open(os.path.join(REPO, "PROFILE_EPI.json"), "w") as f2:
        json.dump(res, f2, indent=1)
        f2.write("\n")
    log(json.dumps(res))


if __name__ == "__main__":
    main()
