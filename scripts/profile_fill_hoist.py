"""A/B the fill/softmax hoist on the flagship render (VERDICT round-2 #3).

Round-2's graph ablations showed ~240-246ms of the batch-64 render vanishing
when apply_fill+softmax became no-ops, despite the ops being elementwise and
near-free in isolation — a fusion break. The fix (models/generator.py
FILL_HOIST): apply fill/softmax ONCE on the assembled image outside the
ray-block lax.map instead of inside each block body, where apply_fill's
channel-axis concat broke the epilogue fusion of every block.

Variants (batch-64 128px 24+24 flagship render, protocol of
profile_ray_kernels.py):

  hoist_on      shipped default: fill+softmax once per image, post-loop
  hoist_off     round-2 behavior: fill+softmax inside each ray-block body
  hoist_nofill  hoist_on with apply_fill replaced by a shape-identical no-op
                (isolates any residual fill cost after the hoist)

Writes PROFILE_FILLHOIST.json. Run alone (one TPU process at a time).
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fenerf_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from fenerf_tpu.core import integrate as integ
from fenerf_tpu.models import generator as gen
from fenerf_tpu.nn import fields

IMG, STEPS, BATCH, CHUNK, ITERS = 128, 24, 64, 2048, 4
RAYS = IMG * IMG * BATCH


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_render(rcfg, params, fcfg, film_g, film_a, label):
    @jax.jit
    def render(params, key, film_g, film_a):
        return gen.render(params, fcfg, rcfg, key, film_g, film_a,
                          batch_size=BATCH, noise_std=0.0)["pixels"].sum()

    key = jax.random.key(3)
    t0 = time.perf_counter()
    float(render(params, key, film_g, film_a))
    log(f"{label}: compile+first {time.perf_counter() - t0:.1f}s")
    # warm past the ~1s second-execution artifact (BASELINE.md) so the
    # first-measured variant is comparable to later ones
    for w in range(2):
        float(render(params, jax.random.fold_in(key, 100 + w),
                     film_g, film_a))
    t0 = time.perf_counter()
    vals = [render(params, jax.random.fold_in(key, i), film_g, film_a)
            for i in range(ITERS)]
    _ = [float(v) for v in vals]
    dt = (time.perf_counter() - t0) / ITERS
    log(f"{label}: {dt * 1e3:.1f} ms/render = {RAYS / dt:,.0f} rays/s")
    return dt * 1e3


def main():
    log(f"devices: {jax.devices()}")
    fcfg = fields.get_config(
        "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96")
    base = gen.RenderConfig(
        img_size=IMG, num_steps=STEPS, hierarchical=True,
        h_stddev=0.0, v_stddev=0.0, sample_dist=None,
        fill_mode="seg_padding_background", compute_dtype="bfloat16",
        backend="pallas", ray_chunk=CHUNK)
    params = fields.init_field(jax.random.key(0), fcfg)
    film_g, film_a = fields.field_film(
        params, fcfg,
        jax.random.normal(jax.random.key(1), (BATCH, fcfg.z_geo_dim)),
        jax.random.normal(jax.random.key(2), (BATCH, fcfg.z_app_dim)))

    res = {}
    gen.RAY_KERNELS = "never"

    gen.FILL_HOIST = True
    res["hoist_on_ms"] = time_render(base, params, fcfg, film_g, film_a,
                                     "hoist_on")

    gen.FILL_HOIST = False
    res["hoist_off_ms"] = time_render(base, params, fcfg, film_g, film_a,
                                      "hoist_off")
    gen.FILL_HOIST = True

    orig_fill = integ.apply_fill

    def noop_fill(comp, wsum, fill_mode, fill_color="black"):
        if fill_mode in ("seg_padding_background",
                         "eval_seg_padding_background"):
            return jnp.concatenate(
                [jnp.zeros_like(comp[..., :1]), comp], axis=-1)
        return comp

    integ.apply_fill = noop_fill
    try:
        res["hoist_nofill_ms"] = time_render(base, params, fcfg, film_g,
                                             film_a, "hoist_nofill")
    finally:
        integ.apply_fill = orig_fill

    with open(os.path.join(REPO, "PROFILE_FILLHOIST.json"), "w") as f:
        json.dump({k: round(v, 1) for k, v in res.items()}, f, indent=1)
        f.write("\n")
    log(json.dumps(res))


if __name__ == "__main__":
    main()
