"""Graph-level attribution of the 543ms hierarchical-machinery ablation.

Micro-timing says the explicit ops cost ~47ms (PROFILE_RENDER.json) and
bandwidth/FLOPs/RNG/per-block-cost are all eliminated (ROADMAP #2a), so the
cost must live in fusion/scheduling effects only visible in the full graph.
Each variant below swaps ONE pipeline stage for a numerics-breaking no-op
of identical shape (perf measurement only) and re-times the full batch-64
flagship render:

  base        unmodified hierarchical render
  no_merge    merge_sorted -> plain concat (no rank/permutation)
  no_pdf      sample_pdf -> midpoint broadcast (no CDF/searchsorted)
  no_proposal integrate_weights -> ones (no proposal compositing)
  flat48      hierarchical=False, num_steps=48 (the round-2 ablation)

Writes PROFILE_HIER.json. Run alone (one TPU process at a time).
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
    # measured (BASELINE.md "first-execution artifact"): the 2nd execution in
    # a process is ~1s slower than steady state — warm until stable so the
    # first-measured variant is not inflated by ~1s/ITERS (this artifact
    # produced round-2's phantom 246ms "fill fusion break")
    for w in range(2):
        float(render(params, jax.random.fold_in(key, 100 + w),
                     film_g, film_a))
    t0 = time.perf_counter()
    vals = [render(params, jax.random.fold_in(key, i), film_g, film_a)
            for i in range(ITERS)]
    _ = [float(v) for v in vals]
    dt = (time.perf_counter() - t0) / ITERS
    log(f"{label}: {dt * 1e3:.1f} ms/render")
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
    res["base_ms"] = time_render(base, params, fcfg, film_g, film_a, "base")

    orig_merge = integ.merge_sorted
    integ.merge_sorted = lambda f, c, fz, cz: (
        jnp.concatenate([f, c], -2), jnp.concatenate([fz, cz], -1))
    try:
        res["no_merge_ms"] = time_render(base, params, fcfg, film_g,
                                         film_a, "no_merge")
    finally:
        integ.merge_sorted = orig_merge

    orig_pdf = integ.sample_pdf
    integ.sample_pdf = (
        lambda key, bins, w, n, det=False, eps=1e-5, u=None:
        jnp.broadcast_to(bins.mean(-1, keepdims=True),
                         w.shape[:-1] + (n,)))
    try:
        res["no_pdf_ms"] = time_render(base, params, fcfg, film_g,
                                       film_a, "no_pdf")
    finally:
        integ.sample_pdf = orig_pdf

    orig_w = integ.integrate_weights
    integ.integrate_weights = (
        lambda s, z, noise=None, noise_std=0.5, clamp_mode="relu":
        jnp.ones_like(z))
    try:
        res["no_proposal_ms"] = time_render(base, params, fcfg, film_g,
                                            film_a, "no_proposal")
    finally:
        integ.integrate_weights = orig_w

    flat = base.replace(hierarchical=False, num_steps=2 * STEPS)
    res["flat48_ms"] = time_render(flat, params, fcfg, film_g, film_a,
                                   "flat48")

    for k2 in ("no_merge_ms", "no_pdf_ms", "no_proposal_ms", "flat48_ms"):
        res[k2.replace("_ms", "_delta_ms")] = round(
            res["base_ms"] - res[k2], 1)
    with open(os.path.join(REPO, "PROFILE_HIER.json"), "w") as f:
        json.dump({a: round(b, 1) for a, b in res.items()}, f, indent=1)
        f.write("\n")
    log(json.dumps(res))


if __name__ == "__main__":
    main()
