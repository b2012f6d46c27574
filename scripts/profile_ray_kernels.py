"""A/B the round-3 hierarchical-machinery levers on the flagship render.

Variants (batch-64 128px 24+24 flagship render, same protocol as
profile_hier_ablate.py):

  base          round-2 default: composite_merged (one-hot permutation) +
                one-hot sample_pdf picks, XLA machinery
  nosort        composite_merged_nosort + PICK_IMPL='reduce' (all one-hot
                matmuls replaced by fusible select+reduce), still XLA
  kernels       fused Pallas ray_resample + ray_finalize (RAY_KERNELS=auto)
  kernels_t32 / kernels_t128   finalize tile sweep
  kernels_nochunk              ray_chunk=0 (kernels bound the per-ray
                               intermediates, so whole-image may now fit)

Writes PROFILE_RAYK.json. Run alone (one TPU process at a time).
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
from fenerf_tpu.ops import ray_finalize as rf

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
    try:
        float(render(params, key, film_g, film_a))
    except Exception as e:
        log(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
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
    only = os.environ.get("FENERF_PROFILE_ONLY", "").split(",")
    only = [x for x in only if x]

    def want(name):
        return not only or name in only

    if want("base"):
        # the round-2 path: one-hot permutation merge + one-hot picks
        gen.RAY_KERNELS = "never"
        orig_cm, orig_pick = integ.composite_merged_nosort, integ.PICK_IMPL
        integ.composite_merged_nosort = integ.composite_merged
        integ.PICK_IMPL = "onehot"
        try:
            res["base_ms"] = time_render(base, params, fcfg, film_g, film_a,
                                         "base")
        finally:
            integ.composite_merged_nosort = orig_cm
            integ.PICK_IMPL = orig_pick

    if want("nosort"):
        # the shipped default since round 3
        gen.RAY_KERNELS = "never"
        res["nosort_ms"] = time_render(base, params, fcfg, film_g,
                                       film_a, "nosort")

    if want("nosort_nofill"):
        # fill-mode cost under the new default (ROADMAP lever (d): 246ms
        # ablation on the round-2 path): shape-identical no-op fill
        gen.RAY_KERNELS = "never"
        orig_fill = integ.apply_fill

        def noop_fill(comp, wsum, fill_mode, fill_color="black"):
            if fill_mode in ("seg_padding_background",
                             "eval_seg_padding_background"):
                return jnp.concatenate(
                    [jnp.zeros_like(comp[..., :1]), comp], axis=-1)
            return comp

        integ.apply_fill = noop_fill
        try:
            res["nosort_nofill_ms"] = time_render(
                base, params, fcfg, film_g, film_a, "nosort_nofill")
        finally:
            integ.apply_fill = orig_fill

    if want("nosort_nopdf"):
        gen.RAY_KERNELS = "never"
        orig_pdf = integ.sample_pdf
        integ.sample_pdf = (
            lambda key, bins, w, n, det=False, eps=1e-5, u=None:
            jnp.broadcast_to(bins.mean(-1, keepdims=True),
                             w.shape[:-1] + (n,)))
        try:
            res["nosort_nopdf_ms"] = time_render(
                base, params, fcfg, film_g, film_a, "nosort_nopdf")
        finally:
            integ.sample_pdf = orig_pdf

    if want("nosort_noproposal"):
        gen.RAY_KERNELS = "never"
        orig_w = integ.integrate_weights
        integ.integrate_weights = (
            lambda s_, z, noise=None, noise_std=0.5, clamp_mode="relu":
            jnp.ones_like(z))
        try:
            res["nosort_noproposal_ms"] = time_render(
                base, params, fcfg, film_g, film_a, "nosort_noproposal")
        finally:
            integ.integrate_weights = orig_w

    if want("nosort_nomerge"):
        gen.RAY_KERNELS = "never"
        orig_cm = integ.composite_merged_nosort
        integ.composite_merged_nosort = (
            lambda fo, co, fz, cz, noise=None, noise_std=0.5, **kw:
            integ.integrate(jnp.concatenate([fo, co], -2),
                            jnp.concatenate([fz, cz], -1),
                            key=None, noise=noise, noise_std=noise_std,
                            **kw))
        try:
            res["nosort_nomerge_ms"] = time_render(
                base, params, fcfg, film_g, film_a, "nosort_nomerge")
        finally:
            integ.composite_merged_nosort = orig_cm

    if want("nosort_flat48"):
        gen.RAY_KERNELS = "never"
        res["nosort_flat48_ms"] = time_render(
            base.replace(hierarchical=False, num_steps=2 * STEPS),
            params, fcfg, film_g, film_a, "nosort_flat48")

    gen.RAY_KERNELS = "auto"
    if want("kernels"):
        res["kernels_ms"] = time_render(base, params, fcfg, film_g, film_a,
                                        "kernels")

    for tile in (32, 128):
        if want(f"kernels_t{tile}"):
            rf.FINALIZE_TILE = tile
            res[f"kernels_t{tile}_ms"] = time_render(
                base, params, fcfg, film_g, film_a, f"kernels_t{tile}")
    rf.FINALIZE_TILE = 64

    if want("kernels_nochunk"):
        res["kernels_nochunk_ms"] = time_render(
            base.replace(ray_chunk=0), params, fcfg, film_g, film_a,
            "kernels_nochunk")
    if want("kernels_chunk4096"):
        res["kernels_chunk4096_ms"] = time_render(
            base.replace(ray_chunk=4096), params, fcfg, film_g, film_a,
            "kernels_chunk4096")

    path = os.path.join(REPO, "PROFILE_RAYK.json")
    merged = {}
    if os.path.exists(path) and only:
        with open(path) as f:
            merged = json.load(f)
    merged.update({k: (round(v, 1) if v else None) for k, v in res.items()})
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    log(json.dumps(res))


if __name__ == "__main__":
    main()
