"""Breakdown of the flagship render's NON-field time (rays + proposal
integrate + sample_pdf + merge + final integrate + fill).

PROFILE_FIELD.json pinned the field kernel (21.9 ms/Mpt) and texture gather
(19.7 ms/Mpt) in-dispatch; the end-to-end render (52.3 ms/Mpt @ batch 64)
leaves ~10.7 ms/Mpt unaccounted. This script ablates the full pipeline and
microbenchmarks the per-ray pieces in-dispatch (fori_loop with a data
dependency — the tunneled runtime adds ~9-30 ms PER DISPATCH, so per-call
timing lies).

Writes PROFILE_RENDER.json. Run alone (one TPU process at a time).
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

from fenerf_tpu.core import integrate as integ
from fenerf_tpu.models import generator as gen
from fenerf_tpu.nn import fields

IMG = 128
STEPS = 24
BATCH = int(os.environ.get("FENERF_PROF_BATCH", "64"))
CHUNK = 2048
ITERS = 4

cache = os.path.expanduser("~/.cache/fenerf_jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


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
    float(render(params, key, film_g, film_a))
    t0 = time.perf_counter()
    vals = [render(params, jax.random.fold_in(key, i), film_g, film_a)
            for i in range(ITERS)]
    _ = [float(v) for v in vals]
    dt = (time.perf_counter() - t0) / ITERS
    pts = BATCH * IMG * IMG * (2 * STEPS if rcfg.hierarchical
                               else rcfg.num_steps)
    log(f"{label}: {dt * 1e3:.1f} ms/render, {pts / dt / 1e6:.1f} Mpts/s")
    return dt, pts


def in_dispatch(fn, carry0, label, iters=8, consts=()):
    """Time fn per-iteration with the elision-proof protocol: the tunneled
    runtime caches a dispatch repeated with identical args, so each timed
    call perturbs the carry, and per-iter = (dt_2k - dt_k) / k cancels the
    ~9-30ms dispatch overhead. Large operands go in `consts` and ride as
    jit ARGUMENTS (closed-over arrays become HLO literals, which the
    remote compile server rejects past ~100MB)."""
    def make_run(k_iters):
        @jax.jit
        def run(c0, *cs):
            def body(_, c):
                return fn(c, *cs)
            return jax.lax.fori_loop(0, k_iters, body, c0)
        return run

    runa, runb = make_run(iters), make_run(2 * iters)
    perturb = lambda s: jax.tree.map(lambda t: t + 1e-6 * s, carry0)

    def once(r, c):
        out = r(c, *consts)
        jax.tree.map(lambda t: float(jnp.sum(t)), out)

    once(runa, perturb(1.0))
    once(runb, perturb(2.0))
    t0 = time.perf_counter()
    once(runa, perturb(3.0))
    dta = time.perf_counter() - t0
    t0 = time.perf_counter()
    once(runb, perturb(4.0))
    dtb = time.perf_counter() - t0
    dt = (dtb - dta) / iters
    log(f"{label}: {dt * 1e3:.2f} ms/iter in-dispatch "
        f"(dt{iters} {dta * 1e3:.0f} dt{2 * iters} {dtb * 1e3:.0f})")
    return dt


def main():
    log(f"devices: {jax.devices()}")
    skip_ablate = os.environ.get("FENERF_PROF_SKIP_ABLATE") == "1"
    fcfg = fields.get_config("TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96")
    base = gen.RenderConfig(
        img_size=IMG, num_steps=STEPS, hierarchical=True,
        h_stddev=0.0, v_stddev=0.0, sample_dist=None,
        fill_mode="seg_padding_background", compute_dtype="bfloat16",
        backend="pallas", ray_chunk=CHUNK,
    )
    params = fields.init_field(jax.random.key(0), fcfg)
    film_g, film_a = fields.field_film(
        params, fcfg,
        jax.random.normal(jax.random.key(1), (BATCH, fcfg.z_geo_dim)),
        jax.random.normal(jax.random.key(2), (BATCH, fcfg.z_app_dim)),
    )

    res = {}
    if not skip_ablate:
        dt_full, pts_full = time_render(base, params, fcfg, film_g, film_a,
                                        "full")
        res["full_ms"] = dt_full * 1e3
        res["full_mpts_s"] = pts_full / dt_full / 1e6

        # same total points, no proposal/sample_pdf/merge (one 48-step eval)
        flat = base.replace(hierarchical=False, num_steps=2 * STEPS)
        dt_flat, _ = time_render(flat, params, fcfg, film_g, film_a,
                                 "flat-48 (no hier machinery)")
        res["flat48_ms"] = dt_flat * 1e3
        res["hier_overhead_ms"] = (dt_full - dt_flat) * 1e3

        # no fill / no softmax
        nofill = base.replace(fill_mode=None)
        dt_nf, _ = time_render(nofill, params, fcfg, film_g, film_a,
                               "no-fill")
        res["fill_cost_ms"] = (dt_full - dt_nf) * 1e3

    # ---- per-piece in-dispatch microbenchmarks at block shape ----
    b, rb, s = BATCH, CHUNK, STEPS
    c = fcfg.output_dim
    k = jax.random.key(7)
    z24 = jnp.sort(jax.random.uniform(k, (b, rb, s)) * 0.24 + 0.88, axis=-1)
    z24b = jnp.sort(jax.random.uniform(jax.random.fold_in(k, 1),
                                       (b, rb, s)) * 0.24 + 0.88, axis=-1)
    out24 = jax.random.normal(jax.random.fold_in(k, 2), (b, rb, s, c))
    out24b = jax.random.normal(jax.random.fold_in(k, 3), (b, rb, s, c))
    w = jax.random.uniform(jax.random.fold_in(k, 4), (b, rb, s - 2)) + 1e-3
    u = jax.random.uniform(jax.random.fold_in(k, 5), (b, rb, s))
    n48 = jax.random.normal(jax.random.fold_in(k, 6), (b, rb, 2 * s))

    n_blocks = IMG * IMG // CHUNK

    # big operands ride as jit ARGS via the consts tuple (closing over them
    # embeds 100s of MB of literals in the HLO -> remote-compile HTTP 413)
    def merge_fn(carry, o24, o24b, za, zb):
        o, z = integ.merge_sorted(o24 + carry[..., None, None],
                                  o24b, za, zb)
        return carry + o[..., 0, 0] * 1e-12

    dt = in_dispatch(merge_fn, jnp.zeros((b, rb)), "merge_sorted",
                     consts=(out24, out24b, z24, z24b))
    res["merge_ms_per_render"] = dt * 1e3 * n_blocks

    def merge2_fn(carry, o24, o24b, za, zb):
        o, z = integ.merge_fine_coarse(o24 + carry[..., None, None],
                                       o24b, za, zb)
        return carry + o[..., 0, 0] * 1e-12

    dt = in_dispatch(merge2_fn, jnp.zeros((b, rb)), "merge_fine_coarse",
                     consts=(out24, out24b, z24, z24b))
    res["merge_fc_ms_per_render"] = dt * 1e3 * n_blocks

    def pdf_fn(carry, za, ww, uu):
        fz = integ.sample_pdf(None, integ.midpoints(za),
                              ww + carry[..., None] * 1e-12, s, u=uu)
        return carry + fz[..., 0] * 1e-12

    dt = in_dispatch(pdf_fn, jnp.zeros((b, rb)), "sample_pdf",
                     consts=(z24, w, u))
    res["sample_pdf_ms_per_render"] = dt * 1e3 * n_blocks

    allout = jnp.concatenate([out24, out24b], axis=-2)
    allz = jnp.sort(jnp.concatenate([z24, z24b], axis=-1), axis=-1)

    def integ_fn(carry, ao, az, nn):
        r = integ.integrate(ao + carry[..., None, None], az, key=None,
                            noise=nn, noise_std=0.0)
        return carry + r.comp[..., 0] * 1e-12

    dt = in_dispatch(integ_fn, jnp.zeros((b, rb)), "integrate-48",
                     consts=(allout, allz, n48))
    res["integrate48_ms_per_render"] = dt * 1e3 * n_blocks

    def integ24_fn(carry, o24, za, nn):
        r = integ.integrate(o24 + carry[..., None, None], za, key=None,
                            noise=nn, noise_std=0.0)
        return carry + r.comp[..., 0] * 1e-12

    dt = in_dispatch(integ24_fn, jnp.zeros((b, rb)),
                     "integrate-24 (proposal)",
                     consts=(out24, z24, n48[..., :s]))
    res["integrate24_ms_per_render"] = dt * 1e3 * n_blocks

    def weights24_fn(carry, o24, za, nn):
        ww2 = integ.integrate_weights(o24[..., -1] + carry[..., None],
                                      za, noise=nn, noise_std=0.0)
        return carry + ww2[..., 0] * 1e-12

    dt = in_dispatch(weights24_fn, jnp.zeros((b, rb)),
                     "integrate_weights-24",
                     consts=(out24, z24, n48[..., :s]))
    res["integrate_weights24_ms_per_render"] = dt * 1e3 * n_blocks

    path = os.path.join(REPO, "PROFILE_RENDER.json")
    merged = {}
    if os.path.exists(path):  # keep ablation numbers from a previous run
        with open(path) as f:
            merged = json.load(f)
    merged.update({k2: round(v, 2) for k2, v in res.items()})
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    log(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
