"""In-dispatch A/B of the field-kernel head fold (VERDICT round-2 #4).

The inference kernel packs the sigma head and the activation-free label-head
chain (reference siren/siren.py:1195-1229: Sequential(Linear(h,h),
Linear(h,18)) with no nonlinearity) into ONE (h, 1+n_labels) MXU pass
(ops/film_mlp.py::_fold_heads). Narrow-N heads pay a full MXU pass for <=18
output lanes, so removing 3 of the 4 head passes was the round-2 lever for
the ~14% head share of kernel time (BASELINE.md roofline table).

Measures the production kernel fold-on vs fold-off, in-dispatch (fori_loop
with a data dependency — per-call timing is inflated ~9-30ms by the
tunneled runtime's dispatch latency). Writes PROFILE_HEADFOLD.json.
Run alone (one TPU process at a time): python scripts/profile_head_fold.py
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

N_PTS = 1 << 20
BATCH = 4
ITERS = 8

cache = os.path.expanduser("~/.cache/fenerf_jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from fenerf_tpu.core.grid_sample import grid_sample_3d_fast
    from fenerf_tpu.nn import fields
    from fenerf_tpu.ops import film_mlp as ops

    log(f"devices: {jax.devices()}")
    name = "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96"
    cfg = fields.get_config(name)
    params = fields.init_field(jax.random.key(0), cfg)
    k = jax.random.key(1)
    n = N_PTS // BATCH
    pts = jax.random.uniform(jax.random.fold_in(k, 0), (BATCH, n, 3),
                             minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(jax.random.fold_in(k, 1), (BATCH, n, 3))
    zg = jax.random.normal(jax.random.fold_in(k, 2), (BATCH, cfg.z_geo_dim))
    za = jax.random.normal(jax.random.fold_in(k, 3), (BATCH, cfg.z_app_dim))
    film_g, film_a = fields.field_film(params, cfg, zg, za)
    gf = grid_sample_3d_fast(params["grid"], pts)

    h = cfg.hidden_dim
    flops_per_pt = 2 * h * h * (cfg.trunk_layers + cfg.color_layers - 2) \
        + 2 * h * (6 + cfg.grid_channels + 1 + 3
                   + cfg.label_hidden_layers * h + cfg.n_labels)

    def measure(tag):
        @jax.jit
        def run(p):
            def body(_, p):
                out = ops.film_mlp(params, cfg, p, dirs, gf, film_g, film_a)
                # data dependency so the loop iterations cannot be elided
                return p + 1e-20 * out[..., :3]
            return jax.lax.fori_loop(0, ITERS, body, p)

        run(pts).block_until_ready()
        t0 = time.perf_counter()
        run(pts).block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        mpts = N_PTS / dt / 1e6
        tf = flops_per_pt * N_PTS / dt / 1e12
        log(f"{tag}: {dt * 1e3:.2f} ms/eval, {mpts:.1f} Mpts/s, "
            f"{tf:.1f} TFLOP/s")
        return {"ms": round(dt * 1e3, 2), "mpts": round(mpts, 1),
                "tflops": round(tf, 1)}

    results = {"flops_per_pt": flops_per_pt}
    orig = ops._fold_heads
    try:
        results["fold_on"] = measure("fold_on (shipped)")
        ops._fold_heads = lambda c: False
        results["fold_off"] = measure("fold_off (round-2 3-pass heads)")
    finally:
        ops._fold_heads = orig

    # parity between the two packings at production shapes
    a = ops.film_mlp(params, cfg, pts, dirs, gf, film_g, film_a)
    ops._fold_heads = lambda c: False
    try:
        b = ops.film_mlp(params, cfg, pts, dirs, gf, film_g, film_a)
    finally:
        ops._fold_heads = orig
    results["fold_max_abs_delta"] = float(jnp.abs(a - b).max())
    log(f"fold-on vs fold-off max|d| = {results['fold_max_abs_delta']:.2e}")

    with open(os.path.join(REPO, "PROFILE_HEADFOLD.json"), "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
