"""Backward-kernel tile sweep on real TPU (ROADMAP #2: 256 -> 512 split).

Times the fused forward+backward field VJP (ops/film_mlp_grad) at several
point-tile sizes, in-dispatch (fori_loop with a data dependency — the
tunneled runtime adds ~9-30 ms per dispatch, so per-call timing lies).
Larger tiles amortize the per-tile dW accumulation matmuls
((h,tile)x(tile,h) per layer) against the fixed film/recompute cost.

Writes PROFILE_BWD.json. Run alone (one TPU process at a time).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PTS = 1 << 19          # points per step (B * N)
BATCH = 4
ITERS = 16
TILES = [128, 256, 512, 1024]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fenerf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from fenerf_tpu.nn import fields
    from fenerf_tpu.ops.film_mlp_grad import make_film_mlp_trainable

    print(f"devices: {jax.devices()}", file=sys.stderr)

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
    g = cfg.grid_channels or 0
    gf = (jax.random.normal(jax.random.fold_in(k, 4), (BATCH, n, g))
          if g else None)

    mlp_keys = ["trunk", "color", "sigma_head", "color_head"]
    if cfg.n_labels:
        mlp_keys.append("label_head")
    mlp_params = {kk: params[kk] for kk in mlp_keys}

    res = {}
    for tile in TILES:
        film_fn = make_film_mlp_trainable(cfg, tile_bwd=tile)

        def loss(mp, p):
            out = film_fn(mp, p, dirs, gf, film_g[0], film_g[1],
                          film_a[0], film_a[1])
            return jnp.sum(out * out)

        vg = jax.value_and_grad(loss, argnums=(0, 1))

        @jax.jit
        def run(mp, p):
            def body(_, carry):
                mp_c, p_c = carry
                (_, (dmp, dp)) = vg(mp_c, p_c)
                # data dependency so iterations serialize
                mp_n = jax.tree.map(lambda a, d: a + 0.0 * d, mp_c, dmp)
                return (mp_n, p_c + 0.0 * dp)
            fin = jax.lax.fori_loop(0, ITERS, body, (mp, p))
            # ONE scalar output: blocking on the raw (mp, p) tree costs a
            # ~45ms tunnel round trip PER BUFFER (16 buffers = ~720ms/call),
            # which inflated the round-3 numbers ~3x (BASELINE.md round-4
            # correction)
            return fin[1].sum() + fin[0]["trunk"][0]["w"].sum()

        try:
            run(mlp_params, pts).block_until_ready()
            for _ in range(2):  # 3 warmups (first-execution artifact)
                run(mlp_params, pts).block_until_ready()
            t0 = time.perf_counter()
            run(mlp_params, pts).block_until_ready()
            dt = (time.perf_counter() - t0) / ITERS
        except Exception as e:  # VMEM OOM at large tiles is informative
            print(f"tile {tile}: FAILED {type(e).__name__}", file=sys.stderr)
            res[f"tile_{tile}"] = None
            continue
        mpts = N_PTS / dt / 1e6
        print(f"tile {tile}: {dt * 1e3:.2f} ms/step fwd+bwd, "
              f"{mpts:.1f} Mpts/s", file=sys.stderr)
        res[f"tile_{tile}"] = {"ms": round(dt * 1e3, 2),
                               "mpts_s": round(mpts, 1)}

    with open(os.path.join(REPO, "PROFILE_BWD.json"), "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res, indent=1), file=sys.stderr)


if __name__ == "__main__":
    main()
