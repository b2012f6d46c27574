"""Backward-kernel transpose-elimination A/B on real TPU (round 3).

The fused field VJP measures 5.5 Mpts/s fwd+bwd (PROFILE_BWD.json) while the
forward alone runs 48 Mpts/s — a 9x gap where the 3x-forward FLOP ratio
predicts ~16 Mpts/s. The kernel body executes two in-kernel transposes per
linear layer per grid step (W.T for dy@W^T, x.T for the dW accumulation),
~20 (256,256) relayouts per 256-point tile. This sweep times the four
combinations of eliminating them (ops/film_mlp_grad.py BWD_WT / BWD_ACC0):

  base       current kernel (in-kernel .T both places)
  wt         pre-transposed bf16 weights as extra constant VMEM blocks
  acc0       dW via dot_general contracting the point axis (no x.T)
  wt_acc0    both

Methodology: in-dispatch fori_loop with a data dependency (the tunnel adds
9-30ms per dispatch), 3 warmups per program (first-execution artifact,
BASELINE.md round-3 note). Writes PROFILE_BWD_VARIANTS.json.
Run alone (one TPU process at a time).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PTS = 1 << 19          # points per step (B * N)
BATCH = 4
ITERS = 16


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--variants", default="base,wt,acc0,wt_acc0")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fenerf_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from fenerf_tpu.nn import fields
    from fenerf_tpu.ops import film_mlp_grad as grad_mod

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

    VARIANTS = {"base": (False, False), "wt": (True, False),
                "acc0": (False, True), "wt_acc0": (True, True)}
    res = {"tile": args.tile, "n_pts": N_PTS, "iters": ITERS}
    for vname in args.variants.split(","):
        wt, acc0 = VARIANTS[vname]
        # module globals are read at trace time; each variant re-jits
        grad_mod.BWD_WT, grad_mod.BWD_ACC0 = wt, acc0
        film_fn = grad_mod.make_film_mlp_trainable(cfg, tile_bwd=args.tile)

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
            # ONE scalar output — blocking per buffer costs ~45ms tunnel
            # round trips each (round-4 correction, BASELINE.md)
            return fin[1].sum() + fin[0]["trunk"][0]["w"].sum()

        try:
            t0 = time.perf_counter()
            run(mlp_params, pts).block_until_ready()
            print(f"[{vname}] compile+first "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            for _ in range(2):  # 3 warmups total (first-execution artifact)
                run(mlp_params, pts).block_until_ready()
            t0 = time.perf_counter()
            run(mlp_params, pts).block_until_ready()
            dt = (time.perf_counter() - t0) / ITERS
        except Exception as e:  # VMEM OOM (wt adds ~1.5MB) is informative
            print(f"[{vname}] FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            res[vname] = None
            continue
        mpts = N_PTS / dt / 1e6
        print(f"[{vname}] {dt * 1e3:.2f} ms/step fwd+bwd, {mpts:.1f} Mpts/s",
              file=sys.stderr)
        res[vname] = {"ms": round(dt * 1e3, 2), "mpts_s": round(mpts, 1)}

    path = os.path.join(REPO, "PROFILE_BWD_VARIANTS.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
