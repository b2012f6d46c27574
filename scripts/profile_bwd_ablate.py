"""Backward-kernel cost attribution on real TPU (round 4, VERDICT #1).

The fused fwd+bwd field kernel runs ~6.5 Mpts/s at train shapes vs 53 Mpts/s
forward-only — ~40us per 256-point grid step where the MXU work is ~5us.
Before rebuilding (two-pass dX/dW split), attribute the per-step cost by
ablating kernel-body pieces (film_mlp_grad.ABLATE — timing-only, numerics
wrong):

  base    full kernel
  acc     no dW/db accumulation (f32 RMW + accumulation matmuls)
  resin   no xin sin-recompute for the dW operands
  film    no dfreq/dphase reductions
  cos     no cos recompute (s = g)
  all     every ablation at once (= fwd recompute + dX chain only)

Methodology: in-dispatch fori_loop with a data dependency, 3 warmups per
program (first-execution artifact). Calls film_mlp_bwd directly (no custom
VJP wrapper — its lru_cache would pin the first ablation traced). Writes
PROFILE_BWD_ABLATE.json. Run alone (one TPU process at a time).
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

ABLATIONS = {
    "base": frozenset(),
    "acc": frozenset({"acc"}),
    "resin": frozenset({"resin"}),
    "film": frozenset({"film"}),
    "cos": frozenset({"cos"}),
    "all": frozenset({"acc", "resin", "film", "cos"}),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tile", type=int, default=256)
    p.add_argument("--variants", default=",".join(ABLATIONS))
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
    gout = jax.random.normal(jax.random.fold_in(k, 5),
                             (BATCH, n, cfg.output_dim))

    mlp_keys = ["trunk", "color", "sigma_head", "color_head"]
    if cfg.n_labels:
        mlp_keys.append("label_head")
    mlp_params = {kk: params[kk] for kk in mlp_keys}

    res = {"tile": args.tile, "n_pts": N_PTS, "iters": ITERS}

    def time_run(run, *a):
        t0 = time.perf_counter()
        run(*a).block_until_ready()
        print(f"  compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        for _ in range(2):  # 3 warmups total
            run(*a).block_until_ready()
        t0 = time.perf_counter()
        run(*a).block_until_ready()
        return (time.perf_counter() - t0) / ITERS

    def record(vname, dt):
        mpts = N_PTS / dt / 1e6
        print(f"[{vname}] {dt * 1e3:.2f} ms, {mpts:.1f} Mpts/s",
              file=sys.stderr)
        res[vname] = {"ms": round(dt * 1e3, 2), "mpts_s": round(mpts, 1)}

    # --- context points: forward kernel alone, and the full custom-VJP ---
    from fenerf_tpu.ops import film_mlp as fwdmod

    @jax.jit
    def run_fwd(mp):
        def body(_, carry):
            out = fwdmod.film_mlp(mp, cfg, pts + 0.0 * carry, dirs, gf,
                                  film_g, film_a)
            return carry + 0.0 * jnp.sum(out) + 1.0
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    record("fwd_kernel", time_run(run_fwd, mlp_params))

    film_fn = grad_mod.make_film_mlp_trainable(cfg, tile_bwd=args.tile)

    def loss(mp, p):
        out = film_fn(mp, p, dirs, gf, film_g[0], film_g[1],
                      film_a[0], film_a[1])
        return jnp.sum(out * out)

    vg = jax.value_and_grad(loss, argnums=(0, 1))

    @jax.jit
    def run_vjp(mp, p):
        def body(_, carry):
            mp_c, p_c = carry
            (_, (dmp, dp)) = vg(mp_c, p_c)
            mp_n = jax.tree.map(lambda a, d: a + 0.0 * d, mp_c, dmp)
            return (mp_n, p_c + 0.0 * dp)
        fin = jax.lax.fori_loop(0, ITERS, body, (mp, p))
        # ONE scalar output — blocking per buffer costs ~45ms tunnel round
        # trips each (the round-3 5.5 Mpts/s artifact; BASELINE.md)
        return fin[1].sum() + fin[0]["trunk"][0]["w"].sum()

    record("vjp_full", time_run(run_vjp, mlp_params, pts))

    # --- manual fwd+bwd chain (no AD machinery): isolates custom_vjp glue ---
    @jax.jit
    def run_manual(mp, p):
        def body(_, carry):
            p_c = p + 0.0 * carry
            out = fwdmod.film_mlp(mp, cfg, p_c, dirs, gf, film_g, film_a)
            outs = grad_mod.film_mlp_bwd(
                mp, cfg, p_c, dirs, gf, film_g, film_a, 2.0 * out,
                tile=args.tile)
            dlayers = outs[0]
            s = sum(jnp.sum(dw) + jnp.sum(db) for dw, db in dlayers)
            return carry + 0.0 * (s + jnp.sum(outs[1])) + 1.0
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    record("manual_fwd_bwd", time_run(run_manual, mlp_params, pts))

    for vname in args.variants.split(","):
        grad_mod.ABLATE = ABLATIONS[vname]

        def bwd_once(mp, go):
            outs = grad_mod.film_mlp_bwd(
                mp, cfg, pts, dirs, gf, film_g, film_a, go, tile=args.tile)
            dlayers = outs[0]
            return sum(jnp.sum(dw) + jnp.sum(db) for dw, db in dlayers) \
                + jnp.sum(outs[1])

        @jax.jit
        def run(mp, go):
            def body(_, carry):
                s = bwd_once(mp, go + 0.0 * carry)
                return carry + 0.0 * s + 1.0
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        try:
            t0 = time.perf_counter()
            run(mlp_params, gout).block_until_ready()
            print(f"[{vname}] compile+first "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            for _ in range(2):  # 3 warmups total
                run(mlp_params, gout).block_until_ready()
            t0 = time.perf_counter()
            run(mlp_params, gout).block_until_ready()
            dt = (time.perf_counter() - t0) / ITERS
        except Exception as e:
            print(f"[{vname}] FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            res[vname] = None
            continue
        mpts = N_PTS / dt / 1e6
        print(f"[{vname}] {dt * 1e3:.2f} ms bwd-only, {mpts:.1f} Mpts/s",
              file=sys.stderr)
        res[vname] = {"ms": round(dt * 1e3, 2), "mpts_s": round(mpts, 1)}
    grad_mod.ABLATE = frozenset()

    path = os.path.join(REPO, "PROFILE_BWD_ABLATE.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
