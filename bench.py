"""Benchmark: rays/sec/chip, 128x128 hierarchical render of the flagship
dual-latent semantic NeRF (TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96,
24 coarse + 24 fine samples/ray — the FID/eval render protocol,
/root/reference/fid_evaluation.py + render defaults).

Prints ONE JSON line:
  {"metric": "rays_per_sec_chip_128px_render", "value": N, "unit": "rays/s",
   "vs_baseline": R}

vs_baseline: the reference repo publishes no numbers (BASELINE.md) and no GPU
exists in this container, so the denominator is the reference PyTorch
implementation measured on this host's CPU (the only runnable reference),
cached in BASELINE_MEASURED.json after the first run. Interpret accordingly:
it is a TPU-chip vs CPU-core ratio, not TPU vs GPU.

Details (timings, config) go to stderr; stdout carries only the JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "BASELINE_MEASURED.json")

IMG = 128
STEPS = 24
BATCH = int(os.environ.get("FENERF_BENCH_BATCH", "64"))  # sweep peak (BASELINE.md)
# round 1 hit an HBM ceiling at batch 32 (the coarse+fine merge materialized
# a (B, R, 48, 48) permutation for the whole image, ~36.7G). The render now
# chunks the whole per-ray pipeline (merge+integrate included) along rays, so
# large batches fit; chunking is bit-exact (RayNoise drawn once, sliced).
RAY_CHUNK = int(os.environ.get("FENERF_BENCH_RAY_CHUNK", "2048"))
WARMUP = 2
ITERS = 8
GROUPS = int(os.environ.get("FENERF_BENCH_GROUPS", "3"))  # median-of-groups
RAYS_PER_IMG = IMG * IMG


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_tpu(batch: int = None, ray_chunk: int = None) -> list[float]:
    batch = BATCH if batch is None else batch
    ray_chunk = RAY_CHUNK if ray_chunk is None else ray_chunk
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the flagship render compiles in minutes
    # cold but milliseconds warm
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/fenerf_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields

    # A wedged TPU tunnel blocks backend init forever; fail loudly instead so
    # the caller gets an exit code rather than an infinite stall. Covers only
    # device discovery — cold compiles (minutes) start after this returns.
    import threading
    _init_done = threading.Event()

    def _watchdog():
        if not _init_done.wait(300):
            log("FATAL: TPU backend init did not complete in 300s "
                "(tunnel wedged?)")
            os._exit(17)

    threading.Thread(target=_watchdog, daemon=True).start()
    devs = jax.devices()
    _init_done.set()
    log(f"devices: {devs}")
    fcfg = fields.get_config("TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96")
    rcfg = gen.RenderConfig(
        img_size=IMG, num_steps=STEPS, hierarchical=True,
        h_stddev=0.0, v_stddev=0.0, sample_dist=None,
        fill_mode="seg_padding_background",
        compute_dtype="bfloat16",
        backend="pallas",  # fused point-MLP kernel (measured fastest)
        # chunk when the whole-image merge/gather intermediates get large
        # (>=16 imgs @128px): bounds HBM AND keeps the XLA graph compilable
        ray_chunk=ray_chunk if batch * RAYS_PER_IMG >= (1 << 18) else 0,
    )
    params = fields.init_field(jax.random.key(0), fcfg)
    film_g, film_a = fields.field_film(
        params, fcfg,
        jax.random.normal(jax.random.key(1), (batch, fcfg.z_geo_dim)),
        jax.random.normal(jax.random.key(2), (batch, fcfg.z_app_dim)),
    )

    @jax.jit
    def render(params, key, film_g, film_a):
        # reduce to a scalar so timing can force real execution with a tiny
        # readback (the tunneled runtime elides dispatches whose outputs are
        # dropped, and block_until_ready does not reliably wait)
        return gen.render(params, fcfg, rcfg, key, film_g, film_a,
                          batch_size=batch, noise_std=0.0)["pixels"].sum()

    key = jax.random.key(3)
    t0 = time.perf_counter()
    float(render(params, key, film_g, film_a))
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")
    for _ in range(WARMUP - 1):
        float(render(params, key, film_g, film_a))

    # >=3 independent timed groups: the tunneled chip shows a documented
    # +-5% day-band (BASELINE.md), so a single point is uninterpretable
    # round-over-round — the driver JSON carries median + min/max
    rates = []
    for g in range(GROUPS):
        t0 = time.perf_counter()
        outs = [render(params, jax.random.fold_in(key, g * ITERS + i),
                       film_g, film_a) for i in range(ITERS)]
        checks = [float(o) for o in outs]  # forces execution of every render
        dt = time.perf_counter() - t0
        assert all(c == c for c in checks), "NaN render output"
        rays_per_sec = batch * RAYS_PER_IMG * ITERS / dt
        log(f"tpu group {g}: {ITERS} renders of {batch}x{IMG}x{IMG} in "
            f"{dt:.3f}s -> {rays_per_sec:,.0f} rays/s "
            f"({rays_per_sec * 2 * STEPS:,.0f} pts/s)")
        rates.append(rays_per_sec)
    return rates


def bench_reference_cpu() -> float:
    """Reference torch-CPU rays/sec at the same per-ray cost (48 field
    evaluations/ray). Measured through the reference's own staged point loop
    granularity: batched forward_with_frequencies_phase_shifts."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from reference_shim import import_reference_siren

    import torch

    ref_siren = import_reference_siren()
    torch.manual_seed(0)
    m = ref_siren.TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96(
        z_geo_dim=256, z_app_dim=256, output_dim=22)
    m.eval()
    n_pts = 24576
    pts = torch.randn(1, n_pts, 3) * 0.1
    dirs = torch.randn(1, n_pts, 3)
    with torch.no_grad():
        fg, pg = m.geo_mapping_network(torch.randn(1, 256))
        fa, pa = m.app_mapping_network(torch.randn(1, 256))
        m(pts[:, :128], torch.randn(1, 256), torch.randn(1, 256),
          ray_directions=dirs[:, :128])  # warmup
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            m.forward_with_frequencies_phase_shifts(
                pts, fg, fa, pg, pa, ray_directions=dirs)
        dt = time.perf_counter() - t0
    pts_per_sec = n_pts * reps / dt
    rays_per_sec = pts_per_sec / (2 * STEPS)
    log(f"reference torch-cpu: {pts_per_sec:,.0f} pts/s "
        f"-> {rays_per_sec:,.0f} rays/s at {2 * STEPS} pts/ray")
    return rays_per_sec


def main():
    import statistics

    if os.environ.get("FENERF_BENCH_SWEEP"):
        results = {}
        for b in (8, 16, 32, 64):
            results[b] = bench_tpu(batch=b)
            log(f"sweep batch={b}: {statistics.median(results[b]):,.0f} "
                "rays/s (median)")
        best = max(results, key=lambda b: statistics.median(results[b]))
        log(f"sweep: "
            f"{json.dumps({k: round(statistics.median(v)) for k, v in results.items()})} "
            f"-> best batch {best}")
        rates = results[best]
    else:
        rates = bench_tpu()
    value = statistics.median(rates)
    if os.path.exists(BASELINE_FILE) and not os.environ.get("REMEASURE"):
        base = json.load(open(BASELINE_FILE))
    else:
        base = {
            "reference_cpu_rays_per_sec": bench_reference_cpu(),
            "note": "reference PyTorch measured on this host's CPU "
                    "(no GPU available); see bench.py docstring",
        }
        with open(BASELINE_FILE, "w") as f:
            json.dump(base, f, indent=1)
            f.write("\n")
    denom = base["reference_cpu_rays_per_sec"]
    print(json.dumps({
        "metric": "rays_per_sec_chip_128px_render",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / denom, 2),
        "spread": {"groups": len(rates), "iters_per_group": ITERS,
                   "min": round(min(rates), 1), "max": round(max(rates), 1)},
    }))


if __name__ == "__main__":
    main()
