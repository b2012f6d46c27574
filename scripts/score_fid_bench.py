"""Back the TPU-host FID-scoring claim with a measured artifact.

Round 5 added `eval/score_fid.py` (FENERF_FID_SCORER=subprocess): scoring
the protocol's 10,048 images (8000 reals + 2048 fakes, fid_evaluation.py:
78-162) on the host's chip instead of its CPU. The wall-clock for that mode
was quoted in the ledger but not recorded in FID_REHEARSAL.json — this
script measures it reproducibly and merges a `tpu_scoring` block into the
artifact.

Content doesn't affect scoring cost (InceptionV3 pool3 over fixed-size
inputs), so the image set is synthesized: `--num_real` + `--num_eval` PNGs
at `--px`. Weights default to the random-weight stand-in in the exact
$FENERF_INCEPTION_WEIGHTS layout (the real arch forward runs either way).

Usage (chip must be free — don't run while a trainer owns the tunnel):
  python scripts/score_fid_bench.py                  # full protocol counts
  python scripts/score_fid_bench.py --num_real 64 --num_eval 32   # smoke
Optionally `--cpu_subset 96` also times a CPU-pinned subset to re-derive
the s/image CPU rate without paying the full >50-min CPU pass.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_pngs(out_dir: str, n: int, px: int, seed: int) -> None:
    import numpy as np
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (px, px, 3), dtype=np.uint8)
                        ).save(os.path.join(out_dir, f"{i:05d}.png"))


def run_scorer(real: str, gen: str, weights: str, platform: str | None):
    env = dict(os.environ)
    env["FENERF_INCEPTION_WEIGHTS"] = weights
    env.pop("FENERF_FORCE_PLATFORM", None)
    if platform:
        env["JAX_PLATFORMS"] = platform
        env["FENERF_FORCE_PLATFORM"] = platform
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "fenerf_tpu.eval.score_fid",
         "--real", real, "--gen", gen],
        env=env, capture_output=True, text=True, cwd=REPO)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(f"score_fid rc={r.returncode}: {r.stderr[-800:]}")
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    out["subprocess_wall_s"] = round(wall, 1)  # incl. jax init + compile
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_real", type=int, default=8000)
    p.add_argument("--num_eval", type=int, default=2048)
    p.add_argument("--px", type=int, default=128)
    p.add_argument("--work_dir", default="/tmp/score_fid_bench")
    p.add_argument("--weights", default=None,
                   help="inception .npz (default: random-weight stand-in)")
    p.add_argument("--cpu_subset", type=int, default=0,
                   help="also score the first N images CPU-pinned, to "
                        "re-derive the s/image CPU rate")
    p.add_argument("--artifact", default=os.path.join(REPO,
                                                      "FID_REHEARSAL.json"))
    args = p.parse_args()

    real = os.path.join(args.work_dir, "real")
    gen = os.path.join(args.work_dir, "gen")
    t0 = time.perf_counter()
    synth_pngs(real, args.num_real, args.px, seed=0)
    synth_pngs(gen, args.num_eval, args.px, seed=1)
    synth_s = round(time.perf_counter() - t0, 1)

    weights = args.weights
    if weights is None:
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from fid_rehearsal import export_random_inception

        had_pin = "JAX_PLATFORMS" in os.environ
        os.environ.setdefault("JAX_PLATFORMS", "cpu")  # tiny init work
        weights = os.path.join(args.work_dir, "inception_random.npz")
        export_random_inception(weights)
        if not had_pin:
            os.environ.pop("JAX_PLATFORMS")

    # the measurement: host's default platform = the chip on a TPU host
    res = run_scorer(real, gen, weights, platform=None)
    block = {
        "what": ("eval/score_fid subprocess over the full protocol image "
                 "count (content synthetic — scoring cost is content-"
                 "independent)"),
        "num_real": args.num_real, "num_eval": args.num_eval, "px": args.px,
        "platform": res["platform"], "images": res["images"],
        "score_s": res["score_s"],
        "subprocess_wall_s": res["subprocess_wall_s"],
        "synth_s": synth_s,
        "weights": "random stand-in" if args.weights is None else "provided",
    }
    if args.cpu_subset:
        sub_r = os.path.join(args.work_dir, "sub_real")
        sub_g = os.path.join(args.work_dir, "sub_gen")
        k = max(2, args.cpu_subset // 3)
        synth_pngs(sub_r, args.cpu_subset - k, args.px, seed=2)
        synth_pngs(sub_g, k, args.px, seed=3)
        cres = run_scorer(sub_r, sub_g, weights, platform="cpu")
        block["cpu_subset"] = {
            "images": cres["images"], "score_s": cres["score_s"],
            "s_per_image": round(cres["score_s"] / cres["images"], 3),
            "full_protocol_extrapolation_s": round(
                cres["score_s"] / cres["images"]
                * (args.num_real + args.num_eval), 1)}

    try:
        art = json.load(open(args.artifact))
    except FileNotFoundError:
        art = {}
    art["tpu_scoring"] = block
    with open(args.artifact, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(block, indent=1))


if __name__ == "__main__":
    main()
