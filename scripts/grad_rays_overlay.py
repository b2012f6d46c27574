"""Training-dynamics certificate for the grad-subset-of-rays lever.

grad_rays < 1 is a stochastic gradient estimator (the G backward sees a
random half of the pixels), not a numerics change — so the GRAD_OVERLAY
same-function argument does not apply. The honest certificate is GAN
training itself: run the REAL train CLI at the flagship 32px stage three
times on structured synthetic data —

  full     grad_rays=1.0, seed 0   (the production default)
  grad50   grad_rays=0.5, seed 0   (the lever under test)
  control  grad_rays=1.0, seed 1   (the natural seed-to-seed spread of this
                                    GAN — the yardstick any stochastic
                                    change must be measured against)

— and compare smoothed fake_opacity / g_loss / d_loss trajectories. The
lever passes if |full − grad50| stays within ~the |full − control| spread
band: then sub-sampling the pixel gradients perturbs optimization no more
than re-seeding does. Writes GRAD_RAYS_OVERLAY.json.

Run on TPU (one arm at a time owns the chip):
  python scripts/grad_rays_overlay.py [--steps 1500] [--grad_rays 0.5]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_data(root: str, n: int = 64, size: int = 256) -> None:
    """Structured synthetic 'faces': skin ellipse + hair band + eye dots on
    black background, with paired label masks (classes 1=skin, 4/5=eyes,
    13=hair) — enough structure for the GAN phases to have real work."""
    from PIL import Image, ImageDraw

    img_dir = os.path.join(root, "celebahq_mask_img")
    mask_dir = os.path.join(root, "celebahq_mask_mask")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    rng = np.random.RandomState(7)
    for i in range(n):
        img = Image.new("RGB", (size, size), (0, 0, 0))
        mask = Image.new("L", (size, size), 0)
        di, dm = ImageDraw.Draw(img), ImageDraw.Draw(mask)
        cx, cy = (rng.uniform(0.4, 0.6, 2) * size).astype(int)
        rx, ry = int(size * rng.uniform(0.18, 0.26)), int(
            size * rng.uniform(0.24, 0.33))
        skin = tuple(rng.randint(150, 230, 3))
        box = (cx - rx, cy - ry, cx + rx, cy + ry)
        di.ellipse(box, fill=skin)
        dm.ellipse(box, fill=1)
        hair = tuple(rng.randint(20, 120, 3))
        hbox = (cx - rx, cy - ry, cx + rx, cy - ry // 2)
        di.ellipse((hbox[0], hbox[1] - ry // 3, hbox[2], hbox[3]), fill=hair)
        dm.ellipse((hbox[0], hbox[1] - ry // 3, hbox[2], hbox[3]), fill=13)
        for side, cls in ((-1, 4), (1, 5)):
            ex, ey = cx + side * rx // 2, cy - ry // 8
            r = max(2, rx // 8)
            di.ellipse((ex - r, ey - r, ex + r, ey + r), fill=(30, 30, 40))
            dm.ellipse((ex - r, ey - r, ex + r, ey + r), fill=cls)
        img.save(os.path.join(img_dir, f"{i:03d}.jpg"))
        mask.save(os.path.join(mask_dir, f"{i:03d}.png"))


def run_arm(name: str, data_root: str, out_root: str, steps: int,
            seed: int, grad_rays: float, curriculum: str) -> list[dict]:
    out = os.path.join(out_root, name)
    cmd = [sys.executable, "-m", "fenerf_tpu.apps.train",
           "--curriculum", curriculum, "--global_batch",
           "--output_dir", out, "--data_root", data_root,
           "--total_steps", str(steps), "--eval_freq", "0",
           "--sample_interval", "0", "--model_save_interval", "0",
           "--log_every", "10", "--seed", str(seed),
           "--grad_rays", str(grad_rays)]
    log(f"[{name}] {' '.join(cmd)}")
    # APPEND to PYTHONPATH — the TPU tunnel's sitecustomize lives on it
    # (replacing it orphans JAX_PLATFORMS=axon and the backend init dies)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    assert r.returncode == 0, f"{name} failed"
    lines = [json.loads(l) for l in
             open(os.path.join(out, "metrics.jsonl"))]
    return lines


def smooth(xs: np.ndarray, w: int = 20) -> np.ndarray:
    if len(xs) < w:
        return xs
    k = np.ones(w) / w
    return np.convolve(xs, k, mode="valid")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--grad_rays", type=float, default=0.5)
    p.add_argument("--curriculum",
                   default="CelebA_double_semantic_texture_embedding_256_dim_96")
    p.add_argument("--work", default="/tmp/grad_rays_overlay")
    p.add_argument("--out", default=os.path.join(REPO,
                                                 "GRAD_RAYS_OVERLAY.json"))
    args = p.parse_args()

    data_root = os.path.join(args.work, "data")
    if not os.path.exists(os.path.join(data_root, "celebahq_mask_img")):
        make_data(data_root)
        log(f"synthetic data at {data_root}")

    arms = {
        "full": dict(seed=0, grad_rays=1.0),
        "grad50": dict(seed=0, grad_rays=args.grad_rays),
        "control": dict(seed=1, grad_rays=1.0),
    }
    metrics = {}
    for name, kw in arms.items():
        metrics[name] = run_arm(name, data_root, args.work, args.steps,
                                kw["seed"], kw["grad_rays"], args.curriculum)

    keys = ("fake_opacity", "g_loss", "d_loss")
    summary = {"steps": args.steps, "grad_rays": args.grad_rays,
               "curriculum": args.curriculum}
    for k in keys:
        tr = {n: smooth(np.asarray([m[k] for m in metrics[n]]))
              for n in arms}
        L = min(len(t) for t in tr.values())
        f, g, c = (tr[n][:L] for n in ("full", "grad50", "control"))
        summary[k] = {
            "final_smoothed": {"full": float(f[-1]), "grad50": float(g[-1]),
                               "control": float(c[-1])},
            "max_abs_full_vs_grad50": float(np.abs(f - g).max()),
            "max_abs_full_vs_control": float(np.abs(f - c).max()),
            "mean_abs_full_vs_grad50": float(np.abs(f - g).mean()),
            "mean_abs_full_vs_control": float(np.abs(f - c).mean()),
        }
        summary[k + "_curves"] = {n: [round(float(x), 5) for x in tr[n][:L]]
                                  for n in arms}
    # the pass criterion: grad50 deviates from full no more than ~1.5x the
    # seed-to-seed control spread on the physically-meaningful metric
    op = summary["fake_opacity"]
    summary["verdict_within_spread"] = bool(
        op["mean_abs_full_vs_grad50"]
        <= 1.5 * max(op["mean_abs_full_vs_control"], 1e-3))
    with open(args.out, "w") as fjs:
        json.dump(summary, fjs, indent=1)
        fjs.write("\n")
    print(json.dumps({k: v for k, v in summary.items()
                      if not k.endswith("_curves")}))


if __name__ == "__main__":
    main()
