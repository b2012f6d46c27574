"""Distill a sustained production-stage training run into SUSTAINED128.json.

VERDICT round-4 item 3 asks for a sustained on-TPU run at the production
128px settings (reference stage: curriculums.py:132-136 — @50k steps the
CelebA_double_semantic_texture_embedding_256_dim_96 curriculum switches to
img 128 / bs 24, and stays there for 450k of the 500k-step schedule): a
64px prelude, the 64->128 crossing, >=2000 steps at 128px with sample
grids / checkpoints / divergence watchdog live, and a record of sustained
imgs/s (vs the 4-iter profile number), stability of fake_opacity and the
losses across the transition, and HBM behavior.

This script parses the run's stdout log (one JSON metrics line per
--log_every steps, plus "[stage] ..." transition lines printed by
fenerf_tpu/apps/train.py) and the output directory, and writes the
artifact the ledger cites. It does NOT touch the device, so it can run
while the trainer owns the chip.

Usage:
  python scripts/sustained_report.py \
      --log output/sustained128.log --run_dir output/sustained128 \
      --boundary 50000 --out SUSTAINED128.json
"""

import argparse
import json
import math
import os
import re
import statistics


def parse_log(path):
    stages, metrics, errors = [], [], []
    stage_re = re.compile(
        r"\[stage\] step=(\d+) img=(\d+) bs=(\d+) steps/ray=(\d+) "
        r"split=(\d+) kernel=(\S+)")
    with open(path) as f:
        for line in f:
            line = line.strip()
            m = stage_re.match(line)
            if m:
                stages.append({
                    "step": int(m.group(1)), "img": int(m.group(2)),
                    "bs": int(m.group(3)), "steps_per_ray": int(m.group(4)),
                    "split": int(m.group(5)), "kernel": m.group(6)})
                continue
            if line.startswith("{"):
                try:
                    metrics.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
                continue
            if "non-finite metrics" in line or "Traceback" in line:
                errors.append(line)
    return stages, metrics, errors


def summarize_rates(rows, skip_first=1):
    """Sustained imgs/s over a stage, skipping compile-contaminated lines.

    The first logged line of a stage folds AOT compile + host barrier into
    its dt (apps/train.py logs rate = log_every*bs/dt since the previous
    line), so it is excluded from the sustained statistic but kept as the
    crossing-cost witness.
    """
    rates = [r["imgs_per_sec"] for r in rows][skip_first:]
    if not rates:
        return None
    return {
        "n_logged": len(rates),
        "imgs_per_sec_median": round(statistics.median(rates), 2),
        "imgs_per_sec_mean": round(statistics.fmean(rates), 2),
        "imgs_per_sec_min": round(min(rates), 2),
        "imgs_per_sec_max": round(max(rates), 2),
    }


def metric_window(rows, keys):
    out = {}
    for k in keys:
        vals = [r[k] for r in rows if k in r]
        if not vals:
            continue
        out[k] = {"mean": round(statistics.fmean(vals), 4),
                  "min": round(min(vals), 6), "max": round(max(vals), 4)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="output/sustained128.log")
    ap.add_argument("--run_dir", default="output/sustained128")
    ap.add_argument("--boundary", type=int, default=50000,
                    help="curriculum 64->128 crossing step")
    ap.add_argument("--profile_ref", type=float, default=5.94,
                    help="the 4-iter PROFILE_TRAIN img128 number to compare")
    ap.add_argument("--out", default="SUSTAINED128.json")
    args = ap.parse_args()

    stages, metrics, errors = parse_log(args.log)
    pre = [r for r in metrics if r["step"] < args.boundary]
    post = [r for r in metrics if r["step"] >= args.boundary]

    nonfinite = sum(
        1 for r in metrics for v in r.values()
        if isinstance(v, float) and not math.isfinite(v))

    # crossing cost: the first 128px line's dt (compile + barrier + the
    # logged steps themselves)
    crossing = None
    if post:
        first = post[0]
        bs = next((s["bs"] for s in stages if s["step"] >= args.boundary), 24)
        if first["imgs_per_sec"] > 0:
            dt = 10 * bs / first["imgs_per_sec"]
            crossing = {"first_line_step": first["step"],
                        "first_line_dt_s": round(dt, 1),
                        "note": "includes 128px AOT compile + stage barrier"}

    # loss stability across the transition: last 20 logged 64px lines vs
    # the first 20 steady 128px lines (skipping the compile line)
    keys = ["fake_opacity", "g_loss", "d_loss", "g_img_loss", "d_img_loss",
            "g_seg_loss", "d_seg_loss"]
    stability = {
        "pre_64px_last20": metric_window(pre[-20:], keys),
        "post_128px_first20": metric_window(post[1:21], keys),
        "post_128px_last20": metric_window(post[-20:], keys),
        "nonfinite_values": nonfinite,
        "watchdog_fired": any("non-finite metrics" in e for e in errors),
    }

    grids = sorted(f for f in os.listdir(args.run_dir) if f.endswith(".png"))
    ckpts = sorted(f for f in os.listdir(args.run_dir) if f.endswith(".npz"))

    hbm = None
    for r in reversed(metrics):
        if "peak_hbm_gb" in r:
            hbm = r["peak_hbm_gb"]
            break

    post_sum = summarize_rates(post)
    report = {
        "what": ("sustained production-stage run: 64px prelude -> 64->128 "
                 "crossing -> >=2000 steps at the 128px stage of record "
                 "(bs24/split4/remat), flagship double-semantic curriculum, "
                 "1 v5e chip via the tunnel"),
        "reference_stage": "curriculums.py:132-136 (@50k: img 128, bs 24)",
        "stages_seen": stages,
        "steps_logged": {"total": len(metrics),
                         "pre_64px": len(pre), "post_128px": len(post)},
        "prelude_64px": summarize_rates(pre),
        "crossing": crossing,
        "stage_128px": post_sum,
        "vs_4iter_profile": (
            None if not post_sum else {
                "profile_imgs_per_sec": args.profile_ref,
                "sustained_imgs_per_sec": post_sum["imgs_per_sec_median"],
                "ratio": round(
                    post_sum["imgs_per_sec_median"] / args.profile_ref, 3)}),
        "stability": stability,
        "errors": errors,
        "artifacts": {"sample_grids": grids, "checkpoints": ckpts},
        "peak_hbm_gb": hbm,
        "hbm_note": ("PJRT memory_stats is not exposed by the tunneled axon "
                     "runtime (train.py probes it best-effort per log line); "
                     "the witness for HBM feasibility is that the stage "
                     "compiles and sustains without OOM at bs24/split4/remat"
                     if hbm is None else "peak_bytes_in_use from PJRT"),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("prelude_64px", "crossing", "stage_128px",
                       "vs_4iter_profile")}, indent=1))
    ok = (not stability["watchdog_fired"] and nonfinite == 0
          and len(post) > 1)
    print("OK" if ok else "PROBLEMS FOUND — read the artifact")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
