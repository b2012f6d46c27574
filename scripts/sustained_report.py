"""Distill a sustained production-stage training run into SUSTAINED128.json.

VERDICT round-4 item 3 asks for a sustained on-TPU run at the production
128px settings (reference stage: curriculums.py:132-136 — @50k steps the
CelebA_double_semantic_texture_embedding_256_dim_96 curriculum switches to
img 128 / bs 24, and stays there for 450k of the 500k-step schedule): a
64px prelude, the 64->128 crossing, >=2000 steps at 128px with sample
grids / checkpoints / divergence watchdog live, and a record of sustained
imgs/s (vs the 4-iter profile number), stability of fake_opacity and the
losses across the transition, and HBM behavior.

This script parses the run's stdout log(s) (one JSON metrics line per
--log_every steps, plus "[stage] ..." transition and "resumed from ..."
lines printed by fenerf_tpu/apps/train.py) and the output directory, and
writes the artifact the ledger cites. It does NOT touch the device, so it
can run while the trainer owns the chip.

Pass --log more than once (in chronological order) when the run was
resumed from a checkpoint mid-way: steps re-trained after a resume are
deduped (the resumed lineage — the one that produced the final checkpoint
— wins), and each restart is recorded in the artifact as a
checkpoint/resume witness, including how many steps the dead process had
trained beyond the checkpoint it was resumed from.

Usage:
  python scripts/sustained_report.py \
      --log output/sustained128.log --log output/sustained128_resume.log \
      --run_dir output/sustained128 --boundary 50000 --out SUSTAINED128.json
"""

import argparse
import json
import math
import os
import re
import statistics


STAGE_RE = re.compile(
    r"\[stage\] step=(\d+) img=(\d+) bs=(\d+) steps/ray=(\d+) "
    r"split=(\d+) kernel=(\S+)")
RESUME_RE = re.compile(r"resumed from (\S+) at step (\d+)")


def parse_log(path):
    """One process's stdout -> (stages, metrics, errors, resume_step).

    `contaminated` marks metric lines whose logged rate folds AOT compile
    (+ host barrier) into its dt: the process's first line, and the first
    line after any in-process stage transition (apps/train.py logs
    rate = log_every*bs/dt since the previous line).
    """
    stages, metrics, errors = [], [], []
    resume_step = None
    fresh_program = True  # next metric line folds a compile into its dt
    with open(path) as f:
        for line in f:
            line = line.strip()
            m = STAGE_RE.match(line)
            if m:
                stages.append({
                    "step": int(m.group(1)), "img": int(m.group(2)),
                    "bs": int(m.group(3)), "steps_per_ray": int(m.group(4)),
                    "split": int(m.group(5)), "kernel": m.group(6)})
                fresh_program = True
                continue
            m = RESUME_RE.search(line)
            if m:
                resume_step = int(m.group(2))
                continue
            if line.startswith("{"):
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                row["_contaminated"] = fresh_program
                fresh_program = False
                metrics.append(row)
                continue
            if "non-finite metrics" in line or "Traceback" in line:
                errors.append(line)
    return stages, metrics, errors, resume_step


def load_supervisor_reasons(events_paths):
    """apps/supervise.py events jsonl -> {attempt_log_basename: reason}
    for each relaunch, so restarts can carry their DETECTED cause
    (stall_kill with idle seconds / crash rc) instead of an inference."""
    reasons = {}
    pending = None
    for path in events_paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("event") == "relaunching":
                    pending = ev.get("reason")
                elif ev.get("event") == "launched" and pending is not None:
                    reasons[os.path.basename(ev["log"])] = pending
                    pending = None
    return reasons


def merge_logs(parsed, reasons=None):
    """Chronological per-process parses -> one deduped step history.

    At each step the LAST process to train it wins (that is the lineage
    the final checkpoint descends from); the overridden tail of a dead
    process is recorded as a restart witness, not silently dropped.
    """
    by_step = {}
    stages, errors, restarts = [], [], []
    prev_last = None
    for i, (path, (st, mets, errs, resume_step)) in enumerate(parsed):
        if i > 0:
            base = os.path.basename(path)
            reason = (reasons or {}).get(base)
            restarts.append({
                "log": base,
                "resumed_from_step": resume_step,
                "dead_process_last_step": prev_last,
                "steps_retrained": (
                    None if resume_step is None or prev_last is None
                    else max(0, prev_last - resume_step)),
                "note": (f"supervisor relaunch: {reason}" if reason else
                         "previous process ended without a traceback in its "
                         "log (external termination); training resumed from "
                         "the last periodic checkpoint"),
            })
        for s in st:
            if not any(x["step"] == s["step"] and x["img"] == s["img"]
                       for x in stages):
                stages.append(s)
        for row in mets:
            by_step[row["step"]] = row
        errors.extend(errs)
        if mets:
            prev_last = mets[-1]["step"]
    merged = [by_step[k] for k in sorted(by_step)]
    stages.sort(key=lambda s: s["step"])
    return stages, merged, errors, restarts


def summarize_rates(rows):
    """Sustained imgs/s over a stage, skipping compile-contaminated lines
    (marked by parse_log; kept in the history as crossing witnesses)."""
    rates = [r["imgs_per_sec"] for r in rows if not r.get("_contaminated")]
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
    ap.add_argument("--log", action="append", default=None,
                    help="trainer stdout log; repeat in chronological order "
                         "if the run was resumed across processes")
    ap.add_argument("--run_dir", default="output/sustained128")
    ap.add_argument("--boundary", type=int, default=50000,
                    help="curriculum 64->128 crossing step")
    ap.add_argument("--profile_ref", type=float, default=5.94,
                    help="the 4-iter PROFILE_TRAIN img128 number to compare")
    ap.add_argument("--events", action="append", default=None,
                    help="apps/supervise.py <log>.events.jsonl file(s); "
                         "annotates restarts with their detected cause")
    ap.add_argument("--out", default="SUSTAINED128.json")
    args = ap.parse_args()
    logs = args.log or ["output/sustained128.log"]

    parsed = [(p, parse_log(p)) for p in logs]
    reasons = load_supervisor_reasons(args.events or [])
    stages, metrics, errors, restarts = merge_logs(parsed, reasons)
    pre = [r for r in metrics if r["step"] < args.boundary]
    post = [r for r in metrics if r["step"] >= args.boundary]

    nonfinite = sum(
        1 for r in metrics for k, v in r.items()
        if k != "_contaminated" and isinstance(v, float)
        and not math.isfinite(v))

    # crossing cost: the first 128px line's dt in the process that crossed
    # the boundary mid-log (compile + barrier + the logged steps themselves)
    crossing = None
    for path, (st, mets, _e, _r) in parsed:
        ppre = [r for r in mets if r["step"] < args.boundary]
        ppost = [r for r in mets if r["step"] >= args.boundary]
        if not (ppre and ppost):
            continue
        first = ppost[0]
        bs = next((s["bs"] for s in st if s["step"] >= args.boundary), 24)
        if first["imgs_per_sec"] > 0:
            dt = 10 * bs / first["imgs_per_sec"]
            crossing = {"first_line_step": first["step"],
                        "first_line_dt_s": round(dt, 1),
                        "log": os.path.basename(path),
                        "note": "includes 128px AOT compile + stage barrier"}
        break

    # loss stability across the transition: last 20 logged 64px lines vs
    # the first 20 steady 128px lines (skipping compile-contaminated lines)
    keys = ["fake_opacity", "g_loss", "d_loss", "g_img_loss", "d_img_loss",
            "g_seg_loss", "d_seg_loss"]
    post_steady = [r for r in post if not r.get("_contaminated")]
    stability = {
        "pre_64px_last20": metric_window(pre[-20:], keys),
        "post_128px_first20": metric_window(post_steady[:20], keys),
        "post_128px_last20": metric_window(post_steady[-20:], keys),
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
        "logs": [os.path.basename(p) for p in logs],
        "restarts": restarts,
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
                       "vs_4iter_profile", "restarts")}, indent=1))
    ok = (not stability["watchdog_fired"] and nonfinite == 0
          and len(post_steady) > 0)
    print("OK" if ok else "PROBLEMS FOUND — read the artifact")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
