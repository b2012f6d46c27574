"""scripts/sustained_report.py — parse a production-stage run log into the
SUSTAINED128.json artifact (VERDICT round-4 item 3's record of the sustained
128px run; reference stage: curriculums.py:132-136)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _write_fake_run(tmp_path, diverge=False):
    log = tmp_path / "run.log"
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    lines = [
        "WARNING: platform 'axon' is experimental",
        "[stage] step=49400 img=64 bs=48 steps/ray=24 split=4 "
        "kernel=pallas_train(G)+pallas(D)",
    ]

    def metric(step, rate, opacity=0.5):
        return json.dumps({
            "step": step, "imgs_per_sec": rate, "fake_opacity": opacity,
            "g_loss": 20.0 + 0.01 * (step % 7), "d_loss": 1.5,
            "g_img_loss": 18.0, "d_img_loss": 1.0,
            "g_seg_loss": 2.0, "d_seg_loss": 0.5})

    # prelude: first line carries the 64px compile, then steady ~22
    lines.append(metric(49400, 2.6))
    for s in range(49410, 50000, 10):
        lines.append(metric(s, 22.0 + (s % 3) * 0.1))
    lines.append("[stage] step=50000 img=128 bs=24 steps/ray=24 split=4 "
                 "kernel=pallas_train(G)+pallas(D)")
    # crossing line folds the 128px compile into its dt
    lines.append(metric(50000, 0.54))
    for s in range(50010, 50500, 10):
        lines.append(metric(s, 5.85 + (s % 2) * 0.04))
    if diverge:
        lines.append("non-finite metrics ['g_loss'] at step 50500; state "
                     "saved to train_state_diverged.npz")
    log.write_text("\n".join(lines) + "\n")
    (run_dir / "50000_img_fixed.png").write_bytes(b"png")
    (run_dir / "generator.npz").write_bytes(b"npz")
    (run_dir / "train_state.npz").write_bytes(b"npz")
    return log, run_dir


def _run(logs, run_dir, out):
    if not isinstance(logs, (list, tuple)):
        logs = [logs]
    cmd = [sys.executable, str(REPO / "scripts" / "sustained_report.py"),
           "--run_dir", str(run_dir), "--out", str(out)]
    for log in logs:
        cmd += ["--log", str(log)]
    return subprocess.run(cmd, capture_output=True, text=True)


def test_report_shape_and_rates(tmp_path):
    log, run_dir = _write_fake_run(tmp_path)
    out = tmp_path / "S.json"
    proc = _run(log, run_dir, out)
    assert proc.returncode == 0, proc.stderr
    rep = json.loads(out.read_text())

    # compile-contaminated first lines excluded from the sustained stats
    assert rep["prelude_64px"]["imgs_per_sec_min"] >= 21.9
    assert 5.8 <= rep["stage_128px"]["imgs_per_sec_median"] <= 5.95
    # ... but witnessed in the crossing record (dt = 10*24/0.54 s)
    assert rep["crossing"]["first_line_dt_s"] > 400
    assert rep["vs_4iter_profile"]["ratio"] > 0.9

    assert [s["img"] for s in rep["stages_seen"]] == [64, 128]
    assert rep["stability"]["nonfinite_values"] == 0
    assert rep["stability"]["watchdog_fired"] is False
    assert "50000_img_fixed.png" in rep["artifacts"]["sample_grids"]
    assert "train_state.npz" in rep["artifacts"]["checkpoints"]


def test_report_flags_divergence(tmp_path):
    log, run_dir = _write_fake_run(tmp_path, diverge=True)
    out = tmp_path / "S.json"
    proc = _run(log, run_dir, out)
    assert proc.returncode == 1
    rep = json.loads(out.read_text())
    assert rep["stability"]["watchdog_fired"] is True
    assert rep["errors"]


def test_report_merges_resumed_logs(tmp_path):
    """A run whose first process died silently mid-stage and was resumed
    from the last checkpoint (two stdout logs): steps re-trained after the
    resume are deduped in favor of the resumed lineage, the restart is
    recorded as a checkpoint/resume witness, and both processes'
    compile-contaminated first lines stay out of the sustained statistic."""
    log1, run_dir = _write_fake_run(tmp_path)  # dies after step 50490

    def metric(step, rate):
        return json.dumps({
            "step": step, "imgs_per_sec": rate, "fake_opacity": 0.5,
            "g_loss": 20.0, "d_loss": 1.5, "g_img_loss": 18.0,
            "d_img_loss": 1.0, "g_seg_loss": 2.0, "d_seg_loss": 0.5})

    lines = [
        "WARNING: platform 'axon' is experimental",
        "resumed from run/train_state.npz at step 50000",
        "[stage] step=50000 img=128 bs=24 steps/ray=24 split=4 "
        "kernel=pallas_train(G)+pallas(D)",
        metric(50000, 8.3),  # first line of the new process: compile in dt
    ]
    for s in range(50010, 50800, 10):
        lines.append(metric(s, 5.7))
    log2 = tmp_path / "resume.log"
    log2.write_text("\n".join(lines) + "\n")

    out = tmp_path / "S.json"
    proc = _run([log1, log2], run_dir, out)
    assert proc.returncode == 0, proc.stderr
    rep = json.loads(out.read_text())

    assert rep["restarts"] == [{
        "log": "resume.log", "resumed_from_step": 50000,
        "dead_process_last_step": 50490, "steps_retrained": 490,
        "note": rep["restarts"][0]["note"]}]
    # resumed lineage wins the overlap: all 128px rates are the resume's 5.7
    assert rep["stage_128px"]["imgs_per_sec_min"] == 5.7
    assert rep["stage_128px"]["imgs_per_sec_max"] == 5.7
    # deduped step history: 50000..50790 logged once each
    assert rep["steps_logged"]["post_128px"] == 80
    # the crossing witness still comes from the process that crossed 64->128
    assert rep["crossing"]["log"] == log1.name
    assert rep["crossing"]["first_line_dt_s"] > 400
    assert rep["stability"]["watchdog_fired"] is False


def test_report_annotates_restarts_with_supervisor_reasons(tmp_path):
    """When the run was driven by apps/supervise.py, its events jsonl
    carries the DETECTED relaunch cause; the report attaches it to the
    matching restart instead of the external-termination inference."""
    log1, run_dir = _write_fake_run(tmp_path)

    log2 = tmp_path / "run.log.1"
    log2.write_text("\n".join([
        "resumed from run/train_state.npz at step 50000",
        "[stage] step=50000 img=128 bs=24 steps/ray=24 split=4 "
        "kernel=pallas_train(G)+pallas(D)",
        json.dumps({"step": 50000, "imgs_per_sec": 8.0, "fake_opacity": 0.5,
                    "g_loss": 20.0, "d_loss": 1.5}),
        json.dumps({"step": 50010, "imgs_per_sec": 5.7, "fake_opacity": 0.5,
                    "g_loss": 20.0, "d_loss": 1.5}),
    ]) + "\n")
    events = tmp_path / "run.log.events.jsonl"
    events.write_text("\n".join([
        json.dumps({"event": "launched", "attempt": 0,
                    "log": str(tmp_path / "run.log.0")}),
        json.dumps({"event": "stall_kill", "attempt": 0, "idle_s": 612}),
        json.dumps({"event": "relaunching",
                    "reason": "stall: no progress on metrics.jsonl for 612s",
                    "next_attempt": 1}),
        json.dumps({"event": "launched", "attempt": 1, "log": str(log2)}),
    ]) + "\n")

    out = tmp_path / "S.json"
    cmd = [sys.executable, str(REPO / "scripts" / "sustained_report.py"),
           "--run_dir", str(run_dir), "--out", str(out),
           "--log", str(log1), "--log", str(log2),
           "--events", str(events)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    rep = json.loads(out.read_text())
    assert rep["restarts"][0]["note"] == (
        "supervisor relaunch: stall: no progress on metrics.jsonl for 612s")
