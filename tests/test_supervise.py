"""apps/supervise.py — failure detection + auto-resume around a trainer.

The reference has NO failure handling (SURVEY.md §5); the supervisor
detects both crashes and live-but-wedged processes (the tunneled runtime
can futex-wait a client forever after its stream drops) and relaunches
the same argv, relying on the trainer's --load_dir checkpoint resume.
Driven here with fake trainers that crash / stall / succeed on schedule.
"""

import json
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _fake_trainer(tmp_path, body):
    """A stand-in trainer whose behavior depends on how many times it has
    been launched (counted in attempts.txt), mirroring a run that fails
    then succeeds after a resume."""
    script = tmp_path / "fake_trainer.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys, time
        d = {str(repr(str(tmp_path)))}
        cnt_f = os.path.join(d, "attempts.txt")
        n = int(open(cnt_f).read()) if os.path.exists(cnt_f) else 0
        open(cnt_f, "w").write(str(n + 1))
        metrics = os.path.join(d, "metrics.jsonl")
        {textwrap.indent(textwrap.dedent(body), ' ' * 8).strip()}
    """))
    return script


def _supervise(tmp_path, script, extra=()):
    log = tmp_path / "run.log"
    return log, subprocess.run(
        [sys.executable, "-m", "fenerf_tpu.apps.supervise",
         "--log", str(log), "--watch", str(tmp_path / "metrics.jsonl"),
         "--stall_s", "2", "--startup_grace_s", "1", "--poll_s", "0.2",
         "--max_restarts", "3", *extra,
         "--", sys.executable, "-S", str(script)],
        capture_output=True, text=True, timeout=120)


def _events(log):
    return [json.loads(l) for l in
            (Path(str(log) + ".events.jsonl")).read_text().splitlines()]


def test_clean_exit_no_restart(tmp_path):
    script = _fake_trainer(tmp_path, """
        open(metrics, "a").write('{"step": 1}\\n')
        print("done")
    """)
    log, proc = _supervise(tmp_path, script)
    assert proc.returncode == 0, proc.stderr
    ev = [e["event"] for e in _events(log)]
    assert ev == ["launched", "done"]
    assert (tmp_path / "attempts.txt").read_text() == "1"
    # the attempt's stdout went to run.log.0
    assert "done" in (tmp_path / "run.log.0").read_text()


def test_crash_then_resume(tmp_path):
    script = _fake_trainer(tmp_path, """
        open(metrics, "a").write('{"step": %d}\\n' % n)
        if n == 0:
            sys.exit(3)   # first attempt crashes (silent kill analogue)
        print("resumed fine")
    """)
    log, proc = _supervise(tmp_path, script)
    assert proc.returncode == 0, proc.stderr
    ev = [e["event"] for e in _events(log)]
    assert ev == ["launched", "exit", "relaunching", "launched", "done"]
    assert [e.get("rc") for e in _events(log) if e["event"] == "exit"] == [3]
    assert (tmp_path / "attempts.txt").read_text() == "2"


def test_stall_killed_and_resumed(tmp_path):
    script = _fake_trainer(tmp_path, """
        open(metrics, "a").write('{"step": %d}\\n' % n)
        if n == 0:
            time.sleep(600)   # wedged dispatch: alive but no progress
        print("resumed fine")
    """)
    log, proc = _supervise(tmp_path, script)
    assert proc.returncode == 0, proc.stderr
    ev = [e["event"] for e in _events(log)]
    assert ev == ["launched", "stall_kill", "relaunching", "launched",
                  "done"]
    assert (tmp_path / "attempts.txt").read_text() == "2"


def test_gives_up_after_max_restarts(tmp_path):
    script = _fake_trainer(tmp_path, "sys.exit(1)")
    log, proc = _supervise(tmp_path, script)
    assert proc.returncode == 1
    ev = [e["event"] for e in _events(log)]
    assert ev[-1] == "giving_up"
    assert ev.count("launched") == 4  # initial + 3 restarts
    assert (tmp_path / "attempts.txt").read_text() == "4"


def test_startup_grace_protects_compile(tmp_path):
    """No progress during the grace window must not be killed — a fresh
    128px stage spends minutes in XLA compile before the first metric."""
    script = _fake_trainer(tmp_path, """
        time.sleep(4)     # longer than stall_s=2, inside grace
        open(metrics, "a").write('{"step": 0}\\n')
        print("compiled and progressed")
    """)
    log = tmp_path / "run.log"
    proc = subprocess.run(
        [sys.executable, "-m", "fenerf_tpu.apps.supervise",
         "--log", str(log), "--watch", str(tmp_path / "metrics.jsonl"),
         "--stall_s", "2", "--startup_grace_s", "8", "--poll_s", "0.2",
         "--max_restarts", "0",
         "--", sys.executable, "-S", str(script)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert [e["event"] for e in _events(log)] == ["launched", "done"]
