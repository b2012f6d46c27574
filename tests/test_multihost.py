"""Two-process multihost training test.

Launches two real OS processes, each with 2 virtual CPU devices, connected by
jax.distributed.initialize — a genuine multi-controller SPMD run (the
container-level equivalent of a 2-host TPU pod). Replaces the reference's
mp.spawn + gloo DDP test-by-running (train_double_latent_semantic.py:58-63,
584); the reference has no automated multi-process test at all (SURVEY.md §4).

Asserts both processes complete 2 sharded GAN train steps and end with
IDENTICAL replicated generator state and metrics.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tests", "multihost_runner.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_identical_state(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)       # runner sets its own 2-device flag
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, RUNNER, str(i), "2", str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=720)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"

    r0 = json.load(open(tmp_path / "proc0.json"))
    r1 = json.load(open(tmp_path / "proc1.json"))
    assert r0["step"] == r1["step"] == 2
    # SPMD: both controllers hold bit-identical replicated state
    np.testing.assert_allclose(r0["csum"], r1["csum"], rtol=0, atol=0)
    np.testing.assert_allclose(r0["g_loss"], r1["g_loss"], rtol=0, atol=0)
    np.testing.assert_allclose(r0["d_img_loss"], r1["d_img_loss"],
                               rtol=0, atol=0)
    assert np.isfinite(r0["g_loss"]) and np.isfinite(r0["d_img_loss"])
