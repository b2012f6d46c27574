"""North-star dress rehearsal: the COMPLETE FID protocol end-to-end, today.

The two driver north stars (real FID within 5%, pixel parity vs released
checkpoints) are gated on files a zero-egress container cannot fetch
(InceptionV3 weights, CelebAHQ-Mask, the released .pth). This script proves
every moving part of the FID path with stand-ins so that, when the gated
files land, ONLY two paths change:

  * trains the GAN for a few steps as TWO real jax.distributed processes
    (2 virtual CPU devices each — the container stand-in for a 2-host pod),
  * dumps reals (setup_evaluation) and renders EMA samples through the
    n_hosts=2 `output_images` ROUND-ROBIN (both hosts write disjoint
    interleaved batches into the shared dir — the path only unit-logic
    covered before, reference output_images_double fid_evaluation.py:126-152),
  * scores with the REAL InceptionV3 pool3 forward (nn/inception.py) under
    RANDOM weights exported in the exact $FENERF_INCEPTION_WEIGHTS format,
  * asserts coverage + a finite FID and writes FID_REHEARSAL.json.

Full-scale activation (real weights + dataset present):
  python scripts/activate_eval_stack.py --inception pt_inception...pth
  python scripts/fid_rehearsal.py --data_root <celebahq root> \
      --curriculum CelebA_double_semantic_texture_embedding_256_dim_96 \
      --inception_weights weights/inception.npz \
      --num_real 8000 --num_eval 2048 --train_steps 10000
(the defaults below are CI-sized: same code, small counts).

Reference protocol: fid_evaluation.py:78-162 + trainer hook
train_double_latent_semantic.py:537-555.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import resource
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def synth_data(root: str, n: int) -> None:
    import numpy as np
    from PIL import Image

    os.makedirs(os.path.join(root, "celebahq_mask_img"), exist_ok=True)
    os.makedirs(os.path.join(root, "celebahq_mask_mask"), exist_ok=True)
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:256, 0:256]
    for i in range(n):
        cx, cy = rng.randint(64, 192, 2)
        rad = rng.randint(40, 90)
        face = ((xx - cx) ** 2 + (yy - cy) ** 2) < rad ** 2
        img = np.zeros((256, 256, 3), np.uint8)
        img[face] = rng.randint(80, 200, 3)
        img += (rng.rand(256, 256, 3) * 30).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "celebahq_mask_img", f"{i:04d}.jpg"))
        mask = np.where(face, (yy // 24) % 18 + 1, 0).astype(np.uint8)
        Image.fromarray(mask, mode="L").save(
            os.path.join(root, "celebahq_mask_mask", f"{i:04d}.png"))


def export_random_inception(out_path: str) -> None:
    """Random-weight params in the exact $FENERF_INCEPTION_WEIGHTS flat-npz
    layout (nn/inception.py::export_npz) — the real arch forward runs; only
    the weight values are placeholders."""
    import jax
    import numpy as np

    from fenerf_tpu.nn.inception import init_inception

    params = init_inception(jax.random.key(7))
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(out_path, **flat)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="/tmp/fid_rehearsal")
    p.add_argument("--data_root", default=None,
                   help="real dataset root (default: synthesize)")
    p.add_argument("--curriculum", default="smoke")
    p.add_argument("--train_steps", type=int, default=2)
    p.add_argument("--num_data", type=int, default=24)
    p.add_argument("--num_real", type=int, default=24)
    p.add_argument("--num_eval", type=int, default=48)
    p.add_argument("--inception_weights", default=None,
                   help="real weights .npz (default: export random-weight "
                        "stand-in with the real arch)")
    p.add_argument("--devices_per_host", type=int, default=2)
    p.add_argument("--timeout", type=int, default=2400)
    p.add_argument("--target_size", type=int, default=32,
                   help="dataset/eval render size (driver protocol: 128)")
    p.add_argument("--barrier_timeout_ms", type=int, default=None,
                   help="override FENERF_BARRIER_TIMEOUT_MS in the hosts")
    args = p.parse_args()
    t_wall0 = time.perf_counter()

    # the parent only does tiny jax work (random-weight export) — keep it
    # off the TPU so the rehearsal never contends with a real device job
    import jax

    jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out_dir, exist_ok=True)
    data_root = args.data_root
    if data_root is None:
        data_root = os.path.join(args.out_dir, "data")
        synth_data(data_root, args.num_data)
    t_data = time.perf_counter() - t_wall0

    weights = args.inception_weights
    if weights is None:
        weights = os.path.join(args.out_dir, "inception_random.npz")
        export_random_inception(weights)

    run_dir = os.path.join(args.out_dir, "run")
    port = free_port()
    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)
    env_base["JAX_PLATFORMS"] = "cpu"
    # the TPU-tunnel sitecustomize pins JAX_PLATFORMS too late to override
    # via env; train.py honors this explicit force (see apps/train.py)
    env_base["FENERF_FORCE_PLATFORM"] = "cpu"
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_host}")
    env_base["FENERF_INCEPTION_WEIGHTS"] = weights
    env_base["PYTHONPATH"] = REPO + os.pathsep + env_base.get("PYTHONPATH", "")
    if args.barrier_timeout_ms is not None:
        env_base["FENERF_BARRIER_TIMEOUT_MS"] = str(args.barrier_timeout_ms)

    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "fenerf_tpu.apps.train",
            "--curriculum", args.curriculum, "--global_batch",
            "--output_dir", run_dir, "--data_root", data_root,
            "--total_steps", str(args.train_steps),
            "--eval_freq", str(args.train_steps),
            "--num_real_imgs", str(args.num_real),
            "--num_eval_imgs", str(args.num_eval),
            "--sample_interval", "0", "--model_save_interval", "0",
            "--log_every", "1",
            "--field_overrides", '{"hidden_dim":16,"map_hidden_dim":16}',
            # default target_size 32 keeps CPU eval renders CI-sized; the
            # driver protocol's 128 comes from the curriculum at full scale
            # (or --target_size 128 for the protocol-scale rehearsal)
            "--stage_overrides",
            '{"latent_geo_dim":8,"latent_app_dim":8,'
            f'"target_size":{args.target_size}}}',
            "--multihost", "--coordinator", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(pid),
        ]
        procs.append(subprocess.Popen(
            cmd, env=env_base, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise SystemExit("rehearsal timed out")
        outs.append(out)
    for i, out in enumerate(outs):
        with open(os.path.join(args.out_dir, f"host{i}.log"), "w") as f:
            f.write(out)
        sys.stderr.write(f"---- host {i} tail ----\n{out[-3000:]}\n")
    for i, pr in enumerate(procs):
        if pr.returncode != 0:
            raise SystemExit(f"host {i} failed rc={pr.returncode}")

    # ---- assertions: round-robin coverage + a finite FID ------------------
    gen_dir = os.path.join(run_dir, "evaluation/generated")
    real_dir = os.path.join(run_dir, "evaluation/real")
    gen_pngs = sorted(glob.glob(os.path.join(gen_dir, "*.png")))
    real_pngs = sorted(glob.glob(os.path.join(real_dir, "*.png")))
    assert len(gen_pngs) == args.num_eval, (len(gen_pngs), args.num_eval)
    assert len(real_pngs) == min(args.num_real, args.num_data), len(real_pngs)
    idxs = sorted(int(os.path.basename(f)[:-4]) for f in gen_pngs)
    assert idxs == list(range(args.num_eval)), "round-robin left holes"

    fid_txt = os.path.join(run_dir, "fid.txt")
    assert os.path.exists(fid_txt), "host 0 never wrote fid.txt"
    lines = [ln for ln in open(fid_txt).read().split("\n") if ln.strip()]
    step, fid = lines[-1].split(":")
    fid = float(fid)
    assert fid == fid and abs(fid) != float("inf"), fid

    # per-host eval phase wall-clocks from the [eval-t] lines (apps/train.py)
    phases = []
    for out in outs:
        ph = {}
        for k, v in re.findall(r"\[eval-t\] (\w+)=([0-9.]+)", out):
            ph[k] = float(v)
        phases.append(ph)
    # host 1's barrier wait IS the host skew (host 0's reals dump + FID
    # scoring tail); the deadline holds iff every wait < the timeout
    deadline_ms = args.barrier_timeout_ms if args.barrier_timeout_ms \
        is not None else int(os.environ.get("FENERF_BARRIER_TIMEOUT_MS",
                                            1_200_000))
    max_wait = max((p.get("barrier_wait_s", 0.0) for p in phases),
                   default=0.0)
    ru = resource.getrusage(resource.RUSAGE_CHILDREN)

    artifact = {
        "fid": fid, "eval_step": int(step),
        "num_real": len(real_pngs), "num_eval": len(gen_pngs),
        "eval_px": args.target_size,
        "hosts": 2, "devices_per_host": args.devices_per_host,
        "curriculum": args.curriculum,
        "inception": ("REAL arch, random weights (stand-in)"
                      if args.inception_weights is None else weights),
        "synthetic_data": args.data_root is None,
        "wall_s": round(time.perf_counter() - t_wall0, 1),
        "synth_data_s": round(t_data, 1),
        "peak_child_rss_mb": round(ru.ru_maxrss / 1024.0, 1),
        "eval_phases_per_host": phases,
        "barrier": {
            "deadline_ms": deadline_ms,
            "max_wait_s": max_wait,
            "held": max_wait * 1000.0 < deadline_ms,
            "margin_s": round(deadline_ms / 1000.0 - max_wait, 1),
            # the production default (train/sharding.py host_barrier) — the
            # question a protocol-scale run answers on any given hardware
            "default_20min_would_hold": max_wait * 1000.0 < 1_200_000,
        },
        "note": "mechanism rehearsal; FID value meaningless until real "
                "weights+data replace the stand-ins (same command, two "
                "flags)",
    }
    with open(os.path.join(REPO, "FID_REHEARSAL.json"), "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
