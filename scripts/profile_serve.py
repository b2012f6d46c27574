"""Measure served frames/s: batch-1 vs micro-batched (apps/serve.py --batch).

Motivation (round-4 verdict Next #7): the chip renders ~450K rays/s =
~27 128² frames/s, but the server dispatched one request at a time and the
~9-30 ms per-dispatch tunnel latency dominates single-frame serving. The
micro-batcher renders queued requests through one compiled batch-shaped
program; this script fires `--requests` concurrent HTTP requests at an
in-process server for each batch setting and records wall-clock frames/s.

Run on TPU: python scripts/profile_serve.py [--image_size 128] [--steps 24]
Writes PROFILE_SERVE.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_ckpt(path: str) -> None:
    import jax

    from fenerf_tpu.apps.common import save_generator
    from fenerf_tpu.nn import fields

    name = "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96"
    cfg = fields.get_config(name)
    params = fields.init_field(jax.random.key(0), cfg)
    save_generator(path, params, params, params, name, step=0,
                   field_kwargs={})


def measure(ckpt: str, image_size: int, num_steps: int, batch: int,
            requests: int, rounds: int) -> dict:
    import jax

    from fenerf_tpu.apps.serve import build_renderer, make_server

    render_np, meta = build_renderer(
        ckpt, image_size=image_size, num_steps=num_steps,
        ray_step_multiplier=1, fov=12.0,
        fill_mode="seg_padding_background", fill_color="black",
        ray_chunk=4096, use_ema=True, batch=batch)
    srv = make_server(render_np, meta, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def get(i):
        with urllib.request.urlopen(
                f"{base}/render?seed={i}&yaw={0.01 * (i % 7)}", timeout=600
        ) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"

    try:
        # warm: compile + first-execution artifact
        with ThreadPoolExecutor(max_workers=requests) as ex:
            for _ in range(3):
                list(ex.map(get, range(requests)))
        best = 0.0
        for _ in range(rounds):
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=requests) as ex:
                list(ex.map(get, range(requests)))
            fps = requests / (time.perf_counter() - t0)
            best = max(best, fps)
            log(f"  batch={batch}: {fps:.2f} frames/s")
    finally:
        srv.shutdown()
        srv.server_close()
    return {"batch": batch, "frames_per_s": round(best, 2)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--requests", type=int, default=48)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--batches", default="1,16")
    p.add_argument("--ckpt", default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/fenerf_jax_cache"))

    ckpt = args.ckpt
    if ckpt is None:
        ckpt = "/tmp/profile_serve_ckpt.npz"
        if not os.path.exists(ckpt):
            make_ckpt(ckpt)

    res = {"image_size": args.image_size, "num_steps": args.steps,
           "requests": args.requests, "platform": jax.default_backend(),
           "rows": []}
    for b in (int(x) for x in args.batches.split(",")):
        log(f"[batch {b}]")
        res["rows"].append(measure(ckpt, args.image_size, args.steps, b,
                                   args.requests, args.rounds))
    with open(os.path.join(REPO, "PROFILE_SERVE.json"), "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
