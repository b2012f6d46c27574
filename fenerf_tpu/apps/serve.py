"""Persistent render server: one compiled program serving HTTP requests.

The reference has no serving story — every render script reloads the model
and recompiles per invocation (render_multiview_images_double_semantic.py
loads the .pth and builds the graph each run). For production serving on a
TPU the right shape is the opposite: load the checkpoint ONCE, jit ONE
render program with the camera (pitch, yaw, fov) and truncation psi as
traced scalars, warm it at startup, then serve every request from the same
compiled executable — request latency is pure device time plus PNG encode.

Endpoints (stdlib ThreadingHTTPServer, zero dependencies):
  GET /                 tiny interactive page (seed / yaw / pitch / psi)
  GET /render?seed=0&yaw=0&pitch=0&psi=0.7&kind=rgb|seg|depth   -> image/png
  GET /meta             model/config JSON (family, step, sizes)
  GET /healthz          liveness probe -> {"ok": true}

Device access is serialized with a lock: requests share one TPU grant, so
concurrency buys nothing below the device level (batch multiple seeds into
one request's grid instead).

Usage:
  python -m fenerf_tpu.apps.serve --ckpt output/run/generator.npz \
      [--port 8798] [--image_size 128] [--num_steps 24]
"""
from __future__ import annotations

import argparse
import io
import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>FENeRF render server</title><style>
body { font-family: sans-serif; margin: 16px; background: #222; color: #eee }
input { width: 70px } img { border: 1px solid #888; margin: 4px }
</style></head><body>
<h3>FENeRF render server</h3>
<div>
 seed <input id="seed" type="number" value="0">
 yaw <input id="yaw" type="number" value="0" step="0.1">
 pitch <input id="pitch" type="number" value="0" step="0.05">
 psi <input id="psi" type="number" value="0.7" step="0.1">
 <button onclick="go()">render</button> <span id="ms"></span>
</div>
<div><img id="rgb"><img id="seg"></div>
<script>
function go() {
  const q = ['seed','yaw','pitch','psi']
    .map(k => k + '=' + document.getElementById(k).value).join('&');
  const t0 = performance.now();
  const rgb = document.getElementById('rgb');
  rgb.onload = () => document.getElementById('ms').textContent =
      Math.round(performance.now() - t0) + ' ms';
  rgb.src = 'render?kind=rgb&' + q + '&t=' + Date.now();
  document.getElementById('seg').src = 'render?kind=seg&' + q + '&t=' + Date.now();
}
go();
</script></body></html>"""


def build_renderer(ckpt: str, image_size: int, num_steps: int,
                   ray_step_multiplier: int, fov: float, fill_mode: str,
                   fill_color: str, ray_chunk: int, use_ema: bool,
                   shard_rays: bool = False, batch: int = 1,
                   batch_wait_ms: float = 5.0):
    """-> (render_np(seed, yaw, pitch, psi) -> (C,H,W) float array, meta).

    batch > 1 enables MICRO-BATCHED serving: concurrent requests are queued
    and rendered together through ONE compiled batch-shaped program (padded
    to `batch`), so the per-dispatch latency (~9-30 ms on the tunneled
    runtime) and the per-program fixed cost amortize across requests — the
    measured chip rate (~450K rays/s) supports ~27 128² frames/s but batch-1
    serving is dispatch-bound (PROFILE_SERVE.json). Cameras/psis are
    per-request: the render path takes (B,1) pitch/yaw/psi arrays.
    Caveat: batched renders are not bit-reproducible across batch
    compositions (the stratified-jitter / importance-sampling draws are
    batch-shaped, so a request's noise depends on its row); batch=1 keeps
    the strict same-request-same-pixels property the tests pin."""
    import jax
    import jax.numpy as jnp

    from fenerf_tpu.apps.common import best_backend, load_generator
    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields

    params, ema, _, fcfg, config = load_generator(ckpt)
    if use_ema:
        params = ema
    is_grid = config.get("family", "film") == "grid"
    if is_grid and fill_mode == "seg_padding_background":
        fill_mode = "eval_white_back"  # grid family is RGB-only
    steps = num_steps * ray_step_multiplier
    rcfg = gen.RenderConfig(
        img_size=image_size, num_steps=steps, hierarchical=True,
        perturb=True, fill_mode=fill_mode, fill_color=fill_color, fov=fov,
        ray_chunk=ray_chunk, compute_dtype="bfloat16",
        backend=best_backend(fcfg) if not is_grid else "xla",
    )

    if batch > 1:
        assert not shard_rays, "--batch and --shard_rays are exclusive"
        if is_grid:
            @jax.jit
            def render_many(z_geo, z_app, pitch, yaw, psi):
                camera = (math.pi * 0.5 + pitch, math.pi * 0.5 + yaw,
                          jnp.asarray(fov))
                out = gen.render_grid_from_z(params, fcfg, rcfg,
                                             jax.random.key(0), z_geo,
                                             noise_std=0.0, camera=camera)
                return out["pixels"], out["depth"]
        else:
            avg = fields.avg_film(params, fcfg, jax.random.key(42))

            @jax.jit
            def render_many(z_geo, z_app, pitch, yaw, psi):
                camera = (math.pi * 0.5 + pitch, math.pi * 0.5 + yaw,
                          jnp.asarray(fov))
                fg, fa = fields.field_film(params, fcfg, z_geo, z_app)
                fg = fields.truncate_film(fg, avg[0], psi)
                fa = fields.truncate_film(fa, avg[1], psi)
                out = gen.render(params, fcfg, rcfg, jax.random.key(0),
                                 fg, fa, batch_size=batch,
                                 noise_std=0.0, camera=camera)
                return out["pixels"], out["depth"]

        render_np = _make_batcher(render_many, fcfg, batch, batch_wait_ms)
        meta = {"model": config.get("model"), "family": config.get("family"),
                "step": config.get("step"), "image_size": image_size,
                "num_steps": steps,
                "n_labels": int(getattr(fcfg, "n_labels", 0) or 0),
                "ema": bool(use_ema), "batch": batch}
        return render_np, meta

    if is_grid and shard_rays:
        from fenerf_tpu.train import sharding

        mesh = sharding.data_mesh()
        n_dev = mesh.shape["data"]
        assert image_size % n_dev == 0, (
            f"--shard_rays: image_size {image_size} not divisible by "
            f"{n_dev} devices")

        @jax.jit
        def render_jit(z_geo, z_app, pitch, yaw, psi):
            camera = (math.pi * 0.5 + pitch, math.pi * 0.5 + yaw,
                      jnp.asarray(fov))
            pixels, depth = gen.render_grid_sharded(
                params, fcfg, rcfg, jax.random.key(0), z_geo, mesh, camera,
                noise_std=0.0, return_depth=True)
            return pixels, depth
    elif is_grid:
        @jax.jit
        def render_jit(z_geo, z_app, pitch, yaw, psi):
            camera = (math.pi * 0.5 + pitch, math.pi * 0.5 + yaw,
                      jnp.asarray(fov))
            out = gen.render_grid_from_z(params, fcfg, rcfg,
                                         jax.random.key(0), z_geo,
                                         noise_std=0.0, camera=camera)
            return out["pixels"], out["depth"]
    elif shard_rays:
        from fenerf_tpu.train import sharding

        mesh = sharding.data_mesh()
        n_dev = mesh.shape["data"]
        assert image_size % n_dev == 0, (
            f"--shard_rays: image_size {image_size} not divisible by "
            f"{n_dev} devices")
        avg = fields.avg_film(params, fcfg, jax.random.key(42))

        @jax.jit
        def render_jit(z_geo, z_app, pitch, yaw, psi):
            camera = (math.pi * 0.5 + pitch, math.pi * 0.5 + yaw,
                      jnp.asarray(fov))
            film_geo, film_app = fields.field_film(params, fcfg, z_geo, z_app)
            film_geo = fields.truncate_film(film_geo, avg[0], psi)
            film_app = fields.truncate_film(film_app, avg[1], psi)
            pixels, depth = gen.render_image_sharded(
                params, fcfg, rcfg, jax.random.key(0), film_geo, film_app,
                mesh, camera, batch_size=1, noise_std=0.0, return_depth=True)
            return pixels, depth
    else:
        avg = fields.avg_film(params, fcfg, jax.random.key(42))

        @jax.jit
        def render_jit(z_geo, z_app, pitch, yaw, psi):
            camera = (math.pi * 0.5 + pitch, math.pi * 0.5 + yaw,
                      jnp.asarray(fov))
            film_geo, film_app = fields.field_film(params, fcfg, z_geo, z_app)
            film_geo = fields.truncate_film(film_geo, avg[0], psi)
            film_app = fields.truncate_film(film_app, avg[1], psi)
            out = gen.render(params, fcfg, rcfg, jax.random.key(0),
                             film_geo, film_app, batch_size=1,
                             noise_std=0.0, camera=camera)
            return out["pixels"], out["depth"]

    def render_np(seed: int, yaw: float, pitch: float, psi: float):
        # host-side z draws (numpy): a jax.random draw here is a device
        # dispatch, and the ~9-30 ms tunnel latency per dispatch stacks up
        # under concurrent serving (2 draws/request serialized on the chip)
        zg, za = _seed_latents(seed, fcfg)
        pix, depth = render_jit(zg[None], za[None],
                                jnp.asarray(float(pitch)),
                                jnp.asarray(float(yaw)),
                                jnp.asarray(float(psi)))
        return np.asarray(pix[0]), np.asarray(depth[0])

    meta = {"model": config.get("model"), "family": config.get("family"),
            "step": config.get("step"), "image_size": image_size,
            "num_steps": steps, "n_labels": int(getattr(fcfg, "n_labels", 0)
                                                or 0),
            "ema": bool(use_ema)}
    return render_np, meta


def _seed_latents(seed: int, fcfg):
    """Deterministic per-seed latents, drawn on the HOST (numpy) — device
    RNG draws cost a tunnel dispatch each and serialize against renders."""
    rng = np.random.default_rng(int(seed))
    zg = rng.standard_normal(fcfg.z_geo_dim).astype(np.float32)
    za = rng.standard_normal(fcfg.z_app_dim).astype(np.float32)
    return zg, za


def _make_batcher(render_many, fcfg, batch: int, wait_ms: float):
    """Micro-batching collector: requests enqueue; a dispatcher thread drains
    up to `batch` of them (waiting at most wait_ms for stragglers after the
    first), pads to the fixed compiled batch shape by repeating row 0, and
    renders them in ONE dispatch. Returns render_np(seed, yaw, pitch, psi)
    with the single-render signature (it blocks until its row is ready), so
    the HTTP handler code is batching-agnostic."""
    import queue

    q: "queue.Queue" = queue.Queue()

    def worker():
        while True:
            items = [q.get()]
            deadline = time.perf_counter() + wait_ms / 1e3
            while len(items) < batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    items.append(q.get(timeout=left))
                except queue.Empty:
                    break
            n = len(items)
            zg = np.zeros((batch, fcfg.z_geo_dim), np.float32)
            za = np.zeros((batch, fcfg.z_app_dim), np.float32)
            cam = np.zeros((batch, 3), np.float32)  # pitch, yaw, psi
            for i, (req, _slot) in enumerate(items):
                zg[i], za[i], cam[i] = req
            zg[n:], za[n:], cam[n:] = zg[0], za[0], cam[0]  # pad
            try:
                pix, depth = render_many(
                    zg, za, cam[:, 0:1], cam[:, 1:2], cam[:, 2:3])
                pix, depth = np.asarray(pix), np.asarray(depth)
                for i, (_req, slot) in enumerate(items):
                    slot["out"] = (pix[i], depth[i])
                    slot["event"].set()
            except Exception as e:  # deliver the failure, don't wedge callers
                for _req, slot in items:
                    slot["error"] = e
                    slot["event"].set()

    threading.Thread(target=worker, daemon=True).start()

    def render_np(seed: int, yaw: float, pitch: float, psi: float):
        zg, za = _seed_latents(seed, fcfg)
        slot = {"event": threading.Event()}
        q.put(((zg, za, np.asarray([pitch, yaw, psi], np.float32)), slot))
        slot["event"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["out"]

    return render_np


def _encode_png(arr_u8_hw3: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_u8_hw3).save(buf, format="PNG")
    return buf.getvalue()


def make_server(render_np, meta, port: int = 8798, host: str = "127.0.0.1"):
    from fenerf_tpu.utils.image import depth_to_jet, mask2color, to_uint8

    if meta.get("batch", 1) > 1:
        # batched mode: the _make_batcher worker owns ALL device work, so
        # handlers must run concurrently (a handler-side lock would feed the
        # batcher one request at a time and defeat the batching)
        import contextlib

        lock = contextlib.nullcontext()
    else:
        lock = threading.Lock()  # one TPU grant -> serialize device work

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            if u.path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif u.path == "/healthz":
                self._send(200, b'{"ok": true}', "application/json")
            elif u.path == "/meta":
                self._send(200, json.dumps(meta).encode(), "application/json")
            elif u.path == "/render":
                try:
                    seed = int(q.get("seed", "0"))
                    yaw = float(q.get("yaw", "0"))
                    pitch = float(q.get("pitch", "0"))
                    psi = float(q.get("psi", "0.7"))
                    kind = q.get("kind", "rgb")
                    t0 = time.perf_counter()
                    with lock:
                        pix, depth = render_np(seed, yaw, pitch, psi)
                    if kind == "seg" and meta["n_labels"]:
                        img = mask2color(pix[None, :-3])[0]  # (H, W, 3) u8
                    elif kind == "depth":
                        img = depth_to_jet(depth)
                    else:
                        # fixed [-1,1]->[0,255] mapping (same as render_video):
                        # per-frame min-max would make brightness depend on
                        # frame content and flicker across requests
                        img = to_uint8(pix[None, -3:],
                                       normalize=False)[0].transpose(1, 2, 0)
                    body = _encode_png(np.ascontiguousarray(img))
                    ms = (time.perf_counter() - t0) * 1e3
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(body)))
                    self.send_header("X-Render-Ms", f"{ms:.1f}")
                    self.end_headers()
                    self.wfile.write(body)
                except Exception as e:  # bad query -> 400, not a dead server
                    self._send(400, json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}).encode(),
                        "application/json")
            else:
                self._send(404, b"not found", "text/plain")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--port", type=int, default=8798)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--num_steps", type=int, default=24)
    p.add_argument("--ray_step_multiplier", type=int, default=2)
    p.add_argument("--fov", type=float, default=12.0)
    p.add_argument("--fill_mode", default="seg_padding_background")
    p.add_argument("--fill_color", default="black",
                   choices=["black", "white", "grey", "light_grey"])
    p.add_argument("--ray_chunk", type=int, default=4096)
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_ema", dest="use_ema", action="store_false")
    p.add_argument("--shard_rays", action="store_true",
                   help="split each render's rays across all visible "
                        "devices (both families)")
    p.add_argument("--batch", type=int, default=1,
                   help="micro-batch size: >1 renders queued concurrent "
                        "requests through one compiled batch-shaped program "
                        "(per-request camera/psi); amortizes the ~9-30 ms "
                        "per-dispatch latency that dominates batch-1 serving")
    p.add_argument("--batch_wait_ms", type=float, default=5.0,
                   help="how long the batcher waits for stragglers after "
                        "the first queued request")
    args = p.parse_args(argv)

    render_np, meta = build_renderer(
        args.ckpt, args.image_size, args.num_steps, args.ray_step_multiplier,
        args.fov, args.fill_mode, args.fill_color, args.ray_chunk,
        args.use_ema, shard_rays=args.shard_rays, batch=args.batch,
        batch_wait_ms=args.batch_wait_ms)
    t0 = time.perf_counter()
    render_np(0, 0.0, 0.0, 0.7)  # compile + warm before accepting traffic
    print(f"warmed in {time.perf_counter() - t0:.1f}s "
          f"({meta['model']}, step {meta['step']})")
    srv = make_server(render_np, meta, port=args.port, host=args.host)
    print(f"serving on http://{args.host}:{srv.server_address[1]}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
