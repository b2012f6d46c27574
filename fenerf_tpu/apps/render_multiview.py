"""Multiview portrait renderer CLI.

Reference: /root/reference/render_multiview_images_double_semantic.py —
loads generator + EMA, renders each seed at 5 yaw angles
(h_mean +- {0, 0.25, 0.5}) with psi truncation, saves an RGB grid and a
palette-colorized segmentation grid per seed.

Usage:
  python -m fenerf_tpu.apps.render_multiview --ckpt out/generator.npz \
      --seeds 0 1 2 3 --output_dir imgs --image_size 256
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--output_dir", default="imgs")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--num_steps", type=int, default=24)
    p.add_argument("--ray_step_multiplier", type=int, default=2)
    p.add_argument("--psi", type=float, default=0.7)
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_ema", dest="use_ema", action="store_false")
    p.add_argument("--ray_chunk", type=int, default=4096)
    p.add_argument("--fov", type=float, default=12.0)
    p.add_argument("--fill_color", default="black",
                   choices=["black", "white", "grey", "light_grey"])
    p.add_argument("--fill_mode", default="seg_padding_background")
    p.add_argument("--shard_rays", action="store_true",
                   help="split each image's rays across all visible devices "
                        "(ray-parallel shard_map — the NeRF analogue of "
                        "context parallelism, SURVEY.md §5); both families; "
                        "img_size must divide by the device count")
    p.add_argument("--z_file", default=None,
                   help="npz with z_geo (S, d) [and z_app]: --seeds index "
                        "rows instead of seeding the RNG (render specific "
                        "latents, e.g. inverted ones; also the "
                        "released-checkpoint parity harness)")
    p.add_argument("--deterministic", action="store_true",
                   help="hierarchical sampling + ray jitter off, f32 "
                        "compute: reproducible parity/debug mode")
    p.add_argument("--hd", action="store_true",
                   help="HD path: volumetric features + the checkpoint's "
                        "stored neural-renderer upsampler heads "
                        "(StyleGenerator3d, generators.py:914-1018); "
                        "--image_size is the UPSAMPLED output size")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fenerf_tpu.apps.common import (best_backend, load_generator,
                                        load_neural_renderers)
    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields
    from fenerf_tpu.utils.image import mask2color, make_grid, save_png, to_uint8

    params, ema, _, fcfg, config = load_generator(args.ckpt)
    if args.use_ema:
        params = ema
    os.makedirs(args.output_dir, exist_ok=True)
    is_grid = config.get("family", "film") == "grid"
    if is_grid and args.fill_mode == "seg_padding_background":
        args.fill_mode = "eval_white_back"  # grid family is RGB-only

    # reference default budget: num_steps x multiplier COARSE samples plus
    # an equal hierarchical fine pass (48 + 48 = 96 total at the defaults,
    # render_multiview_images_double_semantic.py:44 + generators.py:452-527)
    steps = args.num_steps * args.ray_step_multiplier
    yaw_offsets = [-0.5, -0.25, 0.0, 0.25, 0.5]

    nrs = {}
    render_size = args.image_size
    if args.hd:
        assert not is_grid and not args.shard_rays, \
            "--hd is a film-family, single-program path"
        nrs = load_neural_renderers(args.ckpt)
        assert "nr_img" in nrs, \
            f"{args.ckpt} stores no neural-renderer heads (--hd needs a " \
            "converted HD checkpoint)"
        nr_cfg = nrs["nr_img"][1]
        up = nr_cfg.img_size // nr_cfg.input_size
        assert args.image_size % up == 0, (args.image_size, up)
        render_size = args.image_size // up  # feature-map resolution

    rcfg = gen.RenderConfig(
        img_size=render_size, num_steps=steps,
        hierarchical=not args.deterministic, perturb=not args.deterministic,
        fill_mode=None if args.hd else args.fill_mode,
        fill_color=args.fill_color, fov=args.fov,
        ray_chunk=args.ray_chunk,
        compute_dtype="float32" if args.deterministic else "bfloat16",
        backend=best_backend(fcfg),
    )

    if is_grid:
        # latent-grid family: no W-space truncation (its film is per-point;
        # reference generate_avg_frequencies doesn't apply to SPATIALSIRENGRID)
        if args.shard_rays:
            from fenerf_tpu.train import sharding

            mesh = sharding.data_mesh()
            n_dev = mesh.shape["data"]
            assert args.image_size % n_dev == 0, (
                f"--shard_rays: image_size {args.image_size} not divisible "
                f"by {n_dev} devices")
            print(f"[shard_rays] {n_dev} devices, "
                  f"{args.image_size // n_dev} rows/device")

            @jax.jit
            def render_one(params, z_geo, z_app, yaw):
                camera = (jnp.asarray(math.pi * 0.5), yaw,
                          jnp.asarray(args.fov))
                return gen.render_grid_sharded(
                    params, fcfg, rcfg, jax.random.key(0), z_geo, mesh,
                    camera, noise_std=0.0)
        else:
            @jax.jit
            def render_one(params, z_geo, z_app, yaw):
                camera = (jnp.asarray(math.pi * 0.5), yaw,
                          jnp.asarray(args.fov))
                out = gen.render_grid_from_z(params, fcfg, rcfg,
                                             jax.random.key(0), z_geo,
                                             noise_std=0.0, camera=camera)
                return out["pixels"]
    elif args.shard_rays:
        from fenerf_tpu.train import sharding

        mesh = sharding.data_mesh()
        n_dev = mesh.shape["data"]
        assert args.image_size % n_dev == 0, (
            f"--shard_rays: image_size {args.image_size} not divisible by "
            f"{n_dev} devices")
        print(f"[shard_rays] {n_dev} devices, "
              f"{args.image_size // n_dev} rows/device")
        avg = fields.avg_film(params, fcfg, jax.random.key(42))

        @jax.jit
        def render_one(params, z_geo, z_app, yaw):
            camera = (jnp.asarray(math.pi * 0.5), yaw, jnp.asarray(args.fov))
            film_geo, film_app = fields.field_film(params, fcfg, z_geo, z_app)
            film_geo = fields.truncate_film(film_geo, avg[0], args.psi)
            film_app = fields.truncate_film(film_app, avg[1], args.psi)
            return gen.render_image_sharded(
                params, fcfg, rcfg, jax.random.key(0), film_geo, film_app,
                mesh, camera, batch_size=z_geo.shape[0], noise_std=0.0)
    else:
        avg = fields.avg_film(params, fcfg, jax.random.key(42))

        @jax.jit
        def render_one(params, z_geo, z_app, yaw):
            camera = (jnp.asarray(math.pi * 0.5), yaw, jnp.asarray(args.fov))
            film_geo, film_app = fields.field_film(params, fcfg, z_geo, z_app)
            film_geo = fields.truncate_film(film_geo, avg[0], args.psi)
            film_app = fields.truncate_film(film_app, avg[1], args.psi)
            if args.hd:
                nr_seg = nrs.get("nr_seg", (None, None))
                out = gen.render_hd(
                    params, fcfg, rcfg, jax.random.key(0), film_geo,
                    film_app, batch_size=z_geo.shape[0],
                    nr_img_params=nrs["nr_img"][0], nr_img_cfg=nrs["nr_img"][1],
                    nr_seg_params=nr_seg[0], nr_seg_cfg=nr_seg[1],
                    noise_std=0.0, camera=camera)
            else:
                out = gen.render(params, fcfg, rcfg, jax.random.key(0),
                                 film_geo, film_app,
                                 batch_size=z_geo.shape[0],
                                 noise_std=0.0, camera=camera)
            return out["pixels"]

    zfile = np.load(args.z_file) if args.z_file else None
    for seed in args.seeds:
        if zfile is not None:
            z_geo = jnp.asarray(zfile["z_geo"][seed:seed + 1])
            za_src = zfile["z_app"] if "z_app" in zfile else zfile["z_geo"]
            z_app = jnp.asarray(za_src[seed:seed + 1])
        else:
            k = jax.random.key(seed)
            kg, ka = jax.random.split(k)
            z_geo = jax.random.normal(kg, (1, fcfg.z_geo_dim))
            z_app = jax.random.normal(ka, (1, fcfg.z_app_dim))
        rgbs, segs = [], []
        for off in yaw_offsets:
            pix = np.asarray(render_one(params, z_geo, z_app,
                                        jnp.asarray(math.pi * 0.5 + off)))
            rgbs.append(pix[0, -3:])
            has_seg = ("nr_seg" in nrs) if args.hd else bool(fcfg.n_labels)
            if has_seg and not is_grid:
                segs.append(mask2color(pix[:, :-3])[0])
        grid = make_grid(
            to_uint8(np.stack(rgbs), normalize=True).transpose(0, 2, 3, 1),
            nrow=len(yaw_offsets),
        )
        save_png(os.path.join(args.output_dir, f"img_{seed}.png"), grid)
        if segs:
            save_png(os.path.join(args.output_dir, f"seg_{seed}.png"),
                     make_grid(np.stack(segs), nrow=len(yaw_offsets)))
        print(f"seed {seed}: wrote {len(yaw_offsets)} views")


if __name__ == "__main__":
    main()
