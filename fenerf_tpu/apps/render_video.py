"""Free-viewpoint video with disentangled latent interpolation.

Reference: /root/reference/render_video_interpolation_semantic.py —
camera trajectory (front/orbit/rotation_horizontal/non_rotation/sphere/zoom)
+ geo/app/both/non latent lerp between seed s and s+1 in truncated W space;
writes per-frame image/seg/opacity/depth(jet) and an mp4 triptych.
"""
from __future__ import annotations

import argparse
import math
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--seeds", nargs="+", type=int, default=[0])
    p.add_argument("--output_dir", default="videos")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--num_steps", type=int, default=24)
    p.add_argument("--num_frames", type=int, default=36)
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--psi", type=float, default=0.7)
    p.add_argument("--trajectory", default="front",
                   choices=["front", "orbit", "rotation_horizontal",
                            "rotation_linear", "non_rotation", "sphere",
                            "inverse_sphere", "zoom"])
    p.add_argument("--latent_type", default="geo",
                   choices=["geo", "app", "both", "non"])
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_ema", dest="use_ema", action="store_false")
    p.add_argument("--save_frames", action="store_true")
    p.add_argument("--ray_chunk", type=int, default=4096)
    p.add_argument("--fill_color", default="black",
                   choices=["black", "white", "grey", "light_grey"])
    p.add_argument("--fill_mode", default="eval_seg_padding_background")
    p.add_argument("--shard_rays", action="store_true",
                   help="split each frame's rays across all visible devices "
                        "(ray-parallel shard_map, both families; trajectory "
                        "frames are deterministic-camera renders so the "
                        "sharded path serves them through one program); "
                        "image_size must divide by the device count")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from fenerf_tpu.apps.common import (best_backend, camera_trajectory,
                                        interpolate_films, load_generator)
    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields
    from fenerf_tpu.utils.image import (depth_to_jet, mask2color, save_png,
                                        to_uint8, write_mp4)

    params, ema, _, fcfg, config = load_generator(args.ckpt)
    if args.use_ema:
        params = ema
    os.makedirs(args.output_dir, exist_ok=True)
    is_grid = config.get("family", "film") == "grid"
    if is_grid and args.fill_mode == "eval_seg_padding_background":
        args.fill_mode = "eval_white_back"  # grid family is RGB-only

    rcfg = gen.RenderConfig(
        img_size=args.image_size, num_steps=args.num_steps,
        hierarchical=True, fill_mode=args.fill_mode, fill_color=args.fill_color,
        ray_chunk=args.ray_chunk, compute_dtype="bfloat16",
        backend=best_backend(fcfg),
    )

    mesh = None
    if args.shard_rays:
        from fenerf_tpu.train import sharding

        mesh = sharding.data_mesh()
        n_dev = mesh.shape["data"]
        assert args.image_size % n_dev == 0, (
            f"--shard_rays: image_size {args.image_size} not divisible by "
            f"{n_dev} devices")
        print(f"[shard_rays] {n_dev} devices, "
              f"{args.image_size // n_dev} rows/device")

    if is_grid:
        # grid family: latents interpolate in z space (no W-space truncation;
        # its film activations are per-point). 'geo'/'both' lerp z; 'app'
        # has no separate appearance code -> hold endpoint 1.
        def films_for_seed(seed):
            zg = jax.random.normal(
                jax.random.split(jax.random.key(seed))[0],
                (1, fcfg.z_geo_dim))
            # both slots carry (z, z) pairs so interpolate_films' (f, p)
            # unpacking works unchanged; app slot is unused
            return ((zg, zg), (zg, zg))

        if mesh is not None:
            @jax.jit
            def render_frame(params, film_geo, _film_app, camera):
                pixels, depth = gen.render_grid_sharded(
                    params, fcfg, rcfg, jax.random.key(0), film_geo[0],
                    mesh, camera, noise_std=0.0, return_depth=True)
                return {"pixels": pixels, "depth": depth}
        else:
            @jax.jit
            def render_frame(params, film_geo, _film_app, camera):
                return gen.render_grid_from_z(params, fcfg, rcfg,
                                              jax.random.key(0), film_geo[0],
                                              noise_std=0.0, camera=camera)
    else:
        avg = fields.avg_film(params, fcfg, jax.random.key(42))

        def films_for_seed(seed):
            kg, ka = jax.random.split(jax.random.key(seed))
            zg = jax.random.normal(kg, (1, fcfg.z_geo_dim))
            za = jax.random.normal(ka, (1, fcfg.z_app_dim))
            fg, fa = fields.field_film(params, fcfg, zg, za)
            return (fields.truncate_film(fg, avg[0], args.psi),
                    fields.truncate_film(fa, avg[1], args.psi))

        if mesh is not None:
            @jax.jit
            def render_frame(params, film_geo, film_app, camera):
                pixels, depth = gen.render_image_sharded(
                    params, fcfg, rcfg, jax.random.key(0), film_geo,
                    film_app, mesh, camera, batch_size=1, noise_std=0.0,
                    return_depth=True)
                return {"pixels": pixels, "depth": depth}
        else:
            @jax.jit
            def render_frame(params, film_geo, film_app, camera):
                # camera (pitch, yaw, fov) is traced: one compiled program
                # serves every frame of every trajectory
                return gen.render(params, fcfg, rcfg, jax.random.key(0),
                                  film_geo, film_app, batch_size=1,
                                  noise_std=0.0, camera=camera)

    traj = camera_trajectory(args.trajectory, args.num_frames,
                             base_fov=12.0)

    for seed in args.seeds:
        films1 = films_for_seed(seed)
        films2 = films_for_seed(seed + 1)
        frames = []
        for i, (t, pitch, yaw, fov) in enumerate(traj):
            fg = interpolate_films(films1[0], films2[0], t,
                                   args.latent_type, "geo")
            fa = interpolate_films(films1[1], films2[1], t,
                                   args.latent_type, "app")
            import jax.numpy as jnp
            out = render_frame(params, fg, fa,
                               (jnp.asarray(pitch), jnp.asarray(yaw),
                                jnp.asarray(fov)))
            pix = np.asarray(out["pixels"])[0]
            rgb = to_uint8(pix[-3:], normalize=False).transpose(1, 2, 0)
            panels = [rgb]
            if fcfg.n_labels:
                panels.append(mask2color(pix[None, :-3])[0])
                blend = (0.5 * rgb + 0.5 * panels[1]).astype(np.uint8)
                panels.append(blend)
            depth = depth_to_jet(np.asarray(out["depth"])[0])
            panels.append(depth)
            frame = np.concatenate(panels, axis=1)
            frames.append(frame)
            if args.save_frames:
                save_png(os.path.join(
                    args.output_dir,
                    f"seed{seed}_{args.trajectory}_{args.latent_type}_{i:04d}.png",
                ), frame)
        mp4 = os.path.join(
            args.output_dir,
            f"seed{seed}_{args.trajectory}_{args.latent_type}.mp4")
        write_mp4(mp4, frames, fps=args.fps)
        print(f"wrote {mp4} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
