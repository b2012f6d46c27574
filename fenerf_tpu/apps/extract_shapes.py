"""3D shape extraction CLI: sigma volume on a voxel lattice -> .mrc.

Reference: /root/reference/extract_double_semantic_shapes.py — 256^3 lattice
over a 0.3 cube, field evaluated with locked view direction (0,0,-1), psi 0.5
truncation, sigma channel written as an .mrc volume (here via the native
MRC2014 writer, fenerf_tpu/utils/mrc.py). Also consumes inversion checkpoints
(freq/phase offsets) like the reference's
sample_generator_wth_frequencies_phase_shifts path (:68-86).
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--seeds", nargs="+", type=int, default=[0])
    p.add_argument("--output_dir", default="shapes")
    p.add_argument("--voxel_resolution", type=int, default=256)
    p.add_argument("--cube_size", type=float, default=0.3)
    p.add_argument("--psi", type=float, default=0.5)
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_ema", dest="use_ema", action="store_false")
    p.add_argument("--inversion_ckpt", default=None,
                   help=".npz of inverted film tensors (apps/invert.py)")
    p.add_argument("--chunk", type=int, default=262144)
    p.add_argument("--export_ply", action="store_true",
                   help="also mesh the sigma volume and write a .ply surface")
    p.add_argument("--mesher", choices=("cubes", "tet"), default="cubes",
                   help="'cubes' = classic marching cubes (the reference "
                        "meshes with skimage marching cubes, "
                        "extract_shapes.py:1-8); 'tet' = marching tetrahedra")
    p.add_argument("--shard_rays", action="store_true",
                   help="shard the voxel lattice across all visible devices "
                        "(shard_map over the point axis; both families)")
    p.add_argument("--iso_level", type=float, default=10.0,
                   help="sigma iso level for the mesh")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fenerf_tpu.apps.common import load_generator
    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields
    from fenerf_tpu.utils.mrc import write_mrc

    params, ema, _, fcfg, config = load_generator(args.ckpt)
    if args.use_ema:
        params = ema
    os.makedirs(args.output_dir, exist_ok=True)
    res = args.voxel_resolution
    pts = gen.voxel_points(res, args.cube_size)

    is_grid = config.get("family", "film") == "grid"

    if args.shard_rays:
        from fenerf_tpu.train import sharding
        mesh = sharding.data_mesh()
        print(f"[shard_rays] lattice over {mesh.shape['data']} devices")
    else:
        mesh = None

    def extract(film_geo, film_app, name, z=None):
        if is_grid and mesh is not None:
            out = gen.eval_volume_grid_sharded(params, fcfg, z, pts, mesh,
                                               chunk=args.chunk)
        elif is_grid:
            out = gen.eval_volume_grid(params, fcfg, z, pts, chunk=args.chunk)
        elif mesh is not None:
            out = gen.eval_volume_sharded(params, fcfg, film_geo, film_app,
                                          pts, mesh, chunk=args.chunk)
        else:
            out = gen.eval_volume(params, fcfg, film_geo, film_app, pts,
                                  chunk=args.chunk)
        sigma = np.asarray(out[:, -1], dtype=np.float32).reshape(res, res, res)
        path = os.path.join(args.output_dir, f"{name}.mrc")
        write_mrc(path, sigma, voxel_size=args.cube_size / res)
        print(f"wrote {path} (sigma in [{sigma.min():.2f}, {sigma.max():.2f}])")
        if args.export_ply:
            from fenerf_tpu.utils.marching import (marching_cubes,
                                                   marching_tetrahedra,
                                                   write_ply)

            mesher = (marching_cubes if args.mesher == "cubes"
                      else marching_tetrahedra)
            vox = args.cube_size / res
            verts, faces = mesher(
                sigma, level=args.iso_level, spacing=(vox, vox, vox),
                origin=(-args.cube_size / 2,) * 3)
            ply = os.path.join(args.output_dir, f"{name}.ply")
            write_ply(ply, verts, faces)
            print(f"wrote {ply} ({len(verts)} verts, {len(faces)} faces)")

    if args.inversion_ckpt:
        data = np.load(args.inversion_ckpt)
        film_geo = (jnp.asarray(data["freq_geo"]), jnp.asarray(data["phase_geo"]))
        film_app = (jnp.asarray(data["freq_app"]), jnp.asarray(data["phase_app"]))
        name = os.path.splitext(os.path.basename(args.inversion_ckpt))[0]
        extract(film_geo, film_app, f"shape_{name}")
        return

    if is_grid:
        # latent-grid family: sigma volume straight from z (no W truncation)
        for seed in args.seeds:
            kg, _ = jax.random.split(jax.random.key(seed))
            zg = jax.random.normal(kg, (1, fcfg.z_geo_dim))
            extract(None, None, f"shape_seed{seed}", z=zg)
        return

    avg = fields.avg_film(params, fcfg, jax.random.key(42))
    for seed in args.seeds:
        kg, ka = jax.random.split(jax.random.key(seed))
        zg = jax.random.normal(kg, (1, fcfg.z_geo_dim))
        za = jax.random.normal(ka, (1, fcfg.z_app_dim))
        fg, fa = fields.field_film(params, fcfg, zg, za)
        fg = fields.truncate_film(fg, avg[0], args.psi)
        fa = fields.truncate_film(fa, avg[1], args.psi)
        extract(fg, fa, f"shape_seed{seed}")


if __name__ == "__main__":
    main()
