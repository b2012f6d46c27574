"""Latent-grid SIREN field (the FENeRF "w/ latent grid" model family).

Reference: SPATIALSIRENGRID (/root/reference/siren/siren.py:413-518) — a
StyleGAN2-style 2D generator (StyleGenerator2D) produces a 32x32 grid of
32-ch LOCAL latent codes over the (x, z) ground plane; each 3D sample point
bilinearly samples its local latent (align_corners=False, zeros padding,
siren.py:479-499), which drives a small per-point mapping network
(CustomMappingNetwork(32, 256, 9*h*2, n_blocks=1), 3 linears) -> per-POINT
FiLM freqs/phases for the 8-layer trunk + 1 color layer. Point coordinates
are remapped into per-grid-cell local frames (get_local_coordinates,
siren.py:501-518) before the (second!) box warp the reference applies inside
forward_with_frequencies (siren.py:456 — replicated faithfully).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from fenerf_tpu.core.grid_sample import grid_sample_2d
from fenerf_tpu.nn import init as winit
from fenerf_tpu.nn import stylegan
from fenerf_tpu.nn.fields import _init_mapping
from fenerf_tpu.ops.fast_math import fast_sin

Params = Any


@dataclasses.dataclass(frozen=True)
class GridFieldConfig:
    name: str = "SPATIALSIRENGRID"
    z_dim: int = 256
    hidden_dim: int = 256
    trunk_layers: int = 8
    grid_res: int = 32
    grid_ch: int = 32
    ch_max: int = 256
    map_hidden_dim: int = 256
    local_coordinates: bool = True
    box_side: float = 0.24
    rgb_dim: int = 3
    freq_scale: float = 15.0
    freq_offset: float = 30.0

    @property
    def output_dim(self) -> int:
        return self.rgb_dim + 1

    # compat properties so family-generic code (apps, trainer) can treat
    # FieldConfig and GridFieldConfig uniformly: the grid family is
    # single-latent (z drives the StyleGenerator2D) and RGB-only
    @property
    def n_labels(self) -> int:
        return 0

    @property
    def z_geo_dim(self) -> int:
        return self.z_dim

    @property
    def z_app_dim(self) -> int:
        return self.z_dim


# Registry of latent-grid variants (names match the reference classes).
# SPATIALSIRENGRID is the field behind the released "FENeRF w/ latent grid"
# checkpoint (/root/reference/README.md:74, siren/siren.py:413-518).
GRID_VARIANTS: dict[str, GridFieldConfig] = {
    "SPATIALSIRENGRID": GridFieldConfig(),
}


def is_grid_model(name: str) -> bool:
    return name in GRID_VARIANTS


def get_grid_config(name: str, **overrides) -> GridFieldConfig:
    cfg = GRID_VARIANTS[name]
    # film-family kwargs that may leak in from shared call sites
    overrides.pop("n_labels", None)
    zg = overrides.pop("z_geo_dim", None)
    overrides.pop("z_app_dim", None)
    if zg and "z_dim" not in overrides:
        overrides["z_dim"] = zg
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def init_grid_field(key: jax.Array, cfg: GridFieldConfig,
                    dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    h = cfg.hidden_dim
    freq = lambda k, i, o, dtype=dtype: winit.frequency_weight(k, i, o, 25.0,
                                                               dtype)
    trunk = []
    tkeys = jax.random.split(ks[0], cfg.trunk_layers)
    for li in range(cfg.trunk_layers):
        fan_in = 3 if li == 0 else h
        w_init = winit.first_layer_film_weight if li == 0 else freq
        trunk.append(winit.linear(tkeys[li], fan_in, h, w_init, dtype=dtype))
    n_film = cfg.trunk_layers + 1
    return {
        "style_gen": stylegan.init_style_generator_2d(
            ks[1], out_res=cfg.grid_res, out_ch=cfg.grid_ch, z_dim=cfg.z_dim,
            ch_max=cfg.ch_max, skip_conn=False, dtype=dtype),
        "map": _init_mapping(ks[2], cfg.grid_ch, cfg.map_hidden_dim,
                             n_film * h * 2, dtype, n_blocks=1),
        "trunk": trunk,
        "sigma_head": winit.linear(ks[3], h, 1, freq, dtype=dtype),
        "color": [winit.linear(ks[4], h + 3, h, freq, dtype=dtype)],
        "color_head": winit.linear(ks[5], h, cfg.rgb_dim, freq, dtype=dtype),
    }


def local_coordinates(global_coords: jax.Array, grid_length: int) -> jax.Array:
    """Map [-1,1] coords into per-cell [-1,1] frames (siren.py:501-518,
    preserve_y=False as called at :433)."""
    c = (global_coords + 1.0) / 2.0 * grid_length
    c = c - jnp.round(c - 0.5)
    return c * 2.0 - 1.0


def sample_local_latents(grid: jax.Array, warped_xyz: jax.Array) -> jax.Array:
    """grid (B, C, H, W); warped_xyz (B, N, 3) -> (B, N, C): bilinear at the
    (x, z) ground-plane coordinates (siren.py:479-499)."""
    xz = warped_xyz[..., jnp.array([0, 2])]
    return jax.vmap(lambda g, c: grid_sample_2d(g, c))(grid, xz)


def compute_plane(params: Params, cfg: GridFieldConfig,
                  z: jax.Array) -> jax.Array:
    """The StyleGenerator2D latent plane (B, C, H, W) for z (B, z_dim).

    Per-RENDER work, not per-point work: callers on a chunked or sharded
    path compute it once and pass it via apply_grid_field(plane=...) so the
    StyleGAN conv stack does not re-run per ray block (and, under ray
    sharding, runs replicated once per device instead of per chunk)."""
    return stylegan.style_generator_2d(params["style_gen"], z)


def apply_grid_field(
    params: Params,
    cfg: GridFieldConfig,
    points: jax.Array,    # (B, N, 3)
    ray_dirs: jax.Array,  # (B, N, 3)
    z: jax.Array,         # (B, z_dim)
    compute_dtype=jnp.float32,
    plane: jax.Array | None = None,
) -> jax.Array:
    """-> (B, N, 4) [rgb, sigma] (siren.py:437-477)."""
    h = cfg.hidden_dim
    grid = plane if plane is not None else compute_plane(params, cfg, z)
    warped = points * (2.0 / cfg.box_side)
    latents = sample_local_latents(grid, warped)  # (B, N, C)

    # per-point mapping network (3 linears, lrelu between)
    x = latents
    for lyr in params["map"][:-1]:
        x = jax.nn.leaky_relu(x @ lyr["w"] + lyr["b"], 0.2)
    x = x @ params["map"][-1]["w"] + params["map"][-1]["b"]
    half = x.shape[-1] // 2
    freqs = x[..., :half] * cfg.freq_scale + cfg.freq_offset  # (B, N, L*H)
    phases = x[..., half:]

    coords = points
    if cfg.local_coordinates:
        coords = local_coordinates(points, cfg.grid_res)
    # the reference warps AGAIN inside forward_with_frequencies (siren.py:456)
    xx = coords * (2.0 / cfg.box_side)

    def film(xx, lyr, li):
        y = jnp.dot(xx.astype(compute_dtype), lyr["w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32) + lyr["b"]
        return fast_sin(freqs[..., li * h:(li + 1) * h] * y
                        + phases[..., li * h:(li + 1) * h])

    for li, lyr in enumerate(params["trunk"]):
        xx = film(xx, lyr, li)

    sigma = xx @ params["sigma_head"]["w"] + params["sigma_head"]["b"]
    c = jnp.concatenate([ray_dirs, xx], axis=-1)
    c = film(c, params["color"][0], cfg.trunk_layers)
    rgb = jax.nn.sigmoid(c @ params["color_head"]["w"]
                         + params["color_head"]["b"])
    return jnp.concatenate([rgb, sigma], axis=-1)
