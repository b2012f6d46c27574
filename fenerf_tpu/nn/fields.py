"""Neural field networks: one generic FiLM-SIREN, configured per variant.

The reference ships ~20 near-identical SIREN classes
(/root/reference/siren/siren.py). Behaviorally they differ only in:
  trunk depth, color-branch depth, label-head depth, hidden width,
  single vs dual latent, an optional learnable 3D texture grid (fed to the
  density trunk or the color branch), whether ray direction conditions the
  color branch, and output activations.
Here that is ONE pair of functions (init_field / apply_field) + a
FieldConfig registry — the TPU-idiomatic redesign: the whole forward is a
chain of (N, H) x (H, H) matmuls that XLA tiles onto the MXU, with FiLM
sin() fused into each matmul's epilogue.

Numeric semantics preserved (for checkpoint parity and training dynamics):
  * mapping net: Linear(z,256) + LeakyReLU(0.2) x4 blocks + Linear(256, out),
    kaiming-leaky init, last weight x0.25, output split into (freqs, phases)
    (siren.py:82-102).
  * film: sin((15*freq+30) * (x @ W + b) + phase)  (siren.py:113-123, :165).
  * inits: frequency_init(25) everywhere, first trunk layer U(+-1/fan_in)
    (or U(+-1/3) for grid variants), torch-default biases.
  * box warp: points * 2/0.24 before the trunk (UniformBoxWarp, siren.py:181-187).
  * heads: sigma = Linear(h,1); labels = MLP(h -> ... -> n_labels);
    rgb = sigmoid(Linear(color_h, 3)).
  * texture grid: trilinear sample (align_corners=True) of a learnable
    (32, D, D, D) cube, concatenated into the color branch input
    (TextureEmbedding*, siren.py:1509-1530) or the trunk input
    (EmbeddingPiGAN*, siren.py:1427-1448).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from fenerf_tpu.core.grid_sample import (build_zexp_table, grid_sample_3d_fast,
                                         sample_zexp_table)
from fenerf_tpu.nn import init as winit
from fenerf_tpu.ops.fast_math import fast_sin

Params = Any  # nested dict / list pytree of jnp arrays


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static architecture description of a FiLM-SIREN field."""
    name: str = "SIRENBASELINESEMANTICDISENTANGLE"
    hidden_dim: int = 256
    trunk_layers: int = 8
    color_layers: int = 3
    label_hidden_layers: int = 1     # hidden linears before the label output
    n_labels: int = 18               # 0 => RGB-only (pi-GAN baseline)
    rgb_dim: int = 3
    z_geo_dim: int = 256
    z_app_dim: int = 256
    map_hidden_dim: int = 256
    single_latent: bool = False      # one mapping net drives trunk + color
    grid_channels: int = 0           # 0 => no texture grid
    grid_resolution: int = 96
    grid_init_scale: float = 0.1
    grid_to: str = "color"           # 'color' | 'trunk'
    use_ray_dir: bool = True
    box_side: float = 0.24
    first_layer_init: str = "film"   # 'film' (1/fan_in) | 'modified' (1/3)
    label_sigmoid: bool = False
    rgb_sigmoid: bool = True
    label_film: bool = False         # FiLM-conditioned label head (single-
                                     # latent semantic variants, siren.py:597+)
    color_pre_dim: int = 0           # >0: Linear(h, d) projects the trunk
                                     # output and REPLACES it as the color
                                     # input (SPATIALSIRENAUGDISENTANGLE,
                                     # siren.py:928-931,:974-976)
    res_sigma: bool = False          # RESSIRENDISENTANGLE (siren.py:982-1082):
                                     # residual coords = warped + Linear(h,3);
                                     # sigma = 4 stacked Linears on them; color
                                     # input = ray_dir ++ Linear(3,h)(coords)
    freq_scale: float = 15.0
    freq_offset: float = 30.0
    sine_w0: float = 25.0            # frequency_init constant

    @property
    def output_dim(self) -> int:
        return self.n_labels + self.rgb_dim + 1

    @property
    def trunk_in_dim(self) -> int:
        d = 3
        if self.grid_channels and self.grid_to == "trunk":
            d += self.grid_channels
        return d

    @property
    def color_in_dim(self) -> int:
        if self.res_sigma:
            d = self.hidden_dim        # color_pre: Linear(3, h) on res coords
        elif self.color_pre_dim:
            d = self.color_pre_dim
        else:
            d = self.hidden_dim
        if self.use_ray_dir:
            d += 3
        if self.grid_channels and self.grid_to == "color":
            d += self.grid_channels
        return d


# ---------------------------------------------------------------------------
# Variant registry (names match the reference classes for CLI compatibility)
# ---------------------------------------------------------------------------

def _cfg(**kw) -> FieldConfig:
    return FieldConfig(**kw)


VARIANTS: dict[str, FieldConfig] = {
    # --- shipped production models (SURVEY.md §2.1) ---
    "SIRENBASELINESEMANTICDISENTANGLE": _cfg(
        name="SIRENBASELINESEMANTICDISENTANGLE",
    ),
    "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96": _cfg(
        name="TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96",
        label_hidden_layers=2, grid_channels=32, grid_resolution=96,
        grid_init_scale=0.1, first_layer_init="modified",
    ),
    # --- siblings ---
    "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE": _cfg(
        name="TextureEmbeddingPiGAN256SEMANTICDISENTANGLE",
        label_hidden_layers=2, grid_channels=32, grid_resolution=64,
        grid_init_scale=0.1, first_layer_init="modified",
    ),
    "TextureEmbeddingPiGAN128SEMANTICDISENTANGLE": _cfg(
        name="TextureEmbeddingPiGAN128SEMANTICDISENTANGLE",
        hidden_dim=128, label_hidden_layers=2, grid_channels=32,
        grid_resolution=96, grid_init_scale=0.01, first_layer_init="modified",
    ),
    "TextureEmbeddingPiGAN128SEMANTICDISENTANGLE_WO_DIR": _cfg(
        name="TextureEmbeddingPiGAN128SEMANTICDISENTANGLE_WO_DIR",
        hidden_dim=128, color_layers=8, label_hidden_layers=2,
        grid_channels=32, grid_resolution=96, grid_init_scale=0.01,
        first_layer_init="modified", use_ray_dir=False,
    ),
    "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_WO_DIR_DIM_96": _cfg(
        name="TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_WO_DIR_DIM_96",
        color_layers=8, label_hidden_layers=2, grid_channels=32,
        grid_resolution=96, grid_init_scale=0.1,
        first_layer_init="modified", use_ray_dir=False,
    ),
    "EmbeddingPiGAN128SEMANTICDISENTANGLE": _cfg(
        name="EmbeddingPiGAN128SEMANTICDISENTANGLE",
        hidden_dim=128, label_hidden_layers=2, grid_channels=32,
        grid_resolution=96, grid_init_scale=0.01, grid_to="trunk",
        first_layer_init="modified",
    ),
    "SPATIALSIRENSEMANTICDISENTANGLE": _cfg(
        name="SPATIALSIRENSEMANTICDISENTANGLE", color_layers=8,
    ),
    # dual-latent TALLSIREN (RGB-only, 3 color film layers; siren.py:747-812)
    "SPATIALSIRENDISENTANGLE": _cfg(
        name="SPATIALSIRENDISENTANGLE", n_labels=0, color_layers=3,
        label_hidden_layers=0,
    ),
    # single-latent joint-semantic, label head NOT film-conditioned
    # (siren.py:674-746)
    "SPATIALSIRENBASELINESEMANTIC": _cfg(
        name="SPATIALSIRENBASELINESEMANTIC", n_labels=19, single_latent=True,
        color_layers=1, label_hidden_layers=1, z_geo_dim=256, z_app_dim=256,
    ),
    "SIRENBASELINESEMANTICDISENTANGLE_debug": _cfg(
        name="SIRENBASELINESEMANTICDISENTANGLE_debug",
        n_labels=19, label_sigmoid=True,
    ),
    # dual-latent, RGB-only, 8 color film layers over [ray_dir, Linear(h,3)]
    # (augmented color branch / narrow density feature; siren.py:904-981)
    "SPATIALSIRENAUGDISENTANGLE": _cfg(
        name="SPATIALSIRENAUGDISENTANGLE", n_labels=0, color_layers=8,
        label_hidden_layers=0, color_pre_dim=3,
    ),
    # dual-latent, RGB-only, i3DMM-style residual coordinates: sigma is a
    # stacked-linear MLP on (warped + Linear(h,3)(trunk)); 6 color film
    # layers over [ray_dir, Linear(3,h)(coords)] (siren.py:982-1082)
    "RESSIRENDISENTANGLE": _cfg(
        name="RESSIRENDISENTANGLE", n_labels=0, color_layers=6,
        label_hidden_layers=0, res_sigma=True,
    ),
    # --- single-latent semantic variants ---
    "SPATIALSIRENSEMANTIC": _cfg(
        name="SPATIALSIRENSEMANTIC", n_labels=19, single_latent=True,
        color_layers=1, label_hidden_layers=0, label_film=True,
        z_geo_dim=256, z_app_dim=256,
    ),
    # --- HD variants: 64-channel FEATURE outputs for the neural-renderer
    # upsampler head (siren.py:247-302, :1301-1366; StyleGenerator3d) ---
    "SPATIALSIRENBASELINEHD": _cfg(
        name="SPATIALSIRENBASELINEHD", n_labels=0, single_latent=True,
        color_layers=1, label_hidden_layers=0, rgb_dim=64, rgb_sigmoid=False,
        z_geo_dim=256, z_app_dim=256,
    ),
    "SPATIALSIRENSEMANTICHD": _cfg(
        name="SPATIALSIRENSEMANTICHD", n_labels=64, single_latent=True,
        color_layers=1, label_hidden_layers=0, label_film=True,
        rgb_dim=64, rgb_sigmoid=False, z_geo_dim=256, z_app_dim=256,
    ),
    # --- single-latent pi-GAN embedding-grid variants (RGB-only) ---
    "EmbeddingPiGAN128": _cfg(
        name="EmbeddingPiGAN128", n_labels=0, single_latent=True,
        hidden_dim=128, color_layers=1, label_hidden_layers=0,
        grid_channels=32, grid_resolution=96, grid_init_scale=0.01,
        grid_to="trunk", first_layer_init="modified",
        z_geo_dim=256, z_app_dim=256,
    ),
    "EmbeddingPiGAN256": _cfg(
        name="EmbeddingPiGAN256", n_labels=0, single_latent=True,
        color_layers=1, label_hidden_layers=0,
        grid_channels=32, grid_resolution=64, grid_init_scale=0.1,
        grid_to="trunk", first_layer_init="modified",
        z_geo_dim=256, z_app_dim=256,
    ),
    # --- single-latent pi-GAN baselines (RGB-only) ---
    "TALLSIREN": _cfg(
        name="TALLSIREN", n_labels=0, single_latent=True, color_layers=1,
        label_hidden_layers=0, z_geo_dim=512, z_app_dim=512, box_side=0.0,
    ),
    "SPATIALSIRENBASELINE": _cfg(
        name="SPATIALSIRENBASELINE", n_labels=0, single_latent=True,
        color_layers=1, label_hidden_layers=0, z_geo_dim=512, z_app_dim=512,
    ),
}


def get_config(name: str, **overrides) -> FieldConfig:
    cfg = VARIANTS[name]
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_mapping(key, z_dim, hidden, out_dim, dtype, n_blocks=3) -> list[Params]:
    """CustomMappingNetwork (siren.py:82-102): 2+n_blocks linears with
    LeakyReLU(0.2) between, kaiming-leaky init, last weight x0.25."""
    n = n_blocks + 2
    keys = jax.random.split(key, n)
    dims = [(z_dim, hidden)] + [(hidden, hidden)] * n_blocks \
        + [(hidden, out_dim)]
    layers = [
        winit.linear(k, i, o, winit.kaiming_leaky_weight, dtype=dtype)
        for k, (i, o) in zip(keys, dims)
    ]
    layers[-1]["w"] = layers[-1]["w"] * 0.25
    return layers


def init_field(key: jax.Array, cfg: FieldConfig, dtype=jnp.float32) -> Params:
    h = cfg.hidden_dim
    (k_trunk, k_sigma, k_label, k_color, k_cout, k_gmap, k_amap, k_grid
     ) = jax.random.split(key, 8)

    freq_init = lambda k, i, o, dtype=dtype: winit.frequency_weight(
        k, i, o, cfg.sine_w0, dtype)

    # trunk
    trunk = []
    tkeys = jax.random.split(k_trunk, cfg.trunk_layers)
    for li in range(cfg.trunk_layers):
        fan_in = cfg.trunk_in_dim if li == 0 else h
        if li == 0 and cfg.first_layer_init == "modified":
            w_init = winit.modified_first_weight
        elif li == 0:
            w_init = winit.first_layer_film_weight
        else:
            w_init = freq_init
        trunk.append(winit.linear(tkeys[li], fan_in, h, w_init, dtype=dtype))

    # color branch
    color = []
    ckeys = jax.random.split(k_color, max(cfg.color_layers, 1))
    for li in range(cfg.color_layers):
        fan_in = cfg.color_in_dim if li == 0 else h
        # dual-latent variants film-init the first color layer only in
        # SPATIALSIRENSEMANTICDISENTANGLE (siren.py:1130); others use freq init
        w_init = freq_init
        if li == 0 and cfg.name == "SPATIALSIRENSEMANTICDISENTANGLE":
            w_init = winit.first_layer_film_weight
        color.append(winit.linear(ckeys[li], fan_in, h, w_init, dtype=dtype))

    params: dict[str, Params] = {
        "trunk": trunk,
        "color": color,
        "color_head": winit.linear(k_cout, h, cfg.rgb_dim, freq_init, dtype=dtype),
    }

    if cfg.res_sigma:
        # res_coord_layer + color_layer_pre keep torch-default init (not in
        # the reference's frequency_init apply list, siren.py:1038-1042);
        # density_layer_linear IS frequency-initialized
        ks = jax.random.split(k_sigma, 6)
        params["res_coord"] = winit.linear(
            ks[0], h, 3, winit.torch_default_weight, dtype=dtype)
        params["sigma_mlp"] = [
            winit.linear(ks[1], 3, h, freq_init, dtype=dtype),
            winit.linear(ks[2], h, h, freq_init, dtype=dtype),
            winit.linear(ks[3], h, h, freq_init, dtype=dtype),
            winit.linear(ks[4], h, 1, freq_init, dtype=dtype),
        ]
        params["color_pre"] = winit.linear(
            ks[5], 3, h, winit.torch_default_weight, dtype=dtype)
    else:
        params["sigma_head"] = winit.linear(k_sigma, h, 1, freq_init, dtype=dtype)
        if cfg.color_pre_dim:
            # torch-default init (not in the apply list, siren.py:947-951)
            params["color_pre"] = winit.linear(
                jax.random.fold_in(k_sigma, 7), h, cfg.color_pre_dim,
                winit.torch_default_weight, dtype=dtype)

    if cfg.label_film:
        params["label_film"] = winit.linear(
            jax.random.fold_in(k_label, 99), h, h, freq_init, dtype=dtype)

    # label head: label_hidden_layers x Linear(h,h) then Linear(h, n_labels)
    if cfg.n_labels:
        lkeys = jax.random.split(k_label, cfg.label_hidden_layers + 1)
        label = [
            winit.linear(lkeys[i], h, h, freq_init, dtype=dtype)
            for i in range(cfg.label_hidden_layers)
        ]
        label.append(
            winit.linear(lkeys[-1], h, cfg.n_labels, freq_init, dtype=dtype))
        params["label_head"] = label

    # mapping networks: film chunk counts
    n_trunk_film = cfg.trunk_layers
    n_color_film = cfg.color_layers + int(cfg.label_film)
    if cfg.single_latent:
        out = (n_trunk_film + n_color_film) * h * 2
        params["geo_map"] = _init_mapping(
            k_gmap, cfg.z_geo_dim, cfg.map_hidden_dim, out, dtype)
    else:
        params["geo_map"] = _init_mapping(
            k_gmap, cfg.z_geo_dim, cfg.map_hidden_dim, n_trunk_film * h * 2, dtype)
        params["app_map"] = _init_mapping(
            k_amap, cfg.z_app_dim, cfg.map_hidden_dim, n_color_film * h * 2, dtype)

    if cfg.grid_channels:
        r = cfg.grid_resolution
        params["grid"] = (
            jax.random.normal(k_grid, (cfg.grid_channels, r, r, r), dtype)
            * cfg.grid_init_scale
        )
    return params


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def mapping_apply(layers: list[Params], z: jax.Array) -> tuple[jax.Array, jax.Array]:
    """z (B, z_dim) -> (freqs, phases), each (B, n_film * hidden)."""
    x = z
    for lyr in layers[:-1]:
        x = jax.nn.leaky_relu(x @ lyr["w"] + lyr["b"], 0.2)
    x = x @ layers[-1]["w"] + layers[-1]["b"]
    half = x.shape[-1] // 2
    return x[..., :half], x[..., half:]


def field_film(params: Params, cfg: FieldConfig, z_geo, z_app):
    """Latents -> raw (freqs, phases) for (trunk, color) branches.

    Returns ((fg, pg), (fa, pa)); raw (un-transformed) frequencies, matching
    the reference's W-space (truncation/inversion operate on these).
    For single-latent variants both branches come from one mapping network.
    """
    if cfg.single_latent:
        f, p = mapping_apply(params["geo_map"], z_geo)
        cut = cfg.trunk_layers * cfg.hidden_dim
        return (f[..., :cut], p[..., :cut]), (f[..., cut:], p[..., cut:])
    fg, pg = mapping_apply(params["geo_map"], z_geo)
    fa, pa = mapping_apply(params["app_map"], z_app)
    return (fg, pg), (fa, pa)


def _film_sin(x, w, b, freq, phase, compute_dtype):
    """One FiLM layer: sin(freq * (x@w + b) + phase).

    The matmul runs in compute_dtype (bf16 on TPU feeds the MXU) with f32
    accumulation; the sine epilogue stays f32 — sin of O(100) arguments loses
    too much precision in bf16. fast_sin (range-reduced degree-11 polynomial,
    ops/fast_math.py) replaces XLA's sin: profiling showed sin was ~2/3 of
    field-eval time, and the 6e-7 max error is noise at these scales.
    """
    y = jnp.dot(
        x.astype(compute_dtype), w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + b
    return fast_sin(freq * y + phase)


GRID_TABLE_KEY = "grid_table"


def with_grid_table(params: Params, cfg, table_dtype=jnp.bfloat16) -> Params:
    """Return `params` with the z-expanded texture gather table precomputed
    under GRID_TABLE_KEY (a DERIVED tensor — never part of the train state,
    the optimizer, or checkpoints).

    Building the table is ~20ms at the flagship 96^3x32 grid (round-4 trace:
    the (8,C,97^3) relayouts dominated the whole training step when rebuilt
    per microbatch chunk). Hoist it: once per render program (generator) /
    once per training step (train/loop.py, with a manual VJP so grid grads
    still flow). apply_field picks the table up automatically; no-op for
    gridless configs or when a table is already present.
    """
    if (not isinstance(cfg, FieldConfig) or not cfg.grid_channels
            or GRID_TABLE_KEY in params):
        return params
    return {**params,
            GRID_TABLE_KEY: build_zexp_table(params["grid"], table_dtype)}


def _grid_feats(params: Params, warped: jax.Array, table_dtype) -> jax.Array:
    """Texture-grid features at warped coords: via the prebuilt table when
    the caller injected one (with_grid_table), else built inline."""
    table = params.get(GRID_TABLE_KEY)
    if table is not None:
        return sample_zexp_table(table, params["grid"].shape, warped)
    return grid_sample_3d_fast(params["grid"], warped,
                               table_dtype=table_dtype)


def apply_field(
    params: Params,
    cfg: FieldConfig,
    points: jax.Array,     # (B, N, 3) world-space sample points
    ray_dirs: jax.Array,   # (B, N, 3) unit directions (ignored if !use_ray_dir)
    film_geo: tuple[jax.Array, jax.Array],  # raw (freqs, phases), (B, Lg*H)
    film_app: tuple[jax.Array, jax.Array],
    compute_dtype=jnp.float32,
    backend: str = "xla",
) -> jax.Array:
    """Evaluate the field at points -> (B, N, n_labels + rgb + 1).

    Reference semantics: forward_with_frequencies_phase_shifts of
    SIRENBASELINESEMANTICDISENTANGLE (siren.py:1211-1229) and
    TextureEmbeddingPiGAN* (siren.py:1509-1530), generalized.

    backend='pallas' routes the whole MLP through the fused TPU kernel
    (ops/film_mlp.py) — forward-only, inference paths. backend='pallas_train'
    uses the custom-VJP variant (fused forward AND backward kernels,
    ops/film_mlp_grad.py) for differentiable renders.
    """
    if backend in ("pallas", "pallas_train"):
        from fenerf_tpu.ops import film_mlp as film_mlp_ops

        warped = points * (2.0 / cfg.box_side) if cfg.box_side else points
        gf = None
        if cfg.grid_channels:
            # bf16 table: the kernel quantizes gf to bf16 at the next matmul
            # anyway; halving table bytes halves the dominant gather cost
            gf = _grid_feats(params, warped, jnp.bfloat16)
        if backend == "pallas_train":
            from fenerf_tpu.ops.film_mlp_grad import make_film_mlp_trainable

            mlp_keys = ["trunk", "color", "sigma_head", "color_head"]
            if cfg.n_labels:
                mlp_keys.append("label_head")
            mlp_params = {k: params[k] for k in mlp_keys}
            film_fn = make_film_mlp_trainable(cfg)
            return film_fn(mlp_params, warped, ray_dirs, gf,
                           film_geo[0], film_geo[1],
                           film_app[0], film_app[1])
        return film_mlp_ops.film_mlp(
            params, cfg, warped, ray_dirs, gf, film_geo, film_app)

    h = cfg.hidden_dim
    fg, pg = film_geo
    fa, pa = film_app
    fg = fg * cfg.freq_scale + cfg.freq_offset
    fa = fa * cfg.freq_scale + cfg.freq_offset

    def chunk(t, i):
        return t[..., None, i * h:(i + 1) * h]  # (B, 1, H) broadcast over N

    if cfg.box_side:
        x_in = points * (2.0 / cfg.box_side)
    else:
        x_in = points

    grid_feats = None
    if cfg.grid_channels:
        grid_feats = _grid_feats(
            params, x_in,
            (jnp.bfloat16 if compute_dtype == jnp.bfloat16 else None))

    x = x_in
    if grid_feats is not None and cfg.grid_to == "trunk":
        x = jnp.concatenate([grid_feats, x], axis=-1)

    for i, lyr in enumerate(params["trunk"]):
        x = _film_sin(x, lyr["w"], lyr["b"], chunk(fg, i), chunk(pg, i),
                      compute_dtype)

    color_src = x
    if cfg.res_sigma:
        coords = x_in + (x @ params["res_coord"]["w"]
                         + params["res_coord"]["b"])
        sigma = coords
        for lyr in params["sigma_mlp"]:   # stacked Linears, no activations
            sigma = sigma @ lyr["w"] + lyr["b"]
        color_src = coords @ params["color_pre"]["w"] + params["color_pre"]["b"]
    else:
        sigma = x @ params["sigma_head"]["w"] + params["sigma_head"]["b"]
        if cfg.color_pre_dim:
            color_src = x @ params["color_pre"]["w"] + params["color_pre"]["b"]

    outs = []
    color_chunk0 = 0
    if cfg.n_labels:
        lbl = x
        if cfg.label_film:
            # label head conditioned on its own film chunk (siren.py:1359)
            p = params["label_film"]
            lbl = _film_sin(lbl, p["w"], p["b"], chunk(fa, 0), chunk(pa, 0),
                            compute_dtype)
            color_chunk0 = 1
        for lyr in params["label_head"]:
            lbl = lbl @ lyr["w"] + lyr["b"]
        if cfg.label_sigmoid:
            lbl = jax.nn.sigmoid(lbl)
        outs.append(lbl)

    c_parts = []
    if cfg.use_ray_dir:
        c_parts.append(ray_dirs)
    if grid_feats is not None and cfg.grid_to == "color":
        c_parts.append(grid_feats)
    c_parts.append(color_src)
    c = jnp.concatenate(c_parts, axis=-1)
    for i, lyr in enumerate(params["color"]):
        c = _film_sin(c, lyr["w"], lyr["b"],
                      chunk(fa, color_chunk0 + i), chunk(pa, color_chunk0 + i),
                      compute_dtype)
    rgb = c @ params["color_head"]["w"] + params["color_head"]["b"]
    if cfg.rgb_sigmoid:
        rgb = jax.nn.sigmoid(rgb)
    outs.append(rgb)
    outs.append(sigma)
    return jnp.concatenate(outs, axis=-1)


def avg_film(params: Params, cfg: FieldConfig, key: jax.Array, n: int = 10000):
    """Mean W-space point for truncation (reference generate_avg_frequencies,
    generators.py:530-543): push n gaussian z through the mapping nets and
    average."""
    kg, ka = jax.random.split(key)
    zg = jax.random.normal(kg, (n, cfg.z_geo_dim))
    za = jax.random.normal(ka, (n, cfg.z_app_dim))
    (fg, pg), (fa, pa) = field_film(params, cfg, zg, za)
    mean = lambda t: t.mean(0, keepdims=True)
    return (mean(fg), mean(pg)), (mean(fa), mean(pa))


def truncate_film(film, avg, psi: float):
    """psi-truncation toward the average W (generators.py:561-564)."""
    (f, p), (af, ap) = film, avg
    return (af + psi * (f - af), ap + psi * (p - ap))
