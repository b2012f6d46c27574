"""Fused FiLM-SIREN point-evaluation kernel (Pallas, TPU).

This is the TPU-native replacement for the reference's custom CUDA layer
(siren/op/*.cu fuse bias+activation; here we fuse the ENTIRE field network):
one kernel evaluates trunk (8 FiLM layers) + sigma/label heads + color branch
(3 FiLM layers) + rgb head for a tile of points, keeping every intermediate
activation in VMEM. The XLA path writes each (N, H) activation to HBM between
matmuls (~12 round trips per point); here HBM traffic is points in + channels
out + weights once.

Layout:
  * point arrays flattened to (B*N, C); the grid walks row tiles; FiLM
    freq/phase blocks are indexed by tile -> batch element (N % tile == 0).
  * weights packed bf16 (MXU-native); biases/film/activations f32 (sin of
    O(30) arguments needs f32 on the VPU).
  * the color-branch concat [ray_dir | grid_feats | x] is realized as
    row-split matmuls (W rows [0:3], [3:3+G], [3+G:]) — no concat in VMEM.

Dispatch: inference/eval/bench route here via
fields.apply_field(..., backend='pallas') (RenderConfig); TRAINING routes to
the fused BACKWARD kernel in ops/film_mlp_grad.py via backend_for(train=True)
(train/loop.py) — that custom-VJP pair has been the production training path
since round 2. Configs outside supported()/supported_train() fall back to XLA.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fenerf_tpu.nn.fields import FieldConfig
from fenerf_tpu.ops.fast_math import _poly_sin, _reduce

DEFAULT_TILE = 1024


def _fsin(x):
    """Range-reduced polynomial sine (see ops/fast_math.py) — sin dominates
    the VPU budget of this kernel."""
    return _poly_sin(_reduce(x))


def supported(cfg: FieldConfig) -> bool:
    """Variants the FORWARD kernel covers (others fall back to XLA):
    everything except the two exotic color-branch rewirings. single_latent
    only changes film production (fields.field_film), not the MLP;
    label_film adds one FiLM layer on the label branch (app chunk 0);
    grid_to='trunk' feeds grid features to the first trunk matmul."""
    if not isinstance(cfg, FieldConfig):
        return False  # latent-grid family: per-point film, XLA path
    return not cfg.color_pre_dim and not cfg.res_sigma


def supported_train(cfg: FieldConfig) -> bool:
    """Variants the fused BACKWARD kernel (ops/film_mlp_grad.py) covers —
    the production training configs plus the single-latent pi-GAN baselines
    (single_latent only changes film PRODUCTION, which differentiates
    outside the kernel); others train through XLA autodiff."""
    return (
        supported(cfg)
        and cfg.use_ray_dir
        and not (cfg.grid_channels and cfg.grid_to == "trunk")
        and not cfg.label_film
    )


def backend_for(cfg: Any, train: bool = False) -> str:
    """THE film-family kernel-dispatch policy (single source — the trainer,
    the stage log, and the inference CLIs all route through here): fused
    Pallas kernels when the host's default backend is TPU and the variant
    is covered, else the XLA path. train=True selects the fused-VJP kernel
    set (ops/film_mlp_grad.py), which covers fewer variants than forward."""
    if jax.default_backend() != "tpu" or not isinstance(cfg, FieldConfig):
        return "xla"
    if train:
        return "pallas_train" if supported_train(cfg) else "xla"
    return "pallas" if supported(cfg) else "xla"


def _fold_heads(cfg: FieldConfig) -> bool:
    """Inference-kernel head packing: the reference label head is a chain of
    linears with NO activation between them (siren/siren.py:1195-1197
    label_layer_linear = Sequential(Linear(h,h), Linear(h,18))), so it folds
    to ONE (h, 18) matmul; that folds further with the sigma head (same
    input x) into a single (h, 19) MXU pass — removing 3 of the ~4
    head-sector passes (~11% of the kernel's MXU work, BASELINE.md narrow-
    head item). label_film variants insert a FiLM sine before the label
    linears (input differs from x) and keep the unfolded path; training uses
    the unfolded backward kernel regardless."""
    return bool(cfg.n_labels) and not cfg.label_film


def _pack(params: Any, cfg: FieldConfig) -> list[jax.Array]:
    """Kernel operand order: trunk (w,b)*Lg, color (w,b)*Lc, then either the
    packed [sigma | folded-label] head (+ color head) when _fold_heads, or
    sigma head, [label_film], label head linears, color head. Weights bf16,
    biases f32 (the label fold runs in f32, ONE bf16 cast at the end —
    strictly fewer roundings than the sequential bf16 chain)."""
    ops = []
    layers = list(params["trunk"]) + list(params["color"])
    if _fold_heads(cfg):
        w = params["label_head"][0]["w"].astype(jnp.float32)
        b = params["label_head"][0]["b"].astype(jnp.float32)
        for lyr in params["label_head"][1:]:
            w2 = lyr["w"].astype(jnp.float32)
            b = b @ w2 + lyr["b"].astype(jnp.float32)
            w = w @ w2
        packed_w = jnp.concatenate(
            [params["sigma_head"]["w"].astype(jnp.float32), w], axis=1)
        packed_b = jnp.concatenate(
            [params["sigma_head"]["b"].astype(jnp.float32), b])
        layers.append({"w": packed_w, "b": packed_b})
    else:
        layers.append(params["sigma_head"])
        if cfg.n_labels:
            if cfg.label_film:
                layers.append(params["label_film"])
            layers += list(params["label_head"])
    layers.append(params["color_head"])
    for lyr in layers:
        ops += [lyr["w"].astype(jnp.bfloat16), lyr["b"].astype(jnp.float32)]
    return ops


def film_mlp(
    params: Any,
    cfg: FieldConfig,
    points: jax.Array,      # (B, N, 3) already box-warped (caller samples
                            # the texture grid at the same coords)
    ray_dirs: jax.Array,    # (B, N, 3)
    grid_feats: jax.Array | None,   # (B, N, G) pre-sampled texture features
    film_geo: tuple[jax.Array, jax.Array],  # raw (B, Lg*H)
    film_app: tuple[jax.Array, jax.Array],
    tile: int = DEFAULT_TILE,
) -> jax.Array:
    """Fused field evaluation -> (B, N, output_dim); numerics match
    fields.apply_field (same freq transform, heads, activations)."""
    b, n, _ = points.shape
    h = cfg.hidden_dim
    lg, lc = cfg.trunk_layers, cfg.color_layers
    g = cfg.grid_channels or 0
    g_col = g if cfg.grid_to == "color" else 0
    g_trunk = g if cfg.grid_to == "trunk" else 0
    lf = 1 if (cfg.n_labels and cfg.label_film) else 0  # label FiLM layer
    fold = _fold_heads(cfg)
    assert supported(cfg), f"unsupported variant {cfg.name} for pallas path"
    tile = min(tile, n)
    pad_n = (-n) % tile
    if pad_n:
        padn = lambda a: jnp.pad(a, ((0, 0), (0, pad_n), (0, 0)))
        points, ray_dirs = padn(points), padn(ray_dirs)
        if grid_feats is not None:
            grid_feats = padn(grid_feats)
    n_padded = n + pad_n
    tiles_per_b = n_padded // tile

    fg, pg = film_geo
    fa, pa = film_app
    # app film carries lc + lf chunks: chunk 0 conditions the label branch
    # when label_film (reference siren.py:1359), color uses chunks lf..
    fg = (fg * cfg.freq_scale + cfg.freq_offset).reshape(b, lg, h)
    pg = jnp.reshape(pg, (b, lg, h))
    fa = (fa * cfg.freq_scale + cfg.freq_offset).reshape(b, lc + lf, h)
    pa = jnp.reshape(pa, (b, lc + lf, h))

    pts2 = points.reshape(b * n_padded, 3)
    dirs2 = ray_dirs.reshape(b * n_padded, 3)
    inputs = [pts2, dirs2]
    if g:
        inputs.append(grid_feats.reshape(b * n_padded, g))
    inputs += [fg, pg, fa, pa]

    weights = _pack(params, cfg)
    n_label_lin = (cfg.label_hidden_layers + 1) if cfg.n_labels else 0
    out_dim = cfg.output_dim
    # the output block's last dim EQUALS the full array dim (legal even when
    # not 128-aligned) — writing 22 channels instead of padding to 128 cuts
    # output HBM traffic ~6x

    def kernel(*refs):
        if g:
            pts_ref, dirs_ref, gf_ref = refs[0], refs[1], refs[2]
            fi = 3
        else:
            pts_ref, dirs_ref = refs[0], refs[1]
            gf_ref = None
            fi = 2
        fg_ref, pg_ref, fa_ref, pa_ref = refs[fi:fi + 4]
        wrefs = refs[fi + 4:-1]
        out_ref = refs[-1]

        def lin(x_f32, wi):
            w = wrefs[2 * wi][...]
            bias = wrefs[2 * wi + 1][...]
            y = jnp.dot(x_f32.astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)
            return y + bias[None, :]

        def film(x, wi, freq_ref, phase_ref, li):
            return _fsin(freq_ref[0, li][None, :] * lin(x, wi)
                         + phase_ref[0, li][None, :])

        # trunk: first layer rows are [grid(G) | points(3)] for
        # grid_to='trunk' (apply_field concatenates in that order)
        if g_trunk:
            w0t = wrefs[0][...]
            b0t = wrefs[1][...]
            y = jnp.dot(gf_ref[...].astype(jnp.bfloat16), w0t[:g_trunk],
                        preferred_element_type=jnp.float32)
            y = y + jnp.dot(pts_ref[...].astype(jnp.bfloat16),
                            w0t[g_trunk:],
                            preferred_element_type=jnp.float32)
            x = _fsin(fg_ref[0, 0][None, :] * (y + b0t[None, :])
                      + pg_ref[0, 0][None, :])
            t0 = 1
        else:
            x = pts_ref[...].astype(jnp.float32)
            t0 = 0
        for i in range(t0, lg):
            x = film(x, i, fg_ref, pg_ref, i)

        # color branch input rows: [ray_dir(3)? | grid(G)? | x(H)]
        d = 3 if cfg.use_ray_dir else 0
        w0 = wrefs[2 * lg][...]
        b0 = wrefs[2 * lg + 1][...]
        if d:
            y = jnp.dot(dirs_ref[...].astype(jnp.bfloat16), w0[:3],
                        preferred_element_type=jnp.float32)
        else:
            y = jnp.zeros((x.shape[0], w0.shape[1]), jnp.float32)
        if g_col:
            y = y + jnp.dot(gf_ref[...].astype(jnp.bfloat16),
                            w0[d:d + g_col],
                            preferred_element_type=jnp.float32)
        y = y + jnp.dot(x.astype(jnp.bfloat16), w0[d + g_col:],
                        preferred_element_type=jnp.float32)
        c = _fsin(fa_ref[0, lf][None, :] * (y + b0[None, :])
                  + pa_ref[0, lf][None, :])
        for i in range(1, lc):
            c = film(c, lg + i, fa_ref, pa_ref, lf + i)

        hbase = lg + lc
        outs = []
        if fold:
            # one (h, 1+n_labels) pass: [sigma | folded label chain]
            y = lin(x, hbase)
            sigma = y[:, :1]
            lbl = y[:, 1:]
            if cfg.label_sigmoid:
                lbl = jax.nn.sigmoid(lbl)
            outs.append(lbl)
            rgb = lin(c, hbase + 1)
        else:
            sigma = lin(x, hbase)
            if n_label_lin:
                lbl = x
                if lf:
                    # label branch's own FiLM layer, app chunk 0
                    lbl = film(lbl, hbase + 1, fa_ref, pa_ref, 0)
                for j in range(n_label_lin):
                    lbl = lin(lbl, hbase + 1 + lf + j)
                if cfg.label_sigmoid:
                    lbl = jax.nn.sigmoid(lbl)
                outs.append(lbl)
            rgb = lin(c, hbase + 1 + lf + n_label_lin)
        if cfg.rgb_sigmoid:
            rgb = jax.nn.sigmoid(rgb)
        outs.append(rgb)
        outs.append(sigma)
        res = jnp.concatenate(outs, axis=-1)
        out_ref[...] = res

    row_spec = lambda c: pl.BlockSpec(
        (tile, c), lambda t: (t, 0), memory_space=pltpu.VMEM)
    film_spec = lambda l: pl.BlockSpec(
        (1, l, h), lambda t: (t // tiles_per_b, 0, 0),
        memory_space=pltpu.VMEM)
    in_specs = [row_spec(3), row_spec(3)]
    if g:
        in_specs.append(row_spec(g))
    in_specs += [film_spec(lg), film_spec(lg),
                 film_spec(lc + lf), film_spec(lc + lf)]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, (lambda t: (0, 0)) if w.ndim == 2 else (lambda t: (0,)),
            memory_space=pltpu.VMEM))

    flops_per_pt = 2 * h * (
        h * (lg - 1 + lc - 1) + 6 + g
        + 1 + 3 + (cfg.label_hidden_layers * h + cfg.n_labels
                   if cfg.n_labels else 0))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * n_padded, out_dim), jnp.float32),
        grid=(b * tiles_per_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=b * n * flops_per_pt,
            bytes_accessed=b * n * (6 + g + out_dim) * 4,
            transcendentals=b * n * h * (lg + lc),
        ),
    )(*inputs, *weights)
    out = out.reshape(b, n_padded, out_dim)
    return out[:, :n] if pad_n else out
