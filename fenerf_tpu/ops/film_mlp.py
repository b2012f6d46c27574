"""Fused FiLM-SIREN point-evaluation kernel (Pallas, TPU).

This is the TPU-native replacement for the reference's custom CUDA layer
(siren/op/*.cu fuse bias+activation; here we fuse the ENTIRE field network):
one kernel evaluates trunk (8 FiLM layers) + sigma/label heads + color branch
(3 FiLM layers) + rgb head for a tile of points, keeping every intermediate
activation in VMEM. The XLA path writes each (N, H) activation to HBM between
matmuls (~12 round trips per point); here HBM traffic is points in + channels
out + weights once per batch element.

Key transforms:
  * FiLM folding: sin(freq*(xW+b)+phase) == sin(x(W*freq) + (b*freq+phase)) -
    freq/phase are per-(batch, layer, channel) constants, so they fold into
    per-batch weights W' and biases b' OUTSIDE the kernel, deleting the FiLM
    multiply-add from the inner loop entirely.
  * fast sin: range-reduced degree-11 polynomial (ops/fast_math.py) - sin
    dominates the VPU budget of this network.
  * the color-branch concat [ray_dir | grid_feats | x] is realized as
    row-split matmuls (W' rows [0:3], [3:3+G], [3+G:]) - no concat in VMEM.
  * weights bf16 (MXU), biases/activations f32.

Forward-only: training uses the XLA path (autodiff); inference/eval/bench
route here (fields.apply_field(..., backend='pallas') via RenderConfig).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fenerf_tpu.nn.fields import FieldConfig
from fenerf_tpu.ops.fast_math import _poly_sin, _reduce

DEFAULT_TILE = 2048


def _fsin(x):
    return _poly_sin(_reduce(x))


def supported(cfg: FieldConfig) -> bool:
    """Which variants the kernel covers (others fall back to XLA)."""
    return (
        cfg.use_ray_dir
        and not (cfg.grid_channels and cfg.grid_to == "trunk")
        and not cfg.single_latent
        and not cfg.label_film
    )


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
    g = cfg.grid_channels if (cfg.grid_channels and cfg.grid_to == "color") else 0
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
    fg = (fg * cfg.freq_scale + cfg.freq_offset).reshape(b, lg, h)
    pg = jnp.reshape(pg, (b, lg, h))
    fa = (fa * cfg.freq_scale + cfg.freq_offset).reshape(b, lc, h)
    pa = jnp.reshape(pa, (b, lc, h))

    # ---- FiLM folding: per-batch weights W*freq, biases b*freq+phase ----
    film_w = []   # (B, In_i, H) bf16
    film_b = []   # (B, H) f32
    for i, lyr in enumerate(params["trunk"]):
        film_w.append((lyr["w"][None] * fg[:, i][:, None, :]).astype(jnp.bfloat16))
        film_b.append((lyr["b"][None] * fg[:, i] + pg[:, i])[:, None, :])
    for i, lyr in enumerate(params["color"]):
        film_w.append((lyr["w"][None] * fa[:, i][:, None, :]).astype(jnp.bfloat16))
        film_b.append((lyr["b"][None] * fa[:, i] + pa[:, i])[:, None, :])
    # biases carried as (B, 1, H): TPU blocks need the last two dims to tile

    heads = [params["sigma_head"]]
    if cfg.n_labels:
        heads += list(params["label_head"])
    heads.append(params["color_head"])
    head_w = [lyr["w"].astype(jnp.bfloat16) for lyr in heads]
    head_b = [lyr["b"].astype(jnp.float32)[None, :] for lyr in heads]

    pts2 = points.reshape(b * n_padded, 3)
    dirs2 = ray_dirs.reshape(b * n_padded, 3)
    inputs = [pts2, dirs2]
    if g:
        inputs.append(grid_feats.reshape(b * n_padded, g))
    inputs += film_w + film_b + head_w + head_b

    n_label_lin = (cfg.label_hidden_layers + 1) if cfg.n_labels else 0
    out_dim = cfg.output_dim
    out_pad = ((out_dim + 127) // 128) * 128
    n_film = lg + lc
    n_head = len(heads)

    def kernel(*refs):
        i = 0
        pts_ref = refs[i]; i += 1
        dirs_ref = refs[i]; i += 1
        gf_ref = None
        if g:
            gf_ref = refs[i]; i += 1
        fw = refs[i:i + n_film]; i += n_film
        fb = refs[i:i + n_film]; i += n_film
        hw = refs[i:i + n_head]; i += n_head
        hb = refs[i:i + n_head]; i += n_head
        out_ref = refs[i]

        def film(x, li):
            y = jnp.dot(x.astype(jnp.bfloat16), fw[li][0],
                        preferred_element_type=jnp.float32)
            return _fsin(y + fb[li][0])

        def head(x, hi):
            y = jnp.dot(x.astype(jnp.bfloat16), hw[hi][...],
                        preferred_element_type=jnp.float32)
            return y + hb[hi][...]

        x = pts_ref[...].astype(jnp.float32)
        for li in range(lg):
            x = film(x, li)

        # color branch input rows: [ray_dir(3) | grid(G) | x(H)]
        w0 = fw[lg][0]
        y = jnp.dot(dirs_ref[...].astype(jnp.bfloat16), w0[:3],
                    preferred_element_type=jnp.float32)
        if g:
            y = y + jnp.dot(gf_ref[...].astype(jnp.bfloat16), w0[3:3 + g],
                            preferred_element_type=jnp.float32)
        y = y + jnp.dot(x.astype(jnp.bfloat16), w0[3 + g:],
                        preferred_element_type=jnp.float32)
        c = _fsin(y + fb[lg][0])
        for li in range(1, lc):
            c = film(c, lg + li)

        sigma = head(x, 0)
        outs = []
        if n_label_lin:
            lbl = x
            for j in range(n_label_lin):
                lbl = head(lbl, 1 + j)
            if cfg.label_sigmoid:
                lbl = jax.nn.sigmoid(lbl)
            outs.append(lbl)
        rgb = head(c, 1 + n_label_lin)
        if cfg.rgb_sigmoid:
            rgb = jax.nn.sigmoid(rgb)
        outs.append(rgb)
        outs.append(sigma)
        res = jnp.concatenate(outs, axis=-1)
        out_ref[...] = jnp.pad(res, ((0, 0), (0, out_pad - out_dim)))

    row_spec = lambda c_: pl.BlockSpec(
        (tile, c_), lambda t: (t, 0), memory_space=pltpu.VMEM)
    batch_spec = lambda shape: pl.BlockSpec(
        (1,) + shape[1:],
        lambda t: (t // tiles_per_b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    const_spec = lambda w: pl.BlockSpec(
        w.shape, (lambda t: tuple(0 for _ in w.shape)),
        memory_space=pltpu.VMEM)

    in_specs = [row_spec(3), row_spec(3)]
    if g:
        in_specs.append(row_spec(g))
    in_specs += [batch_spec(w.shape) for w in film_w]
    in_specs += [batch_spec(bb.shape) for bb in film_b]
    in_specs += [const_spec(w) for w in head_w]
    in_specs += [const_spec(bb) for bb in head_b]

    flops_per_pt = 2 * h * (
        h * (lg - 1 + lc - 1) + 6 + g
        + 1 + 3 + (cfg.label_hidden_layers * h + cfg.n_labels
                   if cfg.n_labels else 0))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * n_padded, out_pad), jnp.float32),
        grid=(b * tiles_per_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_pad), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=b * n * flops_per_pt,
            bytes_accessed=b * n * (6 + g + out_pad) * 4,
            transcendentals=b * n * h * (lg + lc),
        ),
    )(*inputs)
    out = out[:, :out_dim].reshape(b, n_padded, out_dim)
    return out[:, :n] if pad_n else out
