"""Backward Pallas kernel + custom VJP for the fused FiLM-SIREN point MLP.

Training's G phase differentiates the field w.r.t. every weight, the film
activations (mapping-network outputs), and the sampled texture features.
This kernel computes all of those in ONE pass per point tile:

  * forward recompute in VMEM (remat): only the pre-sine values y_i are kept
    per layer; layer inputs x_i = sin(f*y + p) and the cos() factors are
    recomputed from them on the VPU.
  * per-layer math (g = dL/dx_i):
      s   = cos(f*y + p) * g
      dfreq  += sum_rows(s * y);  dphase += sum_rows(s)
      dy  = s * f
      dW  += x_{i-1}^T dy;        db += sum_rows(dy)
      g_{i-1} = dy W^T
  * gradient accumulation rides TPU Pallas' sequential grid: dW/db output
    blocks use constant index maps (resident across steps, flushed once),
    film-gradient blocks are batch-indexed (flushed at batch boundaries);
    each block is zeroed at its first visit with @pl.when.

film_mlp_trainable wraps forward+backward as a jax.custom_vjp matching
fields.apply_field numerics, so the trainer's differentiable generator
renders can use the fused kernel on TPU.
"""
from __future__ import annotations

import functools
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fenerf_tpu.nn.fields import FieldConfig
from fenerf_tpu.ops import film_mlp as fwdmod
from fenerf_tpu.ops.fast_math import _poly_sin, _reduce

DEFAULT_TILE = 256

# Transpose-elimination A/B knobs (scripts/profile_bwd_variants.py). The
# baseline kernel body executes TWO in-kernel transposes per linear layer per
# grid step — wrefs[wi][...].T for dy@W^T and xin.T for the dW accumulation —
# i.e. ~20 (256,256) VPU relayouts per tile, a candidate for the measured
# 5.5 Mpts/s (vs ~16 expected from the 3x-forward FLOP ratio).
#   FENERF_BWD_WT=1    feed pre-transposed bf16 weights as extra constant
#                      VMEM blocks (+~1.5MB) so dy@W^T is a plain MXU dot
#   FENERF_BWD_ACC0=1  accumulate dW with dot_general contracting axis 0
#                      (points) directly instead of materializing xin.T
# Numerics are bit-identical either way (same operands, same dtypes).
BWD_WT = os.environ.get("FENERF_BWD_WT", "0") == "1"
BWD_ACC0 = os.environ.get("FENERF_BWD_ACC0", "0") == "1"

# TIMING-ONLY ablation set (scripts/profile_bwd_ablate.py): members remove
# pieces of the kernel body to attribute per-grid-step cost. Results are
# NUMERICALLY WRONG with any member set — never enable outside profiling.
#   "acc"    skip dW/db accumulation entirely (the per-layer f32 RMW)
#   "resin"  feed ys[li] as the linear input (skips the xin sin recompute)
#   "film"   skip dfreq/dphase reductions
#   "cos"    use g directly as s (skips the cos recompute)
ABLATE: frozenset = frozenset()


def _fsin(v):
    return _poly_sin(_reduce(v))


def _fcos(v):
    return _poly_sin(_reduce(v + math.pi / 2.0))


def _flatten_layers(params: Any, cfg: FieldConfig):
    """[(w, b)] in order: trunk, color, sigma head, label head..., rgb head."""
    layers = [(l["w"], l["b"]) for l in params["trunk"]]
    layers += [(l["w"], l["b"]) for l in params["color"]]
    layers.append((params["sigma_head"]["w"], params["sigma_head"]["b"]))
    if cfg.n_labels:
        layers += [(l["w"], l["b"]) for l in params["label_head"]]
    layers.append((params["color_head"]["w"], params["color_head"]["b"]))
    return layers


def film_mlp_bwd(
    params: Any,
    cfg: FieldConfig,
    points: jax.Array,     # (B, N, 3) box-warped
    ray_dirs: jax.Array,   # (B, N, 3)
    grid_feats,            # (B, N, G) or None
    film_geo, film_app,    # raw (freqs, phases), (B, L*H)
    g_out: jax.Array,      # (B, N, out_dim) cotangent
    tile: int = DEFAULT_TILE,
    mm_dtype=jnp.bfloat16,
    wt_inputs: bool | None = None,
    acc_dot0: bool | None = None,
):
    """-> ([(dw, db)] per layer, dpoints, ddirs, dgf, dfg, dpg, dfa, dpa)."""
    wt = BWD_WT if wt_inputs is None else wt_inputs
    acc0 = BWD_ACC0 if acc_dot0 is None else acc_dot0
    b, n, _ = points.shape
    h = cfg.hidden_dim
    lg, lc = cfg.trunk_layers, cfg.color_layers
    g = cfg.grid_channels if (cfg.grid_channels and cfg.grid_to == "color") else 0
    assert fwdmod.supported_train(cfg)
    tile = min(tile, n)
    pad_n = (-n) % tile
    if pad_n:
        pad3 = lambda a: jnp.pad(a, ((0, 0), (0, pad_n), (0, 0)))
        points, ray_dirs, g_out = pad3(points), pad3(ray_dirs), pad3(g_out)
        if grid_feats is not None:
            grid_feats = pad3(grid_feats)
    n_pad = n + pad_n
    tiles_per_b = n_pad // tile

    fgr, pgr = film_geo
    far, par = film_app
    fgt = (fgr * cfg.freq_scale + cfg.freq_offset).reshape(b, lg, h)
    pgt = jnp.reshape(pgr, (b, lg, h))
    fat = (far * cfg.freq_scale + cfg.freq_offset).reshape(b, lc, h)
    pat = jnp.reshape(par, (b, lc, h))

    layers = _flatten_layers(params, cfg)
    n_film = lg + lc
    n_lin = len(layers)
    n_label_lin = (cfg.label_hidden_layers + 1) if cfg.n_labels else 0
    out_dim = cfg.output_dim
    in_dims = [w.shape[0] for w, _ in layers]
    out_dims = [w.shape[1] for w, _ in layers]

    weights = [w.astype(mm_dtype) for w, _ in layers]
    biases = [bb.astype(jnp.float32)[None, :] for _, bb in layers]
    # pre-transposed weights computed ONCE outside the kernel (XLA transpose,
    # fused into the weight cast) vs a per-grid-step in-kernel relayout
    weights_t = [w.T for w in weights] if wt else []

    inputs = [points.reshape(b * n_pad, 3), ray_dirs.reshape(b * n_pad, 3)]
    if g:
        inputs.append(grid_feats.reshape(b * n_pad, g))
    inputs.append(g_out.reshape(b * n_pad, out_dim))
    inputs += [fgt, pgt, fat, pat]
    inputs += weights + biases + weights_t

    def kernel(*refs):
        i = 0
        pts_ref = refs[i]; i += 1
        dirs_ref = refs[i]; i += 1
        gf_ref = None
        if g:
            gf_ref = refs[i]; i += 1
        gout_ref = refs[i]; i += 1
        fg_ref, pg_ref, fa_ref, pa_ref = refs[i:i + 4]; i += 4
        wrefs = refs[i:i + n_lin]; i += n_lin
        brefs = refs[i:i + n_lin]; i += n_lin
        wt_refs = None
        if wt:
            wt_refs = refs[i:i + n_lin]; i += n_lin
        dw_refs = refs[i:i + n_lin]; i += n_lin
        db_refs = refs[i:i + n_lin]; i += n_lin
        dfg_ref, dpg_ref, dfa_ref, dpa_ref = refs[i:i + 4]; i += 4
        dpts_ref = refs[i]; i += 1
        ddirs_ref = refs[i]; i += 1
        dgf_ref = refs[i] if g else None

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _zero_const():
            for r in list(dw_refs) + list(db_refs):
                r[...] = jnp.zeros_like(r)

        @pl.when(t % tiles_per_b == 0)
        def _zero_batch():
            for r in (dfg_ref, dpg_ref, dfa_ref, dpa_ref):
                r[...] = jnp.zeros_like(r)

        def mm(a, wi):
            return jnp.dot(a.astype(mm_dtype), wrefs[wi][...],
                           preferred_element_type=jnp.float32)

        def mm_t(a, wi):
            if wt:
                return jnp.dot(a.astype(mm_dtype), wt_refs[wi][...],
                               preferred_element_type=jnp.float32)
            return jnp.dot(a.astype(mm_dtype), wrefs[wi][...].T,
                           preferred_element_type=jnp.float32)

        def acc_lin(wi, xin, dy):
            if "acc" in ABLATE:
                return
            if acc0:
                dw_refs[wi][...] += jax.lax.dot_general(
                    xin.astype(mm_dtype), dy.astype(mm_dtype),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                dw_refs[wi][...] += jnp.dot(
                    xin.astype(mm_dtype).T, dy.astype(mm_dtype),
                    preferred_element_type=jnp.float32)
            db_refs[wi][...] += dy.sum(axis=0)[None, :]

        # ------------- forward recompute (stash pre-sine y per layer) ------
        x0 = pts_ref[...].astype(jnp.float32)
        ys = []
        x = x0
        for li in range(lg):
            y = mm(x, li) + brefs[li][...]
            ys.append(y)
            x = _fsin(fg_ref[0, li][None, :] * y + pg_ref[0, li][None, :])
        x_trunk = x

        d0 = dirs_ref[...].astype(jnp.float32)
        cin_parts = [d0] + ([gf_ref[...].astype(jnp.float32)] if g else []) \
            + [x_trunk]
        cin = jnp.concatenate(cin_parts, axis=-1)
        c = cin
        for li in range(lc):
            y = mm(c, lg + li) + brefs[lg + li][...]
            ys.append(y)
            c = _fsin(fa_ref[0, li][None, :] * y + pa_ref[0, li][None, :])

        lbl_ins = []
        lbl = x_trunk
        for j in range(n_label_lin):
            lbl_ins.append(lbl)
            lbl = mm(lbl, n_film + 1 + j) + brefs[n_film + 1 + j][...]
        rgb_pre = mm(c, n_film + 1 + n_label_lin) \
            + brefs[n_film + 1 + n_label_lin][...]

        def trunk_x(li):  # input of trunk layer li
            if li == 0:
                return x0
            y = ys[li - 1]
            if "resin" in ABLATE:
                return y
            return _fsin(fg_ref[0, li - 1][None, :] * y
                         + pg_ref[0, li - 1][None, :])

        def color_x(li):  # input of color layer li
            if li == 0:
                return cin
            y = ys[lg + li - 1]
            if "resin" in ABLATE:
                return y
            return _fsin(fa_ref[0, li - 1][None, :] * y
                         + pa_ref[0, li - 1][None, :])

        # ------------------------- backward -------------------------------
        gout = gout_ref[...].astype(jnp.float32)
        ofs = 0
        g_x_extra = jnp.zeros_like(x_trunk)
        if cfg.n_labels:
            g_lbl = gout[:, :cfg.n_labels]
            if cfg.label_sigmoid:
                sl = jax.nn.sigmoid(lbl)
                g_lbl = g_lbl * sl * (1 - sl)
            ofs = cfg.n_labels
            gl = g_lbl
            for j in range(n_label_lin - 1, -1, -1):
                acc_lin(n_film + 1 + j, lbl_ins[j], gl)
                gl = mm_t(gl, n_film + 1 + j)
            g_x_extra += gl
        g_rgb = gout[:, ofs:ofs + cfg.rgb_dim]
        if cfg.rgb_sigmoid:
            sr = jax.nn.sigmoid(rgb_pre)
            g_rgb = g_rgb * sr * (1 - sr)
        g_sig = gout[:, -1:]

        acc_lin(n_film + 1 + n_label_lin, c, g_rgb)   # rgb head
        g_c = mm_t(g_rgb, n_film + 1 + n_label_lin)
        acc_lin(n_film, x_trunk, g_sig)               # sigma head
        g_x_extra += mm_t(g_sig, n_film)

        for li in range(lc - 1, -1, -1):
            y = ys[lg + li]
            f = fa_ref[0, li][None, :]
            p = pa_ref[0, li][None, :]
            s = g_c if "cos" in ABLATE else _fcos(f * y + p) * g_c
            if "film" not in ABLATE:
                dfa_ref[0, li, :] += (s * y).sum(axis=0)
                dpa_ref[0, li, :] += s.sum(axis=0)
            dy = s * f
            acc_lin(lg + li, color_x(li), dy)
            g_c = mm_t(dy, lg + li)
        ddirs_ref[...] = g_c[:, :3]
        if g:
            dgf_ref[...] = g_c[:, 3:3 + g]
        g_x = g_x_extra + g_c[:, 3 + g:]

        for li in range(lg - 1, -1, -1):
            y = ys[li]
            f = fg_ref[0, li][None, :]
            p = pg_ref[0, li][None, :]
            s = g_x if "cos" in ABLATE else _fcos(f * y + p) * g_x
            if "film" not in ABLATE:
                dfg_ref[0, li, :] += (s * y).sum(axis=0)
                dpg_ref[0, li, :] += s.sum(axis=0)
            dy = s * f
            acc_lin(li, trunk_x(li), dy)
            g_x = mm_t(dy, li)
        dpts_ref[...] = g_x

    # --------------------------- specs ------------------------------------
    row = lambda c_: pl.BlockSpec((tile, c_), lambda t: (t, 0),
                                  memory_space=pltpu.VMEM)
    filmspec = lambda l: pl.BlockSpec(
        (1, l, h), lambda t: (t // tiles_per_b, 0, 0),
        memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, (lambda t: tuple(0 for _ in shape)),
                            memory_space=pltpu.VMEM)

    in_specs = [row(3), row(3)]
    if g:
        in_specs.append(row(g))
    in_specs += [row(out_dim), filmspec(lg), filmspec(lg), filmspec(lc),
                 filmspec(lc)]
    in_specs += [const_spec(w.shape) for w in weights]
    in_specs += [const_spec(bb.shape) for bb in biases]
    in_specs += [const_spec(w.shape) for w in weights_t]

    out_shapes = (
        [jax.ShapeDtypeStruct((i_, o_), jnp.float32)
         for i_, o_ in zip(in_dims, out_dims)]
        + [jax.ShapeDtypeStruct((1, o_), jnp.float32) for o_ in out_dims]
        + [jax.ShapeDtypeStruct((b, lg, h), jnp.float32),
           jax.ShapeDtypeStruct((b, lg, h), jnp.float32),
           jax.ShapeDtypeStruct((b, lc, h), jnp.float32),
           jax.ShapeDtypeStruct((b, lc, h), jnp.float32)]
        + [jax.ShapeDtypeStruct((b * n_pad, 3), jnp.float32),
           jax.ShapeDtypeStruct((b * n_pad, 3), jnp.float32)]
        + ([jax.ShapeDtypeStruct((b * n_pad, g), jnp.float32)] if g else [])
    )
    out_specs = (
        [const_spec((i_, o_)) for i_, o_ in zip(in_dims, out_dims)]
        + [const_spec((1, o_)) for o_ in out_dims]
        + [filmspec(lg), filmspec(lg), filmspec(lc), filmspec(lc)]
        + [row(3), row(3)]
        + ([row(g)] if g else [])
    )

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(b * tiles_per_b,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )(*inputs)

    dws = outs[:n_lin]
    dbs = [x[0] for x in outs[n_lin:2 * n_lin]]
    dfg_t, dpg_t, dfa_t, dpa_t = outs[2 * n_lin:2 * n_lin + 4]
    dpts = outs[2 * n_lin + 4].reshape(b, n_pad, 3)[:, :n]
    ddirs = outs[2 * n_lin + 5].reshape(b, n_pad, 3)[:, :n]
    dgf = (outs[2 * n_lin + 6].reshape(b, n_pad, g)[:, :n] if g else None)

    dfg = (dfg_t * cfg.freq_scale).reshape(b, lg * h)
    dpg = dpg_t.reshape(b, lg * h)
    dfa = (dfa_t * cfg.freq_scale).reshape(b, lc * h)
    dpa = dpa_t.reshape(b, lc * h)
    return list(zip(dws, dbs)), dpts, ddirs, dgf, dfg, dpg, dfa, dpa


# ---------------------------------------------------------------------------
# custom VJP entry
# ---------------------------------------------------------------------------

def _unflatten_grads(dlayers, params, cfg: FieldConfig):
    """[(dw, db)] (forward order) -> params-shaped pytree of gradients."""
    i = 0
    out: dict[str, Any] = {}
    out["trunk"] = []
    for _ in params["trunk"]:
        out["trunk"].append({"w": dlayers[i][0], "b": dlayers[i][1]})
        i += 1
    out["color"] = []
    for _ in params["color"]:
        out["color"].append({"w": dlayers[i][0], "b": dlayers[i][1]})
        i += 1
    out["sigma_head"] = {"w": dlayers[i][0], "b": dlayers[i][1]}
    i += 1
    if cfg.n_labels:
        out["label_head"] = []
        for _ in params["label_head"]:
            out["label_head"].append({"w": dlayers[i][0], "b": dlayers[i][1]})
            i += 1
    out["color_head"] = {"w": dlayers[i][0], "b": dlayers[i][1]}
    i += 1
    # non-MLP leaves (mapping nets, grid) receive zeros here; their grads
    # flow through film/grid_feats cotangents instead
    for k in params:
        if k not in out:
            out[k] = jax.tree.map(jnp.zeros_like, params[k])
    return out


@functools.lru_cache(maxsize=None)
def make_film_mlp_trainable(cfg: FieldConfig, tile_fwd: int | None = None,
                            tile_bwd: int = DEFAULT_TILE):
    """Returns film_fn(params, points, dirs, grid_feats, fg, pg, fa, pa) ->
    (B, N, out_dim) with a fused Pallas forward AND backward.

    points must be pre-box-warped; grid_feats pre-sampled (their producers —
    the warp and grid_sample — differentiate outside the kernel; the kernel's
    dpoints/dgf cotangents chain into them).

    Cached per (cfg, tiles) — FieldConfig is a frozen dataclass — so repeat
    apply_field calls reuse one custom_vjp wrapper instead of rebuilding the
    closures every evaluation.
    """
    fwd_kw = {"tile": tile_fwd} if tile_fwd else {}

    @jax.custom_vjp
    def film_fn(mlp_params, points, dirs, gf, fg, pg, fa, pa):
        return fwdmod.film_mlp(mlp_params, cfg, points, dirs, gf, (fg, pg),
                               (fa, pa), **fwd_kw)

    def fwd(mlp_params, points, dirs, gf, fg, pg, fa, pa):
        out = film_fn(mlp_params, points, dirs, gf, fg, pg, fa, pa)
        return out, (mlp_params, points, dirs, gf, fg, pg, fa, pa)

    def bwd(res, g_out):
        mlp_params, points, dirs, gf, fg, pg, fa, pa = res
        dlayers, dpts, ddirs, dgf, dfg, dpg, dfa, dpa = film_mlp_bwd(
            mlp_params, cfg, points, dirs, gf, (fg, pg), (fa, pa), g_out,
            tile=tile_bwd)
        dparams = _unflatten_grads(dlayers, mlp_params, cfg)
        if dgf is None and gf is not None:
            dgf = jnp.zeros_like(gf)
        return (dparams, dpts, ddirs, dgf, dfg, dpg, dfa, dpa)

    film_fn.defvjp(fwd, bwd)
    return film_fn
