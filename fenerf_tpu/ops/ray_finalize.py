"""Fused per-ray hierarchical-rendering kernels (Pallas, TPU).

Round-2 graph-level ablations (PROFILE_HIER.json) localized ~544ms of the
2884ms batch-64 flagship render to the hierarchical machinery BETWEEN the two
field evaluations — not to its FLOPs (the explicit ops micro-time at ~47ms)
but to XLA fusion breaks: the merge permutation / sample_pdf picks dispatch
one-hot matmuls to the MXU, which cannot fuse with their elementwise
producers, so every (..., 2S, 2S) operand round-trips HBM. Another ~246ms
ablation sat on the fill/softmax epilogue.

These two kernels subsume ALL of it, keeping every per-ray intermediate in
VMEM:

  ray_resample   coarse sigma + z -> proposal weights -> inverse-CDF
                 importance resample -> fine_z.
                 (reference: fancy_integration weights, volumetric_rendering
                 .py:18-51, feeding sample_pdf :259-300 inside the no_grad
                 proposal block, generators.py:483-502)

  ray_finalize   coarse+fine outputs/z -> stable depth ranks -> sorted-order
                 compositing -> fill epilogue (+ optional label softmax),
                 emitting (comp, depth, weights_sum).
                 (reference: the concat+sort+gather at generators.py:508-512
                 followed by fancy_integration :18-106 incl. fill modes)

Both use the ORDER-INDEPENDENT formulation (core/integrate.py::
composite_merged_nosort): transmittance is a masked product over "j precedes
i", delta a rank match, compositing a plain sum — no permutation, no gather,
no matmul. The (tile, 2S, 2S) comparison squares live only in VMEM/vregs.

ray_finalize_vjp wraps the forward kernel in a custom VJP whose backward
recomputes through the fusible XLA nosort path — the same structure serves
training's G phase (the reference trainer's differentiable rollout,
train_double_latent_semantic.py:401-457).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fenerf_tpu.core import integrate as integ

RESAMPLE_TILE = 512
FINALIZE_TILE = 64


def _act(sigma, clamp_mode):
    if clamp_mode == "softplus":
        return jax.nn.softplus(sigma)
    if clamp_mode == "relu":
        return jax.nn.relu(sigma)
    raise ValueError(f"unknown clamp_mode {clamp_mode!r}")


def _lane_iota(rows, width):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)


def _shift_right(x, sh, iota):
    """x shifted +sh along lanes with zero fill (non-circular).

    pltpu.roll only takes non-negative shifts and is circular; masking the
    wrapped lanes recovers the plain shift. Mosaic-2D-safe (no concat)."""
    return jnp.where(iota >= sh, pltpu.roll(x, sh, 1), 0.0)


def _cumsum_lanes(x, width, iota, exclusive=False):
    """Prefix sum along the lane axis via Hillis-Steele doubling — 2D vector
    ops only (Mosaic materializes rank-3 masked-reduce formulations at full
    tile size, blowing VMEM; 5 rolls do the same job in-register)."""
    sh = 1
    while sh < width:
        x = x + _shift_right(x, sh, iota)
        sh *= 2
    if exclusive:
        x = _shift_right(x, 1, iota)
    return x


def _flatten_rows(a, keep_dims):
    """(B, R, ...) -> (B*R, ...) keeping the trailing keep_dims dims."""
    return a.reshape((-1,) + a.shape[a.ndim - keep_dims:])


def _pad_rows(a, pad):
    return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)) if pad else a


# ---------------------------------------------------------------------------
# proposal + importance resampling
# ---------------------------------------------------------------------------

def ray_resample(
    sigma: jax.Array,        # (B, R, S) coarse sigmas (caller stop-grads)
    z_vals: jax.Array,       # (B, R, S) sorted
    noise: jax.Array | None,  # (B, R, S) PRE-SCALED sigma noise, or None
    u: jax.Array,            # (B, R, n_importance) uniforms
    clamp_mode: str = "relu",
    tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """-> (B, R, n_importance) importance-sampled z positions.

    Semantics: integrate_weights(sigma, z, noise) -> w; sample_pdf(
    midpoints(z), (w + 1e-5)[..., 1:-1], u) exactly as the XLA proposal path
    in models/generator.py::_shade_rays (incl. the double eps: +1e-5 outside
    sample_pdf, +1e-5 inside)."""
    b, r, s = sigma.shape
    n_imp = u.shape[-1]
    tile = RESAMPLE_TILE if tile is None else tile
    m = s - 1            # number of bins (midpoints)
    rows = b * r
    tile = min(tile, rows)
    pad = (-rows) % tile

    sig2 = _pad_rows(_flatten_rows(sigma, 1), pad)
    z2 = _pad_rows(_flatten_rows(z_vals, 1), pad)
    u2 = _pad_rows(_flatten_rows(u, 1), pad)
    inputs = [sig2, z2, u2]
    if noise is not None:
        inputs.append(_pad_rows(_flatten_rows(noise, 1), pad))

    def kernel(*refs):
        # ALL ops 2D (RB, <=S lanes): Mosaic materializes every rank-3
        # intermediate at full tile size (measured 130MB of register spill
        # at tile 128 for the (tile, S, S) formulation), so the per-sample
        # axis is handled by lane rolls + a python-unrolled pick loop.
        sig_ref, z_ref, u_ref = refs[0], refs[1], refs[2]
        out_ref = refs[-1]
        z = z_ref[...]
        rb = z.shape[0]
        iota = _lane_iota(rb, s)
        sig = sig_ref[...]
        if noise is not None:
            sig = sig + refs[3][...]
        act = _act(sig, clamp_mode)
        # delta_k = z_{k+1} - z_k (z sorted); last lane 1e10
        z_next = pltpu.roll(z, s - 1, 1)     # z_next[k] = z[k+1] (circular)
        deltas = jnp.where(iota == s - 1, 1e10, z_next - z)
        alphas = 1.0 - jnp.exp(-deltas * act)
        om = 1.0 - alphas + 1e-10
        # exclusive cumprod in log space via lane prefix-sum (no reduce_prod
        # in Mosaic; om >= 1e-10 keeps the log finite; deviations are
        # ~1 ulp/term vs the XLA cumprod, inside the parity tolerances)
        trans = jnp.exp(_cumsum_lanes(jnp.log(om), s, iota, exclusive=True))
        w = alphas * trans

        bins = 0.5 * (z + z_next)            # lanes 0..M-1 valid
        # proposal weights w[1:-1] (+1e-5 outside sample_pdf, +1e-5 inside);
        # stay at width s with dead lanes zeroed
        interior = (iota >= 1) & (iota <= s - 2)
        wm = jnp.where(interior, w + 1e-5 + 1e-5, 0.0)
        pdf_sum = jnp.sum(wm, axis=-1, keepdims=True)
        pdf = wm / pdf_sum                   # lanes 1..s-2 hold pdf_0..pdf_{M-2}
        # cdf_k = sum_{j<k} pdf_j for k in 0..M-1, aligned so that lane k of
        # `cdfs` = cdf_k: inclusive prefix of pdf shifted by construction
        # (pdf_j lives at lane j+1, so the INCLUSIVE prefix at lane k sums
        # pdf_0..pdf_{k-1} — exactly the exclusive cdf with leading 0)
        cdfs = _cumsum_lanes(pdf, s, iota)   # lane k = cdf_k; lane s-1 = 1.0
        valid_m = iota <= m - 1              # cdf/bins defined on M lanes

        uu = u_ref[...]
        for k in range(n_imp):
            u_k = uu[:, k:k + 1]                               # (RB, 1)
            lt = jnp.where(valid_m, (cdfs < u_k).astype(jnp.int32), 0)
            inds = jnp.sum(lt, axis=-1, keepdims=True)
            below = jnp.clip(inds - 1, 0, m - 1)
            above = jnp.clip(inds, 0, m - 1)
            pick = lambda idx, v: jnp.sum(
                jnp.where(iota == idx, v, 0.0), axis=-1, keepdims=True)
            cdf_b, cdf_a = pick(below, cdfs), pick(above, cdfs)
            bins_b, bins_a = pick(below, bins), pick(above, bins)
            denom = cdf_a - cdf_b
            denom = jnp.where(denom < 1e-5, 1.0, denom)
            out_ref[:, k:k + 1] = (
                bins_b + (u_k - cdf_b) / denom * (bins_a - bins_b))

    row = lambda c: pl.BlockSpec((tile, c), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [row(s), row(s), row(n_imp)] + ([row(s)] if noise is not None
                                               else [])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows + pad, n_imp), jnp.float32),
        grid=((rows + pad) // tile,),
        in_specs=in_specs,
        out_specs=row(n_imp),
        interpret=interpret,
    )(*inputs)
    return out[:rows].reshape(b, r, n_imp)


# ---------------------------------------------------------------------------
# merge + final integrate + fill (+ softmax) epilogue
# ---------------------------------------------------------------------------

def _fill_softmax_epilogue(comp, wsum, fill_mode, fill_color, softmax_label,
                           rgb_dim):
    """Shared epilogue math (identical in-kernel and in the XLA/VJP path):
    integ.apply_fill then the optional per-ray label softmax (the epilogue
    render_core used to apply; folded here so the fused kernel can emit
    final channels)."""
    comp = integ.apply_fill(comp, wsum, fill_mode, fill_color)
    if softmax_label:
        seg, rgb = comp[..., :-rgb_dim], comp[..., -rgb_dim:]
        comp = jnp.concatenate([jax.nn.softmax(seg, axis=-1), rgb], axis=-1)
    return comp


def filled_channels(c: int, fill_mode: str | None) -> int:
    """Output channel count after the fill epilogue (seg padding adds a
    background-label channel, integrate.apply_fill)."""
    pads = fill_mode in ("seg_padding_background", "eval_seg_padding_background")
    return c + 1 if pads else c


def ray_finalize(
    fine_out: jax.Array,     # (B, R, S_f, C+1) unsorted importance samples
    coarse_out: jax.Array,   # (B, R, S_c, C+1) — coarse_z sorted
    fine_z: jax.Array,       # (B, R, S_f)
    coarse_z: jax.Array,     # (B, R, S_c)
    noise: jax.Array | None,  # (B, R, S_f+S_c) PRE-SCALED, sorted-pos indexed
    clamp_mode: str = "relu",
    last_back: bool = False,
    white_back: bool = False,
    black_back: bool = False,
    fill_mode: str | None = None,
    fill_color: str = "black",
    softmax_label: bool = False,
    rgb_dim: int = 3,
    tile: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (comp (B, R, C_out), depth (B, R), weights_sum (B, R)).

    One VMEM-resident pass per ray tile: stable ranks by comparison counting,
    order-independent compositing (see composite_merged_nosort), fill +
    softmax epilogue. Matches apply_fill(composite_merged(...)) semantics
    (reference generators.py:508-527 + volumetric_rendering.py:18-106)."""
    b, r, sf, c1 = fine_out.shape
    sc = coarse_out.shape[2]
    s = sf + sc
    tile = FINALIZE_TILE if tile is None else tile
    c_out = filled_channels(c1 - 1, fill_mode)
    rows = b * r
    tile = min(tile, rows)
    pad = (-rows) % tile

    # pre-concatenate the per-ray VECTORS outside the kernel (tiny (rows, 2S)
    # tensors; the XLA concat fuses with its producers). In-kernel lane
    # concat of two S-wide operands HANGS the Mosaic compiler on this stack
    # (measured: 24+24 lane concat never returns; width-1 concat and static
    # lane slices are fine) — so the kernel takes all_z / sigma / noise
    # already concatenated [fine | coarse] and the channel blocks separately,
    # composing via two partial sums instead of a (tile, 2S, C) concat.
    all_z = jnp.concatenate([fine_z, coarse_z], axis=-1)
    sigma_all = jnp.concatenate(
        [fine_out[..., -1], coarse_out[..., -1]], axis=-1)
    az = _pad_rows(_flatten_rows(all_z, 1), pad)
    sg = _pad_rows(_flatten_rows(sigma_all, 1), pad)
    fo = _pad_rows(_flatten_rows(fine_out[..., :-1], 2), pad)
    co = _pad_rows(_flatten_rows(coarse_out[..., :-1], 2), pad)
    inputs = [az, sg, fo, co]
    if noise is not None:
        inputs.append(_pad_rows(_flatten_rows(noise, 1), pad))

    def kernel(*refs):
        # per-sample axis handled by python-unrolled loops over 2D (RB, 2S)
        # vectors + VMEM scratch accumulators — a vectorized (RB, 2S, 2S)
        # formulation makes Mosaic materialize every mask at full tile size
        # (130MB spill at tile 128, measured)
        az_ref, sg_ref, fo_ref, co_ref = refs[:4]
        has_noise = noise is not None
        nz_ref = refs[4] if has_noise else None
        comp_ref, depth_ref, wsum_ref = refs[-5], refs[-4], refs[-3]
        rank_ref, acc_ref = refs[-2], refs[-1]
        all_z = az_ref[...]
        rb = all_z.shape[0]
        iota = _lane_iota(rb, s)

        def before_mask(i):
            zi = all_z[:, i:i + 1]
            return (all_z < zi) | ((all_z == zi) & (iota < i))

        # pass 1: stable ranks (comparison counting per sample)
        for i in range(s):
            rank_ref[:, i:i + 1] = jnp.sum(
                before_mask(i).astype(jnp.int32), axis=-1, keepdims=True)
        rank = rank_ref[...]

        # pass 2: delta = z of the rank-successor minus own z
        for i in range(s):
            r_i = rank[:, i:i + 1]
            acc_ref[:, i:i + 1] = jnp.sum(
                jnp.where(rank == r_i + 1, all_z, 0.0),
                axis=-1, keepdims=True)
        deltas = jnp.where(rank == s - 1, 1e10, acc_ref[...] - all_z)

        sigma = sg_ref[...]
        if has_noise:
            # sorted-position noise: sample i draws noise[rank_i]
            nz = nz_ref[...]
            for i in range(s):
                r_i = rank[:, i:i + 1]
                acc_ref[:, i:i + 1] = jnp.sum(
                    jnp.where(iota == r_i, nz, 0.0), axis=-1, keepdims=True)
            sigma = sigma + acc_ref[...]
        act = _act(sigma, clamp_mode)
        alphas = 1.0 - jnp.exp(-deltas * act)
        log_om = jnp.log(1.0 - alphas + 1e-10)

        # pass 3: transmittance = exp(sum of log_om over predecessors)
        for i in range(s):
            acc_ref[:, i:i + 1] = jnp.sum(
                jnp.where(before_mask(i), log_om, 0.0),
                axis=-1, keepdims=True)
        w = alphas * jnp.exp(acc_ref[...])
        wsum = jnp.sum(w, axis=-1, keepdims=True)          # (RB, 1)
        if last_back:
            w = w + jnp.where(rank == s - 1, 1.0 - wsum, 0.0)
        # compositing as an unrolled sum of 2D FMAs: slicing one sample
        # (rank-2 load at a static mid index) is supported; the rank-3
        # broadcast w[:, :sf, None] * fo_ref[...] lowers to a Mosaic gather
        # that fails shape checking (measured on this stack)
        comp = w[:, 0:1] * fo_ref[:, 0, :]
        for i in range(1, sf):
            comp = comp + w[:, i:i + 1] * fo_ref[:, i, :]
        for i in range(sc):
            comp = comp + w[:, sf + i:sf + i + 1] * co_ref[:, i, :]
        depth = jnp.sum(w * all_z, axis=-1, keepdims=True)
        if white_back:
            comp = comp + (1.0 - wsum)
        if black_back:
            comp = comp - (1.0 - wsum)

        # fill (+ softmax) epilogue, 2D in-kernel form of
        # _fill_softmax_epilogue (width-1 lane concats only; the softmax is
        # done in place with a channel mask instead of a split+concat)
        low = wsum < 0.9                                   # (RB, 1)
        if fill_mode in ("seg_padding_background",
                         "eval_seg_padding_background"):
            fillv = integ._FILL_VALUES[fill_color]
            bg = jnp.where(low, 1.0, 0.0)
            rest = jnp.where(low, fillv, comp)
            comp = jnp.concatenate([bg, rest], axis=-1)    # 1 + C
        elif fill_mode == "eval_white_back":
            comp = jnp.where(low, 1.0, comp)
        elif fill_mode in ("debug", "weight_debug"):
            first = jnp.where(low, 1.0, comp[:, :1])
            rest = jnp.where(low, 0.0, comp[:, 1:])
            comp = jnp.concatenate([first, rest], axis=-1)
        if softmax_label:
            n_seg = c_out - rgb_dim
            cm = _lane_iota(comp.shape[0], c_out) < n_seg
            mx = jnp.max(jnp.where(cm, comp, -jnp.inf), axis=-1,
                         keepdims=True)
            e = jnp.where(cm, jnp.exp(comp - mx), 0.0)
            comp = jnp.where(cm, e / jnp.sum(e, axis=-1, keepdims=True),
                             comp)
        comp_ref[...] = comp
        depth_ref[...] = depth
        wsum_ref[...] = wsum

    row = lambda c: pl.BlockSpec((tile, c), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM)
    ch = lambda ss: pl.BlockSpec((tile, ss, c1 - 1), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [row(s), row(s), ch(sf), ch(sc)]
    if noise is not None:
        in_specs.append(row(s))
    n_rows = rows + pad
    comp, depth, wsum = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_rows, c_out), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, 1), jnp.float32)),
        grid=(n_rows // tile,),
        in_specs=in_specs,
        out_specs=(row(c_out), row(1), row(1)),
        scratch_shapes=[pltpu.VMEM((tile, s), jnp.int32),
                        pltpu.VMEM((tile, s), jnp.float32)],
        interpret=interpret,
    )(*inputs)
    return (comp[:rows].reshape(b, r, c_out),
            depth[:rows, 0].reshape(b, r),
            wsum[:rows, 0].reshape(b, r))


def _finalize_xla(fine_out, coarse_out, fine_z, coarse_z, noise, *,
                  clamp_mode, last_back, white_back, black_back,
                  fill_mode, fill_color, softmax_label, rgb_dim):
    """The same math through the fusible XLA nosort path (noise PRE-scaled —
    noise_std=1.0). Serves as the kernel's VJP recompute and the CPU/interpret
    reference."""
    res = integ.composite_merged_nosort(
        fine_out, coarse_out, fine_z, coarse_z, noise=noise, noise_std=1.0,
        clamp_mode=clamp_mode, last_back=last_back, white_back=white_back,
        black_back=black_back)
    comp = _fill_softmax_epilogue(res.comp, res.weights_sum, fill_mode,
                                  fill_color, softmax_label, rgb_dim)
    return comp, res.depth, res.weights_sum


def ray_finalize_vjp(fine_out, coarse_out, fine_z, coarse_z, noise, *,
                     clamp_mode="relu", last_back=False, white_back=False,
                     black_back=False, fill_mode=None, fill_color="black",
                     softmax_label=False, rgb_dim=3, tile=None,
                     interpret=False):
    """ray_finalize with a training-grade backward: the forward runs the
    fused Pallas kernel; the VJP recomputes through the XLA nosort graph
    (cheap — the expensive field evals are upstream) and differentiates
    that. Equal values up to f32 association order; the gradient is the
    exact gradient of the XLA-path math (cf. BASELINE.md fused-backward
    audit for the precedent)."""
    static = dict(clamp_mode=clamp_mode, last_back=last_back,
                  white_back=white_back, black_back=black_back,
                  fill_mode=fill_mode, fill_color=fill_color,
                  softmax_label=softmax_label, rgb_dim=rgb_dim)

    if noise is None:
        # noise-free variant (static-eval renders, and the GAN-inversion
        # loop which differentiates a noise_std=0 render) — same VJP
        # structure without the noise operand
        @jax.custom_vjp
        def fn0(fo, co, fz, cz):
            return ray_finalize(fo, co, fz, cz, None, tile=tile,
                                interpret=interpret, **static)

        def fwd0(fo, co, fz, cz):
            return fn0(fo, co, fz, cz), (fo, co, fz, cz)

        def bwd0(resid, g):
            _, vjp = jax.vjp(
                lambda *a: _finalize_xla(*a, None, **static), *resid)
            return vjp(g)

        fn0.defvjp(fwd0, bwd0)
        return fn0(fine_out, coarse_out, fine_z, coarse_z)

    @jax.custom_vjp
    def fn(fo, co, fz, cz, nz):
        return ray_finalize(fo, co, fz, cz, nz, tile=tile,
                            interpret=interpret, **static)

    def fwd(fo, co, fz, cz, nz):
        return fn(fo, co, fz, cz, nz), (fo, co, fz, cz, nz)

    def bwd(resid, g):
        _, vjp = jax.vjp(
            lambda *a: _finalize_xla(*a, **static), *resid)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn(fine_out, coarse_out, fine_z, coarse_z, noise)
