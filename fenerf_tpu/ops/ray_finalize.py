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
        sig_ref, z_ref, u_ref = refs[0], refs[1], refs[2]
        out_ref = refs[-1]
        z = z_ref[...]
        sig = sig_ref[...]
        if noise is not None:
            sig = sig + refs[3][...]
        act = _act(sig, clamp_mode)
        deltas = jnp.concatenate(
            [z[:, 1:] - z[:, :-1], jnp.full((z.shape[0], 1), 1e10, z.dtype)],
            axis=-1)
        alphas = 1.0 - jnp.exp(-deltas * act)
        om = 1.0 - alphas + 1e-10
        # exclusive cumprod over the (sorted) sample axis as a masked product
        # in log space (Mosaic has no reduce_prod lowering; om >= 1e-10 so
        # the log is always finite; ~1-ulp-per-term deviation vs the XLA
        # cumprod, covered by the parity tolerances)
        tri = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
               < jax.lax.broadcasted_iota(jnp.int32, (s, s), 0))
        log_om = jnp.log(om)
        trans = jnp.exp(jnp.sum(
            jnp.where(tri[None], log_om[:, None, :], 0.0), axis=-1))
        w = alphas * trans

        bins = 0.5 * (z[:, :-1] + z[:, 1:])                  # (RB, M)
        wm = (w[:, 1:-1] + 1e-5) + 1e-5                      # (RB, M-1)
        pdf = wm / jnp.sum(wm, axis=-1, keepdims=True)
        # cdf[k] = sum_{j<k} pdf_j (leading zero included), length M
        cmask = (jax.lax.broadcasted_iota(jnp.int32, (m, m - 1), 1)
                 < jax.lax.broadcasted_iota(jnp.int32, (m, m - 1), 0))
        cdf = jnp.sum(jnp.where(cmask[None], pdf[:, None, :], 0.0), axis=-1)

        uu = u_ref[...]                                      # (RB, n_imp)
        inds = jnp.sum((cdf[:, None, :] < uu[:, :, None]).astype(jnp.int32),
                       axis=-1)
        below = jnp.clip(inds - 1, 0, m - 1)
        above = jnp.clip(inds, 0, m - 1)

        iota_m = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)
        pick = lambda idx, v: jnp.sum(
            jnp.where(idx[:, :, None] == iota_m, v[:, None, :], 0.0), axis=-1)
        cdf_b, cdf_a = pick(below, cdf), pick(above, cdf)
        bins_b, bins_a = pick(below, bins), pick(above, bins)
        denom = cdf_a - cdf_b
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        out_ref[...] = bins_b + (uu - cdf_b) / denom * (bins_a - bins_b)

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

    fo = _pad_rows(_flatten_rows(fine_out, 2), pad)
    co = _pad_rows(_flatten_rows(coarse_out, 2), pad)
    fz = _pad_rows(_flatten_rows(fine_z, 1), pad)
    cz = _pad_rows(_flatten_rows(coarse_z, 1), pad)
    inputs = [fo, co, fz, cz]
    if noise is not None:
        inputs.append(_pad_rows(_flatten_rows(noise, 1), pad))

    def kernel(*refs):
        fo_ref, co_ref, fz_ref, cz_ref = refs[:4]
        comp_ref, depth_ref, wsum_ref = refs[-3], refs[-2], refs[-1]
        all_z = jnp.concatenate([fz_ref[...], cz_ref[...]], axis=-1)
        all_out = jnp.concatenate([fo_ref[...], co_ref[...]], axis=-2)

        zi = all_z[:, :, None]
        zj = all_z[:, None, :]
        j_lt_i = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
                  < jax.lax.broadcasted_iota(jnp.int32, (s, s), 0))
        before = (zj < zi) | ((zj == zi) & j_lt_i[None])
        rank = jnp.sum(before.astype(jnp.int32), axis=-1)

        sigma = all_out[..., -1]
        if noise is not None:
            nz = refs[4][...]
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
            npick = jnp.sum(
                jnp.where(rank[:, :, None] == iota_s, nz[:, None, :], 0.0),
                axis=-1)
            sigma = sigma + npick
        act = _act(sigma, clamp_mode)

        is_next = rank[:, None, :] == rank[:, :, None] + 1
        next_z = jnp.sum(jnp.where(is_next, zj, 0.0), axis=-1)
        deltas = jnp.where(rank == s - 1, 1e10, next_z - all_z)

        alphas = 1.0 - jnp.exp(-deltas * act)
        om = 1.0 - alphas + 1e-10
        # masked product in log space (no reduce_prod in Mosaic; see
        # ray_resample)
        log_om = jnp.log(om)
        trans = jnp.exp(jnp.sum(
            jnp.where(before, log_om[:, None, :], 0.0), axis=-1))
        w = alphas * trans
        wsum = jnp.sum(w, axis=-1)
        if last_back:
            w = w + jnp.where(rank == s - 1, (1.0 - wsum)[:, None], 0.0)
        comp = jnp.sum(w[:, :, None] * all_out[..., :-1], axis=-2)
        depth = jnp.sum(w * all_z, axis=-1)
        if white_back:
            comp = comp + (1.0 - wsum)[:, None]
        if black_back:
            comp = comp - (1.0 - wsum)[:, None]

        comp = _fill_softmax_epilogue(comp, wsum, fill_mode, fill_color,
                                      softmax_label, rgb_dim)
        comp_ref[...] = comp
        depth_ref[...] = depth[:, None]
        wsum_ref[...] = wsum[:, None]

    row = lambda c: pl.BlockSpec((tile, c), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM)
    ch = lambda ss: pl.BlockSpec((tile, ss, c1), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [ch(sf), ch(sc), row(sf), row(sc)]
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
