"""Alpha compositing + hierarchical importance sampling.

Pure JAX equivalents of reference /root/reference/generators/volumetric_rendering.py:
  - fancy_integration (:18-106)  -> integrate / apply_fill
  - sample_pdf        (:259-300) -> sample_pdf
  - coarse/fine merge (generators.py:508-512) -> merge_sorted

All TPU-friendly: no data-dependent shapes, searchsorted realized as a
comparison-count (O(S^2) over tiny S beats gather-heavy binary search on TPU),
randomness explicit via keys.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Integrated(NamedTuple):
    comp: jax.Array         # (..., R, C) composited channels (labels+rgb)
    depth: jax.Array        # (..., R) expected depth
    weights: jax.Array      # (..., R, S) per-sample compositing weights
    weights_sum: jax.Array  # (..., R) total opacity


def _act_sigma(sigmas: jax.Array, clamp_mode: str) -> jax.Array:
    """Density activation (reference fancy_integration clamp_mode :30-35)."""
    if clamp_mode == "softplus":
        return jax.nn.softplus(sigmas)
    if clamp_mode == "relu":
        return jax.nn.relu(sigmas)
    raise ValueError(f"unknown clamp_mode {clamp_mode!r}")


def _composite_weights(
    sigmas: jax.Array,   # (..., S) noise already added
    z_vals: jax.Array,   # (..., S) sorted along -1
    clamp_mode: str,
) -> jax.Array:
    """THE compositing epilogue (one copy — integrate / integrate_weights /
    composite_merged all call it): terminal-1e10 deltas,
    alpha = 1 - exp(-delta * act(sigma)), exclusive transmittance cumprod of
    (1 - alpha + 1e-10), weights = alpha * T. XLA inlines + fuses this
    wherever it lands, so sharing costs nothing."""
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1)
    alphas = 1.0 - jnp.exp(-deltas * _act_sigma(sigmas, clamp_mode))
    trans = jnp.cumprod(1.0 - alphas + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    return alphas * trans


def integrate(
    rgb_sigma: jax.Array,  # (..., R, S, C+1), last channel = sigma
    z_vals: jax.Array,     # (..., R, S)
    key: jax.Array | None,
    noise_std: float | jax.Array = 0.5,
    clamp_mode: str = "relu",
    last_back: bool = False,
    white_back: bool = False,
    black_back: bool = False,
    noise: jax.Array | None = None,
) -> Integrated:
    """NeRF volumetric rendering (reference fancy_integration :18-51).

    alpha_i = 1 - exp(-delta_i * act(sigma_i + noise)); weights via
    transmittance cumprod; the same weights composite every channel
    (semantics and RGB share the geometry).

    `noise` (unscaled standard normals, sigmas.shape) may be pre-drawn by the
    caller — the ray-chunked render path draws once over the full image and
    slices per block so chunking stays bit-exact.
    """
    channels = rgb_sigma[..., :-1]
    sigmas = rgb_sigma[..., -1]

    if noise is not None:
        sigmas = sigmas + noise * noise_std
    elif key is not None:
        sigmas = sigmas + jax.random.normal(key, sigmas.shape) * noise_std

    weights = _composite_weights(sigmas, z_vals, clamp_mode)
    weights_sum = weights.sum(axis=-1)

    if last_back:
        weights = weights.at[..., -1].add(1.0 - weights_sum)

    comp = jnp.sum(weights[..., None] * channels, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)

    if white_back:
        comp = comp + (1.0 - weights_sum)[..., None]
    if black_back:
        comp = comp - (1.0 - weights_sum)[..., None]

    return Integrated(comp=comp, depth=depth, weights=weights, weights_sum=weights_sum)


def integrate_weights(
    sigmas: jax.Array,     # (..., R, S)
    z_vals: jax.Array,     # (..., R, S)
    noise: jax.Array | None = None,
    noise_std: float | jax.Array = 0.5,
    clamp_mode: str = "relu",
) -> jax.Array:
    """Compositing weights only — the hierarchical PROPOSAL pass needs just
    these (generators.py:483-502 discards everything else), so skip the
    channel contraction and depth sum of the full integrate(). Numerically
    identical to integrate(...).weights."""
    if noise is not None:
        sigmas = sigmas + noise * noise_std
    return _composite_weights(sigmas, z_vals, clamp_mode)


_FILL_VALUES = {"white": 1.0, "black": 0.0, "grey": 0.5, "light_grey": 0.81}

# sample_pdf per-row pick implementation: "onehot" (einsum with a one-hot —
# MXU dispatch) or "reduce" (select+sum — fuses with producers). Identical
# outputs. "reduce" is the shipped default: together with
# composite_merged_nosort it measured 2451ms vs 2760ms on the batch-64
# flagship render (PROFILE_RAYK.json, same session).
PICK_IMPL = "reduce"


def apply_fill(
    comp: jax.Array,         # (..., R, C)
    weights_sum: jax.Array,  # (..., R)
    fill_mode: str | None,
    fill_color: str = "black",
) -> jax.Array:
    """Low-opacity pixel painting (reference fancy_integration :53-102).

    'seg_padding_background' / 'eval_seg_padding_background': prepend a zero
    background-label channel (C -> C+1), then where total opacity < 0.9 set the
    pixel to [1 (background label), fill, fill, ...].
    'eval_white_back' / 'debug' / 'weight_debug': paint low-opacity pixels
    without padding ([1,1,1] white for RGB-only models; [1,0,...] for joint).
    Returns the (possibly widened) composited channels.
    """
    if fill_mode is None or fill_mode == "weight":
        return comp
    low = (weights_sum < 0.9)[..., None]
    if fill_mode in ("seg_padding_background", "eval_seg_padding_background"):
        pad = jnp.zeros_like(comp[..., :1])
        comp = jnp.concatenate([pad, comp], axis=-1)
        fill = jnp.full_like(comp[..., 1:], _FILL_VALUES[fill_color])
        target = jnp.concatenate([jnp.ones_like(comp[..., :1]), fill], axis=-1)
        return jnp.where(low, target, comp)
    if fill_mode == "eval_white_back":
        return jnp.where(low, jnp.ones_like(comp), comp)
    if fill_mode in ("debug", "weight_debug"):
        target = jnp.concatenate(
            [jnp.ones_like(comp[..., :1]), jnp.zeros_like(comp[..., 1:])], axis=-1
        )
        return jnp.where(low, target, comp)
    raise ValueError(f"unknown fill_mode {fill_mode!r}")


def midpoints(z_vals: jax.Array) -> jax.Array:
    """Interval midpoints along the sample axis: (..., S) -> (..., S-1)."""
    return 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])


def sample_pdf(
    key: jax.Array | None,
    bins: jax.Array,     # (..., M) sorted bin positions (z midpoints)
    weights: jax.Array,  # (..., M-1) unnormalized per-bin weights
    n_importance: int,
    det: bool = False,
    eps: float = 1e-5,
    u: jax.Array | None = None,
) -> jax.Array:
    """Inverse-CDF importance sampling (reference sample_pdf :259-300).

    searchsorted(side='left') is realized as sum(cdf < u): with S ~ tens of
    samples the O(S * n_importance) comparison matrix is cheap, fully
    vectorized, and avoids serial binary-search gathers on the VPU.
    `u` may be pre-drawn by the caller (ray-chunked rendering slices one
    full-image draw per block). Returns (..., n_importance) new positions.
    """
    w = weights + eps
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    # leading zero sized from BINS, not cdf: at the S=2 degenerate edge
    # (1 bin, 0 weights) cdf must still have M entries so every sample
    # resolves to bins[0]
    cdf = jnp.concatenate([jnp.zeros_like(bins[..., :1]), cdf], axis=-1)  # (..., M)

    u_shape = weights.shape[:-1] + (n_importance,)
    if u is not None:
        assert u.shape == u_shape, (u.shape, u_shape)
    elif det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance), u_shape)
    else:
        assert key is not None
        u = jax.random.uniform(key, u_shape)

    # inds[r, i] = #(cdf[r, :] < u[r, i])  == searchsorted(cdf, u, 'left')
    inds = jnp.sum(
        (cdf[..., None, :] < u[..., :, None]).astype(jnp.int32), axis=-1
    )
    m = weights.shape[-1]  # == M-1 where cdf/bins have M entries
    below = jnp.clip(inds - 1, 0, m)
    above = jnp.clip(inds, 0, m)

    # per-row picks — take_along_axis lowers to slow per-element gathers on
    # TPU; these are tiny (K x M) arithmetic contractions instead.
    # NOTE: do NOT fuse cdf+bins into one stacked (..., M, 2) operand — a
    # trailing dim of 2 pads to 128 lanes on TPU (64x HBM for the
    # intermediate; measured -5% on the flagship render).
    if PICK_IMPL == "reduce":
        # select+sum fuses with its producers (no MXU dispatch); identical
        # values — each sum touches exactly one nonzero
        cdf_below = _pick_rows(below, cdf)
        cdf_above = _pick_rows(above, cdf)
        bins_below = _pick_rows(below, bins)
        bins_above = _pick_rows(above, bins)
    else:
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (1, m + 1), 1)
        oh_below = (below[..., :, None] == iota_m).astype(cdf.dtype)
        oh_above = (above[..., :, None] == iota_m).astype(cdf.dtype)
        pick = lambda oh, v: jnp.einsum("...km,...m->...k", oh, v)
        cdf_below = pick(oh_below, cdf)
        cdf_above = pick(oh_above, cdf)
        bins_below = pick(oh_below, bins)
        bins_above = pick(oh_above, bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_below + (u - cdf_below) / denom * (bins_above - bins_below)


def _stable_ranks(
    fine_z: jax.Array,    # (..., S_f) arbitrary order
    coarse_z: jax.Array,  # (..., S_c) SORTED along -1
) -> tuple[jax.Array, jax.Array]:
    """Stable sorted ranks of the concat [fine, coarse] (the tie rule of
    merge_sorted: fine-before-coarse on equal z, index-stable within a
    list; coarse's within-list rank is just its index since it's sorted).
    ONE copy of this subtle rule — merge_fine_coarse and composite_merged
    share it; _before_mask is its masked-matrix equivalent over a single
    concatenated list (equality asserted in tests)."""
    sf = fine_z.shape[-1]
    f_i = fine_z[..., :, None]       # (..., S_f, 1)
    c_j = coarse_z[..., None, :]     # (..., 1, S_c)
    # fine_i's rank: within-fine stable rank + #(coarse < fine_i)
    # (ties between lists go to fine — it precedes coarse in the concat)
    cross_f = (c_j < f_i).astype(jnp.int32).sum(-1)
    fj = fine_z[..., None, :]
    lower = (fj < f_i).astype(jnp.int32)
    j_lt_i = (jax.lax.broadcasted_iota(jnp.int32, (sf, sf), 1)
              < jax.lax.broadcasted_iota(jnp.int32, (sf, sf), 0))
    ties = ((fj == f_i) & j_lt_i).astype(jnp.int32)
    rank_f = (lower + ties).sum(-1) + cross_f
    # coarse_j's rank: its index (sorted list) + #(fine <= coarse_j)
    cross_c = (f_i <= c_j).astype(jnp.int32).sum(-2)
    rank_c = jax.lax.broadcasted_iota(
        jnp.int32, coarse_z.shape, coarse_z.ndim - 1) + cross_c
    return rank_f, rank_c


def merge_fine_coarse(
    fine_out: jax.Array,    # (..., R, S_f, C)
    coarse_out: jax.Array,  # (..., R, S_c, C) — coarse_z SORTED along -1
    fine_z: jax.Array,      # (..., R, S_f) arbitrary order
    coarse_z: jax.Array,    # (..., R, S_c) sorted (ray z_vals by construction)
) -> tuple[jax.Array, jax.Array]:
    """merge_sorted specialized to the render pipeline: coarse_z is the ray's
    monotone z_vals, so its within-list stable rank is just its index — the
    (2S, 2S) comparison square collapses to S_f x S_c cross blocks plus one
    S_f x S_f block for the (unsorted) importance samples. Output is
    IDENTICAL to merge_sorted (stable argsort of concat [fine, coarse],
    fine first on ties); ~2.5x fewer VPU comparisons and the permutation is
    applied as two (S, 2S) scatter matmuls instead of one (2S, 2S).
    """
    sf, sc = fine_z.shape[-1], coarse_z.shape[-1]
    s = sf + sc
    rank_f, rank_c = _stable_ranks(fine_z, coarse_z)

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    oh_f = (rank_f[..., :, None] == iota_s)
    oh_c = (rank_c[..., :, None] == iota_s)
    zdt, odt = fine_z.dtype, fine_out.dtype
    z_sorted = (jnp.einsum("...is,...i->...s", oh_f.astype(zdt), fine_z)
                + jnp.einsum("...is,...i->...s", oh_c.astype(zdt), coarse_z))
    out_sorted = (
        jnp.einsum("...is,...ic->...sc", oh_f.astype(odt), fine_out)
        + jnp.einsum("...is,...ic->...sc", oh_c.astype(odt), coarse_out))
    return out_sorted, z_sorted


def composite_merged(
    fine_out: jax.Array,    # (..., R, S_f, C+1) unsorted importance samples
    coarse_out: jax.Array,  # (..., R, S_c, C+1) — coarse_z SORTED along -1
    fine_z: jax.Array,      # (..., R, S_f)
    coarse_z: jax.Array,    # (..., R, S_c)
    noise: jax.Array | None = None,   # (..., R, S) indexed by SORTED pos
    noise_std: float | jax.Array = 0.5,
    clamp_mode: str = "relu",
    last_back: bool = False,
    white_back: bool = False,
    black_back: bool = False,
) -> Integrated:
    """Depth-sorted merge + final compositing WITHOUT materializing the
    sorted channel tensor. Equivalent to
    integrate(*merge_sorted(fine, coarse, ...)) up to f32 summation order:
    only the scalars (z, sigma) are permuted into sorted order to compute
    the compositing weights, which are then permuted BACK and contracted
    with the UNSORTED channels — graph-level ablation showed the sorted
    (..., 2S, C) tensor's HBM round-trips cost 451ms of the batch-64
    flagship render (PROFILE_HIER.json; merge permutation = 15.6% of the
    whole render when applied to channels, ~nothing when applied to two
    scalar vectors)."""
    s = fine_z.shape[-1] + coarse_z.shape[-1]
    all_z = jnp.concatenate([fine_z, coarse_z], axis=-1)
    all_out = jnp.concatenate([fine_out, coarse_out], axis=-2)

    rank_f, rank_c = _stable_ranks(fine_z, coarse_z)
    rank = jnp.concatenate([rank_f, rank_c], axis=-1)      # (..., S)

    # P[r, i] = 1 where rank_i == r; applied to SCALAR vectors only
    perm = (rank[..., None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
            ).astype(all_z.dtype)                          # (..., S, S)
    sort_v = lambda v: jnp.einsum("...ri,...i->...r", perm, v)
    z_sorted = sort_v(all_z)
    sigma_sorted = sort_v(all_out[..., -1])

    if noise is not None:
        sigma_sorted = sigma_sorted + noise * noise_std
    w_sorted = _composite_weights(sigma_sorted, z_sorted, clamp_mode)
    weights_sum = w_sorted.sum(axis=-1)
    if last_back:
        w_sorted = w_sorted.at[..., -1].add(1.0 - weights_sum)

    # back to the concat order: w_unsorted_i = w_sorted[rank_i] = P^T w
    w_unsorted = jnp.einsum("...ri,...r->...i", perm, w_sorted)
    comp = jnp.sum(w_unsorted[..., None] * all_out[..., :-1], axis=-2)
    depth = jnp.sum(w_sorted * z_sorted, axis=-1)
    if white_back:
        comp = comp + (1.0 - weights_sum)[..., None]
    if black_back:
        comp = comp - (1.0 - weights_sum)[..., None]
    return Integrated(comp=comp, depth=depth, weights=w_unsorted,
                      weights_sum=weights_sum)


def _pick_rows(idx: jax.Array, vals: jax.Array) -> jax.Array:
    """vals[..., idx] per row WITHOUT gather or matmul: an equality mask
    contracted by select+sum. Unlike the one-hot einsum (which dispatches to
    the MXU and breaks XLA elementwise fusion, materializing the (..., K, M)
    operand in HBM), a where+reduce fuses with its producers into one loop.
    Exact: the sum touches one nonzero element, so no rounding is added.
    idx (..., K) int32 in [0, M); vals (..., M) -> (..., K)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, vals.shape[-1]), 1)
    return jnp.sum(
        jnp.where(idx[..., :, None] == iota, vals[..., None, :], 0.0), axis=-1)


def _before_mask(all_z: jax.Array) -> jax.Array:
    """before[i, j] = sample j precedes sample i in the stable sort of the
    per-ray z concat: z_j < z_i, or z_j == z_i and j < i (stable tie rule —
    identical ranks to merge_sorted/composite_merged). (..., S) -> (..., S, S)
    bool."""
    s = all_z.shape[-1]
    zi = all_z[..., :, None]
    zj = all_z[..., None, :]
    j_lt_i = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
              < jax.lax.broadcasted_iota(jnp.int32, (s, s), 0))
    return (zj < zi) | ((zj == zi) & j_lt_i)


def composite_merged_nosort(
    fine_out: jax.Array,    # (..., R, S_f, C+1) unsorted importance samples
    coarse_out: jax.Array,  # (..., R, S_c, C+1) — coarse_z SORTED along -1
    fine_z: jax.Array,      # (..., R, S_f)
    coarse_z: jax.Array,    # (..., R, S_c)
    noise: jax.Array | None = None,   # (..., R, S) indexed by SORTED pos
    noise_std: float | jax.Array = 0.5,
    clamp_mode: str = "relu",
    last_back: bool = False,
    white_back: bool = False,
    black_back: bool = False,
) -> Integrated:
    """composite_merged with ZERO permutations: depth-sorted compositing is
    order-independent once each sample knows its sorted neighbourhood —
      trans_i = prod_{j before i} (1 - alpha_j + 1e-10)   (masked product)
      delta_i = (z of rank_i + 1) - z_i                   (masked pick)
      comp / depth / weights_sum = plain sums over samples.
    The one-hot permutation matmuls of composite_merged dispatch to the MXU
    and cannot fuse with their elementwise producers, so the (..., S, S)
    operands round-trip HBM (451ms of the batch-64 flagship render,
    PROFILE_HIER.json); here every (..., S, S) intermediate is a
    broadcast-compare consumed by a reduction — one fused XLA loop, nothing
    materialized. Matches reference generators.py:508-527 +
    volumetric_rendering.py:18-51 semantics like composite_merged (equal up
    to f32 product/sum association order)."""
    s = fine_z.shape[-1] + coarse_z.shape[-1]
    all_z = jnp.concatenate([fine_z, coarse_z], axis=-1)
    all_out = jnp.concatenate([fine_out, coarse_out], axis=-2)

    before = _before_mask(all_z)                       # (..., S, S) bool
    rank = before.sum(axis=-1).astype(jnp.int32)       # (..., S)

    sigma = all_out[..., -1]
    if noise is not None:
        # noise is indexed by sorted position: sample i draws noise[rank_i]
        sigma = sigma + _pick_rows(rank, noise) * noise_std
    # deltas/transmittance are masked forms here (order-independent), so
    # only the activation is shared with the sorted epilogue
    act = _act_sigma(sigma, clamp_mode)

    # delta_i = next z in sorted order - z_i: the sample j with
    # rank_j == rank_i + 1 (a rank match, NOT a positional pick — all_z is
    # in concat order); the sorted-last gets 1e10
    is_next = rank[..., None, :] == rank[..., :, None] + 1
    next_z = jnp.sum(jnp.where(is_next, all_z[..., None, :], 0.0), axis=-1)
    deltas = jnp.where(rank == s - 1, 1e10, next_z - all_z)

    alphas = 1.0 - jnp.exp(-deltas * act)
    om = 1.0 - alphas + 1e-10
    trans = jnp.prod(jnp.where(before, om[..., None, :], 1.0), axis=-1)
    w = alphas * trans                                 # concat order
    weights_sum = w.sum(axis=-1)
    if last_back:
        w = w + jnp.where(rank == s - 1,
                          (1.0 - weights_sum)[..., None], 0.0)
    comp = jnp.sum(w[..., None] * all_out[..., :-1], axis=-2)
    depth = jnp.sum(w * all_z, axis=-1)
    if white_back:
        comp = comp + (1.0 - weights_sum)[..., None]
    if black_back:
        comp = comp - (1.0 - weights_sum)[..., None]
    return Integrated(comp=comp, depth=depth, weights=w,
                      weights_sum=weights_sum)


def merge_sorted(
    fine_out: jax.Array,    # (..., R, S_f, C)
    coarse_out: jax.Array,  # (..., R, S_c, C)
    fine_z: jax.Array,      # (..., R, S_f)
    coarse_z: jax.Array,    # (..., R, S_c)
) -> tuple[jax.Array, jax.Array]:
    """Depth-sort the union of fine+coarse samples per ray.

    Reference concatenates [fine, coarse] then torch.sort + gather
    (generators.py:508-512). On TPU both sort and take_along_axis lower to
    slow per-element gathers, so the permutation is realized arithmetically:
    stable ranks by comparison counting (VPU), then a one-hot permutation
    matrix applied with a batched matmul (MXU). Identical output to
    stable-argsort + gather.
    """
    all_z = jnp.concatenate([fine_z, coarse_z], axis=-1)      # (..., R, S)
    all_out = jnp.concatenate([fine_out, coarse_out], axis=-2)
    s = all_z.shape[-1]
    zi = all_z[..., :, None]   # (..., S, 1)
    zj = all_z[..., None, :]   # (..., 1, S)
    # stable rank: strictly-smaller count + equal-and-earlier count
    lower = (zj < zi).astype(jnp.int32)
    j_lt_i = (jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
              < jax.lax.broadcasted_iota(jnp.int32, (s, s), 0))
    ties = ((zj == zi) & j_lt_i).astype(jnp.int32)
    rank = (lower + ties).sum(-1)                              # (..., S)
    # permutation one-hot: P[r, i] = 1 where rank_i == r
    perm = (rank[..., None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
            ).astype(all_out.dtype)                            # (..., S, S)
    z_sorted = jnp.einsum("...ri,...i->...r", perm, all_z)
    out_sorted = jnp.einsum("...ri,...ic->...rc", perm, all_out)
    return out_sorted, z_sorted
