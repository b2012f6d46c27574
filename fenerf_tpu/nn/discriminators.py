"""Progressive-growing CoordConv residual discriminators.

Reference behavior: /root/reference/discriminators/sgdiscriminators.py
  - CCSDoubleEncoderDiscriminator (:365-419): the two trainer discriminators.
    Pyramid of 7 residual CoordConv blocks (32->64->128->256->400x4), fromRGB
    1x1 adapters per input resolution, fade-in alpha blending one level down,
    final 2x2 conv emitting [score(1) | z_geo(256) | z_app(256) | pose(2)].
  - CCSEncoderDiscriminator (:310-362): single-latent head variant.
  - CCSDiscriminator / StridedDiscriminator (:55-104, :258-306): score-only.
  - AddCoords/CoordConv (:179-233): concat normalized (row, col) channels.
  - ResidualCCBlock (:236-256): conv3x3 + lrelu + conv3x3/s2 + lrelu,
    1x1/s2 projection skip, sum / sqrt(2).

TPU redesign: NHWC layout throughout (feeds the MXU's native conv path),
coordinate channels generated with broadcasted_iota, resolution-indexed entry
(static per curriculum stage -> one XLA program per stage), fade-in as an
always-on lerp (free at alpha=1, keeps the graph static).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from fenerf_tpu.nn import init as winit

Params = Any

_CHANNELS = (32, 64, 128, 256, 400, 400, 400, 400)  # pyramid widths
_N_BLOCKS = 7


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    input_dim: int = 3          # 3 for D_img; 18+3 for D_seg
    latent_geo_dim: int = 256   # 0 => score-only (CCSDiscriminator)
    latent_app_dim: int = 256   # 0 with latent_geo>0 => single-encoder
    coord_conv: bool = True     # False => StridedDiscriminator

    @property
    def head_dim(self) -> int:
        return 1 + self.latent_geo_dim + self.latent_app_dim + 2 * (
            1 if (self.latent_geo_dim or self.latent_app_dim) else 0
        ) if (self.latent_geo_dim or self.latent_app_dim) else 1


def init_discriminator(key, cfg: DiscriminatorConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 3 * _N_BLOCKS + len(_CHANNELS) + 1)
    ki = iter(keys)
    extra = 2 if cfg.coord_conv else 0

    blocks = []
    for i in range(_N_BLOCKS):
        cin, cout = _CHANNELS[i], _CHANNELS[i + 1]
        blocks.append({
            "conv1": winit.conv2d_kaiming_leaky(next(ki), cin + extra, cout, 3,
                                                dtype=dtype),
            "conv2": winit.conv2d_kaiming_leaky(next(ki), cout + extra, cout, 3,
                                                dtype=dtype),
            "proj": winit.conv2d(next(ki), cin, cout, 1, dtype=dtype),
        })
    from_rgb = [
        winit.conv2d(next(ki), cfg.input_dim, c, 1, dtype=dtype)
        for c in _CHANNELS
    ]
    final = winit.conv2d(next(ki), 400, cfg.head_dim, 2, dtype=dtype)
    return {"blocks": blocks, "from_rgb": from_rgb, "final": final}


def _conv(x, p, stride=1, pad=0):
    """NHWC conv with HWIO weights and symmetric explicit padding.

    torch's Conv2d(padding=p) pads both sides; XLA's 'SAME' pads
    asymmetrically under stride 2, which shifts windows — so always use
    explicit ((p,p),(p,p))."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def _add_coords(x):
    """Append normalized (row, col) channels in [-1, 1] (reference AddCoords:
    first extra channel varies along H, second along W)."""
    b, h, w, _ = x.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (b, h, w, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (b, h, w, 1), 2)
    rows = rows / (h - 1) * 2.0 - 1.0
    cols = cols / (w - 1) * 2.0 - 1.0
    return jnp.concatenate([x, rows.astype(x.dtype), cols.astype(x.dtype)], -1)


def _res_block(x, p, coord_conv=True):
    h = _add_coords(x) if coord_conv else x
    h = jax.nn.leaky_relu(_conv(h, p["conv1"], pad=1), 0.2)
    h = _add_coords(h) if coord_conv else h
    h = jax.nn.leaky_relu(_conv(h, p["conv2"], stride=2, pad=1), 0.2)
    skip = _conv(x, p["proj"], stride=2)
    return (h + skip) / math.sqrt(2.0)


# ---------------------------------------------------------------------------
# SPADE-style patch discriminators (reference sgdiscriminators.py:422-521 —
# present in the repo, not wired into the shipped trainer)
# ---------------------------------------------------------------------------

def init_nlayer_discriminator(key, input_nc=22, ndf=64, n_layers=3,
                              dtype=jnp.float32) -> Params:
    """NLayerDiscriminator: 4x4 patchGAN convs; middle layers use the
    reference default norm 'spectralinstance' = spectral-normalized bias-less
    conv + InstanceNorm2d(affine=False) (sgdiscriminators.py:523-554)."""
    keys = jax.random.split(key, n_layers + 2)
    layers = []
    nf = ndf
    layers.append({"conv": winit.conv2d(keys[0], input_nc, ndf, 4, dtype=dtype),
                   "stride": 2, "sn": False})
    for i in range(1, n_layers):
        nf_prev, nf = nf, min(nf * 2, 512)
        layers.append({"conv": winit.conv2d(keys[i], nf_prev, nf, 4,
                                            dtype=dtype),
                       "stride": 2, "sn": True,
                       "u": jax.random.normal(jax.random.fold_in(keys[i], 7),
                                              (nf,), dtype)})
    nf_prev, nf = nf, min(nf * 2, 512)
    layers.append({"conv": winit.conv2d(keys[n_layers], nf_prev, nf, 4,
                                        dtype=dtype),
                   "stride": 1, "sn": True,
                   "u": jax.random.normal(
                       jax.random.fold_in(keys[n_layers], 7), (nf,), dtype)})
    layers.append({"conv": winit.conv2d(keys[-1], nf, 1, 4, dtype=dtype),
                   "stride": 1, "sn": False})
    return {"layers": layers}


def _spectral_normalize(w, u, v=None, n_iters: int = 1):
    """Spectral normalization matching torch spectral_norm: training does
    power iterations from u; eval (v given, n_iters=0) reuses stored u, v."""
    c_out = w.shape[-1]
    # torch views the (out, in, kh, kw) weight as (out, -1); our HWIO layout
    # must be permuted to match that flattening order
    mat = w.transpose(3, 2, 0, 1).reshape(c_out, -1)
    if v is None:
        for _ in range(max(n_iters, 1)):
            v = mat.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
            u = mat @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (mat @ v)
    return w / sigma, u


def apply_nlayer_discriminator(params: Params, x: jax.Array,
                               get_interm: bool = False,
                               return_state: bool = False):
    """(B, C, H, W) -> patch logits (and intermediate features if asked).

    Spectral norm is stateful (torch mutates `u` in place every forward); in
    JAX the updated `u` must be threaded back out. Training callers pass
    return_state=True and carry the returned params into the next step —
    sigma estimates then improve across steps like the reference's. With
    return_state=False (inference) the stored u is used read-only.
    """
    h = x.transpose(0, 2, 3, 1)
    feats = []
    n = len(params["layers"])
    new_layers = []
    for i, lyr in enumerate(params["layers"]):
        p = lyr["conv"]
        w = p["w"]
        if lyr["sn"]:
            w, u_new = _spectral_normalize(w, lyr["u"], lyr.get("v"))
            new_layers.append({**lyr, "u": u_new})
        else:
            new_layers.append(lyr)
        h = jax.lax.conv_general_dilated(
            h, w, (lyr["stride"],) * 2, ((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
        if lyr["sn"]:
            # InstanceNorm2d(affine=False): per-(sample, channel) spatial norm
            mean = h.mean(axis=(1, 2), keepdims=True)
            var = ((h - mean) ** 2).mean(axis=(1, 2), keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        if i < n - 1:
            h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h.transpose(0, 3, 1, 2))
    out = feats if get_interm else feats[-1]
    if return_state:
        return out, {"layers": new_layers}
    return out


def init_multiscale_discriminator(key, input_nc=22, ndf=64, n_layers=3,
                                  num_d=3, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, num_d)
    return {"scales": [init_nlayer_discriminator(k, input_nc, ndf, n_layers,
                                                 dtype) for k in keys]}


def apply_multiscale_discriminator(params: Params, x: jax.Array,
                                   get_interm: bool = True,
                                   return_state: bool = False):
    """Reference MultiscaleDiscriminator (:422-465): run each patchGAN on a
    progressively 2x avg-pooled input (finest scale first in outputs).
    return_state=True also returns params with updated spectral-norm u."""
    results = []
    new_scales = []
    cur = x
    for i, sub in enumerate(params["scales"]):
        if return_state:
            r, new_sub = apply_nlayer_discriminator(sub, cur, get_interm,
                                                    return_state=True)
            results.append(r)
            new_scales.append(new_sub)
        else:
            results.append(apply_nlayer_discriminator(sub, cur, get_interm))
        if i != len(params["scales"]) - 1:
            nhwc = cur.transpose(0, 2, 3, 1)
            pooled = jax.lax.reduce_window(
                nhwc, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)])
            counts = jax.lax.reduce_window(
                jnp.ones_like(nhwc), 0.0, jax.lax.add, (1, 3, 3, 1),
                (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
            cur = (pooled / counts).transpose(0, 3, 1, 2)
    if return_state:
        return results, {"scales": new_scales}
    return results


def apply_discriminator(
    params: Params,
    cfg: DiscriminatorConfig,
    images: jax.Array,   # (B, C, H, W) in [-1, 1] — reference layout
    alpha: jax.Array | float = 1.0,
):
    """Returns (score (B,1), latent_geo, latent_app, position) — latents/pose
    are None for score-only configs. Input resolution selects the entry block
    statically (img_size_to_layer, sgdiscriminators.py:396)."""
    x = images.transpose(0, 2, 3, 1)  # NHWC
    size = x.shape[1]
    start = 8 - int(math.log2(size))
    assert 0 <= start <= 7, f"unsupported size {size}"

    h = jax.nn.leaky_relu(_conv(x, params["from_rgb"][start]), 0.2)
    for i, bi in enumerate(range(start, _N_BLOCKS)):
        if i == 1:
            # fade-in: blend with the next adapter on 2x nearest-downsampled
            # input; at alpha=1 the lerp is exact identity
            down = x[:, ::2, ::2, :]
            skip = jax.nn.leaky_relu(_conv(down, params["from_rgb"][start + 1]), 0.2)
            h = alpha * h + (1.0 - alpha) * skip
        h = _res_block(h, params["blocks"][bi], cfg.coord_conv)

    out = _conv(h, params["final"])  # (B, 1, 1, head)
    out = out.reshape(out.shape[0], -1)

    if not (cfg.latent_geo_dim or cfg.latent_app_dim):
        return out[:, :1], None, None, None
    g = cfg.latent_geo_dim
    a = cfg.latent_app_dim
    score = out[:, 0:1]
    latent_geo = out[:, 1:1 + g]
    latent_app = out[:, 1 + g:1 + g + a] if a else None
    position = out[:, 1 + g + a:1 + g + a + 2]
    return score, latent_geo, latent_app, position
