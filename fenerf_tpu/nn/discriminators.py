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
