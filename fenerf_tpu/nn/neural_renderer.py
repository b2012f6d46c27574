"""2D neural-renderer upsampler head (the reference's HD path).

Reference: /root/reference/generators/neural_rendering.py (NeuralRenderer) —
a log2(img/input)-block conv pyramid that upsamples low-resolution NeRF
feature maps (64/128 ch) to RGB(+seg) images, with per-level RGB skip
connections. Used by StyleGenerator3d (generators/generators.py:914-1295)
together with the *HD SIREN variants that emit 64-channel features
(siren/siren.py:247-302, :1301-1366). Dormant in the reference (no shipped
curriculum instantiates it) — rebuilt for completeness.

TPU notes: NHWC convs throughout; 'nearest' upsample is a reshape-broadcast
(no gather); the kornia filter2D blur (reflect border, normalized [1,2,1]^T
[1,2,1]) is one depthwise conv.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from fenerf_tpu.nn import init as winit

Params = Any


@dataclasses.dataclass(frozen=True)
class NeuralRendererConfig:
    """Mirror of NeuralRenderer's constructor args (neural_rendering.py:37)."""
    n_feat: int = 128
    input_dim: int = 128
    out_dim: int = 3
    final_actvn: bool = True
    min_feat: int = 32
    img_size: int = 64
    input_size: int = 16
    use_rgb_skip: bool = True
    upsample_feat: str = "nn"        # 'nn' | 'bilinear'(+blur)
    upsample_rgb: str = "bilinear"
    use_norm: bool = False

    @property
    def n_blocks(self) -> int:
        return int(math.log2(self.img_size) - math.log2(self.input_size))

    def feat_ch(self, i: int) -> int:
        """Output channels of conv block i (0-based)."""
        return max(self.n_feat // (2 ** (i + 1)), self.min_feat)


def init_neural_renderer(key: jax.Array, cfg: NeuralRendererConfig,
                         dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 4 + 2 * cfg.n_blocks))
    params: dict[str, Any] = {}
    if cfg.n_feat != cfg.input_dim:
        params["conv_in"] = winit.conv2d(next(keys), cfg.input_dim,
                                         cfg.n_feat, 1, dtype=dtype)
    convs = []
    cin = cfg.n_feat
    for i in range(cfg.n_blocks):
        cout = cfg.feat_ch(i)
        convs.append(winit.conv2d(next(keys), cin, cout, 3, dtype=dtype))
        cin = cout
    params["convs"] = convs
    if cfg.use_rgb_skip:
        rgbs = [winit.conv2d(next(keys), cfg.input_dim, cfg.out_dim, 3,
                             dtype=dtype)]
        for i in range(cfg.n_blocks):
            rgbs.append(winit.conv2d(next(keys), cfg.feat_ch(i), cfg.out_dim,
                                     3, dtype=dtype))
        params["rgbs"] = rgbs
    else:
        params["rgb_out"] = winit.conv2d(
            next(keys), cfg.feat_ch(cfg.n_blocks - 1), 3, 1, dtype=dtype)
    return params


def _conv(x, p, pad):
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _blur121(x):
    """kornia filter2D([1,2,1]^T[1,2,1], normalized=True): reflect border,
    depthwise 3x3 (neural_rendering.py:7-17)."""
    k = jnp.array([1.0, 2.0, 1.0])
    k2 = (k[:, None] * k[None, :]) / 16.0
    c = x.shape[-1]
    w = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _up_nearest(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _up_bilinear_blur(x):
    b, h, w, c = x.shape
    y = jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")
    return _blur121(y)


def apply_neural_renderer(params: Params, cfg: NeuralRendererConfig,
                          x: jax.Array) -> jax.Array:
    """(B, input_dim, H, W) feature maps -> (B, out_dim, H*2^n, W*2^n)
    (NeuralRenderer.forward, neural_rendering.py:96-120)."""
    up_feat = _up_nearest if cfg.upsample_feat == "nn" else _up_bilinear_blur
    up_rgb = _up_nearest if cfg.upsample_rgb == "nn" else _up_bilinear_blur

    h = x.transpose(0, 2, 3, 1)  # NHWC
    net = _conv(h, params["conv_in"], 0) if "conv_in" in params else h

    rgb = None
    if cfg.use_rgb_skip:
        rgb = up_rgb(_conv(h, params["rgbs"][0], 1))

    for idx, lyr in enumerate(params["convs"]):
        hid = _conv(up_feat(net), lyr, 1)
        if cfg.use_norm:
            mean = hid.mean(axis=(1, 2), keepdims=True)
            var = ((hid - mean) ** 2).mean(axis=(1, 2), keepdims=True)
            hid = (hid - mean) * jax.lax.rsqrt(var + 1e-5)
        net = jax.nn.leaky_relu(hid, 0.2)
        if cfg.use_rgb_skip:
            rgb = rgb + _conv(net, params["rgbs"][idx + 1], 1)
            if idx < len(params["convs"]) - 1:
                rgb = up_rgb(rgb)

    if not cfg.use_rgb_skip:
        rgb = _conv(net, params["rgb_out"], 0)
    if cfg.final_actvn:
        rgb = jax.nn.sigmoid(rgb)
    return rgb.transpose(0, 3, 1, 2)


def config_from_torch_module(tm) -> NeuralRendererConfig:
    """Infer a NeuralRendererConfig from an unpickled reference
    NeuralRenderer module (neural_rendering.py:36-90); released generator
    pickles embed these as .neural_renderer_img/_seg. img_size/input_size
    are stored only as their ratio (n_blocks) — absolute values are free."""
    convs = list(tm.conv_layers)
    n_blocks = len(convs)
    use_rgb_skip = bool(tm.use_rgb_skip)
    out_dim = (tm.conv_rgb[0].out_channels if use_rgb_skip
               else tm.conv_rgb.out_channels)
    return NeuralRendererConfig(
        n_feat=convs[0].in_channels,
        input_dim=int(tm.input_dim),
        out_dim=int(out_dim),
        final_actvn=bool(tm.final_actvn),
        min_feat=convs[-1].out_channels,
        img_size=16 * 2 ** n_blocks,
        input_size=16,
        use_rgb_skip=use_rgb_skip,
        # bilinear upsamplers are Sequential(Upsample, Blur); nn is a bare
        # Upsample (no submodules)
        upsample_feat="bilinear" if list(tm.upsample_2.children()) else "nn",
        upsample_rgb="bilinear" if list(tm.upsample_rgb.children()) else "nn",
        use_norm=bool(tm.use_norm),
    )


def neural_renderer_from_torch(sd, cfg: NeuralRendererConfig) -> Params:
    """state_dict of reference NeuralRenderer -> param pytree."""
    import numpy as np

    def conv(prefix):
        w = np.asarray(sd[f"{prefix}.weight"])
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}

    params: dict[str, Any] = {}
    if "conv_in.weight" in sd:
        params["conv_in"] = conv("conv_in")
    params["convs"] = [conv(f"conv_layers.{i}") for i in range(cfg.n_blocks)]
    if cfg.use_rgb_skip:
        params["rgbs"] = [conv(f"conv_rgb.{i}")
                          for i in range(cfg.n_blocks + 1)]
    else:
        params["rgb_out"] = conv("conv_rgb")
    return params
