"""StyleGAN2-style layer library + the 2D latent-grid generator.

Reference behavior: /root/reference/siren/layers.py (EqualLinear :159-207,
ModulatedConv2d :500-629, ToRGB :632-679, PixelNorm :10-20, ConstantInput
:23-47) and /root/reference/siren/latent_grid.py (StyleGenerator2D :9-137).

TPU redesign of modulated convolution: instead of materializing per-sample
weight tensors and grouped convs (the reference's batch*out_ch grouping,
layers.py:596-620), modulation/demodulation are folded around ONE shared-
weight convolution:
    y[b] = demod[b,o] * conv(x[b] * gamma[b,i], w_shared)
with demod computed analytically from gamma and per-(o,i) weight norms —
mathematically identical (conv is linear in the weights), and it keeps a
single large MXU conv instead of B grouped small ones.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from fenerf_tpu.ops.upfirdn2d import (blur, fused_leaky_relu, upsample2d)

Params = Any


def pixel_norm(x: jax.Array, axis: int = -1) -> jax.Array:
    """x * rsqrt(mean(x^2)) (reference PixelNorm on (B, C) latents, dim=1)."""
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=axis, keepdims=True) + 1e-8)


# ---------------------------------------------------------------------------
# Equalized-lr linear
# ---------------------------------------------------------------------------

def init_equal_linear(key, in_ch, out_ch, lr_mul=1.0, bias_init=0.0,
                      dtype=jnp.float32) -> Params:
    return {
        "w": jax.random.normal(key, (in_ch, out_ch), dtype) / lr_mul,
        "b": jnp.full((out_ch,), bias_init, dtype),
    }


def equal_linear(p: Params, x: jax.Array, lr_mul=1.0, activate=False):
    scale = (1.0 / math.sqrt(p["w"].shape[0])) * lr_mul
    y = x @ (p["w"] * scale)
    if activate:
        return fused_leaky_relu(y, p["b"] * lr_mul)
    return y + p["b"] * lr_mul


# ---------------------------------------------------------------------------
# Modulated conv (StyleGAN2) — shared-weight formulation
# ---------------------------------------------------------------------------

def init_modulated_conv(key, in_ch, out_ch, ksize, z_dim,
                        dtype=jnp.float32) -> Params:
    kw, km, kb = jax.random.split(key, 3)
    return {
        "w": jax.random.normal(kw, (ksize, ksize, in_ch, out_ch), dtype),
        "mod": init_equal_linear(km, z_dim, in_ch, bias_init=1.0, dtype=dtype),
        "b": jnp.zeros((out_ch,), dtype),  # FusedLeakyReLU bias / plain bias
    }


def modulated_conv2d(
    p: Params,
    x: jax.Array,        # (B, C_in, H, W)
    z: jax.Array,        # (B, z_dim)
    demodulate: bool = True,
    upsample: bool = False,
    downsample: bool = False,
    activate: bool = True,
    bias: bool = True,
    blur_kernel=(1, 3, 3, 1),
) -> jax.Array:
    ksize, _, in_ch, out_ch = p["w"].shape
    scale = 1.0 / math.sqrt(in_ch * ksize * ksize)
    gamma = equal_linear(p["mod"], z)  # (B, in_ch)
    w = p["w"] * scale                 # (kh, kw, in, out)

    if demodulate:
        # demod[b, o] = rsqrt(sum_{i,k} (w[k,i,o] * gamma[b,i])^2)
        w2 = jnp.sum(w * w, axis=(0, 1))              # (in, out)
        demod = jax.lax.rsqrt(
            jnp.einsum("bi,io->bo", gamma * gamma, w2) + 1e-8)

    xm = x * gamma[:, :, None, None]

    if upsample:
        # torch conv_transpose2d(stride 2, pad 0) == lax.conv_transpose with
        # transpose_kernel=True and the kernel in (kh, kw, out, in) layout
        out = jax.lax.conv_transpose(
            xm, w.swapaxes(2, 3), strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            transpose_kernel=True,
        )
        factor, klen = 2, len(blur_kernel)
        pp = (klen - factor) - (ksize - 1)
        out_blur_pad = ((pp + 1) // 2 + factor - 1, pp // 2 + 1)
        if demodulate:
            out = out * demod[:, :, None, None]
        out = blur(out, blur_kernel, pad=out_blur_pad, upsample_factor=factor)
    elif downsample:
        factor, klen = 2, len(blur_kernel)
        pp = (klen - factor) + (ksize - 1)
        xm = blur(xm, blur_kernel, pad=((pp + 1) // 2, pp // 2))
        out = jax.lax.conv_general_dilated(
            xm, w, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        if demodulate:
            out = out * demod[:, :, None, None]
    else:
        pad = ksize // 2
        out = jax.lax.conv_general_dilated(
            xm, w, window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        if demodulate:
            out = out * demod[:, :, None, None]

    if activate:
        out = fused_leaky_relu(out, p["b"])
    elif bias:
        out = out + p["b"][None, :, None, None]
    return out


# ---------------------------------------------------------------------------
# StyleGenerator2D (latent grid)
# ---------------------------------------------------------------------------

_CH_TABLE = lambda ch_max, ch_mul: {
    4: ch_max, 8: ch_max, 16: ch_max, 32: ch_max,
    64: ch_max // 2 * ch_mul, 128: ch_max // 4 * ch_mul,
    256: ch_max // 8 * ch_mul, 512: ch_max // 16 * ch_mul,
    1024: ch_max // 32 * ch_mul,
}


def init_style_generator_2d(key, out_res=32, out_ch=32, z_dim=256,
                            ch_mul=1, ch_max=256, skip_conn=False,
                            dtype=jnp.float32) -> Params:
    """Parameters for StyleGenerator2D (latent_grid.py:9-95)."""
    channels = _CH_TABLE(ch_max, ch_mul)
    keys = iter(jax.random.split(key, 64))
    params: dict[str, Any] = {
        "mapping": [init_equal_linear(next(keys), z_dim, z_dim, lr_mul=0.01,
                                      dtype=dtype) for _ in range(3)],
        "input": jax.random.normal(next(keys), (channels[4], 4, 4), dtype),
        "conv1": init_modulated_conv(next(keys), channels[4], channels[4], 3,
                                     z_dim, dtype),
    }
    convs = []
    rgbs = []
    in_ch = channels[4]
    res = 4
    while res < out_res:
        res *= 2
        oc = channels[res]
        convs.append(init_modulated_conv(next(keys), in_ch, oc, 3, z_dim,
                                         dtype))
        convs.append(init_modulated_conv(next(keys), oc, oc, 3, z_dim, dtype))
        if skip_conn:
            rgbs.append(init_modulated_conv(next(keys), oc, out_ch, 1, z_dim,
                                            dtype))
        in_ch = oc
    params["convs"] = convs
    if skip_conn:
        params["to_rgb1"] = init_modulated_conv(
            next(keys), channels[4], out_ch, 1, z_dim, dtype)
        params["to_rgbs"] = rgbs
    else:
        params["out_rgb"] = init_modulated_conv(next(keys), in_ch, out_ch, 1,
                                                z_dim, dtype)
    return params


def style_generator_2d(p: Params, z: jax.Array, skip_conn=False) -> jax.Array:
    """z (B, z_dim) -> feature grid (B, out_ch, out_res, out_res)
    (latent_grid.py:97-137). All conditional layers share one mapped w."""
    w = pixel_norm(z)
    for lyr in p["mapping"]:
        w = equal_linear(lyr, w, lr_mul=0.01, activate=True)

    b = z.shape[0]
    out = jnp.broadcast_to(p["input"][None], (b,) + p["input"].shape)
    out = modulated_conv2d(p["conv1"], out, w)

    skip = None
    if skip_conn:
        skip = modulated_conv2d(p["to_rgb1"], out, w, demodulate=False,
                                activate=False)
    for i in range(0, len(p["convs"]), 2):
        out = modulated_conv2d(p["convs"][i], out, w, upsample=True)
        out = modulated_conv2d(p["convs"][i + 1], out, w)
        if skip_conn:
            rgb = modulated_conv2d(p["to_rgbs"][i // 2], out, w,
                                   demodulate=False, activate=False)
            skip = rgb + upsample2d(skip)
    if not skip_conn:
        skip = modulated_conv2d(p["out_rgb"], out, w, demodulate=False,
                                activate=False)
    return skip
