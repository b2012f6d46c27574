"""DiffAugment — differentiable GAN augmentations.

Reference: /root/reference/siren/diff_augment.py:7-108 (present in the repo,
not wired into the shipped trainer; provided so ablations can enable it via
StageMeta). Policy string e.g. 'color,translation,cutout'.

All transforms are differentiable and batched; randomness via explicit keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _rand_brightness(key, x):
    return x + (jax.random.uniform(key, (x.shape[0], 1, 1, 1)) - 0.5)


def _rand_saturation(key, x):
    mean = x.mean(axis=1, keepdims=True)
    f = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) * 2.0
    return (x - mean) * f + mean


def _rand_contrast(key, x):
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    f = jax.random.uniform(key, (x.shape[0], 1, 1, 1)) + 0.5
    return (x - mean) * f + mean


def _rand_translation(key, x, ratio=0.125):
    b, c, h, w = x.shape
    sh, sw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    tx = jax.random.randint(kx, (b,), -sh, sh + 1)
    ty = jax.random.randint(ky, (b,), -sw, sw + 1)
    padded = jnp.pad(x, ((0, 0), (0, 0), (sh, sh), (sw, sw)))

    def shift_one(img, dx, dy):
        return jax.lax.dynamic_slice(
            img, (0, sh + dx, sw + dy), (c, h, w))

    return jax.vmap(shift_one)(padded, tx, ty)


def _rand_cutout(key, x, ratio=0.5):
    b, c, h, w = x.shape
    ch, cw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    ox = jax.random.randint(kx, (b, 1, 1), 0, h + (1 - ch % 2))
    oy = jax.random.randint(ky, (b, 1, 1), 0, w + (1 - cw % 2))
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    mask_r = (rows >= ox - ch // 2) & (rows < ox + (ch + 1) // 2)
    mask_c = (cols >= oy - cw // 2) & (cols < oy + (cw + 1) // 2)
    hole = (mask_r & mask_c)[:, None, :, :]
    return jnp.where(hole, 0.0, x)


AUGMENT_FNS = {
    "color": (_rand_brightness, _rand_saturation, _rand_contrast),
    "translation": (_rand_translation,),
    "cutout": (_rand_cutout,),
}


def diff_augment(key: jax.Array, x: jax.Array,
                 policy: str = "color,translation,cutout") -> jax.Array:
    """Apply the augmentation policy to (B, C, H, W) images."""
    if not policy:
        return x
    for group in policy.split(","):
        for fn in AUGMENT_FNS[group.strip()]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
    return x
