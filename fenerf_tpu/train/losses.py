"""Auxiliary loss library.

Reference: /root/reference/losses.py:8-118 (SPADE-style GANLoss — the hinge
variant is the trainer's commented-out option 2, train_double_latent_
semantic.py:383-384) and /root/reference/generators/losses.py:6-306
(LogCosh / soft-BCE / Focal / Dice / noise_regularize — shipped but unused
by the main pipelines; provided for feature completeness).

All pure functions over logits/targets; the non-saturating softplus loss the
shipped trainer actually uses lives inline in train/loop.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gan_loss(pred: jax.Array, target_is_real: bool, mode: str = "hinge",
             for_discriminator: bool = True) -> jax.Array:
    """SPADE GANLoss (losses.py:8-118): 'original' (BCE-with-logits),
    'ls' (MSE), 'hinge', 'w' (Wasserstein)."""
    if mode == "original":
        target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    if mode == "ls":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((pred - target) ** 2)
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return -jnp.mean(jnp.minimum(pred - 1.0, 0.0))
            return -jnp.mean(jnp.minimum(-pred - 1.0, 0.0))
        assert target_is_real, "generator hinge loss targets real"
        return -jnp.mean(pred)
    if mode == "w":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise ValueError(f"unknown gan loss mode {mode!r}")


def log_cosh_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """generators/losses.py LogCosh: numerically-stable log(cosh(x))."""
    x = pred - target
    return jnp.mean(x + jax.nn.softplus(-2.0 * x) - jnp.log(2.0))


def soft_bce_loss(logits: jax.Array, target: jax.Array,
                  smooth_factor: float = 0.0) -> jax.Array:
    """BCE-with-logits with label smoothing (generators/losses.py SoftBCE)."""
    if smooth_factor:
        target = target * (1.0 - smooth_factor) + 0.5 * smooth_factor
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target
        + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def focal_loss(logits: jax.Array, target: jax.Array, gamma: float = 2.0,
               alpha: float = 0.25) -> jax.Array:
    """Binary focal loss (generators/losses.py Focal)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * target \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * target + (1 - p) * (1 - target)
    a_t = alpha * target + (1 - alpha) * (1 - target)
    return jnp.mean(a_t * (1 - p_t) ** gamma * ce)


def dice_loss(logits: jax.Array, target: jax.Array,
              eps: float = 1e-7) -> jax.Array:
    """Soft dice over the spatial axes (generators/losses.py Dice)."""
    p = jax.nn.sigmoid(logits)
    dims = tuple(range(2, logits.ndim))
    inter = jnp.sum(p * target, axis=dims)
    card = jnp.sum(p + target, axis=dims)
    return jnp.mean(1.0 - 2.0 * inter / (card + eps))


def noise_regularize(noises: list[jax.Array]) -> jax.Array:
    """StyleGAN2 noise auto-correlation regularizer
    (generators/losses.py:noise_regularize): penalize spatial correlation of
    per-layer noise maps at every octave."""
    loss = 0.0
    for noise in noises:
        n = noise
        while True:
            size = n.shape[2]
            loss = loss + jnp.mean(
                n * jnp.roll(n, 1, axis=3)) ** 2 + jnp.mean(
                n * jnp.roll(n, 1, axis=2)) ** 2
            if size <= 8:
                break
            n = n.reshape(n.shape[0], 1, size // 2, 2, size // 2, 2)
            n = n.mean(axis=(3, 5))
    return loss
