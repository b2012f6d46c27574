"""Exponential moving average of parameter pytrees.

Matches torch_ema.ExponentialMovingAverage semantics used by the reference
trainer (train_double_latent_semantic.py:145-146, 456-457): two EMAs
(decay 0.999 / 0.9999) with num_updates warmup
  decay_eff(n) = min(decay, (1 + n) / (10 + n))
updated after every generator step; copied over the generator for
sampling/FID and restored afterwards (here: just use ema.params — pure
functional, nothing to restore).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Params = Any


class EmaState(NamedTuple):
    params: Params
    decay: jax.Array       # scalar f32
    num_updates: jax.Array  # scalar i32


def ema_init(params: Params, decay: float) -> EmaState:
    # deep-copy: EMA buffers must not alias the live params (jit donation
    # rejects doubly-donated buffers)
    return EmaState(
        params=jax.tree.map(jnp.copy, params),
        decay=jnp.asarray(decay, jnp.float32),
        num_updates=jnp.asarray(0, jnp.int32),
    )


def ema_update(state: EmaState, params: Params) -> EmaState:
    n = state.num_updates + 1
    decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    one_minus = 1.0 - decay
    new = jax.tree.map(
        lambda e, p: e - one_minus * (e - p), state.params, params
    )
    return EmaState(params=new, decay=state.decay, num_updates=n)
