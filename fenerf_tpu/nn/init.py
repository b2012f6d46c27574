"""Parameter initializers matching pi-GAN/FENeRF training dynamics.

Reference: /root/reference/siren/siren.py:24-110 (sine/film inits),
siren.py:52-55 + sgdiscriminators.py:27-30 (kaiming leaky), plus torch's
nn.Linear/Conv2d defaults (kaiming_uniform(a=sqrt(5)) weights, +-1/sqrt(fan_in)
uniform bias) which the reference leaves in place for heads/projections.

All initializers return jnp arrays; linear weights use (fan_in, fan_out)
layout so forward is x @ w + b (row-major points dominate the workload).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def frequency_weight(key, fan_in, fan_out, freq=25.0, dtype=jnp.float32):
    """pi-GAN SIREN hidden-layer weight: U(+-sqrt(6/fan_in)/freq)."""
    return uniform(key, (fan_in, fan_out), math.sqrt(6.0 / fan_in) / freq, dtype)


def first_layer_film_weight(key, fan_in, fan_out, dtype=jnp.float32):
    """First FiLM layer: U(+-1/fan_in) (siren.py:45-49)."""
    return uniform(key, (fan_in, fan_out), 1.0 / fan_in, dtype)


def modified_first_weight(key, fan_in, fan_out, dtype=jnp.float32):
    """Embedding-grid variants: U(+-1/3) regardless of true fan-in
    (siren.py:333-338 hardcodes num_input=3)."""
    return uniform(key, (fan_in, fan_out), 1.0 / 3.0, dtype)


def kaiming_leaky_weight(key, fan_in, fan_out, a=0.2, dtype=jnp.float32):
    """kaiming_normal(fan_in, leaky_relu a): N(0, sqrt(2/(1+a^2)/fan_in))."""
    std = math.sqrt(2.0 / (1.0 + a * a) / fan_in)
    return jax.random.normal(key, (fan_in, fan_out), dtype) * std


def torch_default_weight(key, fan_in, fan_out, dtype=jnp.float32):
    """torch nn.Linear/Conv2d default: kaiming_uniform(a=sqrt(5)) ==
    U(+-1/sqrt(fan_in))."""
    return uniform(key, (fan_in, fan_out), 1.0 / math.sqrt(fan_in), dtype)


def torch_default_bias(key, fan_in, fan_out, dtype=jnp.float32):
    """torch default bias: U(+-1/sqrt(fan_in))."""
    return uniform(key, (fan_out,), 1.0 / math.sqrt(fan_in), dtype)


def linear(key, fan_in, fan_out, weight_init, dtype=jnp.float32, **kw):
    """{'w': (in, out), 'b': (out,)} with torch-default bias."""
    kw_, kb = jax.random.split(key)
    return {
        "w": weight_init(kw_, fan_in, fan_out, dtype=dtype, **kw),
        "b": torch_default_bias(kb, fan_in, fan_out, dtype),
    }


def conv2d(key, in_ch, out_ch, ksize, weight_init=None, dtype=jnp.float32):
    """Conv params {'w': (kh, kw, in, out), 'b': (out,)}; default torch init."""
    kw_, kb = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    if weight_init is None:
        w = uniform(kw_, (ksize, ksize, in_ch, out_ch), 1.0 / math.sqrt(fan_in), dtype)
    else:
        w = weight_init(kw_, fan_in, 1, dtype=dtype)  # unused path; see discriminators
    b = uniform(kb, (out_ch,), 1.0 / math.sqrt(fan_in), dtype)
    return {"w": w, "b": b}


def conv2d_kaiming_leaky(key, in_ch, out_ch, ksize, a=0.2, dtype=jnp.float32):
    kw_, kb = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    std = math.sqrt(2.0 / (1.0 + a * a) / fan_in)
    w = jax.random.normal(kw_, (ksize, ksize, in_ch, out_ch), dtype) * std
    b = uniform(kb, (out_ch,), 1.0 / math.sqrt(fan_in), dtype)
    return {"w": w, "b": b}
