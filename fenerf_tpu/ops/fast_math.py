"""Fast transcendental approximations for the SIREN hot path.

Profiling on TPU v5e shows jnp.sin consumes ~2/3 of field-evaluation time
(the FiLM nets compute ~2.8k sins/point; matmul precision is irrelevant:
bf16 vs f32 MXU made no difference). XLA's sin lowering pays for full-range
double-word reduction; FiLM arguments are O(100) at most, so a cheap
round-based reduction + odd polynomial on [-pi, pi] is exact enough
(max abs error 1.7e-5 at degree 9, 6.3e-7 at degree 11 in f32 — far below
bf16 activation noise).

fast_sin is a custom_jvp (derivative = fast_cos) so it is usable under
training autodiff as well.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * math.pi
_INV_TWO_PI = 1.0 / _TWO_PI

# odd-power least-squares coefficients on [-pi, pi]
_C9 = (0.999984586774494, -0.16663258204297426, 0.008312382933816725,
       -0.00019316182196017474, 2.1732100680830095e-06)
_C11 = (0.9999997068716395, -0.16666577176368283, 0.008332557849165041,
        -0.0001981256813700074, 2.7040424852421728e-06,
        -2.053387476864839e-08)
# degree 7: max |err| 6.6e-4 — one FMA cheaper again; below the ~4e-3
# relative rounding the bf16 matmul inputs already carry (profiling knob;
# production stays at degree 9)
_C7 = (0.999450173058242, -0.1658384294768091, 0.007998575320167381,
       -0.0001477404380785241)


def _poly_sin(r: jax.Array, coeffs=_C9) -> jax.Array:
    # degree 9: max |err| 1.7e-5 — an order below bf16 activation noise and
    # one FMA cheaper than degree 11 on the VPU-bound hot path
    r2 = r * r
    acc = jnp.asarray(coeffs[-1], r.dtype)
    for c in coeffs[-2::-1]:
        acc = acc * r2 + c
    return acc * r


def _reduce(x: jax.Array) -> jax.Array:
    """Range-reduce to [-pi, pi] (valid for |x| << 2^23, true of FiLM args)."""
    return x - _TWO_PI * jnp.round(x * _INV_TWO_PI)


@jax.custom_jvp
def fast_sin(x: jax.Array) -> jax.Array:
    return _poly_sin(_reduce(x))


def fast_cos(x: jax.Array) -> jax.Array:
    return fast_sin(x + math.pi / 2.0)


@fast_sin.defjvp
def _fast_sin_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return fast_sin(x), fast_cos(x) * t
