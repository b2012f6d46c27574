"""Pallas table-cotangent fold kernel (ops/zexp_fold.py) vs the XLA slice
adjoint — interpret mode on CPU, numerics-only (perf is measured by
scripts/profile_zexp_adjoint.py on hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenerf_tpu.core.grid_sample import zexp_table_adjoint_xla as _xla_adjoint
from fenerf_tpu.ops.zexp_fold import fold_zexp


class TestFoldZexp:
    @pytest.mark.parametrize("grid_shape,ytile", [
        ((3, 4, 5, 6), 32),   # ytile > Hp: single y block
        ((3, 4, 5, 6), 4),    # Hp=6 not divisible: OOB-padded tail block
        ((8, 8, 8, 8), 3),    # ragged everywhere
        ((2, 6, 3, 4), 2),
    ])
    def test_matches_xla_adjoint(self, grid_shape, ytile):
        c, d, h, w = grid_shape
        rows = (d + 1) * (h + 1) * (w + 1)
        rng = np.random.RandomState(17)
        dt = jnp.asarray(rng.randn(rows, 8 * c).astype(np.float32))
        want = _xla_adjoint(dt, grid_shape)
        got = fold_zexp(dt, grid_shape, ytile=ytile, interpret=True)
        assert got.shape == (c, d, h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_bf16_cotangent_accumulates_f32(self):
        grid_shape = (4, 3, 3, 3)
        rows = 4 * 4 * 4
        rng = np.random.RandomState(23)
        dt = jnp.asarray(rng.randn(rows, 32).astype(np.float32)
                         ).astype(jnp.bfloat16)
        want = _xla_adjoint(dt, grid_shape)
        got = fold_zexp(dt, grid_shape, interpret=True)
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_jit_under_grad_composition(self):
        """fold_zexp inside a jitted function (as the train-step fold is)."""
        grid_shape = (2, 3, 3, 3)
        rows = 4 * 4 * 4
        rng = np.random.RandomState(29)
        dt = jnp.asarray(rng.randn(rows, 16).astype(np.float32))
        f = jax.jit(lambda t: fold_zexp(t, grid_shape, interpret=True).sum())
        g = jax.jit(lambda t: _xla_adjoint(t, grid_shape).sum())
        np.testing.assert_allclose(float(f(dt)), float(g(dt)), rtol=1e-5)
