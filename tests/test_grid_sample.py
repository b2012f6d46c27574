"""Validate trilinear grid sampling against torch.grid_sample semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenerf_tpu.core.grid_sample import grid_sample_3d


def _torch_reference(grid_np, coords_np):
    torch = pytest.importorskip("torch")
    g = torch.tensor(grid_np)[None]  # (1, C, D, H, W)
    n = coords_np.shape[0]
    c = torch.tensor(coords_np).reshape(1, 1, 1, n, 3)
    out = torch.nn.functional.grid_sample(
        g, c, mode="bilinear", padding_mode="zeros", align_corners=True
    )  # (1, C, 1, 1, N)
    return out[0, :, 0, 0, :].T.numpy()  # (N, C)


class TestGridSample3D:
    def test_matches_torch_interior(self):
        rng = np.random.RandomState(0)
        grid = rng.randn(4, 5, 6, 7).astype(np.float32)  # (C, D, H, W)
        coords = (rng.rand(64, 3).astype(np.float32) * 2 - 1) * 0.95
        ours = grid_sample_3d(jnp.asarray(grid), jnp.asarray(coords))
        ref = _torch_reference(grid, coords)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_matches_torch_out_of_bounds(self):
        rng = np.random.RandomState(1)
        grid = rng.randn(2, 4, 4, 4).astype(np.float32)
        coords = (rng.rand(64, 3).astype(np.float32) * 4 - 2)  # in [-2, 2]
        ours = grid_sample_3d(jnp.asarray(grid), jnp.asarray(coords))
        ref = _torch_reference(grid, coords)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_exact_corner_align_corners(self):
        grid = jnp.arange(2 * 3 * 3 * 3, dtype=jnp.float32).reshape(2, 3, 3, 3)
        # coord (-1,-1,-1) -> index (0,0,0); (1,1,1) -> (W-1,H-1,D-1)
        out = grid_sample_3d(grid, jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]))
        np.testing.assert_allclose(out[0], grid[:, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out[1], grid[:, 2, 2, 2], atol=1e-6)

    def test_batched_coords_shape(self):
        grid = jnp.ones((8, 4, 4, 4))
        coords = jnp.zeros((2, 10, 3))
        out = grid_sample_3d(grid, coords)
        assert out.shape == (2, 10, 8)
        np.testing.assert_allclose(out, 1.0, atol=1e-6)

    def test_gradients_flow(self):
        grid = jnp.ones((2, 4, 4, 4))
        coords = jnp.array([[0.1, -0.2, 0.3]])
        g = jax.grad(lambda gr: grid_sample_3d(gr, coords).sum())(grid)
        assert float(jnp.abs(g).sum()) > 0


class TestGridSample3DFast:
    def test_matches_slow_path_interior_and_oob(self):
        from fenerf_tpu.core.grid_sample import grid_sample_3d_fast

        rng = np.random.RandomState(3)
        grid = jnp.asarray(rng.randn(5, 6, 7, 8).astype(np.float32))
        coords = jnp.asarray((rng.rand(500, 3).astype(np.float32) * 4 - 2))
        slow = grid_sample_3d(grid, coords)
        fast = grid_sample_3d_fast(grid, coords)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-5, rtol=1e-5)

    def test_matches_torch(self):
        from fenerf_tpu.core.grid_sample import grid_sample_3d_fast

        rng = np.random.RandomState(4)
        grid = rng.randn(4, 5, 5, 5).astype(np.float32)
        coords = (rng.rand(256, 3).astype(np.float32) * 3 - 1.5)
        ref = _torch_reference(grid, coords)
        fast = grid_sample_3d_fast(jnp.asarray(grid), jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(fast), ref, atol=1e-5)

    def test_grad_flows(self):
        from fenerf_tpu.core.grid_sample import grid_sample_3d_fast

        grid = jnp.ones((2, 4, 4, 4))
        coords = jnp.asarray([[0.1, -0.2, 0.3]])
        g = jax.grad(lambda gr: grid_sample_3d_fast(gr, coords).sum())(grid)
        assert float(jnp.abs(g).sum()) > 0


def _build_zexp_round4(grid, table_dtype=None):
    """The round-4 channel-major construction (stack 8 corners, transpose
    the 8x expansion) — the layout contract the rewrite must preserve."""
    c, d, h, w = grid.shape
    p = jnp.pad(grid, ((0, 0), (1, 1), (1, 1), (1, 1)))
    if table_dtype is not None:
        p = p.astype(table_dtype)
    e = jnp.stack([
        p[:, :-1, :-1, :-1], p[:, :-1, :-1, 1:],
        p[:, :-1, 1:, :-1], p[:, :-1, 1:, 1:],
        p[:, 1:, :-1, :-1], p[:, 1:, :-1, 1:],
        p[:, 1:, 1:, :-1], p[:, 1:, 1:, 1:],
    ], axis=0)
    return e.transpose(2, 3, 4, 0, 1).reshape((d + 1) * (h + 1) * (w + 1),
                                              8 * c)


class TestZexpTableBuildAndAdjoint:
    def test_build_matches_round4_construction(self):
        from fenerf_tpu.core.grid_sample import build_zexp_table

        rng = np.random.RandomState(7)
        grid = jnp.asarray(rng.randn(3, 4, 5, 6).astype(np.float32))
        for dt in (None, jnp.bfloat16):
            ours = build_zexp_table(grid, dt)
            ref = _build_zexp_round4(grid, dt)
            assert ours.dtype == ref.dtype
            np.testing.assert_array_equal(
                np.asarray(ours, np.float32), np.asarray(ref, np.float32))

    def test_adjoint_matches_autodiff_vjp(self):
        from fenerf_tpu.core.grid_sample import zexp_table_adjoint

        rng = np.random.RandomState(8)
        grid = jnp.asarray(rng.randn(2, 3, 4, 5).astype(np.float32))
        _, vjp = jax.vjp(_build_zexp_round4, grid)
        dtable = jnp.asarray(
            rng.randn(4 * 5 * 6, 16).astype(np.float32))
        want = vjp(dtable)[0]
        got = zexp_table_adjoint(dtable, grid.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_custom_vjp_routes_through_hand_adjoint(self):
        from fenerf_tpu.core.grid_sample import (build_zexp_table,
                                                 zexp_table_adjoint)

        rng = np.random.RandomState(9)
        grid = jnp.asarray(rng.randn(2, 3, 3, 3).astype(np.float32))
        cot = jnp.asarray(rng.randn(4 * 4 * 4, 16).astype(np.float32))
        g = jax.grad(lambda gr: (build_zexp_table(gr) * cot).sum())(grid)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(zexp_table_adjoint(cot, grid.shape)),
            rtol=1e-6, atol=1e-6)

    def test_fast_sample_grid_grads_match_slow_path(self):
        # end-to-end: d/dgrid through table build + gather == the 8-gather
        # reference formulation's gradient
        from fenerf_tpu.core.grid_sample import grid_sample_3d_fast

        rng = np.random.RandomState(10)
        grid = jnp.asarray(rng.randn(3, 4, 4, 4).astype(np.float32))
        coords = jnp.asarray((rng.rand(64, 3).astype(np.float32) * 3 - 1.5))
        w = jnp.asarray(rng.randn(64, 3).astype(np.float32))
        g_fast = jax.grad(
            lambda gr: (grid_sample_3d_fast(gr, coords) * w).sum())(grid)
        g_slow = jax.grad(
            lambda gr: (grid_sample_3d(gr, coords) * w).sum())(grid)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                                   rtol=1e-4, atol=1e-5)
