"""Parity tests: upfirdn2d/fused ops, modulated conv, StyleGenerator2D, and
the latent-grid SIREN — all vs the reference torch implementations."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from fenerf_tpu.compat.torch_import import (grid_field_from_torch,
                                            style_generator_from_torch)
from fenerf_tpu.nn import latent_grid_field as lgf
from fenerf_tpu.nn import stylegan
from fenerf_tpu.ops import upfirdn2d as ops

from reference_shim import import_reference_siren

ref_siren = import_reference_siren()
import importlib

ref_ops = importlib.import_module("siren.op.native_ops")
ref_layers = importlib.import_module("siren.layers")
ref_grid = importlib.import_module("siren.latent_grid")


class TestUpfirdn:
    def test_fused_leaky_relu_4d(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 5, 4, 4).astype(np.float32)
        b = rng.randn(5).astype(np.float32)
        ref = ref_ops.fused_leaky_relu(torch.tensor(x), torch.tensor(b)).numpy()
        ours = ops.fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

    def test_fused_leaky_relu_2d(self):
        rng = np.random.RandomState(1)
        x = rng.randn(3, 7).astype(np.float32)
        b = rng.randn(7).astype(np.float32)
        ref = ref_ops.fused_leaky_relu(torch.tensor(x), torch.tensor(b)).numpy()
        ours = ops.fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

    @pytest.mark.parametrize("up,down,pad", [
        (1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (2, 2)),
        (1, 1, (0, 0)), (4, 1, (3, 3)),
    ])
    def test_upfirdn2d_matches(self, up, down, pad):
        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 8, 8).astype(np.float32)
        k1 = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
        k = np.outer(k1, k1) / k1.sum() ** 2
        ref = ref_ops.upfirdn2d(torch.tensor(x), torch.tensor(k), up=up,
                                down=down, pad=pad).numpy()
        ours = ops.upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down,
                             pad=pad)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_upsample_downsample_roundtrip_shapes(self):
        x = jnp.ones((1, 2, 16, 16))
        up = ops.upsample2d(x)
        assert up.shape == (1, 2, 32, 32)
        down = ops.downsample2d(x)
        assert down.shape == (1, 2, 8, 8)
        # interior of a constant image stays constant through the FIR
        # (kernel normalized to sum 1, gain factor^2 compensates zero-fill)
        np.testing.assert_allclose(np.asarray(up[0, 0, 8:24, 8:24]), 1.0,
                                   rtol=1e-5)


def _import_mod_conv(tm):
    sd = {k: v for k, v in tm.state_dict().items()}
    from fenerf_tpu.compat.torch_import import _mod_conv
    return _mod_conv(sd, "")  # empty prefix -> keys like '.weight'


class TestModulatedConv:
    def _case(self, upsample=False, downsample=False, demodulate=True,
              activate=True, ksize=3):
        torch.manual_seed(0)
        tm = ref_layers.ModulatedConv2d(
            in_channel=6, out_channel=8, kernel_size=ksize, z_dim=4,
            demodulate=demodulate, upsample=upsample, downsample=downsample,
            activate=activate, bias=True)
        tm.eval()
        rng = np.random.RandomState(3)
        x = rng.randn(2, 6, 8, 8).astype(np.float32)
        z = rng.randn(2, 4).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x), torch.tensor(z)).numpy()
        sd = tm.state_dict()
        from fenerf_tpu.compat.torch_import import _lin, _np
        p = {
            "w": jnp.asarray(_np(sd["weight"])[0].transpose(2, 3, 1, 0)),
            "mod": _lin(sd, "modulation"),
        }
        if "activate.bias" in sd:
            p["b"] = jnp.asarray(_np(sd["activate.bias"]))
        elif "bias" in sd:
            p["b"] = jnp.asarray(_np(sd["bias"]).reshape(-1))
        else:
            p["b"] = jnp.zeros((8,))
        ours = stylegan.modulated_conv2d(
            p, jnp.asarray(x), jnp.asarray(z), demodulate=demodulate,
            upsample=upsample, downsample=downsample, activate=activate)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4,
                                   rtol=1e-3)

    def test_plain(self):
        self._case()

    def test_no_demod_no_activate_1x1(self):
        self._case(demodulate=False, activate=False, ksize=1)

    def test_upsample(self):
        self._case(upsample=True)

    def test_downsample(self):
        self._case(downsample=True)


class TestStyleGenerator2D:
    def test_matches_reference(self):
        torch.manual_seed(0)
        tm = ref_grid.StyleGenerator2D(out_res=16, out_ch=8, z_dim=12,
                                       ch_mul=1, ch_max=32, skip_conn=False)
        tm.eval()
        rng = np.random.RandomState(4)
        z = rng.randn(2, 12).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(z)).numpy()
        params = style_generator_from_torch(tm.state_dict(), skip_conn=False)
        ours = stylegan.style_generator_2d(params, jnp.asarray(z))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                                   rtol=1e-3)

    def test_skip_conn_variant(self):
        torch.manual_seed(1)
        tm = ref_grid.StyleGenerator2D(out_res=16, out_ch=4, z_dim=8,
                                       ch_mul=1, ch_max=16, skip_conn=True)
        tm.eval()
        z = np.random.RandomState(5).randn(1, 8).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(z)).numpy()
        params = style_generator_from_torch(tm.state_dict(), skip_conn=True)
        ours = stylegan.style_generator_2d(params, jnp.asarray(z),
                                           skip_conn=True)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4,
                                   rtol=1e-3)


class TestLatentGridField:
    def test_matches_reference(self):
        torch.manual_seed(0)
        tm = ref_siren.SPATIALSIRENGRID(input_dim=3, z_dim=16, hidden_dim=32,
                                        output_dim=4)
        # shrink the internal style generator for test speed: reference
        # hardcodes z_dim->StyleGenerator2D(z_dim=z_dim, ch_max=256); keep it
        tm.eval()
        rng = np.random.RandomState(6)
        pts = (rng.rand(2, 40, 3).astype(np.float32) * 2 - 1) * 0.1
        dirs = rng.randn(2, 40, 3).astype(np.float32)
        z = rng.randn(2, 16).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(pts), torch.tensor(z),
                     ray_directions=torch.tensor(dirs)).numpy()
        cfg = lgf.GridFieldConfig(z_dim=16, hidden_dim=32)
        params = grid_field_from_torch(tm.state_dict())
        ours = lgf.apply_grid_field(params, cfg, jnp.asarray(pts),
                                    jnp.asarray(dirs), jnp.asarray(z))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3,
                                   rtol=2e-3)

    def test_local_coordinates(self):
        g = jnp.asarray([[-1.0, -0.99, 0.0, 0.5]]).T[None]
        out = lgf.local_coordinates(g, 32)
        assert out.shape == g.shape
        assert float(jnp.abs(out).max()) <= 1.0 + 1e-5

    def test_init_and_forward(self):
        cfg = lgf.GridFieldConfig(z_dim=8, hidden_dim=16, ch_max=16)
        params = lgf.init_grid_field(jax.random.key(0), cfg)
        pts = jnp.zeros((1, 10, 3))
        dirs = jnp.zeros((1, 10, 3))
        out = lgf.apply_grid_field(params, cfg, pts, dirs, jnp.ones((1, 8)))
        assert out.shape == (1, 10, 4)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_precomputed_plane_is_equivalent(self):
        """apply_grid_field(plane=compute_plane(...)) must equal the
        self-computing path bitwise — the hoist render_grid_from_z /
        render_grid_sharded rely on to keep the StyleGenerator2D out of
        ray-chunk loop bodies."""
        cfg = lgf.GridFieldConfig(z_dim=8, hidden_dim=16, ch_max=16,
                                  grid_res=8, grid_ch=8)
        params = lgf.init_grid_field(jax.random.key(1), cfg)
        rng = np.random.RandomState(3)
        pts = jnp.asarray(rng.uniform(-0.1, 0.1, (2, 17, 3)).astype("float32"))
        dirs = jnp.asarray(rng.randn(2, 17, 3).astype("float32"))
        z = jnp.asarray(rng.randn(2, 8).astype("float32"))
        plane = lgf.compute_plane(params, cfg, z)
        a = lgf.apply_grid_field(params, cfg, pts, dirs, z)
        b = lgf.apply_grid_field(params, cfg, pts, dirs, z, plane=plane)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
