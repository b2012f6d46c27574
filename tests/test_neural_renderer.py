"""Neural-renderer upsampler head + HD SIREN variants (the reference's
dormant StyleGenerator3d path) — parity vs the instantiated torch modules.

Reference: generators/neural_rendering.py (NeuralRenderer),
siren/siren.py:247-302 (SPATIALSIRENBASELINEHD), :1301-1366
(SPATIALSIRENSEMANTICHD), generators/generators.py:914-1018
(StyleGenerator3d forward).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from fenerf_tpu.compat.torch_import import field_from_torch
from fenerf_tpu.models import generator as gen
from fenerf_tpu.nn import fields
from fenerf_tpu.nn.neural_renderer import (NeuralRendererConfig,
                                           apply_neural_renderer,
                                           init_neural_renderer,
                                           neural_renderer_from_torch)

from reference_shim import import_reference_siren

ref_siren = import_reference_siren()


def _torch_filter2d(x, f, normalized=True):
    """kornia.filters.filter2D for the blur's 3x3 case: reflect border,
    normalized kernel, depthwise conv."""
    import torch.nn.functional as F

    k = f if f.dim() == 2 else f[0]
    if normalized:
        k = k / k.sum()
    c = x.shape[1]
    w = k[None, None].expand(c, 1, -1, -1)
    xp = F.pad(x, (1, 1, 1, 1), mode="reflect")
    return F.conv2d(xp, w, groups=c)


def _import_neural_renderer(**kw):
    import kornia.filters as kf

    kf.filter2D = _torch_filter2d  # activate the stubbed dependency
    import importlib

    nr_mod = importlib.import_module("generators.neural_rendering")
    importlib.reload(nr_mod)
    return nr_mod.NeuralRenderer(**kw)


class TestNeuralRendererParity:
    @pytest.mark.parametrize("feat,rgbup", [("nn", "nn"),
                                            ("bilinear", "bilinear")])
    def test_parity_vs_torch(self, feat, rgbup):
        torch.manual_seed(0)
        kw = dict(n_feat=32, input_dim=16, out_dim=3, min_feat=8,
                  img_size=32, input_size=8, use_rgb_skip=True,
                  upsample_feat=feat, upsample_rgb=rgbup)
        tm = _import_neural_renderer(**kw)
        tm.eval()
        cfg = NeuralRendererConfig(**kw)
        params = neural_renderer_from_torch(tm.state_dict(), cfg)
        x = np.random.RandomState(1).randn(2, 16, 8, 8).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x)).numpy()
        ours = apply_neural_renderer(params, cfg, jnp.asarray(x))
        assert ours.shape == ref.shape == (2, 3, 32, 32)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_use_norm_and_no_skip(self):
        # shape/finite checks for the remaining config axes
        cfg = NeuralRendererConfig(n_feat=16, input_dim=16, min_feat=8,
                                   img_size=16, input_size=4,
                                   use_rgb_skip=False, use_norm=True,
                                   upsample_feat="bilinear")
        params = init_neural_renderer(jax.random.key(0), cfg)
        out = apply_neural_renderer(params, cfg,
                                    jnp.ones((1, 16, 4, 4)) * 0.3)
        assert out.shape == (1, 3, 16, 16)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestHDFieldParity:
    def _points(self, n=7):
        rng = np.random.RandomState(2)
        pts = rng.randn(1, n, 3).astype(np.float32) * 0.1
        dirs = rng.randn(1, n, 3).astype(np.float32)
        z = rng.randn(1, 16).astype(np.float32)
        return pts, dirs, z

    def test_baseline_hd(self):
        torch.manual_seed(1)
        tm = ref_siren.SPATIALSIRENBASELINEHD(input_dim=3, z_dim=16,
                                              hidden_dim=32, output_dim=65)
        cfg = fields.get_config("SPATIALSIRENBASELINEHD", z_geo_dim=16,
                                z_app_dim=16, hidden_dim=32)
        assert cfg.output_dim == 65
        params = field_from_torch(tm.state_dict(), cfg)
        pts, dirs, z = self._points()
        with torch.no_grad():
            ref = tm(torch.tensor(pts), torch.tensor(z),
                     torch.tensor(dirs)).numpy()
        fg, fa = fields.field_film(params, cfg, jnp.asarray(z),
                                   jnp.asarray(z))
        ours = fields.apply_field(params, cfg, jnp.asarray(pts),
                                  jnp.asarray(dirs), fg, fa)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

    def test_semantic_hd(self):
        torch.manual_seed(2)
        tm = ref_siren.SPATIALSIRENSEMANTICHD(input_dim=3, z_dim=16,
                                              hidden_dim=32, output_dim=129)
        cfg = fields.get_config("SPATIALSIRENSEMANTICHD", z_geo_dim=16,
                                z_app_dim=16, hidden_dim=32)
        assert cfg.output_dim == 129
        params = field_from_torch(tm.state_dict(), cfg)
        pts, dirs, z = self._points()
        with torch.no_grad():
            ref = tm(torch.tensor(pts), torch.tensor(z),
                     torch.tensor(dirs)).numpy()
        fg, fa = fields.field_film(params, cfg, jnp.asarray(z),
                                   jnp.asarray(z))
        ours = fields.apply_field(params, cfg, jnp.asarray(pts),
                                  jnp.asarray(dirs), fg, fa)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


class TestRenderHD:
    def test_end_to_end_shapes(self):
        """StyleGenerator3d flow: 8px 64-ch feature render -> 32px RGB, and
        the dual-renderer semantic split."""
        cfg = fields.get_config("SPATIALSIRENSEMANTICHD", z_geo_dim=8,
                                z_app_dim=8, hidden_dim=16,
                                map_hidden_dim=16)
        params = fields.init_field(jax.random.key(0), cfg)
        nr_cfg = NeuralRendererConfig(n_feat=16, input_dim=64, min_feat=8,
                                      img_size=32, input_size=8, out_dim=3)
        nr_seg_cfg = NeuralRendererConfig(n_feat=16, input_dim=64,
                                          min_feat=8, img_size=32,
                                          input_size=8, out_dim=19,
                                          final_actvn=False)
        nr_img = init_neural_renderer(jax.random.key(1), nr_cfg)
        nr_seg = init_neural_renderer(jax.random.key(2), nr_seg_cfg)
        z = jnp.ones((2, 8)) * 0.1
        fg, fa = fields.field_film(params, cfg, z, z)
        rcfg = gen.RenderConfig(img_size=8, num_steps=3, hierarchical=True)
        out = gen.render_hd(params, cfg, rcfg, jax.random.key(3), fg, fa,
                            batch_size=2, nr_img_params=nr_img,
                            nr_img_cfg=nr_cfg, nr_seg_params=nr_seg,
                            nr_seg_cfg=nr_seg_cfg)
        assert out["pixels"].shape == (2, 19 + 3, 32, 32)
        assert bool(jnp.all(jnp.isfinite(out["pixels"])))
        assert out["depth"].shape == (2, 8, 8)  # depth stays at feature res
