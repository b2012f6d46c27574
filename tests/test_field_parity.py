"""Numeric parity of the generic FiLM-SIREN vs reference architectures.

Strategy: instantiate the reference torch module (random weights), convert the
state_dict through compat.torch_import, evaluate both on identical inputs, and
require near-exact agreement. This validates the field math AND the checkpoint
importer in one shot (the path pretrained .pth checkpoints will take).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fenerf_tpu.compat.torch_import import field_from_torch
from fenerf_tpu.nn import fields

from reference_shim import import_reference_siren

ref_siren = import_reference_siren()


def _parity_case(ref_cls, cfg, tol=2e-4, n=33, zdims=(8, 8)):
    torch.manual_seed(0)
    kwargs = dict(hidden_dim=cfg.hidden_dim, output_dim=cfg.output_dim)
    if cfg.single_latent:
        m = ref_cls(input_dim=3, z_dim=cfg.z_geo_dim, **kwargs)
    else:
        m = ref_cls(z_geo_dim=cfg.z_geo_dim, z_app_dim=cfg.z_app_dim, **kwargs)
    m.eval()

    rng = np.random.RandomState(1)
    pts = rng.randn(2, n, 3).astype(np.float32) * 0.1
    dirs = rng.randn(2, n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    zg = rng.randn(2, cfg.z_geo_dim).astype(np.float32)
    za = rng.randn(2, cfg.z_app_dim).astype(np.float32)

    with torch.no_grad():
        if cfg.single_latent:
            ref_out = m(
                torch.tensor(pts), torch.tensor(zg),
                ray_directions=torch.tensor(dirs),
            ).numpy()
        else:
            ref_out = m(
                torch.tensor(pts), torch.tensor(zg), torch.tensor(za),
                ray_directions=torch.tensor(dirs),
            ).numpy()

    params = field_from_torch(m.state_dict(), cfg)
    film_g, film_a = fields.field_film(params, cfg, jnp.asarray(zg), jnp.asarray(za))
    ours = fields.apply_field(
        params, cfg, jnp.asarray(pts), jnp.asarray(dirs), film_g, film_a
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=tol, rtol=1e-3)


def _texture_256_case(ref_cls, cfg, tol=1e-3, n=9):
    """Parity for the hidden-256-hardcoded subclasses (hidden_dim is not an
    accepted override there — the subclass __init__ passes it explicitly)."""
    torch.manual_seed(0)
    if cfg.single_latent:
        m = ref_cls(input_dim=3, z_dim=cfg.z_geo_dim, output_dim=cfg.output_dim)
    else:
        m = ref_cls(z_geo_dim=cfg.z_geo_dim, z_app_dim=cfg.z_app_dim,
                    output_dim=cfg.output_dim)
    m.eval()
    rng = np.random.RandomState(1)
    pts = rng.randn(1, n, 3).astype(np.float32) * 0.1
    dirs = rng.randn(1, n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    zg = rng.randn(1, cfg.z_geo_dim).astype(np.float32)
    za = rng.randn(1, cfg.z_app_dim).astype(np.float32)
    with torch.no_grad():
        if cfg.single_latent:
            ref_out = m(torch.tensor(pts), torch.tensor(zg),
                        ray_directions=torch.tensor(dirs)).numpy()
        else:
            ref_out = m(torch.tensor(pts), torch.tensor(zg), torch.tensor(za),
                        ray_directions=torch.tensor(dirs)).numpy()
    params = field_from_torch(m.state_dict(), cfg)
    fg, fa = fields.field_film(params, cfg, jnp.asarray(zg), jnp.asarray(za))
    ours = fields.apply_field(
        params, cfg, jnp.asarray(pts), jnp.asarray(dirs), fg, fa
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=tol, rtol=1e-3)


class TestFieldParity:
    def test_siren_baseline_semantic_disentangle(self):
        cfg = fields.get_config(
            "SIRENBASELINESEMANTICDISENTANGLE",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(ref_siren.SIRENBASELINESEMANTICDISENTANGLE, cfg)

    def test_spatial_siren_semantic_disentangle(self):
        cfg = fields.get_config(
            "SPATIALSIRENSEMANTICDISENTANGLE",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(ref_siren.SPATIALSIRENSEMANTICDISENTANGLE, cfg)

    def test_spatial_siren_disentangle(self):
        cfg = fields.get_config(
            "SPATIALSIRENDISENTANGLE",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(ref_siren.SPATIALSIRENDISENTANGLE, cfg)

    def test_spatial_siren_aug_disentangle(self):
        # augmented color branch over [ray_dir, Linear(h,3)] (siren.py:904)
        cfg = fields.get_config(
            "SPATIALSIRENAUGDISENTANGLE",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(ref_siren.SPATIALSIRENAUGDISENTANGLE, cfg)

    def test_res_siren_disentangle(self):
        # i3DMM-style residual coords + stacked-linear sigma (siren.py:982)
        cfg = fields.get_config(
            "RESSIRENDISENTANGLE",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(ref_siren.RESSIRENDISENTANGLE, cfg)

    def test_spatial_siren_baseline_semantic(self):
        cfg = fields.get_config(
            "SPATIALSIRENBASELINESEMANTIC",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(ref_siren.SPATIALSIRENBASELINESEMANTIC, cfg)

    def test_texture_embedding_256_dim96(self):
        # this reference subclass hardcodes hidden_dim=256 (siren.py:1544-1546)
        cfg = fields.get_config(
            "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96",
            z_geo_dim=8, z_app_dim=8,
        )
        torch.manual_seed(0)
        m = ref_siren.TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96(
            z_geo_dim=8, z_app_dim=8, output_dim=cfg.output_dim
        )
        m.eval()
        rng = np.random.RandomState(1)
        pts = rng.randn(1, 9, 3).astype(np.float32) * 0.1
        dirs = rng.randn(1, 9, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        zg = rng.randn(1, 8).astype(np.float32)
        za = rng.randn(1, 8).astype(np.float32)
        with torch.no_grad():
            ref_out = m(
                torch.tensor(pts), torch.tensor(zg), torch.tensor(za),
                ray_directions=torch.tensor(dirs),
            ).numpy()
        params = field_from_torch(m.state_dict(), cfg)
        fg, fa = fields.field_film(params, cfg, jnp.asarray(zg), jnp.asarray(za))
        ours = fields.apply_field(
            params, cfg, jnp.asarray(pts), jnp.asarray(dirs), fg, fa
        )
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-3, rtol=1e-3)

    def test_embedding_pigan_grid_in_trunk(self):
        cfg = fields.get_config(
            "EmbeddingPiGAN128SEMANTICDISENTANGLE",
            hidden_dim=16, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(
            ref_siren.EmbeddingPiGAN128SEMANTICDISENTANGLE, cfg, tol=5e-4
        )

    def test_spatial_siren_semantic_film_label(self):
        cfg = fields.get_config("SPATIALSIRENSEMANTIC", z_geo_dim=16,
                                z_app_dim=16, hidden_dim=32)
        _parity_case(ref_siren.SPATIALSIRENSEMANTIC, cfg)

    def test_embedding_pigan128_rgb(self):
        cfg = fields.get_config("EmbeddingPiGAN128", z_geo_dim=16,
                                z_app_dim=16, hidden_dim=16)
        _parity_case(ref_siren.EmbeddingPiGAN128, cfg, tol=5e-4, n=9)

    def test_tallsiren_single_latent(self):
        cfg = fields.get_config("TALLSIREN", z_geo_dim=16, z_app_dim=16,
                                hidden_dim=32)
        _parity_case(ref_siren.TALLSIREN, cfg)

    def test_spatial_siren_baseline(self):
        cfg = fields.get_config("SPATIALSIRENBASELINE", z_geo_dim=16,
                                z_app_dim=16, hidden_dim=32)
        _parity_case(ref_siren.SPATIALSIRENBASELINE, cfg)

    def test_siren_baseline_semantic_disentangle_debug(self):
        # the _debug clone adds sigmoid on the label head (siren.py:1293)
        cfg = fields.get_config(
            "SIRENBASELINESEMANTICDISENTANGLE_debug",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(ref_siren.SIRENBASELINESEMANTICDISENTANGLE_debug, cfg)

    def test_texture_embedding_128(self):
        # color-branch grid, hidden_dim overridable on the 128 base class
        # (siren.py:1451-1530); grid stays (1,32,96,96,96)*0.01 regardless
        cfg = fields.get_config(
            "TextureEmbeddingPiGAN128SEMANTICDISENTANGLE",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(
            ref_siren.TextureEmbeddingPiGAN128SEMANTICDISENTANGLE, cfg,
            tol=5e-4, n=9,
        )

    def test_texture_embedding_128_wo_dir(self):
        # no-view-direction sibling: color input = [grid_feats, x]
        # (siren.py:1549-1641); ray_directions accepted but unused
        cfg = fields.get_config(
            "TextureEmbeddingPiGAN128SEMANTICDISENTANGLE_WO_DIR",
            hidden_dim=32, z_geo_dim=8, z_app_dim=8,
        )
        _parity_case(
            ref_siren.TextureEmbeddingPiGAN128SEMANTICDISENTANGLE_WO_DIR,
            cfg, tol=5e-4, n=9,
        )

    def test_texture_embedding_256(self):
        # subclass hardcodes hidden 256 + (1,32,64,64,64)*0.1 grid
        # (siren.py:1533-1538)
        cfg = fields.get_config(
            "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE",
            z_geo_dim=8, z_app_dim=8,
        )
        _texture_256_case(
            ref_siren.TextureEmbeddingPiGAN256SEMANTICDISENTANGLE, cfg
        )

    def test_texture_embedding_256_wo_dir_dim96(self):
        # second no-dir sibling: hidden 256, (1,32,96,96,96)*0.1 grid
        # (siren.py:1817-1822)
        cfg = fields.get_config(
            "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_WO_DIR_DIM_96",
            z_geo_dim=8, z_app_dim=8,
        )
        _texture_256_case(
            ref_siren.TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_WO_DIR_DIM_96,
            cfg,
        )

    def test_embedding_pigan256_rgb(self):
        # trunk-grid RGB variant: hidden 256 forced, (1,32,64,64,64)*0.1
        # (siren.py:407-410); single-latent signature
        cfg = fields.get_config("EmbeddingPiGAN256", z_geo_dim=16,
                                z_app_dim=16)
        _texture_256_case(ref_siren.EmbeddingPiGAN256, cfg)


class TestFieldInit:
    def test_init_shapes_match_torch(self):
        import jax
        cfg = fields.get_config("SIRENBASELINESEMANTICDISENTANGLE")
        params = fields.init_field(jax.random.key(0), cfg)
        assert len(params["trunk"]) == 8
        assert params["trunk"][0]["w"].shape == (3, 256)
        assert params["sigma_head"]["w"].shape == (256, 1)
        assert len(params["label_head"]) == 2
        assert params["label_head"][-1]["w"].shape == (256, 18)
        assert len(params["color"]) == 3
        assert params["color"][0]["w"].shape == (259, 256)
        assert params["geo_map"][0]["w"].shape == (256, 256)
        assert params["geo_map"][-1]["w"].shape == (256, 8 * 256 * 2)
        assert params["app_map"][-1]["w"].shape == (256, 3 * 256 * 2)

    def test_init_statistics(self):
        """Init distributions match pi-GAN's (moments, not exact values)."""
        import jax
        cfg = fields.get_config("SIRENBASELINESEMANTICDISENTANGLE")
        params = fields.init_field(jax.random.key(1), cfg)
        w = params["trunk"][3]["w"]
        bound = np.sqrt(6 / 256) / 25
        assert float(jnp.abs(w).max()) <= bound * 1.0001
        assert float(jnp.abs(w).max()) >= bound * 0.99
        w0 = params["trunk"][0]["w"]
        assert float(jnp.abs(w0).max()) <= 1 / 3 + 1e-6
        # mapping: kaiming normal std
        wm = params["geo_map"][1]["w"]
        assert abs(float(wm.std()) - np.sqrt(2 / 1.04 / 256)) < 0.01
        # last mapping layer scaled by 0.25
        wl = params["geo_map"][-1]["w"]
        assert abs(float(wl.std()) - 0.25 * np.sqrt(2 / 1.04 / 256)) < 0.01

    def test_texture_grid_init(self):
        import jax
        cfg = fields.get_config("TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96")
        params = fields.init_field(jax.random.key(0), cfg)
        assert params["grid"].shape == (32, 96, 96, 96)
        assert abs(float(params["grid"].std()) - 0.1) < 0.005
        assert params["color"][0]["w"].shape == (3 + 32 + 256, 256)


class TestTruncation:
    def test_truncate_psi(self):
        import jax
        cfg = fields.get_config(
            "SIRENBASELINESEMANTICDISENTANGLE", hidden_dim=16,
            z_geo_dim=8, z_app_dim=8,
        )
        params = fields.init_field(jax.random.key(0), cfg)
        avg_g, avg_a = fields.avg_film(params, cfg, jax.random.key(1), n=500)
        zg = jax.numpy.ones((2, 8))
        za = jax.numpy.ones((2, 8))
        fg, fa = fields.field_film(params, cfg, zg, za)
        t0 = fields.truncate_film(fg, avg_g, 0.0)
        np.testing.assert_allclose(
            t0[0], np.broadcast_to(np.asarray(avg_g[0]), t0[0].shape), atol=1e-6
        )
        t1 = fields.truncate_film(fg, avg_g, 1.0)
        np.testing.assert_allclose(t1[0], fg[0], atol=1e-6)
