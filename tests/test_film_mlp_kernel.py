"""Fused Pallas point-MLP kernel vs the XLA reference path (interpret mode).

On CPU the kernel runs through the Pallas interpreter — numerics-only check;
performance is covered by bench.py on hardware.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from fenerf_tpu.nn import fields
from fenerf_tpu.ops import film_mlp as ops


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw.setdefault("interpret", True)
        kw.pop("cost_estimate", None)
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(ops.pl, "pallas_call", interp)
    yield


def _setup(name, **kw):
    cfg = fields.get_config(name, z_geo_dim=8, z_app_dim=8, **kw)
    params = fields.init_field(jax.random.key(0), cfg)
    b, n = 2, 256
    k = jax.random.key(1)
    pts = jax.random.normal(jax.random.fold_in(k, 0), (b, n, 3)) * 0.1
    dirs = jax.random.normal(jax.random.fold_in(k, 1), (b, n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    zg = jax.random.normal(jax.random.fold_in(k, 2), (b, 8))
    za = jax.random.normal(jax.random.fold_in(k, 3), (b, 8))
    film_g, film_a = fields.field_film(params, cfg, zg, za)
    return cfg, params, pts, dirs, film_g, film_a


class TestFusedKernel:
    def test_matches_xla_baseline_disentangle(self):
        cfg, params, pts, dirs, fg, fa = _setup(
            "SIRENBASELINESEMANTICDISENTANGLE", hidden_dim=32)
        ref = fields.apply_field(params, cfg, pts, dirs, fg, fa,
                                 compute_dtype=jnp.bfloat16)
        out = fields.apply_field(params, cfg, pts, dirs, fg, fa,
                                 backend="pallas")
        assert out.shape == ref.shape
        # both paths use bf16 matmuls; agreement is bf16-level
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_matches_xla_f32_reference_loosely(self):
        cfg, params, pts, dirs, fg, fa = _setup(
            "SIRENBASELINESEMANTICDISENTANGLE", hidden_dim=32)
        ref = fields.apply_field(params, cfg, pts, dirs, fg, fa)
        out = fields.apply_field(params, cfg, pts, dirs, fg, fa,
                                 backend="pallas")
        # bf16 matmuls vs f32: sigma is unbounded, rgb/labels bounded
        np.testing.assert_allclose(np.asarray(out[..., -4:-1]),
                                   np.asarray(ref[..., -4:-1]), atol=5e-2)

    def test_texture_embedding_with_grid(self):
        cfg, params, pts, dirs, fg, fa = _setup(
            "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96",
            hidden_dim=32)
        # shrink grid for CPU interpret speed
        import dataclasses
        cfg = dataclasses.replace(cfg, grid_resolution=8)
        params = fields.init_field(jax.random.key(0), cfg)
        fg, fa = fields.field_film(
            params, cfg, jnp.ones((2, 8)) * 0.1, jnp.ones((2, 8)) * 0.2)
        ref = fields.apply_field(params, cfg, pts, dirs, fg, fa,
                                 compute_dtype=jnp.bfloat16)
        out = fields.apply_field(params, cfg, pts, dirs, fg, fa,
                                 backend="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)

    def test_supported_predicate(self):
        assert ops.supported(fields.get_config("SIRENBASELINESEMANTICDISENTANGLE"))
        assert not ops.supported(fields.get_config("TALLSIREN"))
        assert not ops.supported(
            fields.get_config("EmbeddingPiGAN128SEMANTICDISENTANGLE"))


class TestFusedBackward:
    def _grad_setup(self, name="SIRENBASELINESEMANTICDISENTANGLE", **kw):
        cfg = fields.get_config(name, z_geo_dim=8, z_app_dim=8,
                                hidden_dim=32, **kw)
        params = fields.init_field(jax.random.key(0), cfg)
        b, n = 2, 128
        k = jax.random.key(1)
        pts = jax.random.normal(jax.random.fold_in(k, 0), (b, n, 3)) * 0.1
        dirs = jax.random.normal(jax.random.fold_in(k, 1), (b, n, 3))
        zg = jax.random.normal(jax.random.fold_in(k, 2), (b, 8))
        za = jax.random.normal(jax.random.fold_in(k, 3), (b, 8))
        return cfg, params, pts, dirs, zg, za

    def _compare_grads(self, cfg, params, pts, dirs, zg, za, rtol=0.02):
        def loss(p, backend):
            fg, fa = fields.field_film(p, cfg, zg, za)
            # XLA reference in bf16 compute: the kernel's matmuls are bf16,
            # so this isolates kernel-math errors from precision noise
            # (verified separately: XLA-bf16 deviates from f32 identically)
            out = fields.apply_field(p, cfg, pts, dirs, fg, fa,
                                     backend=backend,
                                     compute_dtype=jnp.bfloat16)
            return jnp.sum(out ** 2)

        g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
        g_ker = jax.grad(lambda p: loss(p, "pallas_train"))(params)
        for path, (a, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_ref)[0],
                zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_ker))):
            a, b = np.asarray(a), np.asarray(b)
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path[0])
            if na < 1e-8 and nb < 1e-8:
                continue
            cos = float((a * b).sum() / max(na * nb, 1e-12))
            assert cos > 0.999, f"{name}: cos={cos}"
            assert abs(na - nb) / max(na, 1e-12) < rtol, \
                f"{name}: |ref|={na} |ker|={nb}"

    def test_grads_match_xla_baseline(self):
        cfg, params, pts, dirs, zg, za = self._grad_setup()
        self._compare_grads(cfg, params, pts, dirs, zg, za)

    def test_grads_match_with_texture_grid(self):
        import dataclasses
        cfg, params, pts, dirs, zg, za = self._grad_setup(
            "TextureEmbeddingPiGAN256SEMANTICDISENTANGLE_DIM_96")
        cfg = dataclasses.replace(cfg, grid_resolution=8)
        params = fields.init_field(jax.random.key(0), cfg)
        self._compare_grads(cfg, params, pts, dirs, zg, za)

    def test_forward_value_matches(self):
        cfg, params, pts, dirs, zg, za = self._grad_setup()
        fg, fa = fields.field_film(params, cfg, zg, za)
        a = fields.apply_field(params, cfg, pts, dirs, fg, fa,
                               backend="pallas")
        b = fields.apply_field(params, cfg, pts, dirs, fg, fa,
                               backend="pallas_train")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
