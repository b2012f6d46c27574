"""Fused per-ray hierarchical kernels (ops/ray_finalize.py) vs the XLA path.

Runs through the Pallas interpreter on CPU — numerics/equivalence only;
performance is covered on hardware (scripts/profile_hier_ablate.py, bench.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fenerf_tpu.core import integrate as integ
from fenerf_tpu.ops import ray_finalize as rf


def _data(key, b=2, r=6, s=8, c1=5, ties=False):
    cz = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 0), (b, r, s)), -1)
    fz = jax.random.uniform(jax.random.fold_in(key, 1), (b, r, s))
    if ties:
        fz = fz.at[..., 2].set(cz[..., 5])
        cz = cz.at[..., 1].set(cz[..., 2])
    fo = jax.random.normal(jax.random.fold_in(key, 2), (b, r, s, c1))
    co = jax.random.normal(jax.random.fold_in(key, 3), (b, r, s, c1))
    noise = jax.random.normal(jax.random.fold_in(key, 4), (b, r, 2 * s))
    return fo, co, fz, cz, noise


class TestRayResample:
    def test_matches_xla_proposal_path(self):
        key = jax.random.key(0)
        b, r, s = 2, 10, 12
        sig = jax.random.normal(jax.random.fold_in(key, 0), (b, r, s))
        z = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1),
                                        (b, r, s)) + 0.9, -1)
        nz = jax.random.normal(jax.random.fold_in(key, 2), (b, r, s)) * 0.3
        u = jax.random.uniform(jax.random.fold_in(key, 3), (b, r, s))
        for clamp in ("relu", "softplus"):
            for noise in (nz, None):
                w = integ.integrate_weights(
                    sig, z, noise=None if noise is None else noise / 0.3,
                    noise_std=0.3, clamp_mode=clamp) + 1e-5
                ref = integ.sample_pdf(None, integ.midpoints(z),
                                       w[..., 1:-1], s, u=u)
                got = rf.ray_resample(sig, z, noise, u, clamp_mode=clamp,
                                      interpret=True)
                np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                           atol=1e-5, err_msg=f"{clamp}")

    def test_row_padding(self):
        """rows not divisible by tile: pad rows must not corrupt outputs."""
        key = jax.random.key(7)
        sig = jax.random.normal(key, (1, 5, 6))
        z = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1),
                                        (1, 5, 6)) + 0.9, -1)
        u = jax.random.uniform(jax.random.fold_in(key, 2), (1, 5, 6))
        got = rf.ray_resample(sig, z, None, u, tile=4, interpret=True)
        ref = rf.ray_resample(sig, z, None, u, tile=5, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


class TestRayFinalize:
    @pytest.mark.parametrize("kw", [
        dict(),
        dict(last_back=True),
        dict(white_back=True),
        dict(black_back=True),
        dict(clamp_mode="softplus"),
        dict(fill_mode="seg_padding_background", fill_color="light_grey"),
        dict(fill_mode="eval_white_back"),
        dict(fill_mode="debug"),
        dict(fill_mode="seg_padding_background", softmax_label=True,
             rgb_dim=3),
    ])
    def test_matches_xla(self, kw):
        fo, co, fz, cz, noise = _data(jax.random.key(3), ties=True)
        for nz in (noise, None):
            res = integ.composite_merged(fo, co, fz, cz, noise=nz,
                                         noise_std=1.0,
                                         clamp_mode=kw.get("clamp_mode",
                                                           "relu"),
                                         last_back=kw.get("last_back", False),
                                         white_back=kw.get("white_back",
                                                           False),
                                         black_back=kw.get("black_back",
                                                           False))
            comp = rf._fill_softmax_epilogue(
                res.comp, res.weights_sum, kw.get("fill_mode"),
                kw.get("fill_color", "black"),
                kw.get("softmax_label", False), kw.get("rgb_dim", 3))
            got_c, got_d, got_w = rf.ray_finalize(fo, co, fz, cz, nz,
                                                  interpret=True, **kw)
            np.testing.assert_allclose(np.asarray(got_c), np.asarray(comp),
                                       atol=2e-5)
            np.testing.assert_allclose(np.asarray(got_d),
                                       np.asarray(res.depth), atol=2e-5)
            np.testing.assert_allclose(np.asarray(got_w),
                                       np.asarray(res.weights_sum), atol=2e-5)

    def test_vjp_matches_xla_grads(self):
        """ray_finalize_vjp backward == grads of the XLA merge+fill graph."""
        fo, co, fz, cz, noise = _data(jax.random.key(9))
        kw = dict(fill_mode="seg_padding_background", clamp_mode="relu")

        def loss_kernel(fo, co):
            c, d, w = rf.ray_finalize_vjp(fo, co, fz, cz, noise,
                                          interpret=True, **kw)
            return (c ** 2).sum() + (d * 0.3).sum() + w.sum()

        def loss_xla(fo, co):
            res = integ.composite_merged(fo, co, fz, cz, noise=noise,
                                         noise_std=1.0, clamp_mode="relu")
            c = integ.apply_fill(res.comp, res.weights_sum,
                                 "seg_padding_background", "black")
            return (c ** 2).sum() + (res.depth * 0.3).sum() \
                + res.weights_sum.sum()

        gk = jax.grad(loss_kernel, argnums=(0, 1))(fo, co)
        gx = jax.grad(loss_xla, argnums=(0, 1))(fo, co)
        for a, b in zip(gk, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, rtol=1e-3)

    def test_vjp_no_noise_differentiable(self):
        """the inversion loop differentiates noise_std=0 renders."""
        fo, co, fz, cz, _ = _data(jax.random.key(4))

        def loss(fo):
            c, d, w = rf.ray_finalize_vjp(fo, co, fz, cz, None,
                                          interpret=True)
            return (c ** 2).sum()

        g = jax.grad(loss)(fo)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestEndToEndRender:
    def test_render_kernel_path_matches_xla(self, monkeypatch):
        """Full hierarchical render through the fused ray kernels (interpret)
        vs the XLA machinery — same field (XLA), same keys, so the only
        deltas are the kernels' f32 association order (amplified through the
        resampled fine positions)."""
        from fenerf_tpu.models import generator as gen
        from fenerf_tpu.nn import fields

        fcfg = fields.get_config("SIRENBASELINESEMANTICDISENTANGLE",
                                 hidden_dim=32, map_hidden_dim=32,
                                 z_geo_dim=8, z_app_dim=8)
        params = fields.init_field(jax.random.key(0), fcfg)
        zg = jax.random.normal(jax.random.key(1), (2, 8))
        za = jax.random.normal(jax.random.key(2), (2, 8))
        film_g, film_a = fields.field_film(params, fcfg, zg, za)
        rcfg = gen.RenderConfig(img_size=8, num_steps=6, hierarchical=True,
                                fill_mode="seg_padding_background",
                                h_stddev=0.0, v_stddev=0.0, sample_dist=None)
        key = jax.random.key(5)
        ref = gen.render(params, fcfg, rcfg, key, film_g, film_a,
                         batch_size=2, noise_std=0.0)

        # route the per-ray machinery through the kernels but keep the XLA
        # field path (backend must be pallas for the gate; patch apply_field
        # dispatch by forcing backend back to xla inside the field fn)
        monkeypatch.setattr(gen, "RAY_KERNELS", "always")
        orig_fn = gen._film_field_fn

        def xla_field(params, fcfg_, rcfg_, fg, fa):
            return orig_fn(params, fcfg_, rcfg_.replace(backend="xla"),
                           fg, fa)

        monkeypatch.setattr(gen, "_film_field_fn", xla_field)
        got = gen.render(params, fcfg, rcfg.replace(backend="pallas"), key,
                         film_g, film_a, batch_size=2, noise_std=0.0)
        np.testing.assert_allclose(np.asarray(got["pixels"]),
                                   np.asarray(ref["pixels"]), atol=5e-3)
        np.testing.assert_allclose(np.asarray(got["depth"]),
                                   np.asarray(ref["depth"]), atol=5e-3)

    def test_chunked_matches_unchunked_kernel_path(self, monkeypatch):
        """ray_chunk bit-exactness must survive the kernel path (noise drawn
        once, kernels row-independent). The kernel tile is pinned smaller
        than any block so both paths see identical block shapes — with
        unequal tiles XLA may reassociate in-kernel reductions (1-ulp
        diffs)."""
        from fenerf_tpu.models import generator as gen
        from fenerf_tpu.nn import fields

        monkeypatch.setattr(gen, "RAY_KERNELS", "always")
        monkeypatch.setattr(rf, "RESAMPLE_TILE", 8)
        monkeypatch.setattr(rf, "FINALIZE_TILE", 8)
        orig_fn = gen._film_field_fn
        monkeypatch.setattr(
            gen, "_film_field_fn",
            lambda p, f, r, fg, fa: orig_fn(p, f, r.replace(backend="xla"),
                                            fg, fa))
        fcfg = fields.get_config("SIRENBASELINESEMANTICDISENTANGLE",
                                 hidden_dim=32, map_hidden_dim=32,
                                 z_geo_dim=8, z_app_dim=8)
        params = fields.init_field(jax.random.key(0), fcfg)
        zg = jax.random.normal(jax.random.key(1), (1, 8))
        za = jax.random.normal(jax.random.key(2), (1, 8))
        film_g, film_a = fields.field_film(params, fcfg, zg, za)
        base = gen.RenderConfig(img_size=8, num_steps=6, hierarchical=True,
                                backend="pallas", h_stddev=0.0, v_stddev=0.0,
                                sample_dist=None)
        key = jax.random.key(5)
        whole = gen.render(params, fcfg, base, key, film_g, film_a,
                           batch_size=1, noise_std=0.7)
        chunked = gen.render(params, fcfg, base.replace(ray_chunk=16), key,
                             film_g, film_a, batch_size=1, noise_std=0.7)
        # randomness is exact by construction (RayNoise drawn once, sliced
        # per block); like test_generator.py::test_ray_chunking_is_exact,
        # CPU-gemm tile-shape rounding in the FIELD eval leaves last-ulp
        # diffs (observed 9.5e-7) — the ray kernels themselves are
        # row-independent
        np.testing.assert_allclose(np.asarray(whole["pixels"]),
                                   np.asarray(chunked["pixels"]), atol=1e-4)
