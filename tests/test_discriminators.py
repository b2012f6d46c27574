"""Discriminator parity (vs reference CCS*Discriminator) + property tests."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from fenerf_tpu.compat.torch_import import discriminator_from_torch
from fenerf_tpu.nn import discriminators as disc

from reference_shim import import_reference_discriminators

ref_d = import_reference_discriminators()


def _parity(img_size, alpha, input_dim=3, seed=0):
    torch.manual_seed(seed)
    tm = ref_d.CCSDoubleEncoderDiscriminator(
        latent_geo_dim=16, latent_app_dim=16, input_dim=input_dim
    )
    tm.eval()
    cfg = disc.DiscriminatorConfig(
        input_dim=input_dim, latent_geo_dim=16, latent_app_dim=16
    )
    params = discriminator_from_torch(tm.state_dict())
    rng = np.random.RandomState(1)
    x = rng.randn(2, input_dim, img_size, img_size).astype(np.float32)
    with torch.no_grad():
        r_score, r_geo, r_app, r_pos = tm(torch.tensor(x), alpha)
    score, geo, app, pos = disc.apply_discriminator(
        params, cfg, jnp.asarray(x), alpha
    )
    np.testing.assert_allclose(np.asarray(score), r_score.numpy(), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(geo), r_geo.numpy(), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(app), r_app.numpy(), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pos), r_pos.numpy(), atol=2e-4,
                               rtol=1e-3)


class TestDiscriminatorParity:
    def test_32px_full_alpha(self):
        _parity(32, 1.0)

    def test_64px_fadein(self):
        _parity(64, 0.3)

    def test_128px(self):
        _parity(128, 1.0)

    def test_seg_input_21ch(self):
        _parity(32, 0.7, input_dim=21)

    def test_single_encoder(self):
        torch.manual_seed(0)
        tm = ref_d.CCSEncoderDiscriminator(latent_dim=16, input_dim=3)
        tm.eval()
        cfg = disc.DiscriminatorConfig(latent_geo_dim=16, latent_app_dim=0)
        params = discriminator_from_torch(tm.state_dict())
        x = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            r_score, r_lat, r_pos = tm(torch.tensor(x), 1.0)
        score, geo, app, pos = disc.apply_discriminator(
            params, cfg, jnp.asarray(x), 1.0
        )
        np.testing.assert_allclose(np.asarray(score), r_score.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(geo), r_lat.numpy(), atol=2e-4,
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(pos), r_pos.numpy(), atol=2e-4,
                                   rtol=1e-3)
        assert app is None


class TestDiscriminatorProperties:
    def test_output_shapes(self):
        cfg = disc.DiscriminatorConfig(latent_geo_dim=256, latent_app_dim=256)
        params = disc.init_discriminator(jax.random.key(0), cfg)
        x = jnp.zeros((4, 3, 64, 64))
        s, g, a, p = disc.apply_discriminator(params, cfg, x, 0.5)
        assert s.shape == (4, 1)
        assert g.shape == (4, 256)
        assert a.shape == (4, 256)
        assert p.shape == (4, 2)

    def test_alpha_one_equals_no_blend(self):
        cfg = disc.DiscriminatorConfig(latent_geo_dim=8, latent_app_dim=8)
        params = disc.init_discriminator(jax.random.key(1), cfg)
        x = jax.random.normal(jax.random.key(2), (2, 3, 32, 32))
        s1, *_ = disc.apply_discriminator(params, cfg, x, 1.0)
        s2, *_ = disc.apply_discriminator(params, cfg, x, jnp.asarray(1.0))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)

    def test_grad_wrt_input(self):
        """R1 penalty needs d(score)/d(image) — core trainer requirement."""
        cfg = disc.DiscriminatorConfig(latent_geo_dim=8, latent_app_dim=8)
        params = disc.init_discriminator(jax.random.key(1), cfg)
        x = jax.random.normal(jax.random.key(2), (2, 3, 32, 32))

        def f(img):
            s, *_ = disc.apply_discriminator(params, cfg, img, 1.0)
            return s.sum()

        g = jax.grad(f)(x)
        assert g.shape == x.shape
        assert float(jnp.abs(g).sum()) > 0


class TestStridedDiscriminator:
    def test_parity_vs_reference(self):
        torch.manual_seed(2)
        tm = ref_d.StridedDiscriminator()
        tm.eval()
        cfg = disc.DiscriminatorConfig(latent_geo_dim=0, latent_app_dim=0,
                                       coord_conv=False)
        from fenerf_tpu.compat.torch_import import discriminator_from_torch
        params = discriminator_from_torch(tm.state_dict())
        x = np.random.RandomState(5).randn(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref_score, _, _ = tm(torch.tensor(x), 1.0)
        score, g, a, p = disc.apply_discriminator(params, cfg,
                                                  jnp.asarray(x), 1.0)
        assert g is None and a is None and p is None
        np.testing.assert_allclose(np.asarray(score), ref_score.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestPatchDiscriminators:
    def test_nlayer_parity(self):
        torch.manual_seed(3)
        tm = ref_d.NLayerDiscriminator(input_nc=7, ndf=16, n_layers=3,
                                       getIntermFeat=True)
        tm.eval()
        # convert: model{i}.0 is the conv (possibly wrapped in a Sequential
        # with a norm); spectral_norm stores weight_orig + weight_u
        sd = tm.state_dict()
        from fenerf_tpu.nn.discriminators import (apply_nlayer_discriminator,
                                                  init_nlayer_discriminator)
        params = init_nlayer_discriminator(jax.random.key(0), input_nc=7,
                                           ndf=16, n_layers=3)
        def conv_from(prefix):
            if f"{prefix}.weight_orig" in sd:
                w = sd[f"{prefix}.weight_orig"].numpy()
                u = sd[f"{prefix}.weight_u"].numpy()
                v = sd[f"{prefix}.weight_v"].numpy()
            else:
                w = sd[f"{prefix}.weight"].numpy()
                u = v = None
            b = sd.get(f"{prefix}.bias")
            b = b.numpy() if b is not None else np.zeros(w.shape[3] if False else w.shape[0], np.float32)
            return w.transpose(2, 3, 1, 0), b, u, v
        prefixes = ["model0.0", "model1.0.0", "model2.0.0", "model3.0.0",
                    "model4.0"]
        for lyr, pre in zip(params["layers"], prefixes):
            w, b, u, v = conv_from(pre)
            lyr["conv"]["w"] = jnp.asarray(w)
            lyr["conv"]["b"] = jnp.asarray(b)
            if u is not None:
                assert lyr["sn"], pre
                lyr["u"] = jnp.asarray(u)
                lyr["v"] = jnp.asarray(v)  # eval-mode sigma from stored u, v
        x = np.random.RandomState(6).randn(1, 7, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref_feats = tm(torch.tensor(x))
        ours = apply_nlayer_discriminator(params, jnp.asarray(x),
                                          get_interm=True)
        assert len(ours) == len(ref_feats)
        for a, b in zip(ours, ref_feats):
            np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=5e-3,
                                       rtol=1e-2)

    def test_spectral_norm_u_persists_and_converges(self):
        """Threading return_state across calls runs a true power iteration:
        the sigma estimate converges to the top singular value (the round-1
        version re-ran one iteration from init every call and never
        improved)."""
        from fenerf_tpu.nn.discriminators import (_spectral_normalize,
                                                  apply_nlayer_discriminator,
                                                  init_nlayer_discriminator)
        params = init_nlayer_discriminator(jax.random.key(2), input_nc=4,
                                           ndf=8, n_layers=3)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 4, 32, 32).astype(np.float32))
        # run 30 state-threaded forwards
        p = params
        for _ in range(30):
            _, p = apply_nlayer_discriminator(p, x, return_state=True)
        # u must have moved from init
        lyr0 = next(l for l in params["layers"] if l["sn"])
        lyrN = next(l for l in p["layers"] if l["sn"])
        assert not np.allclose(np.asarray(lyr0["u"]), np.asarray(lyrN["u"]))
        # converged sigma == exact top singular value of the flattened kernel
        w = np.asarray(lyrN["conv"]["w"])
        mat = w.transpose(3, 2, 0, 1).reshape(w.shape[-1], -1)
        true_sigma = np.linalg.svd(mat, compute_uv=False)[0]
        w_norm, _ = _spectral_normalize(jnp.asarray(w), lyrN["u"])
        est_sigma = float(
            (mat ** 2).sum() ** 0.5 / (np.asarray(w_norm) ** 2).sum() ** 0.5)
        np.testing.assert_allclose(est_sigma, true_sigma, rtol=1e-3)

    def test_multiscale_shapes(self):
        from fenerf_tpu.nn.discriminators import (
            apply_multiscale_discriminator, init_multiscale_discriminator)
        params = init_multiscale_discriminator(jax.random.key(1), input_nc=4,
                                               ndf=8, num_d=2)
        x = jnp.zeros((1, 4, 64, 64))
        outs = apply_multiscale_discriminator(params, x)
        assert len(outs) == 2
        assert len(outs[0]) == 5  # n_layers + 2 feature maps
