"""Golden + property tests for compositing and importance sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenerf_tpu.core import integrate as integ


def _hand_integrate(sigmas, z, channels, clamp="relu"):
    """Independent numpy re-derivation of NeRF compositing."""
    s = np.asarray(sigmas, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    deltas = np.concatenate([np.diff(z), [1e10]])
    act = np.maximum(s, 0) if clamp == "relu" else np.log1p(np.exp(s))
    alphas = 1 - np.exp(-deltas * act)
    trans = np.cumprod(np.concatenate([[1.0], 1 - alphas + 1e-10]))[:-1]
    w = alphas * trans
    return (w[:, None] * np.asarray(channels)).sum(0), (w * z).sum(), w


class TestIntegrate:
    def test_golden_single_ray(self):
        z = jnp.array([[[1.0, 1.5, 2.0, 2.5]]])
        sig = jnp.array([0.5, 2.0, -1.0, 3.0])
        ch = jnp.array([[0.1, 0.9], [0.4, 0.2], [0.8, 0.8], [0.3, 0.5]])
        rgb_sigma = jnp.concatenate([ch, sig[:, None]], -1)[None, None]
        out = integ.integrate(rgb_sigma, z, key=None, clamp_mode="relu")
        comp_ref, depth_ref, w_ref = _hand_integrate(sig, z[0, 0], ch)
        np.testing.assert_allclose(out.comp[0, 0], comp_ref, rtol=1e-5)
        np.testing.assert_allclose(out.depth[0, 0], depth_ref, rtol=1e-5)
        np.testing.assert_allclose(out.weights[0, 0], w_ref, rtol=1e-5)

    def test_softplus_clamp(self):
        z = jnp.array([[[1.0, 2.0, 3.0]]])
        sig = jnp.array([-0.5, 0.0, 0.5])
        ch = jnp.ones((3, 1)) * 0.7
        rgb_sigma = jnp.concatenate([ch, sig[:, None]], -1)[None, None]
        out = integ.integrate(rgb_sigma, z, key=None, clamp_mode="softplus")
        comp_ref, _, _ = _hand_integrate(sig, z[0, 0], ch, clamp="softplus")
        np.testing.assert_allclose(out.comp[0, 0], comp_ref, rtol=1e-5)

    def test_weights_sum_le_one(self):
        key = jax.random.key(0)
        rgb_sigma = jax.random.normal(key, (2, 16, 12, 5))
        z = jnp.sort(jax.random.uniform(key, (2, 16, 12)) + 0.9, axis=-1)
        out = integ.integrate(rgb_sigma, z, key=None)
        assert float(out.weights_sum.max()) <= 1.0 + 1e-5
        assert float(out.weights.min()) >= 0.0

    def test_opaque_first_sample_dominates(self):
        z = jnp.array([[[1.0, 1.5, 2.0]]])
        sig = jnp.array([[[ [1e5], [1e5], [1e5] ]]])
        ch = jnp.array([[[[1.0], [0.0], [0.0]]]])
        out = integ.integrate(jnp.concatenate([ch, sig], -1), z, key=None)
        np.testing.assert_allclose(out.comp[0, 0, 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(out.depth[0, 0], 1.0, atol=1e-4)

    def test_last_back_closes_weights(self):
        z = jnp.array([[[1.0, 1.5, 2.0]]])
        rgb_sigma = jnp.zeros((1, 1, 3, 4)).at[..., -1].set(0.1)
        out = integ.integrate(rgb_sigma, z, key=None, last_back=True)
        np.testing.assert_allclose(out.weights[0, 0].sum(), 1.0, atol=1e-5)

    def test_white_black_back(self):
        z = jnp.array([[[1.0, 2.0]]])
        rgb_sigma = jnp.zeros((1, 1, 2, 4))  # sigma 0 -> fully transparent
        out_w = integ.integrate(rgb_sigma, z, key=None, white_back=True)
        np.testing.assert_allclose(out_w.comp[0, 0], 1.0, atol=1e-6)
        out_b = integ.integrate(rgb_sigma, z, key=None, black_back=True)
        np.testing.assert_allclose(out_b.comp[0, 0], -1.0, atol=1e-6)

    def test_noise_std_zero_matches_no_key(self):
        key = jax.random.key(7)
        rgb_sigma = jax.random.normal(key, (1, 8, 6, 4))
        z = jnp.broadcast_to(jnp.linspace(0.9, 1.1, 6), (1, 8, 6))
        a = integ.integrate(rgb_sigma, z, key=jax.random.key(1), noise_std=0.0)
        b = integ.integrate(rgb_sigma, z, key=None)
        np.testing.assert_allclose(a.comp, b.comp, atol=1e-6)


class TestFill:
    def test_seg_padding_background_black(self):
        comp = jnp.ones((1, 2, 21)) * 0.3
        wsum = jnp.array([[0.95, 0.5]])
        out = integ.apply_fill(comp, wsum, "seg_padding_background", "black")
        assert out.shape == (1, 2, 22)
        # opaque pixel: zero bg channel prepended, rest untouched
        np.testing.assert_allclose(out[0, 0, 0], 0.0)
        np.testing.assert_allclose(out[0, 0, 1:], 0.3)
        # transparent pixel painted [1, 0...0]
        np.testing.assert_allclose(out[0, 1, 0], 1.0)
        np.testing.assert_allclose(out[0, 1, 1:], 0.0)

    def test_fill_colors(self):
        comp = jnp.zeros((1, 1, 21))
        wsum = jnp.array([[0.1]])
        for color, val in [("white", 1.0), ("grey", 0.5), ("light_grey", 0.81)]:
            out = integ.apply_fill(comp, wsum, "eval_seg_padding_background", color)
            np.testing.assert_allclose(out[0, 0, 1:], val)

    def test_eval_white_back(self):
        comp = jnp.zeros((1, 2, 3)).at[0, 0].set(0.4)
        wsum = jnp.array([[0.95, 0.2]])
        out = integ.apply_fill(comp, wsum, "eval_white_back")
        np.testing.assert_allclose(out[0, 0], 0.4)
        np.testing.assert_allclose(out[0, 1], 1.0)

    def test_none_passthrough(self):
        comp = jnp.ones((1, 1, 4))
        out = integ.apply_fill(comp, jnp.array([[0.1]]), None)
        np.testing.assert_allclose(out, comp)


class TestSamplePdf:
    def test_deterministic_uniform_weights(self):
        bins = jnp.linspace(0.0, 1.0, 11)[None]  # 11 bins
        weights = jnp.ones((1, 10))
        samples = integ.sample_pdf(None, bins, weights, 5, det=True)
        # uniform pdf -> inverse cdf is identity: u=[0,.25,.5,.75,1]
        np.testing.assert_allclose(samples[0], [0.0, 0.25, 0.5, 0.75, 1.0], atol=1e-5)

    def test_concentrated_weight(self):
        bins = jnp.linspace(0.0, 1.0, 6)[None]
        weights = jnp.array([[0.0, 0.0, 1000.0, 0.0, 0.0]])
        samples = integ.sample_pdf(jax.random.key(0), bins, weights, 64, det=False)
        # nearly all mass in bin [0.4, 0.6]
        frac_in = float(((samples > 0.39) & (samples < 0.61)).mean())
        assert frac_in > 0.98

    def test_samples_within_range_and_sorted_cdf(self):
        key = jax.random.key(3)
        bins = jnp.sort(jax.random.uniform(key, (32, 23)), axis=-1)
        weights = jax.random.uniform(jax.random.fold_in(key, 1), (32, 22))
        samples = integ.sample_pdf(jax.random.key(9), bins, weights, 24)
        assert float(samples.min()) >= float(bins.min()) - 1e-6
        assert float(samples.max()) <= float(bins.max()) + 1e-6

    def test_matches_torch_searchsorted_semantics(self):
        """Cross-check index math against torch's sample_pdf on random input."""
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        bins_np = np.sort(rng.rand(8, 11), axis=-1).astype(np.float32)
        w_np = rng.rand(8, 10).astype(np.float32)
        u_np = rng.rand(8, 7).astype(np.float32)

        # independent torch re-derivation (same math as reference :259-300)
        tb, tw = torch.tensor(bins_np), torch.tensor(w_np) + 1e-5
        pdf = tw / tw.sum(-1, keepdim=True)
        cdf = torch.cat([torch.zeros_like(pdf[:, :1]), torch.cumsum(pdf, -1)], -1)
        tu = torch.tensor(u_np)
        inds = torch.searchsorted(cdf, tu)
        below = (inds - 1).clamp_min(0)
        above = inds.clamp_max(10)
        cdf_g = torch.gather(cdf, 1, below), torch.gather(cdf, 1, above)
        bins_g = torch.gather(tb, 1, below), torch.gather(tb, 1, above)
        denom = cdf_g[1] - cdf_g[0]
        denom[denom < 1e-5] = 1
        expected = bins_g[0] + (tu - cdf_g[0]) / denom * (bins_g[1] - bins_g[0])

        # our sampler with the same u injected via det-like monkeypatch:
        # replicate by calling internals — easiest is to recompute with fixed u
        w = jnp.asarray(w_np) + 1e-5
        pdf_j = w / w.sum(-1, keepdims=True)
        cdf_j = jnp.concatenate(
            [jnp.zeros_like(pdf_j[:, :1]), jnp.cumsum(pdf_j, -1)], -1
        )
        u = jnp.asarray(u_np)
        inds_j = jnp.sum((cdf_j[..., None, :] < u[..., :, None]).astype(np.int32), -1)
        np.testing.assert_array_equal(np.asarray(inds_j), inds.numpy())


class TestMergeSorted:
    def test_sorted_and_paired(self):
        key = jax.random.key(0)
        cz = jnp.sort(jax.random.uniform(key, (2, 4, 6)), -1)
        fz = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1), (2, 4, 6)), -1)
        # channels encode their z so we can verify pairing survives the sort
        cout = cz[..., None] * jnp.ones((1, 1, 1, 3))
        fout = fz[..., None] * jnp.ones((1, 1, 1, 3))
        out, z = integ.merge_sorted(fout, cout, fz, cz)
        assert out.shape == (2, 4, 12, 3)
        assert bool(jnp.all(jnp.diff(z, axis=-1) >= 0))
        np.testing.assert_allclose(out, z[..., None] * jnp.ones(3), atol=1e-6)

    def test_sample_pdf_degenerate_one_bin(self):
        """S=2 rays (the smoke curriculum): 1 bin, ZERO weights — every
        importance sample must resolve to the single bin midpoint."""
        bins = jnp.full((2, 3, 1), 0.9)
        weights = jnp.zeros((2, 3, 0))
        u = jax.random.uniform(jax.random.key(0), (2, 3, 4))
        out = integ.sample_pdf(None, bins, weights, 4, u=u)
        np.testing.assert_allclose(np.asarray(out), 0.9, rtol=1e-6)

    def test_integrate_weights_matches_full(self):
        """The proposal-pass fast path must equal integrate(...).weights."""
        key = jax.random.key(3)
        rs = jax.random.normal(key, (2, 6, 10, 5))
        z = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1),
                                        (2, 6, 10)), -1)
        noise = jax.random.normal(jax.random.fold_in(key, 2), (2, 6, 10))
        for clamp in ("relu", "softplus"):
            full = integ.integrate(rs, z, key=None, noise=noise,
                                   noise_std=0.7, clamp_mode=clamp)
            wonly = integ.integrate_weights(rs[..., -1], z, noise=noise,
                                            noise_std=0.7, clamp_mode=clamp)
            np.testing.assert_array_equal(np.asarray(wonly),
                                          np.asarray(full.weights))

    def test_composite_merged_matches_merge_then_integrate(self):
        """The no-channel-permute compositing must equal
        integrate(*merge_sorted(...)) up to f32 summation order."""
        key = jax.random.key(11)
        cz = jnp.sort(jax.random.uniform(key, (2, 5, 8)), -1)
        fz = jax.random.uniform(jax.random.fold_in(key, 1), (2, 5, 8))
        fo = jax.random.normal(jax.random.fold_in(key, 2), (2, 5, 8, 6))
        co = jax.random.normal(jax.random.fold_in(key, 3), (2, 5, 8, 6))
        noise = jax.random.normal(jax.random.fold_in(key, 4), (2, 5, 16))
        for kw in (dict(), dict(last_back=True), dict(white_back=True),
                   dict(clamp_mode="softplus")):
            o, z = integ.merge_sorted(fo, co, fz, cz)
            ref = integ.integrate(o, z, key=None, noise=noise,
                                  noise_std=0.3, **kw)
            got = integ.composite_merged(fo, co, fz, cz, noise=noise,
                                         noise_std=0.3, **kw)
            np.testing.assert_allclose(np.asarray(got.comp),
                                       np.asarray(ref.comp), atol=1e-5)
            np.testing.assert_allclose(np.asarray(got.depth),
                                       np.asarray(ref.depth), atol=1e-5)
            np.testing.assert_allclose(np.asarray(got.weights_sum),
                                       np.asarray(ref.weights_sum),
                                       atol=1e-5)

    def test_composite_merged_nosort_matches_onehot(self):
        """The order-independent (no-permutation) compositing must match
        composite_merged — including ties, noise-by-sorted-position, and
        every back/clamp mode — up to f32 association order, and the
        returned weights must be in the same concat order."""
        key = jax.random.key(21)
        for trial in range(6):
            kk = jax.random.fold_in(key, trial)
            cz = jnp.sort(
                jax.random.uniform(jax.random.fold_in(kk, 0), (2, 5, 8)), -1)
            fz = jax.random.uniform(jax.random.fold_in(kk, 1), (2, 5, 8))
            if trial % 2 == 0:  # ties: cross-list, within-fine, within-coarse
                fz = fz.at[..., 2].set(cz[..., 5])
                fz = fz.at[..., 4].set(fz[..., 6])
                cz = cz.at[..., 1].set(cz[..., 2])
            fo = jax.random.normal(jax.random.fold_in(kk, 2), (2, 5, 8, 6))
            co = jax.random.normal(jax.random.fold_in(kk, 3), (2, 5, 8, 6))
            noise = jax.random.normal(jax.random.fold_in(kk, 4), (2, 5, 16))
            for kw in (dict(), dict(last_back=True), dict(white_back=True),
                       dict(black_back=True), dict(clamp_mode="softplus"),
                       dict(noise=None)):
                nz = kw.pop("noise", noise)
                ref = integ.composite_merged(fo, co, fz, cz, noise=nz,
                                             noise_std=0.3, **kw)
                got = integ.composite_merged_nosort(fo, co, fz, cz, noise=nz,
                                                    noise_std=0.3, **kw)
                for field in ("comp", "depth", "weights", "weights_sum"):
                    np.testing.assert_allclose(
                        np.asarray(getattr(got, field)),
                        np.asarray(getattr(ref, field)), atol=2e-5,
                        err_msg=f"{field} {kw}")

    def test_sample_pdf_pick_impls_identical(self):
        """'reduce' picks must be bit-identical to the one-hot einsum picks
        (both select exact elements)."""
        key = jax.random.key(5)
        bins = jnp.sort(jax.random.uniform(key, (3, 7, 11)), -1)
        w = jax.random.uniform(jax.random.fold_in(key, 1), (3, 7, 10))
        u = jax.random.uniform(jax.random.fold_in(key, 2), (3, 7, 9))
        old = integ.PICK_IMPL
        try:
            integ.PICK_IMPL = "onehot"
            a = integ.sample_pdf(None, bins, w, 9, u=u)
            integ.PICK_IMPL = "reduce"
            b = integ.sample_pdf(None, bins, w, 9, u=u)
        finally:
            integ.PICK_IMPL = old
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_merge_fine_coarse_matches_general(self):
        """The rank-based fast path (coarse sorted, fine arbitrary — the
        render pipeline's shapes) must be bit-identical to the general
        stable-sort merge, including tie resolution within and across
        lists."""
        key = jax.random.key(7)
        for trial in range(12):
            kk = jax.random.fold_in(key, trial)
            cz = jnp.sort(
                jax.random.uniform(jax.random.fold_in(kk, 0), (2, 3, 8)), -1)
            fz = jax.random.uniform(jax.random.fold_in(kk, 1), (2, 3, 8))
            if trial % 3 == 0:  # ties: cross-list, within-fine, within-coarse
                fz = fz.at[..., 2].set(cz[..., 5])
                fz = fz.at[..., 4].set(fz[..., 6])
                cz = cz.at[..., 1].set(cz[..., 2])
            fo = jax.random.normal(jax.random.fold_in(kk, 2), (2, 3, 8, 5))
            co = jax.random.normal(jax.random.fold_in(kk, 3), (2, 3, 8, 5))
            o_ref, z_ref = integ.merge_sorted(fo, co, fz, cz)
            o_fast, z_fast = integ.merge_fine_coarse(fo, co, fz, cz)
            np.testing.assert_array_equal(np.asarray(z_fast),
                                          np.asarray(z_ref))
            np.testing.assert_array_equal(np.asarray(o_fast),
                                          np.asarray(o_ref))
