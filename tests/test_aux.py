"""Tests for aux components: losses, diff_augment, KID/IS, mask tools,
latent-grid render path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fenerf_tpu.eval.metrics import inception_score, kid, mmd2_unbiased, \
    polynomial_kernel
from fenerf_tpu.train import diff_augment as da
from fenerf_tpu.train import losses as L
from fenerf_tpu.utils import mask_tools as mt


class TestGanLosses:
    def test_hinge_discriminator(self):
        pred = jnp.asarray([2.0, -0.5])
        # real: mean(relu(1 - pred)) = mean([0, 1.5])
        np.testing.assert_allclose(
            float(L.gan_loss(pred, True, "hinge", True)), 0.75)
        # fake: mean(relu(1 + pred)) = mean([3, 0.5])
        np.testing.assert_allclose(
            float(L.gan_loss(pred, False, "hinge", True)), 1.75)

    def test_hinge_generator(self):
        pred = jnp.asarray([2.0, -0.5])
        np.testing.assert_allclose(
            float(L.gan_loss(pred, True, "hinge", False)), -0.75)

    def test_ls(self):
        pred = jnp.asarray([0.5])
        np.testing.assert_allclose(float(L.gan_loss(pred, True, "ls")), 0.25)

    def test_original_matches_bce(self):
        torch = pytest.importorskip("torch")
        pred = np.random.RandomState(0).randn(8).astype(np.float32)
        ref = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(pred), torch.ones(8)).item()
        np.testing.assert_allclose(
            float(L.gan_loss(jnp.asarray(pred), True, "original")), ref,
            rtol=1e-5)

    def test_focal_dice_logcosh_finite(self):
        logits = jnp.asarray(np.random.RandomState(1).randn(2, 3, 4, 4))
        target = (jax.random.uniform(jax.random.key(0), (2, 3, 4, 4)) > 0.5)
        target = target.astype(jnp.float32)
        for fn in (L.focal_loss, L.dice_loss, L.soft_bce_loss, L.log_cosh_loss):
            v = float(fn(logits, target))
            assert np.isfinite(v) and v >= 0

    def test_noise_regularize(self):
        noises = [jax.random.normal(jax.random.key(0), (1, 1, 16, 16))]
        v = float(L.noise_regularize(noises))
        assert np.isfinite(v) and v >= 0


class TestDiffAugment:
    def test_shapes_and_grads(self):
        x = jax.random.normal(jax.random.key(0), (2, 3, 16, 16))
        y = da.diff_augment(jax.random.key(1), x)
        assert y.shape == x.shape
        g = jax.grad(lambda x: da.diff_augment(jax.random.key(1), x).sum())(x)
        assert float(jnp.abs(g).sum()) > 0

    def test_cutout_zeroes_region(self):
        x = jnp.ones((1, 3, 32, 32))
        y = da.diff_augment(jax.random.key(2), x, policy="cutout")
        assert float(y.min()) == 0.0
        assert float(y.max()) == 1.0

    def test_empty_policy_identity(self):
        x = jnp.ones((1, 3, 8, 8))
        np.testing.assert_allclose(da.diff_augment(jax.random.key(0), x, ""),
                                   x)


class TestKidIs:
    def test_kid_same_distribution_near_zero(self):
        # unbiased MMD expects INDEPENDENT draws; literally identical sets
        # bias the cross term through the kernel diagonal
        rng = np.random.RandomState(0)
        a, b = rng.randn(600, 16), rng.randn(600, 16)
        mean, std = kid(a, b, n_subsets=10, subset_size=200)
        assert abs(mean) < 0.05

    def test_kid_separates(self):
        rng = np.random.RandomState(0)
        a = rng.randn(400, 16)
        b = rng.randn(400, 16) + 2.0
        near, _ = kid(a, rng.randn(400, 16), n_subsets=10, subset_size=100)
        far, _ = kid(a, b, n_subsets=10, subset_size=100)
        assert far > near + 1.0

    def test_mmd_small_for_same_distribution(self):
        rng = np.random.RandomState(1)
        x, y = rng.randn(500, 4), rng.randn(500, 4)
        v = mmd2_unbiased(polynomial_kernel(x, x), polynomial_kernel(y, y),
                          polynomial_kernel(x, y))
        assert abs(v) < 0.2
        # and the kernel itself is symmetric positive on the diagonal
        k = polynomial_kernel(x, x)
        np.testing.assert_allclose(k, k.T, rtol=1e-6)

    def test_inception_score_bounds(self):
        rng = np.random.RandomState(2)
        # uniform logits -> IS ~ 1
        flat, _ = inception_score(np.zeros((100, 10)))
        assert abs(flat - 1.0) < 1e-5
        # one-hot confident + diverse -> IS ~ n_classes
        logits = np.eye(10)[rng.randint(0, 10, 1000)] * 50
        sharp, _ = inception_score(logits)
        assert sharp > 8.0


class TestMaskTools:
    def test_remove_switch(self):
        m = np.array([[13, 13], [1, 0]], np.uint8)
        out = mt.remove_semantic(m, 13)
        assert (out == 13).sum() == 0 and (out == 1).sum() == 3
        sw = mt.switch_semantic(m, 13, 1)
        assert (sw == 13).sum() == 1 and (sw == 1).sum() == 2

    def test_transfer_semantic(self):
        """Reference tools.py switch_semantic :499-548: erase-then-paste a
        class region from another mask with a spatial offset; hair stays
        on top."""
        tar = np.ones((8, 8), np.uint8)          # all skin
        tar[0:2, :] = 13                         # hair band on top rows
        tar[5, 5] = 6                            # target's own l_brow
        ref = np.ones((8, 8), np.uint8)
        ref[2, 2] = 6                            # reference l_brow at (2,2)
        out = mt.transfer_semantic(tar, ref, labels=(6,), offset_xy=(1, 3))
        assert out[5, 5] == 1                    # target's brow erased
        assert out[3, 5] == 6                    # pasted at (2+1, 2+3)
        assert (out[0:2] == 13).all()            # hair untouched
        # paste landing under hair is occluded by hair (keep_on_top)
        out2 = mt.transfer_semantic(tar, ref, labels=(6,), offset_xy=(-1, 0))
        assert out2[1, 2] == 13
        # border clipping: offsets beyond the mask clamp to the last cell
        out3 = mt.transfer_semantic(tar, ref, labels=(6,), offset_xy=(99, 99))
        assert out3[7, 7] == 6

    def test_add_semantic(self):
        m = np.zeros((4, 4), np.uint8)
        region = np.zeros((4, 4), bool)
        region[:2] = True
        out = mt.add_semantic(m, 10, region)
        assert (out == 10).sum() == 8

    def test_scale_semantic_grow_shrink(self):
        m = np.ones((16, 16), np.uint8)
        m[6:10, 6:10] = 13
        grown = mt.scale_semantic(m, 13, 1.5)
        assert (grown == 13).sum() > 16
        shrunk = mt.scale_semantic(m, 13, 0.5)
        assert (shrunk == 13).sum() < 16

    def test_simplify(self):
        m = np.array([3, 14, 15, 16, 18, 1], np.uint8)
        out = mt.simplify_mask(m)
        assert set(np.unique(out)) <= {1, 13, 17}

    def test_colorize_roundtrip(self):
        m = np.arange(19, dtype=np.uint8).reshape(1, 19)
        rgb = mt.colorize(m)
        back = mt.color_to_mask(rgb)
        np.testing.assert_array_equal(back, m)


class TestLatentGridRender:
    def test_render_grid_from_z(self):
        from fenerf_tpu.models import generator as gen
        from fenerf_tpu.nn import latent_grid_field as lgf

        cfg = lgf.GridFieldConfig(z_dim=8, hidden_dim=16, ch_max=16)
        params = lgf.init_grid_field(jax.random.key(0), cfg)
        rcfg = gen.RenderConfig(img_size=8, num_steps=4, hierarchical=True)
        out = gen.render_grid_from_z(params, cfg, rcfg, jax.random.key(1),
                                     jnp.ones((2, 8)), noise_std=0.5)
        assert out["pixels"].shape == (2, 3, 8, 8)
        assert bool(jnp.all(jnp.isfinite(out["pixels"])))


class TestEditMaskCli:
    def test_ops_pipeline(self, tmp_path):
        import numpy as np
        from PIL import Image
        from fenerf_tpu.apps.edit_mask import main

        m = np.zeros((32, 32), np.uint8)
        m[4:12, 4:12] = 14   # hat
        m[20:28, 4:12] = 4   # left_eye
        m[20:28, 20:28] = 5  # right_eye
        src = str(tmp_path / "m.png")
        dst = str(tmp_path / "out.png")
        Image.fromarray(m, mode="L").save(src)
        main([src, dst, "--op", "remove:hat:hair",
              "--op", "switch:left_eye:right_eye",
              "--op", "rect:mouth:0:0:4:4", "--colorize"])
        out = np.asarray(Image.open(dst))
        assert (out == 14).sum() == 0
        assert (out == 13).sum() == 64       # hat -> hair
        assert out[22, 6] == 5 and out[22, 22] == 4  # eyes swapped
        assert (out[:4, :4] == 10).all()     # rect mouth
        import os
        assert os.path.exists(str(tmp_path / "out_color.png"))


class TestRematRender:
    def test_remat_matches_and_grads(self):
        import jax
        import jax.numpy as jnp
        from fenerf_tpu.models import generator as gen
        from fenerf_tpu.nn import fields

        cfg = fields.get_config("SIRENBASELINESEMANTICDISENTANGLE",
                                hidden_dim=16, map_hidden_dim=16,
                                z_geo_dim=8, z_app_dim=8)
        params = fields.init_field(jax.random.key(0), cfg)
        zg, za = jnp.ones((1, 8)) * 0.2, jnp.ones((1, 8)) * -0.1
        r0 = gen.RenderConfig(img_size=8, num_steps=4, ray_chunk=16)
        r1 = r0.replace(remat=True)
        a = gen.render_from_z(params, cfg, r0, jax.random.key(1), zg, za)
        b = gen.render_from_z(params, cfg, r1, jax.random.key(1), zg, za)
        np.testing.assert_allclose(np.asarray(a["pixels"]),
                                   np.asarray(b["pixels"]), atol=1e-6)
        g = jax.grad(lambda p: gen.render_from_z(
            p, cfg, r1, jax.random.key(1), zg, za)["pixels"].sum())(params)
        assert all(bool(jnp.all(jnp.isfinite(x)))
                   for x in jax.tree_util.tree_leaves(g))


class TestFastMath:
    def test_fast_sin_accuracy(self):
        from fenerf_tpu.ops.fast_math import fast_sin
        x = jnp.linspace(-200.0, 200.0, 200001)
        err = jnp.abs(fast_sin(x) - jnp.sin(x))
        assert float(err.max()) < 5e-5

    def test_fast_sin_gradient(self):
        from fenerf_tpu.ops.fast_math import fast_sin
        x = jnp.linspace(-10.0, 10.0, 1001)
        g = jax.vmap(jax.grad(fast_sin))(x)
        np.testing.assert_allclose(np.asarray(g), np.cos(np.asarray(x)),
                                   atol=5e-5)


class TestImageMetrics:
    def test_psnr_identity_and_noise(self):
        from fenerf_tpu.eval.metrics import psnr
        a = np.random.RandomState(0).rand(3, 32, 32) * 2 - 1
        assert psnr(a, a) == float("inf")
        noisy = a + 0.1
        assert 20 < psnr(a, noisy) < 30

    def test_ssim_bounds(self):
        from fenerf_tpu.eval.metrics import ssim
        a = np.random.RandomState(1).rand(3, 32, 32) * 2 - 1
        assert abs(ssim(a, a) - 1.0) < 1e-9
        b = np.random.RandomState(2).rand(3, 32, 32) * 2 - 1
        assert ssim(a, b) < 0.3


class TestLpipsArch:
    def test_vgg_lpips_shapes_random_weights(self):
        import jax
        import jax.numpy as jnp
        from fenerf_tpu.eval import lpips as L

        # build random weights with the documented layout
        key = jax.random.key(0)
        params = {}
        cin = 3
        idx = 0
        for ch, n in L._VGG_STAGES:
            for _ in range(n):
                key, k = jax.random.split(key)
                params[f"conv{idx}_w"] = jax.random.normal(
                    k, (3, 3, cin, ch)) * 0.05
                params[f"conv{idx}_b"] = jnp.zeros((ch,))
                cin = ch
                idx += 1
        for i, (ch, _) in enumerate(L._VGG_STAGES):
            params[f"lin{i}_w"] = jnp.ones((1, 1, ch, 1)) / ch
        x = jax.random.uniform(jax.random.key(1), (1, 3, 64, 64)) * 2 - 1
        y = jax.random.uniform(jax.random.key(2), (1, 3, 64, 64)) * 2 - 1
        d_same = float(L.lpips_distance(params, x, x))
        d_diff = float(L.lpips_distance(params, x, y))
        assert abs(d_same) < 1e-6
        assert d_diff > 0


class TestHostBarrier:
    """host_barrier rides a private JAX module (jax._src.distributed); these
    fail loudly on a JAX upgrade that moves it, instead of the multihost
    fleet dying at a fence (VERDICT r3 weak #5)."""

    def test_private_client_module_present(self):
        from jax._src import distributed

        assert hasattr(distributed, "global_state")
        # may be None single-process, but the attribute chain must exist
        _ = distributed.global_state.client

    def test_noop_single_process(self):
        from fenerf_tpu.train import sharding

        assert jax.process_count() == 1
        sharding.host_barrier("test_barrier")  # returns immediately

    def test_fallback_when_private_api_moves(self, monkeypatch):
        from jax._src import distributed
        from jax.experimental import multihost_utils

        from fenerf_tpu.train import sharding

        called = []
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.delattr(distributed, "global_state")
        monkeypatch.setattr(multihost_utils, "sync_global_devices",
                            lambda name: called.append(name))
        with pytest.warns(RuntimeWarning, match="falling back"):
            sharding.host_barrier("b1")
        assert called == ["b1"]
