"""BiSeNet parity vs the reference torch implementation (eval mode,
randomized weights + running stats)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fenerf_tpu.nn.bisenet import (bisenet_apply, bisenet_from_torch,
                                   remap_labels, resize_bilinear_ac)

from reference_shim import import_reference_siren

import_reference_siren()
import importlib

ref_bisenet = importlib.import_module("generators.BiSeNet")


class TestResize:
    def test_matches_torch_align_corners(self):
        x = np.random.RandomState(0).randn(1, 2, 7, 5).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.tensor(x), (13, 9), mode="bilinear", align_corners=True
        ).numpy()
        ours = resize_bilinear_ac(jnp.asarray(x), (13, 9))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TestBiSeNet:
    def test_parity_random_weights(self):
        torch.manual_seed(0)
        net = ref_bisenet.BiSeNet(n_classes=20)
        # randomize BN running stats so folding is actually exercised
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
        net.eval()
        x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref, _, _ = net(torch.tensor(x))
        params = bisenet_from_torch(net.state_dict())
        ours = bisenet_apply(params, jnp.asarray(x))
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-3,
                                   rtol=1e-2)

    def test_remap(self):
        m = np.arange(20, dtype=np.uint8)
        out = remap_labels(m)
        assert out[0] == 0 and out[2] == 6 and out[14] == 3 and out[19] == 14
        assert out.max() <= 18
