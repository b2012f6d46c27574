"""Utils tests: checkpoint roundtrip, MRC writer, image helpers, EMA-free."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from fenerf_tpu.utils import checkpoint as ckpt
from fenerf_tpu.utils.image import (CELEBA_PALETTE, make_grid, mask2color,
                                    to_uint8)
from fenerf_tpu.utils.mrc import read_mrc, write_mrc


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {
            "a": [jnp.arange(4.0), jnp.ones((2, 3))],
            "b": {"c": jnp.asarray(5, jnp.int32)},
        }
        path = str(tmp_path / "x.npz")
        ckpt.save(path, tree)
        like = jax.tree.map(jnp.zeros_like, tree)
        out = ckpt.load(path, like)
        np.testing.assert_allclose(out["a"][0], np.arange(4.0))
        np.testing.assert_allclose(out["a"][1], 1.0)
        assert int(out["b"]["c"]) == 5

    def test_leaf_count_mismatch_raises(self, tmp_path):
        path = str(tmp_path / "x.npz")
        ckpt.save(path, {"a": jnp.zeros(3)})
        try:
            ckpt.load(path, {"a": jnp.zeros(3), "b": jnp.zeros(3)})
            assert False, "should raise"
        except AssertionError as e:
            assert "leaves" in str(e)


class TestMrc:
    def test_roundtrip(self, tmp_path):
        vol = np.random.RandomState(0).randn(8, 9, 10).astype(np.float32)
        path = str(tmp_path / "v.mrc")
        write_mrc(path, vol, voxel_size=0.3 / 8)
        back = read_mrc(path)
        np.testing.assert_allclose(back, vol)
        assert os.path.getsize(path) == 1024 + vol.size * 4


class TestImage:
    def test_mask2color(self):
        labels = np.zeros((1, 19, 2, 2), np.float32)
        labels[0, 5, 0, 0] = 1.0
        labels[0, 0, 1, 1] = 1.0
        rgb = mask2color(labels)
        np.testing.assert_array_equal(rgb[0, 0, 0], CELEBA_PALETTE[5])
        np.testing.assert_array_equal(rgb[0, 1, 1], CELEBA_PALETTE[0])

    def test_make_grid_shape(self):
        imgs = np.zeros((7, 8, 8, 3), np.uint8)
        grid = make_grid(imgs, nrow=5, pad=2)
        assert grid.shape == (2 * 10 + 2, 5 * 10 + 2, 3)

    def test_to_uint8_range(self):
        x = np.array([[-1.0, 0.0, 1.0]])
        u = to_uint8(x, normalize=False)
        np.testing.assert_array_equal(u, [[0, 128, 255]])
