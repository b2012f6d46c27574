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


class TestAlign:
    def test_alignment_quad_geometry(self):
        from fenerf_tpu.utils.align import alignment_quad
        # synthetic frontal landmarks: eyes at (80,100)/(120,100), mouth ~(100,150)
        lm = np.zeros((68, 2))
        lm[36:42] = [80, 100]
        lm[42:48] = [120, 100]
        lm[48] = [85, 150]
        lm[54] = [115, 150]
        quad, qsize = alignment_quad(lm)
        assert quad.shape == (4, 2) and qsize > 0
        center = quad.mean(axis=0)
        np.testing.assert_allclose(center, [100, 105], atol=1e-6)
        # square-ish quad
        side1 = np.linalg.norm(quad[1] - quad[0])
        side2 = np.linalg.norm(quad[2] - quad[1])
        np.testing.assert_allclose(side1, side2, rtol=1e-6)

    def test_align_face_runs(self):
        from PIL import Image
        from fenerf_tpu.utils.align import align_face
        rng = np.random.RandomState(0)
        img = Image.fromarray((rng.rand(256, 256, 3) * 255).astype(np.uint8))
        lm = np.zeros((68, 2))
        lm[36:42] = [100, 110]
        lm[42:48] = [150, 110]
        lm[48] = [110, 170]
        lm[54] = [145, 170]
        out = align_face(img, lm, output_size=64, transform_size=64)
        assert out.size == (64, 64)


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        from fenerf_tpu.utils.marching import marching_tetrahedra
        n = 32
        g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - (n - 1) / 2
        vol = 10.0 - np.sqrt((g ** 2).sum(0))  # inside-positive sphere r=10
        verts, faces = marching_tetrahedra(vol, level=0.0)
        assert len(verts) > 100 and len(faces) > 100
        # all vertices near radius 10 from the center
        r = np.linalg.norm(verts - (n - 1) / 2, axis=1)
        assert abs(r.mean() - 10.0) < 0.2
        assert r.std() < 0.2
        # watertight: every edge shared by exactly 2 faces
        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                faces[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.99

    def test_empty_volume(self):
        from fenerf_tpu.utils.marching import marching_tetrahedra
        verts, faces = marching_tetrahedra(np.zeros((8, 8, 8)), level=1.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_ply_roundtrip_header(self, tmp_path):
        from fenerf_tpu.utils.marching import marching_tetrahedra, write_ply
        n = 16
        g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - (n - 1) / 2
        vol = 5.0 - np.abs(g).max(0)  # cube isosurface
        verts, faces = marching_tetrahedra(vol, level=0.0,
                                           spacing=(0.1, 0.1, 0.1))
        path = str(tmp_path / "m.ply")
        write_ply(path, verts, faces)
        head = open(path).read(200)
        assert "element vertex" in head and "element face" in head


class TestMarchingCubes:
    def test_sphere_radius_volume_euler(self):
        from fenerf_tpu.utils.marching import marching_cubes
        n = 48
        g = np.mgrid[0:n, 0:n, 0:n].astype(np.float64) - (n - 1) / 2
        R = 15.0
        vol = R ** 2 - (g ** 2).sum(0)
        verts, faces = marching_cubes(vol, level=0.0,
                                      origin=(-(n - 1) / 2,) * 3)
        r = np.linalg.norm(verts, axis=1)
        assert np.abs(r - R).max() < 0.05  # trilinear edge points on-sphere
        edges = np.sort(np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                        faces[:, [2, 0]]]), axis=1)
        uniq, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()  # closed 2-manifold
        assert len(verts) - len(uniq) + len(faces) == 2  # Euler: sphere
        # outward orientation: signed volume matches 4/3 pi R^3
        v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        V = np.einsum("ij,ij->", v0, np.cross(v1, v2)) / 6.0
        ana = 4 / 3 * np.pi * R ** 3
        assert abs(V - ana) / ana < 0.01

    def test_random_closed_volumes_manifold(self):
        # ambiguous-case stress: complementary diagonal faces between
        # neighbor cells must not crack (counts != 2) the mesh
        from fenerf_tpu.utils.marching import marching_cubes
        rng = np.random.default_rng(0)
        for _ in range(4):
            vol = np.full((12, 13, 14), -10.0)
            vol[1:-1, 1:-1, 1:-1] = rng.normal(size=(10, 11, 12))
            verts, faces = marching_cubes(vol, 0.0)
            assert (faces[:, 0] != faces[:, 1]).all()
            assert (faces[:, 1] != faces[:, 2]).all()
            edges = np.sort(np.concatenate(
                [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
                axis=1)
            _, counts = np.unique(edges, axis=0, return_counts=True)
            assert (counts == 2).all()

    def test_single_corner_case(self):
        # one corner above level in a single cell -> one corner-cutting tri
        from fenerf_tpu.utils.marching import marching_cubes
        vol = np.zeros((2, 2, 2))
        vol[0, 0, 0] = 1.0
        verts, faces = marching_cubes(vol, 0.5)
        assert len(verts) == 3 and len(faces) == 1
        # cut points at t=0.5 on the three edges out of corner (0, 0, 0)
        expect = {(0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 0.5)}
        got = {tuple(np.round(v, 6)) for v in verts}
        assert got == expect

    def test_empty_and_spacing(self):
        from fenerf_tpu.utils.marching import marching_cubes
        verts, faces = marching_cubes(np.zeros((6, 6, 6)), level=1.0)
        assert len(verts) == 0 and len(faces) == 0
        vol = np.zeros((2, 2, 2))
        vol[0, 0, 0] = 1.0
        verts, _ = marching_cubes(vol, 0.5, spacing=(2.0, 4.0, 8.0),
                                  origin=(10.0, 20.0, 30.0))
        got = {tuple(np.round(v, 6)) for v in verts}
        assert got == {(11.0, 20.0, 30.0), (10.0, 22.0, 30.0),
                       (10.0, 20.0, 34.0)}


class TestPlots:
    def test_plot_miou(self, tmp_path):
        # reference tools.py:636 plot_miou: mious.npy -> miou.png
        import numpy as np

        from fenerf_tpu.utils.plots import plot_miou

        np.save(tmp_path / "mious.npy", np.linspace(0.2, 0.7, 11))
        out = plot_miou(str(tmp_path))
        import os

        assert os.path.getsize(out) > 0
