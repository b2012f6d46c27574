"""Numeric tests for the ray/camera core against independently-derived values.

The reference has no tests (SURVEY.md §4); these golden/property tests pin the
semantics of volumetric_rendering.py that every workload depends on.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenerf_tpu.core import rays


class TestPixelRayDirs:
    def test_corner_pixels(self):
        # 3x3 image, fov=90deg -> z = -1/tan(45deg) = -1
        d = rays.pixel_ray_dirs(3, 90.0)
        assert d.shape == (9, 3)
        # top-left pixel (row 0, col 0): x=-1, y=+1, z=-1 normalized
        np.testing.assert_allclose(
            d[0], np.array([-1, 1, -1]) / math.sqrt(3), rtol=1e-6
        )
        # center pixel: x=0, y=0 -> straight down -z
        np.testing.assert_allclose(d[4], [0, 0, -1], atol=1e-7)
        # bottom-right: x=+1, y=-1
        np.testing.assert_allclose(
            d[8], np.array([1, -1, -1]) / math.sqrt(3), rtol=1e-6
        )

    def test_row_major_x_fastest(self):
        d = np.asarray(rays.pixel_ray_dirs(4, 12.0))
        # undo the normalization: x/|z| recovers the NDC x (z is constant
        # pre-normalization, so the ratio is exact)
        x = (d[:, 0] / -d[:, 2]).reshape(4, 4)
        # x increases along columns, constant down rows
        assert np.all(np.diff(x, axis=1) > 0)
        np.testing.assert_allclose(np.diff(x, axis=0), 0, atol=1e-6)
        y = (d[:, 1] / -d[:, 2]).reshape(4, 4)
        assert np.all(np.diff(y, axis=0) < 0)  # y decreases down the image

    def test_unit_norm(self):
        d = rays.pixel_ray_dirs(8, 12.0)
        np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1), 1.0, rtol=1e-6)


class TestCamera:
    def test_mean_mode_front_camera(self):
        cam = rays.sample_camera(
            jax.random.key(0), 2, 0.3, 0.155, math.pi / 2, math.pi / 2, mode=None
        )
        # theta=phi=pi/2 -> origin (0, 0, 1)
        np.testing.assert_allclose(cam.origin, [[0, 0, 1]] * 2, atol=1e-6)
        np.testing.assert_allclose(cam.pitch, math.pi / 2)
        np.testing.assert_allclose(cam.yaw, math.pi / 2)

    def test_gaussian_moments(self):
        cam = rays.sample_camera(
            jax.random.key(1), 20000, 0.3, 0.155, 1.5, 1.6, mode="gaussian"
        )
        assert abs(float(cam.yaw.mean()) - 1.5) < 0.01
        assert abs(float(cam.yaw.std()) - 0.3) < 0.01
        assert abs(float(cam.pitch.mean()) - 1.6) < 0.01
        np.testing.assert_allclose(jnp.linalg.norm(cam.origin, axis=-1), 1.0, rtol=1e-5)

    def test_pitch_clamped(self):
        cam = rays.sample_camera(
            jax.random.key(2), 1000, 0.0, 5.0, math.pi / 2, math.pi / 2, mode="gaussian"
        )
        # f32 clip boundaries carry rounding error; allow 1e-6 slack
        assert float(cam.pitch.min()) >= 1e-5 - 1e-6
        assert float(cam.pitch.max()) <= math.pi - 1e-5 + 1e-6

    def test_uniform_range(self):
        cam = rays.sample_camera(
            jax.random.key(3), 5000, 0.5, 0.2, 1.0, 1.5, mode="uniform"
        )
        assert float(cam.yaw.min()) >= 0.5 - 1e-6 and float(cam.yaw.max()) <= 1.5 + 1e-6
        assert float(cam.pitch.min()) >= 1.3 - 1e-6

    def test_spherical_uniform(self):
        cam = rays.sample_camera(
            jax.random.key(4), 5000, 0.5, 0.4, 1.0, math.pi / 2, mode="spherical_uniform"
        )
        assert jnp.all(jnp.isfinite(cam.origin))


class TestCam2World:
    def test_front_camera_matrix(self):
        # camera at (0,0,1) looking at origin: forward=-origin=(0,0,-1)
        origin = jnp.array([[0.0, 0.0, 1.0]])
        c2w = rays.cam2world_matrix(-origin, origin)
        # left = normalize(cross(up0=(0,1,0), fwd=(0,0,-1))) = (-1,0,0)
        # columns: -left=(1,0,0), up=(0,1,0), -forward=(0,0,1) -> identity rot
        expected = np.eye(4)
        expected[:3, 3] = [0, 0, 1]
        np.testing.assert_allclose(c2w[0], expected, atol=1e-6)

    def test_rotation_orthonormal(self):
        cam = rays.sample_camera(
            jax.random.key(5), 16, 0.3, 0.155, 1.5, 1.5, mode="gaussian"
        )
        c2w = rays.cam2world_matrix(-cam.origin, cam.origin)
        rot = c2w[:, :3, :3]
        eye = jnp.einsum("nij,nkj->nik", rot, rot)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)

    def test_camera_looks_at_origin(self):
        cam = rays.sample_camera(
            jax.random.key(6), 8, 0.4, 0.2, 1.2, 1.7, mode="gaussian"
        )
        c2w = rays.cam2world_matrix(-cam.origin, cam.origin)
        # camera-space -z axis maps to world forward = -origin (unit)
        minus_z = c2w[:, :3, :3] @ jnp.array([0.0, 0.0, -1.0])
        np.testing.assert_allclose(
            minus_z, rays.normalize_vecs(-cam.origin), atol=1e-5
        )


class TestTransformRays:
    def test_shapes_and_center_ray(self):
        d = rays.pixel_ray_dirs(5, 12.0)
        z = rays.initial_z_vals(7, 0.88, 1.12)
        tr = rays.transform_rays(
            jax.random.key(0), 3, d, z, 0.0, 0.0, math.pi / 2, math.pi / 2,
            mode=None, perturb=False,
        )
        assert tr.points.shape == (3, 25, 7, 3)
        assert tr.z_vals.shape == (3, 25, 7)
        assert tr.ray_dirs.shape == (3, 25, 3)
        assert tr.ray_origins.shape == (3, 25, 3)
        # camera at (0,0,1); center ray (index 12) points at -z world => toward origin
        np.testing.assert_allclose(tr.ray_origins[0, 12], [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(tr.ray_dirs[0, 12], [0, 0, -1], atol=1e-6)
        # points on center ray: origin + dir*z
        np.testing.assert_allclose(
            tr.points[0, 12, :, 2], 1.0 - np.asarray(z), atol=1e-6
        )

    def test_points_equal_origin_plus_dir_z(self):
        d = rays.pixel_ray_dirs(4, 12.0)
        z = rays.initial_z_vals(6, 0.88, 1.12)
        tr = rays.transform_rays(
            jax.random.key(1), 2, d, z, 0.3, 0.155, 1.5, 1.5,
            mode="gaussian", perturb=True,
        )
        recon = (
            tr.ray_origins[:, :, None, :]
            + tr.ray_dirs[:, :, None, :] * tr.z_vals[..., None]
        )
        np.testing.assert_allclose(tr.points, recon, atol=1e-5)

    def test_perturb_stratified(self):
        z = jnp.broadcast_to(rays.initial_z_vals(12, 0.88, 1.12), (100, 12))
        zp = rays.perturb_z(jax.random.key(0), z)
        dz = float(z[0, 1] - z[0, 0])
        assert float(jnp.abs(zp - z).max()) <= dz / 2 + 1e-6
        assert float(jnp.abs(zp - z).max()) > dz / 10  # actually jittered
