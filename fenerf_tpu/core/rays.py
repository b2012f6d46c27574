"""Camera + ray generation for the pi-GAN-style volumetric renderer.

Pure, key-threaded JAX functions. Behavior matches the reference semantics in
/root/reference/generators/volumetric_rendering.py:
  - get_initial_rays_trig   (:109-131)  -> pixel_ray_dirs / initial_z_vals
  - perturb_points          (:133-139)  -> perturb_z
  - sample_camera_positions (:179-228)  -> sample_camera
  - create_cam2world_matrix (:230-248)  -> cam2world_matrix
  - transform_sampled_points(:142-168)  -> transform_rays

Conventions (differ from the reference where TPU-idiomatic):
  * Rays are kept as a (R, S) structured layout, not flattened (R*S,); callers
    reshape at the field-network boundary.
  * z_vals carry shape (..., S) — no trailing singleton channel dim.
  * All randomness is explicit via jax.random keys.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def normalize_vecs(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Unit-normalize along the last axis (reference math_utils_torch.py:16-20)."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def pixel_ray_dirs(img_size: int, fov_degrees) -> jax.Array:
    """Unit ray directions in camera space for a square image.

    Matches reference get_initial_rays_trig pixel grid: for pixel (row a, col b)
    x = -1 + 2b/(W-1) (left->right), y = 1 - 2a/(H-1) (top->bottom),
    z = -1/tan(fov/2). Returns (img_size*img_size, 3), row-major.
    fov may be a traced scalar (dynamic zoom trajectories).
    """
    w = h = img_size
    x = jnp.linspace(-1.0, 1.0, w)
    y = jnp.linspace(1.0, -1.0, h)
    xx = jnp.broadcast_to(x[None, :], (h, w)).reshape(-1)
    yy = jnp.broadcast_to(y[:, None], (h, w)).reshape(-1)
    fov = jnp.asarray(fov_degrees, jnp.float32)
    zz = jnp.broadcast_to(-1.0 / jnp.tan(jnp.deg2rad(fov) / 2.0), xx.shape)
    return normalize_vecs(jnp.stack([xx, yy, zz], axis=-1))


def initial_z_vals(num_steps: int, ray_start: float, ray_end: float) -> jax.Array:
    """Evenly spaced sample distances along each ray, shape (num_steps,)."""
    return jnp.linspace(ray_start, ray_end, num_steps)


def perturb_z(key: jax.Array, z_vals: jax.Array) -> jax.Array:
    """Stratified jitter: uniform offset in [-dz/2, dz/2) where dz is the
    first inter-sample gap (reference perturb_points :133-139 uses
    z_vals[1]-z_vals[0], not per-interval gaps)."""
    dz = z_vals[..., 1:2] - z_vals[..., 0:1]
    offset = (jax.random.uniform(key, z_vals.shape) - 0.5) * dz
    return z_vals + offset


class CameraSample(NamedTuple):
    origin: jax.Array  # (n, 3) on the unit sphere (r configurable)
    pitch: jax.Array   # (n, 1) phi in (0, pi)
    yaw: jax.Array     # (n, 1) theta


def sample_camera(
    key: jax.Array,
    n: int,
    h_stddev: float,
    v_stddev: float,
    h_mean: float,
    v_mean: float,
    mode: str | None = "normal",
    r: float = 1.0,
) -> CameraSample:
    """Sample camera positions on a sphere (reference :179-228).

    theta (yaw) ~ horizontal dist, phi (pitch) ~ vertical dist; position:
      x = r sin(phi) cos(theta), z = r sin(phi) sin(theta), y = r cos(phi).
    mode=None or unknown -> deterministic mean ('else' branch in reference).
    """
    k_h, k_v, k_mix = jax.random.split(key, 3)
    shape = (n, 1)
    if mode == "uniform":
        theta = (jax.random.uniform(k_h, shape) - 0.5) * 2 * h_stddev + h_mean
        phi = (jax.random.uniform(k_v, shape) - 0.5) * 2 * v_stddev + v_mean
    elif mode in ("normal", "gaussian"):
        theta = jax.random.normal(k_h, shape) * h_stddev + h_mean
        phi = jax.random.normal(k_v, shape) * v_stddev + v_mean
    elif mode == "hybrid":
        # Reference flips one python-level coin per call; here a traced
        # bernoulli selects the branch for the whole batch.
        ku1, ku2 = jax.random.split(k_mix)
        theta_u = (jax.random.uniform(ku1, shape) - 0.5) * 2 * h_stddev * 2 + h_mean
        phi_u = (jax.random.uniform(ku2, shape) - 0.5) * 2 * v_stddev * 2 + v_mean
        theta_n = jax.random.normal(k_h, shape) * h_stddev + h_mean
        phi_n = jax.random.normal(k_v, shape) * v_stddev + v_mean
        coin = jax.random.bernoulli(jax.random.fold_in(k_mix, 1))
        theta = jnp.where(coin, theta_u, theta_n)
        phi = jnp.where(coin, phi_u, phi_n)
    elif mode == "truncated_gaussian":
        theta = (
            jax.random.truncated_normal(k_h, -2.0, 2.0, shape) * h_stddev + h_mean
        )
        phi = jax.random.truncated_normal(k_v, -2.0, 2.0, shape) * v_stddev + v_mean
    elif mode == "spherical_uniform":
        theta = (jax.random.uniform(k_h, shape) - 0.5) * 2 * h_stddev + h_mean
        v_std, v_mn = v_stddev / math.pi, v_mean / math.pi
        v = (jax.random.uniform(k_v, shape) - 0.5) * 2 * v_std + v_mn
        v = jnp.clip(v, 1e-5, 1 - 1e-5)
        phi = jnp.arccos(1 - 2 * v)
    else:  # deterministic mean
        theta = jnp.full(shape, h_mean)
        phi = jnp.full(shape, v_mean)

    phi = jnp.clip(phi, 1e-5, math.pi - 1e-5)
    sin_phi = jnp.sin(phi)
    origin = jnp.concatenate(
        [r * sin_phi * jnp.cos(theta), r * jnp.cos(phi), r * sin_phi * jnp.sin(theta)],
        axis=-1,
    )
    return CameraSample(origin=origin, pitch=phi, yaw=theta)


def cam2world_matrix(forward: jax.Array, origin: jax.Array) -> jax.Array:
    """4x4 cam->world matrices from forward direction + origin (ref :230-248).

    Rotation columns are (-left, up, -forward) with up seeded at +Y.
    """
    n = forward.shape[0]
    forward = normalize_vecs(forward)
    up0 = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), forward.shape)
    left = normalize_vecs(jnp.cross(up0, forward))
    up = normalize_vecs(jnp.cross(forward, left))
    rot3 = jnp.stack([-left, up, -forward], axis=-1)  # (n, 3, 3) columns
    rotation = jnp.tile(jnp.eye(4), (n, 1, 1)).at[:, :3, :3].set(rot3)
    translation = jnp.tile(jnp.eye(4), (n, 1, 1)).at[:, :3, 3].set(origin)
    return translation @ rotation


class TransformedRays(NamedTuple):
    points: jax.Array       # (n, R, S, 3) world-space sample points
    z_vals: jax.Array       # (n, R, S)
    ray_dirs: jax.Array     # (n, R, 3) world-space unit directions
    ray_origins: jax.Array  # (n, R, 3) world-space camera origin per ray
    pitch: jax.Array        # (n, 1)
    yaw: jax.Array          # (n, 1)


def transform_rays(
    key: jax.Array,
    n: int,
    ray_dirs_cam: jax.Array,  # (R, 3)
    z_vals: jax.Array,        # (S,)
    h_stddev: float,
    v_stddev: float,
    h_mean: float,
    v_mean: float,
    mode: str | None = "normal",
    perturb: bool = True,
) -> TransformedRays:
    """Jitter samples, sample a camera per batch element, map rays to world.

    Mirrors reference transform_sampled_points (:142-168) but generates the
    batched camera-space points internally from the shared per-pixel rays.
    """
    k_perturb, k_cam = jax.random.split(key)
    num_rays = ray_dirs_cam.shape[0]
    num_steps = z_vals.shape[0]

    z = jnp.broadcast_to(z_vals[None, None, :], (n, num_rays, num_steps))
    if perturb:
        z = perturb_z(k_perturb, z)
    # camera-space points: dir * z (z is distance along the unit ray)
    pts_cam = ray_dirs_cam[None, :, None, :] * z[..., None]

    cam = sample_camera(k_cam, n, h_stddev, v_stddev, h_mean, v_mean, mode)
    forward = normalize_vecs(-cam.origin)
    c2w = cam2world_matrix(forward, cam.origin)
    rot = c2w[:, :3, :3]
    trans = c2w[:, :3, 3]

    pts_world = jnp.einsum("nij,nrsj->nrsi", rot, pts_cam) + trans[:, None, None, :]
    dirs_world = jnp.einsum("nij,rj->nri", rot, ray_dirs_cam)
    origins_world = jnp.broadcast_to(trans[:, None, :], (n, num_rays, 3))

    return TransformedRays(
        points=pts_world,
        z_vals=z,
        ray_dirs=dirs_world,
        ray_origins=origins_world,
        pitch=cam.pitch,
        yaw=cam.yaw,
    )
