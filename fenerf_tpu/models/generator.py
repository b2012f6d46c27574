"""The volumetric generator: ONE render function for every entry point.

The reference implements the same pipeline four times per generator class
(forward / staged_forward / forward_with_frequencies /
staged_forward_with_frequencies, /root/reference/generators/generators.py:452-798)
plus gradient-subset variants (point_forward/part_forward :800-910). Here a
single `render()` covers all of them:

  * z-space vs W-space entry: callers either pass latents (render_from_z) or
    raw film activations (render) — truncation composes outside.
  * train vs staged inference: `ray_chunk` statically selects whole-image
    evaluation or a lax.map over fixed-size ray blocks (constant shapes, one
    compile per stage — replaces the reference's data-dependent while-loop
    chunking, generators.py:583-589).
  * hierarchical importance sampling, coarse+fine depth sort, fill modes and
    psi-truncation are config flags.

Pipeline (reference call stack, SURVEY.md §3.1 "device hot path"):
ray grid -> stratified jitter -> camera sample -> cam2world -> field eval
(coarse) -> integrate -> sample_pdf -> field eval (fine) -> merge-sort ->
integrate -> NCHW pixels in [-1, 1].
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from fenerf_tpu.core import integrate as integ
from fenerf_tpu.core import rays as raylib
from fenerf_tpu.nn import fields

Params = Any
Film = tuple[jax.Array, jax.Array]


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable -> usable as a jit static arg).

    Mirrors the curriculum metadata consumed by the reference generator
    forwards (img_size/fov/ray_start/ray_end/num_steps/h_stddev/..., e.g.
    curriculums.py:83-129) plus the eval-only knobs (psi, fill, lock view).
    """
    img_size: int = 64
    num_steps: int = 12
    fov: float = 12.0
    ray_start: float = 0.88
    ray_end: float = 1.12
    h_stddev: float = 0.3
    v_stddev: float = 0.155
    h_mean: float = 1.5707963267948966   # pi/2
    v_mean: float = 1.5707963267948966
    sample_dist: str | None = "gaussian"
    hierarchical: bool = True
    clamp_mode: str = "relu"
    last_back: bool = False
    white_back: bool = False
    black_back: bool = False
    fill_mode: str | None = None
    fill_color: str = "black"
    lock_view_dependence: bool = False
    softmax_label: bool = False
    perturb: bool = True
    ray_chunk: int = 0        # 0 => whole image in one field eval
    compute_dtype: str = "float32"   # 'bfloat16' for the MXU fast path
    backend: str = "xla"      # 'pallas' => fused point-MLP kernel (inference)
    remat: bool = False       # rematerialize field activations in backward
    grad_rays: float = 1.0    # fraction of rays whose pixels carry gradients
                              # (< 1.0: the TPU form of the reference's
                              # part_forward grad-subset trick,
                              # generators.py:858-910 — ALL rays render
                              # forward, a random per-call subset feeds the
                              # backward; the rest are emitted under
                              # stop_gradient, so XLA prunes their backward
                              # AND their texture-table cotangent rows).
                              # Training-only; pixels are identical to
                              # grad_rays=1.0 (pure data movement around the
                              # same per-ray math)

    @property
    def n_rays(self) -> int:
        return self.img_size * self.img_size

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# Fused per-ray Pallas kernels (ops/ray_finalize.py) for the hierarchical
# path. SHIPPED DEFAULT: "never" — the kernels were built, measured +14%
# SLOWER than the fusible nosort XLA path (Mosaic materializes every
# (tile, 2S, 2S) intermediate at full tile size; PROFILE_RAYK.json), and
# kept only for equivalence testing. Env knob FENERF_RAY_KERNELS:
#   never   XLA machinery (production)
#   auto    kernels when the field backend is pallas/pallas_train AND the
#           host backend is TPU (re-measure here if a future stack changes
#           the Mosaic footprint)
#   always  kernels even off-TPU, in interpret mode (tests/test_ray_kernels)
RAY_KERNELS = os.environ.get("FENERF_RAY_KERNELS", "never")

# Apply fill/softmax once per image OUTSIDE the ray-block lax.map (default)
# instead of inside each block body. The ops are elementwise per ray, so the
# result is identical; inside the loop body the channel-axis concat of
# apply_fill broke XLA's epilogue fusion on every block (the ~240ms
# "fill/softmax" ablation of PROFILE_RAYK.json). Set FENERF_FILL_HOIST=0 to
# restore the in-body application for A/B profiling.
FILL_HOIST = os.environ.get("FENERF_FILL_HOIST", "1") != "0"


def _ray_kernels_enabled(rcfg: "RenderConfig") -> bool:
    if RAY_KERNELS == "never" or rcfg.backend not in ("pallas",
                                                      "pallas_train"):
        return False
    if rcfg.num_steps < 3:
        # the resample kernel needs >= 1 interior proposal weight
        # (S-2 bins-weights); tiny smoke configs fall back to XLA
        return False
    return RAY_KERNELS == "always" or jax.default_backend() == "tpu"


class RayNoise(NamedTuple):
    """Per-ray randomness, drawn ONCE over the whole image and sliced per
    ray block — chunked rendering is bit-exact vs whole-image rendering.
    All entries are unscaled draws; consumers scale by noise_std."""
    u: jax.Array | None       # (B, R, num_steps) importance-sampling uniforms
    coarse: jax.Array | None  # (B, R, S) proposal-pass sigma noise (std normal)
    final: jax.Array | None   # (B, R, S_total) final-pass sigma noise


def draw_ray_noise(k_coarse, k_pdf, k_final, batch: int, n_rays: int,
                   rcfg: "RenderConfig",
                   noise_std: float | jax.Array = 1.0) -> RayNoise:
    # statically-zero noise_std (every inference CLI): skip the sigma-noise
    # draws entirely — sigma + 0*n is exact, and the dead (B, R, S) RNG
    # tensors cost ~29ms of the batch-64 flagship render (ROADMAP 2a).
    # Any non-traced scalar counts as static (np.float32(0) from a JSON/
    # checkpoint config layer must not silently re-pay the dead-RNG cost).
    dead = not isinstance(noise_std, jax.Array) and float(noise_std) == 0.0
    s = rcfg.num_steps
    if rcfg.hierarchical:
        return RayNoise(
            u=jax.random.uniform(k_pdf, (batch, n_rays, s)),
            coarse=(None if dead else
                    jax.random.normal(k_coarse, (batch, n_rays, s))),
            final=(None if dead else
                   jax.random.normal(k_final, (batch, n_rays, 2 * s))),
        )
    return RayNoise(
        u=None, coarse=None,
        final=(None if dead else
               jax.random.normal(k_final, (batch, n_rays, s))),
    )


def _shade_rays(field_fn, output_dim, rcfg, origins, dirs, z_vals,
                noise: RayNoise, noise_std):
    """The per-ray half of the pipeline on a block of rays: coarse field eval
    -> proposal integrate -> importance resample -> fine eval -> depth-sorted
    merge -> final integrate -> fill. Shapes: origins/dirs (B, Rb, 3),
    z_vals (B, Rb, S).

    Sample points are (re)computed here as origin + dir * z rather than
    passed in: a (B, R, S, 3) tensor pads its 3-lane minor axis to 128 on
    TPU (42x HBM blowup — 300MB logical became a 12GB allocation at
    batch 64 @128px), while per-block recomputation is two cheap VPU ops.

    Everything here is per-ray independent, so the caller may lax.map it over
    ray blocks: peak memory (field activations AND the (Rb, 2S, 2S) merge
    permutation) scales with the block size, not the image size."""
    b, _, s = z_vals.shape

    def eval_pts(pts, drs):
        rb = pts.shape[1]
        out = field_fn(pts.reshape(b, rb * s, 3), drs.reshape(b, rb * s, 3))
        return out.reshape(b, rb, s, output_dim)

    if rcfg.remat:
        eval_pts = jax.checkpoint(eval_pts)

    points = origins[:, :, None, :] + dirs[:, :, None, :] * z_vals[..., None]
    dirs_exp = jnp.broadcast_to(dirs[:, :, None, :], points.shape)
    if rcfg.lock_view_dependence:
        dirs_exp = jnp.zeros_like(dirs_exp).at[..., -1].set(-1.0)

    coarse = eval_pts(points, dirs_exp)

    if rcfg.hierarchical and _ray_kernels_enabled(rcfg):
        # fused Pallas per-ray machinery: proposal+resample in one kernel,
        # merge+integrate+fill+softmax in another — every (.., 2S, 2S)
        # intermediate stays in VMEM (PROFILE_HIER.json: the XLA graph's
        # fusion breaks around these ops cost ~544+246ms of the batch-64
        # flagship render)
        from fenerf_tpu.ops import ray_finalize as rf

        interp = jax.default_backend() != "tpu"
        scale = lambda t: None if t is None else t * noise_std
        fine_z = rf.ray_resample(
            jax.lax.stop_gradient(coarse[..., -1]), z_vals,
            scale(noise.coarse), noise.u, clamp_mode=rcfg.clamp_mode,
            interpret=interp)
        fine_z = jax.lax.stop_gradient(fine_z)
        fine_pts = (origins[:, :, None, :]
                    + dirs[:, :, None, :] * fine_z[..., None])
        fine = eval_pts(fine_pts, dirs_exp)
        comp, depth, wsum = rf.ray_finalize_vjp(
            fine, coarse, fine_z, z_vals, scale(noise.final),
            clamp_mode=rcfg.clamp_mode, last_back=rcfg.last_back,
            white_back=rcfg.white_back, black_back=rcfg.black_back,
            fill_mode=None if FILL_HOIST else rcfg.fill_mode,
            fill_color=rcfg.fill_color,
            softmax_label=False if FILL_HOIST else rcfg.softmax_label,
            interpret=interp)
        return comp, depth, wsum

    if rcfg.hierarchical:
        # coarse weights drive importance resampling; no gradients flow
        # through the proposal (reference wraps this in no_grad,
        # generators.py:483-502)
        coarse_w = integ.integrate_weights(
            jax.lax.stop_gradient(coarse[..., -1]), z_vals,
            noise=noise.coarse, noise_std=noise_std,
            clamp_mode=rcfg.clamp_mode,
        )
        w = jax.lax.stop_gradient(coarse_w) + 1e-5
        fine_z = integ.sample_pdf(
            None, integ.midpoints(z_vals), w[..., 1:-1], rcfg.num_steps,
            u=noise.u)
        fine_z = jax.lax.stop_gradient(fine_z)
        fine_pts = (origins[:, :, None, :]
                    + dirs[:, :, None, :] * fine_z[..., None])
        fine = eval_pts(fine_pts, dirs_exp)
        # merge + integrate with NO permutation at all (the nosort
        # formulation): the one-hot permutation matmuls of the round-2
        # composite_merged dispatch to the MXU and cannot fuse with their
        # elementwise producers (451ms of the batch-64 render,
        # PROFILE_HIER.json); the masked-reduce form measured 2451ms vs
        # 2760ms whole-render (PROFILE_RAYK.json)
        res = integ.composite_merged_nosort(
            fine, coarse, fine_z, z_vals,
            noise=noise.final, noise_std=noise_std,
            clamp_mode=rcfg.clamp_mode, last_back=rcfg.last_back,
            white_back=rcfg.white_back, black_back=rcfg.black_back,
        )
    else:
        res = integ.integrate(
            coarse, z_vals, key=None, noise=noise.final,
            noise_std=noise_std,
            clamp_mode=rcfg.clamp_mode, last_back=rcfg.last_back,
            white_back=rcfg.white_back, black_back=rcfg.black_back,
        )
    if FILL_HOIST:
        return res.comp, res.depth, res.weights_sum
    comp = _finalize_comp(res.comp, res.weights_sum, rcfg)
    return comp, res.depth, res.weights_sum


def _finalize_comp(comp, weights_sum, rcfg):
    """Per-ray fill + optional label softmax — elementwise across rays, so it
    can run once on the assembled image instead of inside every ray block
    (see FILL_HOIST)."""
    comp = integ.apply_fill(comp, weights_sum, rcfg.fill_mode,
                            rcfg.fill_color)
    if rcfg.softmax_label:
        seg, rgb = comp[..., :-3], comp[..., -3:]
        comp = jnp.concatenate([jax.nn.softmax(seg, axis=-1), rgb], axis=-1)
    return comp


def _shade_chunked(field_fn, output_dim, rcfg, origins, dirs, z_vals,
                   noise: RayNoise, noise_std):
    """lax.map _shade_rays over fixed-size ray blocks (TPU replacement for the
    reference's max_batch_size while loops, generators.py:583-589). Chunking
    the WHOLE per-ray pipeline — not just the field evals — bounds the merge
    permutation and integration intermediates too (the round-1 batch-32 HBM
    ceiling, ROADMAP #2)."""
    b, r = z_vals.shape[:2]
    chunk = rcfg.ray_chunk
    if not chunk or chunk >= r:
        return _shade_rays(field_fn, output_dim, rcfg, origins, dirs, z_vals,
                           noise, noise_std)

    assert r % chunk == 0, f"ray_chunk {chunk} must divide n_rays {r}"
    n_blocks = r // chunk

    def resh(t):
        # (B, R, ...) -> (n_blocks, B, chunk, ...) for lax.map
        return t.reshape(b, n_blocks, chunk, *t.shape[2:]).swapaxes(0, 1)

    xs = jax.tree.map(resh, (origins, dirs, z_vals, noise))
    out = jax.lax.map(
        lambda a: _shade_rays(field_fn, output_dim, rcfg,
                              a[0], a[1], a[2], a[3], noise_std),
        xs)
    return tuple(
        t.swapaxes(0, 1).reshape(b, r, *t.shape[3:]) for t in out)


def _shade_grad_subset(field_fn, output_dim, rcfg, key, origins, dirs,
                       z_vals, noise: RayNoise, noise_std):
    """Shade with gradients restricted to a random grad_rays-fraction of the
    rays (the reference's part_forward trick, generators.py:858-910, recast
    for SPMD: permute the ray axis, shade the first n_grad rays on the
    differentiable path and the rest under stop_gradient, un-permute).

    Per-ray math is row-independent, so the emitted pixels equal the
    grad_rays=1.0 render exactly (MXU accumulation is shape-stable on TPU;
    CPU gemms may differ by last-ulp — same caveat as ray chunking). The
    backward prunes to the grad subset: field VJP rows, hierarchical-machinery
    transposes AND texture-table cotangent scatter rows all scale with
    grad_rays (the 128px production stage's measured backward pools,
    PROFILE_TRAIN.json img128 gstop/gtab).

    Returns (comp, depth, weights_sum, grad_mask) with grad_mask (R,) bool in
    ORIGINAL ray order (True = this ray's pixel carries gradients)."""
    r = z_vals.shape[1]
    q = rcfg.ray_chunk if (rcfg.ray_chunk and rcfg.ray_chunk < r) else 1
    n_grad = int(round(rcfg.grad_rays * r))
    n_grad = min(r - q, max(q, (n_grad // q) * q))  # chunk-aligned, 0<ng<r
    perm = jax.random.permutation(key, r)
    inv = jnp.argsort(perm)

    args = jax.tree.map(lambda x: x[:, perm], (origins, dirs, z_vals, noise))

    def part(a, b, stop):
        o, d, zv, nse = jax.tree.map(lambda x: x[:, a:b], args)
        out = _shade_chunked(field_fn, output_dim, rcfg, o, d, zv, nse,
                             noise_std)
        return jax.tree.map(jax.lax.stop_gradient, out) if stop else out

    out_g = part(0, n_grad, stop=False)
    out_s = part(n_grad, r, stop=True)
    comp, depth, wsum = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=1)[:, inv], out_g, out_s)
    return comp, depth, wsum, inv < n_grad


def _film_field_fn(params, fcfg, rcfg, film_geo, film_app):
    compute_dtype = (jnp.bfloat16 if rcfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    # build the texture gather table ONCE per render (outside the ray-chunk
    # lax.map and any remat scope); apply_field picks it up from params.
    # no-op if the caller (train step) already injected one
    params = fields.with_grid_table(
        params, fcfg,
        (jnp.bfloat16 if (rcfg.backend != "xla"
                          or compute_dtype == jnp.bfloat16) else None))

    def field_fn(pts, drs):
        return fields.apply_field(
            params, fcfg, pts, drs, film_geo, film_app,
            compute_dtype=compute_dtype, backend=rcfg.backend)

    return field_fn


def render_core(
    field_fn,
    output_dim: int,
    rcfg: RenderConfig,
    key: jax.Array,
    batch_size: int,
    noise_std: float | jax.Array = 0.0,
    camera: tuple | None = None,
) -> dict[str, jax.Array]:
    """The full volumetric pipeline around an arbitrary per-point field
    field_fn(points (B,M,3), dirs (B,M,3)) -> (B,M,output_dim).

    camera: optional (pitch, yaw, fov) traced scalars overriding the rcfg
    camera distribution with a deterministic pose — video trajectories render
    every frame through ONE compiled program instead of recompiling per pose.

    Returns dict with:
      pixels   (B, C, H, W) in [-1, 1]; C = n_labels(+1 bg if fill pads) + 3
      depth    (B, H, W)
      opacity  (B, H, W) total per-ray weight
      position (B, 2) sampled (pitch, yaw) — discriminator pose target
    """
    k_rays, k_coarse_noise, k_pdf, k_fine_noise = jax.random.split(key, 4)

    if camera is not None:
        pitch, yaw, fov = camera
        h_mean, v_mean = yaw, pitch
        h_stddev = v_stddev = 0.0
        sample_dist = None
    else:
        fov = rcfg.fov
        h_mean, v_mean = rcfg.h_mean, rcfg.v_mean
        h_stddev, v_stddev = rcfg.h_stddev, rcfg.v_stddev
        sample_dist = rcfg.sample_dist

    dirs_cam = raylib.pixel_ray_dirs(rcfg.img_size, fov)
    z0 = raylib.initial_z_vals(rcfg.num_steps, rcfg.ray_start, rcfg.ray_end)
    tr = raylib.transform_rays(
        k_rays, batch_size, dirs_cam, z0,
        h_stddev, v_stddev, h_mean, v_mean,
        mode=sample_dist, perturb=rcfg.perturb,
    )

    noise = draw_ray_noise(k_coarse_noise, k_pdf, k_fine_noise,
                           batch_size, rcfg.n_rays, rcfg, noise_std)
    grad_mask = None
    if rcfg.grad_rays < 1.0:
        # extra key derived by fold_in so the 4-way split above (and hence
        # every draw) stays bit-identical to the grad_rays=1.0 program
        comp, depth, weights_sum, grad_mask = _shade_grad_subset(
            field_fn, output_dim, rcfg, jax.random.fold_in(key, 0x6AD),
            tr.ray_origins, tr.ray_dirs, tr.z_vals, noise, noise_std)
    else:
        comp, depth, weights_sum = _shade_chunked(
            field_fn, output_dim, rcfg, tr.ray_origins, tr.ray_dirs,
            tr.z_vals, noise, noise_std)
    if FILL_HOIST:
        comp = _finalize_comp(comp, weights_sum, rcfg)

    hw = rcfg.img_size
    pixels = comp.reshape(batch_size, hw, hw, -1).transpose(0, 3, 1, 2) * 2.0 - 1.0
    out = {
        "pixels": pixels,
        "depth": depth.reshape(batch_size, hw, hw),
        "opacity": weights_sum.reshape(batch_size, hw, hw),
        "position": jnp.concatenate([tr.pitch, tr.yaw], axis=-1),
    }
    if grad_mask is not None:
        out["grad_ray_mask"] = grad_mask.reshape(hw, hw)
    return out


def render(
    params: Params,
    fcfg: fields.FieldConfig,
    rcfg: RenderConfig,
    key: jax.Array,
    film_geo: Film,
    film_app: Film,
    batch_size: int,
    noise_std: float | jax.Array = 0.0,
    camera: tuple | None = None,
) -> dict[str, jax.Array]:
    """Render a batch of images from W-space film activations (the FiLM-SIREN
    family; see render_core for outputs)."""
    field_fn = _film_field_fn(params, fcfg, rcfg, film_geo, film_app)
    return render_core(field_fn, fcfg.output_dim, rcfg, key, batch_size,
                       noise_std, camera)


def render_grid_from_z(
    params: Params,
    gcfg,   # latent_grid_field.GridFieldConfig
    rcfg: RenderConfig,
    key: jax.Array,
    z: jax.Array,
    noise_std: float | jax.Array = 0.0,
    camera: tuple | None = None,
) -> dict[str, jax.Array]:
    """Latent-grid family (SPATIALSIRENGRID): z -> StyleGenerator2D grid ->
    per-point local latents -> render. Reference ImplicitGenerator3d.forward
    with the grid SIREN (generators.py:13-431 + siren.py:437-451)."""
    field_fn = _grid_field_fn(params, gcfg, rcfg, z)
    return render_core(field_fn, gcfg.output_dim, rcfg, key, z.shape[0],
                       noise_std, camera)


def _grid_field_fn(params, gcfg, rcfg, z):
    """Per-point field closure for the latent-grid family, with the
    StyleGenerator2D plane hoisted OUT of the closure: under ray chunking
    the conv stack would otherwise sit inside the lax.map body and re-run
    per block, and under ray sharding it runs once per device (replicated —
    the plane is (B, 32, 32, 32), trivially small next to the point work)."""
    from fenerf_tpu.nn import latent_grid_field as lgf

    compute_dtype = (jnp.bfloat16 if rcfg.compute_dtype == "bfloat16"
                     else jnp.float32)
    plane = lgf.compute_plane(params, gcfg, z)

    def field_fn(pts, drs):
        return lgf.apply_grid_field(params, gcfg, pts, drs, z, plane=plane,
                                    compute_dtype=compute_dtype)

    return field_fn


def render_image_sharded(
    params: Params,
    fcfg: fields.FieldConfig,
    rcfg: RenderConfig,
    key: jax.Array,
    film_geo: Film,
    film_app: Film,
    mesh,
    camera: tuple,
    batch_size: int = 1,
    noise_std: float | jax.Array = 0.0,
    axis: str = "data",
    return_depth: bool = False,
) -> jax.Array:
    """Ray-parallel rendering: ONE image's rays sharded over the mesh.

    The reference scales only over the batch (DDP); rays are embarrassingly
    parallel (alpha compositing is per-ray), so a single large render can be
    split across chips — the NeRF analogue of context/sequence parallelism
    (SURVEY.md §5). Each device renders a horizontal strip of the pixel grid
    under a fixed camera; results concatenate along rows with no collectives
    beyond the output gather.

    Ray generation and every RNG draw happen OUTSIDE the shard_map with
    render_core's exact key structure, sharded along the ray axis — so the
    result is BIT-IDENTICAL to the unsharded render(camera=...) under any
    perturb / importance-sampling / sigma-noise setting (the per-ray work
    those draws feed is embarrassingly parallel; only the draw location
    moves). Requires a deterministic camera (pitch, yaw, fov); returns
    pixels (B, C, H, W), plus depth (B, H, W) when return_depth.
    """
    field_fn = _film_field_fn(params, fcfg, rcfg, film_geo, film_app)
    return _render_sharded_core(field_fn, fcfg.output_dim, rcfg, key, mesh,
                                camera, batch_size, noise_std, axis,
                                return_depth)


def render_grid_sharded(
    params: Params,
    gcfg,   # latent_grid_field.GridFieldConfig
    rcfg: RenderConfig,
    key: jax.Array,
    z: jax.Array,
    mesh,
    camera: tuple,
    noise_std: float | jax.Array = 0.0,
    axis: str = "data",
    return_depth: bool = False,
) -> jax.Array:
    """Ray-parallel rendering for the latent-grid family (SPATIALSIRENGRID):
    the StyleGenerator2D plane is computed replicated (it depends only on z —
    a (B, 32, 32, 32) tensor, trivial next to the per-point work), then each
    device shades its horizontal strip of rays exactly like the film family's
    render_image_sharded. Same bit-identical-to-unsharded guarantee: rays and
    every RNG draw happen outside the shard_map with render_core's key
    structure. Reference model: siren/siren.py:413-518."""
    field_fn = _grid_field_fn(params, gcfg, rcfg, z)
    return _render_sharded_core(field_fn, gcfg.output_dim, rcfg, key, mesh,
                                camera, z.shape[0], noise_std, axis,
                                return_depth)


def _render_sharded_core(field_fn, output_dim, rcfg, key, mesh, camera,
                         batch_size, noise_std, axis, return_depth):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    h = rcfg.img_size
    assert h % n_dev == 0, f"img_size {h} % {n_dev} devices != 0"
    pitch, yaw, fov = camera

    # same split/order as render_core — bit-equal draws
    k_rays, k_cnoise, k_pdf, k_fnoise = jax.random.split(key, 4)
    dirs_cam = raylib.pixel_ray_dirs(h, fov)
    z0 = raylib.initial_z_vals(rcfg.num_steps, rcfg.ray_start, rcfg.ray_end)
    tr = raylib.transform_rays(
        k_rays, batch_size, dirs_cam, z0, 0.0, 0.0, yaw, pitch,
        mode=None, perturb=rcfg.perturb,
    )
    noise = draw_ray_noise(k_cnoise, k_pdf, k_fnoise,
                           batch_size, h * h, rcfg, noise_std)

    def strip(origins, dirs, z_vals, nse):
        # each device shades its contiguous slice of the ray axis
        comp, depth, wsum = _shade_chunked(
            field_fn, output_dim, rcfg, origins, dirs, z_vals,
            nse, noise_std)
        if FILL_HOIST:
            comp = _finalize_comp(comp, wsum, rcfg)
        return comp, depth

    ray_spec = P(None, axis)  # (B, R, ...) sharded along rays
    fn = shard_map(
        strip, mesh=mesh,
        in_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec),
    )
    comp, depth = fn(tr.ray_origins, tr.ray_dirs, tr.z_vals, noise)
    c = comp.shape[-1]
    pixels = (comp.reshape(batch_size, h, h, c).transpose(0, 3, 1, 2)
              * 2.0 - 1.0)
    return (pixels, depth.reshape(batch_size, h, h)) if return_depth \
        else pixels


# ---------------------------------------------------------------------------
# Family dispatch: the FiLM-SIREN family (FieldConfig) vs the latent-grid
# family (GridFieldConfig, the reference's second released model). One set of
# entry points serves apps/trainer regardless of family.
# ---------------------------------------------------------------------------

def get_any_config(model: str, **kwargs):
    """FieldConfig or GridFieldConfig by reference model name."""
    from fenerf_tpu.nn import latent_grid_field as lgf

    if lgf.is_grid_model(model):
        return lgf.get_grid_config(model, **kwargs)
    return fields.get_config(model, **kwargs)


def is_grid_config(cfg) -> bool:
    from fenerf_tpu.nn import latent_grid_field as lgf

    return isinstance(cfg, lgf.GridFieldConfig)


def init_any_field(key: jax.Array, cfg) -> Params:
    from fenerf_tpu.nn import latent_grid_field as lgf

    if is_grid_config(cfg):
        return lgf.init_grid_field(key, cfg)
    return fields.init_field(key, cfg)


def render_any(
    params: Params,
    cfg,                       # FieldConfig | GridFieldConfig
    rcfg: RenderConfig,
    key: jax.Array,
    z_geo: jax.Array,
    z_app: jax.Array,
    noise_std: float | jax.Array = 0.0,
    camera: tuple | None = None,
) -> dict[str, jax.Array]:
    """Family-generic z -> image render (the trainer's generator rollout).
    The grid family is single-latent: z_geo drives the StyleGenerator2D and
    z_app is ignored (reference SPATIALSIRENGRID.forward takes one z,
    siren.py:437)."""
    if is_grid_config(cfg):
        return render_grid_from_z(params, cfg, rcfg, key, z_geo, noise_std,
                                  camera)
    film_geo, film_app = fields.field_film(params, cfg, z_geo, z_app)
    return render(params, cfg, rcfg, key, film_geo, film_app,
                  batch_size=z_geo.shape[0], noise_std=noise_std,
                  camera=camera)


def render_from_z(
    params: Params,
    fcfg: fields.FieldConfig,
    rcfg: RenderConfig,
    key: jax.Array,
    z_geo: jax.Array,
    z_app: jax.Array,
    noise_std: float | jax.Array = 0.0,
) -> dict[str, jax.Array]:
    """Reference DoubleImplicitGenerator3d.forward (generators.py:452-527):
    latents -> mapping networks -> render."""
    film_geo, film_app = fields.field_film(params, fcfg, z_geo, z_app)
    return render(
        params, fcfg, rcfg, key, film_geo, film_app,
        batch_size=z_geo.shape[0], noise_std=noise_std,
    )


def render_truncated(
    params: Params,
    fcfg: fields.FieldConfig,
    rcfg: RenderConfig,
    key: jax.Array,
    z_geo: jax.Array,
    z_app: jax.Array,
    avg: tuple[Film, Film],
    psi: float = 0.7,
    noise_std: float | jax.Array = 0.0,
) -> dict[str, jax.Array]:
    """Reference staged_forward truncation path (generators.py:546-646):
    psi-lerp the film activations toward their average before rendering."""
    film_geo, film_app = fields.field_film(params, fcfg, z_geo, z_app)
    film_geo = fields.truncate_film(film_geo, avg[0], psi)
    film_app = fields.truncate_film(film_app, avg[1], psi)
    return render(
        params, fcfg, rcfg, key, film_geo, film_app,
        batch_size=z_geo.shape[0], noise_std=noise_std,
    )


def render_hd(
    params: Params,
    fcfg: fields.FieldConfig,       # an *HD variant (64-ch feature output)
    rcfg: RenderConfig,             # img_size = the FEATURE resolution
    key: jax.Array,
    film_geo: Film,
    film_app: Film,
    batch_size: int,
    nr_img_params,
    nr_img_cfg,
    nr_seg_params=None,
    nr_seg_cfg=None,
    noise_std: float | jax.Array = 0.0,
    camera: tuple | None = None,
) -> dict[str, jax.Array]:
    """StyleGenerator3d path (generators.py:914-1018): volumetric render at
    img_feat_size producing 64-ch feature maps, then neural-renderer
    upsampling to RGB (and, with a seg head, [:, :64] label features through
    their own renderer). Use fill_mode=None — the HD comp is features, not
    semantics+rgb."""
    from fenerf_tpu.nn.neural_renderer import apply_neural_renderer

    out = render(params, fcfg, rcfg, key, film_geo, film_app,
                 batch_size=batch_size, noise_std=noise_std, camera=camera)
    # undo render_core's *2-1 (the reference feeds raw composites to the
    # renderer and only maps the FINAL rgb to [-1, 1], generators.py:1008-1018)
    feats = (out["pixels"] + 1.0) * 0.5
    if nr_seg_params is not None:
        labels, images = feats[:, :64], feats[:, 64:]
        images = apply_neural_renderer(nr_img_params, nr_img_cfg, images)
        labels = apply_neural_renderer(nr_seg_params, nr_seg_cfg, labels)
        pixels = jnp.concatenate([labels, images], axis=1) * 2.0 - 1.0
    else:
        pixels = apply_neural_renderer(nr_img_params, nr_img_cfg,
                                       feats) * 2.0 - 1.0
    return {**out, "pixels": pixels}


# ---------------------------------------------------------------------------
# Shape extraction: evaluate sigma (+labels) on a voxel lattice
# ---------------------------------------------------------------------------

def voxel_points(resolution: int, cube_length: float = 0.3) -> jax.Array:
    """Reference create_samples (extract_double_semantic_shapes.py:13-35):
    a resolution^3 lattice spanning cube_length, centered at the origin.
    Returns (resolution^3, 3) with x fastest (matching the .mrc reshape)."""
    side = jnp.linspace(-0.5, 0.5, resolution) * cube_length
    zz, yy, xx = jnp.meshgrid(side, side, side, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], axis=-1)


def eval_volume(
    params: Params,
    fcfg: fields.FieldConfig,
    film_geo: Film,
    film_app: Film,
    points: jax.Array,          # (N, 3)
    chunk: int = 262144,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Field outputs over a point cloud with a locked view direction
    (0, 0, -1) (reference extract_double_semantic_shapes.py:57-61).
    Returns (N, output_dim)."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    blocks = pts.reshape(-1, chunk, 3)
    # texture table once, outside the chunk loop
    params = fields.with_grid_table(
        params, fcfg,
        (jnp.bfloat16 if compute_dtype == jnp.bfloat16 else None))

    def eval_block(p):
        d = jnp.zeros_like(p).at[..., -1].set(-1.0)
        return fields.apply_field(
            params, fcfg, p[None], d[None], film_geo, film_app,
            compute_dtype=compute_dtype,
        )[0]

    out = jax.lax.map(eval_block, blocks)
    return out.reshape(-1, fcfg.output_dim)[:n]


def eval_volume_sharded(
    params: Params,
    fcfg: fields.FieldConfig,
    film_geo: Film,
    film_app: Film,
    points: jax.Array,          # (N, 3)
    mesh,
    chunk: int = 262144,
    compute_dtype=jnp.float32,
    axis: str = "data",
) -> jax.Array:
    """eval_volume with the point lattice sharded over the mesh — the shape
    extraction analogue of render_image_sharded (a 256^3 sigma volume is 16M
    independent field evaluations; each device takes a contiguous slab).
    Pads to the device count, results concatenate with no collectives beyond
    the output gather. Returns (N, output_dim)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    n = points.shape[0]
    pad = (-n) % (n_dev * chunk) if n > n_dev * chunk else (-n) % n_dev
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    per_dev = pts.shape[0] // n_dev

    def slab(p):
        return eval_volume(params, fcfg, film_geo, film_app, p,
                           chunk=min(chunk, per_dev),
                           compute_dtype=compute_dtype)

    fn = shard_map(slab, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis))
    out = fn(pts)
    return out[:n]


def eval_volume_grid(
    params: Params,
    gcfg,                     # latent_grid_field.GridFieldConfig
    z: jax.Array,             # (1, z_dim)
    points: jax.Array,        # (N, 3)
    chunk: int = 262144,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Latent-grid analogue of eval_volume: sigma(+rgb) on a lattice with a
    locked (0, 0, -1) view direction (reference extract_shapes.py:38-65 run
    against SPATIALSIRENGRID). Returns (N, output_dim)."""
    from fenerf_tpu.nn import latent_grid_field as lgf

    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    blocks = pts.reshape(-1, chunk, 3)
    # StyleGenerator2D plane once, outside the chunk loop
    plane = lgf.compute_plane(params, gcfg, z)

    def eval_block(p):
        d = jnp.zeros_like(p).at[..., -1].set(-1.0)
        return lgf.apply_grid_field(params, gcfg, p[None], d[None], z,
                                    plane=plane,
                                    compute_dtype=compute_dtype)[0]

    out = jax.lax.map(eval_block, blocks)
    return out.reshape(-1, gcfg.output_dim)[:n]


def eval_volume_grid_sharded(
    params: Params,
    gcfg,                     # latent_grid_field.GridFieldConfig
    z: jax.Array,             # (1, z_dim)
    points: jax.Array,        # (N, 3)
    mesh,
    chunk: int = 262144,
    compute_dtype=jnp.float32,
    axis: str = "data",
) -> jax.Array:
    """eval_volume_grid with the lattice sharded over the mesh — the grid
    family's analogue of eval_volume_sharded. The latent plane replicates
    (z-only dependence); each device evaluates a contiguous slab of points.
    Returns (N, output_dim)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    n = points.shape[0]
    pad = (-n) % (n_dev * chunk) if n > n_dev * chunk else (-n) % n_dev
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    per_dev = pts.shape[0] // n_dev

    def slab(p):
        return eval_volume_grid(params, gcfg, z, p,
                                chunk=min(chunk, per_dev),
                                compute_dtype=compute_dtype)

    fn = shard_map(slab, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis))
    return fn(pts)[:n]
