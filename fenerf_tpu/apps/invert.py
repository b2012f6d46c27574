"""GAN inversion (editing entry point): optimize W-space offsets against a
segmentation map (possibly hand-edited) + optional photo + perceptual loss.

Reference: /root/reference/inverse_render_double_semantic.py:
  * targets: 18ch one-hot seg in [-1,1] (mask2labels :81-91), normalized RGB;
    optional background masking (:276-304).
  * init: mean of 10k mapped samples + init_psi * (random sample - mean)
    per branch; zero offsets are the optimized variables (:307-350).
  * loss = lambda_seg*MSE(seg) + lambda_img*MSE(rgb) + lambda_percept*LPIPS
    + lambda_norm*mean(offsets^2)  (:387-404); rendered at image_size with
    hierarchical sampling OFF and annealed W noise 0.03*(N-i)/N (:381-385).
  * optimizer: Adam(1e-2, wd 1e-4) on the offset subset selected by the
    lambdas (seg-only -> geo branch, img-only -> app branch, both -> all);
    StepLR(100, gamma 0.75) (:371-377).
  * mIoU of the 256px hierarchical render vs the 19-class gt every 20 iters
    (:437-448); checkpoint = 8 film tensors (:453-464).

JAX: the whole iteration (render + loss + Adam update) is one jitted step;
the annealed noise scale and lr schedule are traced scalars.
"""
from __future__ import annotations

import argparse
import math
import os


def one_hot_mask(mask_values, n_classes: int, skip_background: bool):
    """Reference mask2labels: 19-class keeps label i -> channel i; 18-class
    drops background (label i+1 -> channel i)."""
    import numpy as np

    m = np.asarray(mask_values).astype(np.int32)
    out = np.zeros((n_classes,) + m.shape, dtype=np.float32)
    for i in range(n_classes):
        out[i][m == (i + 1 if skip_background else i)] = 1.0
    return out


def miou(source_onehot, target_onehot) -> float:
    """Reference mIOU (:123-127): per-class intersection / support union."""
    import numpy as np

    s = np.asarray(source_onehot, dtype=np.float32)
    t = np.asarray(target_onehot, dtype=np.float32)
    inter = (s * t).sum(axis=(-2, -1))
    union = ((s + t) > 0).sum(axis=(-2, -1)).astype(np.float32)
    return float(np.mean(inter / (union + 1e-6)))


def load_targets(image_path, seg_path, image_size, background_mask,
                 white_background_mask=False, center_crop=True):
    """-> (gt_image (1,3,S,S) in [-1,1], gt18 (1,18,S,S) in [-1,1],
    gt19 one-hot (1,19,256,256))."""
    import numpy as np
    from PIL import Image

    img = Image.open(image_path).convert("RGB")
    seg = Image.open(seg_path).convert("L")
    if seg.size != img.size:
        seg = seg.resize(img.size, resample=Image.NEAREST)
    if background_mask or white_background_mask:
        i = np.asarray(img, dtype=np.float32) / 255.0
        m = np.asarray(seg)
        i[m == 0] = 1.0 if white_background_mask else 0.0
        img = Image.fromarray((i * 255).astype(np.uint8))

    def prep(pil, size, nearest=False):
        if center_crop:
            # short side -> 320, center crop 256 (the dataset geometry,
            # reference transform_img, inverse_render...py:177-218)
            from fenerf_tpu.data.celeba_mask import _prep

            return _prep(pil, size, nearest)
        return pil.resize(
            (size, size), Image.NEAREST if nearest else Image.BILINEAR)

    gt_img = np.asarray(prep(img, image_size), dtype=np.float32) / 255.0
    gt_img = (gt_img.transpose(2, 0, 1)[None] - 0.5) / 0.5
    seg_small = np.asarray(prep(seg, image_size, nearest=True))
    gt18 = (one_hot_mask(seg_small, 18, True)[None] - 0.5) / 0.5
    seg_256 = np.asarray(prep(seg, 256, nearest=True))
    gt19 = one_hot_mask(seg_256, 19, False)[None]
    return gt_img, gt18, gt19


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("name")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--image_path", required=True)
    p.add_argument("--seg_path", required=True)
    p.add_argument("--save_dir", default="inversion")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--iterations", type=int, default=1000)
    p.add_argument("--lambda_seg", type=float, default=0.0)
    p.add_argument("--lambda_img", type=float, default=0.0)
    p.add_argument("--lambda_percept", type=float, default=0.0)
    p.add_argument("--lambda_norm", type=float, default=1.0)
    p.add_argument("--init_psi", type=float, default=0.0)
    p.add_argument("--init_seed", type=int, default=0)
    p.add_argument("--background_mask", action="store_true")
    p.add_argument("--white_background_mask", action="store_true")
    p.add_argument("--lock_view_dependence", action="store_true")
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_ema", dest="use_ema", action="store_false")
    p.add_argument("--eval_every", type=int, default=20)
    p.add_argument("--num_steps", type=int, default=24)
    p.add_argument("--load_offsets", default=None,
                   help="warm-start from a prior freq_phase_offset_*.npz: "
                        "its offsets fold into the W base and optimization "
                        "resumes from zero offsets (reference load_checkpoint"
                        ", inverse_render_double_semantic.py:352-361) — "
                        "iterate on an edited mask without re-paying the "
                        "full run")
    p.add_argument("--allow_no_lpips", action="store_true",
                   help="permit --lambda_percept > 0 without LPIPS weights "
                        "(the perceptual term is then silently dropped)")
    p.add_argument("--render_video", action="store_true",
                   help="render the reconstruction trajectory video after "
                        "optimization (reference run_render_recon_video)")
    p.add_argument("--trajectory", default="front")
    p.add_argument("--num_frames", type=int, default=36)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fenerf_tpu.apps.common import load_generator
    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields

    params, ema, _, fcfg, _cfg = load_generator(args.ckpt)
    if _cfg.get("family", "film") == "grid":
        # the reference defines W-space inversion only for the film family
        # (freq/phase offsets, inverse_render_double_semantic.py:307-350);
        # the grid field's film is per-point, so there is no W to offset
        raise SystemExit("inversion requires a film-family checkpoint "
                         "(the latent-grid family has no W-space)")
    if args.use_ema:
        params = ema
    os.makedirs(args.save_dir, exist_ok=True)

    gt_img, gt18, gt19 = load_targets(
        args.image_path, args.seg_path, args.image_size,
        args.background_mask, args.white_background_mask)
    gt_img = jnp.asarray(gt_img)
    gt18 = jnp.asarray(gt18)

    # ---- W init: 10k-sample mean +- init_psi toward one random draw ----
    key = jax.random.key(args.init_seed)
    k_avg, k_rand = jax.random.split(key)
    avg_geo, avg_app = fields.avg_film(params, fcfg, k_avg, n=10000)
    kg, ka = jax.random.split(k_rand)
    rand_geo, rand_app = fields.field_film(
        params, fcfg,
        jax.random.normal(kg, (1, fcfg.z_geo_dim)),
        jax.random.normal(ka, (1, fcfg.z_app_dim)))
    w = {
        "geo": fields.truncate_film(rand_geo, avg_geo, args.init_psi),
        "app": fields.truncate_film(rand_app, avg_app, args.init_psi),
    }
    if args.load_offsets:
        # warm start: prior W + prior offsets become the new base
        # (reference folds meta offsets into w, inverse_render...py:352-361);
        # the freq_*/phase_* entries already carry w + offsets
        with np.load(args.load_offsets) as prior:
            w = {
                "geo": (jnp.asarray(prior["freq_geo"]),
                        jnp.asarray(prior["phase_geo"])),
                "app": (jnp.asarray(prior["freq_app"]),
                        jnp.asarray(prior["phase_app"])),
            }
        print(f"warm start from {args.load_offsets}")
    offsets = jax.tree.map(jnp.zeros_like, w)

    # offset subset: seg-only optimizes geo, img-only optimizes app
    opt_geo = args.lambda_img == 0 or (args.lambda_seg > 0)
    opt_app = args.lambda_seg == 0 or (args.lambda_img > 0)
    mask = {
        "geo": jax.tree.map(lambda _: float(opt_geo), offsets["geo"]),
        "app": jax.tree.map(lambda _: float(opt_app), offsets["app"]),
    }

    lr = optax.exponential_decay(1e-2, 100, 0.75, staircase=True)
    tx = optax.chain(
        optax.add_decayed_weights(1e-4),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(lr),
    )
    opt_state = tx.init(offsets)

    from fenerf_tpu.apps.common import best_backend

    rcfg = gen.RenderConfig(
        img_size=args.image_size, num_steps=args.num_steps,
        hierarchical=False, h_stddev=0.0, v_stddev=0.0, sample_dist=None,
        lock_view_dependence=args.lock_view_dependence,
        backend=best_backend(fcfg, train=True),
    )
    eval_rcfg = gen.RenderConfig(
        img_size=256, num_steps=48, hierarchical=True, h_stddev=0.0,
        v_stddev=0.0, sample_dist=None,
        lock_view_dependence=args.lock_view_dependence,
        fill_mode="eval_seg_padding_background", ray_chunk=8192,
        backend=best_backend(fcfg),
    )

    percept = None
    if args.lambda_percept > 0:
        from fenerf_tpu.eval.lpips import load_lpips
        percept = load_lpips()
        if percept is None:
            # silently optimizing a DIFFERENT objective than requested is
            # worse than failing; --allow_no_lpips is the explicit opt-out
            msg = ("--lambda_percept > 0 but no LPIPS weights are available "
                   "($FENERF_LPIPS_WEIGHTS; see fenerf_tpu/eval/lpips.py)")
            if not args.allow_no_lpips:
                raise SystemExit(msg + " — pass --allow_no_lpips to proceed "
                                       "without the perceptual term")
            print(f"WARNING: {msg}; term dropped (--allow_no_lpips)")

    def loss_fn(offsets, noise, key):
        fg = tuple(w_ + n_ + o_ for w_, n_, o_ in
                   zip(w["geo"], noise["geo"], offsets["geo"]))
        fa = tuple(w_ + n_ + o_ for w_, n_, o_ in
                   zip(w["app"], noise["app"], offsets["app"]))
        out = gen.render(params, fcfg, rcfg, key, fg, fa, batch_size=1,
                         noise_std=0.0)
        frame = out["pixels"]
        seg_loss = jnp.mean((frame[:, :-3] - gt18) ** 2)
        img_loss = jnp.mean((frame[:, -3:] - gt_img) ** 2)
        loss = args.lambda_seg * seg_loss + args.lambda_img * img_loss
        if percept is not None:
            loss = loss + args.lambda_percept * percept(frame[:, -3:], gt_img)
        norm_loss = sum(jnp.mean(o ** 2)
                        for br in offsets.values() for o in br)
        loss = loss + args.lambda_norm * norm_loss
        return loss, (seg_loss, img_loss)

    @jax.jit
    def step(offsets, opt_state, key, noise_scale):
        k_n, k_r = jax.random.split(key)
        leaves, treedef = jax.tree.flatten(w)
        nkeys = jax.random.split(k_n, len(leaves))
        noise = jax.tree.unflatten(treedef, [
            jax.random.normal(k, x.shape) * noise_scale
            for k, x in zip(nkeys, leaves)
        ])
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            offsets, noise, k_r)
        grads = jax.tree.map(jnp.multiply, grads, mask)
        updates, opt_state = tx.update(grads, opt_state, offsets)
        offsets = optax.apply_updates(offsets, updates)
        return offsets, opt_state, loss, aux

    @jax.jit
    def eval_render(offsets):
        fg = tuple(a + b for a, b in zip(w["geo"], offsets["geo"]))
        fa = tuple(a + b for a, b in zip(w["app"], offsets["app"]))
        return gen.render(params, fcfg, eval_rcfg, jax.random.key(0),
                          fg, fa, batch_size=1, noise_std=0.0)["pixels"]

    mious = []
    for i in range(args.iterations):
        noise_scale = 0.03 * (args.iterations - i) / args.iterations
        offsets, opt_state, loss, (seg_l, img_l) = step(
            offsets, opt_state, jax.random.fold_in(key, i),
            jnp.asarray(noise_scale))
        if i % args.eval_every == 0:
            pix = np.asarray(eval_render(offsets))
            gen_mask = np.argmax(pix[:, :-3], axis=1)[0]
            gen19 = one_hot_mask(gen_mask, 19, False)[None]
            m = miou(gen19, gt19)
            mious.append(m)
            print(f"iter {i}: loss={float(loss):.4f} seg={float(seg_l):.4f} "
                  f"img={float(img_l):.4f} mIoU={m:.4f}")

    out_path = os.path.join(args.save_dir, f"freq_phase_offset_{args.name}.npz")
    np.savez(
        out_path,
        freq_geo=np.asarray(w["geo"][0] + offsets["geo"][0]),
        phase_geo=np.asarray(w["geo"][1] + offsets["geo"][1]),
        freq_app=np.asarray(w["app"][0] + offsets["app"][0]),
        phase_app=np.asarray(w["app"][1] + offsets["app"][1]),
        w_freq_geo=np.asarray(w["geo"][0]),
        w_phase_geo=np.asarray(w["geo"][1]),
        w_freq_app=np.asarray(w["app"][0]),
        w_phase_app=np.asarray(w["app"][1]),
        offset_freq_geo=np.asarray(offsets["geo"][0]),
        offset_phase_geo=np.asarray(offsets["geo"][1]),
        offset_freq_app=np.asarray(offsets["app"][0]),
        offset_phase_app=np.asarray(offsets["app"][1]),
    )
    np.save(os.path.join(args.save_dir, "mious.npy"), np.asarray(mious))
    try:  # mIoU-vs-iteration figure (reference tools.py:636 plot_miou)
        from fenerf_tpu.utils.plots import plot_miou

        plot_miou(args.save_dir, log_every=20)
    except ImportError:
        pass  # matplotlib absent: the .npy still carries the trace
    print(f"saved {out_path}")

    if args.render_video:
        # reconstruction video: [rgb | colorized seg | 50/50 blend] triptych
        # (reference run_render_recon_video, inverse_render...py:471-507)
        from fenerf_tpu.apps.common import camera_trajectory
        from fenerf_tpu.utils.image import (mask2color, to_uint8, write_mp4)

        fg = tuple(a + b for a, b in zip(w["geo"], offsets["geo"]))
        fa = tuple(a + b for a, b in zip(w["app"], offsets["app"]))

        @jax.jit
        def render_frame(camera):
            return gen.render(params, fcfg, eval_rcfg, jax.random.key(0),
                              fg, fa, batch_size=1, noise_std=0.0,
                              camera=camera)["pixels"]

        frames = []
        for t, pitch, yaw, fov in camera_trajectory(
                args.trajectory, args.num_frames, 12.0):
            pix = np.asarray(render_frame(
                (jnp.asarray(pitch), jnp.asarray(yaw), jnp.asarray(fov))))[0]
            rgb = to_uint8(pix[-3:], normalize=False).transpose(1, 2, 0)
            seg = mask2color(pix[None, :-3])[0]
            blend = (0.5 * rgb + 0.5 * seg).astype(np.uint8)
            frames.append(np.concatenate([rgb, seg, blend], axis=1))
        mp4 = os.path.join(args.save_dir, f"recon_{args.name}.mp4")
        write_mp4(mp4, frames, fps=12)
        print(f"wrote {mp4}")
    return out_path


if __name__ == "__main__":
    main()
