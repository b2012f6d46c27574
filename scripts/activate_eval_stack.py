r"""One-command activation of the weights-gated evaluation stack.

The container has zero egress, so three reference-comparable features are
gated on weight files (README "Feature gates"). The moment the files exist,
this script converts and verifies everything in one run:

  python scripts/activate_eval_stack.py \
      --inception pt_inception-2015-12-05-6726825d.pth \   # pytorch-fid
      --lpips lpips_vgg.pth \                              # lpips VGG weights
      --bisenet segNet-20Class.pth                         # FENeRF release

Each section is independent — pass only what you have. Outputs:
  weights/inception.npz  + sets-up $FENERF_INCEPTION_WEIGHTS -> real FID/KID
  weights/lpips_vgg.npz  + $FENERF_LPIPS_WEIGHTS            -> LPIPS in invert
  (bisenet stays .pth; apps/prepare_segmaps.py takes --weights directly)

Two more gates close the remaining north stars in the same command:
  --released generator.pth   released-checkpoint chain: convert (+ sibling
                             ema.pth) -> field parity vs the unpickled torch
                             module -> render_multiview smoke
  --fid_smoke_reals '<glob>' 64-image real-FID through the activated
                             InceptionV3 against --released/--ckpt samples

Every gate prints PASS/FAIL and the process exits nonzero on any failure, so
the day the gated files appear, full verification is ONE command:
  python scripts/activate_eval_stack.py --inception pt_inception....pth \
      --lpips lpips_vgg.pth --bisenet segNet-20Class.pth \
      --released pretrained/generator.pth \
      --fid_smoke_reals 'data/celebahq_mask/*img*/*.jpg'

After activation, the north-star FID run is:
  python -m fenerf_tpu.apps.train --curriculum \
      CelebA_double_semantic_texture_embedding_256_dim_96 \
      --data_root <celebahq_mask root> --eval_freq 5000
(FID protocol: 2048 EMA samples @128px vs 8000 reals — eval/fid.py.)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def activate_inception(pth: str, out_dir: str) -> str:
    import torch

    from fenerf_tpu.nn.inception import export_npz, load_npz, inception_pool3

    sd = torch.load(pth, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = os.path.join(out_dir, "inception.npz")
    export_npz(sd, out)
    # verify: forward through the loaded arch
    import numpy as np

    params = load_npz(out)
    feats = inception_pool3(params, np.zeros((1, 64, 64, 3), np.float32))
    assert feats.shape == (1, 2048) and np.isfinite(np.asarray(feats)).all()
    print(f"[inception] {out} OK — export FENERF_INCEPTION_WEIGHTS={out}")
    return out


def activate_lpips(pth: str, out_dir: str) -> str:
    import numpy as np
    import torch

    from fenerf_tpu.eval.lpips import convert_torch_lpips, load_lpips

    obj = torch.load(pth, map_location="cpu", weights_only=False)
    out = os.path.join(out_dir, "lpips_vgg.npz")
    if hasattr(obj, "state_dict"):
        convert_torch_lpips(obj, out)  # a torch lpips.LPIPS module pickle
    else:
        # a bare state_dict: wrap it for the converter
        class _Shim:
            def __init__(self, sd):
                self._sd = sd

            def state_dict(self):
                return self._sd

        convert_torch_lpips(_Shim(obj), out)
    fn = load_lpips(out)
    a = np.zeros((1, 3, 64, 64), np.float32)
    b = np.ones((1, 3, 64, 64), np.float32)
    d_same = float(fn(a, a))
    d_diff = float(fn(a, b))
    assert d_same < 1e-5 < d_diff
    print(f"[lpips] {out} OK (d(a,a)={d_same:.2e}, d(a,b)={d_diff:.3f}) — "
          f"export FENERF_LPIPS_WEIGHTS={out}")
    return out


def activate_bisenet(pth: str) -> None:
    import numpy as np
    import torch

    from fenerf_tpu.nn.bisenet import bisenet_apply, bisenet_from_torch

    sd = torch.load(pth, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = bisenet_from_torch(sd)
    logits = bisenet_apply(params, np.zeros((1, 3, 64, 64), np.float32))
    assert np.isfinite(np.asarray(logits)).all()
    print(f"[bisenet] {pth} OK — run: python -m fenerf_tpu.apps."
          f"prepare_segmaps --weights {pth} ...")


def activate_released(gen_pth: str, out_dir: str, model: str = "auto",
                      reference: str = "/root/reference") -> tuple[str, float]:
    """Released-checkpoint gate (driver north star: pixel-faithful renders
    vs the released .pth files, reference README.md:72-74).

    Runs the exact user chain — generator.pth + sibling ema.pth ->
    convert_checkpoint -> render_multiview — and, because unpickling the
    whole-module checkpoint already requires the reference package, ALSO
    field-forward-compares the converted EMA weights against the unpickled
    torch module (post ema.copy_to, matching
    render_multiview_images_double_semantic.py:58-66). Returns
    (npz_path, max_abs_field_delta)."""
    import numpy as np

    from fenerf_tpu.apps.convert_checkpoint import main as convert

    npz = os.path.join(out_dir, "released_generator.npz")
    convert(["--generator", gen_pth, "--out", npz, "--model", model,
             "--reference", reference])

    sys.path.insert(0, reference)
    import jax.numpy as jnp
    import torch

    from fenerf_tpu.apps.common import load_generator
    from fenerf_tpu.compat import reference_shim

    reference_shim.import_reference_generators()
    gen_module = torch.load(gen_pth, map_location="cpu", weights_only=False)
    ema_pth = os.path.join(os.path.dirname(gen_pth), "ema.pth")
    has_ema = os.path.exists(ema_pth)
    if has_ema:
        ema_obj = torch.load(ema_pth, map_location="cpu", weights_only=False)
        if hasattr(ema_obj, "copy_to"):
            ema_obj.copy_to(gen_module.parameters())
    siren = gen_module.siren if hasattr(gen_module, "siren") else gen_module
    siren.eval()

    params, ema_p, _, cfg, config = load_generator(npz)
    use = ema_p if has_ema else params
    rng = np.random.RandomState(0)
    pts = rng.randn(1, 64, 3).astype(np.float32) * 0.1
    dirs = rng.randn(1, 64, 3).astype(np.float32)
    with torch.no_grad():
        if config.get("family") == "grid":
            from fenerf_tpu.nn import latent_grid_field as lgf

            z = rng.randn(1, cfg.z_dim).astype(np.float32)
            ref = siren(torch.tensor(pts), torch.tensor(z),
                        torch.tensor(dirs)).numpy()
            ours = lgf.apply_grid_field(use, cfg, jnp.asarray(pts),
                                        jnp.asarray(dirs), jnp.asarray(z))
        else:
            from fenerf_tpu.nn import fields

            zg = rng.randn(1, cfg.z_geo_dim).astype(np.float32)
            za = rng.randn(1, cfg.z_app_dim).astype(np.float32)
            if getattr(cfg, "single_latent", False):
                ref = siren(torch.tensor(pts), torch.tensor(zg),
                            ray_directions=torch.tensor(dirs)).numpy()
            else:
                ref = siren(torch.tensor(pts), torch.tensor(zg),
                            torch.tensor(za),
                            ray_directions=torch.tensor(dirs)).numpy()
            fg, fa = fields.field_film(use, cfg, jnp.asarray(zg),
                                       jnp.asarray(za))
            ours = fields.apply_field(use, cfg, jnp.asarray(pts),
                                      jnp.asarray(dirs), fg, fa)
    delta = float(np.abs(np.asarray(ours) - ref).max())

    # the documented render command must run end-to-end on the conversion
    from fenerf_tpu.apps.render_multiview import main as render

    mv = os.path.join(out_dir, "released_mv")
    render(["--ckpt", npz, "--seeds", "0", "--output_dir", mv,
            "--image_size", "64", "--num_steps", "12",
            "--ray_step_multiplier", "1", "--ray_chunk", "0"])
    assert os.path.exists(os.path.join(mv, "img_0.png"))
    assert delta < 2e-3, (
        f"converted field deviates from the torch module by {delta:.2e} — "
        "conversion is NOT pixel-faithful")
    print(f"[released] {npz} OK (field max|Δ| vs torch module {delta:.2e}; "
          f"render grid at {mv}/img_0.png)")
    return npz, delta


def fid_smoke(inception_npz: str, ckpt_npz: str, reals_glob: str,
              out_dir: str, n: int = 64, img_size: int = 128,
              num_steps: int = 12) -> float:
    """Real-FID smoke gate: n reals (resized to the FID protocol's 128px) vs
    n EMA samples through the REAL InceptionV3 features — the scaled-down
    version of the reference protocol (fid_evaluation.py:78-162, 8000/2048)
    that proves the full stack end-to-end the day the weight files land."""
    import glob as globlib

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from fenerf_tpu.apps.common import best_backend, load_generator
    from fenerf_tpu.eval import fid as fidlib
    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields

    real_dir = os.path.join(out_dir, "fid_smoke_real")
    gen_dir = os.path.join(out_dir, "fid_smoke_gen")
    os.makedirs(real_dir, exist_ok=True)
    files = sorted(globlib.glob(reals_glob))[:n]
    assert len(files) >= 2, f"need >=2 reals at {reals_glob}, found {len(files)}"
    for i, f in enumerate(files):
        Image.open(f).convert("RGB").resize(
            (img_size, img_size), Image.BILINEAR).save(
            os.path.join(real_dir, f"{i:06d}.png"))

    params, ema, _, cfg, config = load_generator(ckpt_npz)
    rcfg = gen.RenderConfig(
        img_size=img_size, num_steps=num_steps, hierarchical=True,
        fill_mode=None, ray_chunk=4096, compute_dtype="bfloat16",
        backend=best_backend(cfg))
    is_grid = config.get("family") == "grid"
    if not is_grid:
        avg = fields.avg_film(ema, cfg, jax.random.key(42))

    @jax.jit
    def render_batch(k, zg, za):
        if is_grid:
            out = gen.render_grid_from_z(ema, cfg, rcfg, k, zg,
                                         noise_std=0.0)
        else:
            out = gen.render_truncated(ema, cfg, rcfg, k, zg, za, avg,
                                       psi=1.0, noise_std=0.0)
        return out["pixels"][:, -3:]

    def render_fn(k, nb):
        kg, ka = jax.random.split(k)
        zg = jax.random.normal(kg, (nb, cfg.z_geo_dim))
        za = jax.random.normal(ka, (nb, cfg.z_app_dim))
        return render_batch(k, zg, za)

    fidlib.output_images(render_fn, gen_dir, num_eval=len(files),
                         batch_size=min(16, len(files)))
    fid = fidlib.calculate_fid(
        real_dir, gen_dir,
        feature_fn=fidlib.inception_features(inception_npz))
    assert np.isfinite(fid), fid
    print(f"[fid_smoke] FID({len(files)} reals vs {len(files)} fakes "
          f"@{img_size}px, real InceptionV3) = {fid:.3f} OK")
    return fid


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inception", default=None)
    p.add_argument("--lpips", default=None)
    p.add_argument("--bisenet", default=None)
    p.add_argument("--released", default=None,
                   help="released generator.pth (whole-module pickle; "
                        "sibling ema.pth picked up by path convention): "
                        "convert -> field parity vs the torch module -> "
                        "render_multiview")
    p.add_argument("--reference", default="/root/reference",
                   help="reference repo root (needed to unpickle --released)")
    p.add_argument("--fid_smoke_reals", default=None,
                   help="glob of real images: run a 64-image real-FID smoke "
                        "through the activated InceptionV3 (requires "
                        "--inception or $FENERF_INCEPTION_WEIGHTS, plus "
                        "--released or --ckpt)")
    p.add_argument("--ckpt", default=None,
                   help="a fenerf_tpu .npz generator for --fid_smoke_reals "
                        "when no --released pickle is given")
    p.add_argument("--fid_smoke_n", type=int, default=64)
    p.add_argument("--out_dir", default=os.path.join(REPO, "weights"))
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    gates: dict[str, str] = {}

    def run_gate(name, fn, *a, **kw):
        try:
            fn(*a, **kw)
            gates[name] = "PASS"
        except Exception as e:
            gates[name] = f"FAIL: {type(e).__name__}: {e}"

    env = {}
    if args.inception:
        run_gate("inception", lambda: env.__setitem__(
            "FENERF_INCEPTION_WEIGHTS",
            activate_inception(args.inception, args.out_dir)))
    if args.lpips:
        run_gate("lpips", lambda: env.__setitem__(
            "FENERF_LPIPS_WEIGHTS",
            activate_lpips(args.lpips, args.out_dir)))
    if args.bisenet:
        run_gate("bisenet", activate_bisenet, args.bisenet)
    released_npz = None
    if args.released:
        def _rel():
            nonlocal released_npz
            released_npz, _ = activate_released(
                args.released, args.out_dir, reference=args.reference)
        run_gate("released", _rel)
    if args.fid_smoke_reals:
        inc = env.get("FENERF_INCEPTION_WEIGHTS",
                      os.environ.get("FENERF_INCEPTION_WEIGHTS"))
        ck = released_npz or args.ckpt
        if not inc:
            gates["fid_smoke"] = ("FAIL: no InceptionV3 weights (pass "
                                  "--inception or set "
                                  "$FENERF_INCEPTION_WEIGHTS)")
        elif not ck:
            gates["fid_smoke"] = "FAIL: no checkpoint (--released or --ckpt)"
        else:
            run_gate("fid_smoke", fid_smoke, inc, ck, args.fid_smoke_reals,
                     args.out_dir, n=args.fid_smoke_n)
    if not gates:
        p.error("pass at least one of --inception/--lpips/--bisenet/"
                "--released/--fid_smoke_reals")
    if env:
        envfile = os.path.join(args.out_dir, "env.sh")
        with open(envfile, "w") as f:
            for k, v in env.items():
                f.write(f"export {k}={v}\n")
        print(f"wrote {envfile}; `source` it before training/eval")
    for name, status in gates.items():
        print(f"[gate] {name}: {status}")
    print(json.dumps({"gates": gates}))
    if any(v != "PASS" for v in gates.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
