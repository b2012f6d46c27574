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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inception", default=None)
    p.add_argument("--lpips", default=None)
    p.add_argument("--bisenet", default=None)
    p.add_argument("--out_dir", default=os.path.join(REPO, "weights"))
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    env = {}
    if args.inception:
        env["FENERF_INCEPTION_WEIGHTS"] = activate_inception(
            args.inception, args.out_dir)
    if args.lpips:
        env["FENERF_LPIPS_WEIGHTS"] = activate_lpips(args.lpips, args.out_dir)
    if args.bisenet:
        activate_bisenet(args.bisenet)
    if not any([args.inception, args.lpips, args.bisenet]):
        p.error("pass at least one of --inception/--lpips/--bisenet")
    if env:
        envfile = os.path.join(args.out_dir, "env.sh")
        with open(envfile, "w") as f:
            for k, v in env.items():
                f.write(f"export {k}={v}\n")
        print(f"wrote {envfile}; `source` it before training/eval")
    print(json.dumps({"activated": list(env) + (
        ["bisenet"] if args.bisenet else [])}))


if __name__ == "__main__":
    main()
