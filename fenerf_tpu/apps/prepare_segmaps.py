"""Pseudo-label face images with CelebA-style parsing maps (data prep).

Reference: /root/reference/prepare_segmaps.py — BiSeNet(20) predicts parsing
for FFHQ-style images; labels are remapped to the CelebAHQ 19-class scheme
and written next to the images for training.

Requires the pretrained parsing weights: point --weights at the reference's
segNet-20Class.pth (torch state_dict); it is converted on the fly by
bisenet_from_torch. Without weights this CLI exits with instructions —
the weights are not distributable inside this container.
"""
from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True, help="glob of input images")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--weights", required=True,
                   help="path to segNet-20Class.pth (torch state_dict)")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--colorize", action="store_true",
                   help="also write palette-colorized previews")
    args = p.parse_args(argv)

    if not os.path.exists(args.weights):
        raise SystemExit(
            f"parsing weights not found at {args.weights}; obtain "
            "segNet-20Class.pth from the FENeRF release (README.md) — "
            "this container has no network access.")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    from PIL import Image

    from fenerf_tpu.nn.bisenet import (bisenet_apply, bisenet_from_torch,
                                       remap_labels)
    from fenerf_tpu.utils.image import save_png
    from fenerf_tpu.utils.mask_tools import colorize

    sd = torch.load(args.weights, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = bisenet_from_torch(sd)
    os.makedirs(args.output_dir, exist_ok=True)

    @jax.jit
    def parse(x):
        return jnp.argmax(bisenet_apply(params, x), axis=1)

    files = sorted(glob.glob(args.images))
    for f in files:
        img = Image.open(f).convert("RGB").resize((args.size, args.size),
                                                  Image.BILINEAR)
        x = np.asarray(img, np.float32) / 255.0
        x = (x.transpose(2, 0, 1)[None] - 0.5) / 0.5
        seg = np.asarray(parse(jnp.asarray(x)))[0].astype(np.uint8)
        seg = remap_labels(seg)
        stem = os.path.splitext(os.path.basename(f))[0]
        Image.fromarray(seg, mode="L").save(
            os.path.join(args.output_dir, f"{stem}.png"))
        if args.colorize:
            save_png(os.path.join(args.output_dir, f"{stem}_color.png"),
                     colorize(seg))
    print(f"parsed {len(files)} images -> {args.output_dir}")


if __name__ == "__main__":
    main()
