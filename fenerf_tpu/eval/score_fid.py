"""Standalone FID scorer — the TPU-host scoring mode.

The reference scores FID in the rank-0 trainer process on the GPU
(fid_evaluation.py:155-162). On TPU pods the natural equivalent is scoring
on the host's chip; but a trainer process that was forced onto CPU (the
2-host CPU rehearsal, or a dedicated eval host) cannot re-initialize JAX on
another platform in-process. This module is the seam: a fresh
`python -m fenerf_tpu.eval.score_fid` subprocess picks up the host's default
platform (the TPU where one exists) and prints ONE JSON line
{"fid": .., "images": .., "score_s": .., "platform": ..}.

The trainer invokes it when FENERF_FID_SCORER=subprocess (apps/train.py);
FENERF_FID_SCORER_PLATFORM pins the subprocess platform (e.g. "cpu" for
deterministic CI). Measured motivation: CPU InceptionV3 scoring runs
~0.44 s/image (42.6 s / 96 images, round-4 rehearsal) — >1 h at the
protocol's 10,048 images, which blows the 20-minute production barrier
default; the chip runs the same jitted inception_pool3 orders of magnitude
faster (PROFILE_INCEPTION.json).
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--real", required=True)
    p.add_argument("--gen", required=True)
    p.add_argument("--weights", default=None,
                   help="inception .npz (default: $FENERF_INCEPTION_WEIGHTS)")
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args(argv)

    import glob
    import os

    import jax

    # the ambient TPU-tunnel sitecustomize pins JAX_PLATFORMS after the
    # shell env is applied (see apps/train.py) — honor the explicit force
    forced = os.environ.get("FENERF_FORCE_PLATFORM")
    if forced:
        jax.config.update("jax_platforms", forced)

    from fenerf_tpu.eval import fid as fidlib

    n = (len(glob.glob(os.path.join(args.real, "*.png")))
         + len(glob.glob(os.path.join(args.gen, "*.png"))))
    t0 = time.perf_counter()
    fid = fidlib.calculate_fid(
        args.real, args.gen,
        feature_fn=fidlib.inception_features(args.weights),
        batch_size=args.batch)
    out = {"fid": fid, "images": n,
           "score_s": round(time.perf_counter() - t0, 1),
           "platform": jax.default_backend()}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
