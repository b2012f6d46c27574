"""Quality metrics CLI: FID / KID / IS between image directories.

Reference: /root/reference/eval_metrics.py (torch-fidelity over a generated
dir vs real dir at 128px). The metric math is native (eval/fid.py,
eval/metrics.py); the Inception feature extractor is weights-gated
($FENERF_INCEPTION_WEIGHTS) — without it, pass --feature_extractor stub for a
pipeline check, or point at any .npz feature file.
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--real_dir", required=True)
    p.add_argument("--gen_dir", required=True)
    p.add_argument("--metrics", nargs="+", default=["fid", "kid"],
                   choices=["fid", "kid", "isc"])
    p.add_argument("--feature_extractor", default="inception",
                   choices=["inception", "stub"],
                   help="stub = raw downsampled pixels (pipeline checks only)")
    p.add_argument("--kid_subsets", type=int, default=100)
    p.add_argument("--kid_subset_size", type=int, default=1000)
    args = p.parse_args(argv)

    import numpy as np

    from fenerf_tpu.eval import fid as fidlib
    from fenerf_tpu.eval import metrics as M

    if args.feature_extractor == "inception":
        feature_fn = fidlib.inception_features()
    else:
        def feature_fn(imgs):
            x = imgs[:, ::8, ::8, :]
            return x.reshape(x.shape[0], -1)

    feats = {}
    for name, d in (("real", args.real_dir), ("gen", args.gen_dir)):
        imgs = fidlib._load_images(d)
        feats[name] = np.concatenate([
            np.asarray(feature_fn(imgs[i:i + 64]))
            for i in range(0, len(imgs), 64)])

    out = {}
    if "fid" in args.metrics:
        out["fid"] = fidlib.fid_from_features(feats["real"], feats["gen"])
    if "kid" in args.metrics:
        mean, std = M.kid(feats["real"], feats["gen"],
                          n_subsets=args.kid_subsets,
                          subset_size=args.kid_subset_size)
        out["kid_mean"], out["kid_std"] = mean, std
    if "isc" in args.metrics:
        mean, std = M.inception_score(feats["gen"])
        out["isc_mean"], out["isc_std"] = mean, std
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
