"""FID evaluation protocol (reference fid_evaluation.py:78-162).

Protocol: dump `num_real` real images once (setup_evaluation, 8000 @
target_size); every eval_freq steps generate `num_eval` EMA samples
(output_images, 2048 @ 128px); compute Frechet distance between feature
gaussians (calculate_fid).

The feature extractor is pluggable: pytorch-fid's InceptionV3 does not exist
in this container (zero egress), so `inception_features` loads weights from
$FENERF_INCEPTION_WEIGHTS when available; the Frechet math, image plumbing,
and protocol are fully implemented and tested with a stub extractor.
"""
from __future__ import annotations

import glob
import os

import numpy as np

WEIGHTS_ENV = "FENERF_INCEPTION_WEIGHTS"


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two gaussians; covariance sqrt via scipy sqrtm."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def feature_statistics(features: np.ndarray):
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def fid_from_features(f1: np.ndarray, f2: np.ndarray) -> float:
    return frechet_distance(*feature_statistics(f1), *feature_statistics(f2))


# ---------------------------------------------------------------------------
# Protocol
# ---------------------------------------------------------------------------

def setup_evaluation(dataset, real_dir: str, target_size: int = 128,
                     num_real: int = 8000) -> None:
    """Dump real images once (reference setup_evaluation :78-95)."""
    from PIL import Image

    if os.path.exists(real_dir) and len(os.listdir(real_dir)) >= min(
            num_real, len(dataset)):
        return
    os.makedirs(real_dir, exist_ok=True)
    n = min(num_real, len(dataset))
    for i in range(n):
        img, _ = dataset.__getitem__(i)
        arr = np.clip((img.transpose(1, 2, 0) + 1) * 127.5 + 0.5, 0, 255)
        pil = Image.fromarray(arr.astype(np.uint8))
        if pil.size != (target_size, target_size):
            pil = pil.resize((target_size, target_size), Image.BILINEAR)
        pil.save(os.path.join(real_dir, f"{i:06d}.png"))


def output_images(render_fn, gen_dir: str, num_eval: int = 2048,
                  batch_size: int = 16, host_index: int = 0,
                  n_hosts: int = 1, seed: int = 0) -> None:
    """Generate EMA samples round-robin across hosts (reference
    output_images_double :126-152). render_fn(key, n) -> (n, 3, H, W)."""
    import jax

    from PIL import Image

    os.makedirs(gen_dir, exist_ok=True)
    idx = 0
    batch_id = 0
    while idx < num_eval:
        if batch_id % n_hosts == host_index:
            imgs = np.asarray(render_fn(
                jax.random.fold_in(jax.random.key(seed), batch_id),
                batch_size))
            for j in range(min(batch_size, num_eval - idx)):
                arr = np.clip((imgs[j].transpose(1, 2, 0) + 1) * 127.5 + 0.5,
                              0, 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(gen_dir, f"{idx + j:06d}.png"))
        idx += batch_size
        batch_id += 1


def _load_images(d: str, limit: int | None = None) -> np.ndarray:
    from PIL import Image

    files = sorted(glob.glob(os.path.join(d, "*.png")))[:limit]
    assert files, f"no images in {d}"
    return np.stack([np.asarray(Image.open(f).convert("RGB"), dtype=np.float32)
                     / 255.0 for f in files])


def calculate_fid(real_dir: str, gen_dir: str, feature_fn=None,
                  batch_size: int = 64) -> float:
    """Frechet distance between directories of images (reference
    calculate_fid :155-162). feature_fn(images NHWC [0,1]) -> (N, D);
    defaults to InceptionV3 (weights-gated)."""
    feature_fn = feature_fn or inception_features()
    feats = []
    for d in (real_dir, gen_dir):
        imgs = _load_images(d)
        fs = [np.asarray(feature_fn(imgs[i:i + batch_size]))
              for i in range(0, len(imgs), batch_size)]
        feats.append(np.concatenate(fs))
    return fid_from_features(feats[0], feats[1])


def inception_features(path: str | None = None):
    """InceptionV3-pool3 feature extractor (nn/inception.py), gated on a
    weights file ($FENERF_INCEPTION_WEIGHTS .npz, exported from pytorch-fid's
    checkpoint via nn.inception.export_npz). Raises with instructions if
    absent — CI paths pass an explicit feature_fn instead."""
    path = path or os.environ.get(WEIGHTS_ENV)
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "InceptionV3 weights unavailable (zero-egress container). Set "
            f"${WEIGHTS_ENV} to an .npz exported from pytorch-fid's "
            "InceptionV3 (nn/inception.py::export_npz) for reference-"
            "comparable FID, or pass feature_fn= explicitly.")
    import jax

    from fenerf_tpu.nn.inception import inception_pool3, load_npz

    params = load_npz(path)
    # params must be a jit ARGUMENT, not a closure capture: captured weights
    # become XLA constants and the compiler constant-folds whole conv/pool
    # chains over them (>20min compile on CPU — it blew the multihost eval
    # barrier in the FID dress rehearsal)
    fn = jax.jit(inception_pool3)
    return lambda imgs: fn(params, jax.numpy.asarray(imgs, jax.numpy.float32))
