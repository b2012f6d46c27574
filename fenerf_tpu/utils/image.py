"""Image utilities: CelebAMask palette, seg colorization, grids, PNG/MP4 io.

Palette = the 19-class CelebAMask-HQ color map used across the reference
(train_double_latent_semantic.py:36-55, Painter/ui/util.py). mask2color
matches the reference behavior: argmax over label channels -> palette RGB.
"""
from __future__ import annotations

import math
import os

import numpy as np

# index 0 = background
CELEBA_PALETTE = np.array([
    [0, 0, 0], [204, 0, 0], [76, 153, 0], [204, 204, 0], [51, 51, 255],
    [204, 0, 204], [0, 255, 255], [255, 204, 204], [102, 51, 0], [255, 0, 0],
    [102, 204, 0], [255, 255, 0], [0, 0, 153], [0, 0, 204], [255, 51, 153],
    [0, 204, 204], [0, 51, 0], [255, 153, 51], [0, 204, 0],
], dtype=np.uint8)


def mask2color(labels: np.ndarray) -> np.ndarray:
    """(B, C, H, W) label logits/one-hot -> (B, H, W, 3) uint8 palette RGB."""
    idx = np.argmax(np.asarray(labels), axis=1)
    return CELEBA_PALETTE[idx % len(CELEBA_PALETTE)]


def to_uint8(img: np.ndarray, normalize: bool = True) -> np.ndarray:
    """(…, H, W) float in [-1,1] (or arbitrary with normalize) -> uint8."""
    img = np.asarray(img, dtype=np.float32)
    if normalize:
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-8)
    else:
        img = (img + 1.0) / 2.0
    return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 5, pad: int = 2) -> np.ndarray:
    """(N, H, W, 3) uint8 -> single grid image (like torchvision make_grid)."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = math.ceil(n / ncol)
    grid = np.zeros(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), dtype=images.dtype
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(img).save(path)


def save_image_grid(path: str, chw_batch: np.ndarray, nrow: int = 5,
                    normalize: bool = True) -> None:
    """(N, 3, H, W) float -> grid PNG (reference save_image(... nrow=5))."""
    imgs = to_uint8(np.asarray(chw_batch), normalize).transpose(0, 2, 3, 1)
    save_png(path, make_grid(imgs, nrow=nrow))


def depth_to_jet(depth: np.ndarray, lo=0.88, hi=1.12) -> np.ndarray:
    """Depth map -> jet colormap uint8 (reference video depth frames use
    cv2 COLORMAP_JET, render_video_interpolation_semantic.py)."""
    import cv2

    d = np.clip((np.asarray(depth) - lo) / max(hi - lo, 1e-8), 0, 1)
    return cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_JET)[..., ::-1]


def write_mp4(path: str, frames: list[np.ndarray], fps: int = 24) -> None:
    """(H, W, 3) uint8 RGB frames -> mp4 via cv2 (reference uses
    cv2.VideoWriter, render_video_interpolation_semantic.py:436-473)."""
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        vw.write(f[..., ::-1])  # RGB -> BGR
    vw.release()
