"""Image(+mask) datasets and the host-sharded input pipeline.

Reference behavior (/root/reference/datasets.py):
  * CelebAMaskHQ_wo_background_seg_18 (:465-549): paired jpg/png under
    <root>/celebahq_mask_img, <root>/celebahq_mask_mask; image Resize(320) ->
    CenterCrop(256) -> normalize [-1,1] -> Resize(img_size); mask NEAREST
    through the same geometry; background pixels zeroed when background_mask;
    paired random hflip; mask -> 18 one-hot channels scaled to [-1,1].
  * CelebA (:20-41): jpg glob, Resize(320)/CenterCrop(256)/Resize, hflip.
  * get_dataset_distributed (:96-114): DistributedSampler -> here per-host
    example sharding (jax.process_index) + an explicit epoch key.

The loader is a plain Python prefetch iterator (PIL + numpy): the models are
compute-bound on TPU at these image sizes, so a thread of decode-ahead is
enough; swap in grain/tf.data for multi-host production runs.
"""
from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator

import numpy as np
from PIL import Image


def _prep(pil: Image.Image, img_size: int, nearest: bool) -> Image.Image:
    resample = Image.NEAREST if nearest else Image.BILINEAR
    w, h = pil.size
    # torchvision Resize(320): scale the SHORT side to 320
    scale = 320 / min(w, h)
    pil = pil.resize((round(w * scale), round(h * scale)), resample)
    w, h = pil.size
    left, top = (w - 256) // 2, (h - 256) // 2
    pil = pil.crop((left, top, left + 256, top + 256))
    return pil.resize((img_size, img_size), resample)


def one_hot_labels(mask: np.ndarray, n: int = 18,
                   include_background: bool = False) -> np.ndarray:
    """mask (H, W) int -> (n, H, W) one-hot.

    include_background=False: labels 1..n (background dropped), matching
    CelebAMaskHQ_wo_background_seg_18._mask_labels (datasets.py:518-523).
    include_background=True: labels 0..n-1 (background kept as channel 0),
    matching CelebAMaskHQ._mask_labels (datasets.py:165-172, 19 channels).
    """
    out = np.zeros((n,) + mask.shape, dtype=np.float32)
    off = 0 if include_background else 1
    for i in range(n):
        out[i][mask == i + off] = 1.0
    return out


class CelebAMaskDataset:
    """Paired image+18ch-mask dataset (joint RGB+semantic training)."""

    def __init__(self, dataset_path: str, img_size: int,
                 background_mask: bool = True, seg_channels: int = 18,
                 seg_background: bool = False, img_nearest: bool = False,
                 img_glob: str = "celebahq_mask_img/*.jpg",
                 mask_glob: str = "celebahq_mask_mask/*.png",
                 use_native: str | bool = "auto"):
        self.images = sorted(glob.glob(os.path.join(dataset_path, img_glob)))
        self.masks = sorted(glob.glob(os.path.join(dataset_path, mask_glob)))
        assert len(self.images) == len(self.masks), (
            f"{len(self.images)} images vs {len(self.masks)} masks")
        assert self.images, f"no data under {dataset_path}"
        self.img_size = img_size
        self.background_mask = background_mask
        self.seg_channels = seg_channels
        self.seg_background = seg_background
        self.img_nearest = img_nearest
        if img_nearest:
            # the native loader resizes images bilinearly (the 18ch family's
            # geometry); the 19ch CelebAMaskHQ reference uses NEAREST for
            # images too (datasets.py:124-128) -> PIL path for exact parity
            use_native = False
        if use_native == "auto":
            from fenerf_tpu.data import native_loader

            self.use_native = native_loader.available()
        else:
            self.use_native = bool(use_native)

    def __len__(self):
        return len(self.images)

    def _finish(self, x_hw3_u8, mask_hw_u8, flip):
        x = np.asarray(x_hw3_u8, dtype=np.float32) / 255.0
        x = (x.transpose(2, 0, 1) - 0.5) / 0.5
        m = np.asarray(mask_hw_u8)
        if flip:
            x = x[:, :, ::-1].copy()
            m = m[:, ::-1].copy()
        labels = one_hot_labels(m, self.seg_channels,
                                self.seg_background) * 2.0 - 1.0
        return x, labels

    def __getitem__(self, index: int, flip: bool = False):
        if self.use_native:
            from fenerf_tpu.data import native_loader

            img, mask = native_loader.preprocess_pair(
                self.images[index], self.masks[index], self.img_size,
                self.background_mask)
            return self._finish(img, mask, flip)
        img = Image.open(self.images[index]).convert("RGB")
        mask = Image.open(self.masks[index]).convert("L")
        if self.background_mask:
            m = np.asarray(
                mask.resize(img.size, resample=Image.NEAREST))
            arr = np.asarray(img).copy()
            arr[m == 0] = 0
            img = Image.fromarray(arr)
        img = _prep(img, self.img_size, nearest=self.img_nearest)
        mask = _prep(mask, self.img_size, nearest=True)
        return self._finish(np.asarray(img), np.asarray(mask), flip)


class CelebADataset:
    """RGB-only dataset for the single-latent pi-GAN curriculum
    (datasets.py:20-41)."""

    def __init__(self, dataset_path: str, img_size: int, **_):
        self.images = sorted(glob.glob(dataset_path))
        assert self.images, f"no data under {dataset_path}"
        self.img_size = img_size

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index: int, flip: bool = False):
        img = _prep(Image.open(self.images[index]).convert("RGB"),
                    self.img_size, nearest=False)
        x = np.asarray(img, dtype=np.float32) / 255.0
        x = (x.transpose(2, 0, 1) - 0.5) / 0.5
        if flip:
            x = x[:, :, ::-1].copy()
        return x, np.zeros((0, self.img_size, self.img_size), np.float32)


class SimpleImageDataset:
    """Direct-resize RGB datasets: Cats (hflip) / Carla (no flip)
    (datasets.py:43-80) — NEAREST resize straight to img_size."""

    def __init__(self, dataset_path: str, img_size: int, hflip: bool = True,
                 **_):
        self.images = sorted(glob.glob(dataset_path))
        assert self.images, f"no data under {dataset_path}"
        self.img_size = img_size
        self.hflip = hflip

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index: int, flip: bool = False):
        img = Image.open(self.images[index]).convert("RGB").resize(
            (self.img_size, self.img_size), Image.NEAREST)
        x = np.asarray(img, dtype=np.float32) / 255.0
        x = (x.transpose(2, 0, 1) - 0.5) / 0.5
        if flip and self.hflip:
            x = x[:, :, ::-1].copy()
        return x, np.zeros((0, self.img_size, self.img_size), np.float32)


DATASETS = {
    "CelebAMaskHQ_wo_background_seg_18": CelebAMaskDataset,
    # 19-channel variant KEEPS the background as channel 0 (labels 0..18,
    # datasets.py:141-173) and resizes images with NEAREST (:124-128)
    "CelebAMaskHQ": lambda dataset_path, img_size, **kw: CelebAMaskDataset(
        dataset_path, img_size,
        **{**kw, "seg_channels": 19, "seg_background": True,
           "img_nearest": True}),
    # single-image overfit/debug variant: ONE hardcoded demo pair
    # (datasets.py:551-634 — demo_mask_img/97.jpg + demo_mask_mask/97.png,
    # same 18ch no-background labels and geometry as the main family)
    "CelebAMaskHQ_single_image_wo_background_seg_18":
        lambda dataset_path, img_size, **kw: CelebAMaskDataset(
            dataset_path, img_size,
            **{**kw, "img_glob": "demo_mask_img/97.jpg",
               "mask_glob": "demo_mask_mask/97.png"}),
    "CelebA": CelebADataset,
    "Cats": SimpleImageDataset,
    "Carla": lambda dataset_path, img_size, **kw: SimpleImageDataset(
        dataset_path, img_size, hflip=False, **kw),
}


def make_dataset(name: str, dataset_path: str, img_size: int, **kw):
    return DATASETS[name](dataset_path=dataset_path, img_size=img_size, **kw)


def iterate_batches(
    dataset,
    batch_size: int,
    seed: int = 0,
    host_index: int = 0,
    n_hosts: int = 1,
    prefetch: int = 4,
    epochs: int | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Shuffled, host-sharded, flip-augmented batches of (imgs, labels).

    Per-host sharding replaces the reference's DistributedSampler
    (datasets.py:99-103); the flip coin is drawn per example per epoch.
    """
    n = len(dataset)
    rng = np.random.RandomState(seed + 7919 * host_index)
    out_q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        epoch = 0
        while not stop.is_set() and (epochs is None or epoch < epochs):
            order = np.random.RandomState(seed + epoch).permutation(n)
            order = order[host_index::n_hosts]
            flips = rng.rand(len(order)) > 0.5
            for s in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[s:s + batch_size]
                items = [dataset.__getitem__(int(i), flip=bool(f))
                         for i, f in zip(idx, flips[s:s + batch_size])]
                imgs = np.stack([it[0] for it in items])
                labels = np.stack([it[1] for it in items])
                if stop.is_set():
                    return
                out_q.put((imgs, labels))
            epoch += 1
        out_q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = out_q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()
