"""ctypes bindings + build driver for the native C++ decode/preprocess loader.

The compute path is XLA/Pallas; the host IO path (JPEG/PNG decode + the
dataset resize geometry) is C++ with a thread pool
(fenerf_tpu/data/native/loader.cpp), the TPU-side counterpart of the
reference's torch DataLoader worker processes. Falls back to PIL when the
toolchain or libjpeg/libpng are unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native",
                    "loader.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("FENERF_NATIVE_BUILD_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "fenerf_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def load_library():
    """Compile (once) and dlopen the loader; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_build_dir(), "libfenerf_loader.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                     "-o", so, "-ljpeg", "-lpng"],
                    check=True, capture_output=True, timeout=300)
            lib = ctypes.CDLL(so)
            lib.fenerf_preprocess.restype = ctypes.c_int
            lib.fenerf_preprocess.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.fenerf_preprocess_batch.restype = ctypes.c_int
            lib.fenerf_preprocess_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
            lib.fenerf_preprocess_pair.restype = ctypes.c_int
            lib.fenerf_preprocess_pair.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8)]
            lib.fenerf_preprocess_pair_batch.restype = ctypes.c_int
            lib.fenerf_preprocess_pair_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8)]
            _LIB = lib
        except Exception as e:  # toolchain/libs absent -> PIL fallback
            print(f"[native_loader] build unavailable ({e}); using PIL")
            _LIB = None
        return _LIB


def available() -> bool:
    return load_library() is not None


def preprocess(path: str, out_size: int, nearest: bool = False,
               gray: bool = False) -> np.ndarray:
    """Decode + short-side-320 -> center-crop-256 -> resize(out_size).
    Returns (out_size, out_size, C) uint8 (C = 1 if gray else 3)."""
    lib = load_library()
    assert lib is not None, "native loader unavailable"
    c = 1 if gray else 3
    out = np.empty((out_size, out_size, c), np.uint8)
    rc = lib.fenerf_preprocess(
        path.encode(), out_size, int(nearest), int(gray),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc < 0:
        raise IOError(f"native decode failed for {path}")
    return out


def preprocess_pair(img_path: str, mask_path: str, out_size: int,
                    background_mask: bool = True
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Full dataset item in C++: decode both, background-zero at native image
    resolution (reference semantics), run the crop geometry. Returns
    (img (S,S,3) uint8, mask (S,S) uint8)."""
    lib = load_library()
    assert lib is not None, "native loader unavailable"
    img = np.empty((out_size, out_size, 3), np.uint8)
    mask = np.empty((out_size, out_size), np.uint8)
    rc = lib.fenerf_preprocess_pair(
        img_path.encode(), mask_path.encode(), out_size,
        int(background_mask),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"native pair decode failed: {img_path}")
    return img, mask


def preprocess_pair_batch(img_paths: list[str], mask_paths: list[str],
                          out_size: int, background_mask: bool = True,
                          n_threads: int | None = None
                          ) -> tuple[np.ndarray, np.ndarray]:
    lib = load_library()
    assert lib is not None, "native loader unavailable"
    n = len(img_paths)
    imgs = np.empty((n, out_size, out_size, 3), np.uint8)
    masks = np.empty((n, out_size, out_size), np.uint8)
    blob = b"".join(i.encode() + b"\0" + m.encode() + b"\0"
                    for i, m in zip(img_paths, mask_paths))
    n_threads = n_threads or min(os.cpu_count() or 1, 8)
    rc = lib.fenerf_preprocess_pair_batch(
        blob, n, out_size, int(background_mask), n_threads,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"native pair batch failed (item {-rc - 1})")
    return imgs, masks


def preprocess_batch(paths: list[str], out_size: int, nearest: bool = False,
                     gray: bool = False, n_threads: int | None = None
                     ) -> np.ndarray:
    """Threaded batch variant -> (N, out_size, out_size, C) uint8."""
    lib = load_library()
    assert lib is not None, "native loader unavailable"
    c = 1 if gray else 3
    n = len(paths)
    out = np.empty((n, out_size, out_size, c), np.uint8)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    n_threads = n_threads or min(os.cpu_count() or 1, 8)
    rc = lib.fenerf_preprocess_batch(
        blob, n, out_size, int(nearest), int(gray), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"native batch decode failed (item {-rc - 1}): "
                      f"{paths[-rc - 1]}")
    return out
