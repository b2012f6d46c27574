"""InceptionV3 (pytorch-fid variant) feature extractor, inference-mode JAX.

Reference: the FID protocol (fid_evaluation.py / eval_metrics.py) scores with
pytorch-fid's InceptionV3 — torchvision InceptionV3 with the FID tweaks:
branch-pool avg-pooling uses count_include_pad=False, and the second
InceptionE block max-pools its pool branch. Features = 2048-dim global
average of the final mixed block (pool3).

This module implements the full architecture with BatchNorm folded into
(scale, shift) at import time. Weights load from the pytorch-fid checkpoint
(pt_inception-2015-12-05) state_dict via `inception_from_torch`; export it
to .npz with `export_npz` wherever torch+the file exist, then point
$FENERF_INCEPTION_WEIGHTS at it. Without weights the architecture still
builds (random init) for shape/pipeline tests.
"""
from __future__ import annotations

import functools

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


# ---------------------------------------------------------------------------
# primitives (NCHW)
# ---------------------------------------------------------------------------

def _conv_bn(p, x, stride=1, pad=(0, 0)):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), (pad if isinstance(pad[0], tuple)
                                      else ((pad[0], pad[0]), (pad[1], pad[1]))),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    y = y * p["scale"][None, :, None, None] + p["shift"][None, :, None, None]
    return jax.nn.relu(y)


def _max_pool(x, k=3, s=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)])


@functools.lru_cache(maxsize=None)
def _pool_counts(h: int, w: int, k: int, s: int, pad: int):
    """Valid-cell counts per output position for count_include_pad=False.

    Computed in numpy at TRACE time: expressing this as
    reduce_window(ones_like(x)) hands XLA a full-tensor constant fold that
    its single-threaded HLO evaluator chews on for MINUTES per pool layer
    on CPU (it blew the multihost eval barrier in the FID rehearsal); the
    counts depend only on static shapes, so bake the (oh, ow) matrix."""
    padded = np.zeros((h + 2 * pad, w + 2 * pad), np.float32)
    padded[pad:pad + h, pad:pad + w] = 1.0
    oh = (h + 2 * pad - k) // s + 1
    ow = (w + 2 * pad - k) // s + 1
    out = np.empty((oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            out[i, j] = padded[i * s:i * s + k, j * s:j * s + k].sum()
    return out


def _avg_pool_nocount(x, k=3, s=1, pad=1):
    """avg_pool3x3 with count_include_pad=False (the FID tweak)."""
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, s, s),
        [(0, 0), (0, 0), (pad, pad), (pad, pad)])
    counts = _pool_counts(x.shape[2], x.shape[3], k, s, pad)
    return sums / jnp.asarray(counts)[None, None]


# ---------------------------------------------------------------------------
# blocks (torchvision InceptionV3 structure)
# ---------------------------------------------------------------------------

def _inception_a(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b5 = _conv_bn(p["branch5x5_1"], x)
    b5 = _conv_bn(p["branch5x5_2"], b5, pad=(2, 2))
    b3 = _conv_bn(p["branch3x3dbl_1"], x)
    b3 = _conv_bn(p["branch3x3dbl_2"], b3, pad=(1, 1))
    b3 = _conv_bn(p["branch3x3dbl_3"], b3, pad=(1, 1))
    bp = _conv_bn(p["branch_pool"], _avg_pool_nocount(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(p, x):
    b3 = _conv_bn(p["branch3x3"], x, stride=2)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, pad=(1, 1))
    bd = _conv_bn(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(p, x):
    b1 = _conv_bn(p["branch1x1"], x)
    b7 = _conv_bn(p["branch7x7_1"], x)
    b7 = _conv_bn(p["branch7x7_2"], b7, pad=(0, 3))
    b7 = _conv_bn(p["branch7x7_3"], b7, pad=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_1"], x)
    bd = _conv_bn(p["branch7x7dbl_2"], bd, pad=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_3"], bd, pad=(0, 3))
    bd = _conv_bn(p["branch7x7dbl_4"], bd, pad=(3, 0))
    bd = _conv_bn(p["branch7x7dbl_5"], bd, pad=(0, 3))
    bp = _conv_bn(p["branch_pool"], _avg_pool_nocount(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(p, x):
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = _conv_bn(p["branch3x3_2"], b3, stride=2)
    b7 = _conv_bn(p["branch7x7x3_1"], x)
    b7 = _conv_bn(p["branch7x7x3_2"], b7, pad=(0, 3))
    b7 = _conv_bn(p["branch7x7x3_3"], b7, pad=(3, 0))
    b7 = _conv_bn(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(p, x, pool: str):
    b1 = _conv_bn(p["branch1x1"], x)
    b3 = _conv_bn(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv_bn(p["branch3x3_2a"], b3, pad=(0, 1)),
        _conv_bn(p["branch3x3_2b"], b3, pad=(1, 0)),
    ], axis=1)
    bd = _conv_bn(p["branch3x3dbl_1"], x)
    bd = _conv_bn(p["branch3x3dbl_2"], bd, pad=(1, 1))
    bd = jnp.concatenate([
        _conv_bn(p["branch3x3dbl_3a"], bd, pad=(0, 1)),
        _conv_bn(p["branch3x3dbl_3b"], bd, pad=(1, 0)),
    ], axis=1)
    if pool == "max":  # FIDInceptionE_2
        bp = _max_pool(x, k=3, s=1, pad=1)
    else:
        bp = _avg_pool_nocount(x)
    bp = _conv_bn(p["branch_pool"], bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


_BLOCKS = [
    ("Mixed_5b", "a"), ("Mixed_5c", "a"), ("Mixed_5d", "a"),
    ("Mixed_6a", "b"),
    ("Mixed_6b", "c"), ("Mixed_6c", "c"), ("Mixed_6d", "c"), ("Mixed_6e", "c"),
    ("Mixed_7a", "d"),
    ("Mixed_7b", "e_avg"), ("Mixed_7c", "e_max"),
]


def inception_pool3(params: Params, images: jax.Array) -> jax.Array:
    """images (B, H, W, 3) float in [0, 1] -> pool3 features (B, 2048).

    Mirrors pytorch-fid preprocessing: bilinear resize to 299 (align_corners
    False via jax.image), scale to [-1, 1].
    """
    x = jax.image.resize(images, (images.shape[0], 299, 299, 3), "bilinear")
    x = (x * 2.0 - 1.0).transpose(0, 3, 1, 2)  # NCHW in [-1, 1]

    x = _conv_bn(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv_bn(params["Conv2d_2a_3x3"], x)
    x = _conv_bn(params["Conv2d_2b_3x3"], x, pad=(1, 1))
    x = _max_pool(x)
    x = _conv_bn(params["Conv2d_3b_1x1"], x)
    x = _conv_bn(params["Conv2d_4a_3x3"], x)
    x = _max_pool(x)
    for name, kind in _BLOCKS:
        p = params[name]
        if kind == "a":
            x = _inception_a(p, x)
        elif kind == "b":
            x = _inception_b(p, x)
        elif kind == "c":
            x = _inception_c(p, x)
        elif kind == "d":
            x = _inception_d(p, x)
        else:
            x = _inception_e(p, x, "max" if kind == "e_max" else "avg")
    return x.mean(axis=(2, 3))  # (B, 2048)


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _fold(sd: Mapping, prefix: str, eps: float = 1e-3) -> dict:
    """torchvision BasicConv2d: conv (no bias) + BN(eps=0.001)."""
    w = _np(sd[f"{prefix}.conv.weight"])
    mean = _np(sd[f"{prefix}.bn.running_mean"])
    var = _np(sd[f"{prefix}.bn.running_var"])
    gamma = _np(sd[f"{prefix}.bn.weight"])
    beta = _np(sd[f"{prefix}.bn.bias"])
    scale = gamma / np.sqrt(var + eps)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "scale": jnp.asarray(scale),
            "shift": jnp.asarray(beta - mean * scale)}


_BRANCHES = {
    "a": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
          "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "b": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "c": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
          "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
          "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "d": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
          "branch7x7x3_3", "branch7x7x3_4"],
    "e_avg": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
              "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
              "branch3x3dbl_3b", "branch_pool"],
}
_BRANCHES["e_max"] = _BRANCHES["e_avg"]


def inception_from_torch(sd: Mapping[str, Any]) -> Params:
    """pytorch-fid / torchvision inception_v3 state_dict -> param tree."""
    params: dict[str, Any] = {}
    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        params[stem] = _fold(sd, stem)
    for name, kind in _BLOCKS:
        params[name] = {br: _fold(sd, f"{name}.{br}")
                        for br in _BRANCHES[kind]}
    return params


def export_npz(sd: Mapping[str, Any], out_path: str) -> None:
    """One-time: torch state_dict -> flat .npz for $FENERF_INCEPTION_WEIGHTS."""
    params = inception_from_torch(sd)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(out_path, **flat)


def load_npz(path: str) -> Params:
    data = np.load(path)
    params: dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(data[key])
    return params


# random init (shape/pipeline tests only — NOT a valid FID scorer)
_STEM_SPECS = [("Conv2d_1a_3x3", 3, 32, 3), ("Conv2d_2a_3x3", 32, 32, 3),
               ("Conv2d_2b_3x3", 32, 64, 3), ("Conv2d_3b_1x1", 64, 80, 1),
               ("Conv2d_4a_3x3", 80, 192, 3)]

_BLOCK_CONVS = {
    # per block: branch -> (in, out, kh, kw)
    "Mixed_5b": {"branch1x1": (192, 64, 1, 1), "branch5x5_1": (192, 48, 1, 1),
                 "branch5x5_2": (48, 64, 5, 5),
                 "branch3x3dbl_1": (192, 64, 1, 1),
                 "branch3x3dbl_2": (64, 96, 3, 3),
                 "branch3x3dbl_3": (96, 96, 3, 3),
                 "branch_pool": (192, 32, 1, 1)},
    "Mixed_5c": {"branch1x1": (256, 64, 1, 1), "branch5x5_1": (256, 48, 1, 1),
                 "branch5x5_2": (48, 64, 5, 5),
                 "branch3x3dbl_1": (256, 64, 1, 1),
                 "branch3x3dbl_2": (64, 96, 3, 3),
                 "branch3x3dbl_3": (96, 96, 3, 3),
                 "branch_pool": (256, 64, 1, 1)},
    "Mixed_5d": {"branch1x1": (288, 64, 1, 1), "branch5x5_1": (288, 48, 1, 1),
                 "branch5x5_2": (48, 64, 5, 5),
                 "branch3x3dbl_1": (288, 64, 1, 1),
                 "branch3x3dbl_2": (64, 96, 3, 3),
                 "branch3x3dbl_3": (96, 96, 3, 3),
                 "branch_pool": (288, 64, 1, 1)},
    "Mixed_6a": {"branch3x3": (288, 384, 3, 3),
                 "branch3x3dbl_1": (288, 64, 1, 1),
                 "branch3x3dbl_2": (64, 96, 3, 3),
                 "branch3x3dbl_3": (96, 96, 3, 3)},
    "Mixed_7a": {"branch3x3_1": (768, 192, 1, 1),
                 "branch3x3_2": (192, 320, 3, 3),
                 "branch7x7x3_1": (768, 192, 1, 1),
                 "branch7x7x3_2": (192, 192, 1, 7),
                 "branch7x7x3_3": (192, 192, 7, 1),
                 "branch7x7x3_4": (192, 192, 3, 3)},
}
for _name, _c7 in [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                   ("Mixed_6e", 192)]:
    _BLOCK_CONVS[_name] = {
        "branch1x1": (768, 192, 1, 1), "branch7x7_1": (768, _c7, 1, 1),
        "branch7x7_2": (_c7, _c7, 1, 7), "branch7x7_3": (_c7, 192, 7, 1),
        "branch7x7dbl_1": (768, _c7, 1, 1), "branch7x7dbl_2": (_c7, _c7, 7, 1),
        "branch7x7dbl_3": (_c7, _c7, 1, 7), "branch7x7dbl_4": (_c7, _c7, 7, 1),
        "branch7x7dbl_5": (_c7, 192, 1, 7), "branch_pool": (768, 192, 1, 1)}
for _name, _cin in [("Mixed_7b", 1280), ("Mixed_7c", 2048)]:
    _BLOCK_CONVS[_name] = {
        "branch1x1": (_cin, 320, 1, 1), "branch3x3_1": (_cin, 384, 1, 1),
        "branch3x3_2a": (384, 384, 1, 3), "branch3x3_2b": (384, 384, 3, 1),
        "branch3x3dbl_1": (_cin, 448, 1, 1),
        "branch3x3dbl_2": (448, 384, 3, 3),
        "branch3x3dbl_3a": (384, 384, 1, 3),
        "branch3x3dbl_3b": (384, 384, 3, 1),
        "branch_pool": (_cin, 192, 1, 1)}


def init_inception(key: jax.Array) -> Params:
    """Random parameters with the correct shapes (tests only)."""
    def conv(k, cin, cout, kh, kw):
        return {"w": jax.random.normal(k, (kh, kw, cin, cout)) * 0.05,
                "scale": jnp.ones((cout,)), "shift": jnp.zeros((cout,))}

    params: dict[str, Any] = {}
    ks = iter(jax.random.split(key, 256))
    for name, cin, cout, ksz in _STEM_SPECS:
        params[name] = conv(next(ks), cin, cout, ksz, ksz)
    for name, _ in _BLOCKS:
        params[name] = {br: conv(next(ks), *spec)
                        for br, spec in _BLOCK_CONVS[name].items()}
    return params
