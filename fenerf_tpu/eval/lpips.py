"""LPIPS perceptual distance (VGG16 backbone) in JAX — weights-gated.

The reference inversion uses lpips.PerceptualLoss('net-lin','vgg')
(inverse_render_double_semantic.py:175). Neither the lpips package nor
pretrained VGG16 weights exist in this container (zero egress), so this
module implements the network and loads weights from
$FENERF_LPIPS_WEIGHTS (an .npz with VGG16-conv + linear-head arrays,
convertible from the lpips distribution via `convert_torch_lpips`). With no
weights present, load_lpips() returns None and callers drop the perceptual
term (the reference's own editing demos run seg+img losses only).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage; LPIPS taps the output
# of each stage's last ReLU
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

WEIGHTS_ENV = "FENERF_LPIPS_WEIGHTS"


def _vgg_features(params, x):
    """x: (B, 3, H, W) in [-1, 1] -> list of 5 stage features (NHWC)."""
    h = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    h = h.transpose(0, 2, 3, 1)
    feats = []
    idx = 0
    for si, (ch, n_convs) in enumerate(_VGG_STAGES):
        for _ in range(n_convs):
            w, b = params[f"conv{idx}_w"], params[f"conv{idx}_b"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            h = jax.nn.relu(h)
            idx += 1
        feats.append(h)
        if si < len(_VGG_STAGES) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


def lpips_distance(params, x, y):
    """Perceptual distance between (B,3,H,W) images in [-1,1]."""
    fx = _vgg_features(params, x)
    fy = _vgg_features(params, y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        lin = params[f"lin{i}_w"]  # (1, 1, C, 1)
        d = jax.lax.conv_general_dilated(
            d, lin, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + d.mean(axis=(1, 2, 3)).sum()
    return total


def load_lpips(path: str | None = None):
    """-> callable(x, y) or None if no weights are available."""
    path = path or os.environ.get(WEIGHTS_ENV)
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    params = {k: jnp.asarray(data[k]) for k in data.files}

    def fn(x, y):
        return lpips_distance(params, x, y)

    return fn


def convert_torch_lpips(lpips_module, out_path: str) -> None:
    """One-time converter: torch lpips.LPIPS(net='vgg') -> .npz for this
    module (run wherever the lpips package + weights exist)."""
    sd = lpips_module.state_dict()
    arrays = {}
    conv_keys = [k for k in sd if k.startswith("net.slice") and k.endswith(".weight")]
    conv_keys.sort(key=lambda k: int(k.split(".")[2]))
    for i, k in enumerate(conv_keys):
        w = sd[k].detach().numpy()
        arrays[f"conv{i}_w"] = w.transpose(2, 3, 1, 0)
        arrays[f"conv{i}_b"] = sd[k.replace("weight", "bias")].detach().numpy()
    for i in range(5):
        w = sd[f"lins.{i}.model.1.weight"].detach().numpy()  # (1, C, 1, 1)
        arrays[f"lin{i}_w"] = w.transpose(2, 3, 1, 0)
    np.savez(out_path, **arrays)
