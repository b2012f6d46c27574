"""BiSeNet face-parsing network (data-prep subsystem), inference-mode JAX.

Reference: /root/reference/generators/BiSeNet.py (identical copy in
siren/BiSeNet.py) + generators/resnet.py — ResNet18 backbone, context path
with attention refinement (ARM), res8 features standing in for the spatial
path, feature fusion module (FFM), 1x1 head -> per-pixel class logits,
bilinear align_corners=True upsample to input size. Used by
prepare_segmaps.py to pseudo-label FFHQ with CelebA-style parsing maps.

Inference-only: BatchNorm is folded into per-channel (scale, shift) at import
time from running statistics. Bilinear align_corners resizes are realized as
two small matmuls (separable interpolation weights) — MXU-friendly, exact.
Pretrained weights come from the reference's segNet-20Class.pth via
bisenet_from_torch (the checkpoint itself is not distributable here).
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Any


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv(x, w, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def _conv_bn_relu(p, x, stride=1, pad=1, relu=True):
    y = _conv(x, p["w"], stride, pad)
    y = y * p["scale"][None, :, None, None] + p["shift"][None, :, None, None]
    return jax.nn.relu(y) if relu else y


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear align_corners=True interpolation weights."""
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    src = np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    t = (src - lo).astype(np.float32)
    w = np.zeros((n_out, n_in), np.float32)
    w[np.arange(n_out), lo] += 1 - t
    w[np.arange(n_out), hi] += t
    return w


def resize_bilinear_ac(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """(B, C, H, W) bilinear resize with align_corners=True as two matmuls."""
    h, w = x.shape[2], x.shape[3]
    wr = jnp.asarray(_interp_matrix(h, out_hw[0]))
    wc = jnp.asarray(_interp_matrix(w, out_hw[1]))
    return jnp.einsum("oh,bchw,pw->bcop", wr, x, wc)


def _global_avg(x):
    return x.mean(axis=(2, 3), keepdims=True)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _basic_block(p, x, stride):
    y = _conv_bn_relu(p["conv1"], x, stride=stride, pad=1)
    y = _conv_bn_relu(p["conv2"], y, pad=1, relu=False)
    skip = x
    if "downsample" in p:
        skip = _conv_bn_relu(p["downsample"], x, stride=stride, pad=0,
                             relu=False)
    return jax.nn.relu(y + skip)


def _resnet18(p, x):
    y = _conv_bn_relu(p["stem"], x, stride=2, pad=3)
    # maxpool 3x3 stride 2 pad 1
    y = jax.lax.reduce_window(
        jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1)),
                constant_values=-jnp.inf),
        -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
    feats = []
    for li, stride in enumerate((1, 2, 2, 2)):
        for bi in range(2):
            y = _basic_block(p[f"layer{li + 1}"][bi], y,
                             stride if bi == 0 else 1)
        if li >= 1:
            feats.append(y)  # feat8 (128ch), feat16 (256ch), feat32 (512ch)
    return feats


def _arm(p, x):
    feat = _conv_bn_relu(p["conv"], x, pad=1)
    atten = _global_avg(feat)
    atten = _conv(atten, p["atten_w"])
    atten = atten * p["atten_scale"][None, :, None, None] \
        + p["atten_shift"][None, :, None, None]
    return feat * jax.nn.sigmoid(atten)


def _ffm(p, fsp, fcp):
    fcat = jnp.concatenate([fsp, fcp], axis=1)
    feat = _conv_bn_relu(p["convblk"], fcat, pad=0)
    atten = _global_avg(feat)
    atten = jax.nn.relu(_conv(atten, p["conv1_w"]))
    atten = jax.nn.sigmoid(_conv(atten, p["conv2_w"]))
    return feat * atten + feat


def _head(p, x):
    y = _conv_bn_relu(p["conv"], x, pad=1)
    return _conv(y, p["out_w"])


def bisenet_apply(params: Params, x: jax.Array) -> jax.Array:
    """(B, 3, H, W) normalized image -> (B, n_classes, H, W) logits
    (reference BiSeNet.forward :239-251)."""
    h, w = x.shape[2], x.shape[3]
    feat8, feat16, feat32 = _resnet18(params["resnet"], x)

    avg = _global_avg(feat32)
    avg = _conv_bn_relu(params["conv_avg"], avg, pad=0)  # (B, 128, 1, 1)
    avg_up = jnp.broadcast_to(
        avg, avg.shape[:2] + feat32.shape[2:])  # ARM outputs are 128-ch

    f32 = _arm(params["arm32"], feat32) + avg_up
    f32_up = resize_bilinear_ac(f32, (feat16.shape[2], feat16.shape[3]))
    f32_up = _conv_bn_relu(params["conv_head32"], f32_up, pad=1)

    f16 = _arm(params["arm16"], feat16) + f32_up
    f16_up = resize_bilinear_ac(f16, (feat8.shape[2], feat8.shape[3]))
    f16_up = _conv_bn_relu(params["conv_head16"], f16_up, pad=1)

    fuse = _ffm(params["ffm"], feat8, f16_up)
    out = _head(params["conv_out"], fuse)
    return resize_bilinear_ac(out, (h, w))


# ---------------------------------------------------------------------------
# torch import
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _fold_bn(sd: Mapping, conv_key: str, bn_key: str, eps=1e-5) -> dict:
    w = _np(sd[f"{conv_key}.weight"])  # (out, in, kh, kw)
    mean = _np(sd[f"{bn_key}.running_mean"])
    var = _np(sd[f"{bn_key}.running_var"])
    g = _np(sd[f"{bn_key}.weight"])
    b = _np(sd[f"{bn_key}.bias"])
    scale = g / np.sqrt(var + eps)
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "scale": jnp.asarray(scale),
        "shift": jnp.asarray(b - mean * scale),
    }


def bisenet_from_torch(sd: Mapping[str, Any]) -> Params:
    """Convert a reference BiSeNet state_dict (e.g. segNet-20Class.pth
    loaded with torch) into the inference param tree."""
    def block(prefix):
        p = {"conv1": _fold_bn(sd, f"{prefix}.conv1", f"{prefix}.bn1"),
             "conv2": _fold_bn(sd, f"{prefix}.conv2", f"{prefix}.bn2")}
        if f"{prefix}.downsample.0.weight" in sd:
            p["downsample"] = _fold_bn(sd, f"{prefix}.downsample.0",
                                       f"{prefix}.downsample.1")
        return p

    resnet = {"stem": _fold_bn(sd, "cp.resnet.conv1", "cp.resnet.bn1")}
    for li in range(1, 5):
        resnet[f"layer{li}"] = [block(f"cp.resnet.layer{li}.{bi}")
                                for bi in range(2)]

    def arm(prefix):
        p = _fold_bn(sd, f"{prefix}.conv.conv", f"{prefix}.conv.bn")
        atten = _fold_bn(sd, f"{prefix}.conv_atten", f"{prefix}.bn_atten")
        return {"conv": p, "atten_w": atten["w"],
                "atten_scale": atten["scale"], "atten_shift": atten["shift"]}

    def head(prefix):
        return {
            "conv": _fold_bn(sd, f"{prefix}.conv.conv", f"{prefix}.conv.bn"),
            "out_w": jnp.asarray(
                _np(sd[f"{prefix}.conv_out.weight"]).transpose(2, 3, 1, 0)),
        }

    return {
        "resnet": resnet,
        "arm16": arm("cp.arm16"),
        "arm32": arm("cp.arm32"),
        "conv_head32": _fold_bn(sd, "cp.conv_head32.conv", "cp.conv_head32.bn"),
        "conv_head16": _fold_bn(sd, "cp.conv_head16.conv", "cp.conv_head16.bn"),
        "conv_avg": _fold_bn(sd, "cp.conv_avg.conv", "cp.conv_avg.bn"),
        "ffm": {
            "convblk": _fold_bn(sd, "ffm.convblk.conv", "ffm.convblk.bn"),
            "conv1_w": jnp.asarray(
                _np(sd["ffm.conv1.weight"]).transpose(2, 3, 1, 0)),
            "conv2_w": jnp.asarray(
                _np(sd["ffm.conv2.weight"]).transpose(2, 3, 1, 0)),
        },
        "conv_out": head("conv_out"),
    }


# 20-class parsing -> CelebAHQ 19-class remap (prepare_segmaps.py:12)
REMAP_FFHQ_TO_CELEBA = (0, 1, 6, 7, 4, 5, 2, 2, 10, 11, 12, 8, 9, 15, 3,
                        17, 16, 18, 13, 14)


def remap_labels(mask: np.ndarray,
                 table=REMAP_FFHQ_TO_CELEBA) -> np.ndarray:
    return np.asarray(table, dtype=np.uint8)[np.asarray(mask)]
