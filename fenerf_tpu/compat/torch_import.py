"""PyTorch checkpoint -> JAX pytree importers.

The reference saves whole-module pickles (torch.save(generator_ddp.module,...),
train_double_latent_semantic.py:253); loading those requires the reference
package. These importers instead consume a *state_dict* mapping (str ->
tensor/ndarray), which callers obtain either from `torch.load(...).state_dict()`
with the reference importable, or from a re-saved plain dict.

Layout translation only — no computation: torch nn.Linear stores (out, in)
weights; ours are (in, out). Conv2d (out, in, kh, kw) -> (kh, kw, in, out).
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from fenerf_tpu.nn.fields import FieldConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _lin(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T),
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _conv(sd: Mapping[str, Any], prefix: str) -> dict:
    w = _np(sd[f"{prefix}.weight"])  # (out, in, kh, kw)
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def strip_prefix(sd: Mapping[str, Any], prefix: str) -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def field_from_torch(sd: Mapping[str, Any], cfg: FieldConfig) -> dict:
    """Convert a reference SIREN state_dict into our field param pytree.

    Accepts keys with or without a leading 'siren.' (generator pickles nest
    the field under .siren).
    """
    if any(k.startswith("siren.") for k in sd):
        sd = strip_prefix(sd, "siren.")

    params: dict[str, Any] = {
        "trunk": [_lin(sd, f"network.{i}.layer") for i in range(cfg.trunk_layers)],
        "color_head": _lin(sd, "color_layer_linear.0"),
    }

    if cfg.res_sigma:
        # RESSIRENDISENTANGLE (siren.py:982-1082)
        params["res_coord"] = _lin(sd, "res_coord_layer")
        params["sigma_mlp"] = [
            _lin(sd, f"density_layer_linear.{i}") for i in range(4)
        ]
        params["color_pre"] = _lin(sd, "color_layer_pre.0")
    else:
        params["sigma_head"] = _lin(sd, "final_layer")
        if cfg.color_pre_dim:
            # SPATIALSIRENAUGDISENTANGLE (siren.py:928-931)
            params["color_pre"] = _lin(sd, "color_layer_pre.0")

    # color branch: ModuleList of FiLM layers, or a single FiLMLayer in the
    # single-latent baselines (key color_layer_sine.layer.weight)
    if "color_layer_sine.layer.weight" in sd:
        params["color"] = [_lin(sd, "color_layer_sine.layer")]
    else:
        params["color"] = [
            _lin(sd, f"color_layer_sine.{i}.layer") for i in range(cfg.color_layers)
        ]

    if cfg.n_labels:
        n = cfg.label_hidden_layers + 1
        params["label_head"] = [
            _lin(sd, f"label_layer_linear.{i}") for i in range(n)
        ]
        if cfg.label_film:
            params["label_film"] = _lin(sd, "label_layer_sine.layer")

    def mapping(prefix):
        # reference Sequential indices 0,2,4,6,8 are the linears
        return [_lin(sd, f"{prefix}.network.{2 * j}") for j in range(5)]

    if cfg.single_latent:
        params["geo_map"] = mapping("mapping_network")
    else:
        params["geo_map"] = mapping("geo_mapping_network")
        params["app_map"] = mapping("app_mapping_network")

    if cfg.grid_channels:
        g = _np(sd["spatial_embeddings"])  # (1, C, D, H, W)
        params["grid"] = jnp.asarray(g[0])
    return params


# ------------------------------------------------------------------
# StyleGAN latent-grid import (StyleGenerator2D / SPATIALSIRENGRID)
# ------------------------------------------------------------------

def _mod_conv(sd: Mapping[str, Any], prefix: str) -> dict:
    """ModulatedConv2d (siren/layers.py:500-583): weight (1,out,in,kh,kw) ->
    (kh,kw,in,out); activate bias lives on .activate.bias, plain bias on
    .bias (1,out,1,1)."""
    w = _np(sd[f"{prefix}.weight"])[0]  # (out, in, kh, kw)
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
         "mod": _lin(sd, f"{prefix}.modulation")}
    if f"{prefix}.activate.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.activate.bias"]))
    elif f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{prefix}.bias"]).reshape(-1))
    else:
        p["b"] = jnp.zeros((w.shape[0],), jnp.float32)
    return p


def style_generator_from_torch(sd: Mapping[str, Any],
                               skip_conn: bool = False) -> dict:
    """StyleGenerator2D (siren/latent_grid.py:9-95) -> stylegan params."""
    params: dict[str, Any] = {
        "mapping": [_lin(sd, f"mapping_network.{i}") for i in range(3)],
        "input": jnp.asarray(_np(sd["input.input"])[0]),
        "conv1": _mod_conv(sd, "conv1"),
    }
    convs = []
    i = 0
    while f"convs.{i}.weight" in sd:
        convs.append(_mod_conv(sd, f"convs.{i}"))
        i += 1
    params["convs"] = convs
    if skip_conn:
        params["to_rgb1"] = _mod_conv(sd, "to_rgb1.conv")
        params["to_rgbs"] = []
        j = 0
        while f"to_rgbs.{j}.conv.weight" in sd:
            params["to_rgbs"].append(_mod_conv(sd, f"to_rgbs.{j}.conv"))
            j += 1
    else:
        params["out_rgb"] = _mod_conv(sd, "out_rgb.conv")
    return params


def grid_field_from_torch(sd: Mapping[str, Any], trunk_layers: int = 8) -> dict:
    """SPATIALSIRENGRID (siren/siren.py:413-518) -> latent_grid_field params."""
    if any(k.startswith("siren.") for k in sd):
        sd = strip_prefix(sd, "siren.")
    return {
        "style_gen": style_generator_from_torch(
            strip_prefix(sd, "grid_latent_network.")),
        "map": [_lin(sd, f"mapping_network.network.{2 * j}")
                for j in range(3)],
        "trunk": [_lin(sd, f"network.{i}.layer") for i in range(trunk_layers)],
        "sigma_head": _lin(sd, "final_layer"),
        "color": [_lin(sd, "color_layer_sine.layer")],
        "color_head": _lin(sd, "color_layer_linear.0"),
    }


# ------------------------------------------------------------------
# Discriminator import (CCSDoubleEncoderDiscriminator and kin)
# ------------------------------------------------------------------

def discriminator_from_torch(sd: Mapping[str, Any], n_blocks: int = 7) -> dict:
    """Convert a reference CCS*Discriminator state_dict
    (/root/reference/discriminators/sgdiscriminators.py:365-419)."""
    blocks = []
    for i in range(n_blocks):
        # CoordConv blocks nest the conv under .conv; StridedDiscriminator
        # blocks hold plain Conv2d (sgdiscriminators.py:33-53)
        sub = ".conv" if f"layers.{i}.network.0.conv.weight" in sd else ""
        blocks.append({
            "conv1": _conv(sd, f"layers.{i}.network.0{sub}"),
            "conv2": _conv(sd, f"layers.{i}.network.2{sub}"),
            "proj": _conv(sd, f"layers.{i}.proj"),
        })
    from_rgb = []
    j = 0
    while f"fromRGB.{j}.model.0.weight" in sd:
        from_rgb.append(_conv(sd, f"fromRGB.{j}.model.0"))
        j += 1
    return {
        "blocks": blocks,
        "from_rgb": from_rgb,
        "final": _conv(sd, "final_layer"),
    }
