"""Shared app plumbing: self-describing generator checkpoints, camera
trajectories, film interpolation.

Checkpoint = one .npz carrying params + both EMA trees + a JSON config
(curriculum, model, dims, step). Replaces the reference's path-string
conventions (ema path derived by splitting the generator path,
render_multiview_images_double_semantic.py:62).
"""
from __future__ import annotations

import json
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fenerf_tpu.models import generator as genlib
from fenerf_tpu.utils import checkpoint
from fenerf_tpu.nn import fields  # noqa: F401 (re-export for callers)


def save_generator(
    path: str,
    params: Any,
    ema_params: Any,
    ema2_params: Any,
    model: str,
    step: int,
    field_kwargs: dict | None = None,
    neural_renderers: dict | None = None,
) -> None:
    """neural_renderers: optional {"nr_img"/"nr_seg": (params, cfg)} — the
    HD upsampler heads embedded in released reference checkpoints
    (generators.py:914-1018 StyleGenerator3d holds neural_renderer_img/_seg;
    the multiview render script nulls them, :59-60, but the HD path uses
    them). Stored alongside the field trees, read back by
    load_neural_renderers."""
    import dataclasses

    from fenerf_tpu.nn import latent_grid_field as lgf

    family = "grid" if lgf.is_grid_model(model) else "film"
    config = {"model": model, "step": int(step), "family": family,
              "field_kwargs": field_kwargs or {}}
    arrays = {}
    trees = [("params", params), ("ema", ema_params), ("ema2", ema2_params)]
    for key, (nr_params, nr_cfg) in (neural_renderers or {}).items():
        assert key in ("nr_img", "nr_seg"), key
        config[f"{key}_cfg"] = dataclasses.asdict(nr_cfg)
        trees.append((key, nr_params))
    for name, tree in trees:
        leaves = jax.tree_util.tree_leaves(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{name}_{i}"] = checkpoint.to_local_np(leaf)
        config[f"n_{name}"] = len(leaves)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, __config__=json.dumps(config), **arrays)
    os.replace(tmp, path)


def load_generator(path: str):
    """-> (params, ema_params, ema2_params, cfg, config dict).

    cfg is a FieldConfig (film family) or GridFieldConfig (latent-grid
    family); config["family"] in {"film", "grid"} tells callers which render
    path applies (round-1 checkpoints without the tag are all film)."""
    with np.load(path, allow_pickle=False) as data:
        config = json.loads(str(data["__config__"]))
        config.setdefault("family", "film")
        fcfg = genlib.get_any_config(config["model"], **config["field_kwargs"])
        template = genlib.init_any_field(jax.random.key(0), fcfg)
        treedef = jax.tree_util.tree_structure(template)

        def tree(name):
            leaves = [jnp.asarray(data[f"{name}_{i}"])
                      for i in range(config[f"n_{name}"])]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        return tree("params"), tree("ema"), tree("ema2"), fcfg, config


def load_neural_renderers(path: str):
    """-> {"nr_img"/"nr_seg": (params, NeuralRendererConfig)} for the HD
    upsampler heads stored by save_generator(neural_renderers=...); empty
    dict when the checkpoint has none."""
    from fenerf_tpu.nn.neural_renderer import (NeuralRendererConfig,
                                               init_neural_renderer)

    out = {}
    with np.load(path, allow_pickle=False) as data:
        config = json.loads(str(data["__config__"]))
        for key in ("nr_img", "nr_seg"):
            if f"{key}_cfg" not in config:
                continue
            cfg = NeuralRendererConfig(**config[f"{key}_cfg"])
            template = init_neural_renderer(jax.random.key(0), cfg)
            treedef = jax.tree_util.tree_structure(template)
            leaves = [jnp.asarray(data[f"{key}_{i}"])
                      for i in range(config[f"n_{key}"])]
            out[key] = (jax.tree_util.tree_unflatten(treedef, leaves), cfg)
    return out


def best_backend(cfg, train: bool = False) -> str:
    """Backend the inference CLIs should render with: 'pallas' whenever the
    fused kernels serve this config on the host's default backend (TPU) —
    the field MLP kernel for supported film variants, and the per-ray
    hierarchical kernels (ops/ray_finalize.py) for every family — else
    'xla'. train=True additionally requires fused-backward support."""
    from fenerf_tpu.ops import film_mlp

    if jax.default_backend() != "tpu":
        return "xla"
    if not isinstance(cfg, fields.FieldConfig):
        return "pallas"   # grid family: XLA field, Pallas ray machinery
    # film family: the one policy function (ops/film_mlp.backend_for)
    return film_mlp.backend_for(cfg, train=train)


def camera_trajectory(name: str, num_frames: int, base_fov: float):
    """(t, pitch, yaw, fov) tuples matching the reference trajectories
    (render_video_interpolation_semantic.py:324-371,
    inverse_render_double_semantic.py:510-570)."""
    two_pi = 2 * math.pi
    half_pi = math.pi / 2
    out = []
    if name == "front":
        for t in np.linspace(0, 1, num_frames, endpoint=True):
            out.append((t, 0.2 * np.cos(t * two_pi) + half_pi,
                        0.4 * np.sin(t * two_pi) + half_pi,
                        base_fov + 5 + np.sin(t * two_pi) * 5))
    elif name == "orbit":
        for t in np.linspace(0, 0.5, num_frames, endpoint=True):
            out.append((t, half_pi, t * two_pi, base_fov))
    elif name == "rotation_horizontal":
        for t in np.linspace(-1, 1, num_frames):
            out.append((t, half_pi, half_pi + t * 0.5, base_fov))
    elif name == "rotation_linear":
        for t in np.linspace(-0.4, 0.4, num_frames):
            out.append((t, half_pi, half_pi + t, base_fov))
    elif name == "non_rotation":
        for t in np.linspace(0, 1, num_frames, endpoint=True):
            out.append((t, half_pi, half_pi, base_fov))
    elif name == "sphere":
        for t in np.linspace(0, 1, num_frames, endpoint=True):
            out.append((t, 0.2 * np.cos(t * two_pi) + half_pi,
                        0.4 * np.sin(t * two_pi) + half_pi, base_fov))
    elif name == "inverse_sphere":
        for t in np.linspace(0, 1, num_frames):
            out.append((t, 0.2 * (1 - np.cos(t * two_pi)) + half_pi,
                        0.4 * np.sin(t * two_pi) + half_pi, base_fov))
    elif name == "zoom":
        for t in np.linspace(0, 1, num_frames):
            out.append((t, half_pi, half_pi,
                        base_fov + np.sin(t * two_pi) * 5))
    else:
        raise ValueError(f"unknown trajectory {name!r}")
    # map to python floats; t retained for latent interpolation
    return [(float(t), float(p), float(y), float(f)) for t, p, y, f in out]


def interpolate_films(film1, film2, t: float, latent_type: str, which: str):
    """Lerp one branch's (freqs, phases) per the reference
    DoubleFrequencyInterpolator (render_video...py:131-179): 'geo' lerps only
    the geometry branch, 'app' only appearance with t remapped to (2t-1),
    'both' lerps both, 'non' holds endpoint 1."""
    lerp_geo = latent_type in ("geo", "both")
    lerp_app = latent_type in ("app", "both")
    if which == "geo":
        do, tt = lerp_geo, t
    else:
        do, tt = lerp_app, ((t - 0.5) * 2 if latent_type == "app" else t)
    if not do:
        return film1
    f1, p1 = film1
    f2, p2 = film2
    return (f1 * (1 - tt) + f2 * tt, p1 * (1 - tt) + p2 * tt)
