"""Convert reference PyTorch checkpoints -> fenerf_tpu .npz generators.

The reference saves whole nn.Module pickles ({step}_generator.pth + sibling
ema/ema2 files, train_double_latent_semantic.py:248-259). Unpickling them
needs the reference package importable — compat/reference_shim handles the
stale imports. EMA files are torch_ema objects holding shadow_params in
generator.parameters() order; they are re-associated by position.

Usage:
  python -m fenerf_tpu.apps.convert_checkpoint \
      --generator path/to/generator.pth --model auto --out generator.npz \
      [--reference /root/reference]
"""
from __future__ import annotations

import argparse
import os


def _ema_to_params(ema_obj, torch_module):
    """torch_ema.ExponentialMovingAverage -> state_dict-like mapping using
    parameter order (ema stores a flat shadow_params list)."""
    shadow = getattr(ema_obj, "shadow_params", None)
    if shadow is None:
        return None
    names = [n for n, _ in torch_module.named_parameters()]
    assert len(names) == len(shadow), (len(names), len(shadow))
    sd = {k: v for k, v in torch_module.state_dict().items()}  # buffers too
    for n, p in zip(names, shadow):
        sd[n] = p
    return sd


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--generator", required=True, help=".pth module pickle")
    p.add_argument("--ema", default=None,
                   help="ema .pth (default: sibling ema.pth if present)")
    p.add_argument("--ema2", default=None)
    p.add_argument("--model", default="auto",
                   help="field variant name, or 'auto' from the module class")
    p.add_argument("--out", required=True)
    p.add_argument("--reference", default="/root/reference")
    args = p.parse_args(argv)

    import sys

    sys.path.insert(0, args.reference)
    import torch

    from fenerf_tpu.apps.common import save_generator
    from fenerf_tpu.compat import reference_shim
    from fenerf_tpu.compat.torch_import import (field_from_torch,
                                                grid_field_from_torch)
    from fenerf_tpu.nn import fields
    from fenerf_tpu.nn import latent_grid_field as lgf

    reference_shim.import_reference_generators()  # register shims for pickle

    gen_module = torch.load(args.generator, map_location="cpu",
                            weights_only=False)
    siren = gen_module.siren if hasattr(gen_module, "siren") else gen_module
    model = args.model
    if model == "auto":
        model = type(siren).__name__

    if lgf.is_grid_model(model):
        # latent-grid family (SPATIALSIRENGRID, siren.py:413-518)
        field_kwargs = {
            "z_dim": getattr(siren, "z_dim", 256),
            "hidden_dim": getattr(siren, "hidden_dim", 256),
        }
        import_fn = grid_field_from_torch
    else:
        field_kwargs = {
            "z_geo_dim": getattr(siren, "z_geo_dim",
                                 getattr(siren, "z_dim", 256)),
            "z_app_dim": getattr(siren, "z_app_dim",
                                 getattr(siren, "z_dim", 256)),
            "hidden_dim": getattr(siren, "hidden_dim", 256),
        }
        fcfg = fields.get_config(model, **field_kwargs)
        if fcfg.output_dim != siren.output_dim:
            # semantic layout: 1 bg + n_labels + 3 rgb (+weight ch); HD/RGB
            # variants carry their output structure in the registry already
            field_kwargs["n_labels"] = siren.output_dim - 4
            fcfg = fields.get_config(model, **field_kwargs)
        import_fn = lambda sd: field_from_torch(sd, fcfg)
    params = import_fn(siren.state_dict())

    def load_ema(path):
        if not path or not os.path.exists(path):
            return params
        ema_obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = _ema_to_params(ema_obj, gen_module)
        if sd is None:
            return params
        sd = {k[len("siren."):]: v for k, v in sd.items()
              if k.startswith("siren.")}
        return import_fn(sd)

    base = os.path.dirname(args.generator)
    ema = load_ema(args.ema or os.path.join(base, "ema.pth"))
    ema2 = load_ema(args.ema2 or os.path.join(base, "ema2.pth"))

    # released pickles may embed HD upsampler heads (StyleGenerator3d /
    # ImplicitGenerator3d hold .neural_renderer_img/_seg, generators.py:14,
    # 915); convert them alongside so the HD render path is one flag away
    from fenerf_tpu.nn.neural_renderer import (config_from_torch_module,
                                               neural_renderer_from_torch)

    neural_renderers = {}
    for attr, key in (("neural_renderer_img", "nr_img"),
                      ("neural_renderer_seg", "nr_seg")):
        tm = getattr(gen_module, attr, None)
        if tm is None:
            continue
        nr_cfg = config_from_torch_module(tm)
        neural_renderers[key] = (
            neural_renderer_from_torch(tm.state_dict(), nr_cfg), nr_cfg)
    step = int(getattr(gen_module, "step", 0))
    save_generator(args.out, params, ema, ema2, model, step,
                   field_kwargs=field_kwargs,
                   neural_renderers=neural_renderers or None)
    nr = f" + {sorted(neural_renderers)}" if neural_renderers else ""
    print(f"converted {args.generator} ({model}, step {step}){nr} "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
