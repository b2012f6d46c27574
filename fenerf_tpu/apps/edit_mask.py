"""Headless segmentation-map editor (the Painter workflow without PyQt5).

Reference workflow: Painter/run_UI.py paints class edits onto a parsing map,
which feeds back into GAN inversion. Here the same edits are scriptable:

  python -m fenerf_tpu.apps.edit_mask mask.png edited.png \
      --op remove:hat --op switch:left_eye:right_eye \
      --op scale:hair:1.3 --op simplify --colorize

then run apps/invert.py with --seg_path edited.png.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--op", action="append", default=[],
                   help="remove:CLS[:FILL] | switch:A:B | scale:CLS:FACTOR | "
                        "rect:CLS:x0:y0:x1:y1 | simplify | "
                        "transfer:CLS[,CLS..]:REF.png[:DY:DX] (paste CLS "
                        "regions from another mask, reference tools.py "
                        "switch_semantic :499)")
    p.add_argument("--colorize", action="store_true",
                   help="also write a palette-colorized preview")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from fenerf_tpu.utils import mask_tools as mt

    def cls(name: str) -> int:
        return mt.LABELS[name] if not name.isdigit() else int(name)

    mask = np.asarray(Image.open(args.input).convert("L"))
    for op in args.op:
        parts = op.split(":")
        kind = parts[0]
        if kind == "remove":
            fill = cls(parts[2]) if len(parts) > 2 else mt.LABELS["skin"]
            mask = mt.remove_semantic(mask, cls(parts[1]), fill)
        elif kind == "switch":
            mask = mt.switch_semantic(mask, cls(parts[1]), cls(parts[2]))
        elif kind == "scale":
            mask = mt.scale_semantic(mask, cls(parts[1]), float(parts[2]))
        elif kind == "rect":
            region = np.zeros(mask.shape, bool)
            x0, y0, x1, y1 = map(int, parts[2:6])
            region[y0:y1, x0:x1] = True
            mask = mt.add_semantic(mask, cls(parts[1]), region)
        elif kind == "transfer":
            labels = tuple(cls(c) for c in parts[1].split(","))
            ref = np.asarray(Image.open(parts[2]).convert("L"))
            dy = int(parts[3]) if len(parts) > 3 else 0
            dx = int(parts[4]) if len(parts) > 4 else 0
            mask = mt.transfer_semantic(mask, ref, labels, (dy, dx))
        elif kind == "simplify":
            mask = mt.simplify_mask(mask)
        else:
            raise SystemExit(f"unknown op {kind!r}")

    Image.fromarray(mask.astype(np.uint8), mode="L").save(args.output)
    if args.colorize:
        from fenerf_tpu.utils.image import save_png
        save_png(args.output.rsplit(".", 1)[0] + "_color.png",
                 mt.colorize(mask))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
