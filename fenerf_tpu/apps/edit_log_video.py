"""Replay a mask-edit session log into a video.

Reference: Painter/converter_log_to_video.py — replays the PyQt Painter's
pickled stroke/rect/fill event log into colorized frames and writes a video.
Our paint_ui records the session as mask SNAPSHOTS (one per completed edit
action, .npz stack written with --edit_log); replaying is just colorizing
each snapshot, which is event-model-independent and exactly reproduces the
visible editing timeline.

Usage:
  python -m fenerf_tpu.apps.edit_log_video --log sess.editlog.npz \
      --out sess.mp4 [--fps 4] [--hold 6] [--side img.png]

--hold repeats the final frame so the result lingers; --side composites an
RGB image (e.g. the current inversion render) next to each mask frame,
mirroring the reference converter's side-by-side output.
"""
from __future__ import annotations

import argparse

import numpy as np

from fenerf_tpu.utils.image import write_mp4
from fenerf_tpu.utils.mask_tools import colorize


def log_to_frames(frames_u8: np.ndarray, side: np.ndarray | None = None,
                  hold: int = 6) -> list[np.ndarray]:
    """(N, H, W) uint8 label maps -> list of (H, W[, +W], 3) uint8 frames."""
    out = []
    for m in frames_u8:
        f = colorize(m).astype(np.uint8)
        if side is not None:
            s = side
            if s.shape[:2] != f.shape[:2]:
                from PIL import Image

                s = np.asarray(Image.fromarray(s).resize(
                    (f.shape[1], f.shape[0]), Image.BILINEAR))
            f = np.concatenate([f, s], axis=1)
        out.append(f)
    out.extend([out[-1]] * max(hold - 1, 0))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True, help=".npz from paint_ui --edit_log")
    p.add_argument("--out", default=None, help="mp4 path (default <log>.mp4)")
    p.add_argument("--fps", type=int, default=4)
    p.add_argument("--hold", type=int, default=6,
                   help="repeat the final frame this many times")
    p.add_argument("--side", default=None,
                   help="optional RGB image composited beside each frame")
    args = p.parse_args(argv)

    frames = np.load(args.log)["frames"]
    side = None
    if args.side:
        from PIL import Image

        side = np.asarray(Image.open(args.side).convert("RGB"))
    out = args.out or args.log.rsplit(".", 1)[0] + ".mp4"
    write_mp4(out, log_to_frames(frames, side, args.hold), fps=args.fps)
    print(f"wrote {out} ({len(frames)} edit states)")


if __name__ == "__main__":
    main()
