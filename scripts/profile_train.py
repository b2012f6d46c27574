"""Graph-level attribution of the training-step time (imgs/s/chip).

Same methodology as scripts/profile_hier_ablate.py (3 warmups per program —
see BASELINE.md "first-execution artifact"): each variant swaps ONE phase of
the jitted GAN step for a numerics-breaking no-op of identical output shape
and re-times the FULL step at a stage-of-record config.

  base       unmodified step (D_img + D_seg + G + EMA)
  no_dimg    D_img phase skipped (its fake render + fwd/bwd + Adam)
  no_dseg    D_seg phase skipped
  no_g       G phase skipped (its renders + VJP + Adam + both EMAs)
  no_dfakes  D phases fed zeros instead of rendered fakes (isolates the two
             forward-only renders from the D fwd/bwd work)
  no_r1      r1_lambda=0 (drops the double-backprop on real scores at trace
             time; legit config, numerics-breaking for the GAN)
  split1     batch_split=1 (one full-batch G render instead of the scan over
             microbatches; changes G loss scale — perf reading only)
  full       full_batch=True (exact split-s objective in one program — the
             production lever; numerics-preserving)
  flat       hierarchical_sample=False with num_steps DOUBLED (same total
             samples per ray, no proposal/sample_pdf/merge and none of their
             backward) — bounds the hierarchical machinery's fwd+bwd share
             of the training step (the inference-side bound is 4.9%,
             PROFILE_RAYK.json; the backward share was never measured)

Usage: python scripts/profile_train.py [--img 32] [--bs 24] [--steps 24]
          [--split 4] [--iters 6] [--variants base,no_g,...]
Writes PROFILE_TRAIN.json (merged per-config). Run alone (one TPU process).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fenerf_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from fenerf_tpu.train import curriculum as curlib
from fenerf_tpu.train import loop as looplib

ALL_VARIANTS = ("base", "no_dimg", "no_dseg", "no_g", "no_dfakes", "no_r1",
                "split1", "full", "flat")

# gradNN: grad_rays=0.NN (grad-subset-of-rays, the part_forward analogue —
# numerics-changing TRAINING LEVER, not an ablation: the G backward flows
# through a random NN% of rays; see GRAD_RAYS_OVERLAY.json)

# G-phase sub-cuts (train_step ablate values, see train/loop.py::_g_loss):
#   gcrit  critics replaced by a shape-preserving stub (drops D fwd + bwd-to-
#          input inside the G loss; render fwd+bwd + table backward kept)
#   gfold  table_vjp fold skipped (dtable scatter still computed)
#   gtab   table stop-gradded (no dtable scatter, no fold; field bwd kept)
#   gstop  pixels stop-gradded (no render backward at all)
# base - gcrit = critic cost; gfold deltas isolate the fold; gfold - gtab =
# the dtable scatter; gtab - gstop = field + hierarchical backward.
G_SUB_VARIANTS = ("gcrit", "gfold", "gtab", "gstop")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(meta, state, imgs, labels, ablate, iters):
    from functools import partial

    step = jax.jit(partial(looplib.train_step, meta=meta, ablate=ablate),
                   donate_argnums=(0,))
    key = jax.random.key(11)
    scal = looplib.StepScalars(alpha=jnp.float32(1.0),
                               noise_std=jnp.float32(0.5),
                               topk_frac=jnp.float32(1.0))
    t0 = time.perf_counter()
    state, m = step(state, imgs, labels, key, scal)
    float(m["g_loss"])
    log(f"  compile+first {time.perf_counter() - t0:.1f}s")
    for _ in range(3):  # first-execution artifact (BASELINE.md)
        state, m = step(state, imgs, labels, key, scal)
    float(m["g_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, imgs, labels, key, scal)
    float(m["g_loss"])
    ms = (time.perf_counter() - t0) / iters * 1000.0
    return ms, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=32)
    p.add_argument("--bs", type=int, default=24)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--split", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--variants", default=",".join(ALL_VARIANTS))
    p.add_argument("--curriculum",
                   default="CelebA_double_semantic_texture_embedding_256_dim_96")
    p.add_argument("--dry", action="store_true",
                   help="print only; do not update PROFILE_TRAIN.json "
                        "(CPU smoke runs must not overwrite TPU rows)")
    p.add_argument("--remat", action="store_true",
                   help="stage-of-record remat flag (the flagship 64/128px "
                        "stages set remat=True)")
    args = p.parse_args()

    meta = dataclasses.replace(
        curlib.get_curriculum(args.curriculum).at_step(0),
        batch_size=args.bs, img_size=args.img, num_steps=args.steps,
        batch_split=args.split, remat=args.remat)
    log(f"platform={jax.default_backend()} img={args.img} bs={args.bs} "
        f"steps={args.steps} split={args.split}")

    key = jax.random.key(0)
    imgs = jax.random.normal(
        jax.random.fold_in(key, 1), (args.bs, 3, args.img, args.img))
    labels = jnp.where(
        jax.random.normal(jax.random.fold_in(key, 2),
                          (args.bs, meta.channel_seg, args.img, args.img))
        > 0, 1.0, -1.0)

    res = {"img": args.img, "bs": args.bs, "steps": args.steps,
           "split": args.split, "remat": args.remat, "iters": args.iters,
           "curriculum": args.curriculum}
    for v in args.variants.split(","):
        m = meta
        ablate = None
        if v == "no_r1":
            m = dataclasses.replace(meta, r1_lambda=0.0)
        elif v == "split1":
            m = dataclasses.replace(meta, batch_split=1)
        elif v == "full":
            # exact split-s objective, one full-batch program (the
            # production lever — unlike split1 this is numerics-preserving)
            m = dataclasses.replace(meta, full_batch=True)
        elif v == "flat":
            m = dataclasses.replace(meta, hierarchical_sample=False,
                                    num_steps=2 * args.steps)
        elif v.startswith("grad") and v[4:].isdigit():
            m = dataclasses.replace(meta, grad_rays=int(v[4:]) / 100.0)
        elif v in G_SUB_VARIANTS:
            ablate = v
        elif v.startswith("no_"):
            ablate = v[3:]
        log(f"[{v}]")
        state = looplib.init_train_state(jax.random.fold_in(key, 3), m)
        try:
            ms, _ = time_step(m, state, imgs, labels, ablate, args.iters)
        except Exception as e:  # e.g. RESOURCE_EXHAUSTED on a big variant
            msg = str(e).splitlines()[0][:200]
            res[v + "_error"] = msg
            log(f"  FAILED: {msg}")
            _flush(args, res)
            continue
        res[v + "_ms"] = round(ms, 1)
        log(f"  {ms:.1f} ms/step = {args.bs / ms * 1000:.1f} imgs/s")
        _flush(args, res)  # survive a later-variant OOM/crash

    if "base_ms" in res:
        res["imgs_per_s"] = round(args.bs / res["base_ms"] * 1000, 2)
        _flush(args, res)
    print(json.dumps(res))


def _flush(args, res):
    """Merge the (possibly partial) result row into PROFILE_TRAIN.json —
    called after every variant so an OOM/crash later in the sweep cannot
    lose measured numbers."""
    if args.dry:
        return
    path = os.path.join(REPO, "PROFILE_TRAIN.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    # merge-update so variant families measured in separate runs accumulate
    # into one per-stage row. The key carries split/remat (round-5 fix:
    # previously img/bs only, so a re-run with a different --split silently
    # mixed methodologies in one row) and the merge refuses to mix rows
    # whose remaining config scalars differ.
    key = f"img{args.img}_bs{args.bs}_split{args.split}" + (
        "_remat" if args.remat else "")
    if args.curriculum != \
            "CelebA_double_semantic_texture_embedding_256_dim_96":
        key = f"{args.curriculum}_{key}"
    row = merged.setdefault(key, {})
    for field in ("steps", "iters"):
        if field in row and row[field] != res[field]:
            raise SystemExit(
                f"refusing to merge into {key}: existing row has "
                f"{field}={row[field]}, this run {field}={res[field]} — "
                f"delete the row or rerun with matching config")
    row.update(res)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
