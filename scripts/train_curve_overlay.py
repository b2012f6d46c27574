"""200-step XLA-vs-Pallas training-curve overlay on real TPU hardware.

Evidence for the fused backward kernel (VERDICT round-1 'weak' #3): optimize
the flagship field with Adam against a fixed rendered target twice — once
through the XLA bf16 path, once through the fused Pallas forward+backward
kernels (custom VJP) — from identical init/keys, and record both loss
trajectories. Indistinguishable curves mean the kernel's gradients steer
optimization the same way the XLA gradients do, which is the property that
matters for GAN training (cosine similarity alone can't show it).

Run on TPU:  python scripts/train_curve_overlay.py [--steps 200]
Writes GRAD_OVERLAY.json at the repo root; summary goes into BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--img_size", type=int, default=32)
    p.add_argument("--num_steps", type=int, default=12)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--out", default=os.path.join(REPO, "GRAD_OVERLAY.json"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    cache = os.path.expanduser("~/.cache/fenerf_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields
    from fenerf_tpu.ops import film_mlp as film_ops

    print(f"devices: {jax.devices()}", file=sys.stderr)
    fcfg = fields.get_config("SIRENBASELINESEMANTICDISENTANGLE")
    assert film_ops.supported(fcfg)

    rcfg = gen.RenderConfig(
        img_size=args.img_size, num_steps=args.num_steps, hierarchical=True,
        h_stddev=0.0, v_stddev=0.0, sample_dist=None, perturb=False,
        compute_dtype="bfloat16")

    params0 = fields.init_field(jax.random.key(0), fcfg)
    zg = jax.random.normal(jax.random.key(1), (args.batch, fcfg.z_geo_dim))
    za = jax.random.normal(jax.random.key(2), (args.batch, fcfg.z_app_dim))

    # fixed target: the same architecture at a different init
    tparams = fields.init_field(jax.random.key(9), fcfg)
    target = gen.render_from_z(tparams, fcfg, rcfg, jax.random.key(3),
                               zg, za, noise_std=0.0)["pixels"]
    target = jax.lax.stop_gradient(target)

    def run(backend: str, p0=None):
        p0 = params0 if p0 is None else p0
        r = rcfg.replace(backend=backend)
        tx = optax.adam(args.lr, b1=0.0, b2=0.9)

        def loss_fn(p):
            out = gen.render_from_z(p, fcfg, r, jax.random.key(3), zg, za,
                                    noise_std=0.0)
            return jnp.mean((out["pixels"] - target) ** 2)

        @jax.jit
        def step(p, opt):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            upd, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, upd), opt, loss

        p_, opt = p0, tx.init(p0)
        losses = []
        t0 = time.perf_counter()
        for i in range(args.steps):
            p_, opt, loss = step(p_, opt)
            losses.append(float(loss))
        dt = time.perf_counter() - t0
        print(f"{backend}: {args.steps} steps in {dt:.1f}s "
              f"loss {losses[0]:.5f} -> {losses[-1]:.5f}", file=sys.stderr)
        return losses

    xla = run("xla")
    ker = run("pallas_train")
    # control: the SAME XLA path from an init perturbed at 1e-6 relative —
    # the natural trajectory spread of this optimization under last-ulp
    # gradient noise. The kernel curve is "indistinguishable" if it lies
    # within the xla-vs-control spread, since bf16 rounding differences
    # between any two implementations act exactly like such a perturbation.
    eps = jax.tree.map(
        lambda x: x * (1.0 + 1e-6 * jax.random.normal(
            jax.random.key(123), x.shape)), params0)
    ctl = run("xla", p0=eps)

    x, k, c = np.asarray(xla), np.asarray(ker), np.asarray(ctl)
    abs_div = np.abs(x - k)
    rel_div = abs_div / np.maximum(np.abs(x), 1e-12)
    summary = {
        "steps": args.steps,
        "config": {"img_size": args.img_size, "num_steps": args.num_steps,
                   "batch": args.batch, "lr": args.lr,
                   "model": fcfg.name},
        "xla_first_last": [x[0], x[-1]],
        "pallas_first_last": [k[0], k[-1]],
        "control_first_last": [c[0], c[-1]],
        "max_abs_divergence": float(abs_div.max()),
        "max_rel_divergence": float(rel_div.max()),
        "final_rel_divergence": float(rel_div[-1]),
        "control_max_rel_divergence": float(
            (np.abs(x - c) / np.maximum(np.abs(x), 1e-12)).max()),
        "xla_losses": xla,
        "pallas_losses": ker,
        "control_losses": ctl,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps({kk: v for kk, v in summary.items()
                      if not kk.endswith("losses")}))


if __name__ == "__main__":
    main()
