"""Adversarial training CLI.

Reference: /root/reference/train_double_latent_semantic.py (call stack in
SURVEY.md §3.1). Differences by design:
  * one process drives all local devices (SPMD) — no mp.spawn/gloo/barriers;
  * one compiled train step per curriculum stage (static shapes);
  * checkpoints are self-describing .npz pytrees, not module pickles;
  * AMP GradScaler dropped (bf16 matmuls + f32 grads need no loss scaling).

Usage:
  python -m fenerf_tpu.apps.train --curriculum CelebA_double_semantic \
      --output_dir output/run1 --data_root data/celebahq_mask
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def _host_barrier(name: str, timeout_ms: int | None = None) -> None:
    """See train/sharding.py::host_barrier (coordination-service rendezvous
    with a public-API fallback if the private client module moves)."""
    from fenerf_tpu.train import sharding as _sh

    _sh.host_barrier(name, timeout_ms)


def _score_fid_subprocess(real_dir: str, gen_dir: str) -> float:
    """Run eval/score_fid in a fresh subprocess so scoring lands on the
    host's default platform (the TPU chip on a TPU host) even when THIS
    process was pinned to CPU via FENERF_FORCE_PLATFORM/JAX_PLATFORMS —
    enabled with FENERF_FID_SCORER=subprocess; pin the scorer's platform
    with FENERF_FID_SCORER_PLATFORM (e.g. 'cpu' for deterministic CI)."""
    import subprocess
    import sys

    env = dict(os.environ)
    # strip only the CPU pins a rehearsal/trainer adds — NOT the host's
    # ambient platform selection (e.g. the tunnel's JAX_PLATFORMS=axon,
    # which is how the chip is addressed on this host)
    env.pop("FENERF_FORCE_PLATFORM", None)
    env.pop("XLA_FLAGS", None)
    if env.get("JAX_PLATFORMS") == "cpu":
        env.pop("JAX_PLATFORMS")
    plat = os.environ.get("FENERF_FID_SCORER_PLATFORM")
    if plat:
        env["JAX_PLATFORMS"] = plat
        env["FENERF_FORCE_PLATFORM"] = plat
    r = subprocess.run(
        [sys.executable, "-m", "fenerf_tpu.eval.score_fid",
         "--real", real_dir, "--gen", gen_dir],
        env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise FileNotFoundError(
            f"score_fid subprocess failed rc={r.returncode}: "
            f"{r.stderr[-500:]}")
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    print(f"[eval-t] scorer_platform={res['platform']} "
          f"scorer_s={res['score_s']}", flush=True)
    return float(res["fid"])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--curriculum", required=True)
    p.add_argument("--output_dir", default="output/debug")
    p.add_argument("--data_root", default=None,
                   help="overrides the curriculum's dataset_path")
    p.add_argument("--total_steps", type=int, default=None)
    p.add_argument("--load_dir", default="")
    p.add_argument("--set_step", type=int, default=None)
    p.add_argument("--sample_interval", type=int, default=2000)
    p.add_argument("--model_save_interval", type=int, default=5000)
    p.add_argument("--eval_freq", type=int, default=5000)
    p.add_argument("--num_eval_imgs", type=int, default=2048)
    p.add_argument("--num_real_imgs", type=int, default=8000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--field_overrides", default="",
                   help='JSON dict, e.g. {"hidden_dim": 64} (debug runs)')
    p.add_argument("--stage_overrides", default="",
                   help='JSON dict overriding stage meta, e.g. '
                        '{"batch_size": 4, "img_size": 16} (debug runs)')
    p.add_argument("--profile_steps", default="",
                   help="'start:stop' step range to capture a jax.profiler "
                        "trace into <output_dir>/profile")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() — the TPU-pod "
                        "replacement for init_process_group (launch this CLI "
                        "once per host; coordinator from TPU env)")
    p.add_argument("--coordinator", default=None,
                   help="explicit coordinator addr:port for --multihost "
                        "(DCN clusters / the CPU two-process rehearsal; "
                        "TPU pods auto-detect)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--batch_per_device", action="store_true", default=True,
                   help="treat the curriculum batch_size as PER-DEVICE "
                        "(reference semantics: each DDP rank loads a full "
                        "batch_size, datasets.py:96-114); global batch = "
                        "batch_size * n_devices")
    p.add_argument("--global_batch", dest="batch_per_device",
                   action="store_false")
    p.add_argument("--full_batch", action="store_true",
                   help="run the G phase (and D-phase fake renders) over the "
                        "full batch in one program instead of the batch_split "
                        "scan, keeping the exact split-structured objective "
                        "(StageMeta.full_batch) — faster wherever the "
                        "full-batch VJP fits HBM")
    p.add_argument("--grad_rays", type=float, default=1.0,
                   help="G-phase gradient-subset-of-rays fraction (< 1.0 "
                        "enables; the reference's part_forward trick, "
                        "generators.py:858-910 — all rays render forward, a "
                        "random fraction carries gradients; the render "
                        "backward scales ~linearly with it). OFF by default; "
                        "see GRAD_RAYS_OVERLAY.json for training-dynamics "
                        "evidence before enabling")
    args = p.parse_args(argv)

    # the ambient TPU-tunnel sitecustomize pins JAX_PLATFORMS after the
    # shell env is applied, so `env JAX_PLATFORMS=cpu` alone is NOT enough
    # to force CPU (same reason tests/conftest.py uses jax.config);
    # FENERF_FORCE_PLATFORM wins over both (CPU rehearsals/CI on a TPU host)
    forced = os.environ.get("FENERF_FORCE_PLATFORM")
    if forced:
        import jax

        jax.config.update("jax_platforms", forced)

    if args.multihost:
        import jax

        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            jax.distributed.initialize()

        _host_barrier("fenerf_init")

    import jax as _jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/fenerf_jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fenerf_tpu.apps.common import save_generator
    from fenerf_tpu.data.celeba_mask import iterate_batches, make_dataset
    from fenerf_tpu.eval import fid as fidlib
    from fenerf_tpu.models import generator as gen
    from fenerf_tpu.nn import fields
    from fenerf_tpu.train import loop as looplib
    from fenerf_tpu.train import sharding
    from fenerf_tpu.train.curriculum import get_curriculum
    from fenerf_tpu.utils import checkpoint as ckpt
    from fenerf_tpu.utils.image import mask2color, save_image_grid, save_png, \
        make_grid

    os.makedirs(args.output_dir, exist_ok=True)
    cur = get_curriculum(args.curriculum)
    fo = tuple(sorted(json.loads(args.field_overrides).items())) \
        if args.field_overrides else ()

    so = json.loads(args.stage_overrides) if args.stage_overrides else {}

    mesh = sharding.data_mesh()
    n_dev = len(mesh.devices.reshape(-1))

    def meta_at(step):
        m = cur.at_step(step)
        repl = dict(so)
        if args.data_root:
            repl["dataset_path"] = args.data_root
        if fo:
            repl["field_overrides"] = fo
        if args.batch_per_device and "batch_size" not in so:
            # reference semantics: curriculum batch_size is per DDP rank
            repl["batch_size"] = m.batch_size * n_dev
        if args.full_batch:
            repl["full_batch"] = True
        if args.grad_rays < 1.0:
            repl["grad_rays"] = args.grad_rays
        return dataclasses.replace(m, **repl) if repl else m

    meta = meta_at(0)
    host_index, n_hosts = jax.process_index(), jax.process_count()

    key = jax.random.key(args.seed)
    state = looplib.init_train_state(jax.random.fold_in(key, 0), meta)
    start_step = 0
    if args.load_dir:
        path = os.path.join(args.load_dir, "train_state.npz")
        state = ckpt.load(path, state)
        start_step = int(state.step)
        print(f"resumed from {path} at step {start_step}")
    if args.set_step is not None:
        state = state._replace(step=jnp.asarray(args.set_step, jnp.int32))
        start_step = args.set_step
    state = sharding.replicate(mesh, state)

    # fixed grids for visual checks (reference fixed_z, train...py:113-114)
    fixed_zg = jax.random.normal(
        jax.random.fold_in(key, 1), (25, meta.latent_geo_dim))
    fixed_za = jax.random.normal(
        jax.random.fold_in(key, 2), (25, meta.latent_app_dim))

    # options dump (reference options.txt, :189-197)
    with open(os.path.join(args.output_dir, "options.txt"), "w") as f:
        f.write(f"{vars(args)}\n\n{meta}\n")
    metrics_log = open(os.path.join(args.output_dir, "metrics.jsonl"), "a")

    step_fn = None
    data_iter = None
    stage_meta = None
    dataset = None
    total = args.total_steps or cur.end_step
    step = start_step
    t_last = time.time()
    from fenerf_tpu.utils.profiling import StatsCollector
    stats = StatsCollector()
    prof_range = (tuple(int(x) for x in args.profile_steps.split(":"))
                  if args.profile_steps else None)

    def eval_render(params, fcfg, ecfg, k, zg, za, psi, noise_std=0.0):
        """Family-generic EMA/eval render; psi-truncation is film-only (the
        grid family's film is per-point — no W-space average exists,
        reference generate_avg_frequencies is incompatible with
        SPATIALSIRENGRID's 32-d local-latent mapping net)."""
        if gen.is_grid_config(fcfg):
            return gen.render_grid_from_z(params, fcfg, ecfg, k, zg,
                                          noise_std=noise_std)
        avg = fields.avg_film(params, fcfg, jax.random.key(7))
        return gen.render_truncated(params, fcfg, ecfg, k, zg, za, avg,
                                    psi=psi, noise_std=noise_std)

    def sample_grids(state, meta, step):
        fcfg = meta.field_config()
        ecfg = meta.eval_render_config(
            img_size=min(128, meta.target_size), h_stddev=0.0, v_stddev=0.0,
            sample_dist=None, ray_chunk=4096)
        # the tilted pair renders the same latents from h_mean + 0.5 — the
        # at-a-glance 3D-consistency check (reference saves fixed / tilted /
        # fixed_ema / tilted_ema / random every sample_interval,
        # train_double_latent_semantic.py:466-521). ema2 is checkpointed but
        # never sampled, matching the reference (only `ema` is copied into
        # the sampling renders there).
        tilted = ecfg.replace(h_mean=ecfg.h_mean + 0.5)
        for tag, params, cfg_r, psi, zg, za in (
            ("fixed", state.g_params, ecfg, 1.0, fixed_zg, fixed_za),
            ("tilted", state.g_params, tilted, 1.0, fixed_zg, fixed_za),
            ("fixed_ema", state.ema.params, ecfg, 1.0, fixed_zg, fixed_za),
            ("tilted_ema", state.ema.params, tilted, 1.0, fixed_zg,
             fixed_za),
            ("random_ema", state.ema.params, ecfg, 0.7,
             jax.random.normal(jax.random.fold_in(key, step), fixed_zg.shape),
             jax.random.normal(jax.random.fold_in(key, step + 1),
                               fixed_za.shape)),
        ):
            # reference passes the CURRENT annealed nerf_noise into the
            # sample renders (staged_forward receives **metadata,
            # train...py:471) — early grids are noise-lit
            out = eval_render(params, fcfg, cfg_r, jax.random.key(0), zg, za,
                              psi, noise_std=meta.nerf_noise(step))
            pix = np.asarray(out["pixels"])
            save_image_grid(
                os.path.join(args.output_dir, f"{step}_img_{tag}.png"),
                pix[:, -3:])
            if fcfg.n_labels:
                save_png(
                    os.path.join(args.output_dir, f"{step}_seg_{tag}.png"),
                    make_grid(mask2color(pix[:, :-3]), nrow=5))

    while step < total:
        m = meta_at(step)
        if stage_meta is None or m != stage_meta:
            stage_meta = m
            # log which field-kernel path serves this stage (fused Pallas vs
            # XLA fallback) so a config the policy declines is visible;
            # same policy function the step itself dispatches through
            from fenerf_tpu.ops import film_mlp as film_ops
            fc = m.field_config()
            kpath = (f"{film_ops.backend_for(fc, train=True)}(G)"
                     f"+{film_ops.backend_for(fc)}(D)")
            print(f"[stage] step={step} img={m.img_size} bs={m.batch_size} "
                  f"steps/ray={m.num_steps} split={m.batch_split}"
                  f"{'(full_batch)' if m.full_batch else ''} "
                  f"kernel={kpath}")
            assert m.batch_size % n_dev == 0 or n_dev == 1, (
                f"batch {m.batch_size} not divisible by {n_dev} devices")
            step_fn = sharding.jit_train_step_sharded(m, mesh)
            stage_first_dispatch = True
            dataset = make_dataset(
                m.dataset, m.dataset_path, m.img_size,
                background_mask=m.background_mask,
            ) if m.dataset != "CelebA" else make_dataset(
                m.dataset, m.dataset_path, m.img_size)
            # each host loads its disjoint 1/n_hosts share of the global
            # batch (shard_batch assembles the global array across hosts)
            assert m.batch_size % max(n_hosts, 1) == 0, (
                f"batch {m.batch_size} not divisible by {n_hosts} hosts")
            data_iter = iterate_batches(
                dataset, m.batch_size // n_hosts, seed=args.seed + step,
                host_index=host_index, n_hosts=n_hosts)

        imgs, labels = next(data_iter)
        imgs, labels = sharding.shard_batch(mesh, imgs, labels)
        scal = looplib.StepScalars(
            alpha=jnp.asarray(cur.alpha(step), jnp.float32),
            noise_std=jnp.asarray(m.nerf_noise(step), jnp.float32),
            topk_frac=jnp.asarray(m.topk_fraction(step), jnp.float32),
        )
        if prof_range and step == prof_range[0]:
            jax.profiler.start_trace(
                os.path.join(args.output_dir, "profile"))
        step_key = jax.random.fold_in(key, 10_000 + step)
        if n_hosts > 1 and stage_first_dispatch:
            # compile fence: each stage's step is a fresh XLA program whose
            # per-host compile times can differ by minutes, while gloo gives
            # the step's psum clique a hard ~30s rendezvous window at FIRST
            # dispatch. AOT-compile (no dispatch), rendezvous over the
            # coordination service, then dispatch everywhere at once.
            step_fn.lower(state, imgs, labels, step_key, scal).compile()
            _host_barrier(f"fenerf_stage_compiled_{step}")
            stage_first_dispatch = False
        state, metrics = step_fn(state, imgs, labels, step_key, scal)
        if prof_range and step == prof_range[1]:
            jax.tree_util.tree_leaves(metrics)[0].block_until_ready()
            jax.profiler.stop_trace()

        if host_index == 0 and step % args.log_every == 0:
            mvals = {k: float(v)
                     for k, v in sharding.local_get(metrics).items()}
            stats.report(**mvals)
            # divergence watchdog: halt + keep the last good checkpoint
            # instead of wasting the rest of the run (the reference has no
            # failure detection at all — SURVEY.md §5)
            import math as _math
            bad = [k for k, v in mvals.items() if not _math.isfinite(v)]
            if bad:
                ckpt.save(os.path.join(args.output_dir,
                                       "train_state_diverged.npz"), state)
                raise SystemExit(
                    f"non-finite metrics {bad} at step {step}; state saved "
                    f"to train_state_diverged.npz (resume from the last "
                    f"periodic checkpoint with --load_dir)")
            dt = time.time() - t_last
            t_last = time.time()
            rate = args.log_every * m.batch_size / dt if step else 0.0
            line = {"step": step, "imgs_per_sec": round(rate, 2), **mvals}
            try:
                # best-effort device-memory telemetry (PJRT memory_stats is
                # absent on some platforms, e.g. the tunneled runtime)
                ms = jax.local_devices()[0].memory_stats()
                if ms and "peak_bytes_in_use" in ms:
                    line["peak_hbm_gb"] = round(
                        ms["peak_bytes_in_use"] / 2 ** 30, 2)
            except Exception:
                pass
            print(json.dumps(line))
            metrics_log.write(json.dumps(line) + "\n")
            metrics_log.flush()

        step += 1

        if (host_index == 0 and args.model_save_interval > 0
                and step % args.model_save_interval == 0):
            ckpt.save(os.path.join(args.output_dir, "train_state.npz"), state)
            # m.field_overrides carries the effective overrides (CLI ones
            # replace the curriculum's in meta_at)
            if m.family == "grid":
                fkw = {"z_dim": m.latent_geo_dim, **dict(m.field_overrides)}
            else:
                fkw = {"z_geo_dim": m.latent_geo_dim,
                       "z_app_dim": m.latent_app_dim,
                       "n_labels": m.output_dim - 4,
                       **dict(m.field_overrides)}
            save_generator(
                os.path.join(args.output_dir, "generator.npz"),
                state.g_params, state.ema.params, state.ema2.params,
                m.model, step, field_kwargs=fkw,
            )
        if (host_index == 0 and args.sample_interval > 0
                and step % args.sample_interval == 0):
            sample_grids(sharding.local_get(state), m, step)

        if args.eval_freq > 0 and step % args.eval_freq == 0:
            # phase wall-clocks ([eval-t] lines): eval cost is host-skewed
            # (host 0 dumps reals + scores FID) and sets the barrier margin;
            # FID_REHEARSAL.json is assembled from these
            _et0 = time.perf_counter()
            real_dir = os.path.join(args.output_dir, "evaluation/real")
            gen_dir = os.path.join(args.output_dir, "evaluation/generated")
            if host_index == 0:
                fidlib.setup_evaluation(dataset, real_dir,
                                        target_size=m.target_size,
                                        num_real=args.num_real_imgs)
                print(f"[eval-t] setup_evaluation_s="
                      f"{time.perf_counter() - _et0:.1f}", flush=True)
            fcfg = m.field_config()
            ecfg = m.eval_render_config(
                img_size=min(128, m.target_size), ray_chunk=4096)
            # local-shard fetch: device_get here would dispatch a Gloo
            # all-gather whose timing must line up across hosts (it was the
            # rehearsal deadlock); the EMA params are replicated, so each
            # host reads its own copy.
            ema_params = sharding.local_get(state.ema.params)

            def render_batch(k, n):
                kg, ka = jax.random.split(k)
                zg = jax.random.normal(kg, (n, m.latent_geo_dim))
                za = jax.random.normal(ka, (n, m.latent_app_dim))
                out = eval_render(ema_params, fcfg, ecfg, k, zg, za, psi=1.0)
                return out["pixels"][:, -3:]

            _et1 = time.perf_counter()
            fidlib.output_images(render_batch, gen_dir,
                                 num_eval=args.num_eval_imgs,
                                 host_index=host_index, n_hosts=n_hosts)
            _et2 = time.perf_counter()
            print(f"[eval-t] output_images_s={_et2 - _et1:.1f}", flush=True)
            if host_index == 0:
                try:
                    if os.environ.get("FENERF_FID_SCORER") == "subprocess":
                        # TPU-host scoring mode: a fresh subprocess picks up
                        # the host's default platform (the chip), sidestepping
                        # this process's platform pin. CPU scoring runs
                        # ~0.44 s/image — >1 h at the protocol's 10k images,
                        # which blows the 20-min barrier default; on-chip
                        # scoring restores it (eval/score_fid.py).
                        fid = _score_fid_subprocess(real_dir, gen_dir)
                    else:
                        fid = fidlib.calculate_fid(real_dir, gen_dir)
                    with open(os.path.join(args.output_dir, "fid.txt"),
                              "a") as f:
                        f.write(f"\n{step}:{fid}")
                    print(f"[eval-t] calculate_fid_s="
                          f"{time.perf_counter() - _et2:.1f}", flush=True)
                    print(f"[fid] step={step} fid={fid:.3f}")
                except (FileNotFoundError, NotImplementedError) as e:
                    print(f"[fid] skipped: {e}")
            if n_hosts > 1:
                # host-side eval work is skewed (host 0 dumps reals and
                # scores FID, often minutes); without a barrier the faster
                # hosts hit the distributed-shutdown deadline while host 0
                # still computes (the reference syncs the same way,
                # dist.barrier() at train_double_latent_semantic.py:542,548).
                # Coordination-service barrier, NOT a device collective —
                # a gloo psum would time out at 30s under that same skew.
                _et3 = time.perf_counter()
                _host_barrier(f"fenerf_eval_{step}")
                print(f"[eval-t] barrier_wait_s="
                      f"{time.perf_counter() - _et3:.1f} total_eval_s="
                      f"{time.perf_counter() - _et0:.1f}", flush=True)

    if host_index == 0:
        ckpt.save(os.path.join(args.output_dir, "train_state.npz"), state)
        stats.dump(os.path.join(args.output_dir, "stats.json"))
        print("training complete")


if __name__ == "__main__":
    main()
