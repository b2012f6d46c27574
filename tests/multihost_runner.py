"""Subprocess target for the two-process multihost test (test_multihost.py).

Each process owns 2 virtual CPU devices; jax.distributed.initialize forms a
4-device global mesh across the two processes — the container-level stand-in
for a multi-host TPU pod. This is the TPU replacement for the reference's
mp.spawn + gloo process group (train_double_latent_semantic.py:58-63).

Runs 2 sharded GAN train steps on a deterministic synthetic global batch
(each process contributes its disjoint half via shard_batch) and writes a
checksum of the replicated generator params + final metrics per process.
"""
import dataclasses
import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np

    from fenerf_tpu.train import loop as looplib
    from fenerf_tpu.train import sharding
    from fenerf_tpu.train.curriculum import get_curriculum

    assert jax.process_count() == nproc, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 2 * nproc, f"{n_global} global devices"
    assert len(jax.local_devices()) == 2

    meta = dataclasses.replace(
        get_curriculum("smoke").at_step(0),
        batch_size=8, batch_split=1, img_size=8, num_steps=2,
        latent_geo_dim=8, latent_app_dim=8,
        field_overrides=(("hidden_dim", 16), ("map_hidden_dim", 16)))

    mesh = sharding.data_mesh()
    state = looplib.init_train_state(jax.random.key(0), meta)
    state = sharding.replicate(mesh, state)
    sharding.check_replica_consistency(state.g_params, mesh)
    step_fn = sharding.jit_train_step_sharded(meta, mesh)

    # deterministic synthetic GLOBAL batch; this host contributes the slice
    # matching its devices' position in the mesh (process-major device order)
    rng = np.random.RandomState(0)
    imgs_g = (rng.rand(8, 3, 8, 8).astype(np.float32)) * 2 - 1
    labels_g = (rng.rand(8, 18, 8, 8).astype(np.float32)) * 2 - 1
    per = 8 // nproc
    imgs = imgs_g[pid * per:(pid + 1) * per]
    labels = labels_g[pid * per:(pid + 1) * per]

    scal = looplib.StepScalars(alpha=jnp.asarray(1.0),
                               noise_std=jnp.asarray(0.5),
                               topk_frac=jnp.asarray(1.0))
    for i in range(2):
        im, lb = sharding.shard_batch(mesh, imgs, labels)
        state, metrics = step_fn(state, im, lb, jax.random.key(5 + i), scal)

    # replicated arrays are fully addressable from any process
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.g_params))
    csum = sum(float(np.abs(x).sum()) for x in leaves)
    out = {"csum": csum,
           "g_loss": float(metrics["g_loss"]),
           "d_img_loss": float(metrics["d_img_loss"]),
           "step": int(state.step)}
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"proc {pid} done: {out}", flush=True)


if __name__ == "__main__":
    main()
