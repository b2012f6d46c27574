"""Data-parallel training over a device mesh.

The reference's only distributed feature is DDP data parallelism over gloo
(train_double_latent_semantic.py:58-63,148-150; SURVEY.md §2.3). The TPU
equivalent is one jitted SPMD program over a 1-D 'data' mesh: parameters and
optimizer state replicated, the batch (and per-step RNG-derived fakes)
sharded on 'data', gradient all-reduce inserted by XLA over ICI — no
explicit psum, no barriers, no rank bookkeeping.

Multi-host: jax.distributed.initialize() + per-host data loading replace
init_process_group + DistributedSampler; everything below is unchanged
because jit compiles against the global mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fenerf_tpu.train import loop as looplib
from fenerf_tpu.train.curriculum import StageMeta


def data_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def host_barrier(name: str, timeout_ms: int | None = None) -> None:
    """Cross-host rendezvous over the coordination service (pure gRPC).

    Deliberately NOT a device collective: gloo (the CPU collectives
    backend) gives every fresh communicator clique a hard ~30s rendezvous
    window, so a psum-style barrier would itself be subject to the very
    compile-skew race it is meant to close. The coordination-service
    barrier has an explicit long deadline and compiles nothing.

    The default 20min deadline covers every compile observed on this stack;
    cold caches on big stages can exceed it — raise via
    FENERF_BARRIER_TIMEOUT_MS rather than letting the fleet die at a fence.

    The coordination client lives behind a private module (jax._src
    .distributed — no public handle exists as of jax 0.9); if a JAX upgrade
    moves it, we fall back to jax.experimental.multihost_utils
    .sync_global_devices (public, but a device collective, hence subject to
    the 30s clique window above) and warn ONCE rather than dying in the
    multihost-only path no CI fleet exercises.
    """
    import os as _os
    import warnings

    if timeout_ms is None:
        timeout_ms = int(_os.environ.get("FENERF_BARRIER_TIMEOUT_MS",
                                         1_200_000))
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed
        client = distributed.global_state.client
    except (ImportError, AttributeError) as e:  # private API moved
        warnings.warn(
            f"coordination-service barrier unavailable ({e!r}); falling "
            "back to sync_global_devices (device collective — long compile "
            "skews may exceed its rendezvous window)", RuntimeWarning,
            stacklevel=2)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
        return
    if client is not None:
        client.wait_at_barrier(name, timeout_ms)


def shard_batch(mesh: Mesh, *arrays):
    """Place per-example arrays with the batch axis split over 'data'.

    Single process: arrays carry the full global batch. Multi-process
    (jax.distributed): each host passes its LOCAL shard of the batch
    (global_batch / process_count examples, loaded disjointly per host —
    the DistributedSampler replacement) and the global array is assembled
    across hosts."""
    sh = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        out = tuple(jax.make_array_from_process_local_data(sh, np.asarray(a))
                    for a in arrays)
    else:
        out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def local_get(tree):
    """Collective-free device_get for replicated trees (multi-host safe).

    See checkpoint.to_local_np: device_get on a global array triggers a
    Gloo/ICI all-gather, which deadlocks when only some hosts call it."""
    from fenerf_tpu.utils.checkpoint import to_local_np
    return jax.tree_util.tree_map(to_local_np, tree)


def check_replica_consistency(tree, mesh: Mesh, atol: float = 0.0) -> None:
    """Assert replicated values are bit-identical across devices — the SPMD
    analogue of the reference's (vendored, uncalled) check_ddp_consistency
    (siren/torch_utils/misc.py:178-190). Useful after manual device_puts or
    host-side state surgery; SPMD programs cannot diverge on their own."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            diff = np.abs(np.asarray(s.data) - ref).max() if ref.size else 0.0
            if diff > atol:
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                raise AssertionError(
                    f"replica divergence at {name}: device {s.device} "
                    f"differs by {diff}")


def jit_train_step_sharded(meta: StageMeta, mesh: Mesh):
    """Compile the train step against a mesh: state replicated, batch sharded.

    The per-device batch is (global batch / mesh size); XLA all-reduces the
    three gradient trees over ICI automatically.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        partial(looplib.train_step, meta=meta),
        in_shardings=(repl, data, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
