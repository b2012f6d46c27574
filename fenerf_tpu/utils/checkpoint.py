"""Pytree checkpointing.

Replaces the reference's whole-nn.Module pickles (9 files per save,
train_double_latent_semantic.py:248-259) with a single portable .npz per
checkpoint: flattened leaf arrays + a JSON manifest of the tree structure.
No framework objects are pickled, so checkpoints are readable by any JAX/
numpy version (and by the converter tooling).
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def to_local_np(x: Any) -> np.ndarray:
    """Fetch an array value WITHOUT dispatching cross-host collectives.

    np.asarray / float() on a multi-process global jax.Array issues an
    all-gather through the distributed CPU backend (Gloo); reached from a
    host-gated branch (rank-0 logging/saving) the other hosts never join
    and the whole fleet deadlocks on a 30s connect timeout. Replicated
    (PartitionSpec()) arrays hold the full value in every local shard, so
    reading the first addressable shard is equivalent and purely local.
    Callers must only pass replicated or single-device arrays.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        # shard 0 only equals the global value if the array is replicated;
        # silently saving one shard of a sharded leaf would corrupt resumes
        assert x.sharding.is_fully_replicated, (
            f"to_local_np got a non-replicated global array "
            f"(sharding={x.sharding}); gather it (or re-shard replicated) "
            f"before checkpointing/logging"
        )
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


def _flatten_with_paths(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = to_local_np(leaf)
    return flat


def save(path: str, tree: Any) -> None:
    """Save a pytree (nested dict/list/tuple of arrays + scalars) to .npz."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": to_local_np(x) for i, x in enumerate(leaves)}
    manifest = json.dumps({"treedef": str(treedef), "n": len(leaves)})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"  # .npz suffix stops np.savez appending its own
    np.savez(tmp, __manifest__=manifest, **arrays)
    os.replace(tmp, path)


def load(path: str, like: Any) -> Any:
    """Load a pytree saved by `save`. `like` supplies the tree structure
    (e.g. a freshly-initialized state of the same config)."""
    with np.load(path, allow_pickle=False) as data:
        manifest = json.loads(str(data["__manifest__"]))
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(manifest["n"])]
    treedef = jax.tree_util.tree_structure(like)
    assert treedef.num_leaves == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, template has "
        f"{treedef.num_leaves} — config mismatch?"
    )
    return jax.tree_util.tree_unflatten(treedef, leaves)
