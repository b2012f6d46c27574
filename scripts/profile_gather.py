"""Texture-gather experiments (ROADMAP #2: the gather is ~34% of the
flagship render; PROFILE_FIELD measured ~51M rows/s with random indices).

Questions answered, all in-dispatch on the real chip:

  rand_bf16      baseline: random rows from the (97^3, 256) bf16 table
  sorted_bf16    same rows pre-sorted — does locality speed the gather?
                 (if >>, a bucket-by-cell scheme could pay for itself)
  iota_bf16      fully sequential rows — the absolute locality ceiling
  rand_i32view   table bitcast to (N, 128) int32 — fewer lanes per row,
                 same bytes: is the gather lane-count-bound or row-bound?
  rand_f32       512-ch f32 rows (2x bytes) — is it bytes-bound or
                 row-count-bound?
  rand_half      128-ch bf16 rows (half bytes)

Writes PROFILE_GATHER.json. Run alone (one TPU process at a time).
"""
from __future__ import annotations

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

ROWS = 97 * 97 * 97
N = 1 << 20
ITERS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(table, idx, label):
    # table/idx are jit ARGUMENTS: closing over the table embeds ~0.5GB of
    # literals in the HLO, which the remote compile server rejects (HTTP 413)
    @jax.jit
    def run(tbl, idx0):
        def body(_, carry):
            s, i = carry
            rows = jnp.take(tbl, i, axis=0)
            # data dependency on the index vector so iterations serialize
            return (s + rows.astype(jnp.float32).sum(),
                    (i + jnp.int32(1)) % ROWS)
        return jax.lax.fori_loop(0, ITERS, body,
                                 (jnp.zeros((), jnp.float32), idx0))

    out = run(table, idx)
    jax.tree.map(lambda t: t.block_until_ready(), out)
    t0 = time.perf_counter()
    out = run(table, idx)
    jax.tree.map(lambda t: t.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / ITERS
    mrows = N / dt / 1e6
    log(f"{label}: {dt * 1e3:.2f} ms, {mrows:.1f} Mrows/s")
    return round(mrows, 1)


def main():
    log(f"devices: {jax.devices()}")
    k = jax.random.key(0)
    table = jax.random.normal(k, (ROWS, 256), dtype=jnp.bfloat16)
    idx_rand = jax.random.randint(jax.random.fold_in(k, 1), (N,), 0, ROWS)
    idx_sorted = jnp.sort(idx_rand)

    res = {}
    res["rand_bf16"] = timed(table, idx_rand, "rand_bf16")
    res["sorted_bf16"] = timed(table, idx_sorted, "sorted_bf16")
    res["iota_bf16"] = timed(table, jnp.arange(N, dtype=jnp.int32) % ROWS,
                             "iota_bf16")
    res["rand_i32view"] = timed(
        jax.lax.bitcast_convert_type(
            table.reshape(ROWS, 128, 2), jnp.int32).reshape(ROWS, 128),
        idx_rand, "rand_i32view")
    res["rand_f32"] = timed(table.astype(jnp.float32), idx_rand, "rand_f32")
    res["rand_half"] = timed(table[:, :128], idx_rand, "rand_half")

    with open(os.path.join(REPO, "PROFILE_GATHER.json"), "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    log(json.dumps(res))


if __name__ == "__main__":
    main()
