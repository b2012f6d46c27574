"""Test configuration: force a deterministic 8-device CPU mesh.

Multi-device sharding paths are exercised on a virtual CPU mesh
(xla_force_host_platform_device_count) — the TPU equivalent of a fake
distributed backend, which the reference never had (SURVEY.md §4).

Note: the ambient environment may pre-register a tunneled TPU backend (axon)
via sitecustomize and pin jax_platforms to it; env vars are read too early to
override, so we import jax here (before any backend is initialized) and force
the platform through jax.config.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
