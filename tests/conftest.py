"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests exercise the TPU code paths (jit, shard_map, pallas-in-interpret-mode) on host CPU
so they are hermetic and fast; the real-chip path is covered by bench.py and the driver's
compile checks.

Note: this image's sitecustomize registers the `axon` TPU backend at interpreter start
and force-sets `jax_platforms="axon,cpu"` via jax.config (overriding JAX_PLATFORMS), so
we must override the *config* here, before any backend initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
