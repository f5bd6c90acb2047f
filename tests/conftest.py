"""Test configuration: force a virtual 8-device CPU mesh.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so the platform
must be pinned through jax.config before any device query. XLA_FLAGS
must be set before jax initializes its CPU client.
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
