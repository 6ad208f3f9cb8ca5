"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware.

NB: the axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
jax.config.update is authoritative, and XLA_FLAGS must be set before the
CPU backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
