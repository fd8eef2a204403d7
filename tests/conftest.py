"""Test configuration: run JAX on CPU with 8 virtual devices and f64 enabled.

Tests validate numerics and sharding without TPU hardware; the bench and the
driver's compile checks exercise the real chip.
"""

import os

# The session environment may export JAX_PLATFORMS=axon (TPU tunnel);
# tests must run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
