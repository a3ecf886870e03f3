"""Test configuration: force the CPU backend with 8 virtual devices so kernel
tests and multi-chip sharding tests run without touching the (single,
exclusively-claimed) TPU tunnel.

Note: the environment's sitecustomize registers the axon TPU plugin in every
process and sets ``jax.config.jax_platforms = "axon,cpu"``, which overrides
the JAX_PLATFORMS env var — so we must update the config, not the env.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
