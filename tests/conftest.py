"""Test configuration: run JAX on CPU with 8 virtual devices.

The environment's sitecustomize registers the axon TPU plugin and force-sets
``jax_platforms='axon,cpu'`` at interpreter boot, so the env var alone is not
enough — we must update the config after importing jax. Must happen before any
backend is initialized (SURVEY.md section 4: multi-chip sharding is tested on a
virtual CPU device mesh, something the reference never needed).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
