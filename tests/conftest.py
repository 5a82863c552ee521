"""Test configuration: force CPU with 8 virtual devices so tests are fast and
sharding tests can exercise a multi-chip mesh without TPU hardware.

The axon TPU plugin's sitecustomize calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
overrides the JAX_PLATFORMS env var — so we must re-update the config here
(backends initialise lazily; this runs before any computation).
The driver's bench/dryrun entry points use the real platform config.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
