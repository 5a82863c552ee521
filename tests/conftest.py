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
# Silence the benign XLA:CPU AOT-cache "machine feature" mismatch spam
# (prefer-no-gather/scatter are compiler pseudo-features, not ISA bits).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# Lock-discipline checks (shared/guarded.py — the reference's GUARDED_BY
# thread-safety-annotation analogue): on for the whole suite so any access
# to a world-state container without its lock fails loudly.
os.environ.setdefault("SUBSTRATA_LOCK_CHECKS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is dominated by repeated XLA compiles
# of small jitted programs; with the cache warm it runs several times
# faster.  CPU tests get their OWN cache dir, separate from the TPU bench
# cache: XLA:CPU entries are AOT executables whose embedded machine-feature
# list must match the loading process exactly — mixed-config processes
# sharing one dir produced intermittent SIGSEGV at cache-read
# (cpu_aot_loader "machine feature ... not supported ... SIGILL" warnings
# are the benign tail of the same mismatch).
from substrata_tpu.runtime.jax_cache import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the number of live XLA:CPU executables in the suite process.

    A full-suite run accumulates hundreds of loaded AOT executables; at
    that point DESERIALISING one more persistent-cache entry segfaulted
    deterministically inside cpu_aot_loader (reproduced 4x at the same
    test; the same read works in a fresh process).  Dropping the
    in-memory executable caches between modules keeps the loaded count
    low; reloads stay cheap via the persistent cache."""
    yield
    jax.clear_caches()
