"""Host-fingerprinted JAX compile-cache directories.

XLA:CPU persistent-cache entries are AOT executables whose embedded
machine-feature list must match the LOADING host exactly; entries written
on a host with a different feature set (e.g. amx/avx10 present) load with
cpu_aot_loader "could lead to execution errors such as SIGILL" warnings
and have produced real SIGSEGVs at cache read.  Keying the CPU cache dir
by a digest of this host's CPU flags makes a cross-host entry impossible
to pick up: a new host simply starts a fresh cache.

The TPU cache (/root/.jax_cache) is not fingerprinted — its entries are
keyed by device kind already.
"""

from __future__ import annotations

import hashlib
import os

_CPU_CACHE_BASE = "/root/.jax_cache_cpu"


def host_cpu_fingerprint() -> str:
    """Stable 10-hex digest of this host's CPU feature flags."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not flags:
        import platform
        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def cpu_cache_dir() -> str:
    """The XLA:CPU compile-cache directory for THIS host's feature set."""
    d = f"{_CPU_CACHE_BASE}_{host_cpu_fingerprint()}"
    os.makedirs(d, exist_ok=True)
    return d


def bench_cache_dir() -> str:
    """Compile-cache dir for bench.py / tools/bench_*: the shared TPU cache
    by default, but the fingerprinted CPU cache whenever the run is forced
    onto CPU (SUBSTRATA_BENCH_PLATFORM=cpu smoke runs) — CPU AOT entries
    written into the TPU dir recreate the mixed-config SIGSEGV hazard the
    split dirs exist to prevent (CLAUDE.md)."""
    if os.environ.get("JAX_CACHE_DIR"):
        return os.environ["JAX_CACHE_DIR"]
    if os.environ.get("SUBSTRATA_BENCH_PLATFORM") == "cpu":
        return cpu_cache_dir()
    return "/root/.jax_cache"
