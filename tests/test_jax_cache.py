"""Host-fingerprinted XLA:CPU compile cache (runtime/jax_cache.py).

Context (VERDICT r4 weak 5): MULTICHIP dryrun tails carried cpu_aot_loader
"machine feature ... could lead to execution errors such as SIGILL"
warnings.  Two distinct causes were untangled:

1. REAL cross-host entries — this VM migrates between physical hosts, so
   a shared cache dir can hold AOT executables compiled for a different
   ISA feature set.  Fixed by keying the dir on a runtime-cpuid-derived
   fingerprint (cpu_cache_dir()).
2. A FALSE POSITIVE inherent to this XLA build: compile-time feature
   lists include the LLVM tuning pseudo-features ``+prefer-no-scatter``
   and ``+prefer-no-gather``, which load-time host detection never
   reports — so the warning fires even when an entry was written seconds
   earlier by the same process configuration on the same host (verified
   empirically; the test below is that reproduction, pinned).

The test asserts the only mismatching features on a same-host reload are
the known-benign tuning pair — a regression guard that any NEW mismatch
(a real ISA difference) fails loudly.
"""

import os
import re
import subprocess
import sys

import pytest

from substrata_tpu.runtime.jax_cache import cpu_cache_dir, host_cpu_fingerprint

_BENIGN = {"prefer-no-scatter", "prefer-no-gather"}

_CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache_dir!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum())
print(float(f(jnp.ones((64, 64)))))
"""


def test_fingerprint_is_stable_and_dir_created():
    fp = host_cpu_fingerprint()
    assert re.fullmatch(r"[0-9a-f]{10}", fp)
    assert host_cpu_fingerprint() == fp
    d = cpu_cache_dir()
    assert d.endswith(fp) and os.path.isdir(d)


@pytest.mark.slow
def test_same_host_reload_mismatches_only_benign_tuning_features(tmp_path):
    """Write a cache entry, reload it in a fresh process, and verify every
    cpu_aot_loader feature-mismatch line names ONLY the known-benign XLA
    tuning pseudo-features.  A real ISA mismatch (the SIGILL risk the
    fingerprint scheme exists to prevent) makes this fail."""
    cache = str(tmp_path / "jc")
    os.makedirs(cache)
    env = dict(os.environ)
    src = _CHILD.format(cache_dir=cache)
    for i in range(2):
        r = subprocess.run([sys.executable, "-c", src], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
    # Second run loaded AOT entries; collect its mismatch complaints.
    feats = set()
    for line in r.stderr.splitlines():
        m = re.search(r"Target machine feature \+([\w.-]+) is not", line)
        if m:
            feats.add(m.group(1))
    assert feats <= _BENIGN, (
        f"REAL machine-feature mismatch on same-host cache reload: "
        f"{feats - _BENIGN} — the CPU-cache fingerprint failed to isolate "
        f"a cross-host AOT entry")
