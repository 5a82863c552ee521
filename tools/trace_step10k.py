"""Op-level attribution of the 10k-body bench step via a JAX profiler trace.

Runs the exact bench.py workload for a few steps under jax.profiler.trace,
then parses the trace.json.gz and prints the top ops by total device time,
grouped by tf_op (the HLO op metadata name).  This is the honest breakdown —
standalone per-phase jits are dispatch-dominated and mislead at this size.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from substrata_tpu.physics.step import physics_step

import bench


def main():
    w = bench.build_world()
    cfg, params, sw, hull_cv = w.config, w.params, w.static_world, w._hull_contact_verts
    dt = jnp.float32(1 / 60)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def run_step(body, c, pc):
        nb, nc, npc, _, _ = physics_step(body, sw, hull_cv, dt, params, cfg, c, pc)
        return nb, nc, npc

    state, cache, pcache = w.state, w.solver_cache, w.pair_cache
    for _ in range(40):
        state, cache, pcache = run_step(state, cache, pcache)
    _ = float(np.asarray(state.pos)[0, 0])

    trace_dir = "/tmp/substrata_trace10k"
    with jax.profiler.trace(trace_dir):
        for _ in range(12):
            state, cache, pcache = run_step(state, cache, pcache)
        _ = float(np.asarray(state.pos)[0, 0])

    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)

    # Keep events from the TensorCore op track (device-side, has tf_op args).
    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        top = args.get("tf_op") or args.get("name") or ev.get("name", "")
        if not args.get("tf_op"):
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        total += dur
        by_op[top] += dur
        # Category: fusion kind prefix of the event name (fusion/copy/etc).
        by_cat[ev.get("name", "?").split(".")[0]] += dur

    n_steps = 12
    print(f"total device time: {total:.2f} ms over {n_steps} steps "
          f"= {total / n_steps:.2f} ms/step\n")
    print("top tf_ops (ms/step):")
    for op, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms / n_steps:7.3f}  {op}")
    print("\nby event-name prefix (ms/step):")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms / n_steps:7.3f}  {cat}")


if __name__ == "__main__":
    main()
