"""Op-level attribution of the 10k-body bench step via a JAX profiler trace.

Runs the bench.py churn workload (all bodies awake) for a few steps under
jax.profiler.trace, then parses the trace.json.gz and prints the top ops by
total device time, grouped by tf_op.  Reuse and rebuild broadphase variants
are traced as separate programs (host-scheduled, bench.RebuildScheduler).
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

    @partial(jax.jit, static_argnames=("rebuild",), donate_argnums=(0, 1, 2))
    def run_step(body, c, pc, rebuild):
        nb, nc, npc, _, diags = physics_step(body, sw, hull_cv, dt, params,
                                             cfg, c, pc, rebuild_pairs=rebuild)
        return nb, nc, npc, diags

    state, cache, pcache = w.state, w.solver_cache, w.pair_cache
    key = jax.random.PRNGKey(7)
    sched = bench.RebuildScheduler(cfg.pair_rebuild_interval)
    for k in range(60):
        if k % bench.CHURN_PERIOD == 0:
            key, sub = jax.random.split(key)
            state = bench._kick(state, sub)
            sched.force()
        rb = sched.decide()
        state, cache, pcache, diags = run_step(state, cache, pcache, rb)
        # warm-up only needs both variants compiled; fixed cadence is fine
        sched.window_est = cfg.pair_rebuild_interval
        sched.after_dispatch(rb, jnp.int32(cfg.pair_rebuild_interval - 1))
    _ = float(np.asarray(state.pos)[0, 0])
    print("awake:", int(np.asarray(diags.num_awake)),
          "contacts:", int(np.asarray(diags.num_contacts)))

    trace_dir = "/tmp/substrata_trace10k"
    # Trace a rebuild-every-6 pattern explicitly: 2 rebuilds + 10 reuses.
    pattern = ([True] + [False] * 5) * 2
    with jax.profiler.trace(trace_dir):
        for rb in pattern:
            state, cache, pcache, diags = run_step(state, cache, pcache, rb)
        _ = float(np.asarray(state.pos)[0, 0])

    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)

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
        by_cat[ev.get("name", "?").split(".")[0]] += dur

    n_steps = len(pattern)
    print(f"total device time: {total:.2f} ms over {n_steps} steps "
          f"(2 rebuild + 10 reuse) = {total / n_steps:.2f} ms/step\n")
    print("top tf_ops (ms/step):")
    for op, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms / n_steps:7.3f}  {op}")
    print("\nby event-name prefix (ms/step):")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms / n_steps:7.3f}  {cat}")


if __name__ == "__main__":
    main()
