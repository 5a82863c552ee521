"""Op-level attribution of the FULL bench tick (bench.py window 3) via a
JAX profiler trace: vehicles + character + physics step + particles +
Winter + audio in the one fused program, attributed by tf_op scope.

Also prints the contact-degree histogram (contacts per body) so the
incidence-table shape (SimConfig.contacts_per_body) can be sized from data.
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

from substrata_tpu.runtime.jax_cache import bench_cache_dir
jax.config.update("jax_compilation_cache_dir", bench_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

import bench
from substrata_tpu.audio.mix import default_listener, mix_block
from substrata_tpu.physics import broadphase
from substrata_tpu.physics.character import character_update
from substrata_tpu.physics.particles import particles_step
from substrata_tpu.physics.step import physics_step
from substrata_tpu.physics.vehicles.manager import (_apply_vehicle_deltas,
                                                    vehicles_update)

DT = bench.DT


def main():
    w = bench.build_world()
    cfg, params, sw = w.config, w.params, w.static_world
    hull_cv = w._hull_contact_verts
    src, pool, room = bench.build_audio()
    listener = default_listener()
    char0, vm, vinputs, ps0, winter_eval = bench.build_fulltick(w)
    src_idx = jnp.arange(bench.N_SOURCES, dtype=jnp.int32)
    vinputs_ = vinputs

    @partial(jax.jit, static_argnames=("rb",),
             donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
    def tick(body, cache, pcache, s, r, char, ps, veh, t, rb):
        table, _, _ = broadphase.build_cell_table(body, cfg)
        veh, dv, dw, slots = vehicles_update(
            veh, vinputs_, body, sw, jnp.float32(DT), params, cfg, table=table)
        body = _apply_vehicle_deltas(body, slots, dv, dw)
        move = 3.0 * jnp.array([jnp.cos(0.3 * t), jnp.sin(0.3 * t), 0.0])
        char, _cp, _j, _tc = character_update(
            char, body, sw, move, False, False, False, jnp.float32(DT),
            params, cfg, exclude_body=jnp.int32(-1), table=table)
        body, cache, pcache, ev, diags = physics_step(
            body, sw, hull_cv, jnp.float32(DT), params, cfg, cache, pcache,
            rebuild_pairs=rb, has_oversize=bool(w._oversize_slots))
        ps, _foam = particles_step(ps, body, sw, jnp.float32(DT), params,
                                   cfg, table=table)
        wsum = winter_eval(t)
        s = s.replace(pos=body.pos[src_idx], vel=body.linvel[src_idx])
        s, out, r = mix_block(s, pool, listener, room=r, use_hrtf=True,
                              block=bench.TICK_FRAMES)
        return body, cache, pcache, s, r, char, ps, veh, t + jnp.float32(DT), \
            diags, out, wsum

    state, cache, pcache = w.state, w.solver_cache, w.pair_cache
    char, ps, veh = char0, ps0, vm.veh
    t = jnp.float32(0.0)
    key = jax.random.PRNGKey(7)
    # Warm (compile both variants) + settle under churn.
    for k in range(60):
        if k % bench.CHURN_PERIOD == 0:
            key, sub = jax.random.split(key)
            state = bench._kick(state, sub)
        rb = k % cfg.pair_rebuild_interval == 0
        (state, cache, pcache, src, room, char, ps, veh, t, diags, out,
         _w) = tick(state, cache, pcache, src, room, char, ps, veh, t, rb)
    _ = float(np.asarray(state.pos)[0, 0])
    print("awake:", int(np.asarray(diags.num_awake)),
          "contacts:", int(np.asarray(diags.num_contacts)),
          "pairs:", int(np.asarray(diags.num_pairs)), flush=True)

    # Contact-degree histogram: how many tabled contacts each body sees.
    from substrata_tpu.physics import narrowphase, solver
    @jax.jit
    def degrees(body):
        pa, pb, pv, npairs, _ = broadphase.find_pairs(body, cfg)
        pc, _, _ = narrowphase.pair_contacts(body, pa, pb, pv, cfg, sw.hulls)
        sc = narrowphase.static_contacts(body, sw, hull_cv, cfg)
        cts, _ = narrowphase.compact_contacts(pc, cfg.max_active_contacts)
        n = body.capacity
        deg = (jnp.zeros((n + 1,), jnp.int32)
               .at[jnp.where(cts.valid, cts.a, n)].add(1, mode="drop")
               .at[jnp.where(cts.valid & (cts.b >= 0), cts.b, n)]
               .add(1, mode="drop"))[:n]
        n_static = jnp.sum(cts.valid & (cts.b < 0))
        return deg, n_static
    deg, n_static = degrees(state)
    deg = np.asarray(deg)
    print("static rows:", int(np.asarray(n_static)),
          "of", int(np.asarray(jnp.sum(diags.num_contacts))))
    hist = np.bincount(np.clip(deg, 0, 24))
    print("degree histogram (contacts per body):")
    for d, c in enumerate(hist):
        if c:
            print(f"  deg {d:2d}: {c}")
    for cap in (4, 6, 8, 10, 12):
        applied = np.minimum(deg, cap).sum()
        print(f"  CPB {cap:2d}: applied {applied} "
              f"({applied / max(deg.sum(), 1) * 100:.1f}% of incidences), "
              f"bodies over: {(deg > cap).sum()}")

    trace_dir = "/tmp/substrata_trace_fulltick"
    pattern = ([True] + [False] * 5) * 2
    with jax.profiler.trace(trace_dir):
        for rb in pattern:
            (state, cache, pcache, src, room, char, ps, veh, t, diags, out,
             _w) = tick(state, cache, pcache, src, room, char, ps, veh, t, rb)
        _ = float(np.asarray(state.pos)[0, 0])

    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)

    # Group device time by tick sub-component (top-level callee under tick)
    # and by op kind within the physics step.
    by_comp = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        op = args.get("tf_op")
        if not op:
            continue
        dur = ev.get("dur", 0) / 1e3
        total += dur
        parts = op.split("/")
        comp = parts[1] if len(parts) > 1 else parts[0]
        by_comp[comp] += dur
        by_op[op] += dur

    n = len(pattern)
    print(f"\ntotal device time: {total:.2f} ms over {n} ticks "
          f"= {total / n:.2f} ms/tick\n")
    print("by tick component (ms/tick):")
    for comp, ms in sorted(by_comp.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms / n:7.3f}  {comp}")
    print("\ntop ops (ms/tick):")
    for op, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms / n:7.3f}  {op}")


if __name__ == "__main__":
    main()
