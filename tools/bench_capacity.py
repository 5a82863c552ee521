#!/usr/bin/env python
"""Capacity-tier benchmark: physics step rate at the 65536-body capacity
tier with >= 32k live bodies (VERDICT r4 ask 8 — capacity parity with
PhysicsWorld.cpp:492-506, Jolt's 65536 max bodies, needs a NUMBER, not just
the correctness test in tests/test_capacity.py).

Same honesty rules as bench.py: sustained churn kicks so island sleep
cannot flatter the number, awake-fraction reporting, host-readback timing,
overflow counters.  Physics-only (the capacity tier stresses the broadphase
16-bit slot packing + uint32 pair keys; audio is capacity-independent).

Prints ONE JSON line.  SUBSTRATA_BENCH_SMOKE=1 shrinks for a CPU check.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import jax

from substrata_tpu.runtime.jax_cache import bench_cache_dir
jax.config.update("jax_compilation_cache_dir", bench_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
if os.environ.get("SUBSTRATA_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SUBSTRATA_BENCH_PLATFORM"])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SMOKE = os.environ.get("SUBSTRATA_BENCH_SMOKE", "") not in ("", "0")
CAPACITY = 2_048 if _SMOKE else 65_536
N_BODIES = 900 if _SMOKE else 32_768
DT = 1.0 / 60.0
CHURN_PERIOD = 30
CHUNK = 3
BASELINE = 60.0


def build_world():
    from substrata_tpu.physics import shapes
    from substrata_tpu.physics.state import MotionType, SimConfig
    from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

    cfg = SimConfig(
        capacity=CAPACITY,
        max_pairs=4_096 if _SMOKE else 49_152,
        grid_dim=32 if _SMOKE else 160,
        cell_size=1.4,
        cell_capacity=6,
        solver_iters=7,
        pairs_per_body=10,
        pair_rebuild_interval=6,
        max_active_contacts=8_192 if _SMOKE else 110_592,
        contacts_per_body=12,
    )
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    rng = np.random.default_rng(0)
    # Same workload shape as bench.py scaled up: 3 settling layers of boxes
    # over a wide area (~180x180 m at 32k bodies).
    layers = 3
    side = int(np.ceil((N_BODIES / layers) ** 0.5))
    n = 0
    for iz in range(layers):
        for ix in range(side):
            for iy in range(side):
                if n >= N_BODIES:
                    break
                pos = np.array([
                    (ix - side / 2) * 1.7 + rng.uniform(-0.15, 0.15),
                    (iy - side / 2) * 1.7 + rng.uniform(-0.15, 0.15),
                    0.6 + iz * 1.2,
                ], np.float32)
                w.add_object(PhysicsObject(
                    shape=shapes.make_box([0.4, 0.4, 0.4]),
                    pos=pos,
                    motion_type=int(MotionType.DYNAMIC)))
                n += 1
    w._flush()
    return w


def main():
    _T0 = time.perf_counter()

    def mark(msg):
        print(f"# bench_capacity: {msg} ({time.perf_counter() - _T0:.0f}s)",
              file=sys.stderr, flush=True)

    mark(f"devices: {jax.devices()}")
    from substrata_tpu.physics.step import physics_step

    w = build_world()
    mark(f"world built: {N_BODIES} bodies, capacity {CAPACITY}")
    cfg, params, sw, hull_cv = w.config, w.params, w.static_world, \
        w._hull_contact_verts

    def _kick_body(state, key):
        kick = jax.random.uniform(key, state.linvel.shape, jnp.float32,
                                  -1.5, 1.5).at[:, 2].mul(0.5)
        dyn = state.alive & state.dynamic
        return state.replace(
            linvel=jnp.where(dyn[:, None], state.linvel + kick, state.linvel),
            awake=state.awake | dyn,
            sleep_timer=jnp.where(dyn, 0.0, state.sleep_timer))

    @partial(jax.jit, static_argnames=("pattern", "kick"),
             donate_argnums=(0, 1, 2))
    def run_chunk(body, cache, pcache, key, pattern, kick):
        overflow = jnp.int32(0)
        for i, rb in enumerate(pattern):
            if kick and i == 0:
                body = _kick_body(body, key)
            body, cache, pcache, ev, diags = physics_step(
                body, sw, hull_cv, jnp.float32(DT), params, cfg, cache,
                pcache, rebuild_pairs=rb, has_oversize=False)
            overflow = overflow + ev.broadphase_overflow
        return body, cache, pcache, diags, overflow

    state, cache, pcache = w.state, w.solver_cache, w.pair_cache
    key = jax.random.PRNGKey(7)
    assert CHURN_PERIOD % CHUNK == 0 and cfg.pair_rebuild_interval % CHUNK == 0
    churn_chunks = CHURN_PERIOD // CHUNK

    def drive(n_chunks, collect=None):
        nonlocal state, cache, pcache, key
        g = 0
        for c in range(n_chunks):
            kick = c % churn_chunks == 0
            if kick:
                key, sub = jax.random.split(key)
                g = 0
            else:
                sub = key
            pattern = tuple((g + i) % cfg.pair_rebuild_interval == 0
                            for i in range(CHUNK))
            g += CHUNK
            state, cache, pcache, diags, ov = run_chunk(
                state, cache, pcache, sub, pattern, kick)
            if collect is not None:
                collect.append((diags, ov))

    mark("warmup")
    drive(12)
    _ = float(np.asarray(state.pos)[0, 0])
    mark("warmup done")

    chunks = 10 if _SMOKE else 40
    log = []
    t0 = time.perf_counter()
    drive(chunks, collect=log)
    _ = float(np.asarray(state.pos)[0, 0])   # host readback = honest timing
    steps_per_sec = chunks * CHUNK / (time.perf_counter() - t0)
    mark(f"timed window done: {steps_per_sec:.1f} steps/s")

    awake = np.array([int(np.asarray(d.num_awake)) for d, _ in log[::4]])
    contacts = np.array([int(np.asarray(d.num_contacts)) for d, _ in log[::4]])
    pairs = np.array([int(np.asarray(d.num_pairs)) for d, _ in log[::4]])
    overflow = np.array([int(np.asarray(ov)) for _, ov in log[::4]])

    print(json.dumps({
        "metric": (f"physics step rate at the {CAPACITY}-capacity tier, "
                   f"{N_BODIES} live bodies (sustained churn)"),
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE, 3),
        "capacity": CAPACITY,
        "live_bodies": N_BODIES,
        "awake_frac_mean": round(float(awake.mean()) / N_BODIES, 3),
        "contacts_mean": int(contacts.mean()),
        "pairs_demand_mean": int(pairs.mean()),
        "pairs_capacity": int(cfg.max_pairs),
        "overflow_per_step_mean": round(float(overflow.mean()) / CHUNK, 1),
    }))


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        if "backend" in str(e).lower() or "unavailable" in str(e).lower():
            print(json.dumps({
                "metric": "capacity-tier step rate (TPU backend unavailable)",
                "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
                "error": str(e)[:200]}))
            raise SystemExit(1)
        raise
