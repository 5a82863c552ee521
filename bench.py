#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

North-star metric (BASELINE.json): physics steps/sec at 10k bodies (target:
>= 60 Hz real time on one TPU v5e chip; Jolt-backed reference designs for
60 Hz substeps, gui_client/GUIClient.cpp:6365-6368).

Honesty guards (round-3):
- sustained churn: every CHURN_PERIOD steps ALL dynamic bodies get a random
  velocity kick, so island sleep cannot flatter the number — the JSON
  reports awake_frac_mean over the timed window (target >= 0.9).
- overflow counters from the step are surfaced.
- timing ends with a host readback (axon under-reports otherwise).

Broadphase rebuild/reuse is host-scheduled between two compiled variants
(physics_step(rebuild_pairs=...)): the host reads pair_cache.steps_left one
step behind the device (never stalling the dispatch queue) and reconciles
its prediction; an on-device lax.cond costs ~2.5 ms/step of branch
machinery + copies even on pure-reuse steps.
"""

import json
from functools import partial
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.step import physics_step
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

N_BODIES = 10_000
DT = 1.0 / 60.0
BASELINE_STEPS_PER_SEC = 60.0  # real-time 60 Hz = reference design rate
CHURN_PERIOD = 30              # steps between velocity kicks (0.5 s)


def build_world():
    cfg = SimConfig(
        capacity=10_240,
        max_pairs=16_384,
        grid_dim=128,
        cell_size=1.4,
        cell_capacity=6,
        # 7 FISTA-accelerated iterations match 8 plain ones on the quality
        # gates (max_pen 0.07 at 10k, fidelity suite green); Jolt's 10
        # sequential-impulse iterations are not 1:1 comparable.
        solver_iters=7,
        pairs_per_body=10,
        pair_rebuild_interval=6,
        max_active_contacts=36_864,
        contacts_per_body=12,
    )
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    rng = np.random.default_rng(0)
    # 10k interacting boxes in 3 settling layers over a ~70x70 m area —
    # the reference's workload shape (12k-object world spread over the map,
    # README.md:42), not a single pathological deep pile.
    n = 0
    layers = 3
    side = int(np.ceil((N_BODIES / layers) ** 0.5))
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


@partial(jax.jit, donate_argnums=(0,))
def _kick(state, key):
    """Churn: random velocity kick to every dynamic body + full wake."""
    kick = jax.random.uniform(key, state.linvel.shape, jnp.float32,
                              -1.5, 1.5).at[:, 2].mul(0.5)
    dyn = state.alive & state.dynamic
    return state.replace(
        linvel=jnp.where(dyn[:, None], state.linvel + kick, state.linvel),
        awake=state.awake | dyn,
        sleep_timer=jnp.where(dyn, 0.0, state.sleep_timer),
    )


class RebuildScheduler:
    """Host-side broadphase cadence with periodic device reconciliation.

    The device computes the safe reuse window at each rebuild
    (broadphase._pairs_rebuild: margins cover vmax over `window` steps).
    Reading it back EVERY step would cost a ~10 ms round trip per step on
    the remote TPU runtime (the same reason PhysicsWorld uses a packed
    event digest), so the host runs a fixed cadence from the last learned
    window and reconciles only at force() points (the churn kicks, which
    invalidate pairs anyway).  Kick speeds (~2.6 m/s) keep the true window
    at the interval clamp, so the cadence matches the device's own
    schedule; scenes above ~25 m/s would need per-step reconciliation
    (PhysicsWorld.think does exactly that via the digest)."""

    def __init__(self, interval):
        self.interval = interval
        self.window_est = 1       # conservative until first reconcile
        self.phase = 0            # steps since last rebuild; 0 -> rebuild
        self._last_rebuild_sl = None   # device scalar from last rebuild step

    def decide(self) -> bool:
        return self.phase == 0

    def after_dispatch(self, rebuilt: bool, steps_left_dev):
        if rebuilt:
            self._last_rebuild_sl = steps_left_dev
        self.phase += 1
        if self.phase >= self.window_est:
            self.phase = 0

    def force(self):
        """Rebuild next step + reconcile window_est from the device."""
        self.phase = 0
        if self._last_rebuild_sl is not None:
            self.window_est = max(1, int(np.asarray(self._last_rebuild_sl)) + 1)
            self._last_rebuild_sl = None


def main():
    w = build_world()
    cfg = w.config
    params = w.params
    sw = w.static_world
    hull_cv = w._hull_contact_verts

    # NOTE: a lax.scan over the step makes XLA compile time pathological at
    # this size; per-step dispatch (~2 ms) is negligible against the step
    # itself, so we drive steps from the host loop.
    @partial(jax.jit, static_argnames=("rebuild",), donate_argnums=(0, 1, 2))
    def run_step(body, cache, pcache, rebuild):
        nb, nc, npc, _, diags = physics_step(
            body, sw, hull_cv, jnp.float32(DT), params, cfg, cache, pcache,
            rebuild_pairs=rebuild)
        # steps_left returned as its own buffer: the scheduler holds it
        # across the next call, which donates (and so deletes) npc itself.
        return nb, nc, npc, diags, npc.steps_left + 0

    state, cache, pcache = w.state, w.solver_cache, w.pair_cache
    sched = RebuildScheduler(cfg.pair_rebuild_interval)
    key = jax.random.PRNGKey(7)

    def drive(n_steps, collect=None):
        nonlocal state, cache, pcache, key
        for k in range(n_steps):
            if k % CHURN_PERIOD == 0:
                key, sub = jax.random.split(key)
                state = _kick(state, sub)
                sched.force()           # kicked bodies invalidate pairs
            rb = sched.decide()
            state, cache, pcache, diags, sl = run_step(state, cache, pcache, rb)
            sched.after_dispatch(rb, sl)
            if collect is not None:
                collect.append(diags)

    # Warm-up: compile both variants + settle the dispatch queue.
    drive(40)
    _ = float(np.asarray(state.pos)[0, 0])

    steps = 120  # two churn cycles in the timed window
    diags_log = []
    t0 = time.perf_counter()
    drive(steps, collect=diags_log)
    _ = float(np.asarray(state.pos)[0, 0])  # real sync
    dt_wall = time.perf_counter() - t0
    steps_per_sec = steps / dt_wall

    awake = np.array([int(np.asarray(d.num_awake)) for d in diags_log[::10]])
    contacts = np.array([int(np.asarray(d.num_contacts)) for d in diags_log[::10]])
    n_dyn = N_BODIES

    print(json.dumps({
        "metric": f"physics steps/sec at {N_BODIES} bodies (sustained churn)",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
        "awake_frac_mean": round(float(awake.mean()) / n_dyn, 3),
        "awake_frac_min": round(float(awake.min()) / n_dyn, 3),
        "contacts_mean": int(contacts.mean()),
    }))


if __name__ == "__main__":
    main()
