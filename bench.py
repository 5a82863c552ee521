#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

North-star metric (BASELINE.json): the CONJUNCTION — 10k interacting rigid
bodies AND 256 spatial audio sources at >= 60 Hz real time on one TPU chip.
The headline is the FULL reference tick (GUIClient::timerEvent order,
gui_client/GUIClient.cpp:5918+ / SURVEY §3.1): per tick, ONE fused device
program runs vehicle controllers (8 scripted vehicles, batched wheel rays —
GUIClient.cpp:6418-6430), the player character update
(PlayerPhysics.cpp:251-469), the 10k-body physics step + buoyancy
(GUIClient.cpp:6432), a 10k-particle update (ParticleManager::think,
GUIClient.cpp:7705), a 512-instance Winter script eval batch
(Scripting.cpp:766-880), and one 800-frame (1/60 s at 48 kHz) 256-source
full-quality audio mix (AudioEngine.cpp:345-555), with audio source
positions gathered on-device from the body state (no host round trip in
the coupling).  Sub-metrics report the physics-only rate and the
physics+audio rate for continuity with rounds 1-3.

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

from substrata_tpu.runtime.jax_cache import bench_cache_dir
jax.config.update("jax_compilation_cache_dir", bench_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
# Test hook: force a platform (e.g. a bogus one) to exercise the
# outage-fallback path below without a real tunnel outage.  The axon
# sitecustomize overrides the JAX_PLATFORMS env var, so this must go
# through jax.config (CLAUDE.md).
if os.environ.get("SUBSTRATA_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SUBSTRATA_BENCH_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.step import physics_step
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

# SUBSTRATA_BENCH_SMOKE=1 shrinks the workload for a CPU logic check of
# the full bench path (the driver's real run stays 10k/256 on TPU).
_SMOKE = os.environ.get("SUBSTRATA_BENCH_SMOKE", "") not in ("", "0")
N_BODIES = 400 if _SMOKE else 10_000
N_SOURCES = 16 if _SMOKE else 256
# Particle workload: reference parity is 2048 (the reference's own hard cap,
# ParticleManager.cpp:88 MAX_NUM_PARTICLES = 2048).  The earlier 10k figure
# was a 5x stress tier; set SUBSTRATA_BENCH_PARTICLES to re-run it.
N_PARTICLES = 256 if _SMOKE else int(
    os.environ.get("SUBSTRATA_BENCH_PARTICLES", "2048"))
N_VEHICLES = 8                 # 2 each: car/bike/boat/hovercar
N_WINTER = 32 if _SMOKE else 512  # scripted-object instances per eval batch
TICK_FRAMES = 800              # 48 kHz / 60 Hz: one tick of audio per step
DT = 1.0 / 60.0
BASELINE_STEPS_PER_SEC = 60.0  # real-time 60 Hz = reference design rate
CHURN_PERIOD = 30              # steps between velocity kicks (0.5 s)
CHUNK = 3                      # ticks fused into one dispatch: the axon
                               # remote runtime costs ~2 ms of launch bubble
                               # per program, so chunking 3 ticks (+ folding
                               # the churn kick into the program) amortises
                               # it to <0.7 ms/tick.  3 divides the churn
                               # period and matches pair_rebuild_interval=6,
                               # so only chunk patterns RFF/FFF occur.


def build_audio():
    """256 looping spatial sources on the full-quality path (HRIR binaural +
    FDN room reverb — Resonance kBinauralHighQuality budget)."""
    from substrata_tpu.audio.mix import room_from_aabb, zero_sources
    rng = np.random.default_rng(1)
    src = zero_sources(N_SOURCES)
    pool = jnp.asarray(np.sin(np.arange(1 << 20) * 0.03).astype(np.float32))
    offsets = rng.integers(0, (1 << 20) - 48000, N_SOURCES)
    src = src.replace(
        alive=src.alive.at[:].set(True),
        looping=src.looping.at[:].set(True),
        buf_offset=src.buf_offset.at[:, 0].set(jnp.asarray(offsets, jnp.int32)),
        buf_len=src.buf_len.at[:, 0].set(48000),
        delta=src.delta.at[:, 0].set(jnp.asarray(
            rng.uniform(0.8, 1.25, N_SOURCES).astype(np.float32))),
        num_occlusions=jnp.asarray(
            (rng.random(N_SOURCES) < 0.2).astype(np.float32)),
    )
    room = room_from_aabb([-60, -60, 0], [60, 60, 10], reflectivity=0.6)
    return src, pool, room


def build_world():
    cfg = SimConfig(
        capacity=512 if _SMOKE else 10_240,
        max_pairs=2_048 if _SMOKE else 16_384,
        grid_dim=32 if _SMOKE else 128,
        cell_size=1.4,
        cell_capacity=6,
        # 7 FISTA-accelerated iterations match 8 plain ones on the quality
        # gates (max_pen 0.07 at 10k, fidelity suite green); Jolt's 10
        # sequential-impulse iterations are not 1:1 comparable.
        solver_iters=7,
        pairs_per_body=10,
        pair_rebuild_interval=6,
        # BODY-PAIR contact rows only: static (ground) contacts live in
        # their own overflow-proof body-blocked buffer (40,960 rows at this
        # capacity) that the solver handles densely — see
        # solver.solve_contacts (r5 redesign).
        max_active_contacts=4_096 if _SMOKE else 36_864,
        # Incidence entries are PAIRS in the blocked layout: 8 slots cover
        # the p99 body (mean tabled entries/body ~3.2 in the sustained
        # pile regime) and cut the per-iteration apply gather by a third
        # vs 12.
        contacts_per_body=8,
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


def build_fulltick(w):
    """The rest of the reference tick: 1 player character, 8 scripted
    vehicles on the first 8 boxes, 10k bouncing particles, and a Winter
    eval batch (512 instances of 2 script sources)."""
    from substrata_tpu.physics.character import init_character_state
    from substrata_tpu.physics.particles import zero_particles
    from substrata_tpu.physics.vehicles.manager import (
        BikePhysics, BoatPhysics, CarPhysics, HoverCarPhysics,
        VehicleInputs, VehicleManager)
    from substrata_tpu.scripting.winter import WinterScriptEvaluator

    char = init_character_state([0.0, 0.0, 3.0])

    vm = VehicleManager(w, capacity=N_VEHICLES)
    classes = [CarPhysics, BikePhysics, BoatPhysics, HoverCarPhysics]
    first_obs = [w.objects[s] for s in sorted(w.objects)[:N_VEHICLES]]
    for i in range(N_VEHICLES):
        classes[i % 4](vm, first_obs[i])
        vm.set_active(i, True)
    vinputs = VehicleInputs(
        forward=jnp.full((N_VEHICLES,), 0.6, jnp.float32),
        right=jnp.full((N_VEHICLES,), 0.15, jnp.float32),
        up=jnp.zeros((N_VEHICLES,), jnp.float32),
        brake=jnp.zeros((N_VEHICLES,), bool),
        handbrake=jnp.zeros((N_VEHICLES,), bool))

    rng = np.random.default_rng(3)
    ps = zero_particles(N_PARTICLES)
    ps = ps.replace(
        pos=jnp.asarray(rng.uniform([-35, -35, 1], [35, 35, 8],
                                    (N_PARTICLES, 3)).astype(np.float32)),
        vel=jnp.asarray(rng.normal(0, 2, (N_PARTICLES, 3)).astype(np.float32)),
        opacity=ps.opacity.at[:].set(1.0),
        alive=ps.alive.at[:].set(True))  # die_on_hit False: bounce forever

    evs = [WinterScriptEvaluator(
               "def evalRotation(float time, WinterEnv env) vec3 : "
               "vec3(0.0, 0.0, time * 0.5 + env.instance_index)"),
           WinterScriptEvaluator(
               "def evalTranslation(float time, WinterEnv env) vec3 : "
               "vec3(sin(time) * 2.0, cos(time * 0.7) * 2.0, 0.0)")]
    widx = jnp.arange(N_WINTER // 2, dtype=jnp.float32)

    def winter_eval(t):
        """One batched script-eval pass; summed so XLA cannot DCE it."""
        acc = jnp.float32(0.0)
        tt = jnp.broadcast_to(t, widx.shape)
        for ev in evs:
            acc = acc + jnp.sum(ev.eval_rotation(tt, widx, N_WINTER))
            acc = acc + jnp.sum(ev.eval_translation(tt, widx, N_WINTER))
        return acc

    return char, vm, vinputs, ps, winter_eval


def _kick_body(state, key):
    """Churn: random velocity kick to every dynamic body + full wake."""
    kick = jax.random.uniform(key, state.linvel.shape, jnp.float32,
                              -1.5, 1.5).at[:, 2].mul(0.5)
    dyn = state.alive & state.dynamic
    return state.replace(
        linvel=jnp.where(dyn[:, None], state.linvel + kick, state.linvel),
        awake=state.awake | dyn,
        sleep_timer=jnp.where(dyn, 0.0, state.sleep_timer),
    )


_kick = jax.jit(_kick_body, donate_argnums=(0,))


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
    import sys

    _T0 = time.perf_counter()

    def mark(msg):
        print(f"# bench: {msg} ({time.perf_counter() - _T0:.0f}s)",
              file=sys.stderr, flush=True)

    mark(f"devices: {jax.devices()}")
    from substrata_tpu.audio.mix import default_listener, mix_block
    from substrata_tpu.physics import broadphase
    from substrata_tpu.physics.character import character_update
    from substrata_tpu.physics.particles import particles_step
    from substrata_tpu.physics.vehicles.manager import (
        _apply_vehicle_deltas, vehicles_update)

    w = build_world()
    cfg = w.config
    params = w.params
    sw = w.static_world
    hull_cv = w._hull_contact_verts
    src, pool, room = build_audio()
    listener = default_listener()
    char0, vm, vinputs, ps0, winter_eval = build_fulltick(w)
    # Audio sources track the first 256 dynamic bodies; their pos/vel are
    # gathered ON DEVICE from the stepped body state (row gather of 2-D
    # operands with a flat index — the fast TPU layout) and fed straight to
    # the mix, so the physics->audio coupling never touches the host.
    src_idx = jnp.arange(N_SOURCES, dtype=jnp.int32)

    # NOTE: a lax.scan over the step makes XLA compile time pathological at
    # this size, so CHUNK ticks are unrolled per program and driven from a
    # host loop.  Everything in a tick — churn kick, vehicle controllers,
    # character update, physics step, particles, Winter eval, on-device
    # transform gather, full-quality audio mix — is inside the one program.
    @partial(jax.jit, static_argnames=("pattern", "kick", "audio", "full"),
             donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
    def run_chunk(body, cache, pcache, s, r, char, ps, veh, t, key,
                  pattern, kick, audio, full):
        overflow = jnp.int32(0)
        wsum = jnp.float32(0.0)
        outs = []
        for i, rb in enumerate(pattern):
            if kick and i == 0:
                body = _kick_body(body, key)
            if full:
                # Controllers run BEFORE think (§3.1 steps 3c/3d).  One
                # broadphase cell table per tick, shared by every ray batch
                # in the tick (vehicle wheels, character probe, particles —
                # three table builds would triple the cost for <2 cm of
                # body movement within the tick).
                table, _, _ = broadphase.build_cell_table(body, cfg)
                veh, dv, dw, slots = vehicles_update(
                    veh, vinputs, body, sw, jnp.float32(DT), params, cfg,
                    table=table)
                body = _apply_vehicle_deltas(body, slots, dv, dw)
                move = 3.0 * jnp.array([jnp.cos(0.3 * t), jnp.sin(0.3 * t),
                                        0.0])  # walking player, full speed
                char, _campos, _jumped, _touched = character_update(
                    char, body, sw, move, False, False, False,
                    jnp.float32(DT), params, cfg,
                    exclude_body=jnp.int32(-1), table=table)
            body, cache, pcache, ev, diags = physics_step(
                body, sw, hull_cv, jnp.float32(DT), params, cfg, cache,
                pcache, rebuild_pairs=rb,
                has_oversize=bool(w._oversize_slots))
            overflow = overflow + ev.broadphase_overflow
            if full:
                ps, _foam = particles_step(ps, body, sw, jnp.float32(DT),
                                           params, cfg, table=table)
                wsum = wsum + winter_eval(t)
            if audio:
                s = s.replace(pos=body.pos[src_idx], vel=body.linvel[src_idx])
                s, out, r = mix_block(s, pool, listener, room=r,
                                      use_hrtf=True, block=TICK_FRAMES)
                outs.append(out)
            t = t + jnp.float32(DT)
        out = jnp.concatenate(outs, 0) if audio else jnp.zeros((1, 2))
        return (body, cache, pcache, s, r, char, ps, veh, t, diags,
                overflow, out, wsum)

    state, cache, pcache = w.state, w.solver_cache, w.pair_cache
    char, ps, veh = char0, ps0, vm.veh
    tick_t = jnp.float32(0.0)
    key = jax.random.PRNGKey(7)
    assert CHURN_PERIOD % CHUNK == 0 and cfg.pair_rebuild_interval % CHUNK == 0
    churn_chunks = CHURN_PERIOD // CHUNK

    def drive(n_chunks, collect=None, audio=False, full=False):
        nonlocal state, cache, pcache, key, src, room, char, ps, veh, tick_t
        out = None
        g = 0   # steps since last rebuild-forcing kick
        for c in range(n_chunks):
            kick = c % churn_chunks == 0
            if kick:
                key, sub = jax.random.split(key)
                g = 0   # kicked bodies invalidate pairs: rebuild at step 0
            else:
                sub = key
            pattern = tuple((g + i) % cfg.pair_rebuild_interval == 0
                            for i in range(CHUNK))
            g += CHUNK
            (state, cache, pcache, src, room, char, ps, veh, tick_t, diags,
             ov, out, _wsum) = run_chunk(
                state, cache, pcache, src, room, char, ps, veh, tick_t, sub,
                pattern, kick, audio, full)
            if collect is not None:
                collect.append((diags, ov))
        return out

    # Warm-up: compile all chunk variants + settle the dispatch queue.
    # Progress marks go to stderr (the driver parses stdout's last line
    # only) so a tunnel hang is distinguishable from a slow compile.
    mark("warmup physics")
    drive(12)
    mark("warmup physics+audio")
    drive(12, audio=True)
    mark("warmup full tick")
    drive(12, audio=True, full=True)
    _ = float(np.asarray(state.pos)[0, 0])
    mark("warmup done")

    # Window 1: physics only (continuity with rounds 1-2).
    chunks = 10 if _SMOKE else 40  # 120 ticks = two churn cycles timed
    t0 = time.perf_counter()
    drive(chunks)
    _ = float(np.asarray(state.pos)[0, 0])  # real sync
    phys_steps_per_sec = chunks * CHUNK / (time.perf_counter() - t0)
    mark(f"window 1 done: {phys_steps_per_sec:.1f} steps/s")

    # Window 2: physics + audio (continuity with round 3).
    t0 = time.perf_counter()
    out = drive(chunks, audio=True)
    _ = float(np.asarray(state.pos)[0, 0])
    _ = float(np.asarray(out)[0, 0])
    pa_ticks_per_sec = chunks * CHUNK / (time.perf_counter() - t0)
    mark(f"window 2 done: {pa_ticks_per_sec:.1f} ticks/s")

    # Window 3 (HEADLINE): the whole reference tick — vehicles + character
    # + physics + particles + Winter + audio (§3.1 order).
    log = []
    t0 = time.perf_counter()
    out = drive(chunks, collect=log, audio=True, full=True)
    _ = float(np.asarray(state.pos)[0, 0])
    _ = float(np.asarray(out)[0, 0])
    dt_wall = time.perf_counter() - t0
    ticks = chunks * CHUNK
    ticks_per_sec = ticks / dt_wall

    awake = np.array([int(np.asarray(d.num_awake)) for d, _ in log[::4]])
    contacts = np.array([int(np.asarray(d.num_contacts)) for d, _ in log[::4]])
    pairs = np.array([int(np.asarray(d.num_pairs)) for d, _ in log[::4]])
    overflow = np.array([int(np.asarray(ov)) for _, ov in log[::4]])
    max_pen = np.array([float(np.asarray(d.max_penetration))
                        for d, _ in log[::4]])
    n_dyn = N_BODIES
    n_alive_particles = int(np.asarray(jnp.sum(ps.alive)))

    print(json.dumps({
        "metric": (f"full tick rate: {N_BODIES}-body physics + "
                   f"{N_SOURCES}-source audio + {N_PARTICLES} particles + "
                   f"{N_VEHICLES} vehicles + character + {N_WINTER} Winter "
                   f"instances (sustained churn)"),
        "value": round(ticks_per_sec, 2),
        "unit": "ticks/s",
        "vs_baseline": round(ticks_per_sec / BASELINE_STEPS_PER_SEC, 3),
        "physics_only_steps_per_sec": round(phys_steps_per_sec, 2),
        "physics_audio_ticks_per_sec": round(pa_ticks_per_sec, 2),
        "audio_ms_per_tick": round(
            (1000.0 / pa_ticks_per_sec) - (1000.0 / phys_steps_per_sec), 2),
        "fulltick_extra_ms": round(
            (1000.0 / ticks_per_sec) - (1000.0 / pa_ticks_per_sec), 2),
        "alive_particles": n_alive_particles,
        "awake_frac_mean": round(float(awake.mean()) / n_dyn, 3),
        "awake_frac_min": round(float(awake.min()) / n_dyn, 3),
        "contacts_mean": int(contacts.mean()),
        # Pair DEMAND vs capacity.  Honest comparison: Jolt's PAIR queue is
        # 65,536 (PhysicsWorld.cpp:502) and would drop none of this demand;
        # its 10,240 cap is contact MANIFOLDS of up to 4 points
        # (PhysicsWorld.cpp:505-506), comparable to our contact-row buffer.
        # Shed pairs here are the proximity-ranked shallowest; overflow
        # counts definite losses (inradius-overlapping pairs + touching
        # contact rows dropped).  max_penetration_* is the quality check
        # that the shedding does not degrade the sim (bodies do not sink).
        "pairs_demand_mean": int(pairs.mean()),
        "pairs_capacity": int(cfg.max_pairs),
        "overflow_per_step_mean": round(float(overflow.mean()) / CHUNK, 1),
        "max_penetration_mean_m": round(float(max_pen.mean()), 4),
        "max_penetration_max_m": round(float(max_pen.max()), 4),
        # Winter scale note: 512 instances of 2 one-expression scripts is a
        # coupling proof, far below the reference's "thousands of scripted
        # objects" per tick (Scripting.cpp:735-821).
        "winter_instances": N_WINTER,
    }))


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        if "backend" in str(e).lower() or "unavailable" in str(e).lower():
            # TPU tunnel down (it drops for hours at a time — CLAUDE.md):
            # emit a parseable line instead of a traceback so the bench
            # capture still records WHY there is no number.
            print(json.dumps({
                "metric": "combined tick rate (TPU backend unavailable)",
                "value": 0.0, "unit": "ticks/s", "vs_baseline": 0.0,
                "error": str(e)[:200]}))
            raise SystemExit(1)
        raise
