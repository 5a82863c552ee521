"""The fused physics step: one jitted device program per tick.

Equivalent of PhysicsWorld::think (gui_client/PhysicsWorld.cpp:1356-1442) =
Jolt physics_system->Update + buoyancy pass, re-architected as a single XLA
program over SoA state:

  forces (gravity/damping/buoyancy) -> broadphase grid -> narrowphase ->
  mass-splitting impulse solve -> integrate -> sleeping update

Outputs a StepEvents record giving the host everything the reference's
listeners deliver via callbacks (PhysicsWorldEventListener contact events,
activation sets, underwater transitions) as packed arrays it can DMA once
per tick.
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from substrata_tpu.physics import broadphase, integrate, narrowphase, solver
from substrata_tpu.physics.state import BodyState, SimConfig, SimParams, StaticWorld


@flax.struct.dataclass
class StepEvents:
    """Per-tick host-visible events (replaces Jolt listener callbacks,
    PhysicsWorld.cpp:1446-1520)."""

    # Contact pairs that touched this step (for script onUserTouchedObject /
    # ownership claims; capacity = max_pairs).
    contact_pair_a: jnp.ndarray   # [P] i32
    contact_pair_b: jnp.ndarray   # [P] i32
    contact_touching: jnp.ndarray  # [P] bool
    newly_awake: jnp.ndarray      # [N] bool (newly_activated_obs parity)
    newly_asleep: jnp.ndarray     # [N] bool
    entered_water: jnp.ndarray    # [N] bool (physicsObjectEnteredWater parity)
    num_pairs: jnp.ndarray        # [] i32
    broadphase_overflow: jnp.ndarray  # [] i32 diagnostics


@flax.struct.dataclass
class StepDiagnostics:
    num_pairs: jnp.ndarray
    num_contacts: jnp.ndarray
    num_awake: jnp.ndarray
    max_penetration: jnp.ndarray


@partial(jax.jit, static_argnames=("config", "rebuild_pairs", "has_oversize"))
def physics_step(body: BodyState, world: StaticWorld, hull_contact_verts,
                 dt, params: SimParams, config: SimConfig,
                 solver_cache=None, pair_cache=None,
                 rebuild_pairs: bool | None = None,
                 has_oversize: bool = True):
    """Advance the world one fixed substep (60 Hz in the reference tick,
    GUIClient.cpp:6365-6368).

    Returns (new_body, events, diagnostics); when a solver.SolverCache is
    passed for warm starting, (new_body, new_cache, events, diagnostics);
    when a broadphase.PairCache is also passed (temporal pair reuse),
    (new_body, new_solver_cache, new_pair_cache, events, diagnostics).

    ``rebuild_pairs``: statically pick the broadphase rebuild/reuse branch
    (two compiled variants, host-scheduled from the previous step's
    cache.steps_left); None = on-device lax.cond.
    ``has_oversize``: static host guarantee that no body's diameter exceeds
    the broadphase cell size (PhysicsWorld tracks it at flush); False
    compiles the oversize broadphase pass away (see broadphase.find_pairs)."""
    if pair_cache is not None and solver_cache is None:
        raise ValueError("pair_cache requires a solver_cache")
    dt = jnp.asarray(dt, jnp.float32)
    prev_awake = body.awake

    # 1. External forces + buoyancy.
    linvel, angvel, in_water = integrate.apply_forces(body, dt, params)
    body = body.replace(linvel=linvel, angvel=angvel)

    # 2. Broadphase (optionally reusing last rebuild's pair list).
    if pair_cache is not None:
        (pair_a, pair_b, pair_valid, num_pairs, overflow,
         new_pair_cache) = broadphase.find_pairs_cached(
            body, pair_cache, dt, config, rebuild=rebuild_pairs,
            has_oversize=has_oversize)
    else:
        pair_a, pair_b, pair_valid, num_pairs, overflow = broadphase.find_pairs(
            body, config, has_oversize=has_oversize)
        new_pair_cache = None

    # 2b. Pre-solve strike wake (Jolt activates bodies before solving their
    # new contacts): a sleeping body with a broadphase pair against a fast
    # awake body joins the solve THIS step — an immovable sleeper would
    # reflect the incoming body instead of absorbing momentum (caught by
    # the two-sphere golden-trajectory test).  Done at the pair level
    # because static contacts never wake anything and pair rows are ~4x
    # cheaper than contact rows; the 0.5 m/s bar keeps resting-jitter
    # neighbours from re-waking sleeping clusters through mere proximity
    # (slower strikes are woken post-solve by update_sleeping, one step
    # late, with negligible momentum error).
    n = body.capacity
    spd2 = jnp.sum(body.linvel * body.linvel, -1)
    striker = body.awake & (spd2 > 0.25)
    pa_s = jnp.maximum(pair_a, 0)
    pb_s = jnp.maximum(pair_b, 0)
    sview = striker[:, None]
    fa = sview[pa_s, 0]
    fb = sview[pb_s, 0]
    dst_a = jnp.where(pair_valid & fb, pa_s, n)
    dst_b = jnp.where(pair_valid & fa, pb_s, n)
    struck = (jnp.zeros((n + 1,), bool)
              .at[dst_a].set(True, mode="drop")
              .at[dst_b].set(True, mode="drop"))[:n]
    body = body.replace(awake=body.awake
                        | (struck & body.alive & body.dynamic))

    # 3. Narrowphase.  Two contact classes (r5 solver layout redesign):
    # static-world contacts stay in their RAW body-blocked buffer (rows
    # n*K..n*K+K-1 belong to body n) — never compacted, so ground contacts
    # can never overflow and the solver handles them with dense reshapes
    # instead of gathers/scatters.  Body-pair contacts use the PAIR-BLOCKED
    # layout whenever the world supports it (blocked_manifold_width > 0):
    # no per-step compaction, per-entry gathers, and an incidence table
    # reused across the broadphase window; otherwise they are compacted to
    # max_active_contacts rows with a per-step table.
    wm = narrowphase.blocked_manifold_width(config, body.capacity)
    pair_cts, pair_touching, bucket_overflow = narrowphase.pair_contacts(
        body, pair_a, pair_b, pair_valid, config, world.hulls,
        blocked_wm=wm)
    static_cts = narrowphase.static_contacts(body, world, hull_contact_verts, config)
    if wm:
        contacts_p = pair_cts
        contact_overflow = jnp.int32(0)
        if pair_cache is not None and rebuild_pairs is False:
            # Reuse steps: pair entries are identical to the rebuild step's,
            # so reuse its incidence table (the table sort is the single
            # most expensive bookkeeping op in the step).
            inc_table, inc_sign = pair_cache.inc_table, pair_cache.inc_sign
        else:
            n_e = pair_cts.capacity // wm
            e_a = pair_cts.a.reshape(n_e, wm)[:, 0]
            e_b = pair_cts.b.reshape(n_e, wm)[:, 0]
            inc_table, inc_sign, _ = solver.build_incidence(
                e_a, e_b, e_a >= 0, body.capacity, config.contacts_per_body)
    else:
        wm = 1
        contacts_p, contact_overflow = narrowphase.compact_contacts(
            pair_cts, config.max_active_contacts)
        inc_table = inc_sign = None

    # 4. Solve velocity constraints (warm-started when a cache is threaded).
    (linvel, angvel, lambda_p, inc_table, inc_sign, lambda_s,
     new_cache) = solver.solve_contacts(
        body, static_cts, contacts_p, dt, params, config, solver_cache,
        wm=wm, table=inc_table, sign=inc_sign)

    # 5. Integrate + split-impulse position correction (Jolt: 2 position
    # iterations after the velocity solve — deep stacks sink without it).
    pos, quat = integrate.integrate_positions(body, linvel, angvel, dt)
    pos = solver.solve_positions(pos, body, static_cts, contacts_p,
                                 inc_table, inc_sign, params, config, wm=wm)

    # 6. Sleeping.  Wake propagation is pair-driven (static contacts never
    # wake anything); deep static penetration keeps a body awake so
    # depenetration can keep working on it (dense reduce, no gathers).
    n_b = body.capacity
    k_s = static_cts.capacity // n_b
    deep_static = jnp.any(
        (static_cts.valid & (static_cts.penetration > 0.1)).reshape(n_b, k_s),
        axis=1)
    # Entry-level views for sleeping (entries = rows when wm == 1);
    # lambda_p is [n_e, wm] from the solver, invalid rows masked out.
    n_e = contacts_p.capacity // wm
    row_valid = contacts_p.valid.reshape(n_e, wm)
    e_a = contacts_p.a.reshape(n_e, wm)[:, 0]
    e_b = contacts_p.b.reshape(n_e, wm)[:, 0]
    e_valid = jnp.any(row_valid, axis=1)
    e_imp = jnp.max(jnp.where(row_valid, lambda_p, 0.0), axis=1)
    e_pen = jnp.max(jnp.where(row_valid,
                              contacts_p.penetration.reshape(n_e, wm),
                              -1e9), axis=1)
    awake, sleep_timer, linvel, angvel = integrate.update_sleeping(
        body, linvel, angvel, e_a, e_b, e_imp, e_valid,
        inc_table, inc_sign, dt, params,
        contact_pen=e_pen, extra_deep=deep_static)

    new_body = body.replace(
        pos=pos, quat=quat, linvel=linvel, angvel=angvel,
        awake=awake, sleep_timer=sleep_timer,
        underwater=in_water,
    )

    events = StepEvents(
        contact_pair_a=pair_a,
        contact_pair_b=pair_b,
        contact_touching=pair_touching,
        newly_awake=awake & ~prev_awake,
        newly_asleep=prev_awake & ~awake,
        entered_water=in_water & ~body.underwater,
        num_pairs=num_pairs,
        broadphase_overflow=overflow + bucket_overflow + contact_overflow,
    )
    diags = StepDiagnostics(
        num_pairs=num_pairs,
        num_contacts=jnp.sum(contacts_p.valid) + jnp.sum(static_cts.valid),
        num_awake=jnp.sum(awake & new_body.alive),
        max_penetration=jnp.maximum(
            jnp.max(jnp.where(contacts_p.valid, contacts_p.penetration, 0.0)),
            jnp.max(jnp.where(static_cts.valid, static_cts.penetration, 0.0))),
    )
    if new_pair_cache is not None:
        # A wake means new pairs may be needed (a woken body had no pairs
        # against its sleeping neighbours at the last rebuild) — but a
        # slowly-woken body is covered by the rebuild's 8 cm base margin
        # for the rest of the window, so only FAST wakes force a rebuild
        # (v * window * dt < margin ⇒ v < ~1.2 m/s at 60 Hz, window 4).
        woke_speed = jnp.where(events.newly_awake,
                               jnp.linalg.norm(linvel, axis=-1), 0.0)
        fast_wake = jnp.max(woke_speed) > 1.0
        new_pair_cache = new_pair_cache.replace(
            steps_left=jnp.where(fast_wake, 0, new_pair_cache.steps_left),
            # Blocked layout: persist the entry incidence table so reuse
            # steps skip the table sort (inc_table is the freshly-built
            # table on rebuild steps, the carried one on reuse steps).
            inc_table=inc_table, inc_sign=inc_sign)
        return new_body, new_cache, new_pair_cache, events, diags
    if solver_cache is not None:
        return new_body, new_cache, events, diags
    return new_body, events, diags
