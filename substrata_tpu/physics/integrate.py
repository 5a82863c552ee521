"""Force application, buoyancy, integration and sleeping.

Buoyancy reproduces the reference's per-tick water pass
(PhysicsWorld::think, gui_client/PhysicsWorld.cpp:1367-1442): for every awake
dynamic body whose AABB bottom is below water_z, apply Jolt's
ApplyBuoyancyImpulse semantics with fluid density 1020 kg/m^3 (seawater),
linear drag 0.1 (0 for custom-drag bodies such as boats), angular drag 3.0:

  buoyancy impulse  = rho_water * V_submerged * (-gravity) * dt  at the
                      centre of buoyancy (Archimedes; the reference chooses
                      inBuoyancy = rho * V_total / mass so Jolt's
                      buoyancy * V_sub/V_total * mass * g reduces to this)
  linear drag       = 0.5 * rho * |v_rel| * v_rel * c_l * V_sub^(2/3) * dt
  angular drag      = quadratic in omega, clamped to not reverse motion

Submerged volume uses the spherical-cap fraction f^2(3-2f) of the bounding
sphere scaled by the true shape volume (exact for spheres, smooth
approximation for boxes/capsules/hulls).

Sleeping mirrors Jolt's velocity-threshold + timer scheme; bodies keep the
``awake`` mask that backs the reference's activated_obs set
(PhysicsWorld.cpp:1446-1486 activation listeners).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from substrata_tpu.maths import quat as quatm
from substrata_tpu.maths import transform as tmath
from substrata_tpu.physics.state import (
    BodyState, MotionType, SimParams, WATER_DENSITY, WATER_LINEAR_DRAG,
    WATER_ANGULAR_DRAG,
)


def apply_forces(body: BodyState, dt, params: SimParams):
    """Gravity, damping and buoyancy -> new linvel/angvel + underwater mask."""
    dyn = body.dynamic & body.awake & body.alive
    dynf = dyn.astype(jnp.float32)[:, None]

    linvel = body.linvel + params.gravity[None, :] * (dt * body.gravity_factor[:, None]) * dynf

    # --- Buoyancy (PhysicsWorld.cpp:1367-1442) ---
    r = jnp.maximum(body.bound_radius, 1e-6)
    bottom = body.pos[:, 2] - r
    in_water = dyn & (bottom < params.water_z)
    f = jnp.clip((params.water_z - bottom) / (2.0 * r), 0.0, 1.0)
    frac = f * f * (3.0 - 2.0 * f)              # spherical-cap volume fraction
    v_sub = body.volume * frac
    # Centre of buoyancy: centroid of the submerged slab (approx), relative to COM.
    top_sub = jnp.minimum(params.water_z, body.pos[:, 2] + r)
    cob_rel_z = 0.5 * (top_sub + bottom) - body.pos[:, 2]
    cob_rel = jnp.stack([jnp.zeros_like(cob_rel_z), jnp.zeros_like(cob_rel_z), cob_rel_z], -1)

    inwf = in_water.astype(jnp.float32)
    # Archimedes impulse.
    buoy_dv = (-params.gravity[None, :]) * (WATER_DENSITY * v_sub * body.inv_mass * dt * inwf)[:, None]
    linvel = linvel + buoy_dv
    # Torque from offset centre of buoyancy: tau = cob_rel x F.
    f_buoy = (-params.gravity[None, :]) * (WATER_DENSITY * v_sub * inwf)[:, None]
    tau = jnp.cross(cob_rel, f_buoy)
    iw = tmath.world_inv_inertia(body.quat, body.inv_inertia)
    angvel = body.angvel + jnp.einsum("nij,nj->ni", iw, tau) * dt

    # Quadratic linear drag on the velocity of the centre of buoyancy.
    drag_coeff = jnp.where(body.use_zero_linear_drag, 0.0, WATER_LINEAR_DRAG)
    v_cob = linvel + jnp.cross(angvel, cob_rel)
    speed = jnp.linalg.norm(v_cob, axis=-1, keepdims=True)
    area = jnp.maximum(v_sub, 0.0) ** (2.0 / 3.0)
    drag_dv = -0.5 * WATER_DENSITY * speed * v_cob * (drag_coeff * area * body.inv_mass * dt * inwf)[:, None]
    # Clamp so drag never reverses the velocity.
    drag_dv = jnp.where(jnp.abs(drag_dv) > jnp.abs(v_cob), -v_cob, drag_dv)
    linvel = linvel + drag_dv

    # Quadratic angular drag (Jolt's inAngularDrag=3.0 path), clamped likewise.
    wspeed = jnp.linalg.norm(angvel, axis=-1, keepdims=True)
    ang_dd = -0.5 * WATER_DENSITY * wspeed * angvel * (
        WATER_ANGULAR_DRAG * area[:, None] * r[:, None] ** 2 * body.inv_inertia * dt * inwf[:, None])
    ang_dd = jnp.where(jnp.abs(ang_dd) > jnp.abs(angvel), -angvel, ang_dd)
    angvel = angvel + ang_dd

    # Standard linear/angular damping (Jolt defaults 0.05).
    lin_damp = jnp.exp(-body.linear_damping * dt)[:, None]
    ang_damp = jnp.exp(-body.angular_damping * dt)[:, None]
    linvel = jnp.where(dyn[:, None], linvel * lin_damp, linvel)
    angvel = jnp.where(dyn[:, None], angvel * ang_damp, angvel)

    return linvel, angvel, in_water


def integrate_positions(body: BodyState, linvel, angvel, dt):
    """Semi-implicit Euler for awake non-static bodies (incl. kinematic)."""
    move = body.alive & body.awake & (body.motion_type != int(MotionType.STATIC))
    movef = move.astype(jnp.float32)[:, None]
    pos = body.pos + linvel * dt * movef
    q = quatm.integrate(body.quat, angvel, dt)
    q = jnp.where(move[:, None], q, body.quat)
    return pos, q


def update_sleeping(body: BodyState, linvel, angvel, contact_a, contact_b,
                    contact_impulse, contact_valid, incidence_table,
                    incidence_sign, dt, params: SimParams,
                    contact_pen=None, extra_deep=None):
    """Velocity-threshold sleeping with contact-driven waking.

    Mirrors the activation behaviour backing the reference's
    activated_obs/newly_activated_obs sets (PhysicsWorld.cpp:1446-1486).
    Wake propagation reuses the solver's per-body contact incidence table so
    it is a gather + reduce, not a scatter.
    Returns (awake, sleep_timer, linvel, angvel).
    """
    n = body.capacity
    lin2 = jnp.sum(linvel * linvel, -1)
    ang2 = jnp.sum(angvel * angvel, -1)
    slow = (lin2 < params.sleep_lin_vel ** 2) & (ang2 < params.sleep_ang_vel ** 2)

    # A body is woken by (a) a contact impulse from an awake counterpart, or
    # (b) touching an awake body that is moving fast — necessary because a
    # sleeping body receives no gravity, so a platform sliding under it would
    # otherwise produce a zero-impulse resting contact and never wake it
    # (Jolt handles this via island merging; we use contact reachability).
    fast = body.awake & ((lin2 > 4.0 * params.sleep_lin_vel ** 2)
                         | (ang2 > 4.0 * params.sleep_ang_vel ** 2))
    # "Active" = awake AND above the sleep threshold.  Wake/keep-awake must
    # propagate only from ACTIVE counterparts: if any awake counterpart
    # sufficed, two touching resting boxes would reset each other's sleep
    # timers through their resting-contact impulses forever and an island
    # could never fall asleep (Jolt sleeps whole islands when every member
    # is slow; requiring the counterpart itself to be above-threshold is
    # the island-free approximation of that).
    active = body.awake & ~slow
    imp_sig = contact_valid & (contact_impulse > 1e-4)
    tbl = jnp.maximum(incidence_table, 0)                 # [N, CPB]
    tbl_ok = incidence_table >= 0
    iam_a = incidence_sign > 0
    # One packed gather per indirection level (separate field gathers are
    # the cost on TPU): contact row -> (a, b, imp_sig, valid).
    deep = (contact_valid & (contact_pen > 0.1)
            if contact_pen is not None
            else jnp.zeros_like(contact_valid))
    cblock = jnp.stack([contact_a.astype(jnp.float32),
                        contact_b.astype(jnp.float32),
                        imp_sig.astype(jnp.float32),
                        contact_valid.astype(jnp.float32),
                        deep.astype(jnp.float32)], axis=1)  # [C, 5]
    g = cblock[tbl]                                        # [N, CPB, 5]
    other = jnp.where(iam_a, g[..., 1], g[..., 0]).astype(jnp.int32)
    other_static = other < 0
    oth = jnp.maximum(other, 0)
    bblock = jnp.stack([active, fast], axis=1).astype(jnp.float32)  # [N, 2]
    ob = bblock[oth]                                       # [N, CPB, 2]
    other_active = jnp.where(other_static, False, ob[..., 0] > 0)
    other_fast = jnp.where(other_static, False, ob[..., 1] > 0)
    slot_wake = tbl_ok & (((g[..., 2] > 0) & other_active)
                          | ((g[..., 3] > 0) & other_fast))
    wake_hit = jnp.any(slot_wake, axis=1)
    # A deeply-penetrating body must NOT sleep: it can come to rest inside
    # another body while the contact buffer is saturated (its separating
    # contacts dropped), and a sleeping body is immovable + emits no static
    # contacts — the bad position would be locked in forever.  Staying
    # awake keeps depenetration (bias + position solve) working on it.
    body_deep = jnp.any(tbl_ok & (g[..., 4] > 0), axis=1)
    if extra_deep is not None:
        # Deep STATIC penetration (dense [N] reduce computed by the caller
        # from the body-blocked static buffer) must also block sleeping.
        body_deep = body_deep | extra_deep

    dyn = body.dynamic & body.alive
    timer = jnp.where(slow & ~wake_hit & ~body_deep,
                      body.sleep_timer + dt, 0.0)
    asleep = dyn & (timer > params.sleep_time)
    woken = dyn & ~body.awake & wake_hit
    awake = jnp.where(dyn, (~asleep) & (body.awake | woken), body.awake)
    # Kinematic bodies are awake while they have velocity.
    kin = body.alive & (body.motion_type == int(MotionType.KINEMATIC))
    awake = jnp.where(kin, (lin2 + ang2) > 1e-10, awake)
    # Zero velocities of sleeping bodies.
    sleepingf = (dyn & ~awake)[:, None]
    linvel = jnp.where(sleepingf, 0.0, linvel)
    angvel = jnp.where(sleepingf, 0.0, angvel)
    return awake, timer, linvel, angvel
