"""Mass-splitting Jacobi impulse solver.

The TPU replacement for Jolt's sequential-impulse solver (the reference runs
Jolt with its default 10 velocity iterations inside
physics_system->Update, PhysicsWorld.cpp:1356-1364).  Sequential impulses are
order-dependent and serial; instead we use *mass splitting* (Tonge et al.,
"Mass Splitting for Jitter-Free Parallel Rigid Body Simulation", SIGGRAPH
2012 — the scheme used by GPU PhysX): each body's inverse mass is scaled by
its contact count inside each contact's effective mass, which makes
simultaneous (Jacobi) per-contact solves convergent, then per-iteration
velocity deltas are accumulated with scatter-adds.  With warm-ish iteration
counts (10) this matches sequential-impulse behaviour closely while being
embarrassingly parallel.

Features matching Jolt semantics:
- accumulated normal impulse clamping (lambda_n >= 0)
- box-clamped friction |lambda_t| <= mu * lambda_n
- Baumgarte positional bias with contact slop
- restitution with approach-velocity threshold
- speculative contacts: for separated-but-near pairs the target velocity only
  removes the approach that would tunnel this step (v_n >= pen/dt)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from substrata_tpu.maths import transform as tmath
from substrata_tpu.physics.narrowphase import Contacts
from substrata_tpu.physics.state import BodyState, SimConfig, SimParams


def _tangent_basis(n):
    """Orthonormal (t1, t2) perpendicular to n [..., 3]; branch-free."""
    # Pick the world axis least aligned with n.
    ax = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                   jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.cross(ax, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def solve_contacts(body: BodyState, contacts: Contacts, dt, params: SimParams,
                   config: SimConfig):
    """Returns (linvel, angvel, lambda_n per contact)."""
    n_bodies = body.capacity
    a = contacts.a
    b = contacts.b
    static_b = b < 0
    bs = jnp.maximum(b, 0)
    valid = contacts.valid
    validf = valid.astype(jnp.float32)

    im_a = body.inv_mass[a]
    im_b = jnp.where(static_b, 0.0, body.inv_mass[bs])
    iw_a = tmath.world_inv_inertia(body.quat[a], body.inv_inertia[a])     # [C,3,3]
    iw_b = tmath.world_inv_inertia(body.quat[bs], body.inv_inertia[bs])
    iw_b = jnp.where(static_b[:, None, None], 0.0, iw_b)

    r_a = contacts.point - body.pos[a]
    r_b = contacts.point - body.pos[bs]

    nrm = contacts.normal
    t1, t2 = _tangent_basis(nrm)

    # Contact counts per body for mass splitting.
    counts = jnp.zeros((n_bodies,), jnp.float32)
    counts = counts.at[a].add(validf)
    counts = counts.at[jnp.where(static_b, n_bodies - 1, bs)].add(
        jnp.where(static_b, 0.0, validf), mode="drop")
    c_a = jnp.maximum(counts[a], 1.0)
    c_b = jnp.maximum(jnp.where(static_b, 1.0, counts[bs]), 1.0)

    def eff_mass(d):
        ra_x_d = jnp.cross(r_a, d)
        rb_x_d = jnp.cross(r_b, d)
        term_a = jnp.einsum("cij,cj->ci", iw_a, ra_x_d)
        term_b = jnp.einsum("cij,cj->ci", iw_b, rb_x_d)
        k = (im_a * c_a + im_b * c_b
             + jnp.sum(ra_x_d * term_a, -1) * c_a
             + jnp.sum(rb_x_d * term_b, -1) * c_b)
        return jnp.maximum(k, 1e-9)

    kn = eff_mass(nrm)
    kt1 = eff_mass(t1)
    kt2 = eff_mass(t2)

    pen = contacts.penetration

    def rel_vel(linvel, angvel):
        v_a = linvel[a] + jnp.cross(angvel[a], r_a)
        v_b = jnp.where(static_b[:, None], 0.0,
                        linvel[bs] + jnp.cross(angvel[bs], r_b))
        return v_a - v_b

    # Restitution target from pre-solve approach velocity.
    v0 = rel_vel(body.linvel, body.angvel)
    vn0 = jnp.sum(v0 * nrm, -1)
    restitution_target = jnp.where(vn0 < -params.restitution_threshold,
                                   -contacts.restitution * vn0, 0.0)
    bias = jnp.where(pen > 0.0,
                     (params.baumgarte / dt) * jnp.maximum(pen - params.contact_slop, 0.0),
                     pen / dt)
    target_vn = jnp.maximum(bias, restitution_target)

    def apply_impulse(linvel, angvel, imp):
        dl_a = imp * (im_a * validf)[:, None]
        dl_b = -imp * (im_b * validf)[:, None]
        da_a = jnp.einsum("cij,cj->ci", iw_a, jnp.cross(r_a, imp)) * validf[:, None]
        da_b = -jnp.einsum("cij,cj->ci", iw_b, jnp.cross(r_b, imp)) * validf[:, None]
        linvel = linvel.at[a].add(dl_a)
        angvel = angvel.at[a].add(da_a)
        b_dst = jnp.where(static_b, n_bodies, bs)
        linvel = linvel.at[b_dst].add(jnp.where(static_b[:, None], 0.0, dl_b), mode="drop")
        angvel = angvel.at[b_dst].add(jnp.where(static_b[:, None], 0.0, da_b), mode="drop")
        return linvel, angvel

    def iteration(_, carry):
        linvel, angvel, ln, lt1, lt2 = carry
        v = rel_vel(linvel, angvel)
        vn = jnp.sum(v * nrm, -1)
        dln = (target_vn - vn) / kn
        ln_new = jnp.maximum(ln + dln, 0.0)
        dln = ln_new - ln

        vt1 = jnp.sum(v * t1, -1)
        vt2 = jnp.sum(v * t2, -1)
        max_f = contacts.friction * ln_new
        lt1_new = jnp.clip(lt1 - vt1 / kt1, -max_f, max_f)
        lt2_new = jnp.clip(lt2 - vt2 / kt2, -max_f, max_f)
        dlt1 = lt1_new - lt1
        dlt2 = lt2_new - lt2

        imp = dln[:, None] * nrm + dlt1[:, None] * t1 + dlt2[:, None] * t2
        linvel, angvel = apply_impulse(linvel, angvel, imp)
        return linvel, angvel, ln_new, lt1_new, lt2_new

    zeros = jnp.zeros_like(kn)
    linvel, angvel, ln, _, _ = jax.lax.fori_loop(
        0, config.solver_iters, iteration,
        (body.linvel, body.angvel, zeros, zeros, zeros))
    return linvel, angvel, ln
