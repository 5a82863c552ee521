"""Mass-splitting Jacobi impulse solver (TPU-optimised).

The TPU replacement for Jolt's sequential-impulse solver (the reference runs
Jolt's default 10 velocity iterations inside physics_system->Update,
PhysicsWorld.cpp:1356-1364).  Sequential impulses are order-dependent and
serial; we use *mass splitting* (Tonge et al., "Mass Splitting for
Jitter-Free Parallel Rigid Body Simulation", SIGGRAPH 2012 — the scheme used
by GPU PhysX): each body's inverse mass is scaled by its contact count inside
each contact's effective mass, making simultaneous (Jacobi) per-contact
solves convergent.

TPU-specific design: XLA scatter-adds with colliding indices serialise, so
the per-iteration "apply impulses to bodies" step is NOT a scatter.  Instead
we build — once per step — a per-body incidence table [N, CPB] mapping each
body to the contacts it participates in (with a side sign), and every
iteration applies impulses with a gather + dense reduction over the CPB axis.
The only scatters left run once per step (table build), not once per
iteration.

Features matching Jolt semantics: accumulated normal-impulse clamping,
box-clamped friction |lambda_t| <= mu*lambda_n, Baumgarte positional bias
with slop, restitution threshold, speculative contacts (v_n >= pen/dt for
separated-but-near pairs).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from substrata_tpu.maths import transform as tmath
from substrata_tpu.physics.narrowphase import Contacts
from substrata_tpu.physics.state import BodyState, SimConfig, SimParams


@flax.struct.dataclass
class SolverCache:
    """Persistent contact-impulse cache for warm starting (Jolt's contact
    cache equivalent): accumulated (normal, tangent1, tangent2) impulses
    keyed by the stable contact identity (body a, feature key), stored in an
    open hash table refreshed once per step.  Warm starting is what lets
    sequential-impulse engines hold stacks with ~10 iterations; without it
    Jacobi forces rebuild from zero every step.

    One packed [H, 5] f32 row per entry — lanes 0-1 are the (body slot,
    feature key) identity bitcast from i32, lanes 2-4 the impulses — so the
    per-step lookup is ONE row gather and the refresh ONE row scatter
    (gather/scatter cost on TPU is per row, not per byte)."""

    data: jnp.ndarray    # [H, 5] f32; lanes 0-1 s32-bitcast (slot, key)

    @property
    def size(self):
        return self.data.shape[0]


def empty_solver_cache(size: int = 1 << 17) -> SolverCache:
    empty_keys = jax.lax.bitcast_convert_type(
        jnp.concatenate([jnp.full((size, 1), -1, jnp.int32),
                         jnp.zeros((size, 1), jnp.int32)], axis=1),
        jnp.float32)
    return SolverCache(
        data=jnp.concatenate([empty_keys, jnp.zeros((size, 3), jnp.float32)],
                             axis=1))


def cache_size_for(config: "SimConfig") -> int:
    size = 1
    while size < 2 * config.max_active_contacts:
        size <<= 1
    return size


def _cache_hash(a, k, size):
    h = (a.astype(jnp.uint32) * jnp.uint32(2654435761)
         ^ k.astype(jnp.uint32) * jnp.uint32(40503))
    return (h & jnp.uint32(size - 1)).astype(jnp.int32)


def _tangent_basis(n):
    """Orthonormal (t1, t2) perpendicular to n [..., 3]; branch-free."""
    ax = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                   jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.cross(ax, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def build_incidence(contacts: Contacts, n_bodies: int, cpb: int):
    """Per-body contact table.

    Returns (table [N, CPB] i32 contact index (-1 empty), sign [N, CPB] f32
    (+1 if the body is contact.a, -1 if contact.b), counts [N] f32).
    Built with ONE sort of a packed i32 key (body<<(cbits+1) | contact<<1 |
    is_a) — no argsort payload — followed by ONE scatter of packed entries
    and a last-of-run scatter for the per-body counts (a colliding
    scatter-add serialises on TPU, and searchsorted lowers to a slow while
    loop; a gather-based table build was tried and measured SLOWER — the
    [N*CPB]-row gather from a 1-D sorted-key operand takes XLA's slow
    point-gather path while these 1-wide scatters stay cheap).
    Contacts beyond a body's CPB slots are dropped from impulse application
    for that body (their counterpart still sees them).
    """
    c = contacts.capacity
    cbits = max(c.bit_length(), 1)
    # uint32 key: body field (incl. the n_bodies trash sentinel) above
    # contact<<1|is_a — 17 bits of body at the reference's 65536-body
    # capacity still leaves room for 16384 compacted contacts.
    assert n_bodies.bit_length() + cbits + 1 <= 32, \
        "capacity*contacts too large for packed key"
    static_b = contacts.b < 0
    cidx = jnp.arange(c, dtype=jnp.uint32)
    # Two records per contact: (a, is_a=1), (b, is_a=0); invalid -> n_bodies.
    body_a = jnp.where(contacts.valid, contacts.a, n_bodies).astype(jnp.uint32)
    body_b = jnp.where(contacts.valid & ~static_b, contacts.b,
                       n_bodies).astype(jnp.uint32)
    key = jnp.concatenate([
        (body_a << (cbits + 1)) | (cidx << 1) | jnp.uint32(1),
        (body_b << (cbits + 1)) | (cidx << 1),
    ])

    skey = jnp.sort(key)
    sb = (skey >> (cbits + 1)).astype(jnp.int32)
    idx = jnp.arange(2 * c, dtype=jnp.int32)
    start = jnp.concatenate([jnp.ones((1,), bool), sb[1:] != sb[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(start, idx, 0))
    rank = idx - run_start

    in_cap = (rank < cpb) & (sb < n_bodies)
    slot = jnp.where(in_cap, sb * cpb + rank, n_bodies * cpb)
    # One scatter of the packed (contact<<1 | is_a) entry; -1 = empty.
    entry = (skey & jnp.uint32((1 << (cbits + 1)) - 1)).astype(jnp.int32)
    packed = jnp.full((n_bodies * cpb + 1,), -1, jnp.int32)
    packed = packed.at[slot].set(jnp.where(in_cap, entry, -1), mode="drop")
    packed = packed[:-1].reshape(n_bodies, cpb)
    table = jnp.where(packed >= 0, packed >> 1, -1)
    sign = jnp.where(packed >= 0, jnp.where(packed & 1 > 0, 1.0, -1.0), 0.0)

    # counts[n] = contacts that APPLY to body n = min(degree, CPB), derived
    # from the table itself (free elementwise reduce; the old full-degree
    # last-of-run scatter cost ~0.34 ms/step at 10k).  Using the applied
    # count in the mass splitting is the consistent choice: a body only
    # ever receives impulses from its CPB tabled slots.
    counts = jnp.sum((table >= 0).astype(jnp.float32), axis=1)
    return table, sign, counts


def solve_contacts(body: BodyState, contacts: Contacts, dt, params: SimParams,
                   config: SimConfig, cache: SolverCache | None = None):
    """Returns (linvel, angvel, lambda_n per contact, table, sign, cache').

    Contact-buffer layout contract (compact_contacts_partitioned): rows
    [0, config.static_contact_cap) are static-world contacts (valid rows
    have b == -1), the rest are body pairs.  The static partition has no
    b side at all, so every b-side gather, cross and einsum below runs on
    the PAIR SLICE only — at 10k bodies static rows are ~half the buffer,
    and the per-iteration gathers are the step's dominant cost (measured
    6 ms/step of gather at 10k, ~5.2 ms of it in the solver loop).
    """
    n_bodies = body.capacity
    cpb = config.contacts_per_body
    s_cap = config.static_contact_cap
    a = contacts.a
    b_pair = jnp.maximum(contacts.b[s_cap:], 0)       # [P] pair-partition b
    valid = contacts.valid
    validf = valid.astype(jnp.float32)

    def bside(x_pair):
        """Pad a pair-partition array with zeros for the static rows."""
        shape = (s_cap,) + x_pair.shape[1:]
        return jnp.concatenate([jnp.zeros(shape, x_pair.dtype), x_pair])

    table, sign, counts = build_incidence(contacts, n_bodies, cpb)

    # Sleeping bodies are immovable inside the solve (Jolt island semantics:
    # a sleeping island is excluded from the active set and acts as static
    # support).  The caller (physics_step) pre-wakes sleepers that are
    # being struck this step, so body.awake is already the effective set.
    awakef = body.awake.astype(jnp.float32)
    inv_mass = body.inv_mass * awakef
    inv_inertia = body.inv_inertia * awakef[:, None]

    # One packed gather row per contact side instead of 5 field gathers
    # (pos3 | quat4 | inv_mass | inv_inertia3 | contact_count) — TPU
    # gathers dominate, and row width is nearly free next to row count.
    bview = jnp.concatenate([
        body.pos, body.quat, inv_mass[:, None], inv_inertia,
        counts[:, None],
    ], axis=1)  # [N, 12]
    va = bview[a]                                     # [C, 12]
    vb = bview[b_pair]                                # [P, 12]
    im_a = va[:, 7]
    iw_a = tmath.world_inv_inertia(va[:, 3:7], va[:, 8:11])         # [C,3,3]
    iw_b = tmath.world_inv_inertia(vb[:, 3:7], vb[:, 8:11])         # [P,3,3]

    r_a = contacts.point - va[:, :3]
    r_b = contacts.point[s_cap:] - vb[:, :3]          # [P, 3]

    nrm = contacts.normal
    t1, t2 = _tangent_basis(nrm)

    c_a = jnp.maximum(va[:, 11], 1.0)
    c_b = jnp.maximum(vb[:, 11], 1.0)                 # [P]

    # Effective masses + angular application vectors for all 3 basis
    # directions in TWO batched einsums (was 12 [C,3,3]x[C,3] dot_generals;
    # ang_app recomputed exactly eff_mass's products).  b-side terms exist
    # only on the pair slice.
    d_all = jnp.stack([nrm, t1, t2], axis=1)               # [C, 3dir, 3]
    ra_x = jnp.cross(r_a[:, None, :], d_all)               # [C, 3dir, 3]
    rb_x = jnp.cross(r_b[:, None, :], d_all[s_cap:])       # [P, 3dir, 3]
    term_a = jnp.einsum("cij,cdj->cdi", iw_a, ra_x)        # Iw_a (r_a x d)
    term_b = jnp.einsum("cij,cdj->cdi", iw_b, rb_x)        # [P, 3dir, 3]
    k_all = ((im_a * c_a + bside(vb[:, 7] * c_b))[:, None]
             + jnp.sum(ra_x * term_a, -1) * c_a[:, None]
             + bside(jnp.sum(rb_x * term_b, -1) * c_b[:, None]))
    k_all = jnp.maximum(k_all, 1e-9)
    kn, kt1, kt2 = k_all[:, 0], k_all[:, 1], k_all[:, 2]

    pen = contacts.penetration

    c_cap = contacts.capacity
    ab = jnp.concatenate([a, b_pair])  # a sides [C] + pair b sides [P]

    def rel_vel(linvel, angvel):
        # ONE packed [C+P]-row gather for both contact sides per iteration
        # (the static partition's b side is the immovable world — no rows).
        # Payloads travel as bf16 (gather cost on TPU scales with bytes;
        # velocities only need ~3 significant digits inside an iteration —
        # the carried body state stays f32) and upcast after.
        vview = jnp.concatenate([linvel, angvel], axis=1).astype(jnp.bfloat16)
        w = vview[ab].astype(jnp.float32)
        wa, wb = w[:c_cap], w[c_cap:]
        v_a = wa[:, :3] + jnp.cross(wa[:, 3:], r_a)
        v_b = wb[:, :3] + jnp.cross(wb[:, 3:], r_b)
        return v_a - bside(v_b)

    v0 = rel_vel(body.linvel, body.angvel)
    vn0 = jnp.sum(v0 * nrm, -1)
    # Inactive restitution must NOT clamp the target to zero: a separated
    # (speculative) contact's target is pen/dt < 0 — it LIMITS approach
    # speed to exactly close the gap, it doesn't forbid approach.  (With a
    # 0.0 floor, slowly-approaching bodies hover at the speculative margin
    # ~4 cm above surfaces — caught by the golden-trajectory harness.)
    restitution_target = jnp.where(vn0 < -params.restitution_threshold,
                                   -contacts.restitution * vn0, -jnp.inf)
    # Velocity-level Baumgarte only for DEEP penetration (beyond what the
    # split-impulse position pass recovers per step): running full-strength
    # velocity bias on top of position correction double-corrects and pumps
    # energy into resting stacks — a breathing limit cycle (sink ~4 cm,
    # spring back, ~12-step period) that keeps every stacked body's
    # velocity at 0.2-0.7 m/s forever, so stacks never sleep.  Jolt gets
    # stack stability from split impulse alone (velocity solve targets
    # vn=0 for resting contacts).
    deep = 0.04  # m; position solve handles anything shallower
    bias = jnp.where(pen > 0.0,
                     jnp.minimum((params.baumgarte / dt)
                                 * jnp.maximum(pen - deep, 0.0),
                                 3.0),
                     pen / dt)
    target_vn = jnp.maximum(bias, restitution_target)

    # Per-contact angular application vectors — the SAME products as the
    # effective-mass terms above (dω = dln*An + dlt1*At1 + dlt2*At2 where
    # A*_side = Iw_side (r_side × d)).  The b-side ones exist only for the
    # pair slice [P].
    an_a, at1_a, at2_a = term_a[:, 0], term_a[:, 1], term_a[:, 2]
    an_b, at1_b, at2_b = term_b[:, 0], term_b[:, 1], term_b[:, 2]

    # Gather helpers for the incidence table.  Per-slot reduction weights
    # W [N, CPB, 3seg]: seg 0 (linear impulse) = ±1 by side, seg 1 (ang_a
    # block) = +1 on a-side slots, seg 2 (ang_b block) = -1 on b-side slots
    # — dω_a = +Iw_a(r_a×P), dω_b = -Iw_b(r_b×P).  Folding side selection
    # and validity into one bf16 multiply-reduce (einsum, f32 accumulation)
    # deletes the per-iteration [N,CPB,9] upcast + sign/select elementwise
    # pass that used to follow the gather.
    tbl = jnp.maximum(table, 0)
    signv = sign * (table >= 0)
    W = jnp.stack([signv, jnp.maximum(signv, 0.0), jnp.minimum(signv, 0.0)],
                  axis=2).astype(jnp.bfloat16)              # [N, CPB, 3]
    im_per_body = inv_mass[:, None]  # [N, 1]

    def apply_impulses(linvel, angvel, dln, dlt1, dlt2):
        # ONE packed gather per iteration: [imp | ang_a | ang_b] -> [C, 9].
        imp = dln[:, None] * nrm + dlt1[:, None] * t1 + dlt2[:, None] * t2  # [C,3]
        ang_c_a = dln[:, None] * an_a + dlt1[:, None] * at1_a + dlt2[:, None] * at2_a
        ang_c_b = bside(dln[s_cap:, None] * an_b
                        + dlt1[s_cap:, None] * at1_b
                        + dlt2[s_cap:, None] * at2_b)
        block = ((jnp.concatenate([imp, ang_c_a, ang_c_b], axis=1)
                  * validf[:, None]).astype(jnp.bfloat16))
        g = block[tbl].reshape(n_bodies, cpb, 3, 3)         # [N,CPB,3seg,3]
        out = jnp.einsum("ncsw,ncs->nsw", g, W,
                         preferred_element_type=jnp.float32)  # [N,3seg,3]
        linvel = linvel + im_per_body * out[:, 0]
        angvel = angvel + out[:, 1] + out[:, 2]
        return linvel, angvel

    def iteration(beta, carry):
        # Accelerated projected Jacobi (FISTA momentum on the impulses).
        # Plain mass-splitting Jacobi propagates force one contact-hop per
        # iteration, so a 10-deep stack (> iteration count) can never
        # converge in-step; the un-damped residual shows up as an artificial
        # acoustic breathing mode (the whole stack bouncing at ~0.1 s
        # period, velocities 0.5-1.5 m/s forever — which also blocks
        # sleeping).  The normal-impulse subproblem is a convex QP, so
        # momentum extrapolation is principled (O(1/k^2) vs O(1/k)) and
        # costs zero extra gathers: velocities always correspond to the
        # EXTRAPOLATED impulses y; l is the last projected (feasible) point.
        linvel, angvel, yn, yt1, yt2, ln, lt1, lt2 = carry
        v = rel_vel(linvel, angvel)
        vn = jnp.sum(v * nrm, -1)
        ln_new = jnp.maximum(yn + (target_vn - vn) / kn, 0.0)

        vt1 = jnp.sum(v * t1, -1)
        vt2 = jnp.sum(v * t2, -1)
        max_f = contacts.friction * ln_new
        lt1_new = jnp.clip(yt1 - vt1 / kt1, -max_f, max_f)
        lt2_new = jnp.clip(yt2 - vt2 / kt2, -max_f, max_f)

        yn_new = ln_new + beta * (ln_new - ln)
        yt1_new = lt1_new + beta * (lt1_new - lt1)
        yt2_new = lt2_new + beta * (lt2_new - lt2)

        linvel, angvel = apply_impulses(linvel, angvel, yn_new - yn,
                                        yt1_new - yt1, yt2_new - yt2)
        return linvel, angvel, yn_new, yt1_new, yt2_new, ln_new, lt1_new, lt2_new

    # --- Warm start: look up last step's accumulated impulses by contact
    # identity and pre-apply them before iterating. ---
    zeros = jnp.zeros_like(kn)
    linvel0, angvel0 = body.linvel, body.angvel
    if cache is not None:
        h = _cache_hash(a, contacts.key, cache.size)
        row = cache.data[h]                      # ONE [C,5] gather
        kk = jax.lax.bitcast_convert_type(row[:, 0:2], jnp.int32)
        hit = valid & (kk[:, 0] == a) & (kk[:, 1] == contacts.key)
        warm = jnp.where(hit[:, None], row[:, 2:5], 0.0)
        ln0 = jnp.maximum(warm[:, 0], 0.0) * validf
        max_f0 = contacts.friction * ln0
        lt10 = jnp.clip(warm[:, 1], -max_f0, max_f0) * validf
        lt20 = jnp.clip(warm[:, 2], -max_f0, max_f0) * validf
        linvel0, angvel0 = apply_impulses(linvel0, angvel0, ln0, lt10, lt20)
    else:
        ln0 = lt10 = lt20 = zeros

    # Unrolled: an XLA while loop costs ~0.5 ms/iteration of fixed overhead
    # on TPU (carry copies + sync), comparable to the iteration body itself.
    # FISTA momentum schedule beta_k = k/(k+3): starts at 0 (plain projected
    # step) and grows; restarting every step keeps it stable under the
    # warm-start-shifted initial point.
    carry = (linvel0, angvel0, ln0, lt10, lt20, ln0, lt10, lt20)
    for k in range(config.solver_iters):
        # beta=0 on the LAST iteration leaves y == l, so the final
        # velocities already correspond to the feasible impulses and no
        # snap-back apply is needed (saves one gather+reduce pass).
        beta = k / (k + 3.0) if k < config.solver_iters - 1 else 0.0
        carry = iteration(beta, carry)
    linvel, angvel, yn, yt1, yt2, ln, lt1, lt2 = carry

    # --- Refresh the cache with this step's accumulated impulses, IN PLACE
    # (donated buffers): stale entries for vanished contacts persist, which
    # is harmless — a stale identity only matches when the same (body slot,
    # feature key) contact reappears, and warm-starting a reappearing
    # contact from its last impulse is exactly the cache's purpose.  The
    # host resets the cache when body slots are reused (PhysicsWorld).
    # Rebuilding from zeros cost two full-table materialisations + copies.
    if cache is not None:
        h = _cache_hash(a, contacts.key, cache.size)
        dst = jnp.where(valid, h, cache.size)
        new_keys = jnp.stack([jnp.where(valid, a, -1),
                              jnp.where(valid, contacts.key, 0)], axis=1)
        new_row = jnp.concatenate([
            jax.lax.bitcast_convert_type(new_keys, jnp.float32),
            jnp.stack([ln, lt1, lt2], axis=1) * validf[:, None],
        ], axis=1)
        new_cache = SolverCache(
            data=cache.data.at[dst].set(new_row, mode="drop"))
    else:
        new_cache = None
    return linvel, angvel, ln, table, sign, new_cache


def solve_positions(pos, body: BodyState, contacts: Contacts, table, sign,
                    params: SimParams, config: SimConfig,
                    iters: int = 2, beta: float = 0.25):
    """Split-impulse position correction (Jolt runs 2 position iterations
    after its velocity solve): push residual penetration out by translating
    bodies directly, with mass-split weights, so deep stacks do not sink.
    Uses the velocity solve's incidence table; rotation is left untouched
    (translation-only NGS is the stable cheap variant).
    """
    s_cap = config.static_contact_cap
    a = contacts.a
    b_pair = jnp.maximum(contacts.b[s_cap:], 0)    # partitioned layout
    validf = contacts.valid.astype(jnp.float32)
    nrm = contacts.normal

    def bside(x_pair):
        shape = (s_cap,) + x_pair.shape[1:]
        return jnp.concatenate([jnp.zeros(shape, x_pair.dtype), x_pair])

    tbl = jnp.maximum(table, 0)
    tbl_valid = (table >= 0).astype(jnp.float32)[..., None]
    # Sleeping bodies are immovable (mirrors the velocity solve).
    im_per_body = (body.inv_mass * body.awake)[:, None]
    # ONE packed per-side gather (pos3 | inv_mass) for both the initial
    # reference positions and the inverse masses — standalone [C] scalar
    # gathers from [N] cost as much as a full row gather.  b side exists
    # only on the pair slice.
    view0 = jnp.concatenate([pos, im_per_body], axis=1)    # [N, 4]
    va0 = view0[a]
    vb0 = view0[b_pair]                                    # [P, 4]
    pos0_a, im_a = va0[:, :3], va0[:, 3]
    pos0_b = vb0[:, :3]
    w_sum = jnp.maximum(im_a + bside(vb0[:, 3]), 1e-9)

    c_cap = a.shape[0]
    ab = jnp.concatenate([a, b_pair])

    def it(first, pos):
        if first:
            # No displacement has been applied yet: dp == 0 exactly, so
            # skip the two per-side position gathers of iteration 0.
            pen_res = contacts.penetration
        else:
            pab = pos[ab]               # ONE [C+P]-row gather for both sides
            dp = ((pab[:c_cap] - pos0_a)
                  - bside(pab[c_cap:] - pos0_b))
            pen_res = contacts.penetration - jnp.sum(dp * nrm, -1)
        push = jnp.maximum(pen_res - params.contact_slop, 0.0) * beta
        # Per-contact positional impulse along the normal, shared by inv mass.
        imp = nrm * (push / w_sum * validf)[:, None]          # [C, 3]
        g = imp[tbl] * sign[..., None] * tbl_valid            # [N, CPB, 3]
        return pos + im_per_body * jnp.sum(g, axis=1)

    for i in range(iters):
        pos = it(i == 0, pos)
    return pos
