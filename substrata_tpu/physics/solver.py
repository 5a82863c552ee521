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
    # Both contact classes warm-start from this table: the body-blocked
    # static buffer (capacity * static_contacts_per_body rows) plus the
    # compacted pair buffer, at ~2x load headroom.
    rows = (config.capacity * config.static_contacts_per_body
            + config.max_active_contacts)
    size = 1
    while size < 2 * rows:
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


def build_incidence(entry_a, entry_b, entry_occ, n_bodies: int, cpb: int):
    """Per-body ENTRY table (entries = compacted contact rows, or pair
    slots in the blocked layout — see solve_contacts).

    Returns (table [N, CPB] i32 entry index (-1 empty), sign [N, CPB] f32
    (+1 if the body is entry a, -1 if entry b), counts [N] f32).
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
    c = entry_a.shape[0]
    cbits = max(c.bit_length(), 1)
    # uint32 key: body field (incl. the n_bodies trash sentinel) above
    # entry<<1|is_a — 17 bits of body at the reference's 65536-body
    # capacity still leaves room for 16384 entries.
    assert n_bodies.bit_length() + cbits + 1 <= 32, \
        "capacity*entries too large for packed key"
    static_b = entry_b < 0
    cidx = jnp.arange(c, dtype=jnp.uint32)
    # Two records per entry: (a, is_a=1), (b, is_a=0); empty -> n_bodies.
    body_a = jnp.where(entry_occ, entry_a, n_bodies).astype(jnp.uint32)
    body_b = jnp.where(entry_occ & ~static_b, entry_b,
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


def solve_contacts(body: BodyState, static_cts: Contacts, pair_cts: Contacts,
                   dt, params: SimParams, config: SimConfig,
                   cache: SolverCache | None = None, *,
                   wm: int = 1, table=None, sign=None):
    """Two-class contact solve (TPU layout redesign, r5).

    ``static_cts`` is the RAW body-blocked static-world buffer
    (narrowphase.static_contacts: rows n*K..n*K+K-1 belong to body n, K =
    static_contacts_per_body) — NEVER compacted, so ground contacts cannot
    overflow (dropping them made bodies sink; the r4 bench pinned
    max_penetration at the 0.5 clamp).  The blocked layout means the
    static half of the solve needs NO gathers and NO scatters at all:
    body state broadcasts to its K rows by reshape, and impulse
    accumulation is a sum over the K axis — where the previous design
    spent ~half its per-iteration gather bytes on static rows.

    ``pair_cts`` holds body-pair contact rows grouped into ENTRIES of
    ``wm`` rows sharing one (a, b) body pair:
    - wm == 1: the compacted buffer — entries ARE contact rows, and the
      per-body incidence table must be rebuilt every step (compaction
      reshuffles rows).
    - wm > 1 (narrowphase.pair_contacts blocked layout): entries are pair
      slots, row r belongs to entry r // wm, unoccupied entries mark rows
      with a = -1.  Entry occupancy is stable across a broadphase reuse
      window, so the caller passes the (table, sign) built at the last
      pair rebuild — deleting the per-step incidence sort (~5 ms at 10k),
      the compaction (~4 ms), and shrinking every per-iteration gather
      from per-row to per-entry.

    Returns (linvel, angvel, pair lambda_n [Q, wm], pair table, pair sign,
    static lambda_n [N, K], cache').
    """
    n_bodies = body.capacity
    cpb = config.contacts_per_body
    K = static_cts.capacity // n_bodies
    Q = pair_cts.capacity // wm          # pair entries

    a_rows = pair_cts.a
    a_e = a_rows.reshape(Q, wm)[:, 0]              # entry bodies
    b_e = pair_cts.b.reshape(Q, wm)[:, 0]
    a_eg = jnp.maximum(a_e, 0)                     # gather-safe
    b_eg = jnp.maximum(b_e, 0)
    valid_p = pair_cts.valid.reshape(Q, wm)
    validf_p = valid_p.astype(jnp.float32)
    valid_s = static_cts.valid.reshape(n_bodies, K)
    validf_s = valid_s.astype(jnp.float32)

    if table is None:
        entry_occ = (a_e >= 0) if wm > 1 else (valid_p[:, 0] & (a_e >= 0))
        table, sign, _ = build_incidence(a_e, b_e, entry_occ, n_bodies, cpb)
    # Mass splitting counts BOTH classes: a body's inverse mass is shared
    # across every contact that can impulse it this iteration.  The pair
    # side counts wm rows per tabled entry — exact for wm == 1, a safe
    # overcount for blocked entries whose rows are partly invalid (a
    # larger count only shrinks the per-iteration step; FISTA recovers
    # the rate).
    pair_counts = jnp.sum((table >= 0).astype(jnp.float32), axis=1) * wm
    static_count = jnp.sum(validf_s, axis=1)
    counts = pair_counts + static_count

    # Sleeping bodies are immovable inside the solve (Jolt island semantics:
    # a sleeping island is excluded from the active set and acts as static
    # support).  The caller (physics_step) pre-wakes sleepers that are
    # being struck this step, so body.awake is already the effective set.
    awakef = body.awake.astype(jnp.float32)
    inv_mass = body.inv_mass * awakef
    inv_inertia = body.inv_inertia * awakef[:, None]
    # World-space inverse inertia ONCE PER BODY (the old per-contact-row
    # computation repeated it K+2 times per body).
    iw = tmath.world_inv_inertia(body.quat, inv_inertia)       # [N, 3, 3]
    c_body = jnp.maximum(counts, 1.0)

    # ---------------- static class: dense [N, K] ----------------
    nrm_s = static_cts.normal.reshape(n_bodies, K, 3)
    pen_s = static_cts.penetration.reshape(n_bodies, K)
    point_s = static_cts.point.reshape(n_bodies, K, 3)
    fric_s = static_cts.friction.reshape(n_bodies, K)
    rest_s = static_cts.restitution.reshape(n_bodies, K)
    t1_s, t2_s = _tangent_basis(nrm_s)
    r_s = point_s - body.pos[:, None, :]
    d_s = jnp.stack([nrm_s, t1_s, t2_s], axis=2)           # [N, K, 3dir, 3]
    rx_s = jnp.cross(r_s[:, :, None, :], d_s)              # [N, K, 3dir, 3]
    term_s = jnp.einsum("nij,nkdj->nkdi", iw, rx_s)        # Iw (r x d)
    k_s = ((inv_mass * c_body)[:, None, None]
           + jnp.sum(rx_s * term_s, -1) * c_body[:, None, None])
    k_s = jnp.maximum(k_s, 1e-9)
    kn_s, kt1_s, kt2_s = k_s[:, :, 0], k_s[:, :, 1], k_s[:, :, 2]
    an_s, at1_s, at2_s = term_s[:, :, 0], term_s[:, :, 1], term_s[:, :, 2]

    # ---------------- pair class: [Q entries x wm rows] ----------------
    # One packed gather row per ENTRY side instead of 5 field gathers
    # (pos3 | inv_mass | count | iw flattened) — TPU gathers dominate, row
    # width is nearly free next to row count, and all wm manifold rows of
    # an entry share the gathered body state by broadcast.
    bview = jnp.concatenate([
        body.pos, inv_mass[:, None], c_body[:, None],
        iw.reshape(n_bodies, 9),
    ], axis=1)                                             # [N, 14]
    va = bview[a_eg]                                       # [Q, 14]
    vb = bview[b_eg]
    im_a, im_b = va[:, 3], vb[:, 3]
    c_a, c_b = va[:, 4], vb[:, 4]
    iw_a = va[:, 5:14].reshape(Q, 3, 3)
    iw_b = vb[:, 5:14].reshape(Q, 3, 3)
    point_p = pair_cts.point.reshape(Q, wm, 3)
    r_a = point_p - va[:, None, :3]                        # [Q, wm, 3]
    r_b = point_p - vb[:, None, :3]
    nrm_p = pair_cts.normal.reshape(Q, wm, 3)
    fric_p = pair_cts.friction.reshape(Q, wm)
    rest_p = pair_cts.restitution.reshape(Q, wm)
    pen_p = pair_cts.penetration.reshape(Q, wm)
    t1_p, t2_p = _tangent_basis(nrm_p)
    d_p = jnp.stack([nrm_p, t1_p, t2_p], axis=2)           # [Q, wm, 3dir, 3]
    ra_x = jnp.cross(r_a[:, :, None, :], d_p)
    rb_x = jnp.cross(r_b[:, :, None, :], d_p)
    term_a = jnp.einsum("qij,qwdj->qwdi", iw_a, ra_x)      # [Q, wm, 3dir, 3]
    term_b = jnp.einsum("qij,qwdj->qwdi", iw_b, rb_x)
    k_p = ((im_a * c_a + im_b * c_b)[:, None, None]
           + jnp.sum(ra_x * term_a, -1) * c_a[:, None, None]
           + jnp.sum(rb_x * term_b, -1) * c_b[:, None, None])
    k_p = jnp.maximum(k_p, 1e-9)
    kn_p, kt1_p, kt2_p = k_p[:, :, 0], k_p[:, :, 1], k_p[:, :, 2]
    an_a, at1_a, at2_a = term_a[:, :, 0], term_a[:, :, 1], term_a[:, :, 2]
    an_b, at1_b, at2_b = term_b[:, :, 0], term_b[:, :, 1], term_b[:, :, 2]

    ab = jnp.concatenate([a_eg, b_eg])   # both entry sides, hoisted

    def rel_vels(linvel, angvel):
        """(v_s [N,K,3] dense, v_p [Q,wm,3] via ONE packed [2Q]-row gather).
        Pair payloads travel as bf16 (gather cost on TPU scales with bytes;
        velocities only need ~3 significant digits inside an iteration —
        the carried body state stays f32) and upcast after."""
        v_s = linvel[:, None, :] + jnp.cross(angvel[:, None, :], r_s)
        vview = jnp.concatenate([linvel, angvel], axis=1).astype(jnp.bfloat16)
        w = vview[ab].astype(jnp.float32)
        wa, wb = w[:Q], w[Q:]
        v_a = wa[:, None, :3] + jnp.cross(wa[:, None, 3:], r_a)
        v_b = wb[:, None, :3] + jnp.cross(wb[:, None, 3:], r_b)
        return v_s, v_a - v_b

    v0_s, v0_p = rel_vels(body.linvel, body.angvel)
    vn0_s = jnp.sum(v0_s * nrm_s, -1)
    vn0_p = jnp.sum(v0_p * nrm_p, -1)

    # Inactive restitution must NOT clamp the target to zero: a separated
    # (speculative) contact's target is pen/dt < 0 — it LIMITS approach
    # speed to exactly close the gap, it doesn't forbid approach.  (With a
    # 0.0 floor, slowly-approaching bodies hover at the speculative margin
    # ~4 cm above surfaces — caught by the golden-trajectory harness.)
    # Velocity-level Baumgarte only for DEEP penetration (beyond what the
    # split-impulse position pass recovers per step): running full-strength
    # velocity bias on top of position correction double-corrects and pumps
    # energy into resting stacks — a breathing limit cycle that keeps every
    # stacked body's velocity at 0.2-0.7 m/s forever, so stacks never
    # sleep.  Jolt gets stack stability from split impulse alone.
    deep = 0.04  # m; position solve handles anything shallower

    def vn_target(pen, rest, vn0):
        restitution_target = jnp.where(vn0 < -params.restitution_threshold,
                                       -rest * vn0, -jnp.inf)
        bias = jnp.where(pen > 0.0,
                         jnp.minimum((params.baumgarte / dt)
                                     * jnp.maximum(pen - deep, 0.0), 3.0),
                         pen / dt)
        return jnp.maximum(bias, restitution_target)

    target_s = vn_target(pen_s, rest_s, vn0_s)
    target_p = vn_target(pen_p, rest_p, vn0_p)

    # Pair apply machinery: per-slot reduction weights W [N, CPB, 3seg]:
    # seg 0 (linear impulse) = ±1 by side, seg 1 (ang_a block) = +1 on
    # a-side slots, seg 2 (ang_b block) = -1 on b-side slots — dω_a =
    # +Iw_a(r_a×P), dω_b = -Iw_b(r_b×P).  Folding side selection and
    # validity into one bf16 multiply-reduce (einsum, f32 accumulation).
    tbl = jnp.maximum(table, 0)
    signv = sign * (table >= 0)
    W = jnp.stack([signv, jnp.maximum(signv, 0.0), jnp.minimum(signv, 0.0)],
                  axis=2).astype(jnp.bfloat16)              # [N, CPB, 3]
    im_per_body = inv_mass[:, None]  # [N, 1]

    def apply_impulses(linvel, angvel, ds_n, ds_t1, ds_t2, dp_n, dp_t1, dp_t2):
        # Static class: dense accumulate over the K axis — no scatter.
        imp_s = (ds_n[..., None] * nrm_s + ds_t1[..., None] * t1_s
                 + ds_t2[..., None] * t2_s) * validf_s[..., None]
        dlin_s = jnp.sum(imp_s, axis=1)                     # [N, 3]
        dang_s = jnp.sum((ds_n[..., None] * an_s
                          + ds_t1[..., None] * at1_s
                          + ds_t2[..., None] * at2_s)
                         * validf_s[..., None], axis=1)
        # Pair class: rows fold into their entry (dense wm-axis sum), then
        # ONE packed gather [imp | ang_a | ang_b] -> [Q, 9] via the table.
        vp = validf_p[..., None]
        imp = jnp.sum((dp_n[..., None] * nrm_p + dp_t1[..., None] * t1_p
                       + dp_t2[..., None] * t2_p) * vp, axis=1)     # [Q, 3]
        ang_c_a = jnp.sum((dp_n[..., None] * an_a + dp_t1[..., None] * at1_a
                           + dp_t2[..., None] * at2_a) * vp, axis=1)
        ang_c_b = jnp.sum((dp_n[..., None] * an_b + dp_t1[..., None] * at1_b
                           + dp_t2[..., None] * at2_b) * vp, axis=1)
        block = jnp.concatenate([imp, ang_c_a, ang_c_b],
                                axis=1).astype(jnp.bfloat16)        # [Q, 9]
        g = block[tbl].reshape(n_bodies, cpb, 3, 3)         # [N,CPB,3seg,3]
        out = jnp.einsum("ncsw,ncs->nsw", g, W,
                         preferred_element_type=jnp.float32)  # [N,3seg,3]
        linvel = linvel + im_per_body * (out[:, 0] + dlin_s)
        angvel = angvel + out[:, 1] + out[:, 2] + dang_s
        return linvel, angvel

    def iteration(beta, carry):
        # Accelerated projected Jacobi (FISTA momentum on the impulses).
        # Plain mass-splitting Jacobi propagates force one contact-hop per
        # iteration, so a 10-deep stack (> iteration count) can never
        # converge in-step; the un-damped residual shows up as an artificial
        # acoustic breathing mode.  The normal-impulse subproblem is a
        # convex QP, so momentum extrapolation is principled (O(1/k^2) vs
        # O(1/k)) and costs zero extra gathers: velocities always
        # correspond to the EXTRAPOLATED impulses y; l is the last
        # projected (feasible) point.  ys/ls carry (static, pair) tuples.
        linvel, angvel, ys, ls, yp, lp = carry
        v_s, v_p = rel_vels(linvel, angvel)

        vn = jnp.sum(v_s * nrm_s, -1)
        ln_s = jnp.maximum(ys[0] + (target_s - vn) / kn_s, 0.0)
        vt1 = jnp.sum(v_s * t1_s, -1)
        vt2 = jnp.sum(v_s * t2_s, -1)
        mf = fric_s * ln_s
        lt1_s = jnp.clip(ys[1] - vt1 / kt1_s, -mf, mf)
        lt2_s = jnp.clip(ys[2] - vt2 / kt2_s, -mf, mf)

        vn = jnp.sum(v_p * nrm_p, -1)
        ln_p = jnp.maximum(yp[0] + (target_p - vn) / kn_p, 0.0)
        vt1 = jnp.sum(v_p * t1_p, -1)
        vt2 = jnp.sum(v_p * t2_p, -1)
        mf = fric_p * ln_p
        lt1_p = jnp.clip(yp[1] - vt1 / kt1_p, -mf, mf)
        lt2_p = jnp.clip(yp[2] - vt2 / kt2_p, -mf, mf)

        new_ls = (ln_s, lt1_s, lt2_s)
        new_lp = (ln_p, lt1_p, lt2_p)
        new_ys = tuple(l + beta * (l - l0) for l, l0 in zip(new_ls, ls))
        new_yp = tuple(l + beta * (l - l0) for l, l0 in zip(new_lp, lp))

        linvel, angvel = apply_impulses(
            linvel, angvel,
            *(yn - yo for yn, yo in zip(new_ys, ys)),
            *(yn - yo for yn, yo in zip(new_yp, yp)))
        return linvel, angvel, new_ys, new_ls, new_yp, new_lp

    # --- Warm start: look up last step's accumulated impulses by contact
    # identity (ONE packed gather over static + pair rows) and pre-apply
    # them before iterating. ---
    linvel0, angvel0 = body.linvel, body.angvel
    a_s_flat = static_cts.a
    if cache is not None:
        a_all = jnp.concatenate([a_s_flat, a_rows])
        key_all = jnp.concatenate([static_cts.key, pair_cts.key])
        valid_all = jnp.concatenate([static_cts.valid,
                                     pair_cts.valid]) & (a_all >= 0)
        h = _cache_hash(jnp.maximum(a_all, 0), key_all, cache.size)
        row = cache.data[h]                      # ONE [S+Q*wm, 5] gather
        kk = jax.lax.bitcast_convert_type(row[:, 0:2], jnp.int32)
        hit = valid_all & (kk[:, 0] == a_all) & (kk[:, 1] == key_all)
        warm = jnp.where(hit[:, None], row[:, 2:5], 0.0)
        S = a_s_flat.shape[0]
        ln0_s = jnp.maximum(warm[:S, 0], 0.0).reshape(n_bodies, K) * validf_s
        mf0 = fric_s * ln0_s
        lt10_s = jnp.clip(warm[:S, 1].reshape(n_bodies, K), -mf0, mf0) * validf_s
        lt20_s = jnp.clip(warm[:S, 2].reshape(n_bodies, K), -mf0, mf0) * validf_s
        ln0_p = jnp.maximum(warm[S:, 0], 0.0).reshape(Q, wm) * validf_p
        mf0 = fric_p * ln0_p
        lt10_p = jnp.clip(warm[S:, 1].reshape(Q, wm), -mf0, mf0) * validf_p
        lt20_p = jnp.clip(warm[S:, 2].reshape(Q, wm), -mf0, mf0) * validf_p
        linvel0, angvel0 = apply_impulses(linvel0, angvel0, ln0_s, lt10_s,
                                          lt20_s, ln0_p, lt10_p, lt20_p)
    else:
        ln0_s = lt10_s = lt20_s = jnp.zeros_like(kn_s)
        ln0_p = lt10_p = lt20_p = jnp.zeros_like(kn_p)

    # Unrolled: an XLA while loop costs ~0.5 ms/iteration of fixed overhead
    # on TPU (carry copies + sync), comparable to the iteration body itself.
    # FISTA momentum schedule beta_k = k/(k+3): starts at 0 (plain projected
    # step) and grows; restarting every step keeps it stable under the
    # warm-start-shifted initial point.
    ls0 = (ln0_s, lt10_s, lt20_s)
    lp0 = (ln0_p, lt10_p, lt20_p)
    carry = (linvel0, angvel0, ls0, ls0, lp0, lp0)
    for k in range(config.solver_iters):
        # beta=0 on the LAST iteration leaves y == l, so the final
        # velocities already correspond to the feasible impulses and no
        # snap-back apply is needed (saves one gather+reduce pass).
        beta = k / (k + 3.0) if k < config.solver_iters - 1 else 0.0
        carry = iteration(beta, carry)
    linvel, angvel, _ys, ls, _yp, lp = carry
    ln_s, lt1_s, lt2_s = ls
    ln_p, lt1_p, lt2_p = lp

    # --- Refresh the cache with this step's accumulated impulses, IN PLACE
    # (donated buffers): stale entries for vanished contacts persist, which
    # is harmless — a stale identity only matches when the same (body slot,
    # feature key) contact reappears, and warm-starting a reappearing
    # contact from its last impulse is exactly the cache's purpose.  The
    # host resets the cache when body slots are reused (PhysicsWorld).
    if cache is not None:
        lam_all = jnp.concatenate([
            jnp.stack([ln_s.reshape(-1), lt1_s.reshape(-1),
                       lt2_s.reshape(-1)], axis=1) * validf_s.reshape(-1, 1),
            jnp.stack([ln_p.reshape(-1), lt1_p.reshape(-1),
                       lt2_p.reshape(-1)], axis=1) * validf_p.reshape(-1, 1),
        ])
        dst = jnp.where(valid_all, h, cache.size)
        new_keys = jnp.stack([jnp.where(valid_all, a_all, -1),
                              jnp.where(valid_all, key_all, 0)], axis=1)
        new_row = jnp.concatenate([
            jax.lax.bitcast_convert_type(new_keys, jnp.float32), lam_all,
        ], axis=1)
        new_cache = SolverCache(
            data=cache.data.at[dst].set(new_row, mode="drop"))
    else:
        new_cache = None
    return linvel, angvel, ln_p, table, sign, ln_s, new_cache


def solve_positions(pos, body: BodyState, static_cts: Contacts,
                    pair_cts: Contacts, table, sign,
                    params: SimParams, config: SimConfig,
                    iters: int = 2, beta: float = 0.25, wm: int = 1):
    """Split-impulse position correction (Jolt runs 2 position iterations
    after its velocity solve): push residual penetration out by translating
    bodies directly, with mass-split weights, so deep stacks do not sink.
    Static rows use the dense body-blocked layout (no gathers/scatters —
    see solve_contacts); pairs reuse the velocity solve's entry table.
    Rotation is left untouched (translation-only NGS is the stable cheap
    variant).
    """
    n_bodies = body.capacity
    K = static_cts.capacity // n_bodies
    Q = pair_cts.capacity // wm
    a_e = pair_cts.a.reshape(Q, wm)[:, 0]
    b_e = pair_cts.b.reshape(Q, wm)[:, 0]
    a_eg = jnp.maximum(a_e, 0)
    b_eg = jnp.maximum(b_e, 0)
    validf_p = pair_cts.valid.reshape(Q, wm).astype(jnp.float32)
    nrm_p = pair_cts.normal.reshape(Q, wm, 3)
    pen_p = pair_cts.penetration.reshape(Q, wm)
    validf_s = static_cts.valid.reshape(n_bodies, K).astype(jnp.float32)
    nrm_s = static_cts.normal.reshape(n_bodies, K, 3)
    pen_s = static_cts.penetration.reshape(n_bodies, K)

    tbl = jnp.maximum(table, 0)
    tbl_valid = (table >= 0).astype(jnp.float32)[..., None]
    # Sleeping bodies are immovable (mirrors the velocity solve).
    im_per_body = (body.inv_mass * body.awake)[:, None]
    pos0 = pos
    # ONE packed per-ENTRY-side gather (pos3 | inv_mass) for both the
    # initial reference positions and the inverse masses — standalone [Q]
    # scalar gathers from [N] cost as much as a full row gather.
    view0 = jnp.concatenate([pos, im_per_body], axis=1)    # [N, 4]
    va0 = view0[a_eg]
    vb0 = view0[b_eg]
    pos0_a, im_a = va0[:, :3], va0[:, 3]
    pos0_b = vb0[:, :3]
    w_sum = jnp.maximum(im_a + vb0[:, 3], 1e-9)[:, None]   # [Q, 1]
    w_s = jnp.maximum(im_per_body[:, 0], 1e-9)[:, None]    # [N, 1]

    ab = jnp.concatenate([a_eg, b_eg])

    def it(first, pos):
        # Static class: dense residual from this body's own displacement.
        if first:
            pen_res_s = pen_s
            pen_res_p = pen_p
        else:
            dp_s = (pos - pos0)[:, None, :]                # [N, 1, 3]
            pen_res_s = pen_s - jnp.sum(dp_s * nrm_s, -1)
            pab = pos[ab]               # ONE [2Q]-row gather for both sides
            dp = ((pab[:Q] - pos0_a) - (pab[Q:] - pos0_b))[:, None, :]
            pen_res_p = pen_p - jnp.sum(dp * nrm_p, -1)
        push_s = jnp.maximum(pen_res_s - params.contact_slop, 0.0) * beta
        imp_s = nrm_s * (push_s / w_s * validf_s)[..., None]
        dpos_s = jnp.sum(imp_s, axis=1)                    # [N, 3]
        push_p = jnp.maximum(pen_res_p - params.contact_slop, 0.0) * beta
        # Per-row positional impulse along the normal, folded into the
        # entry (dense wm sum), then applied through the entry table.
        imp = jnp.sum(nrm_p * (push_p / w_sum * validf_p)[..., None],
                      axis=1)                              # [Q, 3]
        g = imp[tbl] * sign[..., None] * tbl_valid         # [N, CPB, 3]
        return pos + im_per_body * (jnp.sum(g, axis=1) + dpos_s)

    for i in range(iters):
        pos = it(i == 0, pos)
    return pos
