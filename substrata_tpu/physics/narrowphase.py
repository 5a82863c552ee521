"""Vectorized contact generation.

Replaces Jolt's narrowphase (GJK/EPA + specialized collide functions) with
TPU-friendly closed-form contact routines, vmapped over the padded pair list
from the broadphase:

- sphere-sphere / sphere-box / sphere-capsule: analytic closest points
- box-box: SAT over 15 axes + reference/incident face clipping, up to a
  4-point manifold (the approach of ODE's dBoxBox / Box2D clipping, written
  branch-free for vmap)
- capsule-capsule: segment-segment closest points
- box-capsule: convex ternary search of the segment-to-box distance (the
  distance along the segment to a convex set is convex, so a fixed-iteration
  ternary search converges deterministically)
- convex hulls collide exactly via a generic convex SAT (face planes of
  both sides + data-driven auxiliary axes) with a verts-past-reference-plane
  manifold; box/sphere/capsule vs hull go through the same kernel
  (hull_id in shape_params[0]).

Static world contacts (heightfield + static trimesh) are generated per body
from up to 8 shape sample points (box corners, capsule endpoints, hull verts
support-selected around world-down at the current orientation), mirroring what matters from Jolt's mesh/heightfield
collision for resting/rolling behaviour (reference shape factories:
gui_client/PhysicsWorld.cpp:735-1135).

Contact convention: ``normal`` points from body B (or the static world)
toward body A; positive ``penetration`` = overlapping; negative values down
to -margin are speculative contacts.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import flax.struct

from substrata_tpu.maths import quat as quatm
from substrata_tpu.physics.state import (
    BodyState, ShapeType, SimConfig, StaticWorld,
)

CONTACT_MARGIN = 0.04  # speculative contact distance, metres


@flax.struct.dataclass
class Contacts:
    """Flat padded contact batch (the TPU analogue of Jolt's contact
    constraint buffer, capacity reference PhysicsWorld.cpp:506)."""

    a: jnp.ndarray            # [C] i32 body slot
    b: jnp.ndarray            # [C] i32 body slot, -1 = static world
    point: jnp.ndarray        # [C, 3] world position
    normal: jnp.ndarray       # [C, 3] from b to a
    penetration: jnp.ndarray  # [C]
    valid: jnp.ndarray        # [C] bool
    friction: jnp.ndarray     # [C] combined
    restitution: jnp.ndarray  # [C] combined
    # Stable identity for warm starting: a contact is identified by
    # (a, key) where key = sample_slot+1 (1..8) for static contacts and
    # b*4 + manifold_slot + 9 for body pairs.  key 0 = no identity.
    key: jnp.ndarray          # [C] i32

    @property
    def capacity(self):
        return self.a.shape[0]


def _safe_normalize(v, fallback=(0.0, 0.0, 1.0), eps=1e-12):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    safe = v * jax.lax.rsqrt(jnp.maximum(n2, eps))
    return jnp.where(n2 > eps, safe, jnp.asarray(fallback, v.dtype))


def combine_friction(fa, fb):
    return jnp.sqrt(jnp.maximum(fa * fb, 0.0))


def combine_restitution(ra, rb):
    return jnp.maximum(ra, rb)


# ---------------------------------------------------------------------------
# Per-pair contact routines (scalar; vmapped over pairs).
# Each returns (points [4,3], pens [4], normal [3], valid [4]).
# ---------------------------------------------------------------------------

def _no_contact():
    return (jnp.zeros((4, 3)), jnp.full((4,), -1e9), jnp.array([0.0, 0.0, 1.0]),
            jnp.zeros((4,), bool))


def _one_point(point, pen, normal, ok):
    pts = jnp.zeros((4, 3)).at[0].set(point)
    pens = jnp.full((4,), -1e9).at[0].set(pen)
    valid = jnp.zeros((4,), bool).at[0].set(ok)
    return pts, pens, normal, valid


def _sphere_sphere(pa, ra, pb, rb):
    d = pa - pb
    dist = jnp.linalg.norm(d)
    n = _safe_normalize(d)
    pen = ra + rb - dist
    point = pb + n * (rb - 0.5 * pen)
    return _one_point(point, pen, n, pen > -CONTACT_MARGIN)


def _sphere_box(ps, rs, pb, qb, he):
    # Sphere center in box frame.
    p = quatm.inverse_rotate_vec(qb, ps - pb)
    c = jnp.clip(p, -he, he)
    delta = p - c
    dist = jnp.linalg.norm(delta)
    outside = dist > 1e-9
    # Inside: push out along the axis of least depth (one-hot arithmetic —
    # dynamic .at[ax] indexing becomes a vmapped scatter on TPU).
    depth_axes = he - jnp.abs(p)
    oh = jax.nn.one_hot(jnp.argmin(depth_axes), 3, dtype=p.dtype)
    p_ax = jnp.sum(p * oh)
    d_ax = jnp.min(depth_axes)
    n_in = oh * (jnp.sign(p_ax) + (p_ax == 0))
    n_local = jnp.where(outside, _safe_normalize(delta), n_in)
    pen = jnp.where(outside, rs - dist, rs + d_ax)
    surf_local = jnp.where(outside, c, p + n_in * d_ax)
    n = quatm.rotate_vec(qb, n_local)
    point = pb + quatm.rotate_vec(qb, surf_local)
    return _one_point(point, pen, n, pen > -CONTACT_MARGIN)


def _closest_pt_segment_segment(p1, d1, p2, d2):
    """Closest points between segments p1±d1 and p2±d2 (d = half-vector).

    Returns (t1, t2) in [-1, 1] parametrising each segment.
    Ericson, Real-Time Collision Detection 5.1.9, branch-free.
    """
    r = p1 - p2
    a = jnp.dot(d1, d1) + 1e-12
    e = jnp.dot(d2, d2) + 1e-12
    b = jnp.dot(d1, d2)
    c = jnp.dot(d1, r)
    f = jnp.dot(d2, r)
    denom = a * e - b * b
    t1 = jnp.where(denom > 1e-9, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-9), -1.0, 1.0), 0.0)
    t2 = (b * t1 + f) / e
    t2c = jnp.clip(t2, -1.0, 1.0)
    t1 = jnp.clip((b * t2c - c) / a, -1.0, 1.0)
    return t1, t2c


def _capsule_capsule(pa, qa, ra, ha, pb, qb, rb, hb):
    za = quatm.rotate_vec(qa, jnp.array([0.0, 0.0, 1.0])) * ha
    zb = quatm.rotate_vec(qb, jnp.array([0.0, 0.0, 1.0])) * hb
    t1, t2 = _closest_pt_segment_segment(pa, za, pb, zb)
    ca = pa + za * t1
    cb = pb + zb * t2
    return _sphere_sphere(ca, ra, cb, rb)


def _sphere_capsule(ps, rs, pc, qc, rc, hc):
    z = quatm.rotate_vec(qc, jnp.array([0.0, 0.0, 1.0])) * hc
    t = jnp.clip(jnp.dot(ps - pc, z) / (jnp.dot(z, z) + 1e-12), -1.0, 1.0)
    c = pc + z * t
    return _sphere_sphere(ps, rs, c, rc)


def _box_sdf(p, he):
    """Signed distance from point p (box frame) to box surface."""
    q = jnp.abs(p) - he
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q), 0.0)
    return outside + inside


def _capsule_box(pc, qc, rc, hc, pb, qb, he):
    """Capsule vs box: ternary search along the capsule segment for the point
    closest to the box, then 3 candidate sphere contacts (t*, both endpoints);
    keep the deepest 2."""
    z = quatm.rotate_vec(qc, jnp.array([0.0, 0.0, 1.0])) * hc

    def seg_pt_box_dist(t):
        p = quatm.inverse_rotate_vec(qb, (pc + z * t) - pb)
        return _box_sdf(p, he)

    lo, hi = jnp.float32(-1.0), jnp.float32(1.0)

    def ternary(_, lohi):
        lo, hi = lohi
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        f1, f2 = seg_pt_box_dist(m1), seg_pt_box_dist(m2)
        return jnp.where(f1 < f2, lo, m1), jnp.where(f1 < f2, m2, hi)

    lo, hi = jax.lax.fori_loop(0, 14, ternary, (lo, hi))
    tstar = 0.5 * (lo + hi)

    cands = jnp.stack([tstar, jnp.float32(-1.0), jnp.float32(1.0)])
    pts = jnp.zeros((4, 3))
    pens = jnp.full((4,), -1e9)
    valid = jnp.zeros((4,), bool)
    normal = jnp.array([0.0, 0.0, 1.0])
    for k in range(3):
        cpts, cpens, cn, cvalid = _sphere_box(pc + z * cands[k], rc, pb, qb, he)
        if k == 0:
            # slot 0 = closest point on the segment
            pts = pts.at[0].set(cpts[0])
            pens = pens.at[0].set(cpens[0])
            valid = valid.at[0].set(cvalid[0])
            normal = cn
        else:
            # slot 1 = deeper of the two endpoints
            better = cvalid[0] & (cpens[0] > pens[1])
            pts = jnp.where(better, pts.at[1].set(cpts[0]), pts)
            pens = jnp.where(better, pens.at[1].set(cpens[0]), pens)
            valid = jnp.where(better, valid.at[1].set(True), valid)
    # Avoid duplicating the same point in both slots.
    dup = jnp.linalg.norm(pts[0] - pts[1]) < 0.5 * rc
    valid = valid.at[1].set(valid[1] & ~dup)
    return pts, pens, normal, valid


# --- Box-box SAT + clipping --------------------------------------------------

def _box_box(pa, qa, hea, pb, qb, heb):
    """SAT over 6 face axes + 9 edge cross axes; manifold by clipping the
    incident face against the reference face side planes (up to 4 points)."""
    ra = quatm.to_matrix(qa)  # columns = A's axes in world
    rb = quatm.to_matrix(qb)
    c = ra.T @ rb             # rotation of B in A frame
    absc = jnp.abs(c) + 1e-5
    t_w = pb - pa
    t = ra.T @ t_w            # B center in A frame

    # Face axes of A (in A frame): separation = |t_i| - (hea_i + (absc @ heb)_i)
    sep_a = jnp.abs(t) - (hea + absc @ heb)
    # Face axes of B: t in B frame = c.T @ t
    tb = c.T @ t
    sep_b = jnp.abs(tb) - (heb + absc.T @ hea)

    # Edge-edge axes: L = A_i x B_j expressed in A frame (Ericson / ODE
    # closed forms).  Accumulated with stack, not .at[] — even static-index
    # .at updates become scatters under vmap on TPU.
    sep_list = []
    axis_list = []
    for i in range(3):
        for j in range(3):
            i1, i2 = (i + 1) % 3, (i + 2) % 3
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            # axis in A frame: e_i x c[:, j]
            comps = [jnp.zeros(()), jnp.zeros(()), jnp.zeros(())]
            comps[i1] = -c[i2, j]
            comps[i2] = c[i1, j]
            axis = jnp.stack(comps)
            alen = jnp.linalg.norm(axis)
            axis_n = axis / jnp.maximum(alen, 1e-9)
            ra_proj = hea[i1] * absc[i2, j] + hea[i2] * absc[i1, j]
            rb_proj = heb[j1] * absc[i, j2] + heb[j2] * absc[i, j1]
            dist = jnp.abs(jnp.dot(t, axis_n)) - (ra_proj + rb_proj) / jnp.maximum(alen, 1e-9)
            # Degenerate (parallel edges): disable this axis.
            dist = jnp.where(alen > 1e-6, dist, -1e9)
            sep_list.append(dist)
            axis_list.append(axis_n)
    sep_e = jnp.stack(sep_list).reshape(3, 3)
    axes_e = jnp.stack(axis_list).reshape(3, 3, 3)

    best_face_a = jnp.max(sep_a)
    best_face_b = jnp.max(sep_b)
    best_edge = jnp.max(sep_e)
    best_face = jnp.maximum(best_face_a, best_face_b)
    separated = jnp.maximum(best_face, best_edge) > CONTACT_MARGIN

    # Prefer face axes unless the edge axis is clearly better (Box2D-style bias).
    use_edge = best_edge > best_face * 0.98 + 0.001
    use_b_face = (~use_edge) & (best_face_b > best_face_a * 0.98 + 0.001)

    # --- Reference/incident face manifold via clamped incident corners.
    # (Loop-free alternative to Sutherland-Hodgman clipping: take the 4
    # corners of the incident face, clamp their in-face coordinates into the
    # reference face rectangle, and measure depth along the face normal.
    # Exact for the common axis-dominant stacking cases, approximate contact
    # positions for strongly rotated overlaps — the SAT normal stays exact.)
    def face_manifold(p_ref, q_ref, he_ref, p_inc, q_inc, he_inc, sep_vec):
        # All dynamic per-axis indexing is one-hot arithmetic (dynamic .at /
        # [ax] indexing lowers to vmapped scatter/gather on TPU).
        oh = jax.nn.one_hot(jnp.argmax(sep_vec), 3, dtype=p_ref.dtype)  # ref axis
        r_ref = quatm.to_matrix(q_ref)
        t_ref = r_ref.T @ (p_inc - p_ref)
        t_ax = jnp.sum(t_ref * oh)
        he_ax = jnp.sum(he_ref * oh)
        sgn = jnp.sign(t_ax) + (t_ax == 0)
        # Reference face normal in world (pointing from ref box toward inc box).
        n_world = sgn * (r_ref @ oh)
        # Incident face: the face of inc whose normal is most anti-parallel.
        r_inc = quatm.to_matrix(q_inc)
        dots = n_world @ r_inc  # [3] dot with each axis of inc
        ohi = jax.nn.one_hot(jnp.argmax(jnp.abs(dots)), 3, dtype=p_ref.dtype)
        d_ax = jnp.sum(dots * ohi)
        inc_sgn = -(jnp.sign(d_ax) + (d_ax == 0))
        # Incident face centre + its two in-face edge vectors (one-hot rolls).
        ohu1 = jnp.roll(ohi, 1)
        ohu2 = jnp.roll(ohi, 2)
        e0 = (r_inc @ (ohi * he_inc)) * inc_sgn
        e1 = r_inc @ (ohu1 * he_inc)
        e2 = r_inc @ (ohu2 * he_inc)
        corners = jnp.stack([
            p_inc + e0 + e1 + e2,
            p_inc + e0 - e1 + e2,
            p_inc + e0 - e1 - e2,
            p_inc + e0 + e1 - e2,
        ])  # [4, 3] world

        local = (corners - p_ref) @ r_ref                  # [4, 3] in ref frame
        depth = he_ax - sgn * (local @ oh)                 # >0 = below ref face
        clamped = jnp.clip(local, -he_ref, he_ref)
        ax_val = sgn * (he_ax - jnp.maximum(depth, 0.0) * 0.5)  # [4]
        clamped = clamped * (1.0 - oh)[None, :] + ax_val[:, None] * oh[None, :]
        pts = p_ref + clamped @ r_ref.T                    # back to world
        # Reject corners clamped too far (they belong to another face pair).
        lateral_shift = jnp.linalg.norm((clamped - local) * (1.0 - oh), axis=1)
        vmask = (depth > -CONTACT_MARGIN) & (lateral_shift < jnp.max(he_inc) * 1.5)
        pens = jnp.where(vmask, depth, -1e9)
        return pts, pens, n_world, vmask

    # ONE face_manifold call on the SELECTED reference box (was two — one
    # per candidate reference — with a select after; the manifold build is
    # ~40% of this kernel and the unselected one was pure waste).
    p_ref = jnp.where(use_b_face, pb, pa)
    q_ref = jnp.where(use_b_face, qb, qa)
    he_ref = jnp.where(use_b_face, heb, hea)
    p_inc = jnp.where(use_b_face, pa, pb)
    q_inc = jnp.where(use_b_face, qa, qb)
    he_inc = jnp.where(use_b_face, hea, heb)
    sep_sel = jnp.where(use_b_face, sep_b, sep_a)
    pts_f, pens_f, n_f, val_f = face_manifold(p_ref, q_ref, he_ref,
                                              p_inc, q_inc, he_inc, sep_sel)
    # face_manifold's normal points ref -> inc; contact normal is b -> a.
    # Downstream select flips the A-ref normal (-n_a) to get b->a; n_f
    # already matches both conventions (A->B when ref=A, B->A when ref=B).
    pts_a = pts_b = pts_f
    pens_a = pens_b = pens_f
    val_a = val_b = val_f
    n_a = n_b = n_f

    # Edge-edge single point (one-hot arithmetic throughout — dynamic
    # indexing lowers to vmapped gathers).
    eidx = jnp.argmax(sep_e.reshape(-1))
    oh9 = jax.nn.one_hot(eidx, 9, dtype=pa.dtype)
    ohe_i = jax.nn.one_hot(eidx // 3, 3, dtype=pa.dtype)
    ohe_j = jax.nn.one_hot(eidx % 3, 3, dtype=pa.dtype)
    axis_a_frame = oh9 @ axes_e.reshape(9, 3)
    n_edge_w = ra @ axis_a_frame
    # Orient the axis from A toward B.
    flip_sgn = jnp.sign(jnp.dot(n_edge_w, t_w)) + (jnp.dot(n_edge_w, t_w) == 0)
    n_edge_w = n_edge_w * flip_sgn
    # Support edge of A along +normal: corner signs from the normal projected
    # into A's frame, with the edge-axis component zeroed (edge runs along it).
    def _sgn(v):
        return jnp.sign(v) + (v == 0)
    sa = _sgn(ra.T @ n_edge_w)
    sb = _sgn(-(rb.T @ n_edge_w))
    a_center = pa + ra @ (sa * hea * (1.0 - ohe_i))
    b_center = pb + rb @ (sb * heb * (1.0 - ohe_j))
    da = ra @ ohe_i
    db = rb @ ohe_j
    ea_half = da * jnp.sum(hea * ohe_i)
    eb_half = db * jnp.sum(heb * ohe_j)
    t1, t2 = _closest_pt_segment_segment(a_center, ea_half, b_center, eb_half)
    pe_a = a_center + ea_half * t1
    pe_b = b_center + eb_half * t2
    edge_pen = -best_edge
    edge_pt = 0.5 * (pe_a + pe_b)
    # Normal from b to a:
    n_edge_ba = -n_edge_w
    pts_e, pens_e, n_e, val_e = _one_point(edge_pt, edge_pen, n_edge_ba, edge_pen > -CONTACT_MARGIN)

    # Select manifold. Face-A reference: normal from A toward B -> flip to b->a.
    pts = jnp.where(use_edge, pts_e, jnp.where(use_b_face, pts_b, pts_a))
    pens = jnp.where(use_edge, pens_e, jnp.where(use_b_face, pens_b, pens_a))
    normal = jnp.where(use_edge, n_e, jnp.where(use_b_face, n_b, -n_a))
    valid = jnp.where(use_edge, val_e, jnp.where(use_b_face, val_b, val_a))
    valid = valid & ~separated
    return pts, pens, normal, valid


# ---------------------------------------------------------------------------
# Generic convex-vs-convex (hull narrowphase)
# ---------------------------------------------------------------------------
#
# Every convex shape is represented as (padded vertex set, vertex mask,
# radius, padded face planes, plane mask): hull = its reduced hull verts +
# qhull face planes; box = 8 corners + 6 planes; capsule = 2 segment
# endpoints + radius (no planes); sphere = 1 vert + radius.  Contact is SAT
# over both sides' face planes plus data-driven auxiliary axes (closest
# vertex directions), with a verts-past-reference-plane manifold (<= 4
# points, like Jolt manifolds).  This replaces the round-1 hull->OBB proxy
# (reference collides true hulls via GJK/EPA, PhysicsWorld.cpp:1000-1083;
# face SAT omits exact edge-edge axes — deep crossed-edge poses get an
# approximate normal, everything else is exact).


def _convex_convex(pa, wa, maska, ra, pl_a, plmask_a,
                   pb, wb, maskb, rb, pl_b, plmask_b):
    """One convex pair.  wa [Va,3] world verts (masked), ra radius;
    pl_* [F,4] world planes (unit n, d with n·x <= d for the shape's solid),
    plmask_* [F] bool.  Returns (pts [4,3], pens [4], normal b->a, valid)."""
    NEG = jnp.float32(-3e38)
    POS = jnp.float32(3e38)

    # --- Candidate axes: A's faces (pointing A->B), B's faces (B->A). ---
    # Separation along A's face j: min over B verts of n·v - rb - d_j.
    proj_ba = wb @ pl_a[:, :3].T                          # [Vb, Fa]
    min_b = jnp.min(jnp.where(maskb[:, None], proj_ba, POS), axis=0)
    sep_a = jnp.where(plmask_a, min_b - rb - pl_a[:, 3], NEG)   # [Fa]
    proj_ab = wa @ pl_b[:, :3].T                          # [Va, Fb]
    min_a = jnp.min(jnp.where(maska[:, None], proj_ab, POS), axis=0)
    sep_b = jnp.where(plmask_b, min_a - ra - pl_b[:, 3], NEG)   # [Fb]

    # --- Auxiliary axes (vertex/edge Voronoi coverage for sphere/capsule
    # sides and a center axis): directions between closest vertices. ---
    d2 = jnp.sum((wa[:, None, :] - wb[None, :, :]) ** 2, axis=-1)  # [Va,Vb]
    d2 = jnp.where(maska[:, None] & maskb[None, :], d2, POS)
    flat = jnp.argmin(d2.reshape(-1))
    ia, ib = flat // d2.shape[1], flat % d2.shape[1]
    axis1 = _safe_normalize(wb[ib] - wa[ia])              # closest-verts dir
    axis2 = _safe_normalize(pb - pa)                      # center axis
    aux = jnp.stack([axis1, axis2])                       # [2,3] point A->B

    def sep_along(u):
        sa = jnp.max(jnp.where(maska, wa @ u, NEG)) + ra
        sb = jnp.min(jnp.where(maskb, wb @ u, POS)) - rb
        return sb - sa

    sep_aux = jax.vmap(sep_along)(aux)                    # [2]

    best_a = jnp.max(sep_a)
    best_b = jnp.max(sep_b)
    best_x = jnp.max(sep_aux)
    best = jnp.maximum(jnp.maximum(best_a, best_b), best_x)
    separated = best > CONTACT_MARGIN

    # Prefer face axes (stable manifolds) unless an aux axis is clearly
    # better (same bias rule as the box-box SAT).
    best_face = jnp.maximum(best_a, best_b)
    use_aux = best_x > best_face * 0.98 + 0.001
    use_b = (~use_aux) & (best_b > best_a * 0.98 + 0.001)

    # --- Manifold from A's reference face: B's verts past the plane. ---
    def face_manifold(pl, sep, vin, maskin, rin):
        oh = jax.nn.one_hot(jnp.argmax(sep), pl.shape[0], dtype=pl.dtype)
        n = oh @ pl[:, :3]                                # ref normal (A->B)
        d = jnp.sum(oh * pl[:, 3])
        depth = d + rin - vin @ n                         # [Vin] >0 past plane
        depth = jnp.where(maskin, depth, NEG)
        k = min(4, vin.shape[0])
        top_d, top_i = jax.lax.top_k(depth, k)
        if k < 4:  # sphere/capsule incident side: pad to the 4-slot manifold
            top_d = jnp.concatenate([top_d, jnp.full((4 - k,), NEG)])
            top_i = jnp.concatenate([top_i, jnp.zeros((4 - k,), top_i.dtype)])
        vsel = vin[top_i]                                 # [4,3]
        pts = vsel - n[None, :] * (rin - 0.5 * jnp.maximum(top_d, 0.0))[:, None]
        valid = top_d > -CONTACT_MARGIN
        return pts, top_d, n, valid

    pts_a, pen_a, n_a, val_a = face_manifold(pl_a, sep_a, wb, maskb, rb)
    pts_b, pen_b, n_b, val_b = face_manifold(pl_b, sep_b, wa, maska, ra)

    # --- Aux single point: between supports along the axis. ---
    ohx = jax.nn.one_hot(jnp.argmax(sep_aux), 2, dtype=wa.dtype)
    u = ohx @ aux
    pa_s = wa[jnp.argmax(jnp.where(maska, wa @ u, NEG))] + u * ra
    pb_s = wb[jnp.argmin(jnp.where(maskb, wb @ u, POS))] - u * rb
    pen_x = -best_x
    pts_x, pens_x, n_x, val_x = _one_point(
        0.5 * (pa_s + pb_s), pen_x, -u, pen_x > -CONTACT_MARGIN)

    # Normal convention: from B to A.
    pts = jnp.where(use_aux, pts_x, jnp.where(use_b, pts_b, pts_a))
    pens = jnp.where(use_aux, pens_x, jnp.where(use_b, pen_b, pen_a))
    normal = jnp.where(use_aux, n_x, jnp.where(use_b, n_b, -n_a))
    valid = jnp.where(use_aux, val_x, jnp.where(use_b, val_b, val_a))
    valid = valid & ~separated
    return pts, pens, normal, valid


# np (not jnp): importing this module must not initialise a JAX backend
# (bench.py's outage-fallback depends on host-only imports); jnp ops convert
# these at trace time.
_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    np.float32)
_BOX_NORMALS = np.array(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    np.float32)


def _convex_rep(row, stype, hull_verts, hull_planes, hull_n_verts,
                hull_n_faces):
    """World-space convex representation for one packed body row
    [pos0:3 quat3:7 type7 prm8:12 ...] of static shape class ``stype``.
    Returns (pos, verts [V,3], mask [V], radius, planes [F,4], plmask [F])."""
    pos = row[:3]
    quat = row[3:7]
    prm = row[8:12]
    if stype == int(ShapeType.SPHERE):
        verts = pos[None, :]
        mask = jnp.ones((1,), bool)
        return pos, verts, mask, prm[0], jnp.zeros((1, 4)), jnp.zeros((1,), bool)
    if stype == int(ShapeType.CAPSULE):
        z = quatm.rotate_vec(quat, jnp.array([0.0, 0.0, 1.0])) * prm[1]
        verts = jnp.stack([pos + z, pos - z])
        mask = jnp.ones((2,), bool)
        return pos, verts, mask, prm[0], jnp.zeros((1, 4)), jnp.zeros((1,), bool)
    if stype == int(ShapeType.BOX):
        local = _BOX_CORNERS * prm[:3]
        verts = pos[None, :] + quatm.rotate_vec(quat[None, :], local)
        n_w = quatm.rotate_vec(quat[None, :], _BOX_NORMALS)
        he6 = jnp.concatenate([prm[:3], prm[:3]])[
            jnp.array([0, 0, 1, 1, 2, 2])]
        d = he6 + n_w @ pos
        planes = jnp.concatenate([n_w, d[:, None]], axis=1)
        return pos, verts, jnp.ones((8,), bool), jnp.float32(0.0), planes, jnp.ones((6,), bool)
    # HULL: prm[0] = hull slot.
    hid = jnp.clip(prm[0].astype(jnp.int32), 0, hull_verts.shape[0] - 1)
    local = hull_verts[hid]                                # [V,3]
    verts = pos[None, :] + quatm.rotate_vec(quat[None, :], local)
    mask = jnp.arange(local.shape[0]) < hull_n_verts[hid]
    pl = hull_planes[hid]                                  # [F,4]
    n_w = quatm.rotate_vec(quat[None, :], pl[:, :3])
    d = pl[:, 3] + n_w @ pos
    planes = jnp.concatenate([n_w, d[:, None]], axis=1)
    plmask = jnp.arange(pl.shape[0]) < hull_n_faces[hid]
    return pos, verts, mask, jnp.float32(0.0), planes, plmask


def _make_convex_kernel(type_a: int, type_b: int, hulls):
    """Bucket kernel for a hull-involving combo: batched generic SAT."""
    hv, hp = hulls.verts, hulls.planes
    hnv, hnf = hulls.n_verts, hulls.n_faces

    def single(rowa, rowb):
        ra = _convex_rep(rowa, type_a, hv, hp, hnv, hnf)
        rb = _convex_rep(rowb, type_b, hv, hp, hnv, hnf)
        return _convex_convex(*ra, *rb)

    return lambda va, vb: jax.vmap(single)(va, vb)


# Branch kernels indexed by code = type_a*4 + type_b (types: 0=sphere,
# 1=box, 2=capsule, 3=hull).  Each takes the packed per-side rows and
# returns (pts [K,4,3], pens [K,4], normal [K,3], valid [K,4]); flipped
# variants negate the normal (swapped operands).  Hull combos use the
# generic convex SAT kernel (built per call — it closes over the hull
# library).


def _flip3(res):
    pts, pens, n, val = res
    return pts, pens, -n, val


_CLOSED_FORM_KERNELS = {
    0: lambda va, vb: jax.vmap(lambda A, B: _sphere_sphere(
        A[:3], A[8], B[:3], B[8]))(va, vb),
    1: lambda va, vb: jax.vmap(lambda A, B: _sphere_box(
        A[:3], A[8], B[:3], B[3:7], B[8:11]))(va, vb),
    2: lambda va, vb: jax.vmap(lambda A, B: _sphere_capsule(
        A[:3], A[8], B[:3], B[3:7], B[8], B[9]))(va, vb),
    4: lambda va, vb: jax.vmap(lambda A, B: _flip3(_sphere_box(
        B[:3], B[8], A[:3], A[3:7], A[8:11])))(va, vb),
    5: lambda va, vb: jax.vmap(lambda A, B: _box_box(
        A[:3], A[3:7], A[8:11], B[:3], B[3:7], B[8:11]))(va, vb),
    6: lambda va, vb: jax.vmap(lambda A, B: _flip3(_capsule_box(
        B[:3], B[3:7], B[8], B[9], A[:3], A[3:7], A[8:11])))(va, vb),
    8: lambda va, vb: jax.vmap(lambda A, B: _flip3(_sphere_capsule(
        B[:3], B[8], A[:3], A[3:7], A[8], A[9])))(va, vb),
    9: lambda va, vb: jax.vmap(lambda A, B: _capsule_box(
        A[:3], A[3:7], A[8], A[9], B[:3], B[3:7], B[8:11]))(va, vb),
    10: lambda va, vb: jax.vmap(lambda A, B: _capsule_capsule(
        A[:3], A[3:7], A[8], A[9], B[:3], B[3:7], B[8], B[9]))(va, vb),
}

# Same-type combos can fill the whole pair list (homogeneous worlds);
# mixed combos get max_pairs / MIXED_FRACTION slots.
_SAME_TYPE_CODES = (0, 5, 10, 15)
_MIXED_FRACTION = 4
_NUM_CODES = 16
# Manifold width per combo code: sphere contacts have 1 point, capsule
# contacts up to 2, box/hull faces up to 4 — emitting 4 slots for every
# combo inflates the contact-compaction input ~2x for nothing.
_MANIFOLD_WIDTH = [1, 1, 1, 1,
                   1, 4, 2, 4,
                   1, 2, 1, 2,
                   1, 4, 2, 4]


def blocked_manifold_width(config: SimConfig, capacity: int) -> int:
    """Manifold width for the PAIR-BLOCKED contact layout, or 0 when the
    world must use the compacted layout.

    In blocked mode every active bucket emits the SAME number of manifold
    rows per pair slot (max width among active combos, narrower kernels
    padded with invalid rows), so contact row r belongs to pair entry
    r // wm — the solver then needs no per-step compaction and its
    incidence table (a ~5 ms TPU sort) is built once per broadphase
    rebuild window instead of every step.  Ineligible when:
    - the padded row total exceeds the budget (row padding on very mixed
      worlds would outgrow the compacted buffer's win), or
    - the incidence sort key (body << entry_bits+1) cannot pack into u32.
    """
    present = list(config.present_shape_types)
    active = [c for c in range(_NUM_CODES)
              if present[c // 4] and present[c % 4]]
    if not active:
        return 0
    wm = max(_MANIFOLD_WIDTH[c] for c in active)
    entries = 0
    for c in active:
        cap = (config.max_pairs if c in _SAME_TYPE_CODES
               else max(64, config.max_pairs // _MIXED_FRACTION))
        entries += min(cap, config.max_pairs)
    if entries * wm > 8 * config.max_pairs:
        return 0
    if max(capacity.bit_length(), 1) + max(entries.bit_length(), 1) + 1 > 32:
        return 0
    return wm


def pair_contacts(body: BodyState, pair_a, pair_b, pair_valid,
                  config: SimConfig, hulls=None, blocked_wm: int = 0):
    """Generate manifolds for the broadphase pair list.

    TPU design: pairs are partitioned by shape-combo code into fixed-size
    buckets and each combo's kernel runs ONLY on its own bucket (computing
    all 16 branches for every pair and selecting costs ~a full pass per
    branch).  ``hulls`` (state.HullLibrary) feeds the generic convex SAT
    for hull combos.  Returns (Contacts, pair_touching [P] for contact
    events, bucket overflow count).

    ``blocked_wm`` > 0 emits the PAIR-BLOCKED layout (see
    blocked_manifold_width): every bucket pads its manifold to blocked_wm
    rows and unoccupied pair slots mark their rows with a = -1, so the
    solver can recover entry occupancy without a separate channel.
    """
    if hulls is None:
        from substrata_tpu.physics.state import empty_hull_library
        hulls = empty_hull_library(capacity=1)
    p = pair_a.shape[0]
    a = jnp.maximum(pair_a, 0)
    b = jnp.maximum(pair_b, 0)
    # Packed gather rows: pos3 | quat4 | type1 | params4 | friction |
    # restitution | sensor.
    pview = jnp.concatenate([
        body.pos, body.quat, body.shape_type.astype(jnp.float32)[:, None],
        body.shape_params, body.friction[:, None], body.restitution[:, None],
        body.is_sensor.astype(jnp.float32)[:, None],
    ], axis=1)  # [N, 15] -> per-side rows [pos0:3 quat3:7 type7 prm8:12 fr12 re13 sn14]
    # Combo code from two narrow i32 gathers; the wide pview rows are
    # gathered PER BUCKET below (gathering [P,15] here and re-gathering per
    # bucket would double the dominant gather traffic).
    codes = jnp.clip(body.shape_type[a] * 4 + body.shape_type[b],
                     0, _NUM_CODES - 1)

    present = list(config.present_shape_types)
    active_codes = [c for c in range(_NUM_CODES)
                    if present[c // 4] and present[c % 4]]
    single_combo = len(active_codes) == 1
    if single_combo:
        # Homogeneous world (one shape type — e.g. an all-box scene): every
        # valid pair has the same combo code, so the bucket IS the pair
        # list.  Skip the grouping argsort entirely — a 16k argsort costs
        # ~5.5 ms on TPU (sorts are the single most expensive primitive in
        # the step's bookkeeping).
        order = sorted_codes = starts = None
    else:
        # ONE shared sort groups pairs by combo code; each bucket is then a
        # dynamic_slice at its run boundary (16 scatter-compactions cost
        # ~0.7 ms each on TPU).  Boundaries come from counting codes below
        # each value — jnp.searchsorted lowers to a slow while loop.
        sort_codes = jnp.where(pair_valid, codes, _NUM_CODES)
        order = jnp.argsort(sort_codes).astype(jnp.int32)
        sorted_codes = sort_codes[order]
        starts = jnp.sum(
            sort_codes[None, :] < jnp.arange(_NUM_CODES + 1, dtype=jnp.int32)[:, None],
            axis=1).astype(jnp.int32)

    batches = []
    touch_src = []  # (bucket_pair_idx, bucket_touching)
    overflow = jnp.int32(0)
    for code in range(_NUM_CODES):
        cap = (config.max_pairs if code in _SAME_TYPE_CODES
               else max(64, config.max_pairs // _MIXED_FRACTION))
        if not (present[code // 4] and present[code % 4]):
            # Combo cannot occur in this world: skip the bucket ENTIRELY at
            # compile time (even a 16-slot token bucket costs a kernel +
            # ~25 small gathers; 15 absent combos ≈ 400 launches/step).  A
            # stale present_shape_types config surfaces as overflow instead.
            if not single_combo:
                overflow = overflow + (starts[code + 1] - starts[code])
            continue
        if single_combo:
            # The bucket is the whole pair list, in place (no sort above).
            cap = p
            src = jnp.where(pair_valid,
                            jnp.arange(p, dtype=jnp.int32), -1)
            bvalid = pair_valid
            srcs = jnp.arange(p, dtype=jnp.int32)
        else:
            cap = min(cap, p)
            start = jnp.minimum(starts[code], p - cap)
            run_len = starts[code + 1] - starts[code]
            src_all = jax.lax.dynamic_slice(order, (start,), (cap,))
            # Mask slots outside this code's run (slice may span neighbours).
            in_run = jax.lax.dynamic_slice(sorted_codes, (start,), (cap,)) == code
            src = jnp.where(in_run, src_all, -1)
            bvalid = src >= 0
            overflow = overflow + jnp.maximum(run_len - cap, 0)
            srcs = jnp.maximum(src, 0)
        ba = a[srcs]
        bb_ = b[srcs]
        bva = pview[ba]
        bvb = pview[bb_]
        kernel = _CLOSED_FORM_KERNELS.get(code)
        if kernel is None:
            kernel = _make_convex_kernel(code // 4, code % 4, hulls)
        pts, pens, normal, valid = kernel(bva, bvb)
        valid = valid & bvalid[:, None]
        # Clearly-separated (speculative-only) pairs keep ONLY their deepest
        # point: one point suffices to brake the approach speed, and the
        # extra manifold points of thousands of near-miss pairs would evict
        # REAL touching contacts in the fixed compaction buffer (bodies
        # then sink 0.5+ m into each other during pile settling).  Pairs
        # within 1 cm keep the full manifold — a bouncing stacked box
        # micro-separates every step, and collapsing its manifold to one
        # corner point makes the landing torque asymmetric (the stack
        # slowly walks sideways; caught by the 5-box fidelity test).
        near_pts = jnp.any(valid & (pens > -0.01), axis=1)
        deepest = jnp.argmax(jnp.where(valid, pens, -1e9), axis=1)
        keep1 = jnp.arange(pens.shape[1])[None, :] == deepest[:, None]
        valid = valid & (near_pts[:, None] | keep1)
        sensor_b = (bva[:, 14] > 0) | (bvb[:, 14] > 0)
        fr_b = combine_friction(bva[:, 12], bvb[:, 12])
        re_b = combine_restitution(bva[:, 13], bvb[:, 13])
        wm = blocked_wm or _MANIFOLD_WIDTH[code]
        if pts.shape[1] < wm:
            # Blocked layout: pad narrow kernels (sphere/capsule manifolds)
            # with invalid rows so every pair entry spans exactly wm rows.
            padw = wm - pts.shape[1]
            pts = jnp.concatenate(
                [pts, jnp.zeros((cap, padw, 3), pts.dtype)], axis=1)
            pens = jnp.concatenate(
                [pens, jnp.full((cap, padw), -1e9, pens.dtype)], axis=1)
            valid = jnp.concatenate(
                [valid, jnp.zeros((cap, padw), bool)], axis=1)
        cw = cap * wm
        slotw = jnp.tile(jnp.arange(wm, dtype=jnp.int32), cap)
        # Blocked layout marks unoccupied pair slots with a = -1 so the
        # solver can recover entry occupancy (rows are masked by `valid`
        # either way; the compacted path keeps raw ids, its compaction
        # drops invalid rows before any gather).
        a_entry = jnp.where(bvalid, ba, -1) if blocked_wm else ba
        batches.append(Contacts(
            a=jnp.repeat(a_entry, wm)[:cw],
            b=jnp.repeat(bb_, wm)[:cw],
            point=pts[:, :wm].reshape(cw, 3),
            normal=jnp.repeat(normal, wm, axis=0)[:cw],
            penetration=pens[:, :wm].reshape(cw),
            valid=(valid[:, :wm] & ~sensor_b[:, None]).reshape(cw),
            friction=jnp.repeat(fr_b, wm)[:cw],
            restitution=jnp.repeat(re_b, wm)[:cw],
            key=jnp.repeat(bb_, wm)[:cw] * 4 + slotw + 9,
        ))
        touch_src.append((src, jnp.any(valid, axis=1)))

    if not batches:                   # degenerate config: no present combos
        z3 = jnp.zeros((1, 3))
        return (Contacts(a=jnp.full((1,), -1, jnp.int32),
                         b=jnp.full((1,), -1, jnp.int32),
                         point=z3, normal=z3.at[:, 2].set(1.0),
                         penetration=jnp.full((1,), -1e9),
                         valid=jnp.zeros((1,), bool),
                         friction=jnp.zeros((1,)),
                         restitution=jnp.zeros((1,)),
                         key=jnp.zeros((1,), jnp.int32)),
                jnp.zeros((p,), bool), overflow)
    contacts = concat_contacts(*batches)
    if single_combo:
        # Bucket rows are the pair list in place: no scatter-back needed.
        return contacts, touch_src[0][1] & pair_valid, overflow
    # Per-pair touching mask for contact events (scatter each bucket back).
    touching = jnp.zeros((p + 1,), bool)
    for src, btouch in touch_src:
        touching = touching.at[jnp.where(src >= 0, src, p)].max(
            btouch, mode="drop")
    return contacts, touching[:p], overflow


# ---------------------------------------------------------------------------
# Static world contacts
# ---------------------------------------------------------------------------

def shape_sample_points(body: BodyState, hulls,
                        present=(True, True, True, True)):
    """Per-body sample points for static-geometry collision: [N, 8, 3] world
    points and [N] sample radii.

    sphere: center (radius r); capsule: 2 endpoints (radius r);
    box: 8 corners (radius 0); hull: 8 verts support-selected along a cone
    of directions around world-down AT THE CURRENT ORIENTATION, so the
    resting face's vertices are always among the samples (a fixed
    precomputed vertex set misses them for e.g. an octahedron lying on a
    face).  Unused slots repeat the first point (harmless duplicates are
    deduped by the deepest-point selection in the solver's mass splitting).

    ``present`` (static) lets absent shape types compile away — a
    homogeneous world pays for one local-point construction, not four.
    """
    n = body.capacity
    st = body.shape_type
    p = body.shape_params

    corners = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                        jnp.float32)  # [8, 3]

    cands = []  # (shape_type, local [N,8,3])
    if present[int(ShapeType.BOX)]:
        cands.append((int(ShapeType.BOX), corners[None, :, :] * p[:, None, :3]))
    if present[int(ShapeType.CAPSULE)]:
        cap_local = jnp.zeros((n, 8, 3)).at[:, 0, 2].set(p[:, 1]).at[:, 1, 2].set(-p[:, 1])
        cands.append((int(ShapeType.CAPSULE), cap_local))
    if present[int(ShapeType.HULL)]:
        hull_ids = jnp.clip(p[:, 0].astype(jnp.int32), 0, hulls.capacity - 1)
        hverts = hulls.verts[hull_ids]                    # [N, V, 3]
        # World-down in local frame + a 30° ring around it (8 directions).
        down_l = quatm.inverse_rotate_vec(body.quat,
                                          jnp.array([0.0, 0.0, -1.0]))  # [N,3]
        ax = jnp.where(jnp.abs(down_l[:, 0:1]) < 0.9,
                       jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
        u1 = jnp.cross(ax, down_l)
        u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-9)
        u2 = jnp.cross(down_l, u1)
        ang = jnp.arange(8, dtype=jnp.float32) * (2.0 * jnp.pi / 8.0)
        cone_c, cone_s = 0.866, 0.5                       # 30° half-angle
        dirs = (down_l[:, None, :] * cone_c
                + (u1[:, None, :] * jnp.cos(ang)[None, :, None]
                   + u2[:, None, :] * jnp.sin(ang)[None, :, None]) * cone_s)
        scores = jnp.einsum("nvd,nkd->nkv", hverts, dirs)  # [N, 8, V]
        sel = jnp.argmax(scores, axis=-1)                  # [N, 8]
        hull_local = jnp.take_along_axis(hverts, sel[..., None], axis=1)
        cands.append((int(ShapeType.HULL), hull_local))
    if present[int(ShapeType.SPHERE)] or not cands:
        cands.append((int(ShapeType.SPHERE), jnp.zeros((n, 8, 3))))

    local = cands[-1][1]
    for stype, cand in cands[:-1]:
        local = jnp.where((st == stype)[:, None, None], cand, local)

    n_samples = jnp.where(st == int(ShapeType.BOX), 8,
                 jnp.where(st == int(ShapeType.CAPSULE), 2,
                  jnp.where(st == int(ShapeType.HULL), 8, 1)))
    radius = jnp.where((st == int(ShapeType.SPHERE)) | (st == int(ShapeType.CAPSULE)),
                       p[:, 0], 0.0)
    world = body.pos[:, None, :] + quatm.rotate_vec(body.quat[:, None, :], local)
    slot_valid = jnp.arange(8)[None, :] < n_samples[:, None]
    return world, radius, slot_valid


def _closest_point_triangle(p, v0, v1, v2):
    """Closest point on triangle to p (Ericson 5.1.5, branch-free)."""
    ab = v1 - v0
    ac = v2 - v0
    ap = p - v0
    d1 = jnp.dot(ab, ap)
    d2 = jnp.dot(ac, ap)
    bp = p - v1
    d3 = jnp.dot(ab, bp)
    d4 = jnp.dot(ac, bp)
    cp = p - v2
    d5 = jnp.dot(ab, cp)
    d6 = jnp.dot(ac, cp)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc
    v = vb / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    w = vc / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    interior = v0 + ab * v + ac * w

    # Vertex regions
    res = interior
    res = jnp.where((d1 <= 0) & (d2 <= 0), v0, res)
    res = jnp.where((d3 >= 0) & (d4 <= d3), v1, res)
    res = jnp.where((d6 >= 0) & (d5 <= d6), v2, res)
    # Edge AB
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ab = d1 / jnp.where(jnp.abs(d1 - d3) > 1e-12, d1 - d3, 1e-12)
    res = jnp.where(on_ab, v0 + jnp.clip(t_ab, 0, 1) * ab, res)
    # Edge AC
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    t_ac = d2 / jnp.where(jnp.abs(d2 - d6) > 1e-12, d2 - d6, 1e-12)
    res = jnp.where(on_ac, v0 + jnp.clip(t_ac, 0, 1) * ac, res)
    # Edge BC
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    t_bc = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) > 1e-12, (d4 - d3) + (d5 - d6), 1e-12)
    res = jnp.where(on_bc, v1 + jnp.clip(t_bc, 0, 1) * (v2 - v1), res)
    return res


def static_contacts(body: BodyState, world: StaticWorld, hull_contact_verts,
                    config: SimConfig):
    """Contacts of every body's sample points against heightfield + trimesh.

    One contact slot per sample point (8/body); each slot takes the deeper of
    its heightfield and trimesh candidate.
    """
    n = body.capacity
    pts, radius, slot_valid = shape_sample_points(
        body, world.hulls, config.present_shape_types)  # [N,8,3]
    flat = pts.reshape(n * 8, 3)
    rad = jnp.repeat(radius, 8)

    # --- Heightfield ---
    hf = world.heightfield
    h, hf_n = hf.sample_with_normal(flat[:, :2])
    hf_pen = (h - (flat[:, 2] - rad))
    # Project penetration onto the surface normal (slope correction).
    hf_pen = hf_pen * hf_n[:, 2]
    # Contact point: for radius samples (sphere/capsule) it must lie along
    # the contact NORMAL from the sample centre — using the vertical-drop
    # surface point gives the normal impulse a torque that exactly cancels
    # friction's, freezing balls on slopes in a spurious static equilibrium
    # (caught by the rolling-sphere analytic fidelity test: a = 5/7 g sinθ).
    hf_point = jnp.where(
        (rad > 0)[:, None], flat - hf_n * rad[:, None],
        jnp.concatenate([flat[:, :2], h[:, None]], axis=1))
    hf_ok = world.has_heightfield & (hf_pen > -CONTACT_MARGIN)

    # --- Trimesh: candidates from this point's grid cell (skipped entirely
    # at runtime when there is no static trimesh) ---
    tm = world.trimesh

    def _trimesh_contacts(_):
        gx, gy, cap = tm.cell_tris.shape
        ci = jnp.clip(((flat[:, 0] - tm.origin[0]) / tm.cell_w).astype(jnp.int32), 0, gx - 1)
        cj = jnp.clip(((flat[:, 1] - tm.origin[1]) / tm.cell_w).astype(jnp.int32), 0, gy - 1)
        cand = tm.cell_tris[ci, cj]  # [N*8, cap]
        k = min(cap, config.max_tri_candidates)
        cand = cand[:, :k]
        cand_ok = cand >= 0
        tri = tm.tris[jnp.maximum(cand, 0)]  # [N*8, k, 3]
        v0 = tm.verts[tri[..., 0]]
        v1 = tm.verts[tri[..., 1]]
        v2 = tm.verts[tri[..., 2]]
        cp = jax.vmap(jax.vmap(_closest_point_triangle))(
            jnp.broadcast_to(flat[:, None, :], v0.shape), v0, v1, v2)
        delta = flat[:, None, :] - cp
        dist = jnp.linalg.norm(delta, axis=-1)
        tri_n = jnp.cross(v1 - v0, v2 - v0)
        tri_n = _safe_normalize(tri_n)
        signed_side = jnp.sum((flat[:, None, :] - v0) * tri_n, axis=-1)
        # Below the triangle plane: treat distance as negative (tunnelled).
        sdist = jnp.where(signed_side >= 0, dist, -dist)
        tm_pen_k = rad[:, None] - sdist
        tm_pen_k = jnp.where(cand_ok, tm_pen_k, -1e9)
        # Contact normal: from surface to point when outside, else tri normal.
        cn = jnp.where((dist > 1e-6)[..., None] & (signed_side >= 0)[..., None],
                       delta / jnp.maximum(dist, 1e-6)[..., None], tri_n)
        best = jnp.argmax(tm_pen_k, axis=1)
        bi = jnp.arange(n * 8)
        tm_pen = tm_pen_k[bi, best]
        tm_point = cp[bi, best]
        tm_normal = cn[bi, best]
        tm_ok = (tm_pen > -CONTACT_MARGIN) & (tm_pen < 1e8) & cand_ok[bi, best]
        return tm_pen, tm_point, tm_normal, tm_ok

    def _no_trimesh(_):
        return (jnp.full((n * 8,), -1e9), jnp.zeros((n * 8, 3)),
                jnp.zeros((n * 8, 3)).at[:, 2].set(1.0),
                jnp.zeros((n * 8,), bool))

    # COMPILE-TIME skip when the world has no trimesh (empty_trimesh keeps
    # a 1-triangle placeholder): the runtime lax.cond still cost ~1.7 ms of
    # speculated branch work per step on TPU even with n_tris == 0.
    if tm.tris.shape[0] <= 1:
        tm_pen, tm_point, tm_normal, tm_ok = _no_trimesh(None)
    else:
        tm_pen, tm_point, tm_normal, tm_ok = jax.lax.cond(
            tm.n_tris > 0, _trimesh_contacts, _no_trimesh, operand=None)

    use_tm = tm_ok & (~hf_ok | (tm_pen > hf_pen))
    pen = jnp.where(use_tm, tm_pen, hf_pen)
    point = jnp.where(use_tm[:, None], tm_point, hf_point)
    normal = jnp.where(use_tm[:, None], tm_normal, hf_n)
    ok = (use_tm | hf_ok) & slot_valid.reshape(-1)

    # Eligibility per BODY once, then repeat — `x[repeat(arange(n), 8)]`
    # compiles to a slow pred-gather (bit-packed bool rows cost ~0.8 ms
    # EACH at 10k bodies); repeat is a free broadcast.
    # Sleeping bodies emit no static contacts: they are immovable in the
    # solve (Jolt removes sleeping islands from the active set), and at 10k
    # bodies their resting ground manifolds would saturate the compacted
    # contact buffer and evict live body-body contacts.
    elig = (body.alive & body.collidable & body.dynamic & ~body.is_sensor
            & body.awake)
    ok &= jnp.repeat(elig, 8)
    # Clamp runaway penetrations (deep tunnelling) for solver stability.
    pen = jnp.clip(pen, -1e9, 0.5)

    # Keep only the K deepest samples per body (a Jolt contact manifold has
    # <= 4 points; a flat-resting box needs exactly its 4 floor corners).
    # Halves the rows fed to contact compaction and the solver.
    k = min(config.static_contacts_per_body, 8)
    if k < 8:
        pen_rows = jnp.where(ok, pen, -1e9).reshape(n, 8)
        top_pen, top_slot = jax.lax.top_k(pen_rows, k)      # [N, k]
        flat_sel = (jnp.arange(n, dtype=jnp.int32)[:, None] * 8
                    + top_slot).reshape(-1)
        # ONE packed gather for the selected rows (point3|normal3|pen|ok).
        sel_block = jnp.concatenate([
            point, normal, pen[:, None], ok.astype(jnp.float32)[:, None],
        ], axis=1)[flat_sel]                                # [n*k, 8]
        point = sel_block[:, 0:3]
        normal = sel_block[:, 3:6]
        pen = sel_block[:, 6]
        ok = (sel_block[:, 7] > 0) & (top_pen.reshape(-1) > -1e8)
        key_slot = top_slot.reshape(-1)
    else:
        k = 8
        key_slot = jnp.tile(jnp.arange(8, dtype=jnp.int32), n)

    body_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    return Contacts(
        a=body_idx,
        b=jnp.full((n * k,), -1, jnp.int32),
        point=point,
        normal=normal,
        penetration=pen,
        valid=ok,
        friction=combine_friction(jnp.repeat(body.friction, k),
                                  jnp.full((n * k,), 0.5)),
        restitution=jnp.repeat(body.restitution, k),
        key=key_slot + 1,
    )


def concat_contacts(*batches: Contacts) -> Contacts:
    return Contacts(*[jnp.concatenate([getattr(b, f) for b in batches])
                      for f in ("a", "b", "point", "normal", "penetration",
                                "valid", "friction", "restitution", "key")])


def compact_contacts(contacts: Contacts, max_active: int):
    """Stream-compact valid contacts into a fixed smaller buffer so the
    solver iterates over ~actual contacts instead of the padded capacity
    (two scatters: one packed float block, one packed int key).

    Returns (compacted Contacts of size max_active, overflow count).
    """
    c = contacts.capacity
    valid = contacts.valid
    # Two-class prioritised compaction: actually-touching contacts (pen>0)
    # fill the buffer FIRST, speculative (separated) ones take what's left
    # — under overflow it must be the speculative rows that drop, or
    # resting bodies lose their support contacts and sink.  Same single
    # scatter; one extra cumsum.
    touching = valid & (contacts.penetration > 0.0)
    spec = valid & ~touching
    n_touch = jnp.sum(touching)
    idx_t = jnp.cumsum(touching) - 1
    idx_s = n_touch + jnp.cumsum(spec) - 1
    out_idx = jnp.where(touching, idx_t, idx_s)
    keep = valid & (out_idx < max_active)
    # Non-keep rows route to the sacrificial row max_active (sliced off),
    # so the payload needs no masking.
    dst = jnp.where(keep, out_idx, max_active)

    fblock = jnp.concatenate([
        contacts.point, contacts.normal, contacts.penetration[:, None],
        contacts.friction[:, None], contacts.restitution[:, None],
    ], axis=1)  # [C, 9]
    # Int lanes ride the SAME scatter bitcast to f32 (scatter cost on TPU is
    # per input row; two scatters of the same rows cost double): a, b and
    # the warm-start key in separate lanes (16-bit packing would cap bodies
    # at 32768; separate lanes carry the full 65536-slot range for the cost
    # of one extra lane, and scatter cost is per ROW); a == -1 = empty slot.
    iblock = jnp.stack([contacts.a, contacts.b, contacts.key], axis=1)
    block = jnp.concatenate(
        [fblock, jax.lax.bitcast_convert_type(iblock, jnp.float32)], axis=1)
    base = jnp.concatenate([
        jnp.zeros((max_active + 1, 9), jnp.float32),
        jax.lax.bitcast_convert_type(
            jnp.full((max_active + 1, 3), -1, jnp.int32), jnp.float32),
    ], axis=1)
    buf = base.at[dst].set(block, mode="drop")[:max_active]
    fbuf = buf[:, :9]
    ibuf = jax.lax.bitcast_convert_type(buf[:, 9:12], jnp.int32)

    cvalid = ibuf[:, 0] >= 0
    a = jnp.where(cvalid, ibuf[:, 0], 0)
    b = jnp.where(cvalid, ibuf[:, 1], -1)
    # Capacity-pressure counter: TOUCHING rows dropped.  Touching rows fill
    # the buffer first, so speculative (separated-within-margin) rows are
    # the designed shed class and their loss is not a correctness event.
    overflow = jnp.maximum(n_touch - max_active, 0)
    return Contacts(
        a=a, b=b, point=fbuf[:, 0:3], normal=fbuf[:, 3:6],
        penetration=fbuf[:, 6], valid=cvalid, friction=fbuf[:, 7],
        restitution=fbuf[:, 8],
        key=jnp.where(cvalid, ibuf[:, 2], 0),
    ), overflow
