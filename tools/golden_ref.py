"""Independent sequential-impulse reference solver (numpy, host-side).

The fidelity bar for this engine is "matching Jolt trajectories within
tolerance" (BASELINE.md).  Jolt itself is not buildable in this image, so
this module implements Jolt's *documented* solver semantics independently —
sequential (Gauss-Seidel) impulses in contact order, 10 velocity + 2
position iterations per step, warm starting, accumulated-impulse clamping,
box friction clamped to mu*lambda_n, Baumgarte stabilisation with slop,
restitution on approach speed, semi-implicit Euler — the algorithm of
physics_system->Update (gui_client/PhysicsWorld.cpp:1356-1364, Jolt 5.3
defaults).  It is deliberately a DIFFERENT implementation style from the
TPU engine (scalar sequential vs mass-splitting Jacobi): agreement between
the two is evidence the TPU solver reproduces sequential-impulse behaviour,
which is the property "Jolt fidelity" names.

Scope: enough shapes for the canonical fixture scenes — sphere / box /
convex vert-cloud bodies against the ground plane, sphere-sphere, and
near-aligned box-box stacking (upper corners vs lower top face).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

GRAVITY = np.array([0.0, 0.0, -9.81])
VEL_ITERS = 10       # Jolt default velocity iterations
POS_ITERS = 2        # Jolt default position iterations
BAUMGARTE = 0.2
SLOP = 0.005
REST_THRESHOLD = 1.0  # min approach speed for restitution (m/s)


def quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def quat_rot(q, v):
    x, y, z, w = q
    u = np.array([x, y, z])
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


def quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


@dataclass
class Body:
    pos: np.ndarray
    quat: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 0.0, 1.0]))
    linvel: np.ndarray = field(default_factory=lambda: np.zeros(3))
    angvel: np.ndarray = field(default_factory=lambda: np.zeros(3))
    inv_mass: float = 1.0
    inv_inertia: np.ndarray = field(default_factory=lambda: np.ones(3))  # local diag
    friction: float = 0.5
    restitution: float = 0.0
    # Contact sample vertices in local frame (sphere: one vert + radius).
    verts: np.ndarray = field(default_factory=lambda: np.zeros((1, 3)))
    radius: float = 0.0
    # For box-box stacking: half extents (None for non-boxes).
    half_extents: np.ndarray | None = None
    # For hull-hull: local face planes [[nx,ny,nz,d], ...] with n.x+d<=0
    # inside (scipy ConvexHull.equations; None for non-hulls).
    planes: np.ndarray | None = None
    lin_damping: float = 0.05
    ang_damping: float = 0.05

    def world_inv_inertia(self):
        r = quat_to_mat(self.quat)
        return r @ np.diag(self.inv_inertia) @ r.T


def make_sphere_body(r, pos, density=1000.0, restitution=0.0, friction=0.5):
    m = density * 4 / 3 * np.pi * r ** 3
    i = 0.4 * m * r * r
    return Body(pos=np.asarray(pos, float), inv_mass=1 / m,
                inv_inertia=np.full(3, 1 / i), radius=r,
                restitution=restitution, friction=friction)


def make_box_body(he, pos, density=1000.0, friction=0.5, restitution=0.0):
    he = np.asarray(he, float)
    m = density * 8 * he.prod()
    c = m / 3.0
    inertia = np.array([c * (he[1] ** 2 + he[2] ** 2),
                        c * (he[0] ** 2 + he[2] ** 2),
                        c * (he[0] ** 2 + he[1] ** 2)])
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)], float) * he
    return Body(pos=np.asarray(pos, float), inv_mass=1 / m,
                inv_inertia=1 / inertia, verts=corners, half_extents=he,
                friction=friction, restitution=restitution)


def make_capsule_body(r, hh, pos, density=1000.0, friction=0.5,
                      restitution=0.0):
    """Capsule with axis local +z: verts = the two segment endpoints,
    radius = r (sphere is the degenerate 1-endpoint case, so the contact
    routines below treat both uniformly as radius-swept point sets)."""
    # Take the ENGINE's exact mass properties (like make_hull_body) so
    # trajectories are comparable; the solver under test is independent.
    from substrata_tpu.physics import shapes
    sh = shapes.make_capsule(r, hh, density=density)
    ends = np.array([[0.0, 0.0, hh], [0.0, 0.0, -hh]])
    return Body(pos=np.asarray(pos, float), inv_mass=float(sh.inv_mass),
                inv_inertia=np.asarray(sh.inv_inertia, float),
                verts=ends, radius=r,
                friction=friction, restitution=restitution)


def _closest_segment_segment(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2]
    (Ericson 5.1.9)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = d1 @ d1
    e = d2 @ d2
    f = d2 @ r
    if a < 1e-12 and e < 1e-12:
        return p1, p2
    if a < 1e-12:
        s = 0.0
        t = np.clip(f / e, 0.0, 1.0)
    else:
        c = d1 @ r
        if e < 1e-12:
            t = 0.0
            s = np.clip(-c / a, 0.0, 1.0)
        else:
            b = d1 @ d2
            den = a * e - b * b
            s = np.clip((b * f - c * e) / den, 0.0, 1.0) if den > 1e-12 else 0.0
            t = (b * s + f) / e
            if t < 0.0:
                t = 0.0
                s = np.clip(-c / a, 0.0, 1.0)
            elif t > 1.0:
                t = 1.0
                s = np.clip((b - c) / a, 0.0, 1.0)
    return p1 + d1 * s, p2 + d2 * t


def make_hull_body(verts, pos, density=1000.0, friction=0.5, restitution=0.0):
    """Convex vert-cloud body with the SAME exact mass properties the engine
    computes (shapes.make_convex_hull) so trajectories are comparable."""
    from substrata_tpu.physics import shapes
    sh = shapes.make_convex_hull(np.asarray(verts, np.float32),
                                 density=density)
    from scipy.spatial import ConvexHull
    planes = ConvexHull(np.asarray(sh.hull_verts, float)).equations
    return Body(pos=np.asarray(pos, float), inv_mass=sh.inv_mass,
                inv_inertia=np.asarray(sh.inv_inertia, float),
                verts=np.asarray(sh.hull_verts, float),
                planes=planes,
                friction=friction, restitution=restitution)


class _Contact:
    __slots__ = ("a", "b", "point", "normal", "pen", "key",
                 "ln", "lt1", "lt2", "t1", "t2",
                 "r_a", "r_b", "kn", "kt1", "kt2", "iw_a", "iw_b", "im_b",
                 "target", "mu")

    def __init__(self, a, b, point, normal, pen, key):
        self.a, self.b = a, b
        self.point, self.normal, self.pen, self.key = point, normal, pen, key
        self.ln = self.lt1 = self.lt2 = 0.0
        ax = np.array([1.0, 0, 0]) if abs(normal[0]) < 0.9 else np.array([0, 1.0, 0])
        self.t1 = np.cross(ax, normal)
        self.t1 /= max(np.linalg.norm(self.t1), 1e-9)
        self.t2 = np.cross(normal, self.t1)


def _world_ends(b):
    """World-space swept-point set: sphere = [center], capsule = the two
    segment endpoints, polyhedra = vertices."""
    return b.pos + (quat_to_mat(b.quat) @ b.verts.T).T


def _box_edges(body):
    """12 world-space edges of a box as (start [12,3], end [12,3])."""
    r = quat_to_mat(body.quat)
    he = body.half_extents
    starts, ends = [], []
    for ax in range(3):
        u, v = (ax + 1) % 3, (ax + 2) % 3
        for su in (-1, 1):
            for sv in (-1, 1):
                off = np.zeros(3)
                off[u], off[v] = su * he[u], sv * he[v]
                lo = off.copy()
                hi = off.copy()
                lo[ax], hi[ax] = -he[ax], he[ax]
                starts.append(body.pos + r @ lo)
                ends.append(body.pos + r @ hi)
    return np.array(starts), np.array(ends)


def _box_box_edge_contacts(bodies, i, j, margin):
    """SAT edge-regime contacts for a box pair with NO contained corners:
    full 15-axis SAT for the min-penetration axis; cross axis -> closest
    points of the support edges; face axis -> the other box's support edge
    clipped to the face rectangle (a box lying across another's edge)."""
    a, b = bodies[i], bodies[j]
    ra, rb = quat_to_mat(a.quat), quat_to_mat(b.quat)
    d = a.pos - b.pos
    axes = []
    for k in range(3):
        axes.append(("faceA", k, ra[:, k]))
        axes.append(("faceB", k, rb[:, k]))
    for u in range(3):
        for v in range(3):
            c = np.cross(ra[:, u], rb[:, v])
            n = np.linalg.norm(c)
            if n > 1e-6:
                axes.append(("cross", (u, v), c / n))
    best = None
    for kind, which, L in axes:
        proj_a = float(np.sum(a.half_extents * np.abs(ra.T @ L)))
        proj_b = float(np.sum(b.half_extents * np.abs(rb.T @ L)))
        overlap = proj_a + proj_b - abs(float(d @ L))
        if overlap < -margin:
            return []                       # separated
        if best is None or overlap < best[0]:
            best = (overlap, kind, which, L)
    pen, kind, which, L = best
    n = L if float(L @ d) >= 0 else -L      # points from j (b) to i (a)
    out = []
    if kind == "cross":
        u, v = which
        # Support edge of A along -n (nearest B), of B along +n.
        off_a = np.zeros(3)
        for k in range(3):
            if k != u:
                s = -np.sign(float(ra[:, k] @ n)) or 1.0
                off_a[k] = s * a.half_extents[k]
        off_b = np.zeros(3)
        for k in range(3):
            if k != v:
                s = np.sign(float(rb[:, k] @ n)) or 1.0
                off_b[k] = s * b.half_extents[k]
        ca = a.pos + ra @ off_a
        cb = b.pos + rb @ off_b
        ea = ra[:, u] * a.half_extents[u]
        eb = rb[:, v] * b.half_extents[v]
        pa, pb = _closest_segment_segment(ca - ea, ca + ea, cb - eb, cb + eb)
        out.append(_Contact(i, j, 0.5 * (pa + pb), n, pen,
                            (i, j, 100 + 3 * u + v)))
    else:
        # Face regime without contained corners: an edge lies across the
        # face.  Clip the incident box's support edge to the face rect.
        if kind == "faceA":
            fb, ob_, rf, ro = a, b, ra, rb     # face owner / other
            fi, oi = i, j
            n_face = n                          # outward from B toward A?
        else:
            fb, ob_, rf, ro = b, a, rb, ra
            fi, oi = j, i
        # Face normal oriented outward from the face owner toward the other.
        n_out = L if float(L @ (ob_.pos - fb.pos)) >= 0 else -L
        # Support EDGE of the other box along -n_out: the edge direction is
        # the other box's axis most perpendicular to n_out among those
        # whose sign is ambiguous; concretely pick the axis with the
        # smallest |axis . n_out| and support-offset the other two.
        dots = [abs(float(ro[:, k] @ n_out)) for k in range(3)]
        eax = int(np.argmin(dots))
        off = np.zeros(3)
        for k in range(3):
            if k != eax:
                s = -np.sign(float(ro[:, k] @ n_out)) or 1.0
                off[k] = s * ob_.half_extents[k]
        ce = ob_.pos + ro @ off
        ee = ro[:, eax] * ob_.half_extents[eax]
        p0, p1 = ce - ee, ce + ee
        # Clip segment to the face rectangle in the face owner's frame.
        q0 = rf.T @ (p0 - fb.pos)
        q1 = rf.T @ (p1 - fb.pos)
        nl = rf.T @ n_out
        fax = int(np.argmax(np.abs(nl)))
        t0, t1 = 0.0, 1.0
        for k in range(3):
            if k == fax:
                continue
            lo, hi = -fb.half_extents[k], fb.half_extents[k]
            dk = q1[k] - q0[k]
            for bound, sign in ((lo, 1.0), (hi, -1.0)):
                num = sign * (q0[k] - bound)
                den = -sign * dk
                if abs(den) < 1e-12:
                    if num > 0:
                        return out          # fully outside the face slab
                else:
                    t = num / den
                    if den > 0:
                        t0 = max(t0, t)
                    else:
                        t1 = min(t1, t)
        if t0 > t1:
            return out
        face_h = fb.half_extents[fax]
        for t in (t0, t1):
            q = q0 + (q1 - q0) * t
            p = float(face_h - abs(q[fax]))
            if p > -margin:
                pt = fb.pos + rf @ q
                out.append(_Contact(oi, fi, pt, n_out, p,
                                    (oi, fi, 200 + int(t * 100))))
    return out


def _collect_contacts(bodies, ground_z, margin=0.04):
    contacts = []
    for i, b in enumerate(bodies):
        # vs ground plane.  radius > 0: swept points (sphere center /
        # capsule endpoints) each contact at pen = g + r - z.
        if b.radius > 0:
            w = _world_ends(b)
            for k in range(len(w)):
                pen = ground_z + b.radius - w[k, 2]
                if pen > -margin:
                    contacts.append(_Contact(
                        i, -1, np.array([w[k, 0], w[k, 1], ground_z]),
                        np.array([0.0, 0, 1.0]), pen, (i, -1, k)))
        else:
            w = _world_ends(b)
            for k in np.argsort(w[:, 2])[:4]:
                pen = ground_z - w[k, 2]
                if pen > -margin:
                    contacts.append(_Contact(i, -1, w[k].copy(),
                                             np.array([0.0, 0, 1.0]), pen,
                                             (i, -1, int(k) + 1)))
    # pairwise
    for i in range(len(bodies)):
        for j in range(i + 1, len(bodies)):
            a, b = bodies[i], bodies[j]
            if a.radius > 0 and b.radius > 0:
                # Sphere/capsule vs sphere/capsule: closest points between
                # the (possibly degenerate) core segments.
                wa = _world_ends(a)
                wb = _world_ends(b)
                pa, pb = _closest_segment_segment(
                    wa[0], wa[-1], wb[0], wb[-1])
                d = pa - pb
                dist = np.linalg.norm(d)
                pen = a.radius + b.radius - dist
                if pen > -margin:
                    n = d / max(dist, 1e-9)
                    contacts.append(_Contact(i, j, pb + n * b.radius,
                                             n, pen, (i, j, 0)))
            elif a.half_extents is not None and b.half_extents is not None:
                # Generic vertex-face manifold, both directions: corners of
                # one box inside the other (covers aligned stacks AND
                # rotated configurations).
                n_before = len(contacts)
                for (ai, bi) in ((i, j), (j, i)):
                    ba, bb = bodies[ai], bodies[bi]
                    ra = quat_to_mat(ba.quat)
                    corners = _world_ends(bb)
                    q = (corners - ba.pos) @ ra            # in A's frame
                    he = ba.half_extents
                    inside = np.all(np.abs(q) < he + margin, axis=1)
                    for k in np.nonzero(inside)[0]:
                        push = he - np.abs(q[k])           # per-axis depth
                        ax = int(np.argmin(push))
                        pen = float(push[ax])
                        if pen > -margin:
                            n_local = np.zeros(3)
                            n_local[ax] = np.sign(q[k, ax]) or 1.0
                            n = ra @ n_local               # A -> B
                            contacts.append(_Contact(
                                bi, ai, corners[k].copy(), n, pen,
                                (bi, ai, int(k) + 1)))
                # Edge regimes (VERDICT r3 item 6): when no corner is
                # contained — a box resting across another's edge, or two
                # edges crossing — the vertex-face pass finds nothing even
                # though SAT overlaps.  Supplement with the SAT min-axis
                # edge contact(s).
                if len(contacts) == n_before:
                    contacts.extend(_box_box_edge_contacts(
                        bodies, i, j, margin))
            elif a.planes is not None and b.planes is not None:
                # Hull-hull vertex-face manifold, both directions: each
                # vertex of one hull tested against the other's face planes
                # (scipy ConvexHull equations — fully independent of the
                # engine's SAT + clipping path).  Edge-edge regimes are
                # outside this oracle's scope, same as box-box.
                for (ai, bi) in ((i, j), (j, i)):
                    ba, bb = bodies[ai], bodies[bi]
                    ra = quat_to_mat(ba.quat)
                    wverts = (quat_to_mat(bb.quat) @ bb.verts.T).T + bb.pos
                    q = (wverts - ba.pos) @ ra             # into A's frame
                    # signed distance to each face; max = distance outside
                    sd = q @ ba.planes[:, :3].T + ba.planes[:, 3]
                    worst = np.max(sd, axis=1)
                    face = np.argmax(sd, axis=1)
                    for k in np.nonzero(worst < margin)[0]:
                        pen = float(-worst[k])
                        n = ra @ ba.planes[face[k], :3]    # outward from A
                        contacts.append(_Contact(
                            bi, ai, wverts[k].copy(), n, pen,
                            (bi, ai, int(k) + 1)))
    return contacts


def step(bodies, dt, ground_z=0.0, warm: dict | None = None):
    """One 60 Hz-style step: forces -> contacts -> sequential impulses
    (VEL_ITERS passes in contact order) -> integrate -> position solve."""
    for b in bodies:
        if b.inv_mass > 0:
            b.linvel = b.linvel + GRAVITY * dt
            b.linvel *= np.exp(-b.lin_damping * dt)
            b.angvel *= np.exp(-b.ang_damping * dt)

    contacts = _collect_contacts(bodies, ground_z)
    warm = warm if warm is not None else {}

    # Precompute per-contact data + warm start (Jolt applies cached impulses
    # before iterating).
    for c in contacts:
        ba = bodies[c.a]
        bb = bodies[c.b] if c.b >= 0 else None
        c.r_a = c.point - ba.pos
        c.r_b = c.point - bb.pos if bb is not None else np.zeros(3)
        iw_a = ba.world_inv_inertia()
        iw_b = bb.world_inv_inertia() if bb is not None else np.zeros((3, 3))
        im_b = bb.inv_mass if bb is not None else 0.0

        def eff(d, c=c, ba=ba, iw_a=iw_a, iw_b=iw_b, im_b=im_b):
            ra_x = np.cross(c.r_a, d)
            rb_x = np.cross(c.r_b, d)
            return max(ba.inv_mass + im_b + ra_x @ iw_a @ ra_x
                       + rb_x @ iw_b @ rb_x, 1e-9)

        c.kn = eff(c.normal)
        c.kt1 = eff(c.t1)
        c.kt2 = eff(c.t2)
        c.iw_a, c.iw_b, c.im_b = iw_a, iw_b, im_b
        v = _rel_vel(bodies, c)
        vn0 = v @ c.normal
        rest = max(ba.restitution,
                   bb.restitution if bb is not None else 0.0)
        # Separated (speculative) contacts LIMIT approach speed to pen/dt;
        # inactive restitution must not clamp that to zero.
        c.target = max(
            min(BAUMGARTE / dt * max(c.pen - SLOP, 0.0), 3.0)
            if c.pen > 0 else c.pen / dt,
            -rest * vn0 if vn0 < -REST_THRESHOLD else -np.inf)
        c.mu = np.sqrt(max(ba.friction * (bb.friction if bb is not None
                                          else 0.5), 0.0))
        ln, lt1, lt2 = warm.get(c.key, (0.0, 0.0, 0.0))
        c.ln = max(ln, 0.0)
        c.lt1, c.lt2 = lt1, lt2
        _apply(bodies, c, c.ln, c.lt1, c.lt2)

    # Sequential impulses: contacts solved IN ORDER within each iteration
    # (the order-dependence the TPU Jacobi solver must reproduce in effect).
    for _ in range(VEL_ITERS):
        for c in contacts:
            v = _rel_vel(bodies, c)
            dln = (c.target - v @ c.normal) / c.kn
            ln_new = max(c.ln + dln, 0.0)
            dln = ln_new - c.ln
            c.ln = ln_new
            max_f = c.mu * c.ln
            lt1_new = np.clip(c.lt1 - (v @ c.t1) / c.kt1, -max_f, max_f)
            lt2_new = np.clip(c.lt2 - (v @ c.t2) / c.kt2, -max_f, max_f)
            dlt1, dlt2 = lt1_new - c.lt1, lt2_new - c.lt2
            c.lt1, c.lt2 = lt1_new, lt2_new
            _apply(bodies, c, dln, dlt1, dlt2)

    for b in bodies:
        if b.inv_mass > 0:
            b.pos = b.pos + b.linvel * dt
            w = b.angvel
            dq = np.array([w[0], w[1], w[2], 0.0]) * (0.5 * dt)
            b.quat = b.quat + quat_mul(dq, b.quat)
            b.quat /= np.linalg.norm(b.quat)

    # Split-impulse position correction (translation, like the TPU engine).
    for _ in range(POS_ITERS):
        for c in contacts:
            ba = bodies[c.a]
            bb = bodies[c.b] if c.b >= 0 else None
            p_a = ba.pos + c.r_a
            pen_res = c.pen - ((ba.pos + c.r_a - c.point) @ c.normal
                               - ((bb.pos + c.r_b - c.point) @ c.normal
                                  if bb is not None else 0.0))
            push = max(pen_res - SLOP, 0.0) * 0.25
            w_sum = ba.inv_mass + (bb.inv_mass if bb is not None else 0.0)
            if w_sum <= 0:
                continue
            corr = c.normal * push / w_sum
            ba.pos = ba.pos + corr * ba.inv_mass
            if bb is not None:
                bb.pos = bb.pos - corr * bb.inv_mass

    return {c.key: (c.ln, c.lt1, c.lt2) for c in contacts}


def _rel_vel(bodies, c):
    ba = bodies[c.a]
    v = ba.linvel + np.cross(ba.angvel, c.r_a)
    if c.b >= 0:
        bb = bodies[c.b]
        v = v - bb.linvel - np.cross(bb.angvel, c.r_b)
    return v


def _apply(bodies, c, dln, dlt1, dlt2):
    imp = dln * c.normal + dlt1 * c.t1 + dlt2 * c.t2
    ba = bodies[c.a]
    ba.linvel = ba.linvel + imp * ba.inv_mass
    ba.angvel = ba.angvel + c.iw_a @ np.cross(c.r_a, imp)
    if c.b >= 0:
        bb = bodies[c.b]
        bb.linvel = bb.linvel - imp * bb.inv_mass
        bb.angvel = bb.angvel - c.iw_b @ np.cross(c.r_b, imp)


def run(bodies, n_steps, dt=1 / 60, ground_z=0.0):
    """Simulate and return trajectories: (pos [T,N,3], quat [T,N,4])."""
    pos = np.zeros((n_steps, len(bodies), 3))
    qu = np.zeros((n_steps, len(bodies), 4))
    warm = {}
    for t in range(n_steps):
        warm = step(bodies, dt, ground_z, warm)
        for i, b in enumerate(bodies):
            pos[t, i] = b.pos
            qu[t, i] = b.quat
    return pos, qu
