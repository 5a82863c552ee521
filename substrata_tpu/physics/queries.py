"""Batched ray queries against dynamic bodies + static world.

API parity with the reference's PhysicsWorld queries:
- traceRay with per-hit normal, body and material index
  (gui_client/PhysicsWorld.cpp:1668-1716)
- doesRayHitAnything (PhysicsWorld.cpp:1719-1725)
- traceRayAgainstCollidableObs (collidable-layer filtering)

Everything is batched over a leading ray axis: particles trace 10k short rays
per tick (gui_client/ParticleManager.cpp:161-191), audio occlusion traces one
ray per source (GUIClient.cpp:6970-7032), vehicles trace wheel-suspension
rays.  Rays march the same uniform spatial-hash grid the broadphase builds;
candidates are tested analytically (sphere/box/capsule) or via
Moller-Trumbore (trimesh) / bisection (heightfield).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from substrata_tpu.maths import quat as quatm
from substrata_tpu.physics import broadphase
from substrata_tpu.physics.state import BodyState, ShapeType, SimConfig, StaticWorld

BIG = 1e9


@flax.struct.dataclass
class RayHits:
    t: jnp.ndarray        # [R] hit distance (or +inf-ish BIG)
    normal: jnp.ndarray   # [R, 3]
    body: jnp.ndarray     # [R] i32 body slot, -1 = static geometry
    material: jnp.ndarray  # [R] i32 material index (trimesh), else 0
    hit: jnp.ndarray      # [R] bool


# --- Analytic primitive intersections (scalar; vmapped). ---

def _ray_sphere(o, d, c, r):
    oc = o - c
    b = jnp.dot(oc, d)
    cc = jnp.dot(oc, oc) - r * r
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    t = jnp.where(t < 0.0, -b + sq, t)
    ok = (disc >= 0.0) & (t >= 0.0)
    n = (o + d * t - c) / jnp.maximum(r, 1e-9)
    return jnp.where(ok, t, BIG), n


def _ray_box(o, d, pb, qb, he):
    ol = quatm.inverse_rotate_vec(qb, o - pb)
    dl = quatm.inverse_rotate_vec(qb, d)
    inv = 1.0 / jnp.where(jnp.abs(dl) > 1e-9, dl, jnp.sign(dl) * 1e-9 + (dl == 0) * 1e-9)
    t1 = (-he - ol) * inv
    t2 = (he - ol) * inv
    tmin_ax = jnp.minimum(t1, t2)
    tmax_ax = jnp.maximum(t1, t2)
    tmin = jnp.max(tmin_ax)
    tmax = jnp.min(tmax_ax)
    ok = (tmax >= tmin) & (tmax >= 0.0)
    t = jnp.where(tmin >= 0.0, tmin, tmax)
    # one_hot arithmetic, not dynamic [ax] indexing (slow under vmap).
    oh = (jnp.arange(3) == jnp.argmax(tmin_ax)).astype(dl.dtype)
    dax = jnp.sum(dl * oh)
    n_local = oh * (-jnp.sign(dax) + (dax == 0))
    n = quatm.rotate_vec(qb, n_local)
    return jnp.where(ok, t, BIG), n


def _ray_capsule(o, d, pc, qc, r, hh):
    # Capsule = swept sphere: minimise distance from ray to segment; use
    # closest-approach parametrisation (analytic infinite-cylinder + caps
    # is branchy; we use a robust 2-param closest-point iteration).
    z = quatm.rotate_vec(qc, jnp.array([0.0, 0.0, 1.0])) * hh

    # Solve ray vs infinite cylinder about segment axis.
    w = o - pc
    a_ax = z / jnp.maximum(jnp.linalg.norm(z), 1e-9)
    d_perp = d - jnp.dot(d, a_ax) * a_ax
    w_perp = w - jnp.dot(w, a_ax) * a_ax
    a = jnp.dot(d_perp, d_perp)
    b = jnp.dot(d_perp, w_perp)
    c = jnp.dot(w_perp, w_perp) - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = (-b - sq) / jnp.where(a > 1e-9, a, 1e-9)
    ok_cyl = (disc >= 0.0) & (a > 1e-9) & (t_cyl >= 0.0)
    # Check the hit lies within the cylinder span.
    hitp = o + d * t_cyl
    s = jnp.dot(hitp - pc, a_ax)
    span = jnp.linalg.norm(z)
    ok_cyl &= jnp.abs(s) <= span
    n_cyl = (hitp - (pc + a_ax * s))
    n_cyl = n_cyl / jnp.maximum(jnp.linalg.norm(n_cyl), 1e-9)

    # Cap spheres.
    t_a, n_a = _ray_sphere(o, d, pc + z, r)
    t_b, n_b = _ray_sphere(o, d, pc - z, r)

    t = jnp.where(ok_cyl, t_cyl, BIG)
    n = jnp.where(ok_cyl, n_cyl, jnp.array([0.0, 0.0, 1.0]))
    better_a = t_a < t
    t = jnp.where(better_a, t_a, t)
    n = jnp.where(better_a, n_a, n)
    better_b = t_b < t
    t = jnp.where(better_b, t_b, t)
    n = jnp.where(better_b, n_b, n)
    return t, n


def _ray_hull(o, d, pos, q, hid, hull_planes, hull_n_faces):
    """Ray vs convex hull by half-space clipping of the hull's face planes
    (replaces the round-1 OBB proxy; reference rays hit the true Jolt
    ConvexHullShape, PhysicsWorld.cpp:1668-1716).  Returns (t, normal).

    The RAY is transformed into hull-local space (two rotate_vec of one
    vector each) instead of rotating every plane normal to world — the
    per-plane work is then two dot products.  The world-plane version's
    rotate_vec over [rays, candidates, 32 planes, 3] was ~60 ms of the 10k
    particle tick (jnp.cross lowers to slices/concats that tile badly)."""
    from substrata_tpu.maths import quat as quatm

    hid = jnp.clip(hid.astype(jnp.int32), 0, hull_planes.shape[0] - 1)
    pl = hull_planes[hid]                                  # [F, 4] local
    return _ray_hull_planes(o, d, pos, q, pl, hull_n_faces[hid])


def _ray_hull_planes(o, d, pos, q, pl, nf):
    """_ray_hull with the plane block [F, 4] already gathered (batched
    callers hoist the gather into one flat row gather of a 2-D bank)."""
    from substrata_tpu.maths import quat as quatm

    fmask = jnp.arange(pl.shape[0]) < nf
    ol = quatm.inverse_rotate_vec(q, o - pos)              # ray, hull-local
    dl = quatm.inverse_rotate_vec(q, d)
    denom = pl[:, :3] @ dl                                 # [F]
    dist = pl[:, 3] - pl[:, :3] @ ol                       # slack at t=0
    eps = 1e-9
    t_pl = dist / jnp.where(jnp.abs(denom) > eps, denom, eps)
    entering = fmask & (denom < -eps)
    exiting = fmask & (denom > eps)
    parallel_out = fmask & (jnp.abs(denom) <= eps) & (dist < 0.0)
    t_enter = jnp.max(jnp.where(entering, t_pl, 0.0))
    t_exit = jnp.min(jnp.where(exiting, t_pl, BIG))
    ok = ((t_enter <= t_exit) & ~jnp.any(parallel_out)
          & (nf > 0) & (t_enter > 0.0))
    # Normal = the entering face that set t_enter, rotated back to world.
    # one_hot selection, not pl[argmax] (dynamic gather is slow under vmap).
    score = jnp.where(entering, t_pl, -BIG)
    oh = (jnp.arange(pl.shape[0]) == jnp.argmax(score)).astype(pl.dtype)
    n = quatm.rotate_vec(q, oh @ pl[:, :3])
    return jnp.where(ok, t_enter, BIG), n


def _ray_triangle(o, d, v0, v1, v2):
    """Moller-Trumbore; returns (t, n) with t=BIG on miss."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(d, e2)
    det = jnp.dot(e1, p)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    s = o - v0
    u = jnp.dot(s, p) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.dot(d, q) * inv_det
    t = jnp.dot(e2, q) * inv_det
    ok = (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0)
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
    n = jnp.where(jnp.dot(n, d) > 0, -n, n)
    return jnp.where(ok, t, BIG), n


def _ray_heightfield_single(o, d, max_t, hf, n_steps: int):
    """Fixed-step march + bisection refine; flat heightfields (ground-plane
    worlds — compile-time Heightfield.is_flat) take the analytic plane hit
    instead (the march + 10-iteration bisection was ~0.5 ms/tick of
    sequential small gathers at 2048 particle rays)."""
    if hf.is_flat:
        z0 = hf.heights[0, 0]
        dz = jnp.where(jnp.abs(d[2]) > 1e-9, d[2], 1e-9)
        t = (z0 - o[2]) / dz
        start_below = o[2] < z0
        ok = start_below | ((t >= 0.0) & (t <= max_t) & (d[2] < 0.0))
        t = jnp.where(start_below, 0.0, t)
        return (jnp.where(ok, t, BIG),
                jnp.array([0.0, 0.0, 1.0], jnp.float32))

    def above(t):
        p = o + d * t
        return p[2] - hf.sample(p[:2])

    ts = jnp.linspace(0.0, 1.0, n_steps) * max_t
    vals = jax.vmap(above)(ts)
    below = vals < 0.0
    first = jnp.argmax(below)
    any_below = jnp.any(below)
    lo = ts[jnp.maximum(first - 1, 0)]
    hi = ts[first]

    def refine(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        is_above = above(mid) > 0
        return jnp.where(is_above, mid, lo), jnp.where(is_above, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 10, refine, (lo, hi))
    t = 0.5 * (lo + hi)
    p = o + d * t
    n = hf.normal(p[:2])
    # A ray that starts below the surface hits at t=0.
    start_below = vals[0] < 0.0
    t = jnp.where(start_below, 0.0, t)
    return jnp.where(any_below, t, BIG), n


def _ray_trimesh_single(o, d, max_t, tm, n_steps: int, tri_cap: int):
    """Sample cells along the ray, gather candidate triangles, min-t."""
    gx, gy, cap = tm.cell_tris.shape
    k = min(cap, tri_cap)
    ts = jnp.linspace(0.0, 1.0, n_steps) * max_t
    ps = o[None, :] + d[None, :] * ts[:, None]
    ci = jnp.clip(((ps[:, 0] - tm.origin[0]) / tm.cell_w).astype(jnp.int32), 0, gx - 1)
    cj = jnp.clip(((ps[:, 1] - tm.origin[1]) / tm.cell_w).astype(jnp.int32), 0, gy - 1)
    cand = tm.cell_tris[ci, cj][:, :k].reshape(-1)  # [n_steps*k]
    ok = cand >= 0
    tri = tm.tris[jnp.maximum(cand, 0)]
    t, n = jax.vmap(_ray_triangle, in_axes=(None, None, 0, 0, 0))(
        o, d, tm.verts[tri[:, 0]], tm.verts[tri[:, 1]], tm.verts[tri[:, 2]])
    t = jnp.where(ok, t, BIG)
    best = jnp.argmin(t)
    mat = tm.tri_mats[jnp.maximum(cand[best], 0)]
    owner = tm.tri_owner[jnp.maximum(cand[best], 0)]
    return t[best], n[best], mat, owner


def _ray_bodies(origins, dirs, max_ts, body: BodyState, table,
                config: SimConfig, n_steps: int, exclude: jnp.ndarray,
                collidable_only: bool, hulls=None, k_cand: int = 16,
                dedup: bool = True):
    """March the broadphase hash grid, test candidate bodies analytically.

    Two stages (the one-stage version gathered every candidate's full hull
    plane set: at 10k particle rays x 280 grid candidates x 32 planes that
    is a 46 GB intermediate — OOM on a 16 GB chip, and ~3G plane tests of
    wasted VPU work besides):

    1. Bounding-sphere test ALL grid candidates (cheap: ~15 flops each),
       mask duplicates (short rays read the same cell at every march step,
       so each nearby body appears up to 9*n_steps times), keep the K
       nearest by sphere entry distance via top_k.
    2. Full analytic shape tests (sphere/box/capsule/hull-plane clip) on
       the K survivors only.

    Exact for the first hit as long as fewer than K distinct bodies'
    bounding spheres straddle the ray segment ahead of the true hit — K=16
    against a broadphase that holds ~6 bodies per 1.4 m cell.
    """
    r = origins.shape[0]
    num_buckets = config.grid_dim * config.grid_dim
    cap = config.cell_capacity
    if n_steps == 1:
        # Short-ray fast path (max_t <= cell_size, e.g. 10k particle motion
        # rays): ONE sample at the ray midpoint — its 9-neighbourhood
        # covers the whole segment, each nearby body appears exactly once
        # (no duplicate masking needed; pass dedup=False to skip the sort).
        ts = 0.5 * max_ts[:, None]                                   # [R,1]
    else:
        ts = jnp.linspace(0.0, 1.0, n_steps)[None, :] * max_ts[:, None]
    ps = origins[:, None, :] + dirs[:, None, :] * ts[..., None]      # [R,S,3]
    cells = jnp.floor(ps / config.cell_size).astype(jnp.int32)
    # Gather the 9 xy-neighbour cells at each step's z (covers diagonal
    # traversal); oversize bodies are appended separately.  Table rows are
    # gathered with a FLAT index (rows of a 2-D operand — the fast layout).
    cand_list = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            nb = cells + jnp.array([ox, oy, 0], jnp.int32)
            hb = broadphase._hash_cells(nb, num_buckets)             # [R,S]
            cand_list.append(table[hb.reshape(-1)].reshape(r, n_steps * cap))
    oversize = body.alive & (2.0 * body.bound_radius > config.cell_size)
    (os_idx,) = jnp.nonzero(oversize, size=broadphase.MAX_OVERSIZE,
                            fill_value=-1)
    cand = jnp.concatenate(
        cand_list + [jnp.broadcast_to(os_idx[None, :],
                                      (r, broadphase.MAX_OVERSIZE))], axis=1)
    n_cand = cand.shape[1]
    k = min(k_cand, n_cand)

    # ---- Stage 1: bounding-sphere entry distance for every candidate ----
    ok_body = body.alive
    if collidable_only:
        ok_body = ok_body & body.collidable
    pack1 = jnp.concatenate([body.pos, body.bound_radius[:, None],
                             ok_body.astype(jnp.float32)[:, None]], axis=1)
    g1 = pack1[jnp.maximum(cand, 0).reshape(-1)].reshape(r, n_cand, 5)
    cpos, crad, cok = g1[..., 0:3], g1[..., 3], g1[..., 4] > 0.5
    okc = (cand >= 0) & (cand != exclude[:, None]) & cok
    oc = origins[:, None, :] - cpos
    b = jnp.sum(oc * dirs[:, None, :], -1)
    cc = jnp.sum(oc * oc, -1) - crad * crad
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_in = jnp.maximum(-b - sq, 0.0)
    reach = (disc >= 0.0) & (-b + sq >= 0.0) & (t_in <= max_ts[:, None])
    key = jnp.where(okc & reach, t_in, BIG)

    if dedup:
        # Sort by slot id (stable), mask repeats (same body -> same key).
        # Needed when the march reads the same cell at several steps; the
        # sort costs real time at 10k rays, so short-ray callers use the
        # n_steps=1 path and skip it.
        slot_s, key_s = jax.lax.sort((cand, key), dimension=1, num_keys=1)
    else:
        slot_s, key_s = cand, key
    if dedup:
        dup = jnp.concatenate([jnp.zeros((r, 1), bool),
                               slot_s[:, 1:] == slot_s[:, :-1]], axis=1)
        key_s = jnp.where(dup, BIG, key_s)
    negk, ti = jax.lax.top_k(-key_s, k)                              # [R,K]
    slotk = jnp.take_along_axis(slot_s, ti, axis=1)
    okk = negk > -BIG

    # ---- Stage 2: full shape tests on the K survivors ----
    pack2 = jnp.concatenate([body.pos, body.quat, body.shape_params,
                             body.shape_type.astype(jnp.float32)[:, None]],
                            axis=1)
    g2 = pack2[jnp.maximum(slotk, 0).reshape(-1)].reshape(r, k, 12)
    kpos, kq = g2[..., 0:3], g2[..., 3:7]
    kprm = g2[..., 7:11]
    kst = g2[..., 11].astype(jnp.int32)

    if hulls is not None:
        # Hoisted hull-plane gather: one flat row gather of the 2-D
        # [H, F*4] bank (the in-vmap hulls.planes[hid] point gather of a
        # 3-D operand cost 11.6 ms at 10k rays), n_faces packed as an
        # extra column so one gather serves both.
        h_cap, f_cap = hulls.planes.shape[0], hulls.planes.shape[1]
        bank = jnp.concatenate(
            [hulls.planes.reshape(h_cap, f_cap * 4),
             hulls.n_faces.astype(jnp.float32)[:, None]], axis=1)
        hid = jnp.clip(kprm[..., 0].astype(jnp.int32), 0, h_cap - 1)
        hrows = bank[hid.reshape(-1)].reshape(r, k, f_cap * 4 + 1)
        kpl = hrows[..., :f_cap * 4].reshape(r, k, f_cap, 4)
        knf = hrows[..., f_cap * 4]
    else:
        kpl = knf = None

    def test_one(o, d, okc_i, st_i, prm_i, pos_i, q_i, pl_i, nf_i):
        t_s, n_s = _ray_sphere(o, d, pos_i, prm_i[0])
        t_b, n_b = _ray_box(o, d, pos_i, q_i, prm_i[:3])
        t_c, n_c = _ray_capsule(o, d, pos_i, q_i, prm_i[0], prm_i[1])
        if pl_i is not None:
            t_h, n_h = _ray_hull_planes(o, d, pos_i, q_i, pl_i, nf_i)
        else:  # no hull library: fall back to the principal OBB
            t_h, n_h = _ray_box(o, d, pos_i, q_i, prm_i[1:4])
        t = jnp.where(st_i == int(ShapeType.SPHERE), t_s,
             jnp.where(st_i == int(ShapeType.BOX), t_b,
              jnp.where(st_i == int(ShapeType.CAPSULE), t_c, t_h)))
        n = jnp.where(st_i == int(ShapeType.SPHERE), n_s,
             jnp.where(st_i == int(ShapeType.BOX), n_b,
              jnp.where(st_i == int(ShapeType.CAPSULE), n_c, n_h)))
        return jnp.where(okc_i, t, BIG), n

    if kpl is not None:
        t_all, n_all = jax.vmap(
            lambda o, d, ok_r, st_r, prm_r, pos_r, q_r, pl_r, nf_r: jax.vmap(
                partial(test_one, o, d))(ok_r, st_r, prm_r, pos_r, q_r,
                                         pl_r, nf_r)
        )(origins, dirs, okk, kst, kprm, kpos, kq, kpl, knf)
    else:
        t_all, n_all = jax.vmap(
            lambda o, d, ok_r, st_r, prm_r, pos_r, q_r: jax.vmap(
                lambda ok_i, st_i, prm_i, pos_i, q_i: test_one(
                    o, d, ok_i, st_i, prm_i, pos_i, q_i, None, None)
            )(ok_r, st_r, prm_r, pos_r, q_r)
        )(origins, dirs, okk, kst, kprm, kpos, kq)

    best = jnp.argmin(t_all, axis=1)                                 # [R]
    flat = jnp.arange(r) * k + best       # multi-axis [i, best_i] flattened
    t_best = t_all.reshape(-1)[flat]
    n_best = n_all.reshape(-1, 3)[flat]
    slot_best = slotk.reshape(-1)[flat]
    return t_best, n_best, jnp.where(t_best < BIG, slot_best, -1)


@partial(jax.jit, static_argnames=("config", "n_steps", "collidable_only",
                                   "k_cand", "dedup", "body_steps"))
def trace_rays(origins, dirs, max_ts, body: BodyState, world: StaticWorld,
               config: SimConfig, n_steps: int = 16,
               exclude=None, collidable_only: bool = True,
               table=None, k_cand: int = 16, dedup: bool = True,
               body_steps: int | None = None) -> RayHits:
    """Batched traceRay: first hit among dynamic bodies, heightfield, trimesh.

    origins/dirs: [R, 3] (dirs unit), max_ts: [R]; exclude: [R] body slot to
    skip (e.g. the vehicle's own chassis for wheel rays), -1 = none.
    ``table``: optional precomputed broadphase cell table — the full client
    tick issues several independent ray batches (character probe, vehicle
    wheels, particles) against the same body state, so callers can build the
    table once per tick instead of once per batch.
    """
    r = origins.shape[0]
    if exclude is None:
        exclude = jnp.full((r,), -1, jnp.int32)
    if table is None:
        table, _, _ = broadphase.build_cell_table(body, config)

    tb, nb, bi = _ray_bodies(origins, dirs, max_ts, body, table, config,
                             body_steps or n_steps, exclude, collidable_only,
                             world.hulls, k_cand=k_cand, dedup=dedup)

    th, nh = jax.vmap(
        lambda o, d, mt: _ray_heightfield_single(o, d, mt, world.heightfield, n_steps)
    )(origins, dirs, max_ts)
    th = jnp.where(world.has_heightfield, th, BIG)

    tm, nm, mat, owner = jax.vmap(
        lambda o, d, mt: _ray_trimesh_single(o, d, mt, world.trimesh, n_steps, 8)
    )(origins, dirs, max_ts)

    t = jnp.minimum(jnp.minimum(tb, th), tm)
    n = jnp.where((tb <= th)[:, None] & (tb <= tm)[:, None], nb,
                  jnp.where((th <= tm)[:, None], nh, nm))
    # A winning trimesh hit reports the triangle's OWNER slot as the hit
    # body, so static mesh objects resolve to their WorldObject exactly like
    # dynamic bodies (reference: every static mesh is its own Jolt body).
    trimesh_wins = (tm < th) & (tm < tb)
    bodyi = jnp.where((tb <= th) & (tb <= tm), bi,
                      jnp.where(trimesh_wins, owner, -1))
    material = jnp.where(trimesh_wins, mat, 0)
    hit = t <= max_ts
    return RayHits(t=jnp.where(hit, t, BIG), normal=n, body=bodyi,
                   material=material, hit=hit)


@partial(jax.jit, static_argnames=("config", "n_steps"))
def any_hits(origins, dirs, max_ts, body: BodyState, world: StaticWorld,
             config: SimConfig, n_steps: int = 16):
    """doesRayHitAnything parity (PhysicsWorld.cpp:1719-1725) — used by the
    per-source audio occlusion pass (GUIClient.cpp:6970-7032)."""
    hits = trace_rays(origins, dirs, max_ts, body, world, config, n_steps=n_steps)
    return hits.hit
