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
    ax = jnp.argmax(tmin_ax)
    n_local = jnp.zeros(3).at[ax].set(-jnp.sign(dl[ax]) + (dl[ax] == 0))
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
    ConvexHullShape, PhysicsWorld.cpp:1668-1716).  Returns (t, normal)."""
    from substrata_tpu.maths import quat as quatm

    hid = jnp.clip(hid.astype(jnp.int32), 0, hull_planes.shape[0] - 1)
    pl = hull_planes[hid]                                  # [F, 4] local
    fmask = jnp.arange(pl.shape[0]) < hull_n_faces[hid]
    n_w = quatm.rotate_vec(q[None, :], pl[:, :3])          # [F, 3]
    d_w = pl[:, 3] + n_w @ pos
    denom = n_w @ d                                        # [F]
    dist = d_w - n_w @ o                                   # slack at t=0
    eps = 1e-9
    t_pl = dist / jnp.where(jnp.abs(denom) > eps, denom, eps)
    entering = fmask & (denom < -eps)
    exiting = fmask & (denom > eps)
    parallel_out = fmask & (jnp.abs(denom) <= eps) & (dist < 0.0)
    t_enter = jnp.max(jnp.where(entering, t_pl, 0.0))
    t_exit = jnp.min(jnp.where(exiting, t_pl, BIG))
    ok = ((t_enter <= t_exit) & ~jnp.any(parallel_out)
          & (hull_n_faces[hid] > 0) & (t_enter > 0.0))
    # Normal = the entering face that set t_enter.
    score = jnp.where(entering, t_pl, -BIG)
    n = n_w[jnp.argmax(score)]
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
    """Fixed-step march + bisection refine."""
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


def _ray_bodies_single(o, d, max_t, body: BodyState, table, config: SimConfig,
                       n_steps: int, exclude: jnp.ndarray,
                       collidable_only: bool, hulls=None):
    """March the broadphase hash grid, test candidate bodies analytically."""
    num_buckets = config.grid_dim * config.grid_dim
    cap = config.cell_capacity
    ts = jnp.linspace(0.0, 1.0, n_steps) * max_t
    ps = o[None, :] + d[None, :] * ts[:, None]
    cells = jnp.floor(ps / config.cell_size).astype(jnp.int32)
    # Gather the 9 xy-neighbour cells at each step's z (covers diagonal
    # traversal); oversize bodies are appended separately.
    cand_list = []
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            nb = cells + jnp.array([ox, oy, 0], jnp.int32)
            hb = broadphase._hash_cells(nb, num_buckets)
            cand_list.append(table[hb])  # [n_steps, cap]
    cand = jnp.concatenate(cand_list, axis=1).reshape(-1)
    oversize = body.alive & (2.0 * body.bound_radius > config.cell_size)
    (os_idx,) = jnp.nonzero(oversize, size=broadphase.MAX_OVERSIZE, fill_value=-1)
    cand = jnp.concatenate([cand, os_idx])
    okc = (cand >= 0) & (cand != exclude)
    ci = jnp.maximum(cand, 0)
    okc &= body.alive[ci]
    if collidable_only:
        okc &= body.collidable[ci]

    st = body.shape_type[ci]
    prm = body.shape_params[ci]
    pos = body.pos[ci]
    q = body.quat[ci]

    def test_one(okc_i, st_i, prm_i, pos_i, q_i):
        t_s, n_s = _ray_sphere(o, d, pos_i, prm_i[0])
        t_b, n_b = _ray_box(o, d, pos_i, q_i, prm_i[:3])
        t_c, n_c = _ray_capsule(o, d, pos_i, q_i, prm_i[0], prm_i[1])
        if hulls is not None:
            t_h, n_h = _ray_hull(o, d, pos_i, q_i, prm_i[0],
                                 hulls.planes, hulls.n_faces)
        else:  # no hull library: fall back to the principal OBB
            t_h, n_h = _ray_box(o, d, pos_i, q_i, prm_i[1:4])
        t = jnp.where(st_i == int(ShapeType.SPHERE), t_s,
             jnp.where(st_i == int(ShapeType.BOX), t_b,
              jnp.where(st_i == int(ShapeType.CAPSULE), t_c, t_h)))
        n = jnp.where(st_i == int(ShapeType.SPHERE), n_s,
             jnp.where(st_i == int(ShapeType.BOX), n_b,
              jnp.where(st_i == int(ShapeType.CAPSULE), n_c, n_h)))
        return jnp.where(okc_i, t, BIG), n

    t_all, n_all = jax.vmap(test_one)(okc, st, prm, pos, q)
    best = jnp.argmin(t_all)
    return t_all[best], n_all[best], jnp.where(t_all[best] < BIG, cand[best], -1)


@partial(jax.jit, static_argnames=("config", "n_steps", "collidable_only"))
def trace_rays(origins, dirs, max_ts, body: BodyState, world: StaticWorld,
               config: SimConfig, n_steps: int = 16,
               exclude=None, collidable_only: bool = True,
               table=None) -> RayHits:
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

    tb, nb, bi = jax.vmap(
        lambda o, d, mt, ex: _ray_bodies_single(
            o, d, mt, body, table, config, n_steps, ex, collidable_only,
            world.hulls)
    )(origins, dirs, max_ts, exclude)

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
