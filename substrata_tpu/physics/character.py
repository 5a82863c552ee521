"""Kinematic capsule character controller.

Behavioural port of the reference PlayerPhysics (gui_client/PlayerPhysics.{h,cpp})
on top of our batched contact probes instead of Jolt's CharacterVirtual:

- capsule r=0.3, cylinder height 1.3, eye height 1.67 (PlayerPhysics.cpp:30-33)
- move speed 3, run factor 5, jump speed 4.5, max air accel 8, jump grace
  0.1 s (PlayerPhysics.cpp:24-28)
- on ground: instant velocity set to desired + ground velocity (platform
  riding); in air: acceleration capped at max_air_speed (update, 251-290)
- gravity always applied when enabled; water buoyancy 1.1 g x fraction
  submerged with drag vel *= (1 - min(0.2, 2 f dt)); fall speed cap
  100 m/s (291-302)
- fly mode: accel = 3*move_desired + 2*(desired_vel - vel) (305-315)
- jump uses ground normal (removeComponentInDir) + ground velocity (325-340)
- collide-and-slide with anti-slide on shallow static ground
  (OnContactSolve override, 536-545)
- stick-to-floor step-down 0.5 and stair-walk step-up 0.4 (347-350)
- camera z-delta smoothing, decay 20/s (316-318, 450-451)

The character also owns a kinematic capsule proxy body in the PhysicsWorld so
dynamic bodies are pushed by the solver (Jolt uses CharacterVirtual's
mMaxStrength=1000 push instead).
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from substrata_tpu.maths import quat as quatm
from substrata_tpu.physics import broadphase, narrowphase
from substrata_tpu.physics.state import BodyState, ShapeType, SimConfig, SimParams, StaticWorld

# PlayerPhysics.cpp:24-33
RUN_FACTOR = 5.0
MOVE_SPEED = 3.0
JUMP_SPEED = 4.5
MAX_AIR_SPEED = 8.0
JUMP_PERIOD = 0.1
SPHERE_RAD = 0.3
CYLINDER_HEIGHT = 1.3
SITTING_HEIGHT = 0.3
EYE_HEIGHT = 1.67
STICK_TO_FLOOR_STEP = 0.5
STAIR_STEP_UP = 0.4
MAX_SLOPE_COS = 0.6428  # cos(50 deg), Jolt CharacterVirtual default


@flax.struct.dataclass
class CharacterState:
    pos: jnp.ndarray             # [3] foot position (capsule bottom)
    vel: jnp.ndarray             # [3]
    on_ground: jnp.ndarray       # [] bool
    ground_normal: jnp.ndarray   # [3]
    ground_vel: jnp.ndarray      # [3]
    campos_z_delta: jnp.ndarray  # [] f32
    gravity_enabled: jnp.ndarray  # [] bool
    fly_mode: jnp.ndarray        # [] bool
    sitting: jnp.ndarray         # [] bool


def init_character_state(eye_pos) -> CharacterState:
    """initial_player_pos is at eye level (PlayerPhysics::init)."""
    foot = jnp.asarray(eye_pos, jnp.float32) - jnp.array([0, 0, EYE_HEIGHT], jnp.float32)
    return CharacterState(
        pos=foot,
        vel=jnp.zeros(3, jnp.float32),
        on_ground=jnp.array(False),
        ground_normal=jnp.array([0.0, 0.0, 1.0], jnp.float32),
        ground_vel=jnp.zeros(3, jnp.float32),
        campos_z_delta=jnp.float32(0.0),
        gravity_enabled=jnp.array(False),  # off until player moves (spawn safety)
        fly_mode=jnp.array(False),
        sitting=jnp.array(False),
    )


MAX_PROBE_CONTACTS = 40


@flax.struct.dataclass
class _CapsuleCandidates:
    """Compact per-update candidate set for the character's capsule probes.

    character_update runs ~15 probes per substep (slide iterations, stair
    step-up/down scans, stick-to-floor scans, final ground state) at foot
    positions within ~0.5 m of each other.  Gathering the hash-grid
    neighbourhood + per-body fields ONCE here and letting every probe run
    pure vector math over the compact rows removes 14 redundant rounds of
    table gathers, full-capacity nonzero scans, and per-field body gathers
    from the jitted program (measured 4.4 ms -> ~1.5 ms per update on TPU)."""
    idx: jnp.ndarray        # [K] body slot (-1 padding)
    ok: jnp.ndarray         # [K] alive & collidable & not excluded/sensor
    pos: jnp.ndarray        # [K,3]
    quat: jnp.ndarray       # [K,4]
    shape_type: jnp.ndarray  # [K]
    shape_params: jnp.ndarray  # [K,4]
    bound_radius: jnp.ndarray  # [K]
    linvel: jnp.ndarray     # [K,3]
    angvel: jnp.ndarray     # [K,3]


def _gather_capsule_candidates(foot_a, foot_b, cyl_h, body: BodyState, table,
                               config: SimConfig, exclude):
    """Union of the 27-cell neighbourhoods around the capsule centers at
    two foot positions (pre- and post-integration; every probe position of
    the substep lies within a cell of one of them), plus oversize bodies."""
    half_h = 0.5 * cyl_h
    num_buckets = config.grid_dim * config.grid_dim
    centers = [foot_a, foot_b]
    # Stick-to-floor scans probe down to foot-0.5 m: a maximal non-oversize
    # body (diameter == cell_size) under that extreme is guaranteed gathered
    # only when cell_size >= 2*(capsule half reach + 0.5).  Smaller cells add
    # the stick-down extreme as a third gather center (compile-time gate —
    # the serving configs run cell_size 4.0 and pay nothing).
    if config.cell_size < 2.0 * (SPHERE_RAD + 0.5 * CYLINDER_HEIGHT + 0.5):
        centers.append(foot_b - jnp.array([0.0, 0.0, 0.5], jnp.float32))
    cands = []
    for foot in centers:
        center = foot + jnp.array([0.0, 0.0, SPHERE_RAD]) \
            + jnp.array([0.0, 0.0, 1.0]) * half_h
        cell = jnp.floor(center / config.cell_size).astype(jnp.int32)
        for off in broadphase._NEIGHBOR_OFFSETS:
            hb = broadphase._hash_cells(cell + jnp.array(off, jnp.int32),
                                        num_buckets)
            cands.append(table[hb])
    cand = jnp.concatenate(cands)
    oversize = body.alive & (2.0 * body.bound_radius > config.cell_size)
    (os_idx,) = jnp.nonzero(oversize, size=broadphase.MAX_OVERSIZE,
                            fill_value=-1)
    cand = jnp.concatenate([cand, os_idx])
    ci = jnp.maximum(cand, 0)
    okc = (cand >= 0) & (cand != exclude) & body.alive[ci] \
        & body.collidable[ci] & ~body.is_sensor[ci]
    return _CapsuleCandidates(
        idx=cand, ok=okc, pos=body.pos[ci], quat=body.quat[ci],
        shape_type=body.shape_type[ci], shape_params=body.shape_params[ci],
        bound_radius=body.bound_radius[ci], linvel=body.linvel[ci],
        angvel=body.angvel[ci])


def _capsule_probe(foot, cyl_h, cands: _CapsuleCandidates,
                   world: StaticWorld, config: SimConfig):
    """All contacts of the character capsule at foot position.

    Returns (normal [K,3] pointing away from the obstacle, pen [K],
    point [K,3], body_id [K], contact_vel [K,3], valid [K]).
    """
    center = foot + jnp.array([0.0, 0.0, SPHERE_RAD + 0.5 * cyl_h])
    half_h = 0.5 * cyl_h
    up_q = quatm.identity()

    # Cheap sphere reject against the precomputed candidate rows.
    d = cands.pos - center
    reach = cands.bound_radius + half_h + SPHERE_RAD + 0.6
    okc = cands.ok & (jnp.sum(d * d, -1) <= reach * reach)

    def contact_one(ok_i, st, prm, p_b, q_b, lv, av):
        # Capsule vs shape (reuse narrowphase scalar routines).
        cc = narrowphase._capsule_capsule(center, up_q, SPHERE_RAD, half_h,
                                          p_b, q_b, prm[0], prm[1])
        cs = narrowphase._sphere_capsule(p_b, prm[0], center, up_q, SPHERE_RAD, half_h)
        # flip: normal from sphere->capsule is b->a with a=sphere; we want away from obstacle
        cb = narrowphase._capsule_box(center, up_q, SPHERE_RAD, half_h, p_b, q_b, prm[:3])
        chb = narrowphase._capsule_box(center, up_q, SPHERE_RAD, half_h, p_b, q_b, prm[1:4])
        B, S, C = int(ShapeType.BOX), int(ShapeType.SPHERE), int(ShapeType.CAPSULE)
        pts = jnp.where(st == B, cb[0], jnp.where(st == S, cs[0],
                        jnp.where(st == C, cc[0], chb[0])))
        pens = jnp.where(st == B, cb[1], jnp.where(st == S, cs[1],
                         jnp.where(st == C, cc[1], chb[1])))
        nrm = jnp.where(st == B, cb[2], jnp.where(st == S, -cs[2],
                        jnp.where(st == C, cc[2], chb[2])))
        val = jnp.where(st == B, cb[3], jnp.where(st == S, cs[3],
                        jnp.where(st == C, cc[3], chb[3])))
        # Keep the deepest manifold point.
        k = jnp.argmax(jnp.where(val, pens, -1e9))
        pen = pens[k]
        ok = ok_i & val[k]
        pt = pts[k]
        cvel = lv + jnp.cross(av, pt - p_b)
        return nrm, pen, pt, cvel, ok

    n_b, pen_b, pt_b, vel_b, ok_b = jax.vmap(contact_one)(
        okc, cands.shape_type, cands.shape_params, cands.pos, cands.quat,
        cands.linvel, cands.angvel)

    # --- Static world: 3 sample spheres along the capsule segment. ---
    samples = jnp.stack([
        center + jnp.array([0.0, 0.0, -half_h]),
        center,
        center + jnp.array([0.0, 0.0, half_h]),
    ])
    hf = world.heightfield
    h, hfn = hf.sample_with_normal(samples[:, :2])
    hf_pen = (h - (samples[:, 2] - SPHERE_RAD)) * hfn[:, 2]
    hf_pt = jnp.concatenate([samples[:, :2], h[:, None]], axis=1)
    hf_ok = jnp.broadcast_to(world.has_heightfield, (3,)) & (hf_pen > -0.05)

    tm = world.trimesh
    gx, gy, cap = tm.cell_tris.shape
    tci = jnp.clip(((samples[:, 0] - tm.origin[0]) / tm.cell_w).astype(jnp.int32), 0, gx - 1)
    tcj = jnp.clip(((samples[:, 1] - tm.origin[1]) / tm.cell_w).astype(jnp.int32), 0, gy - 1)
    tcand = tm.cell_tris[tci, tcj]  # [3, cap]
    tok = tcand >= 0
    tri = tm.tris[jnp.maximum(tcand, 0)]
    v0, v1, v2 = tm.verts[tri[..., 0]], tm.verts[tri[..., 1]], tm.verts[tri[..., 2]]
    cp = jax.vmap(jax.vmap(narrowphase._closest_point_triangle))(
        jnp.broadcast_to(samples[:, None, :], v0.shape), v0, v1, v2)
    delta = samples[:, None, :] - cp
    dist = jnp.linalg.norm(delta, axis=-1)
    tri_n = narrowphase._safe_normalize(jnp.cross(v1 - v0, v2 - v0))
    side = jnp.sum((samples[:, None, :] - v0) * tri_n, -1)
    sdist = jnp.where(side >= 0, dist, -dist)
    tpen = jnp.where(tok, SPHERE_RAD - sdist, -1e9)
    tn = jnp.where((dist > 1e-6)[..., None] & (side >= 0)[..., None],
                   delta / jnp.maximum(dist, 1e-6)[..., None], tri_n)
    tbest = jnp.argmax(tpen, axis=1)
    r3 = jnp.arange(3)
    tm_pen = tpen[r3, tbest]
    tm_pt = cp[r3, tbest]
    tm_n = tn[r3, tbest]
    tm_ok = tm_pen > -0.05

    st_n = jnp.concatenate([hfn, tm_n])
    st_pen = jnp.concatenate([hf_pen, tm_pen])
    st_pt = jnp.concatenate([hf_pt, tm_pt])
    st_ok = jnp.concatenate([hf_ok, tm_ok])

    # Static contacts first so nothing truncates them; body candidates are a
    # fixed small list (27*cell_cap + oversize) — keep them all.
    n_all = jnp.concatenate([st_n, n_b])
    pen_all = jnp.concatenate([st_pen, pen_b])
    pt_all = jnp.concatenate([st_pt, pt_b])
    vel_all = jnp.concatenate([jnp.zeros_like(st_pt), vel_b])
    ok_all = jnp.concatenate([st_ok, ok_b])
    id_all = jnp.concatenate([jnp.full((6,), -1, jnp.int32), cands.idx])
    return n_all, pen_all, pt_all, id_all, vel_all, ok_all


def _support_info(foot, n, pen, pt, vel, ok):
    """Ground detection: contacts touching the lower sphere with acceptable
    penetration (Jolt supporting-volume plane at -SPHERE_RAD)."""
    lower = pt[:, 2] <= foot[2] + SPHERE_RAD * 1.05
    touching = ok & lower & (pen > -0.02)
    supported = jnp.any(touching)
    score = jnp.where(touching, n[:, 2], -1e9)
    gi = jnp.argmax(score)
    gn = jnp.where(supported, n[gi], jnp.array([0.0, 0.0, 1.0]))
    gv = jnp.where(supported, vel[gi], jnp.zeros(3))
    steep = gn[2] < MAX_SLOPE_COS
    return supported, gn, gv, steep


def _remove_component(v, n):
    return v - n * jnp.minimum(jnp.dot(v, n), 0.0)


@partial(jax.jit, static_argnames=("config",))
def character_update(char: CharacterState, body: BodyState, world: StaticWorld,
                     move_desired_vel, jump_requested, fly_mode, sitting, dt,
                     params: SimParams, config: SimConfig, exclude_body,
                     table=None):
    """One substep of PlayerPhysics::update (PlayerPhysics.cpp:251-469).

    Returns (new_char, campos [4], jumped bool, touched_bodies [K] i32).
    ``table``: optional precomputed broadphase cell table shared with the
    tick's other query batches (see queries.trace_rays).
    """
    dt = jnp.asarray(dt, jnp.float32)
    move_desired_vel = jnp.asarray(move_desired_vel, jnp.float32)
    if table is None:
        table, _, _ = broadphase.build_cell_table(body, config)
    cyl_h = jnp.where(sitting, SITTING_HEIGHT, CYLINDER_HEIGHT)

    allow_sliding = jnp.sum(move_desired_vel ** 2) > 0.0
    gravity_enabled = char.gravity_enabled | allow_sliding | jump_requested | fly_mode

    vel = char.vel
    foot = char.pos

    # Submersion (PlayerPhysics.cpp:180-196).
    frac_sub = jnp.clip((params.water_z - foot[2]) / EYE_HEIGHT, 0.0, 1.0)
    underwater = frac_sub > 0.3

    # One candidate-set gather serves every probe of this substep: the
    # second neighbourhood center is the post-integration foot (all later
    # probe positions — slide pushes, stair step-up 0.4 / step-down 0.5 —
    # stay within a cell of one of the two).
    foot_next = foot + (vel + move_desired_vel) * dt
    cands = _gather_capsule_candidates(foot, foot_next, cyl_h, body, table,
                                       config, exclude_body)

    # Ground probe at the current position.
    n, pen, pt, bid, cvel, ok = _capsule_probe(foot, cyl_h, cands, world,
                                               config)
    supported, gnormal, gvel, steep = _support_info(foot, n, pen, pt, cvel, ok)

    # --- Velocity update (non-fly) ---
    parallel_vel = jnp.where(frac_sub < 0.3,
                             move_desired_vel * jnp.array([1.0, 1.0, 0.0]),
                             move_desired_vel)
    on_ground_now = supported & ((vel[2] - gvel[2]) < 0.1)

    ground_vel_new = parallel_vel + gvel
    pl = jnp.linalg.norm(parallel_vel)
    air_par = jnp.where(pl > MAX_AIR_SPEED, parallel_vel * (MAX_AIR_SPEED / jnp.maximum(pl, 1e-9)),
                        parallel_vel)
    air_vel_new = vel + air_par * dt

    vel_walk = jnp.where(on_ground_now, ground_vel_new, air_vel_new)
    grav = jnp.where(gravity_enabled,
                     (-9.81 + 9.81 * 1.1 * frac_sub) * dt, 0.0)
    vel_walk = vel_walk + jnp.array([0.0, 0.0, 1.0]) * grav
    vel_walk = vel_walk * jnp.where(gravity_enabled,
                                    1.0 - jnp.minimum(0.2, 2.0 * frac_sub * dt), 1.0)
    vel_walk = vel_walk.at[2].set(jnp.maximum(vel_walk[2], -100.0))

    # --- Fly mode (PlayerPhysics.cpp:305-315) ---
    speed = jnp.linalg.norm(vel)
    mlen = jnp.linalg.norm(move_desired_vel)
    desired_fly = jnp.where(mlen < 1e-4, jnp.zeros(3), move_desired_vel / jnp.maximum(mlen, 1e-9) * speed)
    vel_fly = vel + (move_desired_vel * 3.0 + (desired_fly - vel) * 2.0) * dt

    vel = jnp.where(fly_mode, vel_fly, vel_walk)

    # --- Jump (PlayerPhysics.cpp:322-345) ---
    do_jump = jump_requested & supported
    jump_vel_walk = (_remove_component(move_desired_vel, gnormal) + gvel
                     + jnp.array([0.0, 0.0, JUMP_SPEED]))
    jump_vel_fly = vel + jnp.array([0.0, 0.0, JUMP_SPEED])
    vel = jnp.where(do_jump, jnp.where(fly_mode, jump_vel_fly, jump_vel_walk), vel)
    on_ground_now = on_ground_now & ~do_jump

    # Anti-slide (OnContactSolve): if not trying to move, on not-too-steep
    # static ground, zero the velocity.
    static_ground = supported & (jnp.sum(gvel * gvel) < 1e-8)
    anti_slide = (~allow_sliding) & static_ground & ~steep & ~do_jump & ~fly_mode
    vel = jnp.where(anti_slide, vel * jnp.array([0.0, 0.0, 1.0]) * (vel[2] > 0), vel)

    # --- Collide and slide ---
    was_supported = supported
    old_foot = foot
    # Jolt's WalkStairs compares achieved motion against desired_velocity
    # captured BEFORE the collide-and-slide (CharacterVirtual::ExtendedUpdate
    # order): the slide cancels velocity into the blocking face, so the
    # post-slide velocity is ~zero exactly when stairs are needed.
    desired_vel_pre = vel
    foot = foot + vel * dt

    def slide_iter(foot, vel):
        n, pen, pt, bid, cvel, ok = _capsule_probe(foot, cyl_h, cands,
                                                   world, config)
        deep = jnp.where(ok, pen, -1e9)
        di = jnp.argmax(deep)
        push = jnp.where(deep[di] > 0.0, n[di] * deep[di], jnp.zeros(3))
        foot = foot + push
        # Cancel velocity into touching contacts, most-violating first.
        # The old per-candidate fori_loop was K (~hundreds) SEQUENTIAL
        # scalar iterations — on TPU each one lowers to a while-body of
        # dynamic_slices and was the character update's dominant cost
        # (~1 ms/tick of dynamic_slice alone at the bench world).  Up to 4
        # active constraint planes (floor + 2 walls + step) is what the
        # slide geometry can present; cancelling the most-violating plane
        # per pass converges in <= 4 vectorised passes.
        touching = ok & (pen > -0.01)
        for _ in range(4):
            vn = n @ vel - jnp.sum(n * cvel, -1)   # relative normal speed
            viol = jnp.where(touching, -vn, -1e9)
            k = jnp.argmax(viol)
            oh = jax.nn.one_hot(k, n.shape[0], dtype=n.dtype)
            nk = oh @ n
            vnk = jnp.dot(oh, vn)
            vel = jnp.where(viol[k] > 0.0, vel - nk * vnk, vel)
        return foot, vel

    for _ in range(3):
        foot, vel = slide_iter(foot, vel)

    # --- Stair walk (step-up 0.4; Jolt CharacterVirtual::WalkStairs
    # semantics, the algorithm PlayerPhysics.cpp:344-446 runs) ---
    desired_h = (desired_vel_pre * dt) * jnp.array([1.0, 1.0, 0.0])
    desired_len = jnp.linalg.norm(desired_h)
    achieved_h = (foot - old_foot) * jnp.array([1.0, 1.0, 0.0])
    fwd = desired_h / jnp.maximum(desired_len, 1e-9)
    achieved_len = jnp.maximum(jnp.dot(achieved_h, fwd), 0.0)
    blocked = (desired_len > 1e-5) & (achieved_len + 1e-4 < desired_len * 0.5)

    # mWalkStairsMinStepForward = 0.02: at high tick rates the per-tick step
    # is tiny, so the landing starts ON the step edge (a steep contact) and
    # the climb converges over a handful of ticks — exactly like Jolt.
    step_fwd = fwd * jnp.maximum(desired_len - achieved_len, 0.02)
    up_foot = foot + jnp.array([0.0, 0.0, STAIR_STEP_UP]) + step_fwd
    pre_stair_z = foot[2]
    ez = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    # Jolt's down shape-cast is approximated by a dense vmapped drop scan
    # (0.05 resolution); the landing is the FIRST depth with any contact.
    # A steep landing (the step edge) is accepted when Jolt's forward test
    # probe (mWalkStairsStepForwardTest = 0.15 ahead) finds non-steep floor.
    # The whole scan lives under lax.cond: zero probe cost unless blocked.
    zoffs9 = (jnp.arange(1, 10, dtype=jnp.float32) * 0.05)   # 0.05..0.45

    def stair_branch(foot):
        n2, pen2, pt2, _, _, ok2 = _capsule_probe(up_foot, cyl_h, cands,
                                                  world, config)
        clear_up = ~jnp.any(ok2 & (pen2 > 0.01))

        def dscan(p):
            n3, pen3, pt3, _, v3, ok3 = _capsule_probe(p, cyl_h, cands,
                                                       world, config)
            # First-touch approximation of the shape cast: a grid point
            # deeper than the 0.05 grid step means the cast skipped INTO
            # geometry (started colliding / tunneled a thin feature) — not
            # a landing.
            deep = jnp.max(jnp.where(ok3, pen3, -1e9))
            contact = (deep > 0.0) & (deep < 0.08)
            sup, _, _, steep3 = _support_info(p, n3, pen3, pt3, v3, ok3)
            return contact, deep, sup, steep3

        probe_land = up_foot[None, :] - zoffs9[:, None] * ez
        cont, deep_s, sup_s, steep_s = jax.vmap(dscan)(probe_land)
        found = jnp.any(cont)
        k = jnp.argmax(cont)                  # first contacting depth
        oh = jax.nn.one_hot(k, zoffs9.shape[0], dtype=jnp.float32)
        land_p = oh @ probe_land
        land_deep = jnp.dot(oh, deep_s)
        land_flat = jnp.dot(oh, (sup_s & ~steep_s).astype(jnp.float32)) > 0.5
        # Forward test column: non-steep supported floor 0.15 ahead.  Like
        # Jolt's test cast, it only counts when its START is clear — a test
        # column starting inside a too-tall step must not validate it.
        tn, tpen, _, _, _, tok = _capsule_probe(up_foot + fwd * 0.15, cyl_h,
                                                cands, world, config)
        tclear = ~jnp.any(tok & (tpen > 0.01))
        tcont, _, tsup, tsteep = jax.vmap(dscan)(probe_land + fwd * 0.15)
        test_ok = tclear & jnp.any(tcont & tsup & ~tsteep)
        did = clear_up & found & (land_flat | test_ok)
        new_foot = land_p + ez * jnp.maximum(land_deep, 0.0)
        return jnp.where(did, new_foot, foot), did

    stair_pred = blocked & was_supported & ~fly_mode
    foot, do_stairs = jax.lax.cond(
        stair_pred, stair_branch, lambda f: (f, jnp.array(False)), foot)

    # --- Stick to floor (step-down 0.5) ---
    n4, pen4, pt4, bid4, v4, ok4 = _capsule_probe(foot, cyl_h, cands,
                                                  world, config)
    sup_now, gn_now, gv_now, _ = _support_info(foot, n4, pen4, pt4, v4, ok4)
    moving_up = (foot[2] - old_foot[2]) / jnp.maximum(dt, 1e-9) > 1e-6
    want_stick = was_supported & ~sup_now & ~moving_up & ~fly_mode & ~do_jump

    # Probe straight down for a floor within the step-down distance — one
    # vmapped pass over the 3 drop depths, under lax.cond (zero probe cost
    # unless the character just walked off a support).
    def stick_branch(foot):
        def stick_probe(p):
            n5, pen5, pt5, _, v5, ok5 = _capsule_probe(p, cyl_h, cands,
                                                       world, config)
            sup5, _, _, steep5 = _support_info(p, n5, pen5, pt5, v5, ok5)
            deep5 = jnp.max(jnp.where(ok5, pen5, -1e9))
            return sup5 & ~steep5, deep5

        zoffs3 = jnp.array([0.1, 0.25, 0.5], jnp.float32)
        probe3 = foot[None, :] - zoffs3[:, None] * ez
        sup3, deep3 = jax.vmap(stick_probe)(probe3)
        stick_found = jnp.any(sup3)
        first3 = jnp.argmax(sup3)
        oh3 = jax.nn.one_hot(first3, 3, dtype=jnp.float32)
        stick_foot = (oh3 @ probe3
                      + ez * jnp.maximum(jnp.dot(oh3, deep3), 0.0))
        return jnp.where(stick_found, stick_foot, foot), stick_found

    foot, stuck = jax.lax.cond(
        want_stick, stick_branch, lambda f: (f, jnp.array(False)), foot)

    # Final ground state.
    n6, pen6, pt6, bid6, v6, ok6 = _capsule_probe(foot, cyl_h, cands,
                                                  world, config)
    sup_f, gn_f, gv_f, _ = _support_info(foot, n6, pen6, pt6, v6, ok6)
    on_ground = sup_f & ((vel[2] - gv_f[2]) < 0.1)

    # Camera z smoothing (PlayerPhysics.cpp:316-318, 450-451).
    dz = foot[2] - pre_stair_z
    cz = char.campos_z_delta - 20.0 * dt * char.campos_z_delta
    cz = jnp.where(jnp.abs(cz) < 1e-5, 0.0, cz)
    cz = jnp.clip(cz + jnp.where(do_stairs | stuck, dz, 0.0), -0.3, 0.3)

    campos = jnp.array([foot[0], foot[1], foot[2] + EYE_HEIGHT, 1.0]) - jnp.array([0, 0, 1.0, 0]) * cz

    touched = jnp.where(ok6 & (pen6 > -0.01) & (bid6 >= 0), bid6, -1)

    new_char = CharacterState(
        pos=foot, vel=vel, on_ground=on_ground, ground_normal=gn_f,
        ground_vel=gv_f, campos_z_delta=cz, gravity_enabled=gravity_enabled,
        fly_mode=fly_mode, sitting=sitting,
    )
    return new_char, campos, do_jump, touched


@partial(jax.jit, static_argnames=("config",))
def _player_update_packed(char, body, world, move, jump_req, fly_mode,
                          sitting, dt, params, config, exclude_body):
    """character_update + ONE packed host-readback vector.

    The host wrapper needs campos, jumped, on_ground, pos, vel, ground_vel
    and the touched-body list every tick; reading them as separate arrays
    cost ~8 device->host round trips per tick (remote runtimes charge ~ms
    of latency each — the networked client tick was readback-bound).
    Layout: [campos(4), jumped, on_ground, pos(3), vel(3), ground_vel(3),
    touched(K)] as f32 (slot ids < 2^24 are exact in f32)."""
    new_state, campos, jumped, touched = character_update(
        char, body, world, move, jump_req, fly_mode, sitting, dt, params,
        config, exclude_body)
    packed = jnp.concatenate([
        campos,
        jnp.stack([jumped.astype(jnp.float32),
                   new_state.on_ground.astype(jnp.float32)]),
        new_state.pos, new_state.vel, new_state.ground_vel,
        touched.astype(jnp.float32)])
    return new_state, packed


class PlayerPhysics:
    """Host wrapper: input accumulation + kinematic proxy body.

    API parity with gui_client/PlayerPhysics.h: process_move_forwards /
    process_strafe_right / process_move_up / process_jump / update /
    set_fly_mode_enabled / setters.
    """

    def __init__(self, physics_world, eye_pos=(0.0, 0.0, 2.0)):
        from substrata_tpu.physics import shapes
        from substrata_tpu.physics.state import MotionType
        from substrata_tpu.physics.world import PhysicsObject, USERDATA_AVATAR

        self.world = physics_world
        self.state = init_character_state(np.asarray(eye_pos, np.float32))
        self._host_pos = None           # host mirrors (refreshed by update)
        self._host_on_ground = False
        self._host_vel = np.zeros(3, np.float32)
        self._pipeline = None           # set_pipelined
        self._last_campos = np.array(
            list(np.asarray(eye_pos, np.float32)) + [1.0], np.float32)
        self.move_desired_vel = np.zeros(3, np.float32)
        self.last_jump_time = -1.0
        self.fly_mode = False
        self.sitting = False
        self.last_update_events_jumped = False
        self.contacted_bodies: list = []
        self.last_xy_plane_vel_rel_ground = np.zeros(3, np.float32)
        # Kinematic proxy capsule so dynamic bodies get pushed by the solver.
        self.proxy = physics_world.add_object(PhysicsObject(
            shape=shapes.make_capsule(SPHERE_RAD, CYLINDER_HEIGHT / 2),
            pos=self._capsule_center(),
            motion_type=int(MotionType.KINEMATIC),
            userdata_type=USERDATA_AVATAR))

    def _capsule_center(self):
        foot = self._host_foot_pos()
        return foot + np.array([0, 0, SPHERE_RAD + CYLINDER_HEIGHT / 2], np.float32)

    def _host_foot_pos(self):
        """Foot position without a device readback when the host cache is
        fresh (update() refreshes it; setters invalidate it)."""
        if self._host_pos is None:
            self._host_pos = np.asarray(self.state.pos)
        return self._host_pos

    # Input processing (PlayerPhysics.cpp:159-217).
    def process_move(self, vec, runpressed=False):
        self.move_desired_vel += np.asarray(vec, np.float32) * MOVE_SPEED * (
            RUN_FACTOR if runpressed else 1.0)

    def process_jump(self, cur_time):
        self.last_jump_time = cur_time

    def set_fly_mode_enabled(self, enabled):
        self.fly_mode = bool(enabled)

    def is_move_desired_vel_nonzero(self):
        return float(np.sum(self.move_desired_vel ** 2)) > 0

    def zero_move_desired_vel(self):
        self.move_desired_vel = np.zeros(3, np.float32)

    def set_pipelined(self, depth: int):
        """Pipelined host readback (see runtime/readback.py): update()
        consumes the packed result dispatched ``depth`` ticks ago; the
        on-device CharacterState chain stays exact."""
        from substrata_tpu.runtime.readback import PipelinedReadback
        self._pipeline = PipelinedReadback(depth) if depth > 0 else None

    def update(self, dt, cur_time=0.0):
        """Returns (campos [4], jumped)."""
        w = self.world
        w._flush()
        jump_req = (cur_time - self.last_jump_time) < JUMP_PERIOD
        new_state, packed = _player_update_packed(
            self.state, w.state, w.static_world,
            jnp.asarray(self.move_desired_vel), jnp.array(bool(jump_req)),
            jnp.array(self.fly_mode), jnp.array(self.sitting),
            jnp.float32(dt), w.params, w.config, jnp.int32(self.proxy.slot))
        self.state = new_state
        if self._pipeline is not None:
            pk = self._pipeline.push(packed)
            if pk is None:
                # Pipeline filling: host mirrors keep their last values;
                # the proxy follows the last-known foot position.
                w.move_kinematic_object(self.proxy, self._capsule_center(),
                                        self.proxy.rot, dt)
                self.zero_move_desired_vel()
                return self._last_campos.copy(), False
        else:
            pk = np.asarray(packed)      # the tick's ONE character readback
        jumped = self._consume_packed(pk)
        # Drive the kinematic proxy.
        w.move_kinematic_object(self.proxy, self._capsule_center(),
                                self.proxy.rot, dt)
        self.zero_move_desired_vel()
        return self._last_campos.copy(), jumped

    def _consume_packed(self, pk) -> bool:
        """Refresh the host mirrors from one packed readback vector
        (layout: _player_update_packed).  Called synchronously by update()
        or depth ticks late by the readback pipeline / fused think."""
        if pk is None:
            return False
        w = self.world
        campos = pk[0:4].copy()
        jumped = bool(pk[4] > 0.5)
        self._host_on_ground = bool(pk[5] > 0.5)
        self._host_pos = pk[6:9].copy()
        v = pk[9:12]
        gv = pk[12:15]
        self._host_vel = v.copy()
        if jumped:
            self.last_jump_time = -1.0
        self.last_update_events_jumped = jumped
        t = pk[15:].astype(np.int32)
        self.contacted_bodies = [w.objects[int(s)] for s in t[t >= 0]
                                 if int(s) in w.objects]
        self.last_xy_plane_vel_rel_ground = (
            (v - gv) if self._host_on_ground else v) * np.array([1, 1, 0], np.float32)
        self._last_campos = campos
        return jumped

    @property
    def on_ground(self):
        return self._host_on_ground

    def get_velocity(self):
        """Host-cached linear velocity (refreshed by update())."""
        return self._host_vel

    def get_eye_position(self):
        return self._host_foot_pos() + np.array([0, 0, EYE_HEIGHT], np.float32)

    def set_position(self, eye_pos, linvel=None):
        foot = np.asarray(eye_pos, np.float32) - np.array([0, 0, EYE_HEIGHT], np.float32)
        self.state = self.state.replace(pos=jnp.asarray(foot))
        self._host_pos = foot.copy()
        if linvel is not None:
            self.state = self.state.replace(vel=jnp.asarray(np.asarray(linvel, np.float32)))
