"""SoA body state, shape tables and static world geometry.

The device-resident mirror of the reference's per-body bookkeeping:
- PhysicsObject fields (gui_client/PhysicsObject.h:77-127): pos/rot/scale,
  motion type {STATIC, KINEMATIC, DYNAMIC}, mass/friction/restitution,
  collidable / is_sensor flags, underwater state.
- Object layers (gui_client/PhysicsWorld.h:67-74): NON_MOVING, MOVING,
  NON_MOVING_NON_COLLIDABLE, MOVING_NON_COLLIDABLE; the layer-pair collision
  matrix (PhysicsWorld.cpp:85-189) reduces to: collidable layers collide with
  everything collidable; *_NON_COLLIDABLE layers collide with nothing.
- Capacity limits mirror PhysicsWorld.cpp:490-520 (65536 max bodies default,
  configurable down for tests).

Everything is fixed-capacity: dead slots are masked out with ``alive`` and
recycled by the host-side free list in physics.world.PhysicsWorld.
"""

from __future__ import annotations

import enum
from typing import Any

import flax.struct
import jax.numpy as jnp
import numpy as np

from substrata_tpu.maths import quat as quatm
from substrata_tpu.maths import transform as tmath


class MotionType(enum.IntEnum):
    """PhysicsObject.h:112-119 (semi_static treated as kinematic-until-hit)."""

    STATIC = 0
    KINEMATIC = 1
    DYNAMIC = 2


class ShapeType(enum.IntEnum):
    SPHERE = 0
    BOX = 1
    CAPSULE = 2  # axis = local Z; params (radius, half_cyl_height)
    HULL = 3     # params[0] = hull slot id in HullLibrary


class Layer(enum.IntEnum):
    """gui_client/PhysicsWorld.h:67-74."""

    NON_MOVING = 0
    MOVING = 1
    NON_MOVING_NON_COLLIDABLE = 2
    MOVING_NON_COLLIDABLE = 3


# Seawater constants of the buoyancy pass (PhysicsWorld.cpp:1367-1442).
WATER_DENSITY = 1020.0
WATER_LINEAR_DRAG = 0.1
WATER_ANGULAR_DRAG = 3.0
DEFAULT_GRAVITY = (0.0, 0.0, -9.81)  # PhysicsWorld.cpp:517 (z-up world)


@flax.struct.dataclass
class BodyState:
    """SoA state for all bodies, capacity-N fixed."""

    pos: jnp.ndarray          # [N, 3] f32
    quat: jnp.ndarray         # [N, 4] f32 (x, y, z, w)
    linvel: jnp.ndarray       # [N, 3]
    angvel: jnp.ndarray       # [N, 3]
    inv_mass: jnp.ndarray     # [N]
    inv_inertia: jnp.ndarray  # [N, 3] diagonal local-space inverse inertia
    friction: jnp.ndarray     # [N]
    restitution: jnp.ndarray  # [N]
    motion_type: jnp.ndarray  # [N] i32
    layer: jnp.ndarray        # [N] i32
    is_sensor: jnp.ndarray    # [N] bool
    shape_type: jnp.ndarray   # [N] i32
    shape_params: jnp.ndarray  # [N, 4] f32 (see ShapeType)
    alive: jnp.ndarray        # [N] bool — slot in use
    awake: jnp.ndarray        # [N] bool — participating in sim
    sleep_timer: jnp.ndarray  # [N] f32 — seconds below sleep velocity
    gravity_factor: jnp.ndarray  # [N]
    linear_damping: jnp.ndarray  # [N]
    angular_damping: jnp.ndarray  # [N]
    use_zero_linear_drag: jnp.ndarray  # [N] bool (PhysicsObject.h: boats do custom drag)
    underwater: jnp.ndarray   # [N] bool
    # Per-shape submerged-volume proxy: bounding radius used by buoyancy.
    bound_radius: jnp.ndarray  # [N] f32 — radius of bounding sphere around COM
    volume: jnp.ndarray       # [N] f32 — shape volume for buoyancy

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def dynamic(self):
        return self.motion_type == int(MotionType.DYNAMIC)

    @property
    def collidable(self):
        return (self.layer == int(Layer.NON_MOVING)) | (self.layer == int(Layer.MOVING))


def zero_body_state(capacity: int) -> BodyState:
    n = capacity
    f = jnp.float32
    return BodyState(
        pos=jnp.zeros((n, 3), f),
        quat=quatm.identity((n,)),
        linvel=jnp.zeros((n, 3), f),
        angvel=jnp.zeros((n, 3), f),
        inv_mass=jnp.zeros((n,), f),
        inv_inertia=jnp.zeros((n, 3), f),
        friction=jnp.full((n,), 0.5, f),
        restitution=jnp.zeros((n,), f),
        motion_type=jnp.zeros((n,), jnp.int32),
        layer=jnp.zeros((n,), jnp.int32),
        is_sensor=jnp.zeros((n,), bool),
        shape_type=jnp.zeros((n,), jnp.int32),
        shape_params=jnp.zeros((n, 4), f),
        alive=jnp.zeros((n,), bool),
        awake=jnp.zeros((n,), bool),
        sleep_timer=jnp.zeros((n,), f),
        gravity_factor=jnp.ones((n,), f),
        linear_damping=jnp.full((n,), 0.05, f),
        angular_damping=jnp.full((n,), 0.05, f),
        use_zero_linear_drag=jnp.zeros((n,), bool),
        underwater=jnp.zeros((n,), bool),
        bound_radius=jnp.zeros((n,), f),
        volume=jnp.zeros((n,), f),
    )


@flax.struct.dataclass
class HullLibrary:
    """Padded convex-hull vertex table, uploaded once at load time.

    Replaces the Jolt ConvexHullShape factory path
    (PhysicsWorld.cpp:871-1083 createJoltShapeForBatchedMesh dynamic branch).
    Hull vertices are stored centered on the COM in principal axes, so bodies
    referencing a hull use a diagonal local inertia.
    """

    verts: jnp.ndarray   # [H, MAX_HULL_VERTS, 3] f32, padded with repeats
    n_verts: jnp.ndarray  # [H] i32
    planes: jnp.ndarray  # [H, MAX_HULL_FACES, 4] unit outward (n, d): n·x <= d
    n_faces: jnp.ndarray  # [H] i32

    @property
    def capacity(self) -> int:
        return self.verts.shape[0]

    @property
    def max_verts(self) -> int:
        return self.verts.shape[1]

    @property
    def max_faces(self) -> int:
        return self.planes.shape[1]


def empty_hull_library(capacity: int = 64, max_verts: int = 32,
                       max_faces: int = 32) -> HullLibrary:
    return HullLibrary(
        verts=jnp.zeros((capacity, max_verts, 3), jnp.float32),
        n_verts=jnp.zeros((capacity,), jnp.int32),
        planes=jnp.zeros((capacity, max_faces, 4), jnp.float32),
        n_faces=jnp.zeros((capacity,), jnp.int32),
    )


@flax.struct.dataclass
class Heightfield:
    """Regular-grid heightfield (reference: heightfield shape with block
    size 4, PhysicsWorld.cpp:1086-1119; terrain queries
    TerrainSystem::evalTerrainHeight, TerrainSystem.h:190)."""

    heights: jnp.ndarray  # [HX, HY] f32, z-up
    origin: jnp.ndarray   # [2] world xy of heights[0, 0]
    cell_w: jnp.ndarray   # [] spacing in x and y
    # COMPILE-TIME flatness flag (ground-plane worlds, the common case):
    # samples collapse to heights[0, 0] / normal (0,0,1), deleting the
    # per-point patch gathers (81,920 rows/step at the 10k bench world) and
    # letting ray queries use the analytic plane hit instead of a
    # march+bisection loop.
    is_flat: bool = flax.struct.field(pytree_node=False, default=False)

    def sample(self, xy):
        """Bilinear height at world xy [..., 2]; clamps at borders."""
        if self.is_flat:
            return jnp.broadcast_to(self.heights[0, 0], xy.shape[:-1])
        hx, hy = self.heights.shape
        u = (xy[..., 0] - self.origin[0]) / self.cell_w
        v = (xy[..., 1] - self.origin[1]) / self.cell_w
        u = jnp.clip(u, 0.0, hx - 1.001)
        v = jnp.clip(v, 0.0, hy - 1.001)
        i0 = jnp.floor(u).astype(jnp.int32)
        j0 = jnp.floor(v).astype(jnp.int32)
        fu = u - i0
        fv = v - j0
        h00 = self.heights[i0, j0]
        h10 = self.heights[i0 + 1, j0]
        h01 = self.heights[i0, j0 + 1]
        h11 = self.heights[i0 + 1, j0 + 1]
        return (h00 * (1 - fu) * (1 - fv) + h10 * fu * (1 - fv)
                + h01 * (1 - fu) * fv + h11 * fu * fv)

    def sample_with_normal(self, xy):
        """(height, unit normal) at world xy with ONE 4-lane patch gather —
        the 2x2 corner heights are packed into a [HX, HY, 4] quad array
        (elementwise rolls, no gathers) so the per-point lookup is a single
        gather instead of four; the normal is the analytic gradient of the
        bilinear patch.  TPU gathers are the cost here."""
        if self.is_flat:
            h = jnp.broadcast_to(self.heights[0, 0], xy.shape[:-1])
            n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                                 xy.shape[:-1] + (3,))
            return h, n
        hx, hy = self.heights.shape
        u = (xy[..., 0] - self.origin[0]) / self.cell_w
        v = (xy[..., 1] - self.origin[1]) / self.cell_w
        u = jnp.clip(u, 0.0, hx - 1.001)
        v = jnp.clip(v, 0.0, hy - 1.001)
        i0 = jnp.floor(u).astype(jnp.int32)
        j0 = jnp.floor(v).astype(jnp.int32)
        fu = u - i0
        fv = v - j0
        hh = self.heights
        hquad = jnp.stack([
            hh,
            jnp.roll(hh, -1, axis=0),
            jnp.roll(hh, -1, axis=1),
            jnp.roll(jnp.roll(hh, -1, axis=0), -1, axis=1),
        ], axis=-1)                       # [HX, HY, (h00,h10,h01,h11)]
        # Flat row index into a [HX*HY, 4] view: a multi-axis (i0, j0)
        # gather takes XLA's slow point-gather path on TPU; a flat 1-D row
        # index hits the fast row-gather path.
        q = hquad.reshape(hx * hy, 4)[(i0 * hy + j0).reshape(-1)].reshape(
            i0.shape + (4,))              # [..., 4] — the one gather
        h00, h10, h01, h11 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        h = (h00 * (1 - fu) * (1 - fv) + h10 * fu * (1 - fv)
             + h01 * (1 - fu) * fv + h11 * fu * fv)
        dzdx = ((h10 - h00) * (1 - fv) + (h11 - h01) * fv) / self.cell_w
        dzdy = ((h01 - h00) * (1 - fu) + (h11 - h10) * fu) / self.cell_w
        n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(dzdx)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n

    def normal(self, xy):
        """Surface normal at world xy (see sample_with_normal)."""
        return self.sample_with_normal(xy)[1]


def flat_heightfield(extent: float = 1000.0, z: float = 0.0, res: int = 8) -> Heightfield:
    return Heightfield(
        heights=jnp.full((res, res), z, jnp.float32),
        origin=jnp.array([-extent / 2, -extent / 2], jnp.float32),
        cell_w=jnp.float32(extent / (res - 1)),
        is_flat=True,
    )


@flax.struct.dataclass
class TriMesh:
    """Static triangle soup with a uniform-grid triangle index for TPU-friendly
    candidate gathering (replaces Jolt's MeshShape midphase,
    PhysicsWorld.cpp:735-868 static branch).

    ``cell_tris`` buckets triangle indices into a fixed 2D grid over xy
    (world geometry is predominantly z-up ground-like); slot -1 = empty.
    """

    verts: jnp.ndarray      # [V, 3] f32
    tris: jnp.ndarray       # [T, 3] i32
    tri_mats: jnp.ndarray   # [T] i32 per-triangle material index (traceRay parity)
    tri_owner: jnp.ndarray  # [T] i32 owning body slot (-1 = world geometry);
                            # maps a trimesh ray hit back to its WorldObject
                            # (reference: each static mesh is its own Jolt
                            # body, PhysicsWorld.cpp:871-1000)
    cell_tris: jnp.ndarray  # [GX, GY, CAP] i32 triangle ids, -1 padded
    origin: jnp.ndarray     # [2] grid origin xy
    cell_w: jnp.ndarray     # [] cell width
    n_tris: jnp.ndarray     # [] i32


def empty_trimesh(grid=(4, 4), cap=4) -> TriMesh:
    return TriMesh(
        verts=jnp.zeros((3, 3), jnp.float32),
        tris=jnp.zeros((1, 3), jnp.int32),
        tri_mats=jnp.zeros((1,), jnp.int32),
        tri_owner=jnp.full((1,), -1, jnp.int32),
        cell_tris=jnp.full(grid + (cap,), -1, jnp.int32),
        origin=jnp.array([-1e3, -1e3], jnp.float32),
        cell_w=jnp.float32(1e3),
        n_tris=jnp.int32(0),
    )


def build_trimesh(verts: np.ndarray, tris: np.ndarray, tri_mats: np.ndarray | None = None,
                  grid_dim: int = 64, cell_cap: int = 32,
                  tri_owner: np.ndarray | None = None) -> TriMesh:
    """Host-side build: bucket triangles into an xy uniform grid by AABB
    overlap (vectorised over triangles: one masked assignment per covered
    (di, dj) cell offset — triangles rarely span more than a cell or two)."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    nt = len(tris)
    if tri_mats is None:
        tri_mats = np.zeros((nt,), np.int32)
    if tri_owner is None:
        tri_owner = np.full((nt,), -1, np.int32)
    tv = verts[tris]  # [T, 3, 3]
    lo = tv.min(axis=1)[:, :2]
    hi = tv.max(axis=1)[:, :2]
    gmin = verts[:, :2].min(axis=0) - 1e-3
    gmax = verts[:, :2].max(axis=0) + 1e-3
    cell_w = float(max((gmax - gmin).max() / grid_dim, 1e-3))
    gx = max(1, min(grid_dim, int(np.ceil((gmax[0] - gmin[0]) / cell_w))))
    gy = max(1, min(grid_dim, int(np.ceil((gmax[1] - gmin[1]) / cell_w))))
    cell_tris = np.full((gx, gy, cell_cap), -1, np.int32)
    counts = np.zeros((gx, gy), np.int32)
    ilo = np.clip(((lo - gmin) / cell_w).astype(np.int32), 0, [gx - 1, gy - 1])
    ihi = np.clip(((hi - gmin) / cell_w).astype(np.int32), 0, [gx - 1, gy - 1])
    span = ihi - ilo
    tids = np.arange(nt, dtype=np.int32)
    max_di = int(span[:, 0].max()) if nt else 0
    max_dj = int(span[:, 1].max()) if nt else 0
    for di in range(max_di + 1):
        for dj in range(max_dj + 1):
            m = (span[:, 0] >= di) & (span[:, 1] >= dj)
            ti = tids[m]
            ci = ilo[m, 0] + di
            cj = ilo[m, 1] + dj
            # Sequential fill per cell: rank each tri within its cell run.
            flat = ci.astype(np.int64) * gy + cj
            order = np.argsort(flat, kind="stable")
            fs = flat[order]
            run_start = np.concatenate([[0], np.flatnonzero(fs[1:] != fs[:-1]) + 1])
            rank = np.arange(len(fs)) - np.repeat(run_start, np.diff(
                np.concatenate([run_start, [len(fs)]])))
            slot = counts[ci[order], cj[order]] + rank
            ok = slot < cell_cap
            cell_tris[ci[order][ok], cj[order][ok], slot[ok]] = ti[order][ok]
            np.add.at(counts, (ci, cj), 1)
            np.clip(counts, 0, cell_cap, out=counts)
    return TriMesh(
        verts=jnp.asarray(verts),
        tris=jnp.asarray(tris),
        tri_mats=jnp.asarray(tri_mats),
        tri_owner=jnp.asarray(tri_owner),
        cell_tris=jnp.asarray(cell_tris),
        origin=jnp.asarray(gmin, dtype=jnp.float32),
        cell_w=jnp.float32(cell_w),
        n_tris=jnp.int32(len(tris)),
    )


@flax.struct.dataclass
class StaticWorld:
    """Device-resident static environment: heightfield terrain, static
    trimesh geometry, hull library, and the water plane
    (water_z, PhysicsWorld.h water_z member used by the buoyancy pass)."""

    heightfield: Heightfield
    has_heightfield: jnp.ndarray  # [] bool
    trimesh: TriMesh
    hulls: HullLibrary
    water_z: jnp.ndarray  # [] f32; -1e10 = no water


def default_static_world(ground_z: float = 0.0, water_z: float = -1e10) -> StaticWorld:
    return StaticWorld(
        heightfield=flat_heightfield(z=ground_z),
        has_heightfield=jnp.array(True),
        trimesh=empty_trimesh(),
        hulls=empty_hull_library(),
        water_z=jnp.float32(water_z),
    )


@flax.struct.dataclass
class SimParams:
    """Tunable (traced) solver parameters."""

    gravity: jnp.ndarray           # [3]
    baumgarte: jnp.ndarray         # [] position-correction factor per step
    contact_slop: jnp.ndarray      # [] allowed penetration
    restitution_threshold: jnp.ndarray  # [] min approach speed for bounce
    sleep_lin_vel: jnp.ndarray     # [] sleep velocity threshold (Jolt: 0.03 m/s)
    sleep_ang_vel: jnp.ndarray     # [] (Jolt: ~0.5 deg/s -> rad/s)
    sleep_time: jnp.ndarray        # [] time below threshold before sleeping (0.5 s)
    water_z: jnp.ndarray           # [] mirrors StaticWorld.water_z for the step


def default_sim_params() -> SimParams:
    return SimParams(
        gravity=jnp.array(DEFAULT_GRAVITY, jnp.float32),
        baumgarte=jnp.float32(0.2),
        contact_slop=jnp.float32(0.005),
        restitution_threshold=jnp.float32(1.0),
        sleep_lin_vel=jnp.float32(0.03),
        sleep_ang_vel=jnp.float32(0.03),
        sleep_time=jnp.float32(0.5),
        water_z=jnp.float32(-1e10),
    )


class SimConfig:
    """Static (compile-time) capacity configuration.

    Mirrors the Jolt init limits (PhysicsWorld.cpp:490-506: 65536 max bodies,
    65536 body pairs, 10240 contact constraints) but scaled per scenario.
    Hashable so it can be a static jit argument.
    """

    def __init__(
        self,
        capacity: int = 1024,
        max_pairs: int = 4096,
        max_contacts_per_pair: int = 4,
        grid_dim: int = 64,
        cell_capacity: int = 8,
        cell_size: float = 2.0,
        solver_iters: int = 10,
        static_contacts_per_body: int = 4,
        max_tri_candidates: int = 16,
        contacts_per_body: int = 16,
        max_active_contacts: int = 0,
        pairs_per_body: int = 8,
        pair_rebuild_interval: int = 4,
        present_shape_types: tuple = (True, True, True, True),
    ):
        if capacity > 65536:
            # Reference-parity ceiling (PhysicsWorld.cpp:492-506: 65536 max
            # bodies): broadphase cell tables pack a body slot id into 16
            # bits of the table entry (broadphase.py _TBL_IDX_MASK) and pair
            # compaction packs (a << 16 | b) into a uint32.  Worlds beyond
            # 65536 bodies shard spatially across devices instead
            # (parallel/spatial.py x-slab decomposition + halo exchange),
            # which also restores the per-step cost budget — one chip at
            # >65k bodies would miss 60 Hz anyway.
            raise ValueError(
                "SimConfig.capacity is limited to 65536 bodies per device "
                "(reference parity); use parallel.spatial spatial sharding "
                "for larger worlds")
        self.capacity = capacity
        self.max_pairs = max_pairs
        self.max_contacts_per_pair = max_contacts_per_pair
        self.grid_dim = grid_dim
        self.cell_capacity = cell_capacity
        self.cell_size = cell_size
        self.solver_iters = solver_iters
        self.static_contacts_per_body = static_contacts_per_body
        self.max_tri_candidates = max_tri_candidates
        self.contacts_per_body = contacts_per_body
        # Broadphase per-body pair emission cap (emitting body = lower slot).
        self.pairs_per_body = pairs_per_body
        # Compacted BODY-PAIR contact buffer for the solver; 0 = auto
        # heuristic.  Static-world contacts never go through this buffer:
        # they stay in their raw body-blocked [capacity *
        # static_contacts_per_body] layout, which the solver handles with
        # dense reshapes (zero gathers) and which can never overflow — so
        # ground contacts can never be evicted by pair load (r5 redesign;
        # dropping them made piles sink into the floor).
        # The solver's incidence sort packs (body << (contact_bits+1) |
        # contact << 1 | side) into a uint32, so bits(capacity) +
        # contact_bits + 1 must fit in 32 bits (the body field also carries
        # the trash sentinel value == capacity) — the auto heuristic clamps
        # to that budget and explicit values are validated here (better a
        # config-time error than a jit-time assert).
        contact_budget = (1 << (32 - 1 - max(capacity.bit_length(), 1))) - 1
        auto = min(2 * max_pairs + 4 * capacity, contact_budget)
        self.max_active_contacts = max_active_contacts or auto
        if (max(self.max_active_contacts.bit_length(), 1)
                + max(capacity.bit_length(), 1) + 1 > 32):
            raise ValueError(
                f"max_active_contacts={self.max_active_contacts} too large "
                f"for capacity={capacity}: the solver packs body and contact "
                f"ids into one uint32 sort key (<= {contact_budget} contacts "
                f"at this capacity)")
        # Broadphase temporal reuse: rebuild the pair list at most every this
        # many steps (1 = every step); the cached rebuild enlarges the pair
        # margin to cover worst-case motion over the window and PhysicsWorld
        # forces a rebuild on host mutations and wakes.
        self.pair_rebuild_interval = pair_rebuild_interval
        # Which ShapeTypes exist in the world (sphere, box, capsule, hull) —
        # narrowphase buckets for absent shape-combos get minimal capacity.
        # PhysicsWorld recomputes this at flush time (recompiles on change).
        self.present_shape_types = tuple(bool(x) for x in present_shape_types)

    def _key(self):
        return tuple(sorted(self.__dict__.items()))

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other: Any):
        return isinstance(other, SimConfig) and self._key() == other._key()

    def __repr__(self):
        return f"SimConfig({self.__dict__})"


def compute_shape_mass_props(shape_type: int, params: np.ndarray, density: float = 1000.0,
                             mass_override: float = 0.0):
    """Host-side mass/inertia/volume/bound-radius for a shape.

    Returns (mass, inv_mass, inv_inertia_diag[3], volume, bound_radius).
    Mirrors how the reference passes WorldObject.mass into Jolt's
    MassProperties (PhysicsWorld.cpp: ScaledMassOverride usage).
    """
    p = np.asarray(params, np.float32)
    if shape_type == ShapeType.SPHERE:
        r = float(p[0])
        vol = 4.0 / 3.0 * np.pi * r ** 3
        bound = r
        mass = mass_override if mass_override > 0 else density * vol
        i = 0.4 * mass * r * r
        inertia = np.array([i, i, i], np.float32)
    elif shape_type == ShapeType.BOX:
        hx, hy, hz = float(p[0]), float(p[1]), float(p[2])
        vol = 8.0 * hx * hy * hz
        bound = float(np.sqrt(hx * hx + hy * hy + hz * hz))
        mass = mass_override if mass_override > 0 else density * vol
        c = mass / 3.0
        inertia = np.array([c * (hy * hy + hz * hz), c * (hx * hx + hz * hz),
                            c * (hx * hx + hy * hy)], np.float32)
    elif shape_type == ShapeType.CAPSULE:
        r, hh = float(p[0]), float(p[1])
        vol = float(np.pi * r * r * 2 * hh + 4.0 / 3.0 * np.pi * r ** 3)
        bound = hh + r
        mass = mass_override if mass_override > 0 else density * vol
        vol_cyl = np.pi * r * r * 2 * hh
        vol_sph = 4.0 / 3.0 * np.pi * r ** 3
        m_cyl = mass * vol_cyl / vol
        m_sph = mass * vol_sph / vol
        iz = 0.5 * m_cyl * r * r + 0.4 * m_sph * r * r
        d = hh + 3.0 * r / 8.0
        ixy = m_cyl * ((2 * hh) ** 2 / 12.0 + 0.25 * r * r) + m_sph * (0.4 * r * r + d * d)
        inertia = np.array([ixy, ixy, iz], np.float32)
    else:  # HULL — caller supplies bound radius/volume via params[1:3]
        vol = float(p[2]) if p[2] > 0 else 1.0
        bound = float(p[1]) if p[1] > 0 else 1.0
        mass = mass_override if mass_override > 0 else density * vol
        # Inertia approximated as a solid sphere of the bound radius; the
        # hull builder replaces this with the true principal inertia.
        r = bound * 0.7
        i = 0.4 * mass * r * r
        inertia = np.array([i, i, i], np.float32)
    inv_mass = 1.0 / mass if mass > 0 else 0.0
    inv_inertia = np.where(inertia > 0, 1.0 / inertia, 0.0)
    return float(mass), float(inv_mass), inv_inertia.astype(np.float32), float(vol), float(bound)
