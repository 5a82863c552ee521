"""Host-side PhysicsWorld facade.

Preserves the shape of the reference API (gui_client/PhysicsWorld.h:90-238):
addObject / removeObject / setNewObToWorldTransform / moveKinematicObject /
think(dt) / traceRay / doesRayHitAnything / activated-object sets /
water_z + buoyancy toggle / getDiagnostics, and PhysicsObject
(gui_client/PhysicsObject.h:77-140) as the per-object host mirror.

Architecture: the authoritative body state lives on-device as a
physics.state.BodyState; host mutations are queued and flushed as ONE
batched scatter per tick (the host/device boundary discipline from
SURVEY.md §7 — dirty slices in, packed events out).  think(dt) runs the
fused jitted step and refreshes the activated sets from the packed
StepEvents, mirroring the reference's activation listeners
(PhysicsWorld.cpp:1446-1486).
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field as dfield
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from substrata_tpu.maths import quat as quatm
from substrata_tpu.physics import queries, shapes as shape_factories
from substrata_tpu.physics.state import (
    BodyState, Heightfield, Layer, MotionType, ShapeType, SimConfig, SimParams,
    StaticWorld, TriMesh, default_sim_params, default_static_world,
    empty_hull_library, zero_body_state,
)
from substrata_tpu.physics.step import physics_step

# User-data types (PhysicsObject.h:84).
USERDATA_WORLD_OBJECT = 0
USERDATA_PARCEL = 1
USERDATA_INSTANCE = 2
USERDATA_AVATAR = 3


@dataclass(eq=False)  # identity hashing — objects live in activation sets
class PhysicsObject:
    """Host mirror of one body (gui_client/PhysicsObject.h)."""

    shape: shape_factories.PhysicsShape
    pos: np.ndarray = dfield(default_factory=lambda: np.zeros(3, np.float32))
    rot: np.ndarray = dfield(default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    scale: np.ndarray = dfield(default_factory=lambda: np.ones(3, np.float32))
    linvel: np.ndarray = dfield(default_factory=lambda: np.zeros(3, np.float32))
    angvel: np.ndarray = dfield(default_factory=lambda: np.zeros(3, np.float32))
    motion_type: int = int(MotionType.STATIC)
    friction: float = 0.5
    restitution: float = 0.0
    collidable: bool = True
    is_sensor: bool = False
    userdata: Any = None
    userdata_type: int = USERDATA_WORLD_OBJECT
    gravity_factor: float = 1.0
    use_zero_linear_drag: bool = False
    # Network-smoothing state (PhysicsObject.h:93-105): render transform =
    # smoothing ∘ snapshot, decayed toward identity by the client tick.
    smooth_translation: np.ndarray = dfield(default_factory=lambda: np.zeros(3, np.float32))
    smooth_rotation: np.ndarray = dfield(default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    # Filled by PhysicsWorld:
    slot: int = -1
    underwater: bool = False

    @property
    def mass(self) -> float:
        return self.shape.mass

    def get_smoothed_ob_to_world(self) -> np.ndarray:
        """getSmoothedObToWorldMatrix parity (PhysicsObject.h:93-105)."""
        from substrata_tpu.maths import transform as tmath
        base = np.asarray(tmath.trs_matrix(
            jnp.asarray(self.pos), jnp.asarray(self.rot), jnp.asarray(self.scale)))
        sm = np.asarray(tmath.trs_matrix(
            jnp.asarray(self.smooth_translation), jnp.asarray(self.smooth_rotation),
            jnp.ones(3, np.float32)))
        return sm @ base


@partial(jax.jit, donate_argnums=(0,))
def _scatter_updates(state: BodyState, idx, pos, quat, linvel, angvel, inv_mass,
                     inv_inertia, friction, restitution, motion_type, layer,
                     is_sensor, shape_type, shape_params, alive, awake,
                     gravity_factor, zero_drag, bound_radius, volume):
    """Apply a batch of K slot records (idx may contain out-of-range = skip)."""
    return state.replace(
        pos=state.pos.at[idx].set(pos, mode="drop"),
        quat=state.quat.at[idx].set(quat, mode="drop"),
        linvel=state.linvel.at[idx].set(linvel, mode="drop"),
        angvel=state.angvel.at[idx].set(angvel, mode="drop"),
        inv_mass=state.inv_mass.at[idx].set(inv_mass, mode="drop"),
        inv_inertia=state.inv_inertia.at[idx].set(inv_inertia, mode="drop"),
        friction=state.friction.at[idx].set(friction, mode="drop"),
        restitution=state.restitution.at[idx].set(restitution, mode="drop"),
        motion_type=state.motion_type.at[idx].set(motion_type, mode="drop"),
        layer=state.layer.at[idx].set(layer, mode="drop"),
        is_sensor=state.is_sensor.at[idx].set(is_sensor, mode="drop"),
        shape_type=state.shape_type.at[idx].set(shape_type, mode="drop"),
        shape_params=state.shape_params.at[idx].set(shape_params, mode="drop"),
        alive=state.alive.at[idx].set(alive, mode="drop"),
        awake=state.awake.at[idx].set(awake, mode="drop"),
        sleep_timer=state.sleep_timer.at[idx].set(jnp.zeros_like(state.sleep_timer[0]), mode="drop"),
        gravity_factor=state.gravity_factor.at[idx].set(gravity_factor, mode="drop"),
        use_zero_linear_drag=state.use_zero_linear_drag.at[idx].set(zero_drag, mode="drop"),
        bound_radius=state.bound_radius.at[idx].set(bound_radius, mode="drop"),
        volume=state.volume.at[idx].set(volume, mode="drop"),
    )


@partial(jax.jit, static_argnums=(5, 8, 9), donate_argnums=(0, 6, 7))
def _think_step(body, static_world, hull_cv, dt, params, config,
                solver_cache, pair_cache, rebuild_pairs=None,
                has_oversize=True):
    """Donated wrapper over physics_step for the serving path: the carried
    state + caches update in place instead of being copied every step.
    Callers must not hold references to the PREVIOUS step's state arrays.
    rebuild_pairs statically selects the broadphase rebuild/reuse variant
    (host-scheduled; see PhysicsWorld.think); has_oversize statically
    compiles the broadphase oversize pass away when the host mirror shows
    no body wider than a grid cell."""
    from substrata_tpu.physics.step import physics_step as _ps
    return _ps(body, static_world, hull_cv, dt, params, config,
               solver_cache, pair_cache, rebuild_pairs=rebuild_pairs,
               has_oversize=has_oversize)


# Packed per-tick host-input block for the fused serving tick: ONE
# device_put carries every small host value the substep needs (scalars,
# the transform-write scatter, teleport wake regions).  On a tunneled
# remote runtime each separate device_put/dispatch costs ~0.5-2 ms of
# launch latency; the unfused path paid ~12 of them per tick.
_TIN_K = 128          # transform-write rows per serving tick
_TIN_R = 64           # teleport wake regions per serving tick
_TIN_SCAL = 8         # dt, move[3], jump, fly, sitting, exclude-slot
_O_IDX = _TIN_SCAL
_O_POS = _O_IDX + _TIN_K
_O_ROT = _O_POS + 3 * _TIN_K
_O_LV = _O_ROT + 4 * _TIN_K
_O_AV = _O_LV + 3 * _TIN_K
_O_VOK = _O_AV + 3 * _TIN_K
_O_CTR = _O_VOK + _TIN_K
_O_RAD = _O_CTR + 3 * _TIN_R
_TIN_TOTAL = _O_RAD + _TIN_R


def _empty_tick_in(capacity: int) -> np.ndarray:
    buf = np.zeros(_TIN_TOTAL, np.float32)
    buf[_O_IDX:_O_POS].view(np.int32)[:] = capacity   # all rows dropped
    buf[_O_RAD:] = -1e9                               # no wake regions
    return buf


@partial(jax.jit, static_argnums=(4, 9, 10), donate_argnums=(0, 5, 6, 7))
def _serving_tick(body, static_world, hull_cv, params, config,
                  solver_cache, pair_cache, char, tick_in,
                  rebuild_pairs=None, has_oversize=True):
    """The WHOLE serving substep as ONE device program consuming ONE packed
    host->device transfer: host transform writes (snapshot playback,
    kinematic moves, teleport wakes) -> player character update -> world
    step -> event digest -> transform readback block (§3.1 steps 3c/3d +
    6; GUIClient.cpp:5918 runs this loop at display rate).  Fusing the
    five programs the tick previously dispatched removes the per-dispatch
    tunnel latency that dominated the 12k-object networked tick."""
    from substrata_tpu.physics.character import _player_update_packed
    from substrata_tpu.physics.step import physics_step as _ps
    dt = tick_in[0]
    move = tick_in[1:4]
    jump = tick_in[4] > 0
    fly = tick_in[5] > 0
    sitting = tick_in[6] > 0
    exclude = jax.lax.bitcast_convert_type(tick_in[7], jnp.int32)
    idx = jax.lax.bitcast_convert_type(tick_in[_O_IDX:_O_POS], jnp.int32)
    pos = tick_in[_O_POS:_O_ROT].reshape(_TIN_K, 3)
    rot = tick_in[_O_ROT:_O_LV].reshape(_TIN_K, 4)
    lv = tick_in[_O_LV:_O_AV].reshape(_TIN_K, 3)
    av = tick_in[_O_AV:_O_VOK].reshape(_TIN_K, 3)
    vok = tick_in[_O_VOK:_O_CTR] > 0
    centers = tick_in[_O_CTR:_O_RAD].reshape(_TIN_R, 3)
    radii = tick_in[_O_RAD:]
    body = _apply_transforms_wake(body, idx, pos, rot, lv, av, vok,
                                  centers, radii)
    char2, packed = _player_update_packed(
        char, body, static_world, move, jump, fly, sitting, dt, params,
        config, exclude)
    body2, sc, pc, events, diags = _ps(
        body, static_world, hull_cv, dt, params, config, solver_cache,
        pair_cache, rebuild_pairs=rebuild_pairs, has_oversize=has_oversize)
    digest = _digest_core(events, diags.num_contacts, diags.num_awake,
                          pc.steps_left)
    tblock = _tblock_core(body2)
    return body2, sc, pc, events, diags, char2, packed, digest, tblock


def _tblock_core(state: BodyState):
    return jnp.concatenate([
        state.pos.astype(jnp.float32), state.quat, state.linvel, state.angvel,
        state.underwater.astype(jnp.float32)[:, None],
    ], axis=1)


@jax.jit
def _transform_block(state: BodyState):
    """Pack the per-tick transform readback into one [N, 14] f32 array
    (pos3 | quat4 | linvel3 | angvel3 | underwater)."""
    return _tblock_core(state)


@partial(jax.jit, donate_argnums=(0,))
def _wake_in_regions(state: BodyState, centers, radii):
    """Wake every dynamic body whose bound sphere overlaps any of the K
    (center, radius) regions (+0.3 m slack for host-mirror staleness) —
    Jolt's activate-bodies-in-AABB on removeObject."""
    d2 = jnp.sum((state.pos[:, None, :] - centers[None]) ** 2, -1)   # [N, K]
    r = radii[None] + state.bound_radius[:, None] + 0.3
    hit = jnp.any(d2 <= r * r, axis=1) & state.alive & state.dynamic
    return state.replace(
        awake=state.awake | hit,
        sleep_timer=jnp.where(hit, 0.0, state.sleep_timer),
    )


_EVK = 64      # event-digest slots per class (wakes/sleeps/water)
_EVT = 128     # touching-pair slots in the digest


@jax.jit
def _event_digest(events, num_contacts, num_awake,
                  steps_left=np.int32(0)):  # np: no backend init at import
    """Pack everything the host reads per tick into ONE small i32 array.

    Remote TPU runtimes (the axon tunnel) charge ~10 ms latency per
    transfer, so N separate np.asarray() calls on event fields cost N round
    trips; this digest makes it exactly one.  Layout:
      [0:64]    newly-awake slots (-1 pad)
      [64:128]  newly-asleep slots
      [128:192] entered-water slots
      [192:196] counts: n_awake_events, n_asleep_events, n_water_events,
                n_touching_pairs  (if a count exceeds its slot budget the
                host falls back to a full readback for that step)
      [196:200] num_pairs, broadphase_overflow, num_contacts, num_awake
      [200:200+2*128] touching pair (a, b) interleaved (-1 pad)
      [-1]      pair_cache.steps_left after this step (the host schedules
                the next step's broadphase rebuild/reuse variant from it —
                identical timing to the old on-device lax.cond, which also
                read the value the previous step produced)
    """
    return _digest_core(events, num_contacts, num_awake, steps_left)


def _digest_core(events, num_contacts, num_awake, steps_left):
    up, = jnp.nonzero(events.newly_awake, size=_EVK, fill_value=-1)
    down, = jnp.nonzero(events.newly_asleep, size=_EVK, fill_value=-1)
    wet, = jnp.nonzero(events.entered_water, size=_EVK, fill_value=-1)
    touch, = jnp.nonzero(events.contact_touching, size=_EVT, fill_value=-1)
    tsafe = jnp.maximum(touch, 0)
    ta = jnp.where(touch >= 0, events.contact_pair_a[tsafe], -1)
    tb = jnp.where(touch >= 0, events.contact_pair_b[tsafe], -1)
    counts = jnp.stack([
        jnp.sum(events.newly_awake), jnp.sum(events.newly_asleep),
        jnp.sum(events.entered_water), jnp.sum(events.contact_touching),
        events.num_pairs, events.broadphase_overflow, num_contacts,
        num_awake,
    ]).astype(jnp.int32)
    pairs = jnp.stack([ta, tb], axis=1).reshape(-1)
    return jnp.concatenate([up.astype(jnp.int32), down.astype(jnp.int32),
                            wet.astype(jnp.int32), counts, pairs,
                            jnp.asarray(steps_left, jnp.int32)[None]])


@partial(jax.jit, donate_argnums=(0,))
def _scatter_velocities(state: BodyState, idx, linvel, angvel, awake):
    return state.replace(
        linvel=state.linvel.at[idx].set(linvel, mode="drop"),
        angvel=state.angvel.at[idx].set(angvel, mode="drop"),
        awake=state.awake.at[idx].set(awake, mode="drop"),
        sleep_timer=state.sleep_timer.at[idx].set(0.0, mode="drop"),
    )


@partial(jax.jit, donate_argnums=(0,))
def _scatter_transforms_wake(state: BodyState, idx, pos, rot, linvel, angvel,
                             vel_ok, centers, radii):
    """Transform-only host write + region wake in ONE device program.

    The serving tick's hot mutations (remote snapshot inserts, kinematic
    script moves) change pos/rot/vel only — the full 20-field
    _scatter_updates program plus a separate _wake_in_regions dispatch
    cost 2-4 extra device programs per tick on the remote runtime (~2 ms
    launch bubble each; the networked tick's dominant host cost).
    Velocities scatter only where the caller provided them (vel_ok):
    writing a possibly depth-stale mirror velocity would regress the
    device state in pipelined mode."""
    return _apply_transforms_wake(state, idx, pos, rot, linvel, angvel,
                                  vel_ok, centers, radii)


def _apply_transforms_wake(state: BodyState, idx, pos, rot, linvel, angvel,
                           vel_ok, centers, radii):
    cap = state.pos.shape[0]
    vidx = jnp.where(vel_ok, idx, cap)
    new = state.replace(
        pos=state.pos.at[idx].set(pos, mode="drop"),
        quat=state.quat.at[idx].set(rot, mode="drop"),
        linvel=state.linvel.at[vidx].set(linvel, mode="drop"),
        angvel=state.angvel.at[vidx].set(angvel, mode="drop"),
        awake=state.awake.at[idx].set(True, mode="drop"),
        sleep_timer=state.sleep_timer.at[idx].set(0.0, mode="drop"),
    )
    # Region wake (teleports vacate their old location: Jolt activates
    # bodies in the moved body's old AABB).
    d2 = jnp.sum((new.pos[:, None, :] - centers[None]) ** 2, -1)
    r = radii[None] + new.bound_radius[:, None] + 0.3
    hit = jnp.any(d2 <= r * r, axis=1) & new.alive & new.dynamic
    return new.replace(
        awake=new.awake | hit,
        sleep_timer=jnp.where(hit, 0.0, new.sleep_timer),
    )


class PhysicsWorld:
    """The engine-facing world object.  One instance per simulated world."""

    UPDATE_CHUNK = 256  # records per flush kernel call (padded)

    # Capacity-tier ladder: each tier quarters the pair/contact buffers.
    # A calm (mostly-sleeping) world steps on small buffers — gather/scatter
    # cost on TPU scales with buffer CAPACITY, not live count — and climbs
    # back instantly when an overflow counter fires (the prioritised
    # pair/contact dropping keeps the one climb step safe: only far
    # speculative rows are shed).  This is the host-side analogue of Jolt
    # removing sleeping islands from its active set.
    TIER_DIVS = (1, 4, 16)
    TIER_CALM_STEPS = 30          # consecutive calm steps before descending
    TIER_HEADROOM = 2             # live count must fit in half the next tier

    def __init__(self, config: SimConfig | None = None,
                 params: SimParams | None = None,
                 auto_tier: bool | None = None,
                 pin_all_shape_types: bool = False):
        import copy
        self.config = copy.copy(config) if config is not None else SimConfig()
        self._base_config = copy.copy(self.config)
        # Default: tier only LARGE worlds.  Small worlds step in well under
        # a millisecond anyway, and each tier is a separate XLA program —
        # auto-tiering everywhere tripled the test suite's compile count.
        if auto_tier is None:
            auto_tier = self.config.capacity >= 2048
        self.auto_tier = auto_tier
        self._tier = 0
        self._calm_steps = 0
        # Start with no shape types present; add_object grows this, so the
        # narrowphase only pays for shape combos that can actually occur.
        # Interactive clients can pin the full set instead
        # (pin_all_shape_types) to trade a longer first compile for ZERO
        # recompile hitches when streamed content introduces a new shape
        # type mid-session (~10 s stall per new type on CPU otherwise).
        if pin_all_shape_types:
            self.config.present_shape_types = (True, True, True, True)
        else:
            self.config.present_shape_types = (False, False, False, False)
        self.params = params or default_sim_params()
        self.state = zero_body_state(self.config.capacity)
        from substrata_tpu.physics import broadphase as broadphase_mod
        from substrata_tpu.physics import solver as solver_mod
        self.solver_cache = solver_mod.empty_solver_cache(
            solver_mod.cache_size_for(self.config))
        self.pair_cache = broadphase_mod.empty_pair_cache(self.config)
        self._cache_stale = False
        self._force_pair_rebuild = True   # host-side rebuild scheduling
        self._host_steps_left = 0
        self._wake_regions: list[tuple[np.ndarray, float]] = []
        self._world_asleep = False
        # Slots whose body diameter exceeds cell_size: while empty, the
        # broadphase oversize pass is compiled away (static has_oversize).
        self._oversize_slots: set[int] = set()
        # Static mesh instances (per-object world-space triangles) merged
        # into the device trimesh at flush; base mesh = world geometry.
        self._base_trimesh = None
        self._mesh_instances: dict[int, tuple] = {}
        self._next_mesh_instance = 1
        self._static_trimesh_dirty = False
        self.static_world = default_static_world(ground_z=-1e10)
        self.water_buoyancy_enabled = False
        self._water_z = -1e10

        self.objects: dict[int, PhysicsObject] = {}   # slot -> ob
        self._free = list(range(self.config.capacity - 1, -1, -1))
        self._dirty: dict[int, PhysicsObject] = {}
        self._vel_dirty: dict[int, PhysicsObject] = {}
        # Transform-only host writes (snapshot inserts, kinematic moves):
        # flushed by the light _scatter_transforms_wake program instead of
        # the 20-field full scatter.  slot -> (ob, has_velocity).
        self._xform_dirty: dict[int, tuple] = {}

        # Hull library staging (uploaded on flush when it grows).
        self._hulls = empty_hull_library()
        self._hull_contact_verts = jnp.zeros((64, 8, 3), jnp.float32)
        self._num_hulls = 0
        self._hulls_dirty = False

        # Activation sets (PhysicsWorld.h:195-198 activated_obs etc.).
        self.activated_obs: set[PhysicsObject] = set()
        self.newly_activated_obs: set[PhysicsObject] = set()
        self.event_listener: Any = None  # PhysicsWorldEventListener-like

        self.last_events = None
        self.last_diags = None
        self._steps = 0
        self._nonstatic_objs = None      # lazy [(slot, ob)] cache
        self._prev_sync_block = None     # changed-row filter (sync_transforms)
        self.last_sync_changed = None    # [N] bool; consumers skip unchanged
        self._next_virtual = self.config.capacity   # virtual anchor ids
        self._hull_ids: dict = {}        # content hash -> hull library id
        self._pending_tblock = None      # fused-tick transform block
        self._structural_dirty = False   # mutations that invalidate pairs

        # Pipelined readback mode (remote-runtime serving): see
        # runtime/readback.py.  depth=0 keeps every readback synchronous.
        self._digest_pipeline = None
        self._sync_pipeline = None
        self._pending_events: list = []
        self._mirror_skip: dict[int, int] = {}   # slot -> syncs to skip

    def set_pipelined(self, depth: int):
        """Enable depth-N pipelined readbacks (0 = synchronous).

        In pipelined mode the host consumes each step's event digest and
        transform block N steps late (their device->host copies start at
        dispatch, so by consume time they are local).  Host-side event
        bookkeeping (wake/sleep sets, listeners, tier switches) lags N
        steps — dwarfed by the 100 ms network dejitter delay the serving
        path already carries — and broadphase rebuilds run on the
        config.pair_rebuild_interval cadence instead of the device-reported
        window (mutation-driven invalidations still force rebuilds)."""
        from substrata_tpu.runtime.readback import PipelinedReadback
        if depth > 0:
            self._digest_pipeline = PipelinedReadback(depth)
            self._sync_pipeline = PipelinedReadback(depth)
        else:
            self._digest_pipeline = None
            self._sync_pipeline = None
        self._pending_events = []
        self._mirror_skip = {}

    # ------------------------------------------------------------------
    # Water (PhysicsWorld.h water_z / water_buoyancy_enabled)
    # ------------------------------------------------------------------
    @property
    def water_z(self):
        return self._water_z

    @water_z.setter
    def water_z(self, z):
        self._water_z = float(z)
        wz = jnp.float32(z if self.water_buoyancy_enabled else -1e10)
        self.params = self.params.replace(water_z=wz)
        self.static_world = self.static_world.replace(water_z=wz)

    def set_water_buoyancy_enabled(self, enabled: bool):
        self.water_buoyancy_enabled = bool(enabled)
        self.water_z = self._water_z

    # ------------------------------------------------------------------
    # Static environment
    # ------------------------------------------------------------------
    def set_heightfield(self, heights, origin, cell_w):
        h = np.asarray(heights, np.float32)
        # Constant heightfields compile the fast ground-plane paths (also
        # keeps snapshot round-trips of set_ground_plane worlds fast).
        hf = Heightfield(heights=jnp.asarray(h),
                         origin=jnp.asarray(origin, jnp.float32),
                         cell_w=jnp.float32(cell_w),
                         is_flat=bool(h.size) and bool(np.all(h == h.flat[0])))
        self.static_world = self.static_world.replace(
            heightfield=hf, has_heightfield=jnp.array(True))

    def set_ground_plane(self, z: float = 0.0):
        from substrata_tpu.physics.state import flat_heightfield
        self.static_world = self.static_world.replace(
            heightfield=flat_heightfield(z=z), has_heightfield=jnp.array(True))

    def set_static_trimesh(self, verts, tris, tri_mats=None):
        """Set the base (world) static trimesh; kept separate from per-object
        mesh instances, which are managed by add_static_mesh_instance."""
        self._base_trimesh = (np.asarray(verts, np.float32),
                              np.asarray(tris, np.int32),
                              None if tri_mats is None
                              else np.asarray(tri_mats, np.int32))
        self._rebuild_static_trimesh()

    def add_static_mesh_instance(self, verts, tris, tri_mats=None,
                                 owner_slot: int = -1) -> int:
        """Register one static mesh object's world-space triangles.

        Reference parity: each static mesh object becomes its own Jolt
        MeshShape body (PhysicsWorld.cpp:871-1000).  Here all instances are
        merged into the device trimesh (one grid, one kernel pass); each
        triangle carries its owner body slot so ray hits resolve back to
        the WorldObject.  The merged rebuild is deferred to the next
        _flush (one rebuild per tick however many objects stream in).
        Returns an instance id for remove_static_mesh_instance."""
        inst_id = self._next_mesh_instance
        self._next_mesh_instance += 1
        nt = len(tris)
        self._mesh_instances[inst_id] = (
            np.asarray(verts, np.float32), np.asarray(tris, np.int32),
            np.zeros((nt,), np.int32) if tri_mats is None
            else np.asarray(tri_mats, np.int32),
            int(owner_slot))
        self._static_trimesh_dirty = True
        return inst_id

    def remove_static_mesh_instance(self, inst_id: int):
        inst = self._mesh_instances.pop(inst_id, None)
        if inst is not None:
            self._static_trimesh_dirty = True
            # Wake sleeping bodies resting on the removed triangles (Jolt
            # activates bodies in a removed body's AABB).
            v = inst[0]
            if len(v):
                center = 0.5 * (v.min(axis=0) + v.max(axis=0))
                radius = float(np.linalg.norm(v.max(axis=0) - center))
                self._wake_regions.append((center, radius))

    def _rebuild_static_trimesh(self):
        from substrata_tpu.physics.state import build_trimesh, empty_trimesh
        self._static_trimesh_dirty = False
        parts = []
        if self._base_trimesh is not None:
            bv, bt, bm = self._base_trimesh
            parts.append((bv, bt,
                          np.zeros((len(bt),), np.int32) if bm is None else bm,
                          -1))
        parts.extend(self._mesh_instances.values())
        if not parts:
            self.static_world = self.static_world.replace(
                trimesh=empty_trimesh())
            return
        verts, tris, mats, owners = [], [], [], []
        off = 0
        for v, t, m, owner in parts:
            verts.append(v)
            tris.append(t + off)
            mats.append(m)
            owners.append(np.full((len(t),), owner, np.int32))
            off += len(v)
        self.static_world = self.static_world.replace(
            trimesh=build_trimesh(
                np.concatenate(verts), np.concatenate(tris),
                np.concatenate(mats), tri_owner=np.concatenate(owners)))

    # ------------------------------------------------------------------
    # Object management (PhysicsWorld.h addObject/removeObject)
    # ------------------------------------------------------------------
    def add_object(self, ob: PhysicsObject) -> PhysicsObject:
        if not self._free:
            raise RuntimeError(f"PhysicsWorld at capacity {self.config.capacity}")
        # Bake scale into the shape (reference re-decoration semantics).
        if not np.allclose(ob.scale, 1.0):
            ob.shape = shape_factories.scaled(ob.shape, ob.scale)
        if ob.shape.shape_type == int(ShapeType.HULL) and ob.shape.hull_verts is not None:
            ob.shape.params[0] = self._intern_hull(ob.shape)
        slot = self._free.pop()
        ob.slot = slot
        self.objects[slot] = ob
        self._nonstatic_objs = None
        self._structural_dirty = True
        self._note_host_write(slot)
        self._dirty[slot] = (ob, True)
        # Track which shape types exist (sticky — never shrinks, so jit
        # caches stay warm); absent combos get token narrowphase buckets.
        st = int(ob.shape.shape_type)
        if not self.config.present_shape_types[st]:
            import copy
            cfg = copy.copy(self.config)
            cfg.present_shape_types = tuple(
                p or (i == st) for i, p in enumerate(cfg.present_shape_types))
            self.config = cfg
        return ob

    def add_virtual_anchor(self, ob: PhysicsObject) -> PhysicsObject:
        """Identity-only anchor: an id in the VIRTUAL slot space
        (>= capacity) that can own static-trimesh triangles and resolve
        ray hits through self.objects, but consumes NO device body slot.
        Static mesh content collides via the merged trimesh; a real 0.05 m
        anchor body per static object made every capacity-proportional
        device pass (static-contact samples, broadphase grid, transform
        block) pay for ghosts — a 12k-object world needed a 12k-body
        device state for ~500 actual dynamic bodies."""
        vid = self._next_virtual
        self._next_virtual += 1
        ob.slot = vid
        self.objects[vid] = ob
        return ob

    def remove_object(self, ob: PhysicsObject):
        if ob.slot < 0:
            return
        if ob.slot >= self.config.capacity:      # virtual anchor
            self.objects.pop(ob.slot, None)
            ob.slot = -1
            return
        slot = ob.slot
        self.objects.pop(slot, None)
        self._nonstatic_objs = None
        self._structural_dirty = True
        self.activated_obs.discard(ob)
        dead = PhysicsObject(shape=shape_factories.make_sphere(1e-4))
        dead.slot = slot
        dead.collidable = False
        self._dirty[slot] = (dead, False)
        ob.slot = -1
        self._free.append(slot)
        # The solver's warm-start cache is keyed by (body slot, feature key)
        # and is updated in place on device — entries for this slot would
        # otherwise warm-start whatever body reuses it.
        self._cache_stale = True
        # Wake anything that was resting on the removed body.
        self._wake_regions.append((np.asarray(ob.pos, np.float32),
                                   float(ob.shape.bound_radius)))

    def _intern_hull(self, shape) -> int:
        # Content-addressed dedup (the reference shares physics shapes per
        # mesh URL, PhysicsWorld.cpp shape manager): a replicated world
        # instancing one model across hundreds of objects must intern ONE
        # hull, not one per object.
        import hashlib
        key = hashlib.sha1(
            np.ascontiguousarray(shape.hull_verts).tobytes()
            + (np.ascontiguousarray(shape.hull_planes).tobytes()
               if shape.hull_planes is not None else b"")
        ).digest()
        cached = self._hull_ids.get(key)
        if cached is not None:
            return cached
        if self._num_hulls >= self._hulls.capacity:
            raise RuntimeError("hull library full")
        h = self._num_hulls
        self._hull_ids[key] = h
        mv = self._hulls.max_verts
        v = shape.hull_verts[:mv]
        pad = np.zeros((mv, 3), np.float32)
        pad[: len(v)] = v
        if len(v) < mv:
            pad[len(v):] = v[0]
        mf = self._hulls.max_faces
        pl = (shape.hull_planes[:mf] if shape.hull_planes is not None
              else np.zeros((0, 4), np.float32))
        plpad = np.zeros((mf, 4), np.float32)
        plpad[: len(pl)] = pl
        self._hulls = self._hulls.replace(
            verts=self._hulls.verts.at[h].set(jnp.asarray(pad)),
            n_verts=self._hulls.n_verts.at[h].set(len(v)),
            planes=self._hulls.planes.at[h].set(jnp.asarray(plpad)),
            n_faces=self._hulls.n_faces.at[h].set(len(pl)),
        )
        self._hull_contact_verts = self._hull_contact_verts.at[h].set(
            jnp.asarray(shape.hull_contact_verts))
        self._hulls_dirty = True
        self._num_hulls += 1
        return h

    # ------------------------------------------------------------------
    # Transform setters (PhysicsWorld.cpp:546-722)
    # ------------------------------------------------------------------
    def set_new_ob_to_world_transform(self, ob: PhysicsObject, pos, rot,
                                      linvel=None, angvel=None, scale=None):
        if ob.slot >= self.config.capacity:      # virtual anchor: mirror only
            ob.pos = np.asarray(pos, np.float32)
            ob.rot = np.asarray(rot, np.float32)
            return
        old_pos = ob.pos
        old_vel = ob.linvel
        ob.pos = np.asarray(pos, np.float32)
        ob.rot = np.asarray(rot, np.float32)
        # Teleports must wake sleeping bodies resting on the OLD location
        # (Jolt activates bodies in a removed/moved body's AABB); small
        # continuous moves are covered by ordinary contact wake propagation.
        teleport = (np.linalg.norm(ob.pos - old_pos)
                    > 0.5 * ob.shape.bound_radius + 0.1)
        if teleport:
            self._wake_regions.append((old_pos, ob.shape.bound_radius))
        if linvel is not None:
            ob.linvel = np.asarray(linvel, np.float32)
        if angvel is not None:
            ob.angvel = np.asarray(angvel, np.float32)
        # Pair-cache impact: the rebuild margins
        # (broadphase._pairs_rebuild: 0.08 m base + speed-at-rebuild *
        # window * dt) budget each body's velocity-predicted travel over
        # the whole reuse window — so a snapshot insert that lands WITHIN
        # that envelope (a dejittered stream following the object's own
        # motion, the dominant serving-path case: 10 Hz snapshots of a
        # 3 m/s walker snap ~0.3 m along the budgeted path) keeps the
        # cached pairs valid.  Only snaps beyond base + the body's
        # budgeted travel (true teleports), or material speed-ups the
        # margins never budgeted, invalidate.
        window_travel = (float(np.linalg.norm(old_vel))
                         * self.config.pair_rebuild_interval / 60.0)
        if (np.linalg.norm(ob.pos - old_pos) > 0.08 + window_travel
                or (linvel is not None
                    and np.linalg.norm(ob.linvel)
                    > np.linalg.norm(old_vel) + 0.25)):
            self._structural_dirty = True
        self._note_host_write(ob.slot)
        if scale is not None and not np.allclose(scale, ob.scale):
            ob.scale = np.asarray(scale, np.float32)
            ob.shape = shape_factories.scaled(ob.shape, ob.scale)
            if ob.shape.shape_type == int(ShapeType.HULL) and ob.shape.hull_verts is not None:
                ob.shape.params[0] = self._intern_hull(ob.shape)
            self._dirty[ob.slot] = (ob, True)      # shape changed: full row
        else:
            # Transform-only (the dominant serving-path case: remote
            # snapshot inserts): light flush program.
            self._xform_dirty[ob.slot] = (ob, linvel is not None
                                          or angvel is not None)

    def set_new_ob_transforms_batch(self, obs, pos, rot, linvel, angvel):
        """Batched transform-only set_new_ob_to_world_transform for the
        snapshot-playback hot path (GUIClient.cpp:7459-7489 inserts
        ~N_dyn/6 snapshots per tick): ONE vectorized pass computes the
        teleport-wake and pair-invalidation tests for all K objects, then
        a tight mirror-update loop.  No scale/shape changes (remote
        playback never changes shapes); linvel/angvel always provided."""
        K = len(obs)
        if K == 0:
            return
        pos = np.asarray(pos, np.float32)
        rot = np.asarray(rot, np.float32)
        linvel = np.asarray(linvel, np.float32)
        angvel = np.asarray(angvel, np.float32)
        old_pos = np.stack([o.pos for o in obs])
        old_vel = np.stack([o.linvel for o in obs])
        brad = np.fromiter((o.shape.bound_radius for o in obs), np.float32, K)
        dist = np.linalg.norm(pos - old_pos, axis=1)
        teleport = dist > 0.5 * brad + 0.1
        window_travel = (np.linalg.norm(old_vel, axis=1)
                         * self.config.pair_rebuild_interval / 60.0)
        structural = ((dist > 0.08 + window_travel)
                      | (np.linalg.norm(linvel, axis=1)
                         > np.linalg.norm(old_vel, axis=1) + 0.25))
        if structural.any():
            self._structural_dirty = True
        for k in np.nonzero(teleport)[0]:
            self._wake_regions.append((old_pos[k].copy(), float(brad[k])))
        depth_skip = (self._sync_pipeline.depth + 1
                      if self._sync_pipeline is not None else None)
        cap = self.config.capacity
        xd = self._xform_dirty
        ms = self._mirror_skip
        for k, ob in enumerate(obs):
            ob.pos = pos[k]
            ob.rot = rot[k]
            ob.linvel = linvel[k]
            ob.angvel = angvel[k]
            s = ob.slot
            if s >= cap:           # virtual anchor: mirror only
                continue
            if depth_skip is not None:
                ms[s] = depth_skip
            xd[s] = (ob, True)

    def note_motion_type_changed(self, ob: PhysicsObject):
        """Callers that flip ob.motion_type directly (script attach makes
        an object kinematic) must invalidate the non-static mirror cache."""
        self._nonstatic_objs = None

    def _note_host_write(self, slot: int):
        """Pipelined mode: protect a host-written mirror from being
        regressed by stale in-flight transform blocks (see sync_transforms).
        Virtual anchors (slot >= capacity) have no device row to protect."""
        if self._sync_pipeline is not None and slot < self.config.capacity:
            self._mirror_skip[slot] = self._sync_pipeline.depth + 1

    def move_kinematic_object(self, ob: PhysicsObject, pos, rot, dt):
        """MoveKinematic parity (PhysicsWorld.cpp:707-722): set velocities so
        the body arrives at (pos, rot) after dt — contacts feel the motion."""
        pos = np.asarray(pos, np.float32)
        rot = np.asarray(rot, np.float32)
        # Continuous kinematic motion at steady speed is covered by the
        # rebuild margins (which budget speed-at-rebuild * dt per step);
        # invalidate on a jump beyond the per-step budget + the 8 cm base
        # slack, or when the platform speeds up materially (accelerating
        # from rest mid-window is NOT covered by margins built at rest).
        prev_speed = float(np.linalg.norm(ob.linvel))
        delta = float(np.linalg.norm(pos - ob.pos))
        ob.linvel = (pos - ob.pos) / max(dt, 1e-9)
        if (delta > prev_speed * dt + 0.08
                or float(np.linalg.norm(ob.linvel)) > prev_speed + 0.25):
            self._structural_dirty = True
        # Angular velocity from the delta quaternion rot * conj(ob.rot).
        # Pure host numpy: this runs once per scripted kinematic object per
        # tick, and a jnp round trip here cost ~3 device dispatches + a
        # readback PER OBJECT (~1,600/tick at 12k objects — the networked
        # tick was 0.7 s/tick of transfer latency before this).
        r, c = rot, ob.rot
        cx, cy, cz, cw = -c[0], -c[1], -c[2], c[3]
        dq = np.array([
            r[3] * cx + r[0] * cw + r[1] * cz - r[2] * cy,
            r[3] * cy - r[0] * cz + r[1] * cw + r[2] * cx,
            r[3] * cz + r[0] * cy - r[1] * cx + r[2] * cw,
            r[3] * cw - r[0] * cx - r[1] * cy - r[2] * cz], np.float32)
        if dq[3] < 0.0:
            dq = -dq
        sin_half = float(np.linalg.norm(dq[:3]))
        angle = 2.0 * math.atan2(sin_half, float(dq[3]))
        if sin_half < 1e-8:
            axis = np.array([1.0, 0.0, 0.0], np.float32)
        else:
            axis = dq[:3] / sin_half
        ob.angvel = axis * np.float32(angle / max(dt, 1e-9))
        ob.pos = pos
        ob.rot = rot
        self._note_host_write(ob.slot)
        self._xform_dirty[ob.slot] = (ob, True)

    def set_linear_and_angular_vel(self, ob: PhysicsObject, linvel, angvel,
                                   activate: bool = True):
        ob.linvel = np.asarray(linvel, np.float32)
        ob.angvel = np.asarray(angvel, np.float32)
        self._structural_dirty = True
        self._note_host_write(ob.slot)
        self._vel_dirty[ob.slot] = ob

    def activate_object(self, ob: PhysicsObject):
        self._vel_dirty[ob.slot] = ob

    # ------------------------------------------------------------------
    # Flush / think
    # ------------------------------------------------------------------
    def _flush(self, defer_xforms: bool = False):
        """Upload pending host mutations.  With ``defer_xforms`` the
        transform-only writes + wake regions are RETURNED (as (items,
        regions)) instead of dispatched when they fit the fused serving
        tick's input block — the caller packs them into the step program's
        single transfer; oversized batches fall back to the chunked
        scatter here."""
        deferred = None
        if self._static_trimesh_dirty:
            self._rebuild_static_trimesh()
            # New static geometry can sit under sleeping bodies; a rebuild
            # is rare (object stream-in / removal), so a full wake is fine.
            self.invalidate_pairs()
        if self._cache_stale:
            from substrata_tpu.physics import solver as solver_mod
            self.solver_cache = solver_mod.empty_solver_cache(
                solver_mod.cache_size_for(self.config))
            self._cache_stale = False
        if self._hulls_dirty:
            self.static_world = self.static_world.replace(hulls=self._hulls)
            self._hulls_dirty = False
        if self._dirty:
            items = list(self._dirty.items())
            self._dirty.clear()
            for s, (o, a) in items:
                if a and 2.0 * float(o.shape.bound_radius) > self.config.cell_size:
                    self._oversize_slots.add(s)
                else:
                    self._oversize_slots.discard(s)
            k = self.UPDATE_CHUNK
            for i in range(0, len(items), k):
                chunk = items[i:i + k]
                pad = k - len(chunk)
                recs = [(s, o) for s, (o, _alive) in chunk]
                idx = np.array([s for s, _ in recs] + [self.config.capacity] * pad, np.int32)

                def f(fn, shape, dtype=np.float32):
                    out = np.zeros((k,) + shape, dtype)
                    for j, (_, o) in enumerate(recs):
                        out[j] = fn(o)
                    return out

                alive = np.array([a for _, (_, a) in chunk] + [False] * pad)
                self.state = _scatter_updates(
                    self.state, jnp.asarray(idx),
                    jnp.asarray(f(lambda o: o.pos, (3,))),
                    jnp.asarray(f(lambda o: o.rot, (4,))),
                    jnp.asarray(f(lambda o: o.linvel, (3,))),
                    jnp.asarray(f(lambda o: o.angvel, (3,))),
                    jnp.asarray(f(lambda o: 0.0 if o.motion_type != int(MotionType.DYNAMIC)
                                 else o.shape.inv_mass, ())),
                    jnp.asarray(f(lambda o: o.shape.inv_inertia
                                 if o.motion_type == int(MotionType.DYNAMIC)
                                 else np.zeros(3), (3,))),
                    jnp.asarray(f(lambda o: o.friction, ())),
                    jnp.asarray(f(lambda o: o.restitution, ())),
                    jnp.asarray(f(lambda o: o.motion_type, (), np.int32)),
                    jnp.asarray(f(lambda o: (int(Layer.MOVING) if o.motion_type != int(MotionType.STATIC)
                                             else int(Layer.NON_MOVING)) if o.collidable
                                 else (int(Layer.MOVING_NON_COLLIDABLE)
                                       if o.motion_type != int(MotionType.STATIC)
                                       else int(Layer.NON_MOVING_NON_COLLIDABLE)), (), np.int32)),
                    jnp.asarray(f(lambda o: o.is_sensor, (), bool)),
                    jnp.asarray(f(lambda o: o.shape.shape_type, (), np.int32)),
                    jnp.asarray(f(lambda o: o.shape.params, (4,))),
                    jnp.asarray(alive),
                    jnp.asarray(f(lambda o: o.motion_type != int(MotionType.STATIC), (), bool)),
                    jnp.asarray(f(lambda o: o.gravity_factor, ())),
                    jnp.asarray(f(lambda o: o.use_zero_linear_drag, (), bool)),
                    jnp.asarray(f(lambda o: o.shape.bound_radius, ())),
                    jnp.asarray(f(lambda o: o.shape.volume, ())),
                )
        if self._xform_dirty or self._wake_regions:
            # Transform-only writes + teleport region wakes fused into ONE
            # device program per <=128-record chunk (the full scatter above
            # already carried any slot that also had a structural change).
            items = [(s, o, hv) for s, (o, hv) in self._xform_dirty.items()
                     if s not in self._dirty]
            self._xform_dirty.clear()
            regs = self._wake_regions
            self._wake_regions = []
            if (defer_xforms and len(items) <= _TIN_K
                    and len(regs) <= _TIN_R):
                deferred = (items, regs)
            else:
                k, RK = 128, 64
                for i in range(0, max(len(items), 1), k):
                    chunk = items[i:i + k]
                    pad = k - len(chunk)
                    idx = np.full((k,), self.config.capacity, np.int32)
                    pos = np.zeros((k, 3), np.float32)
                    rot = np.zeros((k, 4), np.float32)
                    lv = np.zeros((k, 3), np.float32)
                    av = np.zeros((k, 3), np.float32)
                    vok = np.zeros((k,), bool)
                    for j, (s, o, hv) in enumerate(chunk):
                        idx[j] = s
                        pos[j] = o.pos
                        rot[j] = o.rot
                        lv[j] = o.linvel
                        av[j] = o.angvel
                        vok[j] = hv
                    rchunk = regs[i // k * RK:(i // k + 1) * RK]
                    centers = np.zeros((RK, 3), np.float32)
                    radii = np.full((RK,), -1e9, np.float32)  # pad never matches
                    for j, (c, r) in enumerate(rchunk[:RK]):
                        centers[j] = c
                        radii[j] = r
                    self.state = _scatter_transforms_wake(
                        self.state, jnp.asarray(idx), jnp.asarray(pos),
                        jnp.asarray(rot), jnp.asarray(lv), jnp.asarray(av),
                        jnp.asarray(vok), jnp.asarray(centers),
                        jnp.asarray(radii))
                # Region overflow beyond the fused chunks (rare: mass removals).
                extra = regs[max((len(items) + k - 1) // k, 1) * RK:]
                for i in range(0, len(extra), 16):
                    chunk2 = extra[i:i + 16]
                    centers = np.zeros((16, 3), np.float32)
                    radii = np.full((16,), -1e9, np.float32)
                    for j, (c, r) in enumerate(chunk2):
                        centers[j] = c
                        radii[j] = r
                    self.state = _wake_in_regions(
                        self.state, jnp.asarray(centers), jnp.asarray(radii))
        if self._vel_dirty:
            items = list(self._vel_dirty.items())
            self._vel_dirty.clear()
            k = self.UPDATE_CHUNK
            for i in range(0, len(items), k):
                chunk = items[i:i + k]
                pad = k - len(chunk)
                idx = np.array([s for s, _ in chunk] + [self.config.capacity] * pad, np.int32)
                lv = np.zeros((k, 3), np.float32)
                av = np.zeros((k, 3), np.float32)
                for j, (_, o) in enumerate(chunk):
                    lv[j] = o.linvel
                    av[j] = o.angvel
                self.state = _scatter_velocities(
                    self.state, jnp.asarray(idx), jnp.asarray(lv), jnp.asarray(av),
                    jnp.ones((k,), bool))
        return deferred

    def invalidate_pairs(self):
        """Force a broadphase rebuild at the next step (call after external
        state mutations; _flush does this automatically)."""
        self._force_pair_rebuild = True
        self.pair_cache = self.pair_cache.replace(steps_left=jnp.int32(0))

    def _tier_config(self, tier: int) -> SimConfig:
        import copy
        cfg = copy.copy(self._base_config)
        cfg.present_shape_types = self.config.present_shape_types
        div = self.TIER_DIVS[tier]
        if div > 1:
            cfg.max_pairs = max(512, self._base_config.max_pairs // div)
            cfg.max_active_contacts = max(
                1024, self._base_config.max_active_contacts // div)
        return cfg

    def prewarm_tiers(self, player=None, dt: float = 1 / 60.0):
        """Compile every auto-tier step variant up front — the capacity-
        ladder analogue of pin_all_shape_types.  A mid-session tier switch
        otherwise hitches the tick by a full XLA compile (~10-50 s on a
        tunneled runtime); serving deployments call this once at load
        time, and the persistent compilation cache makes it one-time per
        configuration.  Uses throwaway device copies so the donated
        arguments never consume the live state."""
        if not self.auto_tier:
            return
        from substrata_tpu.physics import broadphase as broadphase_mod
        from substrata_tpu.physics import solver as solver_mod
        cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)   # noqa: E731
        for tier in range(len(self.TIER_DIVS)):
            cfg = self._tier_config(tier)
            sc0 = solver_mod.empty_solver_cache(solver_mod.cache_size_for(cfg))
            pc0 = broadphase_mod.empty_pair_cache(cfg)
            for rebuild in (True, False):
                if player is None:
                    _think_step(cp(self.state), self.static_world,
                                self._hull_contact_verts, jnp.float32(dt),
                                self.params, cfg, cp(sc0), cp(pc0), rebuild,
                                bool(self._oversize_slots))
                else:
                    # Serving clients tick through the fused serving-tick
                    # program only; compile just that ladder (the plain-
                    # step ladder compiles on demand if the session
                    # switches to vehicle driving).
                    buf = _empty_tick_in(cfg.capacity)
                    buf[0] = dt
                    buf[7:8].view(np.int32)[0] = player.proxy.slot
                    _serving_tick(
                        cp(self.state), self.static_world,
                        self._hull_contact_verts, self.params, cfg,
                        cp(sc0), cp(pc0), cp(player.state),
                        jnp.asarray(buf), rebuild,
                        bool(self._oversize_slots))

    def _switch_tier(self, tier: int):
        from substrata_tpu.physics import broadphase as broadphase_mod
        from substrata_tpu.physics import solver as solver_mod
        self._tier = tier
        self._calm_steps = 0
        self.config = self._tier_config(tier)
        # Buffer shapes changed: rebuild the caches (one warm-start-less
        # step; the pair cache rebuilds next step anyway).
        self.solver_cache = solver_mod.empty_solver_cache(
            solver_mod.cache_size_for(self.config))
        self.pair_cache = broadphase_mod.empty_pair_cache(self.config)
        self._force_pair_rebuild = True

    def think(self, dt: float):
        """One substep: PhysicsWorld::think parity (PhysicsWorld.cpp:1356-1442).

        The entire per-step host side costs ONE device->host transfer (the
        packed event digest): remote runtimes charge ~10 ms latency per
        transfer, so per-field event reads dominated the serving path at
        10k bodies (56 ms/step of round trips)."""
        had_mutations = bool(self._dirty or self._vel_dirty
                             or self._xform_dirty or self._wake_regions)
        # Fully-asleep worlds SKIP the device step outright: with zero awake
        # bodies nothing can change on device (sleeping bodies receive no
        # forces; any wake source — adds, moves, velocity writes, removals,
        # kinematic motion — goes through the host mutation paths checked
        # here).  An idle world costs its server nothing, like Jolt with an
        # empty active set.
        if self._world_asleep and not had_mutations and self._steps > 0:
            self.newly_activated_obs = set()
            self._steps += 1
            return self.last_events
        self._flush()
        if had_mutations:
            # Structural changes (adds/removals/teleports/velocity jumps)
            # invalidate the cached pair list; continuous moves are covered
            # by the speed-scaled rebuild margins and keep the reuse cadence.
            if self._structural_dirty:
                self.invalidate_pairs()
                self._structural_dirty = False
            self._world_asleep = False
        # Host-driven broadphase scheduling: pick the rebuild or reuse
        # compiled variant from the steps_left the previous step's digest
        # reported (the old on-device lax.cond read exactly the same value,
        # but cost ~2.5 ms/step of branch machinery + copies at 10k bodies
        # even on pure-reuse steps).
        rebuild = self._force_pair_rebuild or self._host_steps_left <= 0
        self._force_pair_rebuild = False
        (self.state, self.solver_cache, self.pair_cache, events,
         diags) = _think_step(
            self.state, self.static_world, self._hull_contact_verts,
            jnp.float32(dt), self.params, self.config, self.solver_cache,
            self.pair_cache, rebuild, bool(self._oversize_slots))
        self.last_events = events
        self.last_diags = diags
        self._steps += 1
        self._dispatch_digest(events, diags, rebuild)
        return events

    def _dispatch_digest(self, events, diags, rebuild,
                         extra=None, on_extra=None, digest_dev=None):
        """Shared tail of think()/think_with_player(): pack the event
        digest, then either read it synchronously or push it through the
        readback pipeline (consumed depth steps late).  ``extra`` rides the
        same pipeline entry (its async copy overlaps the digest's);
        ``on_extra(host_value)`` fires when it is consumed.  The fused
        serving tick computes the digest in-program and passes it via
        ``digest_dev``."""
        if digest_dev is None:
            digest_dev = _event_digest(events, diags.num_contacts,
                                       diags.num_awake,
                                       self.pair_cache.steps_left)
        if self._digest_pipeline is not None:
            # Pipelined: consume the digest dispatched depth steps ago;
            # rebuild cadence runs host-side on the config interval.
            self._host_steps_left = (self.config.pair_rebuild_interval - 1
                                     if rebuild else self._host_steps_left - 1)
            self._pending_events.append((events, on_extra))
            got = self._digest_pipeline.push((digest_dev, extra))
            if got is not None:
                dig, ex = got
                past_events, past_cb = self._pending_events.pop(0)
                # Fully-asleep only counts once every in-flight step has
                # confirmed zero awake bodies (no younger step can have
                # woken anything without a host mutation).
                self._world_asleep = (int(dig[199]) == 0
                                      and not self._pending_events)
                self._refresh_activation_sets(past_events, dig)
                if self.auto_tier:
                    self._update_tier_from_digest(dig)
                if past_cb is not None:
                    past_cb(ex)
            else:
                self.newly_activated_obs = set()
            return
        digest = np.asarray(digest_dev)
        self._host_steps_left = int(digest[-1])
        self._world_asleep = int(digest[199]) == 0
        self._refresh_activation_sets(events, digest)
        if self.auto_tier:
            self._update_tier_from_digest(digest)
        if on_extra is not None:
            on_extra(None if extra is None else np.asarray(extra))

    def think_with_player(self, dt: float, player, cur_time: float = 0.0):
        """think() with the player character update, the pending transform
        writes (snapshot playback, kinematic moves, teleport wakes), the
        event digest, and the transform readback block ALL FUSED into ONE
        device program consuming ONE packed host transfer (§3.1 order:
        host writes, player physics, then the world step —
        GUIClient.cpp:6418-6432).  The serving tick previously dispatched
        five programs plus ~12 small device_puts; on a tunneled remote
        runtime their per-call launch latency dominated the 12k-object
        networked tick.

        ``player`` is a physics.character.PlayerPhysics; its host mirrors
        are refreshed via the readback pipeline (depth ticks late in
        pipelined mode, synchronously otherwise)."""
        from substrata_tpu.physics.character import JUMP_PERIOD
        had_mutations = bool(self._dirty or self._vel_dirty
                             or self._xform_dirty or self._wake_regions)
        # No fully-asleep skip here: the player update must run every tick
        # (gravity, input) even over a sleeping world.
        deferred = self._flush(defer_xforms=True)
        if had_mutations:
            if self._structural_dirty:
                self.invalidate_pairs()
                self._structural_dirty = False
            self._world_asleep = False
        rebuild = self._force_pair_rebuild or self._host_steps_left <= 0
        self._force_pair_rebuild = False
        jump_req = (cur_time - player.last_jump_time) < JUMP_PERIOD
        buf = _empty_tick_in(self.config.capacity)
        buf[0] = dt
        buf[1:4] = player.move_desired_vel
        buf[4] = 1.0 if jump_req else 0.0
        buf[5] = 1.0 if player.fly_mode else 0.0
        buf[6] = 1.0 if player.sitting else 0.0
        buf[7:8].view(np.int32)[0] = player.proxy.slot
        if deferred is not None:
            items, regs = deferred
            idx_v = buf[_O_IDX:_O_POS].view(np.int32)
            pos_v = buf[_O_POS:_O_ROT].reshape(_TIN_K, 3)
            rot_v = buf[_O_ROT:_O_LV].reshape(_TIN_K, 4)
            lv_v = buf[_O_LV:_O_AV].reshape(_TIN_K, 3)
            av_v = buf[_O_AV:_O_VOK].reshape(_TIN_K, 3)
            vok_v = buf[_O_VOK:_O_CTR]
            for j, (s, o, hv) in enumerate(items):
                idx_v[j] = s
                pos_v[j] = o.pos
                rot_v[j] = o.rot
                lv_v[j] = o.linvel
                av_v[j] = o.angvel
                vok_v[j] = 1.0 if hv else 0.0
            ctr_v = buf[_O_CTR:_O_RAD].reshape(_TIN_R, 3)
            rad_v = buf[_O_RAD:]
            for j, (c, r) in enumerate(regs):
                ctr_v[j] = c
                rad_v[j] = r
        (self.state, self.solver_cache, self.pair_cache, events, diags,
         player.state, packed, digest_dev, tblock) = _serving_tick(
            self.state, self.static_world, self._hull_contact_verts,
            self.params, self.config, self.solver_cache, self.pair_cache,
            player.state, jnp.asarray(buf), rebuild,
            bool(self._oversize_slots))
        self._pending_tblock = tblock
        self.last_events = events
        self.last_diags = diags
        self._steps += 1
        self._dispatch_digest(events, diags, rebuild, extra=packed,
                              on_extra=player._consume_packed,
                              digest_dev=digest_dev)
        player.zero_move_desired_vel()
        # Kinematic proxy follows the last-known foot position every tick.
        self.move_kinematic_object(player.proxy, player._capsule_center(),
                                   player.proxy.rot, dt)
        return events

    def _refresh_activation_sets(self, events, digest=None):
        if digest is None:
            digest = np.asarray(_event_digest(events, jnp.int32(0),
                                              jnp.int32(1)))
        n_up, n_down, n_wet, n_touch = (int(digest[192]), int(digest[193]),
                                        int(digest[194]), int(digest[195]))
        # Fallback to full reads only when a digest class overflowed (rare:
        # >64 wakes in one step).
        if n_up > _EVK or n_down > _EVK:
            up = np.nonzero(np.asarray(events.newly_awake))[0]
            down = np.nonzero(np.asarray(events.newly_asleep))[0]
        else:
            up = digest[0:_EVK][:n_up]
            down = digest[_EVK:2 * _EVK][:n_down]
        self.newly_activated_obs = set()
        for slot in up:
            ob = self.objects.get(int(slot))
            if ob is not None:
                self.activated_obs.add(ob)
                self.newly_activated_obs.add(ob)
        for slot in down:
            ob = self.objects.get(int(slot))
            if ob is not None:
                self.activated_obs.discard(ob)
        if self.event_listener is not None:
            if n_wet > _EVK:
                wet = np.nonzero(np.asarray(events.entered_water))[0]
            else:
                wet = digest[2 * _EVK:3 * _EVK][:n_wet]
            for slot in wet:
                ob = self.objects.get(int(slot))
                if ob is not None and hasattr(self.event_listener,
                                              "physics_object_entered_water"):
                    self.event_listener.physics_object_entered_water(ob)
            if n_touch > 0 and hasattr(self.event_listener, "contact_added"):
                if n_touch > _EVT:
                    touching = np.asarray(events.contact_touching)
                    pa = np.asarray(events.contact_pair_a)
                    pb = np.asarray(events.contact_pair_b)
                    pairs = [(int(pa[i]), int(pb[i]))
                             for i in np.nonzero(touching)[0]]
                else:
                    tp = digest[200:200 + 2 * _EVT].reshape(_EVT, 2)[:n_touch]
                    pairs = [(int(a), int(b)) for a, b in tp]
                for sa, sb in pairs:
                    oa = self.objects.get(sa)
                    obj_b = self.objects.get(sb)
                    if oa is not None and obj_b is not None:
                        self.event_listener.contact_added(oa, obj_b)

    def _update_tier_from_digest(self, digest):
        over = int(digest[197])
        num_pairs = int(digest[196])
        num_contacts = int(digest[198])
        if over > 0:
            if self._tier > 0:
                self._switch_tier(0)   # climb straight to full capacity
            self._calm_steps = 0
            return
        nxt = self._tier + 1
        if nxt >= len(self.TIER_DIVS):
            return
        ncfg = self._tier_config(nxt)
        if (num_pairs * self.TIER_HEADROOM < ncfg.max_pairs
                and num_contacts * self.TIER_HEADROOM
                < ncfg.max_active_contacts):
            self._calm_steps += 1
            if self._calm_steps >= self.TIER_CALM_STEPS:
                self._switch_tier(nxt)
        else:
            self._calm_steps = 0

    # ------------------------------------------------------------------
    # Readback
    # ------------------------------------------------------------------
    def sync_transforms(self):
        """Pull pos/rot/vel of all alive bodies into the host mirrors — the
        activated-objects readback of the client tick (GUIClient.cpp:6576-6692),
        batched into ONE packed DMA (five per-field reads cost five remote
        round trips).

        Pipelined mode consumes the block dispatched depth steps ago;
        slots the host wrote since (adds, kinematic moves, snapshot
        inserts) are skipped until the pipeline catches up, so
        host-authoritative mirrors never regress to a stale device value.
        """
        # The fused serving tick already computed this step's block in-
        # program; dispatch the standalone pack only when think() ran
        # unfused (or no step ran since the last sync).
        block_dev, self._pending_tblock = (
            (self._pending_tblock, None) if self._pending_tblock is not None
            else (_transform_block(self.state), None))        # [N, 14]
        if self._sync_pipeline is not None:
            blk = self._sync_pipeline.push(block_dev)
            if blk is None:
                return
            block = blk
            if self._mirror_skip:
                for slot in list(self._mirror_skip):
                    left = self._mirror_skip[slot] - 1
                    if left <= 0:
                        del self._mirror_skip[slot]
                    else:
                        self._mirror_skip[slot] = left
        else:
            block = np.asarray(block_dev)
        pos = block[:, 0:3]
        rot = block[:, 3:7]
        lv = block[:, 7:10]
        av = block[:, 10:13]
        uw = block[:, 13]
        if self._nonstatic_objs is None:
            static = int(MotionType.STATIC)
            self._nonstatic_objs = [
                (slot, ob) for slot, ob in self.objects.items()
                if ob.motion_type != static]
        # CHANGED-ROW filter: sleeping bodies' rows are bit-identical
        # between ticks, so one vectorised [N,14] compare against the
        # previous block skips their per-object Python mirror writes — in
        # a mostly-settled serving world that's nearly all of them
        # (measured 2.1 ms/tick of mirror loop at 12k objects).  Slots the
        # host wrote since the block was dispatched stay "changed" so
        # their WorldObject mirrors track the host value immediately.
        if (self._prev_sync_block is not None
                and self._prev_sync_block.shape == block.shape):
            changed = (block != self._prev_sync_block).any(axis=1)
        else:
            changed = np.ones((block.shape[0],), bool)
        for slot in self._mirror_skip:
            changed[slot] = True
        self._prev_sync_block = block
        self.last_sync_changed = changed
        skip = self._mirror_skip
        for slot, ob in self._nonstatic_objs:
            if changed[slot] and slot not in skip:
                ob.pos = pos[slot]
                ob.rot = rot[slot]
                ob.linvel = lv[slot]
                ob.angvel = av[slot]
                ob.underwater = bool(uw[slot] > 0)

    def read_object_state(self, ob: PhysicsObject):
        """Synchronous LIVE device read of one body's (pos, rot, linvel,
        angvel) — for rare mid-tick consumers (shape reloads on content
        stream-in) that must not consume a pipelined sync entry: in
        pipelined mode sync_transforms() is depth-ticks stale and each call
        burns one pipeline slot, so a rebuilt body would inherit old state
        AND skew the per-tick pipeline cadence."""
        self._flush()
        blk = np.asarray(_transform_block(self.state)[ob.slot])
        return blk[0:3], blk[3:7], blk[7:10], blk[10:13]

    # ------------------------------------------------------------------
    # Queries (PhysicsWorld.cpp:1668-1725)
    # ------------------------------------------------------------------
    def trace_ray(self, origin, direction, max_t: float, n_steps: int = 16):
        """Single-ray traceRay; returns (hit, t, normal, ob, material)."""
        self._flush()
        hits = queries.trace_rays(
            jnp.asarray(np.asarray(origin, np.float32)[None]),
            jnp.asarray(np.asarray(direction, np.float32)[None]),
            jnp.asarray(np.array([max_t], np.float32)),
            self.state, self.static_world, self.config, n_steps=n_steps)
        hit = bool(np.asarray(hits.hit)[0])
        ob = self.objects.get(int(np.asarray(hits.body)[0]))
        return hit, float(np.asarray(hits.t)[0]), np.asarray(hits.normal)[0], ob, int(np.asarray(hits.material)[0])

    def trace_rays_batched(self, origins, dirs, max_ts, n_steps: int = 16):
        self._flush()
        return queries.trace_rays(
            jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(max_ts),
            self.state, self.static_world, self.config, n_steps=n_steps)

    def does_ray_hit_anything(self, origin, direction, max_t: float) -> bool:
        hit, *_ = self.trace_ray(origin, direction, max_t)
        return hit

    # ------------------------------------------------------------------
    # Diagnostics (PhysicsWorld.cpp:1529-1604)
    # ------------------------------------------------------------------
    def get_diagnostics(self) -> str:
        d = self.last_diags
        lines = [
            f"PhysicsWorld: {len(self.objects)}/{self.config.capacity} objects, "
            f"{self._num_hulls} hulls, steps={self._steps}",
        ]
        if d is not None:
            lines.append(
                f"  pairs={int(d.num_pairs)} contacts={int(d.num_contacts)} "
                f"awake={int(d.num_awake)} max_pen={float(d.max_penetration):.4f} "
                f"tier={self._tier} (pairs cap {self.config.max_pairs}, "
                f"contacts cap {self.config.max_active_contacts})")
        return "\n".join(lines)

    def total_memory_bytes(self) -> int:
        return sum(np.prod(v.shape) * v.dtype.itemsize
                   for v in jax.tree_util.tree_leaves(self.state))

    # ------------------------------------------------------------------
    # Checkpointing (writeJoltSnapshotToDisk parity, PhysicsWorld.cpp:1728-
    # 1739: the physics-engine state dump; here the SoA arrays ARE the
    # state, so the checkpoint is one npz of the BodyState + static world)
    # ------------------------------------------------------------------
    def save_snapshot(self, path: str):
        self._flush()
        arrays = {f"body_{k}": np.asarray(v)
                  for k, v in vars(self.state).items()}
        arrays["hf_heights"] = np.asarray(self.static_world.heightfield.heights)
        arrays["hf_origin"] = np.asarray(self.static_world.heightfield.origin)
        arrays["hf_cell_w"] = np.asarray(self.static_world.heightfield.cell_w)
        arrays["water_z"] = np.asarray(self.static_world.water_z)
        arrays["hull_verts"] = np.asarray(self._hulls.verts)
        arrays["hull_nverts"] = np.asarray(self._hulls.n_verts)
        arrays["hull_contact_verts"] = np.asarray(self._hull_contact_verts)
        np.savez_compressed(path, **arrays)

    def load_snapshot(self, path: str):
        """Restore device state (the host-side PhysicsObject mirrors must be
        re-registered by the caller; slot layout is preserved)."""
        data = np.load(path)
        fields = {k[5:]: jnp.asarray(v) for k, v in data.items()
                  if k.startswith("body_")}
        self.state = self.state.replace(**fields)
        self.set_heightfield(data["hf_heights"], data["hf_origin"],
                             float(data["hf_cell_w"]))
        self._hulls = self._hulls.replace(
            verts=jnp.asarray(data["hull_verts"]),
            n_verts=jnp.asarray(data["hull_nverts"]))
        self._hull_contact_verts = jnp.asarray(data["hull_contact_verts"])
        wz = float(data["water_z"])
        if wz > -1e9:
            self.water_buoyancy_enabled = True
            self.water_z = wz
