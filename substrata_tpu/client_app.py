"""ClientApp: the engine-agnostic client core — GUIClient's equivalent.

Orchestrates the per-tick loop of gui_client/GUIClient.cpp::timerEvent
(call-stack parity with SURVEY.md §3.1):

 1. reconnect check + script timer queue         (GUIClient.cpp:5926-5975)
 2. player input -> desired velocity             (6356-6358)
 3. physics substep loop at 60 Hz, cap 500       (6363-6510):
    a. path controllers (before player physics)  (6384-6396)
    b. moveTo/rotateTo controllers               (6399-6415)
    c. our vehicle OR player physics update      (6418-6430)
    d. physics_world.think(substep_dt)           (6432)
    e. player contact events -> ownership claims + onUserTouchedObject
       (0.5 s rate limit) + touch messages       (6435-6492)
    f. other avatars' vehicles replayed from input bitflags (6497-6506)
 4. terrain clamp: teleport player above ground  (6521-6539)
 5. vehicle Doppler factors                      (6542-6566)
 6. activated-objects readback -> render + audio transforms; owned dynamic
    objects marked dirty for snapshot send       (6576-6718)
 8. remote-object playback: dejittered physics snapshot insertion with
    smoothing, or interpolated transforms        (7390-7530)
 9. audio occlusion pass (one ray per audible source, 60 m cap)
                                                 (6970-7032)
10. head transform -> audio engine               (7035-7070)
11. winter script evaluation (batched)           (Scripting.cpp:735-880)
12. particles think                              (7705)
13. send pass: physics snapshots ~10 Hz + avatar transform updates
14. asset streaming (processLoading) + LOD checks (5071, 4373)

The app runs with or without a server connection (offline worlds).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

import numpy as np

from substrata_tpu.audio.engine import AudioEngine, AudioSource
from substrata_tpu.avatar_graphics import AvatarGraphicsManager, PoseConstraint
from substrata_tpu.net.snapshots import (
    OWNERSHIP_PERIOD, SEND_PERIOD, SnapshotRings,
)
from substrata_tpu.physics import shapes
from substrata_tpu.physics.character import EYE_HEIGHT, PlayerPhysics
from substrata_tpu.physics.particles import ParticleManager
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.terrain import TerrainScattering, TerrainSystem
from substrata_tpu.physics.vehicles import (
    BikePhysics, BoatPhysics, CarPhysics, HoverCarPhysics, VehicleManager,
    VehiclePhysicsInput, VEHICLE_BIKE, VEHICLE_BOAT, VEHICLE_CAR, VEHICLE_HOVER,
)
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld
from substrata_tpu.scripting import (
    ObjectPathController, ObjectScriptsEvaluator, ScriptVM, parse_xml_script,
)
from substrata_tpu.scripting.path_controller import ObjectMoveToController
from substrata_tpu.shared.voxel import make_mesh_for_voxel_group
from substrata_tpu.shared.world_object import ObjectType, WorldObject

SUBSTEP_DT = 1.0 / 60.0        # GUIClient.cpp:6365
MAX_SUBSTEPS = 500             # GUIClient.cpp:6368
TOUCH_EVENT_RATE_LIMIT = 0.5   # GUIClient.cpp touch rate limit
AUDIO_OCCLUSION_MAX_DIST = 60.0  # GUIClient.cpp:6987-6994
AUDIBLE_DIST = 100.0
RECONNECT_PERIOD = 10.0        # GUIClient.cpp:5927-5933


def _world_space_verts(verts: np.ndarray, pos, quat, scale) -> np.ndarray:
    """Object-space mesh verts -> world space (scale, rotate, translate) —
    the transform the reference bakes when creating a static MeshShape body
    (PhysicsWorld.cpp:871-919 scale decoration + body transform)."""
    v = np.asarray(verts, np.float32) * (np.asarray(scale, np.float32)
                                         * np.ones(3, np.float32))
    q = np.asarray(quat, np.float32)
    x, y, z, w = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    return v @ rot.T + np.asarray(pos, np.float32)


@dataclass
class PlayerInput:
    """Keyboard state per tick (PlayerPhysicsInput parity)."""

    forward: float = 0.0   # W/S
    right: float = 0.0     # D/A
    up: float = 0.0        # space / C
    run: bool = False      # shift
    jump: bool = False


class ClientApp:
    def __init__(self, client=None, config: SimConfig | None = None,
                 clock=time.monotonic, enable_audio: bool = True,
                 pin_all_shape_types: bool = False,
                 pipeline_depth: int = 0):
        self.client = client                  # net.client.Client or None
        self.clock = clock
        # pin_all_shape_types: interactive sessions can pre-pay the full
        # narrowphase compile so streamed content introducing a new shape
        # type never hitches the tick with a recompile.
        self.physics_world = PhysicsWorld(config or SimConfig(
            capacity=16_384 // 2, max_pairs=16_384, grid_dim=96, cell_size=4.0),
            pin_all_shape_types=pin_all_shape_types)
        self.physics_world.set_ground_plane(0.0)
        self.terrain = TerrainSystem(self.physics_world)
        self.scattering = TerrainScattering(self.terrain)
        self.particles = ParticleManager(self.physics_world)
        self.audio = AudioEngine() if enable_audio else None
        self.player = PlayerPhysics(self.physics_world, eye_pos=(0, 0, EYE_HEIGHT))
        # Pipelined readbacks (runtime/readback.py): on remote TPU runtimes
        # every synchronous device->host read costs the tunnel round trip
        # (~40-55 ms measured), so the serving tick consumes step results
        # depth ticks late instead (render/replication mirrors only — the
        # on-device sim state stays exact).  depth=0 keeps everything
        # synchronous (the default; tests and offline tools use this).
        self.pipeline_depth = int(pipeline_depth)
        if self.pipeline_depth > 0:
            self.physics_world.set_pipelined(self.pipeline_depth)
            self.player.set_pipelined(self.pipeline_depth)
        self.vehicles = VehicleManager(self.physics_world)
        self.avatar_graphics = AvatarGraphicsManager()
        self.script_vm = ScriptVM(world_interface=self._world_iface(), clock=clock)
        self.scripts = ObjectScriptsEvaluator()

        self.objects: dict[int, WorldObject] = {}   # uid -> WorldObject (world replica)
        self.path_controllers: list[ObjectPathController] = []
        self.move_to_controllers: list[ObjectMoveToController] = []
        self.vehicle_controllers: dict[int, object] = {}  # ob uid -> controller
        self.driven_vehicle_uid: int = 0
        self.cur_seat_index: int = 0

        # Asset streaming: content-addressed resource bytes + the
        # distance-prioritised download queue (LoadItemQueue /
        # ProximityLoader parity, GUIClient.cpp:5071 processLoading).
        from substrata_tpu.loading import LoadItemQueue
        self.resources: dict[str, bytes] = {}
        self.load_queue = LoadItemQueue()
        self.downloads_per_tick = 2
        # Async download machinery: fetches run on daemon threads (the
        # reference's DownloadResourcesThread), results drain on the tick
        # thread so physics-world mutation stays single-threaded.
        import threading
        self._dl_lock = threading.Lock()
        self._dl_done: list[tuple[str, bytes | None]] = []
        self._dl_inflight: set[str] = set()
        self._dl_failed: set[str] = set()

        # Portal traversal + sub:// navigation (GUIClient visitSubURL).
        self._touched_portal_target_url = ""
        self.navigation_stack: list[str] = []
        self.server_hostname = "localhost"
        self.server_worldname = ""
        self.cam_heading_deg = 0.0
        # Seam for cross-server portal travel: callable(SubURL) -> None.
        # Same-host/world portals teleport in place; different targets
        # need a new connection, which the embedding frontend owns.
        self.portal_connect_hook = None

        # Per-tick object-scan caches: lists rebuilt only when membership
        # or motion types change (a 12k-object world pays ~30 ms/tick just
        # iterating every object otherwise).
        self._nonstatic_wobs: list | None = None
        self._dyn_playback: list | None = None
        self._snapshot_dirty: list = []

        self._time_accum = 0.0
        self._last_touch_event_time: dict[int, float] = {}
        self._last_snapshot_send = 0.0
        self._last_avatar_send = 0.0
        self._next_local_uid = 1 << 40      # offline-mode uid space
        self.reconnect_factory = None       # callable() -> Client
        self._last_reconnect_attempt = 0.0
        self.cam_pos = np.array([0, 0, EYE_HEIGHT, 1], np.float32)
        self.last_physics_sim_time = 0.0    # diagnostics (GUIClient.cpp:6509)
        self.phase_ms: dict[str, float] = {}  # per-phase tick attribution
        self.log_messages: list[str] = []

    def _world_iface(self):
        app = self

        class _W:
            @property
            def objects(self):
                return app.objects

        return _W()

    def log(self, msg: str):
        """logMessage parity (GUIClient.cpp:3950-3975)."""
        self.log_messages.append(msg)

    # ------------------------------------------------------------------
    # World-state / object lifecycle
    # ------------------------------------------------------------------
    @property
    def world_state(self):
        return self.client.world_state if self.client is not None else None

    def _invalidate_object_caches(self):
        self._nonstatic_wobs = None
        self._dyn_playback = None

    def create_object(self, ob: WorldObject) -> WorldObject:
        """Local object creation; sends ObjectCreated when connected."""
        if ob.uid == 0:
            ob.uid = self._next_local_uid
            self._next_local_uid += 1
        self.objects[ob.uid] = ob
        self._invalidate_object_caches()
        self._load_object(ob)
        if self.client is not None:
            self.client.send_create_object(ob)
        return ob

    def _object_mesh(self, ob: WorldObject):
        """Decode the object's actual geometry: voxel groups via the greedy
        mesher, model_url content via the per-format decoders
        (bmesh/glTF/GLB/VRM/OBJ/STL/VOX — ModelLoading.cpp dispatch parity,
        shared/model_formats.py) once its bytes are in the resource store.
        Returns (verts, tris, tri_mats) in object space, or None while
        content is unavailable."""
        if ob.object_type == int(ObjectType.VOXEL_GROUP) and ob.voxel_data:
            return make_mesh_for_voxel_group(ob.voxel_data)
        if ob.model_url:
            data = self.resources.get(ob.model_url)
            if data is not None:
                try:
                    from substrata_tpu.shared.model_formats import decode_model
                    return decode_model(ob.model_url, data)
                except Exception as e:
                    self.log(f"model decode failed for {ob.model_url}: {e}")
        return None

    def _load_physics_for_object(self, ob: WorldObject):
        """Build the physics representation from the object's real content
        (PhysicsWorld.cpp:871-1083 factory semantics): dynamic objects get a
        convex hull of the decoded mesh, static mesh/voxel objects feed
        their world-space triangles into the merged static trimesh (each
        triangle tagged with the owner slot, like the reference's
        one-Jolt-body-per-static-mesh).  While the model is still
        streaming in, a placeholder 0.5 m cube stands in (ModelLoading's
        placeholder-cube behaviour) and the object is queued for reload."""
        mesh = self._object_mesh(ob)
        placeholder = False
        static_mesh = None
        if mesh is not None and len(mesh[0]) >= 3:
            verts, tris, tmats = mesh
            if ob.is_dynamic():
                shape = shapes.make_convex_hull(verts, mass=ob.mass)
            else:
                # Static: tiny non-collidable anchor body carries identity
                # (ownership, scripts, ray-hit resolution); the triangles
                # collide via the static trimesh.
                shape = shapes.make_box([0.05, 0.05, 0.05])
                static_mesh = (verts, tris, tmats)
        else:
            shape = shapes.make_box([0.5, 0.5, 0.5], mass=ob.mass)
            placeholder = ob.model_url != "" and \
                ob.object_type != int(ObjectType.VOXEL_GROUP)
        # Hulls simulate in their COM/principal frame; compose the authored
        # mesh pose into the body pose (Jolt COM-offset decoration parity,
        # PhysicsWorld.cpp:1138-1152).
        body_pos, body_rot = shape.body_pose_from_mesh(ob.pos, ob.quat)
        phys = PhysicsObject(
            shape=shape,
            pos=body_pos,
            rot=body_rot,
            scale=np.asarray(ob.scale, np.float32),
            motion_type=int(MotionType.DYNAMIC) if ob.is_dynamic()
            else int(MotionType.STATIC),
            friction=ob.friction, restitution=ob.restitution,
            collidable=ob.is_collidable() and static_mesh is None,
            userdata=ob)
        if static_mesh is not None:
            # Static mesh content collides via the merged trimesh; the
            # object's identity (ownership, scripts, ray-hit resolution)
            # lives on a VIRTUAL anchor that consumes no device body slot
            # — a 12k-object world needs device capacity only for its
            # actual dynamic bodies (world.add_virtual_anchor).
            ob.physics_object = self.physics_world.add_virtual_anchor(phys)
        else:
            ob.physics_object = self.physics_world.add_object(phys)
        if static_mesh is not None and ob.is_collidable():
            wverts = _world_space_verts(static_mesh[0], ob.pos, ob.quat,
                                        ob.scale)
            ob.mesh_instance_id = self.physics_world.add_static_mesh_instance(
                wverts, static_mesh[1], static_mesh[2],
                owner_slot=phys.slot)
        if placeholder:
            self._queue_model_download(ob)

    def _queue_model_download(self, ob: WorldObject):
        if self.client is None or not ob.model_url:
            return
        self.load_queue.enqueue(ob.model_url, np.asarray(ob.pos, np.float32),
                                ob.model_url)

    def provide_resource(self, url: str, data: bytes):
        """Insert resource bytes (downloaded or local) and rebuild the
        physics shapes of every object waiting on them."""
        self.resources[url] = data
        for ob in list(self.objects.values()):
            if ob.model_url == url:
                self._reload_object_shape(ob)

    def _reload_object_shape(self, ob: WorldObject):
        """Replace the placeholder shape once the model arrived, preserving
        the live dynamic state."""
        old = ob.physics_object
        pos, vel, angvel = ob.pos, None, None
        if old is not None:
            if old.motion_type == int(MotionType.DYNAMIC):
                # LIVE single-slot read: in pipelined mode sync_transforms()
                # is depth-ticks stale and consumes a pipeline entry (the
                # rebuilt body would inherit old pos/vel and skew the
                # per-tick sync cadence).
                bpos, brot, blv, bav = \
                    self.physics_world.read_object_state(old)
                mesh_pos, _ = old.shape.mesh_pose_from_body(bpos, brot)
                pos, vel, angvel = mesh_pos, blv, bav
            self.physics_world.remove_object(old)
        if getattr(ob, "mesh_instance_id", None) is not None:
            self.physics_world.remove_static_mesh_instance(ob.mesh_instance_id)
            ob.mesh_instance_id = None
        ob.pos = np.asarray(pos, np.float32)
        self._invalidate_object_caches()
        self._load_physics_for_object(ob)
        if vel is not None and ob.physics_object is not None:
            self.physics_world.set_linear_and_angular_vel(
                ob.physics_object, vel, angvel)

    def _load_object(self, ob: WorldObject):
        """loadModelForObject / loadAudioForObject / loadScriptForObject
        parity (GUIClient.cpp:2211, 3767): build the physics shape + audio
        source + scripts for a world object."""
        self._load_physics_for_object(ob)

        # --- Audio ---
        if ob.audio_source_url and self.audio is not None:
            try:
                offlen = self.audio.get_or_load_sound_file(ob.audio_source_url)
                src = AudioSource(pos=np.asarray(ob.pos, np.float32),
                                  volume=ob.audio_volume, looping=True,
                                  remove_on_finish=False)
                ob.audio_source = self.audio.add_source(src, sound=offlen)
            except (FileNotFoundError, NotImplementedError, ValueError) as e:
                self.log(f"audio load failed for {ob.audio_source_url}: {e}")

        # --- Scripts ---
        if ob.script:
            self._load_script(ob)

    def _load_script(self, ob: WorldObject):
        if ob.script.lstrip().startswith("<"):
            try:
                spec = parse_xml_script(ob.script)
            except Exception as e:
                self.log(f"script parse error on {ob.uid}: {e}")
                return
            fp = spec.get("follow_path")
            if fp is not None and ob.physics_object is not None:
                ob.physics_object.motion_type = int(MotionType.KINEMATIC)
                self.physics_world.note_motion_type_changed(ob.physics_object)
                self._invalidate_object_caches()
                self.physics_world._dirty[ob.physics_object.slot] = (ob.physics_object, True)
                pc = ObjectPathController(
                    ob.physics_object, fp["waypoints"],
                    follow_ob_uid=fp["follow_ob_uid"],
                    follow_dist=fp["follow_dist"],
                    orient_along_path=fp["orient_along_path"])
                pc.world_object = ob
                self.path_controllers.append(pc)
                self.path_controllers = ObjectPathController.sort_path_controllers(
                    self.path_controllers)
            v = spec.get("vehicle")
            if v is not None and ob.physics_object is not None:
                cls = {VEHICLE_CAR: CarPhysics, VEHICLE_BIKE: BikePhysics,
                       VEHICLE_BOAT: BoatPhysics, VEHICLE_HOVER: HoverCarPhysics}[
                    v.vehicle_type]
                ctrl = cls(self.vehicles, ob.physics_object, v)
                ctrl.world_object = ob
                ob.vehicle_physics = ctrl
                self.vehicle_controllers[ob.uid] = ctrl
        elif "evalRotation" in ob.script or "evalTranslation" in ob.script:
            try:
                self.scripts.add(ob, ob.script)
                if ob.physics_object is not None:
                    ob.physics_object.motion_type = int(MotionType.KINEMATIC)
                    self.physics_world.note_motion_type_changed(ob.physics_object)
                    self._invalidate_object_caches()
                    self.physics_world._dirty[ob.physics_object.slot] = (ob.physics_object, True)
            except Exception as e:
                self.log(f"winter script error on {ob.uid}: {e}")
        else:
            try:
                self.script_vm.run_script(ob.script, this_object=ob)
            except Exception as e:
                self.log(f"user script error on {ob.uid}: {e}")

    def remove_object(self, ob: WorldObject):
        self.objects.pop(ob.uid, None)
        self._invalidate_object_caches()
        if ob.physics_object is not None:
            self.physics_world.remove_object(ob.physics_object)
        if ob.mesh_instance_id is not None:
            self.physics_world.remove_static_mesh_instance(ob.mesh_instance_id)
            ob.mesh_instance_id = None
        if ob.model_url:
            self.load_queue.cancel(ob.model_url)
        if ob.audio_source is not None and self.audio is not None:
            self.audio.remove_source(ob.audio_source)
        self.scripts.remove(ob)
        self.path_controllers = [p for p in self.path_controllers
                                 if getattr(p, "world_object", None) is not ob]
        ctrl = self.vehicle_controllers.pop(ob.uid, None)
        if ctrl is not None:
            self.vehicles.remove(ctrl)

    # ------------------------------------------------------------------
    # Vehicles: enter/exit (GUIClient seat logic)
    # ------------------------------------------------------------------
    def enter_vehicle(self, ob_uid: int, seat_index: int = 0):
        ctrl = self.vehicle_controllers.get(ob_uid)
        if ctrl is None:
            return False
        self.driven_vehicle_uid = ob_uid
        self.cur_seat_index = seat_index
        ctrl.player_entered(seat_index)
        # The driver takes physics ownership of the vehicle on entry
        # (GUIClient takePhysicsOwnershipOfObject on vehicle enter).
        ob = self.objects.get(ob_uid)
        if seat_index == 0 and self.client is not None and ob is not None:
            ws = self.world_state
            gt = ws.global_time()
            slot = ws.slot_for(ob_uid)
            if ws.ownership.try_claim(slot, self.client.avatar_uid, gt):
                ob.physics_owner_id = self.client.avatar_uid
                ob.last_physics_ownership_change_global_time = gt
                self.client.send_ownership_taken(ob_uid, gt)
        return True

    def exit_vehicle(self):
        ctrl = self.vehicle_controllers.get(self.driven_vehicle_uid)
        if ctrl is not None:
            ctrl.player_exited()
            # Place the player beside the vehicle.
            ob = self.objects.get(self.driven_vehicle_uid)
            if ob is not None:
                self.player.set_position(
                    np.asarray(ob.pos, np.float32) + np.array([1.5, 0, 1.5 + EYE_HEIGHT]))
        self.driven_vehicle_uid = 0

    # ------------------------------------------------------------------
    # THE TICK (timerEvent parity)
    # ------------------------------------------------------------------
    def timer_event(self, dt: float, inp: PlayerInput | None = None):
        inp = inp or PlayerInput()
        # Per-phase wall-time attribution (DiagnosticsWidget analogue,
        # gui_client diagnostics pane): refreshed every tick, ~µs overhead.
        phase_ms: dict[str, float] = {}
        _t_mark = time.perf_counter()

        def mark(name):
            nonlocal _t_mark
            t = time.perf_counter()
            phase_ms[name] = phase_ms.get(name, 0.0) + (t - _t_mark) * 1e3
            _t_mark = t

        now = self.clock()
        global_time = (self.world_state.global_time()
                       if self.world_state is not None else now)

        # 1. Reconnect check (every 10 s when disconnected,
        # GUIClient.cpp:5927-5933) + script timers + incoming network events.
        if (self.client is not None and not self.client.connected
                and self.reconnect_factory is not None
                and now - self._last_reconnect_attempt > RECONNECT_PERIOD):
            self._last_reconnect_attempt = now
            try:
                self.client = self.reconnect_factory()
                self.log("reconnected")
            except OSError as e:
                self.log(f"reconnect failed: {e}")
        self.script_vm.update(now)
        if self.client is not None:
            self._apply_network_events()
        mark("events")

        # 2. Player input -> desired velocity (camera-relative simplified to
        #    world axes; a CameraController hook can replace this).
        move = np.array([inp.right, inp.forward, inp.up], np.float32)
        driving = self.driven_vehicle_uid != 0

        # 3. Substep loop.
        n_sub = min(max(1, math.ceil(dt / SUBSTEP_DT)), MAX_SUBSTEPS)
        sub_dt = dt / n_sub
        t_phys0 = time.perf_counter()
        for _ in range(n_sub):
            # a. path controllers first (platform velocities fresh).
            for pc in self.path_controllers:
                pc.update(self.physics_world, sub_dt, world_state=self)
            # b. moveTo controllers.
            self.move_to_controllers = [m for m in self.move_to_controllers
                                        if not m.done]
            for mc in self.move_to_controllers:
                mc.update(self.physics_world, sub_dt)
            # c. vehicle we drive OR player physics.
            if driving:
                ctrl = self.vehicle_controllers.get(self.driven_vehicle_uid)
                if ctrl is not None:
                    ctrl.update(VehiclePhysicsInput(
                        forward=inp.forward, right=inp.right, up=inp.up))
            # f. vehicles driven by OTHER avatars replayed from their last
            #    input bitflags (GUIClient.cpp:6497-6506).
            if self.client is not None:
                my_uid = self.client.avatar_uid
                with self.world_state.lock:
                    riders = [(av.entered_vehicle_uid,
                               av.last_physics_input_bitflags)
                              for av in self.world_state.avatars.values()
                              if av.uid != my_uid and av.entered_vehicle_uid
                              and av.vehicle_seat_index == 0]
                for veh_uid, bitflags in riders:
                    rctrl = self.vehicle_controllers.get(veh_uid)
                    if rctrl is not None and veh_uid != self.driven_vehicle_uid:
                        self.vehicles.set_active(rctrl.index, True)
                        rctrl.update(VehiclePhysicsInput.from_bitflags(bitflags))
            if not driving:
                if np.any(move != 0):
                    self.player.process_move(move, runpressed=inp.run)
                if inp.jump:
                    self.player.process_jump(now)
                    inp.jump = False
            mark("controllers")
            self.vehicles.update(sub_dt)
            mark("vehicles")
            if not driving and self.pipeline_depth > 0:
                # Serving mode: player update + world step fused into ONE
                # device program, results consumed via the readback
                # pipeline (world.think_with_player).
                mark("player")
                self.physics_world.think_with_player(
                    sub_dt, self.player, cur_time=now)
                self.cam_pos = self.player._last_campos.copy()
                mark("think")
            else:
                if not driving:
                    campos, jumped = self.player.update(sub_dt, cur_time=now)
                    self.cam_pos = campos
                mark("player")
                # d. world step.
                self.physics_world.think(sub_dt)
                mark("think")
            # e. player contact events -> ownership claims + touch events.
            self._process_player_contacts(global_time, now)
            mark("contacts")
        self.last_physics_sim_time = time.perf_counter() - t_phys0

        # 3f. Portal traversal (GUIClient.cpp:6514-6516): handle the URL a
        # portal contact recorded, outside the substep loop.
        if self._touched_portal_target_url:
            url, self._touched_portal_target_url = \
                self._touched_portal_target_url, ""
            if url.startswith("sub://"):
                self.visit_sub_url(url, push_cur_url_on_nav_stack=True,
                                   adjust_cur_url_pos_back=True)

        # 4. Terrain clamp (GUIClient.cpp:6521-6539).
        if not driving and self.terrain.heightfield is not None:
            eye = self.player.get_eye_position()
            ground = self.terrain.eval_terrain_height(float(eye[0]), float(eye[1]))
            if eye[2] - EYE_HEIGHT < ground - 0.5:
                self.player.set_position([eye[0], eye[1], ground + 0.3 + EYE_HEIGHT])

        # 5-6. Readback: sync transforms of awake bodies to world objects +
        # audio sources; owned dynamic objects stage snapshots.
        _t_mark = time.perf_counter()
        self.physics_world.sync_transforms()
        mark("sync_transforms")
        self._readback_active_objects(global_time)
        mark("readback")

        # Camera from the driven vehicle seat.
        if driving:
            ob = self.objects.get(self.driven_vehicle_uid)
            if ob is not None and ob.physics_object is not None:
                p = ob.physics_object.pos
                self.cam_pos = np.array([p[0], p[1], p[2] + 1.2, 1], np.float32)

        # 7. Avatar graphics: per-avatar animation state machines + ONE
        # batched skeletal pose evaluation for every remote avatar
        # (updateAvatarGraphics, GUIClient.cpp:8235 ->
        # AvatarGraphics::setOverallTransform -> anim/pose.py kernel).
        if self.client is not None:
            self._update_avatar_graphics(dt)
        mark("avatars")

        # 8. Remote playback (snapshot insertion / interpolation).
        if self.client is not None:
            self._remote_object_playback(global_time, dt)
        mark("playback")

        # 9-10. Audio occlusion + head transform.
        if self.audio is not None:
            self._audio_occlusion_pass()
            yaw = 0.0
            self.audio.set_head_transform(
                self.cam_pos[:3],
                np.array([0, 0, math.sin(yaw / 2), math.cos(yaw / 2)], np.float32),
                vel=self.player.get_velocity())
        mark("audio")

        # 11. Winter scripts (batched) drive kinematic transforms.
        if self.scripts.scripted:
            for ob, rots, trans in self.scripts.evaluate(global_time):
                phys = ob.physics_object
                if phys is not None and phys.slot >= 0:
                    axis_angle = rots[0]
                    angle = float(np.linalg.norm(axis_angle))
                    if angle > 1e-9:
                        axis = axis_angle / angle
                        rot = np.concatenate([axis * math.sin(angle / 2),
                                              [math.cos(angle / 2)]]).astype(np.float32)
                    else:
                        rot = np.array([0, 0, 0, 1], np.float32)
                    pos = np.asarray(ob.pos, np.float32) + trans[0]
                    self.physics_world.move_kinematic_object(phys, pos, rot, dt)
        mark("scripts")

        # 12. Particles.
        self.particles.think(dt)
        mark("particles")

        # 13. Send pass (~10 Hz physics snapshots, WorldObject send period).
        if self.client is not None and now - self._last_snapshot_send >= SEND_PERIOD:
            self._last_snapshot_send = now
            self._send_dirty_snapshots(global_time)
            eye = self.cam_pos
            bitflags = VehiclePhysicsInput(
                forward=inp.forward, right=inp.right,
                up=inp.up).to_bitflags() if driving else 0
            self.client.send_avatar_transform(
                [float(eye[0]), float(eye[1]), float(eye[2])],
                [0.0, 0.0, 0.0], anim_state=0,
                vehicle_uid=self.driven_vehicle_uid,
                seat=self.cur_seat_index, input_bitflags=bitflags)
        mark("send")

        # 14. Terrain/scatter/asset streaming around the camera
        #     (processLoading parity: closest-first downloads, a bounded
        #     number per tick).
        self.terrain.update_campos(self.cam_pos)
        self.scattering.update_campos(self.cam_pos)
        self.load_queue.update_campos(self.cam_pos[:3])
        # Drain finished downloads (tick thread owns world mutation).
        with self._dl_lock:
            done, self._dl_done = self._dl_done, []
        for url, data in done:
            self._dl_inflight.discard(url)
            if data is not None:
                self.provide_resource(url, data)
            else:
                self._dl_failed.add(url)
                self.log(f"download failed for {url}")
        # Launch new fetches, closest-first, without blocking the tick.
        import threading
        while (len(self._dl_inflight) < self.downloads_per_tick
               and len(self.load_queue)):
            popped = self.load_queue.pop_n(1)
            if not popped:
                break
            url = popped[0][0]
            if (url in self.resources or url in self._dl_inflight
                    or url in self._dl_failed or self.client is None):
                continue
            self._dl_inflight.add(url)

            def fetch(u=url):
                try:
                    files = self.client.download_files([u])
                    data = files.get(u)
                except OSError:
                    data = None
                with self._dl_lock:
                    self._dl_done.append((u, data))

            threading.Thread(target=fetch, daemon=True).start()
        mark("loading")
        self.phase_ms = phase_ms

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # sub:// navigation (GUIClient::visitSubURL, GUIClient.cpp:13262-13330)
    # ------------------------------------------------------------------
    def get_current_url(self) -> str:
        from substrata_tpu.shared.sub_url import make_sub_url
        eye = self.player.get_eye_position()
        return make_sub_url(self.server_hostname, self.server_worldname,
                            pos=eye, heading=self.cam_heading_deg)

    def visit_sub_url(self, url: str, push_cur_url_on_nav_stack=False,
                      adjust_cur_url_pos_back=False):
        """Visit a sub:// URL.  Same host + world: teleport the player to
        the URL position.  Different host/world: defer to
        ``portal_connect_hook`` (the embedding frontend owns reconnects).
        When pushing the previous URL onto the navigation stack, step it
        back 1.5 m along the heading so back-navigation doesn't land the
        player inside the portal again (GUIClient.cpp:13270-13283)."""
        from substrata_tpu.shared.sub_url import make_sub_url, parse_sub_url
        target = parse_sub_url(url)
        if push_cur_url_on_nav_stack:
            cur = self.get_current_url()
            if adjust_cur_url_pos_back:
                eye = np.asarray(self.player.get_eye_position(), np.float64)
                # Camera convention (camera.py): heading 0 looks along +y,
                # horizontal forward = (-sin h, cos h, 0).
                h = math.radians(self.cam_heading_deg)
                eye = eye - np.array([-math.sin(h), math.cos(h), 0.0]) * 1.5
                cur = make_sub_url(self.server_hostname,
                                   self.server_worldname, pos=eye,
                                   heading=self.cam_heading_deg)
            self.navigation_stack.append(cur)
        same_place = (target.hostname in ("", self.server_hostname)
                      and target.worldname == self.server_worldname)
        if same_place or self.portal_connect_hook is None:
            if target.has_position:
                self.player.set_position(
                    [target.x, target.y, target.z])
            if target.heading is not None:
                self.cam_heading_deg = target.heading
            if not same_place:
                self.log(f"portal target {url} needs a reconnect "
                         f"(no portal_connect_hook installed)")
        else:
            self.portal_connect_hook(target)

    def navigate_back(self) -> bool:
        """Back-button navigation over the sub:// stack."""
        if not self.navigation_stack:
            return False
        self.visit_sub_url(self.navigation_stack.pop())
        return True

    def _process_player_contacts(self, global_time, now):
        """Step 3e: contacted bodies -> ownership claims + touch events +
        portal traversal (GUIClient.cpp:6435-6516)."""
        for phys_ob in self.player.contacted_bodies:
            ob = phys_ob.userdata
            if not isinstance(ob, WorldObject):
                continue
            # Walking through a portal: record its target URL; handled
            # after the contact loop (GUIClient.cpp:6478-6516).
            if (ob.object_type == int(ObjectType.PORTAL)
                    and ob.target_url):
                self._touched_portal_target_url = ob.target_url
            # Physics-ownership claim on touch (GUIClient.cpp:6435-6492).
            if ob.is_dynamic() and self.client is not None:
                ws = self.world_state
                slot = ws.slot_for(ob.uid)
                if ws.ownership.try_claim(slot, self.client.avatar_uid, global_time):
                    ob.physics_owner_id = self.client.avatar_uid
                    ob.last_physics_ownership_change_global_time = global_time
                    self.client.send_ownership_taken(ob.uid, global_time)
            # onUserTouchedObject (0.5 s rate limit).
            last = self._last_touch_event_time.get(ob.uid, -1e9)
            if now - last > TOUCH_EVENT_RATE_LIMIT:
                self._last_touch_event_time[ob.uid] = now
                avatar_uid = self.client.avatar_uid if self.client else 0
                self.script_vm.fire_user_touched_object(ob.uid, avatar_uid)
                if self.client is not None:
                    import struct as _s
                    from substrata_tpu.net import protocol as P
                    self.client.send_message(P.make_message(
                        P.USER_TOUCHED_OBJECT_MESSAGE, _s.pack("<Q", ob.uid)))

    def _readback_active_objects(self, global_time):
        """Step 6: push simulated transforms to world objects + audio; stage
        snapshots for objects we own.

        Per-object work here runs for EVERY non-static object EVERY tick —
        at reference scale (12k-object world, README.md:42) this loop is
        the client tick's hot host path, so: pose composition is skipped
        for offset-free shapes (the common case), and no jnp touches
        (each un-jitted device op costs a remote round trip; r4 measured
        78 s/tick at 12k objects before these rules)."""
        my_uid = self.client.avatar_uid if self.client is not None else 0
        push_audio = self.audio is not None
        if self._nonstatic_wobs is None:
            static = int(MotionType.STATIC)
            self._nonstatic_wobs = [
                ob for ob in self.objects.values()
                if ob.physics_object is not None
                and ob.physics_object.motion_type != static]
        obs = self._nonstatic_wobs
        # Skip objects whose device row did not change this tick (sleeping
        # bodies — in a settled serving world nearly all of them): the
        # changed mask is one vectorised compare in sync_transforms.
        changed = self.physics_world.last_sync_changed
        if changed is not None:
            obs = [ob for ob in obs if changed[ob.physics_object.slot]]
        n = len(obs)
        if not n:
            return
        # Quat -> axis-angle for EVERY object in one vectorised numpy pass
        # (set_rotation_quat per object was ~25 us x 512 = 13 ms/tick).
        P = np.empty((n, 3), np.float32)
        R = np.empty((n, 4), np.float32)
        for i, ob in enumerate(obs):
            phys = ob.physics_object
            if phys.shape.pose_is_identity():
                P[i] = phys.pos
                R[i] = phys.rot
            else:
                mp, mr = phys.shape.mesh_pose_from_body(phys.pos, phys.rot)
                P[i] = mp
                R[i] = mr
        R /= np.maximum(np.linalg.norm(R, axis=1), 1e-9)[:, None]
        sin_half = np.linalg.norm(R[:, :3], axis=1)
        angles = 2.0 * np.arctan2(sin_half, R[:, 3])
        axes = np.where(sin_half[:, None] > 1e-6,
                        R[:, :3] / np.maximum(sin_half, 1e-6)[:, None],
                        np.array([0, 0, 1], np.float32))
        check_owned = self.client is not None
        for i, ob in enumerate(obs):
            phys = ob.physics_object
            ob.pos = P[i]
            ob.angle = float(angles[i])
            ob.axis = axes[i]
            ob.linear_vel = phys.linvel
            ob.angular_vel = phys.angvel
            if push_audio and ob.audio_source is not None:
                ob.audio_source.pos = np.asarray(phys.pos, np.float32)
                ob.audio_source.vel = np.asarray(phys.linvel, np.float32)
                self.audio.source_position_updated(ob.audio_source)
            if (check_owned and not ob.from_local_physics_dirty
                    and ob.physics_owner_id == my_uid and ob.is_dynamic()):
                ob.from_local_physics_dirty = True
                self._snapshot_dirty.append(ob)

    def _send_dirty_snapshots(self, global_time):
        ws = self.world_state
        dirty, self._snapshot_dirty = self._snapshot_dirty, []
        for ob in dirty:
            ob.from_local_physics_dirty = False
            if ob.uid not in self.objects:     # removed since marking
                continue
            # Ownership renewal at half-period (docs:64-67).
            slot = ws.slot_for(ob.uid)
            if ws.ownership.needs_renewal(slot, global_time):
                if ws.ownership.try_claim(slot, self.client.avatar_uid, global_time):
                    self.client.send_ownership_taken(ob.uid, global_time)
            self.client.send_physics_snapshot(
                ob.uid, np.asarray(ob.pos, np.float32), ob.quat,
                ob.linear_vel, ob.angular_vel)

    def _remote_object_playback(self, global_time, dt):
        """Step 8: for objects owned by others, insert due physics snapshots
        with smoothing; decay smoothing."""
        ws = self.world_state
        my_uid = self.client.avatar_uid
        if self._dyn_playback is None:
            pairs = []
            with ws.lock:
                for uid, net_ob in ws.objects.items():
                    local = self.objects.get(uid)
                    if local is None or local.physics_object is None:
                        continue
                    if not local.is_dynamic():
                        continue
                    pairs.append((uid, ws.slot_for(uid)))
            self._dyn_playback = pairs
        if self._dyn_playback:
            uids = [u for u, _ in self._dyn_playback]
            slots = [sl for _, sl in self._dyn_playback]
        else:
            uids, slots = [], []
        if slots:
            # Vectorised not-owned-by-me filter (owned_by per slot is a
            # Python call per object — this path scans every replicated
            # dynamic object every tick).
            sl = np.asarray(slots)
            own = ws.ownership
            mine = ((own.owner_id[sl] == my_uid)
                    & ((global_time - own.change_time[sl]) <= OWNERSHIP_PERIOD))
            keep = np.nonzero(~mine)[0]
            uids = [uids[int(k)] for k in keep]
            slots = [slots[int(k)] for k in keep]
        if slots:
            idx = np.array(slots)
            due, pos, rot, lv, av = ws.snapshots.due_physics_snapshots(idx, global_time)
            dk = np.nonzero(due)[0]
            if len(dk):
                due_obs = [self.objects[uids[int(k)]].physics_object
                           for k in dk]
                old_pos = np.stack([p.pos for p in due_obs])
                old_rot = np.stack([p.rot for p in due_obs])
                dslots = idx[dk]
                ws.snapshots.set_smoothing_from_corrections(
                    dslots, old_pos, old_rot, pos[dk], rot[dk])
                self.physics_world.set_new_ob_transforms_batch(
                    due_obs, pos[dk], rot[dk], lv[dk], av[dk])
                st = ws.snapshots.smooth_translation
                sr = ws.snapshots.smooth_rotation
                for j, p in enumerate(due_obs):
                    p.smooth_translation = st[dslots[j]]
                    p.smooth_rotation = sr[dslots[j]]
        ws.snapshots.decay_smoothing(dt)

    def _audio_occlusion_pass(self):
        """Step 9: one ray per audible source (<=60 m)."""
        sources = []
        for ob in self.objects.values():
            if ob.audio_source is not None and ob.audio_source.slot >= 0:
                sources.append(ob.audio_source)
        if not sources:
            return
        cam = np.asarray(self.cam_pos[:3], np.float32)
        origins, dirs, dists, keep = [], [], [], []
        for s in sources:
            to = np.asarray(s.pos, np.float32) - cam
            d = float(np.linalg.norm(to))
            if d > AUDIBLE_DIST or d < 1e-3:
                continue
            origins.append(cam)
            dirs.append(to / d)
            dists.append(min(max(d - 1.0, 0.0), AUDIO_OCCLUSION_MAX_DIST))
            keep.append(s)
        if not keep:
            return
        hits = self.physics_world.trace_rays_batched(
            np.array(origins), np.array(dirs), np.array(dists, np.float32),
            n_steps=16)
        hit = np.asarray(hits.hit)
        for s, h in zip(keep, hit):
            n_occ = 1 if h else 0
            if s.num_occlusions != n_occ:
                s.num_occlusions = n_occ
                self.audio.source_num_occlusions_updated(s)

    def _update_avatar_graphics(self, dt: float):
        """Animation state machines for every remote avatar, then one
        batched pose kernel call; gestures sync from the replicated
        Avatar.performing_gesture state."""
        my_uid = self.client.avatar_uid
        avs = self.world_state.avatars_snapshot()
        for uid, av in avs.items():
            if uid == my_uid:
                continue   # first-person: own body not posed
            g = self.avatar_graphics.by_uid.get(uid)
            pg = getattr(av, "performing_gesture", "") or None
            if g is not None and pg != g.gesture:
                if pg is not None:
                    g.perform_gesture(pg)
                else:
                    g.stop_gesture()
            self.avatar_graphics.update_avatar(av, dt)
            # Seat the avatar on its vehicle (seat space: +y forwards,
            # +z up — PoseConstraint docs, AvatarGraphics.h:63).
            if av.entered_vehicle_uid:
                ob = self.objects.get(av.entered_vehicle_uid)
                g = self.avatar_graphics.by_uid[uid]
                if ob is not None:
                    seat = np.eye(4, dtype=np.float32)
                    seat[:3, 3] = np.asarray(ob.pos, np.float32) + [0, 0, 0.4]
                    g.set_sitting(True, PoseConstraint(
                        sitting=True, seat_to_world=seat,
                        upper_body_rot_angle=0.1, upper_leg_rot_angle=1.3,
                        lower_leg_rot_angle=-0.5))
        for uid in list(self.avatar_graphics.by_uid):
            if uid not in avs or uid == my_uid:
                self.avatar_graphics.remove_avatar(uid)
        if self.avatar_graphics.by_uid:
            self.avatar_graphics.pose_all()

    def get_avatar_bone_transform(self, avatar_uid: int, bone: str,
                                  pre_transform=None):
        """World transform of a named bone on a posed avatar — the gear
        attachment path (EquippedGearGraphics / updateGearBones,
        AvatarGraphics.h:88-101).  Bone names accept GearItem-style
        lowercase ('head') or Mixamo ('Head')."""
        g = self.avatar_graphics.by_uid.get(avatar_uid)
        if g is None or g.joints_world is None:
            return None
        m = g.get_joint_world(bone) if g.get_joint_world(bone) is not None \
            else g.get_joint_world(bone[:1].upper() + bone[1:])
        if m is None:
            return None
        if pre_transform is not None:
            m = m @ np.asarray(pre_transform, np.float32)
        return m

    def _apply_network_events(self):
        ev = self.client.pop_events()
        ws = self.world_state
        for uid in ev.objects_created:
            if uid in self.objects:
                continue
            with ws.lock:
                net_ob = ws.objects.get(uid)
            if net_ob is not None:
                self.objects[uid] = net_ob
                self._invalidate_object_caches()
                self._load_object(net_ob)
        for uid in ev.objects_destroyed:
            ob = self.objects.get(uid)
            if ob is not None:
                self.remove_object(ob)
        for name, msg in ev.chat:
            self.log(f"[chat] {name}: {msg}")

    # ------------------------------------------------------------------
    def get_diagnostics(self) -> str:
        lines = [
            f"ClientApp: {len(self.objects)} objects, "
            f"{len(self.path_controllers)} path controllers, "
            f"{len(self.vehicle_controllers)} vehicles, "
            f"physics {self.last_physics_sim_time*1e3:.2f} ms",
            self.physics_world.get_diagnostics(),
        ]
        if self.audio is not None:
            lines.append(self.audio.get_diagnostics())
        lines.append(self.terrain.get_diagnostics())
        return "\n".join(lines)
