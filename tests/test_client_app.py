"""End-to-end client app tests: the full tick over all subsystems, offline
and networked (config 5 of BASELINE.md: full networked tick with snapshots
+ interpolation)."""

import time

import numpy as np
import pytest

from substrata_tpu.client_app import ClientApp, PlayerInput
from substrata_tpu.net.client import Client
from substrata_tpu.net.server import Server
from substrata_tpu.physics.state import SimConfig
from substrata_tpu.shared.world_object import (
    DYNAMIC_FLAG, ObjectType, WorldObject,
)
from substrata_tpu.shared.voxel import compress_voxel_group

DT = 1.0 / 60.0


def small_cfg():
    return SimConfig(capacity=128, max_pairs=512, grid_dim=16, cell_size=4.0,
                     solver_iters=6)


def make_app(**kw):
    app = ClientApp(config=small_cfg(), enable_audio=False, **kw)
    return app


def test_offline_tick_with_objects():
    app = make_app()
    ob = WorldObject(flags=DYNAMIC_FLAG | 1, pos=np.array([2.0, 0, 3.0]),
                     mass=20.0)
    app.create_object(ob)
    for _ in range(120):
        app.timer_event(DT)
    # The dynamic box fell to the ground and its replica tracked it.
    assert ob.pos[2] < 1.0, ob.pos
    assert np.isfinite(ob.pos).all()
    assert "objects" in app.get_diagnostics()


def test_player_walk_in_app():
    app = make_app()
    for _ in range(120):
        app.timer_event(DT, PlayerInput(forward=1.0))
    assert app.cam_pos[1] > 3.0, app.cam_pos


def test_winter_scripted_object_rotates():
    app = make_app()
    ob = WorldObject(flags=1, pos=np.array([5.0, 0, 1.0]),
                     script="def evalRotation(float time, WinterEnv env) vec3 : "
                            "vec3(0.0, 0.0, time * 1.0)")
    app.create_object(ob)
    app.timer_event(DT)
    t0 = app.clock()
    for _ in range(30):
        app.timer_event(DT)
    phys = ob.physics_object
    # The object's orientation is being driven (angle grows with time).
    from substrata_tpu.maths import quat as quatm
    import jax.numpy as jnp
    ax, ang = quatm.to_axis_angle(jnp.asarray(phys.rot))
    assert float(ang) > 0.01


def test_vehicle_script_object_becomes_drivable():
    app = make_app()
    ob = WorldObject(flags=DYNAMIC_FLAG | 1, pos=np.array([3.0, 0, 1.0]),
                     mass=800.0,
                     script="<script><hover_car/></script>")
    app.create_object(ob)
    assert ob.uid in app.vehicle_controllers
    assert app.enter_vehicle(ob.uid)
    for _ in range(90):
        app.timer_event(DT, PlayerInput(forward=1.0))
    assert ob.pos[1] > 1.0, ob.pos  # drove forward
    app.exit_vehicle()
    assert app.driven_vehicle_uid == 0


def test_voxel_object_physics():
    app = make_app()
    vox = compress_voxel_group(np.array([[0, 0, 0], [1, 0, 0]]), np.array([0, 0]))
    ob = WorldObject(object_type=int(ObjectType.VOXEL_GROUP), flags=1,
                     pos=np.array([0.0, 5.0, 0.5]), voxel_data=vox)
    app.create_object(ob)
    assert ob.physics_object is not None
    # Static voxel object occupies space: a ray at it hits.
    hit, t, n, hit_ob, mat = app.physics_world.trace_ray(
        [0, 5, 5], [0, 0, -1], 10.0)
    assert hit


def test_networked_two_apps_replicate_physics():
    """Config 5 slice: app A owns a falling box; app B receives snapshots
    and plays them back with dejitter."""
    server = Server(port=0, udp_port=0)
    server.start()
    try:
        ca = Client("127.0.0.1", server.port)
        ca.start()
        cb = Client("127.0.0.1", server.port)
        cb.start()
        app_a = make_app(client=ca)
        app_b = make_app(client=cb)
        ob = WorldObject(flags=DYNAMIC_FLAG | 1, pos=np.array([2.0, 0, 4.0]),
                         mass=20.0)
        app_a.create_object(ob)
        # A claims ownership immediately (it spawned the object).
        t0 = time.time()
        gt = ca.world_state.global_time()
        slot = ca.world_state.slot_for(ob.uid)
        ca.world_state.ownership.try_claim(slot, ca.avatar_uid, gt)
        ob.physics_owner_id = ca.avatar_uid
        ca.send_ownership_taken(ob.uid, gt)

        for i in range(150):
            app_a.timer_event(DT)
            app_b.timer_event(DT)
            time.sleep(0.002)
        # B has the object and received physics snapshots into its ring.
        assert ob.uid in app_b.objects
        with cb.world_state.lock:
            slot_b = cb.world_state._slot_by_uid.get(ob.uid)
        assert slot_b is not None
        assert cb.world_state.snapshots.next_i[slot_b] >= 2
        # B's replica of the object has fallen (snapshots applied).
        b_ob = app_b.objects[ob.uid]
        assert b_ob.physics_object.pos[2] < 3.5, b_ob.physics_object.pos
        ca.stop(); cb.stop()
    finally:
        server.stop()


def test_touch_events_fire_scripts():
    app = make_app()
    ob = WorldObject(flags=1, pos=np.array([1.2, 0, 0.5]))
    app.create_object(ob)
    touched = []
    app.script_vm.handlers_for(ob.uid).on_user_touched_object.add(
        lambda av, uid: touched.append(uid))
    # Walk into the object.
    for _ in range(120):
        app.timer_event(DT, PlayerInput(right=1.0))
        if touched:
            break
    assert touched and touched[0] == ob.uid


# ----------------------------------------------------------------------
# Mesh-driven collision shapes (PhysicsWorld.cpp:871-1083 factory parity):
# real glTF content must reach the collision system, not placeholder boxes.
# ----------------------------------------------------------------------

@pytest.mark.slow
def test_static_gltf_mesh_collides_and_ray_hits():
    from tests.test_gltf import make_cube_gltf
    app = make_app()
    # A 8x8 m platform 2 m above ground, from a unit-cube glb scaled [8,8,.2]
    ob = WorldObject(flags=1, pos=np.array([-4.0, -4.0, 2.0]),
                     scale=np.array([8.0, 8.0, 0.2]), model_url="plat.glb")
    app.create_object(ob)
    # Before the resource arrives: placeholder (0.5 m box), queued for load.
    assert ob.physics_object.shape.shape_type == 1  # BOX placeholder
    app.provide_resource("plat.glb", make_cube_gltf(as_glb=True))
    app.timer_event(DT)
    # Ray from above must hit the platform TOP (z = 2.2), not a 0.5 box,
    # and resolve to the owning WorldObject.
    # (ray offset from the origin so it misses the player capsule)
    hit, t, n, hit_ob, mat = app.physics_world.trace_ray(
        [1.5, 1.5, 10.0], [0.0, 0.0, -1.0], 20.0)
    assert hit and abs((10.0 - t) - 2.2) < 0.05, (hit, t)
    assert hit_ob is not None and hit_ob.userdata is ob
    # A dynamic sphere dropped over the platform must REST ON ITS TRIANGLES.
    ball = WorldObject(flags=DYNAMIC_FLAG | 1, pos=np.array([1.5, 1.5, 4.0]),
                       mass=5.0)
    app.create_object(ball)
    for _ in range(240):
        app.timer_event(DT)
    assert ball.pos[2] > 2.2, ball.pos  # on the platform, not the ground
    # Removing the platform removes its triangles: the ball falls through
    # to the ground plane.
    app.remove_object(ob)
    for _ in range(240):
        app.timer_event(DT)
    assert ball.pos[2] < 1.0, ball.pos


def test_dynamic_gltf_mesh_becomes_convex_hull():
    from tests.test_gltf import make_cube_gltf
    app = make_app()
    app.provide_resource("crate.glb", make_cube_gltf(as_glb=True))
    ob = WorldObject(flags=DYNAMIC_FLAG | 1, pos=np.array([3.0, 3.0, 3.0]),
                     mass=10.0, model_url="crate.glb")
    app.create_object(ob)
    assert ob.physics_object.shape.shape_type == 3  # HULL, not placeholder
    for _ in range(240):
        app.timer_event(DT)
    # Unit cube hull resting on the ground: COM height ~0.5.
    assert abs(ob.physics_object.pos[2] - 0.5) < 0.1, ob.physics_object.pos


def test_portal_touch_teleports_player():
    """Portal traversal (GUIClient.cpp:6478-6516): walking into a portal
    object teleports the player to its sub:// target and pushes the
    adjusted previous URL onto the navigation stack."""
    app = make_app()
    portal = WorldObject(
        object_type=int(ObjectType.PORTAL), flags=1,
        pos=np.array([0.0, 2.0, 0.9]),
        target_url="sub://localhost?x=20.0&y=20.0&z=2.0&heading=90.0")
    app.create_object(portal)
    for _ in range(240):
        app.timer_event(DT, PlayerInput(forward=1.0))
        if app.cam_pos[0] > 10:
            break
    eye = app.player.get_eye_position()
    assert np.linalg.norm(np.asarray(eye[:2]) - [20.0, 20.0]) < 2.0, eye
    assert app.cam_heading_deg == 90.0
    assert len(app.navigation_stack) == 1
    assert app.navigation_stack[0].startswith("sub://localhost")
    # Back navigation returns near the portal (stepped 1.5 m back).
    assert app.navigate_back()
    eye2 = app.player.get_eye_position()
    assert np.linalg.norm(np.asarray(eye2[:2]) - [0.0, 2.0]) < 4.0, eye2


def test_sub_url_parse_roundtrip():
    from substrata_tpu.shared.sub_url import make_sub_url, parse_sub_url
    u = parse_sub_url("sub://substrata.info/nick/my+cool+world?x=1&y=2&z=3"
                      "&heading=45")
    assert u.hostname == "substrata.info"
    assert u.worldname == "nick/my cool world"
    assert u.has_position and (u.x, u.y, u.z) == (1.0, 2.0, 3.0)
    assert u.heading == 45.0
    u2 = parse_sub_url("substrata.info/parcel/10")
    assert u2.parcel_uid == 10
    u3 = parse_sub_url(make_sub_url("h", "w", pos=(1, 2, 3), heading=7.0))
    assert (u3.hostname, u3.worldname) == ("h", "w") and u3.has_position


def test_pipelined_tick_matches_world_state():
    """pipeline_depth=3: host mirrors lag but converge — after settling,
    the replica matches the device state; the player still walks."""
    app = make_app(pipeline_depth=3)
    ob = WorldObject(flags=DYNAMIC_FLAG | 1, pos=np.array([2.0, 0, 3.0]),
                     mass=20.0)
    app.create_object(ob)
    for _ in range(150):
        app.timer_event(DT, PlayerInput(forward=1.0))
    # Mirrors are <= depth ticks stale; a settled box reads settled.
    assert ob.pos[2] < 1.0, ob.pos
    assert np.isfinite(ob.pos).all()
    assert app.cam_pos[1] > 3.0, app.cam_pos
    # Scripted kinematic mirrors stay host-authoritative (never regressed
    # by stale blocks): drive one through the winter path.
    assert app.player.on_ground
