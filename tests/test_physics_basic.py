"""End-to-end physics slice tests: bodies falling on ground, stacking,
restitution, friction, sleeping, buoyancy (SURVEY.md §7 step 2; golden
behaviours mirror Jolt semantics the reference relies on)."""

import jax.numpy as jnp
import numpy as np
import pytest

from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

DT = 1.0 / 60.0


def small_world(**kw):
    cfg = SimConfig(capacity=64, max_pairs=256, grid_dim=16, cell_size=4.0, **kw)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    return w


def step_n(w, n):
    for _ in range(n):
        w.think(DT)
    w.sync_transforms()


def test_sphere_falls_and_rests():
    w = small_world()
    ob = PhysicsObject(shape=shapes.make_sphere(0.5),
                       pos=np.array([0, 0, 5.0], np.float32),
                       motion_type=int(MotionType.DYNAMIC))
    w.add_object(ob)
    step_n(w, 300)
    # Resting on the ground: center at ~radius (cm-scale tolerance — the
    # position-correction pass can leave it a hair above the slop depth).
    assert abs(ob.pos[2] - 0.5) < 0.05, ob.pos
    assert np.linalg.norm(ob.linvel) < 0.1


def test_free_fall_matches_analytic():
    w = small_world()
    ob = PhysicsObject(shape=shapes.make_sphere(0.5),
                       pos=np.array([0, 0, 100.0], np.float32),
                       motion_type=int(MotionType.DYNAMIC))
    ob.linear_damping = 0.0
    w.add_object(ob)
    t = 1.0
    step_n(w, 60)
    # Semi-implicit Euler: z = z0 - g*dt*sum(k) = z0 - g*dt^2*n(n+1)/2
    n = 60
    expected = 100.0 - 9.81 * DT * DT * n * (n + 1) / 2
    assert abs(ob.pos[2] - expected) < 0.1, (ob.pos[2], expected)


def test_box_falls_and_rests_flat():
    w = small_world()
    ob = PhysicsObject(shape=shapes.make_box([0.5, 0.5, 0.5]),
                       pos=np.array([0, 0, 3.0], np.float32),
                       motion_type=int(MotionType.DYNAMIC))
    w.add_object(ob)
    step_n(w, 300)
    assert abs(ob.pos[2] - 0.5) < 0.05, ob.pos
    # Still upright.
    up = np.asarray(jnp.abs(jnp.sum(ob.rot * np.array([0, 0, 0, 1.0]))))
    assert up > 0.99


def test_restitution_bounce():
    w = small_world()
    ob = PhysicsObject(shape=shapes.make_sphere(0.5),
                       pos=np.array([0, 0, 2.0], np.float32),
                       motion_type=int(MotionType.DYNAMIC),
                       restitution=0.8)
    w.add_object(ob)
    max_z_after_bounce = 0.0
    bounced = False
    prev_vz = 0.0
    for i in range(240):
        w.think(DT)
        w.sync_transforms()
        if prev_vz < -0.5 and ob.linvel[2] > 0.5:
            bounced = True
        if bounced:
            max_z_after_bounce = max(max_z_after_bounce, ob.pos[2])
        prev_vz = ob.linvel[2]
    assert bounced
    # e=0.8 -> rebound height ~ e^2 * h = 0.64 * 1.5m (drop from 2.0 to 0.5)
    assert 0.4 < max_z_after_bounce - 0.5 < 1.4, max_z_after_bounce


def test_two_spheres_collide():
    w = small_world()
    a = w.add_object(PhysicsObject(shape=shapes.make_sphere(0.5),
                                   pos=np.array([-2, 0, 0.5], np.float32),
                                   linvel=np.array([2.0, 0, 0], np.float32),
                                   motion_type=int(MotionType.DYNAMIC),
                                   restitution=0.9))
    b = w.add_object(PhysicsObject(shape=shapes.make_sphere(0.5),
                                   pos=np.array([2, 0, 0.5], np.float32),
                                   linvel=np.array([-2.0, 0, 0], np.float32),
                                   motion_type=int(MotionType.DYNAMIC),
                                   restitution=0.9))
    step_n(w, 120)
    # They should have bounced apart.
    assert a.pos[0] < -0.9
    assert b.pos[0] > 0.9


def test_stack_of_boxes_stable():
    w = small_world()
    obs = []
    for i in range(3):
        obs.append(w.add_object(PhysicsObject(
            shape=shapes.make_box([0.5, 0.5, 0.5]),
            pos=np.array([0, 0, 0.55 + i * 1.05], np.float32),
            motion_type=int(MotionType.DYNAMIC))))
    step_n(w, 360)
    for i, ob in enumerate(obs):
        assert abs(ob.pos[2] - (0.5 + i * 1.0)) < 0.12, (i, ob.pos)
        assert np.linalg.norm(ob.pos[:2]) < 0.2, (i, ob.pos)


def test_sleeping_and_wake_on_impact():
    w = small_world()
    ob = w.add_object(PhysicsObject(
        shape=shapes.make_box([0.5, 0.5, 0.5]),
        pos=np.array([0, 0, 0.5], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    step_n(w, 120)
    assert not bool(np.asarray(w.state.awake)[ob.slot]), "box should sleep"
    # Drop a sphere on it -> box wakes.
    w.add_object(PhysicsObject(
        shape=shapes.make_sphere(0.3),
        pos=np.array([0, 0, 3.0], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    woke = False
    for _ in range(120):
        w.think(DT)
        if bool(np.asarray(w.state.awake)[ob.slot]):
            woke = True
            break
    assert woke


def test_static_box_obstacle():
    w = small_world()
    w.add_object(PhysicsObject(shape=shapes.make_box([2, 2, 0.5]),
                               pos=np.array([0, 0, 2.0], np.float32),
                               motion_type=int(MotionType.STATIC)))
    ball = w.add_object(PhysicsObject(shape=shapes.make_sphere(0.25),
                                      pos=np.array([0, 0, 5.0], np.float32),
                                      motion_type=int(MotionType.DYNAMIC)))
    step_n(w, 300)
    # Rests on the static platform (top at z=2.5), not the ground.
    assert abs(ball.pos[2] - 2.75) < 0.05, ball.pos


def test_buoyancy_floats_light_box():
    w = small_world()
    w.set_water_buoyancy_enabled(True)
    w.water_z = 0.0
    w.set_ground_plane(-50.0)
    # Light box (density 200 << water 1020) dropped above water.
    ob = w.add_object(PhysicsObject(
        shape=shapes.make_box([0.5, 0.5, 0.5], density=200.0),
        pos=np.array([0, 0, 2.0], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    step_n(w, 600)
    # Floats near the surface.
    assert -1.0 < ob.pos[2] < 1.0, ob.pos
    assert ob.underwater


def test_heavy_sphere_sinks():
    w = small_world()
    w.set_water_buoyancy_enabled(True)
    w.water_z = 0.0
    w.set_ground_plane(-20.0)
    ob = w.add_object(PhysicsObject(
        shape=shapes.make_sphere(0.5, density=3000.0),
        pos=np.array([0, 0, 1.0], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    step_n(w, 900)
    assert ob.pos[2] < -18.0, ob.pos


def test_remove_object():
    w = small_world()
    ob = w.add_object(PhysicsObject(shape=shapes.make_sphere(0.5),
                                    pos=np.array([0, 0, 5.0], np.float32),
                                    motion_type=int(MotionType.DYNAMIC)))
    w.remove_object(ob)
    ob2 = w.add_object(PhysicsObject(shape=shapes.make_sphere(0.5),
                                     pos=np.array([3, 0, 1.0], np.float32),
                                     motion_type=int(MotionType.DYNAMIC)))
    step_n(w, 60)
    assert ob2.slot >= 0
    assert len(w.objects) == 1


def test_kinematic_platform_carries_box():
    w = small_world()
    plat = w.add_object(PhysicsObject(
        shape=shapes.make_box([2, 2, 0.25]),
        pos=np.array([0, 0, 1.0], np.float32),
        motion_type=int(MotionType.KINEMATIC)))
    box = w.add_object(PhysicsObject(
        shape=shapes.make_box([0.3, 0.3, 0.3]),
        pos=np.array([0, 0, 2.0], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    # Let the box settle on the platform.
    step_n(w, 120)
    assert abs(box.pos[2] - 1.55) < 0.1, box.pos
    # Move the platform sideways kinematically.
    for i in range(120):
        new_pos = plat.pos + np.array([1.0 * DT, 0, 0], np.float32)
        w.move_kinematic_object(plat, new_pos, plat.rot, DT)
        w.think(DT)
    w.sync_transforms()
    # Box was carried along by friction.
    assert box.pos[0] > 0.8, box.pos
