"""Convex-hull narrowphase + raycast tests.

Round 1 collided dynamic hulls as their principal-axis OBB; this pins the
real convex path (reference: true Jolt ConvexHullShape built from mesh
vertices + GJK/EPA collide, gui_client/PhysicsWorld.cpp:871-1083, and exact
hull raycast via traceRay, 1668-1716).
"""

import numpy as np
import pytest

from substrata_tpu import MotionType, PhysicsObject, PhysicsWorld
from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import SimConfig

OCTA = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                 [0, 0, 1], [0, 0, -1]], np.float32)


def small_world(**kw):
    cfg = SimConfig(capacity=32, max_pairs=256, grid_dim=16, cell_size=2.0,
                    solver_iters=8, **kw)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    return w


def test_hull_mass_properties_match_box():
    he = np.array([0.5, 0.3, 0.2])
    corners = np.array([[sx * he[0], sy * he[1], sz * he[2]]
                        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
    h = shapes.make_convex_hull(corners + np.array([3.0, -2.0, 1.0]))
    b = shapes.make_box(he)
    assert h.volume == pytest.approx(b.volume, rel=1e-3)
    assert np.allclose(np.sort(1 / h.inv_inertia), np.sort(1 / b.inv_inertia),
                       rtol=0.02)
    assert h.bound_radius == pytest.approx(float(np.linalg.norm(he)), abs=1e-3)
    assert len(h.hull_planes) == 6
    # Every hull vertex satisfies every face plane.
    viol = (h.hull_verts @ h.hull_planes[:, :3].T
            - h.hull_planes[None, :, 3]).max()
    assert viol < 1e-3


def test_octahedron_rests_on_face_not_obb():
    """An octahedron's OBB would rest at z=0.5; the true hull rests on a
    face at z = 1/sqrt(3) * r = 0.289."""
    w = small_world()
    h = w.add_object(PhysicsObject(
        shape=shapes.make_convex_hull(OCTA * 0.5),
        pos=np.array([0, 0, 1.0], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    # Nudge so it cannot balance exactly on its bottom vertex.
    h.angvel = np.array([1.5, 0.5, 0.0], np.float32)
    w.set_linear_and_angular_vel(h, h.linvel, h.angvel)
    for _ in range(300):
        w.think(1 / 60)
    w.sync_transforms()
    assert not np.isnan(h.pos).any()
    assert 0.2 < h.pos[2] < 0.4, h.pos  # face height 0.289, not OBB 0.5


def test_hull_stack_two_high():
    w = small_world()
    lo = w.add_object(PhysicsObject(
        shape=shapes.make_convex_hull(OCTA * 0.5),
        pos=np.array([0, 0, 0.4], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    hi = w.add_object(PhysicsObject(
        shape=shapes.make_convex_hull(OCTA * 0.5),
        pos=np.array([0.0, 0.0, 1.1], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    for _ in range(300):
        w.think(1 / 60)
    w.sync_transforms()
    assert not np.isnan(hi.pos).any()
    # Either stacked (hi above lo) or rolled off to the ground — never sunk
    # into lo or the floor.
    assert hi.pos[2] > 0.15
    if np.linalg.norm(hi.pos[:2] - lo.pos[:2]) < 0.3:
        assert hi.pos[2] > lo.pos[2] + 0.35


def test_sphere_rests_on_hull():
    w = small_world()
    hull = w.add_object(PhysicsObject(
        shape=shapes.make_convex_hull(np.array(
            [[sx, sy, sz * 0.25] for sx in (-1, 1) for sy in (-1, 1)
             for sz in (-1, 1)], np.float32)),
        pos=np.array([0, 0, 0.25], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    ball = w.add_object(PhysicsObject(
        shape=shapes.make_sphere(0.2),
        pos=np.array([0, 0, 1.5], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    for _ in range(300):
        w.think(1 / 60)
    w.sync_transforms()
    # Slab top at z=0.5; ball rests on it at 0.5 + 0.2.
    assert ball.pos[2] == pytest.approx(0.70, abs=0.06), ball.pos


def test_ray_hits_true_hull_surface():
    """A down ray over an octahedron's slanted face must hit the face plane,
    not the OBB top (which is ~73% higher at the face midpoint)."""
    w = small_world()
    w.add_object(PhysicsObject(
        shape=shapes.make_convex_hull(OCTA),  # 'radius' 1 octahedron
        pos=np.array([0, 0, 2.0], np.float32),
        motion_type=int(MotionType.STATIC)))
    # Ray down above x=0.5, y=0 — surface of |x|+|y|+|z|=1 gives z=0.5.
    hit, t, n, ob, mat = w.trace_ray([0.5, 0.0, 5.0], [0, 0, -1], 10.0)
    assert bool(hit)
    assert float(5.0 - t) == pytest.approx(2.5, abs=0.02)
    # Octahedron face normal is (±1,±1,±1)/sqrt(3): z-component 1/sqrt(3).
    assert float(np.asarray(n)[2]) == pytest.approx(1 / np.sqrt(3), abs=0.05)
    # A ray outside the hull but inside its OBB must MISS the hull (it may
    # still hit the ground plane below — body must be None then).
    hit2, t2, _, ob2, _ = w.trace_ray([0.9, 0.9, 5.0], [0, 0, -1], 10.0)
    assert (not bool(hit2)) or ob2 is None, (t2, ob2)


def test_hull_box_interaction():
    w = small_world()
    box = w.add_object(PhysicsObject(
        shape=shapes.make_box([0.4, 0.4, 0.4]),
        pos=np.array([0, 0, 0.4], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    h = w.add_object(PhysicsObject(
        shape=shapes.make_convex_hull(OCTA * 0.4),
        pos=np.array([0.05, 0, 1.6], np.float32),
        motion_type=int(MotionType.DYNAMIC)))
    for _ in range(300):
        w.think(1 / 60)
    w.sync_transforms()
    assert not np.isnan(h.pos).any()
    # The octahedron rests on the box top (0.8 + ~0.23 face height) or
    # rolled to the ground — never inside the box.
    if np.max(np.abs(h.pos[:2] - box.pos[:2])) < 0.4:
        assert h.pos[2] > box.pos[2] + 0.55, (h.pos, box.pos)
    else:
        assert h.pos[2] > 0.15
