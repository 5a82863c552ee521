"""Two-stage ray-candidate pruning (queries._ray_bodies).

The grid march emits ~280 candidate slots per ray (9 neighbour cells x
march steps x cell capacity + oversize), most of them duplicates of the
same few bodies.  Stage 1 bounding-sphere-tests them all, dedups, and
keeps the K nearest by sphere entry distance; stage 2 runs the full shape
tests on the survivors only.  These tests pin the pruning's correctness
edges: nearest-first through long pierce chains, duplicate crowd-out,
exclusion, and mixed shape types surviving the prune.

Reference behaviour: PhysicsWorld::traceRay returns the single nearest
hit (gui_client/PhysicsWorld.cpp:1668-1716).
"""

import numpy as np

from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld


def _world(cell_size=1.4):
    return PhysicsWorld(SimConfig(capacity=128, max_pairs=1024, grid_dim=32,
                                  cell_size=cell_size))


def test_nearest_of_many_bodies_along_ray():
    """A pierce chain longer than the top-K budget still returns the
    nearest body: only candidates AHEAD of the first hit matter, and the
    sphere-entry ranking puts the true winner in the kept set."""
    w = _world()
    obs = []
    for i in range(24):  # > K=16 bodies straddling one long ray
        obs.append(w.add_object(PhysicsObject(
            shape=shapes.make_sphere(0.3),
            pos=np.array([2.0 + i * 1.5, 0.0, 1.0], np.float32),
            motion_type=int(MotionType.STATIC))))
    w._flush()
    hit, t, n, ob, _ = w.trace_ray([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], 100.0)
    assert hit and ob is obs[0]
    assert abs(t - 1.7) < 1e-2          # 2.0 - 0.3 radius
    assert n[0] < -0.9                   # facing back along the ray


def test_duplicates_do_not_crowd_out_the_winner():
    """Short rays read the same cell at every march step, so each nearby
    body appears many times in the candidate list; dedup must stop copies
    of ONE body occupying the whole top-K."""
    w = _world()
    # A tight cluster in one cell (each body duplicated ~36x in the
    # candidate list) plus the actual target slightly further along.
    for i in range(6):
        w.add_object(PhysicsObject(
            shape=shapes.make_sphere(0.05),
            pos=np.array([0.3 + 0.02 * i, 0.45, 1.0], np.float32),
            motion_type=int(MotionType.STATIC)))
    target = w.add_object(PhysicsObject(
        shape=shapes.make_box([0.1, 0.1, 0.1]),
        pos=np.array([0.8, 0.0, 1.0], np.float32),
        motion_type=int(MotionType.STATIC)))
    w._flush()
    hit, t, _, ob, _ = w.trace_ray([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], 2.0)
    assert hit and ob is target
    assert abs(t - 0.7) < 1e-3


def test_excluded_body_skipped_even_when_nearest():
    from substrata_tpu.physics import queries
    import jax.numpy as jnp

    w = _world()
    near = w.add_object(PhysicsObject(
        shape=shapes.make_sphere(0.3),
        pos=np.array([2.0, 0.0, 1.0], np.float32),
        motion_type=int(MotionType.STATIC)))
    far = w.add_object(PhysicsObject(
        shape=shapes.make_sphere(0.3),
        pos=np.array([5.0, 0.0, 1.0], np.float32),
        motion_type=int(MotionType.STATIC)))
    w._flush()
    hits = queries.trace_rays(
        jnp.asarray([[0.0, 0.0, 1.0]]), jnp.asarray([[1.0, 0.0, 0.0]]),
        jnp.asarray([100.0]), w.state, w.static_world, w.config,
        exclude=jnp.asarray([near.slot], jnp.int32))
    assert bool(hits.hit[0]) and int(hits.body[0]) == far.slot


def test_mixed_shape_types_survive_prune():
    w = _world()
    box = w.add_object(PhysicsObject(
        shape=shapes.make_box([0.2, 0.2, 0.2]),
        pos=np.array([1.0, 0.0, 1.0], np.float32),
        motion_type=int(MotionType.STATIC)))
    cap = w.add_object(PhysicsObject(
        shape=shapes.make_capsule(0.2, 0.3),
        pos=np.array([3.0, 0.0, 1.0], np.float32),
        motion_type=int(MotionType.STATIC)))
    w._flush()
    hit, t, _, ob, _ = w.trace_ray([0.0, 0.0, 1.0], [1.0, 0.0, 0.0], 10.0)
    assert hit and ob is box and abs(t - 0.8) < 1e-3
    hit2, t2, _, ob2, _ = w.trace_ray([2.0, 0.0, 1.0], [1.0, 0.0, 0.0], 10.0)
    assert hit2 and ob2 is cap and abs(t2 - 0.8) < 1e-3
