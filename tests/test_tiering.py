"""Capacity-tier auto-scaling: a calm world descends to small pair/contact
buffers (step cost on TPU scales with buffer capacity, not live count), and
climbs back to full capacity the moment an overflow counter fires."""

import numpy as np

from substrata_tpu import MotionType, PhysicsObject, PhysicsWorld
from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import SimConfig


def make_world():
    # auto_tier defaults off below 2048 bodies (compile-count control);
    # opt in explicitly to exercise the ladder at test scale.
    w = PhysicsWorld(SimConfig(capacity=256, max_pairs=4096, grid_dim=32,
                               cell_size=2.0), auto_tier=True)
    w.set_ground_plane(0.0)
    return w


def test_calm_world_descends_tiers_then_sleeps_free():
    w = make_world()
    w.add_object(PhysicsObject(shape=shapes.make_box([0.4, 0.4, 0.4]),
                               pos=np.array([0, 0, 1.0], np.float32),
                               motion_type=int(MotionType.DYNAMIC)))
    for _ in range(200):
        w.think(1 / 60)
    # Calm worlds first descend the capacity ladder, then — once every body
    # sleeps — skip device steps entirely.
    assert w._tier > 0 and w.config.max_pairs < 4096
    assert w._world_asleep
    steps_before = w._steps
    for _ in range(50):
        w.think(1 / 60)
    assert w._steps == steps_before + 50   # counted, but no device work


def test_load_spike_climbs_back_and_stays_correct():
    w = make_world()
    w.add_object(PhysicsObject(shape=shapes.make_box([0.4, 0.4, 0.4]),
                               pos=np.array([0, 0, 1.0], np.float32),
                               motion_type=int(MotionType.DYNAMIC)))
    for _ in range(200):
        w.think(1 / 60)
    assert w._tier > 0 and w._world_asleep
    rng = np.random.default_rng(0)
    obs = [w.add_object(PhysicsObject(
        shape=shapes.make_box([0.4, 0.4, 0.4]),
        pos=np.array([rng.uniform(-4, 4), rng.uniform(-4, 4), 2 + 0.05 * k],
                     np.float32),
        motion_type=int(MotionType.DYNAMIC))) for k in range(120)]
    saw_full = False
    for _ in range(240):
        w.think(1 / 60)
        saw_full = saw_full or w._tier == 0
    assert saw_full, "overflow never climbed the tier ladder"
    w.sync_transforms()
    ps = np.array([o.pos for o in obs])
    assert np.isfinite(ps).all()
    assert ps[:, 2].min() > 0.2, "a body fell through under tier switching"


def test_auto_tier_off_keeps_config():
    w = PhysicsWorld(SimConfig(capacity=64, max_pairs=1024, grid_dim=16,
                               cell_size=4.0), auto_tier=False)
    w.set_ground_plane(0.0)
    w.add_object(PhysicsObject(shape=shapes.make_sphere(0.3),
                               pos=np.array([0, 0, 1.0], np.float32),
                               motion_type=int(MotionType.DYNAMIC)))
    for _ in range(120):
        w.think(1 / 60)
    assert w._tier == 0
    assert w.config.max_pairs == 1024
