"""65536-body capacity parity (PhysicsWorld.cpp:492-506: Jolt inits with
65536 max bodies).  Slot ids above 32767 exercise the 16-bit packing in the
broadphase cell table (_TBL_IDX_MASK), the uint32 (a<<16|b) pair-compaction
key, the contact-compaction int lanes, and the solver's uint32 incidence
sort key — any sign-bit bug shows up as lost or corrupted pairs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from substrata_tpu.physics import broadphase, shapes
from substrata_tpu.physics.state import (Layer, MotionType, SimConfig,
                                         zero_body_state)
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

DT = 1 / 60


def test_simconfig_accepts_65536_and_rejects_more():
    cfg = SimConfig(capacity=65536, max_pairs=4096, grid_dim=16)
    assert cfg.capacity == 65536
    # Reference contact-constraint parity (10240) must fit in the uint32
    # incidence key budget at full body capacity.
    assert SimConfig(capacity=65536, max_pairs=4096, grid_dim=16,
                     max_active_contacts=10240).max_active_contacts == 10240
    with pytest.raises(ValueError):
        SimConfig(capacity=65537)


@pytest.mark.slow
def test_find_pairs_at_high_slots():
    # A cluster of overlapping spheres parked in the TOP slots of a
    # 65536-capacity world: every pair id has bit 15 set on both sides.
    cap = 65536
    n = 24
    slots = np.arange(cap - n, cap)
    rng = np.random.default_rng(5)
    pos = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    rad = rng.uniform(0.3, 0.8, n).astype(np.float32)

    body = zero_body_state(cap)
    body = body.replace(
        pos=body.pos.at[slots].set(jnp.asarray(pos)),
        bound_radius=body.bound_radius.at[slots].set(jnp.asarray(rad)),
        alive=body.alive.at[slots].set(True),
        awake=body.awake.at[slots].set(True),
        layer=body.layer.at[slots].set(int(Layer.MOVING)),
        motion_type=body.motion_type.at[slots].set(int(MotionType.DYNAMIC)),
    )
    cfg = SimConfig(capacity=cap, max_pairs=2048, grid_dim=16,
                    cell_size=2.0, cell_capacity=32, pairs_per_body=32)
    pa, pb, pv, num, ov = broadphase.find_pairs(body, cfg)
    pa, pb, pv = np.asarray(pa), np.asarray(pb), np.asarray(pv)
    found = sorted((int(a), int(b)) for a, b, v in zip(pa, pb, pv) if v)
    assert int(ov) == 0
    assert len(found) == len(set(found)), "duplicate pairs emitted"
    expect = set()
    margin = 0.08
    for i in range(n):
        for j in range(i + 1, n):
            r = rad[i] + rad[j] + margin
            if np.sum((pos[i] - pos[j]) ** 2) <= r * r:
                expect.add((int(slots[i]), int(slots[j])))
    assert set(found) == expect
    assert all(a >= cap - n and b >= cap - n for a, b in found)


@pytest.mark.slow
def test_full_step_at_high_slots():
    # Full pipeline (broadphase -> narrowphase -> compaction -> incidence
    # sort -> solve -> integrate) with dynamic bodies occupying slots above
    # 32768: spheres dropped onto the ground must settle at rest height.
    cap = 36000
    cfg = SimConfig(capacity=cap, max_pairs=4096, grid_dim=32,
                    cell_size=2.0, solver_iters=8)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    # Burn slots so the real bodies land above 32768 (free list is LIFO or
    # FIFO — either way consuming cap-8 slots leaves only the top ones).
    placeholders = []
    target_low = 34000
    while len(w._free) > cap - target_low:
        ob = PhysicsObject(shape=shapes.make_sphere(0.1),
                           pos=np.array([0.0, 0.0, -50.0], np.float32),
                           motion_type=int(MotionType.STATIC))
        ob.collidable = False
        placeholders.append(w.add_object(ob))
    obs = []
    for i in range(6):
        ob = PhysicsObject(shape=shapes.make_sphere(0.5),
                           pos=np.array([i * 0.9 - 2.5, 0.0, 1.5],
                                        np.float32),
                           motion_type=int(MotionType.DYNAMIC))
        obs.append(w.add_object(ob))
    assert all(ob.slot > 32768 for ob in obs), [ob.slot for ob in obs]
    for _ in range(150):
        w.think(DT)
    w.sync_transforms()
    for ob in obs:
        assert abs(ob.pos[2] - 0.5) < 0.05, (ob.slot, ob.pos)
