"""Broadphase correctness vs a brute-force O(N^2) oracle.

The half-stencil grid search (broadphase.find_pairs) must produce exactly
the bounding-sphere-overlap pair set — no misses, no duplicates — matching
the exhaustive pair enumeration Jolt's quadtree guarantees (reference caps:
PhysicsWorld.cpp:497-506).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from substrata_tpu.physics import broadphase
from substrata_tpu.physics.state import (Layer, MotionType, SimConfig,
                                         zero_body_state)


def _random_bodies(n, rng, spread=20.0, rmin=0.2, rmax=0.9, cap=64):
    body = zero_body_state(cap)
    pos = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    rad = rng.uniform(rmin, rmax, n).astype(np.float32)
    body = body.replace(
        pos=body.pos.at[:n].set(jnp.asarray(pos)),
        bound_radius=body.bound_radius.at[:n].set(jnp.asarray(rad)),
        alive=body.alive.at[:n].set(True),
        awake=body.awake.at[:n].set(True),
        layer=body.layer.at[:n].set(int(Layer.MOVING)),
        motion_type=body.motion_type.at[:n].set(int(MotionType.DYNAMIC)),
    )
    return body, pos, rad


def _brute_pairs(pos, rad, margin=0.08):
    n = len(pos)
    out = set()
    for i in range(n):
        for j in range(i + 1, n):
            r = rad[i] + rad[j] + margin
            if np.sum((pos[i] - pos[j]) ** 2) <= r * r:
                out.add((i, j))
    return out


def _found_pairs(body, cfg, **kw):
    pa, pb, pv, num, ov = broadphase.find_pairs(body, cfg, **kw)
    pa, pb, pv = np.asarray(pa), np.asarray(pb), np.asarray(pv)
    found = [(int(a), int(b)) for a, b, v in zip(pa, pb, pv) if v]
    return found, int(ov)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_half_stencil_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    cfg = SimConfig(capacity=64, max_pairs=2048, grid_dim=16,
                    cell_size=2.0, cell_capacity=8, pairs_per_body=24)
    body, pos, rad = _random_bodies(48, rng)
    found, ov = _found_pairs(body, cfg)
    assert ov == 0
    assert len(found) == len(set(found)), "duplicate pairs emitted"
    assert set(found) == _brute_pairs(pos, rad)


def test_dense_cluster_no_duplicates():
    # Many bodies crammed into few cells: exercises same-cell emission,
    # neighbour-bucket hash collisions, and the sort-dedup.
    rng = np.random.default_rng(7)
    cfg = SimConfig(capacity=64, max_pairs=4096, grid_dim=8,
                    cell_size=1.5, cell_capacity=32, pairs_per_body=48)
    body, pos, rad = _random_bodies(40, rng, spread=2.5, rmin=0.1, rmax=0.4)
    found, ov = _found_pairs(body, cfg)
    assert ov == 0
    assert len(found) == len(set(found)), "duplicate pairs emitted"
    assert set(found) == _brute_pairs(pos, rad)


def test_oversize_flag_off_counts_overflow():
    # A body wider than a cell with has_oversize=False must surface in the
    # overflow counter (CLAUDE.md rule: every cap has a counter), and with
    # the pass enabled its pairs must be found.
    rng = np.random.default_rng(3)
    cfg = SimConfig(capacity=64, max_pairs=2048, grid_dim=16,
                    cell_size=2.0, cell_capacity=8, pairs_per_body=24)
    body, pos, rad = _random_bodies(20, rng, spread=6.0)
    big = 3.0  # diameter 6 > cell_size 2
    body = body.replace(
        bound_radius=body.bound_radius.at[0].set(big),
        pos=body.pos.at[0].set(jnp.zeros(3)))
    pos[0] = 0.0
    rad2 = rad.copy()
    rad2[0] = big

    found_on, ov_on = _found_pairs(body, cfg, has_oversize=True)
    assert ov_on == 0
    assert set(found_on) == _brute_pairs(pos, rad2)

    _, ov_off = _found_pairs(body, cfg, has_oversize=False)
    assert ov_off >= 1  # the dropped oversize body is counted


def test_per_body_margin_array():
    rng = np.random.default_rng(11)
    cfg = SimConfig(capacity=64, max_pairs=2048, grid_dim=16,
                    cell_size=2.0, cell_capacity=8, pairs_per_body=24)
    body, pos, rad = _random_bodies(32, rng)
    margins = rng.uniform(0.0, 0.5, 64).astype(np.float32)
    found, ov = _found_pairs(body, cfg, margin=jnp.asarray(margins))
    assert ov == 0
    n = 32
    expect = set()
    for i in range(n):
        for j in range(i + 1, n):
            r = rad[i] + rad[j] + 0.5 * (margins[i] + margins[j])
            if np.sum((pos[i] - pos[j]) ** 2) <= r * r:
                expect.add((i, j))
    assert set(found) == expect
