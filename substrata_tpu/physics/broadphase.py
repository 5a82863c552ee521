"""Uniform-grid (spatial hash) broadphase.

TPU-native replacement for Jolt's broadphase quadtree + body-pair manager
(reference limits: 65536 max body pairs, PhysicsWorld.cpp:497-506; layer pair
matrix PhysicsWorld.cpp:85-189).  Instead of a job-graph tree walk we:

1. hash every alive body's center cell into a bucket table (sort + rank),
2. gather candidates from the 27 neighbouring cells per body,
3. filter by bounding-sphere overlap / layer / liveness / i<j,
4. stream-compact the survivors into a fixed ``max_pairs`` pair list.

Bodies whose diameter exceeds the cell size are handled by a separate
"oversize" pass tested against all bodies (capped list), so correctness does
not depend on tuning cell_size — only performance does.

All shapes are conservatively bounded by ``bound_radius`` spheres; exact
overlap is re-checked in the narrowphase anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from substrata_tpu.physics.state import BodyState, SimConfig, MotionType

MAX_OVERSIZE = 64
_NEIGHBOR_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]

# Large primes for 3D cell hashing (standard spatial-hash constants).
_P1, _P2, _P3 = 73856093, 19349663, 83492791


def _hash_cells(cells: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return (h.astype(jnp.uint32) % jnp.uint32(num_buckets)).astype(jnp.int32)


def build_cell_table(body: BodyState, config: SimConfig):
    """Build bucket -> body-slot table.

    Returns (table [num_buckets+1, cap] i32 with -1 padding, cells [N,3] i32,
    overflow_count [] i32 — bodies dropped because their bucket was full).
    """
    n = body.capacity
    cap = config.cell_capacity
    num_buckets = config.grid_dim * config.grid_dim
    cells = jnp.floor(body.pos / config.cell_size).astype(jnp.int32)
    h = _hash_cells(cells, num_buckets)
    # Dead bodies go to a trash bucket that is never searched.
    h = jnp.where(body.alive, h, num_buckets)

    order = jnp.argsort(h)
    h_sorted = h[order]
    # Rank within equal-hash run.
    start = jnp.concatenate([jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(start, idx, 0))
    rank = idx - run_start

    table = jnp.full(((num_buckets + 1) * cap,), -1, jnp.int32)
    in_cap = rank < cap
    slot = jnp.where(in_cap, h_sorted * cap + rank, (num_buckets + 1) * cap - 1)
    # The last slot of the trash bucket absorbs overflow writes.
    table = table.at[slot].set(jnp.where(in_cap, order, -1).astype(jnp.int32), mode="drop")
    table = table.reshape(num_buckets + 1, cap)
    table = table.at[num_buckets].set(-1)  # clear trash bucket
    overflow = jnp.sum((~in_cap) & (h_sorted < num_buckets))
    return table, cells, overflow


def find_pairs(body: BodyState, config: SimConfig, margin: float = 0.08):
    """Produce a padded candidate pair list.

    Returns (pair_a [P] i32, pair_b [P] i32, pair_valid [P] bool,
    num_pairs [] i32, overflow [] i32).  pair_a < pair_b always.
    ``margin`` is the speculative-contact margin so touching-but-separated
    bodies still get contact rows (Jolt speculative contact distance ~0.02-0.1).
    """
    n = body.capacity
    cap = config.cell_capacity
    num_buckets = config.grid_dim * config.grid_dim
    table, cells, overflow = build_cell_table(body, config)

    # A pair is interesting if: both alive+collidable, at least one is an
    # awake dynamic/kinematic body, spheres overlap (+margin), and a < b.
    collidable = body.alive & body.collidable
    moving = body.awake & (body.motion_type != int(MotionType.STATIC))

    def can_pair(i, j):
        ok = collidable[i] & collidable[j] & (j != i) & (j >= 0)
        ok &= moving[i] | moving[j]
        # static-static never pairs
        both_static = (body.motion_type[i] == int(MotionType.STATIC)) & (
            body.motion_type[j] == int(MotionType.STATIC))
        ok &= ~both_static
        d = body.pos[i] - body.pos[j]
        r = body.bound_radius[i] + body.bound_radius[j] + margin
        ok &= jnp.sum(d * d, axis=-1) <= r * r
        return ok

    # --- Regular pass: 27-neighbourhood search. ---
    i_idx = jnp.arange(n, dtype=jnp.int32)
    cand_list = []
    for off in _NEIGHBOR_OFFSETS:
        nb = cells + jnp.array(off, jnp.int32)
        hb = _hash_cells(nb, num_buckets)
        cand_list.append(table[hb])  # [N, cap]
    cand = jnp.concatenate(cand_list, axis=1)  # [N, 27*cap]
    k = cand.shape[1]
    ii = jnp.broadcast_to(i_idx[:, None], (n, k))
    jj = cand
    jj_safe = jnp.maximum(jj, 0)
    small_i = 2.0 * body.bound_radius <= config.cell_size
    mask = can_pair(ii, jj_safe) & (jj > ii)
    # Only emit from the grid when BOTH bodies fit in a cell; oversize pass
    # below covers the rest (and emits each such pair exactly once).
    mask &= small_i[ii] & small_i[jj_safe]

    flat_i = ii.reshape(-1)
    flat_j = jj_safe.reshape(-1)
    flat_mask = mask.reshape(-1)

    # --- Oversize pass: big bodies vs everyone. ---
    oversize = body.alive & (2.0 * body.bound_radius > config.cell_size)
    (os_idx,) = jnp.nonzero(oversize, size=MAX_OVERSIZE, fill_value=-1)
    os_valid = os_idx >= 0
    os_i = jnp.broadcast_to(os_idx[:, None], (MAX_OVERSIZE, n))
    os_j = jnp.broadcast_to(i_idx[None, :], (MAX_OVERSIZE, n))
    os_i_safe = jnp.maximum(os_i, 0)
    os_mask = os_valid[:, None] & can_pair(os_i_safe, os_j)
    # Dedup: emit (min, max); when both oversize, only emit from the smaller id.
    a = jnp.minimum(os_i_safe, os_j)
    b = jnp.maximum(os_i_safe, os_j)
    both_os = oversize[os_j]
    os_mask &= ~(both_os & (os_j < os_i_safe))
    os_overflow = jnp.sum(oversize) - jnp.sum(os_valid)

    all_a = jnp.concatenate([flat_i, a.reshape(-1)])
    all_b = jnp.concatenate([flat_j, b.reshape(-1)])
    all_mask = jnp.concatenate([flat_mask, os_mask.reshape(-1)])

    # --- Stream compaction into the fixed pair buffer. ---
    out_idx = jnp.cumsum(all_mask) - 1
    num_pairs = jnp.sum(all_mask).astype(jnp.int32)
    keep = all_mask & (out_idx < config.max_pairs)
    dst = jnp.where(keep, out_idx, config.max_pairs)
    pair_a = jnp.full((config.max_pairs + 1,), -1, jnp.int32).at[dst].set(
        jnp.where(keep, all_a, -1), mode="drop")[: config.max_pairs]
    pair_b = jnp.full((config.max_pairs + 1,), -1, jnp.int32).at[dst].set(
        jnp.where(keep, all_b, -1), mode="drop")[: config.max_pairs]
    pair_valid = pair_a >= 0
    pair_overflow = jnp.maximum(num_pairs - config.max_pairs, 0)
    return pair_a, pair_b, pair_valid, num_pairs, overflow + os_overflow + pair_overflow
