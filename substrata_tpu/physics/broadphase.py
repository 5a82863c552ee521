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

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from substrata_tpu.physics.state import (BodyState, MotionType, ShapeType,
                                         SimConfig)

MAX_OVERSIZE = 64
# Full 27-cell stencil: used by one-sided queries (character controller
# candidate search) where the querying body needs neighbours in EVERY
# direction.
_NEIGHBOR_OFFSETS = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                     for dz in (-1, 0, 1)]
# HALF stencil: own cell + the 13 lexicographically-positive neighbours.
# Each true cell pair (A, B) is scanned exactly once (from the lesser cell),
# halving the dominant candidate gather vs the full 27-cell stencil.  Bucket
# hash collisions can emit a pair from BOTH sides (a backward cell aliasing
# onto a forward bucket); the post-compaction sort-dedup below removes those.
_HALF_OFFSETS = [(0, 0, 0)] + [
    (dx, dy, dz)
    for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    if (dz, dy, dx) > (0, 0, 0)
]

# Large primes for 3D cell hashing (standard spatial-hash constants).
_P1, _P2, _P3 = 73856093, 19349663, 83492791


def _hash_cells(cells: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return (h.astype(jnp.uint32) % jnp.uint32(num_buckets)).astype(jnp.int32)


# Flag bits packed into cell-table entries above the 16-bit body index, so
# candidate filtering needs no second gather of per-body flags (16 bits =
# the reference's 65536 max-body parity, PhysicsWorld.cpp:492-506).
_TBL_IDX_MASK = 0xFFFF
_TBL_MOVING = 1 << 16    # awake non-static
_TBL_STATIC = 1 << 17
_TBL_SMALL = 1 << 18     # fits in a cell (diameter <= cell_size)
# Pair compaction packs (a << 16 | b) into a uint32; all-ones = empty slot
# (sorts last, so valid pairs stay contiguous after the dedup sort).
# np (not jnp) so importing this module never initialises a JAX backend —
# bench.py's outage-fallback path depends on imports staying host-only.
_PAIR_EMPTY = np.uint32(0xFFFFFFFF)


def build_cell_table(body: BodyState, config: SimConfig, with_flags: bool = False):
    """Build bucket -> body-slot table.

    Returns (table [num_buckets+1, cap] i32 with -1 padding, cells [N,3] i32,
    overflow_count [] i32 — bodies dropped because their bucket was full).
    With with_flags=True entries carry _TBL_* bits; mask with _TBL_IDX_MASK
    for the body index.  Only alive + collidable bodies are inserted.
    """
    n = body.capacity
    cap = config.cell_capacity
    num_buckets = config.grid_dim * config.grid_dim
    cells = jnp.floor(body.pos / config.cell_size).astype(jnp.int32)
    h = _hash_cells(cells, num_buckets)
    # Dead / non-collidable bodies go to a trash bucket that is never searched.
    h = jnp.where(body.alive & body.collidable, h, num_buckets)

    order = jnp.argsort(h)
    h_sorted = h[order]
    # Rank within equal-hash run.
    start = jnp.concatenate([jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(start, idx, 0))
    rank = idx - run_start

    entry = order.astype(jnp.int32)
    if with_flags:
        moving = body.awake & (body.motion_type != int(MotionType.STATIC))
        is_static = body.motion_type == int(MotionType.STATIC)
        small = 2.0 * body.bound_radius <= config.cell_size
        bits = (moving.astype(jnp.int32) * _TBL_MOVING
                + is_static.astype(jnp.int32) * _TBL_STATIC
                + small.astype(jnp.int32) * _TBL_SMALL)
        entry = entry | bits[order]

    table = jnp.full(((num_buckets + 1) * cap,), -1, jnp.int32)
    in_cap = rank < cap
    slot = jnp.where(in_cap, h_sorted * cap + rank, (num_buckets + 1) * cap - 1)
    # The last slot of the trash bucket absorbs overflow writes.
    table = table.at[slot].set(jnp.where(in_cap, entry, -1), mode="drop")
    table = table.reshape(num_buckets + 1, cap)
    table = table.at[num_buckets].set(-1)  # clear trash bucket
    overflow = jnp.sum((~in_cap) & (h_sorted < num_buckets))
    return table, cells, overflow


def find_pairs(body: BodyState, config: SimConfig, margin=0.08,
               has_oversize: bool = True):
    """Produce a padded candidate pair list.

    Returns (pair_a [P] i32, pair_b [P] i32, pair_valid [P] bool,
    num_pairs [] i32, overflow [] i32).  pair_a < pair_b always.
    ``margin`` is the speculative-contact margin so touching-but-separated
    bodies still get contact rows (Jolt speculative contact distance
    ~0.02-0.1).  It may be a scalar or a per-body [N] array (the temporal
    pair cache passes per-body margins scaled by each body's speed, so one
    fast body does not inflate the whole world's pair count).

    ``has_oversize`` (static) compiles the oversize pass away when the host
    knows no body's diameter exceeds cell_size (PhysicsWorld tracks this at
    flush time): the pass's [MAX_OVERSIZE, N] emission otherwise dominates
    the global compaction scatter's input rows (scatter cost on TPU is per
    INPUT row).  If the flag is stale, the dropped bodies are counted in
    ``overflow`` instead of failing silently.
    """
    n = body.capacity
    cap = config.cell_capacity
    num_buckets = config.grid_dim * config.grid_dim
    table, cells, overflow = build_cell_table(body, config, with_flags=True)

    # Packed candidate view: one gather row per candidate (pos3 + inflated
    # radius); eligibility flags ride in the table entries' high bits, so
    # filtering needs exactly one gather.  TPU gathers dominate the cost.
    collidable = body.alive & body.collidable
    moving = body.awake & (body.motion_type != int(MotionType.STATIC))
    is_static = body.motion_type == int(MotionType.STATIC)
    small = 2.0 * body.bound_radius <= config.cell_size
    half_margin = 0.5 * jnp.broadcast_to(jnp.asarray(margin, jnp.float32), (n,))
    infl_radius = body.bound_radius + half_margin
    # Shape INRADIUS (largest sphere inside the shape): sphere/capsule = r,
    # box = min half-extent, hull ~ half the bound radius (conservative).
    sp = body.shape_params
    inner_radius = jnp.where(
        body.shape_type == int(ShapeType.BOX),
        jnp.min(sp[:, :3], axis=1),
        jnp.where(body.shape_type == int(ShapeType.HULL),
                  0.5 * body.bound_radius, sp[:, 0]))
    # Row layout: pos3 | margin-inflated radius | inradius.  The inradius
    # rides along so dropped candidates can be classified: dropping a
    # margin-only graze is by-design shedding, while centres closer than
    # the SUM OF INRADII mean the shapes definitely interpenetrate — losing
    # such a pair is real capacity pressure, and only those feed the
    # overflow counter (a circumradius test over-counts ~20x for box
    # lattices, where bounding spheres overlap across non-touching cells).
    posr = jnp.concatenate([body.pos, infl_radius[:, None],
                            inner_radius[:, None]], axis=1)  # [N,5]

    # --- Regular pass: half-stencil (14-bucket) neighbourhood search. ---
    i_idx = jnp.arange(n, dtype=jnp.int32)
    hbs = []
    for off in _HALF_OFFSETS:
        nb = cells + jnp.array(off, jnp.int32)
        hbs.append(_hash_cells(nb, num_buckets))
    noff = len(_HALF_OFFSETS)
    hb = jnp.stack(hbs, axis=1)                 # [N, 14]
    cand = table[hb.reshape(-1)].reshape(n, noff * cap)  # [N, 14*cap] flagged
    k = cand.shape[1]
    jj = jnp.where(cand >= 0, cand & _TBL_IDX_MASK, -1)
    j_moving = (cand & _TBL_MOVING) > 0
    j_static = (cand & _TBL_STATIC) > 0
    j_small = (cand & _TBL_SMALL) > 0
    ii = jnp.broadcast_to(i_idx[:, None], (n, k))
    jj_safe = jnp.maximum(jj, 0)
    # Own-cell bucket (first cap columns): emit once from the lower slot.
    # Forward buckets: emit every valid j (the pair is scanned only here).
    own_col = jnp.arange(k, dtype=jnp.int32) < cap
    mask = jnp.where(own_col[None, :], jj > ii, (jj >= 0) & (jj != ii))
    mask &= collidable[:, None]            # i eligibility (no gather: own row)
    mask &= moving[:, None] | j_moving
    mask &= ~(is_static[:, None] & j_static)
    mask &= small[:, None] & j_small       # grid pass: both fit in a cell
    pj = posr[jj_safe]                     # [N, k, 5] — the one gather
    d = body.pos[:, None, :] - pj[..., :3]
    d2 = jnp.sum(d * d, axis=-1)
    r = infl_radius[:, None] + pj[..., 3]
    mask &= d2 <= r * r
    r_tight = inner_radius[:, None] + pj[..., 4]
    tight = mask & (d2 <= r_tight * r_tight)

    # Per-row top-K selection (lax.top_k is fast on TPU) shrinks the global
    # compaction from N*27*cap candidates to N*K.  Score by PROXIMITY
    # (inflated-sphere overlap), not candidate order: under overflow the
    # dropped pairs must be the far speculative ones — an arbitrary-order
    # drop can shed a deeply-touching neighbour while keeping a margin
    # graze, and a dropped touching pair is an invisible interpenetration.
    ppb = config.pairs_per_body
    score = jnp.where(mask, r * r - d2, -1e9)
    _, sel = jax.lax.top_k(score, ppb)                     # [N, ppb]
    sel_mask = jnp.take_along_axis(mask, sel, axis=1)
    sel_j = jnp.take_along_axis(jj_safe, sel, axis=1)
    sel_tight = jnp.take_along_axis(tight, sel, axis=1)
    # Two different neighbour cells can hash to the same bucket, which would
    # emit DUPLICATE pairs (double contact impulses).  Dedup among the ppb
    # selected candidates (28 lane compares) instead of the 27-cell bucket
    # row (351 compares + 27 scatters).
    for j in range(1, ppb):
        dup_j = jnp.any((sel_j[:, :j] == sel_j[:, j:j + 1])
                        & sel_mask[:, :j], axis=1)
        sel_mask = sel_mask.at[:, j].set(sel_mask[:, j] & ~dup_j)
    # Capacity-pressure counter: TIGHT candidates that fell off the per-body
    # top-K (the proximity score ranks tight ones first, so any tight drop
    # means ppb is genuinely too small for this body's neighbourhood).
    # Margin-only grazes shed here are by-design and NOT counted.
    row_overflow = jnp.maximum(
        jnp.sum(tight.astype(jnp.int32), axis=1)
        - jnp.sum((sel_mask & sel_tight).astype(jnp.int32), axis=1), 0)

    # SLOT-MAJOR emission (slot 0 of every body, then slot 1, ...): the
    # global pair-buffer compaction keeps the FIRST max_pairs rows, so under
    # overflow a body-major layout drops every pair of the highest-indexed
    # bodies while low-indexed bodies keep all ppb of theirs; slot-major
    # sheds each body's shallowest candidates instead (slot 0 = closest,
    # thanks to the proximity top-K above).  Half-stencil emission can run
    # either direction, so order each pair as (min, max) here.
    sel_i = jnp.broadcast_to(i_idx[:, None], (n, ppb))
    flat_i = jnp.minimum(sel_i, sel_j).T.reshape(-1)
    flat_j = jnp.maximum(sel_i, sel_j).T.reshape(-1)
    flat_mask = sel_mask.T.reshape(-1)
    flat_tight = (sel_mask & sel_tight).T.reshape(-1)
    overflow = overflow + jnp.sum(row_overflow)

    def can_pair_v(vi, vj, jj_ok):
        # Oversize pass filter over packed [pos3|infl_radius|raw_radius|
        # collidable|moving|static|small] rows.
        ok = (vi[..., 5] > 0) & (vj[..., 5] > 0) & jj_ok
        ok &= (vi[..., 6] > 0) | (vj[..., 6] > 0)
        ok &= ~((vi[..., 7] > 0) & (vj[..., 7] > 0))
        dd = vi[..., :3] - vj[..., :3]
        rr = vi[..., 3] + vj[..., 3]      # radii already margin-inflated
        ok &= jnp.sum(dd * dd, axis=-1) <= rr * rr
        return ok

    view = jnp.concatenate([
        posr,
        collidable[:, None].astype(jnp.float32),
        moving[:, None].astype(jnp.float32),
        is_static[:, None].astype(jnp.float32),
        small[:, None].astype(jnp.float32),
    ], axis=1)  # [N, 9] — used only by the (small) oversize pass

    # --- Oversize pass: big bodies vs everyone (no gathers: one row of the
    # view per oversize body broadcast against the full view).  Compiled
    # away entirely when the host guarantees no oversize bodies exist —
    # its [MAX_OVERSIZE, N] rows otherwise dominate the compaction
    # scatter's input (stale flag surfaces as overflow, not silence). ---
    oversize = body.alive & (2.0 * body.bound_radius > config.cell_size)
    if has_oversize:
        (os_idx,) = jnp.nonzero(oversize, size=MAX_OVERSIZE, fill_value=-1)
        os_valid = os_idx >= 0
        os_i = jnp.broadcast_to(os_idx[:, None], (MAX_OVERSIZE, n))
        os_j = jnp.broadcast_to(i_idx[None, :], (MAX_OVERSIZE, n))
        os_i_safe = jnp.maximum(os_i, 0)
        v_os = view[jnp.maximum(os_idx, 0)][:, None, :]   # [O, 1, 8]
        v_all = view[None, :, :]                           # [1, N, 8]
        os_mask = os_valid[:, None] & can_pair_v(v_os, v_all, os_j != os_i_safe)
        # Dedup: emit (min, max); when both oversize, only emit from the smaller id.
        a = jnp.minimum(os_i_safe, os_j)
        b = jnp.maximum(os_i_safe, os_j)
        # os_j is just arange(n) broadcast — indexing with it is a broadcast,
        # not a gather (oversize[os_j] compiled to a 0.66 ms pred-gather).
        both_os = jnp.broadcast_to(oversize[None, :], (MAX_OVERSIZE, n))
        os_mask &= ~(both_os & (os_j < os_i_safe))
        os_overflow = jnp.sum(oversize) - jnp.sum(os_valid)
        all_a = jnp.concatenate([flat_i, a.reshape(-1)])
        all_b = jnp.concatenate([flat_j, b.reshape(-1)])
        all_mask = jnp.concatenate([flat_mask, os_mask.reshape(-1)])
        # Oversize pairs carry no tightness info; count any drop as real.
        all_tight = jnp.concatenate([flat_tight, os_mask.reshape(-1)])
    else:
        os_overflow = jnp.sum(oversize)
        all_a, all_b, all_mask, all_tight = flat_i, flat_j, flat_mask, flat_tight

    # --- Stream compaction into the fixed pair buffer (ONE scatter of a
    # packed (a << 16 | b) uint32 key — scatters are expensive on TPU; the
    # 16-bit fields give the reference's 65536-body capacity.  The empty
    # sentinel is all-ones, which can never collide with a real pair:
    # a == b == 65535 would require a self-pair, which is filtered out. ---
    out_idx = jnp.cumsum(all_mask) - 1
    num_pairs = jnp.sum(all_mask).astype(jnp.int32)
    keep = all_mask & (out_idx < config.max_pairs)
    dst = jnp.where(keep, out_idx, config.max_pairs)
    packed = ((all_a.astype(jnp.uint32) << 16) | all_b.astype(jnp.uint32))
    buf = jnp.full((config.max_pairs + 1,), _PAIR_EMPTY, jnp.uint32).at[dst].set(
        jnp.where(keep, packed, _PAIR_EMPTY), mode="drop")[: config.max_pairs]
    # Half-stencil + bucket hash collisions can emit a pair twice (once per
    # side).  A duplicate pair means DOUBLE contact impulses, so dedup the
    # compacted buffer: sort the packed keys (cheap at max_pairs scale) and
    # mask equal-adjacent rows.  Downstream order doesn't matter — the
    # narrowphase re-sorts pairs by shape-combo code anyway.
    buf = jnp.sort(buf)
    dup = jnp.concatenate([jnp.zeros((1,), bool), buf[1:] == buf[:-1]])
    pair_valid = (buf != _PAIR_EMPTY) & ~dup
    pair_a = jnp.where(pair_valid, (buf >> 16).astype(jnp.int32), -1)
    pair_b = jnp.where(pair_valid, (buf & 0xFFFF).astype(jnp.int32), -1)
    # Buffer-cap pressure: only dropped TIGHT rows count (the slot-major +
    # proximity ordering puts margin-only grazes last, so they are shed
    # first and their loss is by design, not a correctness event).
    pair_overflow = jnp.sum((all_tight & ~keep).astype(jnp.int32))
    return pair_a, pair_b, pair_valid, num_pairs, overflow + os_overflow + pair_overflow


# ---------------------------------------------------------------------------
# Temporal pair caching
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class PairCache:
    """Broadphase pair list reused across steps (Jolt analogue: the body-pair
    cache; here it amortises the grid rebuild + 27-cell candidate gather,
    which dominates the step at 10k bodies).

    The rebuild enlarges the pair margin to cover the worst-case relative
    motion over the reuse window, and the window adapts to the current max
    speed so fast scenes rebuild more often instead of blowing up the margin
    (and with it the pair count)."""

    pair_a: jnp.ndarray      # [P] i32
    pair_b: jnp.ndarray      # [P] i32
    pair_valid: jnp.ndarray  # [P] bool
    num_pairs: jnp.ndarray   # [] i32
    steps_left: jnp.ndarray  # [] i32; <= 0 forces a rebuild this step
    # Pair-entry incidence table for the solver's BLOCKED contact layout
    # (solver.build_incidence over narrowphase pair entries): entry
    # occupancy is stable across the reuse window, so the ~5 ms table sort
    # is paid once per rebuild.  physics_step refreshes these on rebuild
    # steps; they ride along unchanged on reuse steps.
    inc_table: jnp.ndarray   # [N, CPB] i32 (-1 empty)
    inc_sign: jnp.ndarray    # [N, CPB] f32


def empty_pair_cache(config: SimConfig) -> PairCache:
    p = config.max_pairs
    return PairCache(
        pair_a=jnp.full((p,), -1, jnp.int32),
        pair_b=jnp.full((p,), -1, jnp.int32),
        pair_valid=jnp.zeros((p,), bool),
        num_pairs=jnp.int32(0),
        steps_left=jnp.int32(0),
        inc_table=jnp.full((config.capacity, config.contacts_per_body),
                           -1, jnp.int32),
        inc_sign=jnp.zeros((config.capacity, config.contacts_per_body),
                           jnp.float32),
    )


def _pairs_rebuild(body: BodyState, dt, config: SimConfig,
                   has_oversize: bool = True):
    """The rebuild branch: find_pairs with speed-scaled per-body margins and
    an adaptive reuse window.  Returns (pa, pb, pv, num, ov, steps_left)."""
    interval = config.pair_rebuild_interval
    speed = jnp.linalg.norm(body.linvel, axis=-1)
    speed = jnp.where(body.alive & body.awake, speed, 0.0)
    vmax = jnp.max(speed)
    margin_cap = 0.6 * config.cell_size
    window = jnp.clip(
        jnp.floor(margin_cap / jnp.maximum(vmax * dt, 1e-6)),
        1, interval).astype(jnp.int32)
    wf = window.astype(jnp.float32)
    # Per-side margin: base speculative margin + personal travel bound.
    # Each side covers its OWN worst-case travel over the window; the pair
    # test sums both sides, which bounds the relative approach (a 2x factor
    # here doubled the post-impulse pair count for no correctness gain —
    # gravity's mid-window acceleration, ~5 cm over 6 steps at 60 Hz, is
    # covered by the 8 cm base margin).
    margin = 0.08 + speed * wf * dt
    pa, pb, pv, num, ov = find_pairs(body, config, margin=margin,
                                     has_oversize=has_oversize)
    return pa, pb, pv, num, ov, window - 1


def find_pairs_cached(body: BodyState, cache: PairCache, dt,
                      config: SimConfig, rebuild: bool | None = None,
                      has_oversize: bool = True):
    """find_pairs with temporal reuse.

    Returns (pair_a, pair_b, pair_valid, num_pairs, overflow, new_cache).
    Rebuilds when cache.steps_left <= 0; otherwise returns the cached list.
    At rebuild each body's bound radius is inflated by its OWN speed times
    the reuse window, so pairs cover worst-case motion without one fast body
    inflating the whole world's pair count.  The window shrinks only when
    something moves so fast its personal margin would exceed ~a grid cell.
    The caller must force steps_left=0 whenever bodies are moved externally
    (PhysicsWorld does this on every host flush) and when bodies wake.

    ``rebuild`` selects the branch STATICALLY (host-driven scheduling; the
    host reads cache.steps_left one step behind, see PhysicsWorld.think):
    the device lax.cond costs ~2.5 ms/step of branch machinery + buffer
    copies at 10k bodies even on pure-reuse steps.  None keeps the on-device
    cond (always correct, used where the host has no pipeline).
    """
    if rebuild is True:
        pa, pb, pv, num, ov, left = _pairs_rebuild(body, dt, config,
                                                   has_oversize)
    elif rebuild is False:
        pa, pb, pv, num, ov, left = (
            cache.pair_a, cache.pair_b, cache.pair_valid,
            cache.num_pairs, jnp.int32(0), cache.steps_left - 1)
    else:
        pa, pb, pv, num, ov, left = jax.lax.cond(
            cache.steps_left <= 0,
            lambda _: _pairs_rebuild(body, dt, config, has_oversize),
            lambda _: (cache.pair_a, cache.pair_b, cache.pair_valid,
                       cache.num_pairs, jnp.int32(0), cache.steps_left - 1),
            operand=None)
    new_cache = PairCache(pair_a=pa, pair_b=pb, pair_valid=pv,
                          num_pairs=num, steps_left=left,
                          inc_table=cache.inc_table,
                          inc_sign=cache.inc_sign)
    return pa, pb, pv, num, ov, new_cache
