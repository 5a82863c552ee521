"""Spatial domain decomposition of ONE physics world across the device mesh.

The worlds-DP axis in ``mesh.py`` scales independent world instances; this
module scales a SINGLE world: space is split into x-slabs, each device owns
the bodies inside its slab, and per step each device exchanges a fixed-size
"halo" of boundary bodies with its left/right neighbours over ICI via
``jax.lax.ppermute`` (SURVEY.md §2.7 — the reference scales one world only
via Jolt's multithreaded job system on one host; a TPU pod needs domain
decomposition instead).

Correctness model: with ``halo_width`` at least twice the maximum body
interaction diameter, every contact involving a device's LOCAL body is
reproduced on that device (both endpoints are present locally or in the
halo), so the mass-splitting Jacobi solver (physics/solver.py) applies the
same per-iteration impulses to a local body as the unsharded step — the
sharded result matches the unsharded step to floating-point tolerance.
Ghost (halo) copies are stepped too but their post-step state is discarded;
their authoritative update happens on the owner device, which sees the same
contact set symmetrically.

Rebalancing: bodies drift across slab boundaries over time.  Owners remain
correct (a body slightly outside its slab is still simulated correctly —
the slab only determines OWNERSHIP, and its neighbours still see it via the
halo), but long drifts shrink effective halo coverage, so callers re-run
``partition_by_slab`` every N steps (host-side, like the reference's
periodic broadphase optimize, PhysicsWorld.cpp:1446-1486 neighbourhood).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from substrata_tpu.physics import step as step_mod
from substrata_tpu.physics.state import BodyState, SimConfig, SimParams, StaticWorld


def _tree_take(state, idx):
    return jax.tree_util.tree_map(lambda x: x[idx], state)


def _tree_concat(states):
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, 0), *states)


def partition_by_slab(body: BodyState, n_slabs: int, local_cap: int,
                      x_min: float, x_max: float):
    """Host-side: re-order a world's bodies into ``n_slabs`` fixed-capacity
    slots by x-slab.  Returns (sharded BodyState [n_slabs*local_cap, ...],
    owner_slot[int array mapping original slot -> new global slot, -1 if the
    original slot was dead]).

    Raises if any slab overflows ``local_cap`` — pick local_cap with
    headroom (the reference hard-fails on body-count limits the same way,
    PhysicsWorld.cpp:492-506).
    """
    host = jax.tree_util.tree_map(np.asarray, body)
    alive = host.alive
    n = alive.shape[0]
    slab_w = (x_max - x_min) / n_slabs
    slab = np.clip(((host.pos[:, 0] - x_min) / slab_w).astype(np.int32),
                   0, n_slabs - 1)
    owner_slot = np.full(n, -1, np.int64)
    # Gather indices per slab; empty tail slots point at a dead template.
    take = np.zeros(n_slabs * local_cap, np.int64)
    valid = np.zeros(n_slabs * local_cap, bool)
    for s in range(n_slabs):
        ids = np.nonzero(alive & (slab == s))[0]
        if len(ids) > local_cap:
            raise ValueError(
                f"slab {s} holds {len(ids)} bodies > local_cap {local_cap}")
        take[s * local_cap:s * local_cap + len(ids)] = ids
        valid[s * local_cap:s * local_cap + len(ids)] = True
        owner_slot[ids] = s * local_cap + np.arange(len(ids))
    out = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[take]),
                                 body)
    out = out.replace(alive=jnp.asarray(valid),
                      awake=out.awake & jnp.asarray(valid))
    return out, owner_slot


def _pack_halo(local: BodyState, mask, halo_cap: int) -> BodyState:
    """Extract up to halo_cap masked bodies into a fixed-size BodyState;
    unfilled slots are dead."""
    order = jnp.argsort(~mask)                      # True entries first
    idx = order[:halo_cap]
    picked = _tree_take(local, idx)
    valid = mask[idx]
    return picked.replace(alive=picked.alive & valid,
                          awake=picked.awake & valid)


def halo_exchange(local: BodyState, halo_cap: int, halo_width: float,
                  x_min: float, x_max: float, axis_name: str, n_dev: int):
    """Inside shard_map: send boundary bodies to each neighbour, receive
    theirs.  Returns (from_left, from_right, overflow): fixed-size
    BodyStates (dead slots where nothing was received — edge devices
    receive zeros from ppermute's missing links, which decode as dead since
    alive=0) and the per-device count of boundary bodies that did NOT fit
    in halo_cap.  A dropped halo body means its contacts are invisible on
    the neighbour this step (silent divergence), so the count MUST be
    surfaced (CLAUDE.md: every buffer cap has an overflow counter)."""
    d = jax.lax.axis_index(axis_name)
    slab_w = (x_max - x_min) / n_dev
    left_edge = x_min + d.astype(jnp.float32) * slab_w
    right_edge = left_edge + slab_w
    x = local.pos[:, 0]
    mask_right = local.alive & (x > right_edge - halo_width)
    mask_left = local.alive & (x < left_edge + halo_width)
    send_right = _pack_halo(local, mask_right, halo_cap)
    send_left = _pack_halo(local, mask_left, halo_cap)
    overflow = (jnp.maximum(jnp.sum(mask_right) - halo_cap, 0)
                + jnp.maximum(jnp.sum(mask_left) - halo_cap, 0))
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]
    from_left = jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis_name, fwd), send_right)
    from_right = jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis_name, bwd), send_left)
    return from_left, from_right, overflow


def _halo_config(config: SimConfig, combined_cap: int) -> SimConfig:
    return SimConfig(
        capacity=combined_cap,
        max_pairs=config.max_pairs,
        max_contacts_per_pair=config.max_contacts_per_pair,
        grid_dim=config.grid_dim,
        cell_capacity=config.cell_capacity,
        cell_size=config.cell_size,
        solver_iters=config.solver_iters,
        static_contacts_per_body=config.static_contacts_per_body,
        max_tri_candidates=config.max_tri_candidates,
        contacts_per_body=config.contacts_per_body,
        max_active_contacts=config.max_active_contacts,
        pairs_per_body=config.pairs_per_body,
        pair_rebuild_interval=1,        # ghosts change every step: no caching
        present_shape_types=config.present_shape_types,
    )


def spatial_world_step(body: BodyState, world: StaticWorld, hull_cv,
                       dt, params: SimParams, config: SimConfig, mesh: Mesh,
                       halo_cap: int, halo_width: float,
                       x_min: float, x_max: float):
    """One step of ONE world spatially sharded over the mesh.

    ``body`` is a BodyState of capacity n_dev*local_cap laid out by
    ``partition_by_slab`` and sharded over the mesh's first axis.  Each
    device ppermutes halo bodies with its neighbours, steps its local+ghost
    set with the ordinary fused ``physics_step``, and keeps only the local
    slice.  Returns (new_body sharded as input, global awake count).
    """
    from jax import shard_map

    naxis = mesh.axis_names[0]
    n_dev = int(np.prod(mesh.devices.shape))
    total_cap = body.capacity
    local_cap = total_cap // n_dev
    combined_cap = local_cap + 2 * halo_cap
    cfg = _halo_config(config, combined_cap)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(naxis), P(), P()),
             out_specs=(P(naxis), P(), P()),
             check_vma=False)
    def stepper(local, world_rep, hull_rep):
        from_left, from_right, halo_ov = halo_exchange(
            local, halo_cap, halo_width, x_min, x_max, naxis, n_dev)
        combined = _tree_concat([local, from_left, from_right])
        out = step_mod.physics_step(combined, world_rep, hull_rep,
                                    dt, params, cfg)
        new_body = out[0]
        new_local = jax.tree_util.tree_map(lambda x: x[:local_cap], new_body)
        awake = jax.lax.psum(
            jnp.sum(new_local.awake & new_local.alive), naxis)
        halo_overflow = jax.lax.psum(halo_ov, naxis)
        return new_local, awake, halo_overflow

    return stepper(body, world, hull_cv)


def shard_partitioned(body: BodyState, mesh: Mesh) -> BodyState:
    """Device-put a partitioned BodyState with its capacity axis sharded
    over ALL mesh axes (1-D slab or 2-D tile layouts alike — tile index is
    x-major, matching the mesh's device raveling)."""
    spec = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), body)


# ---------------------------------------------------------------------------
# 2-D tile decomposition
# ---------------------------------------------------------------------------
# 1-D x-slabs stop scaling when the slab width approaches the interaction
# diameter (a 256-chip pod slicing one world into 256 slabs would make every
# body a boundary body).  The 2-D variant splits space into PX x PY tiles
# over a 2-D mesh and exchanges halos in TWO phases: an x-phase over the
# "sx" axis, then a y-phase over "sy" packing from local + x-ghosts — the
# standard corner trick, so diagonal-neighbour contacts (which pure per-axis
# exchange misses) arrive via the y-pass of an x-ghost.


def partition_by_tile(body: BodyState, px: int, py: int, local_cap: int,
                      x_min: float, x_max: float, y_min: float, y_max: float):
    """Host-side: re-order a world's bodies into px*py fixed-capacity tile
    slots (row-major y-fastest to match a ("sx", "sy") mesh reshape).
    Returns (sharded BodyState [px*py*local_cap, ...], owner_slot)."""
    host = jax.tree_util.tree_map(np.asarray, body)
    alive = host.alive
    n = alive.shape[0]
    wx = (x_max - x_min) / px
    wy = (y_max - y_min) / py
    tx = np.clip(((host.pos[:, 0] - x_min) / wx).astype(np.int32), 0, px - 1)
    ty = np.clip(((host.pos[:, 1] - y_min) / wy).astype(np.int32), 0, py - 1)
    tile = tx * py + ty
    owner_slot = np.full(n, -1, np.int64)
    take = np.zeros(px * py * local_cap, np.int64)
    valid = np.zeros(px * py * local_cap, bool)
    for t in range(px * py):
        ids = np.nonzero(alive & (tile == t))[0]
        if len(ids) > local_cap:
            raise ValueError(
                f"tile {t} holds {len(ids)} bodies > local_cap {local_cap}")
        take[t * local_cap:t * local_cap + len(ids)] = ids
        valid[t * local_cap:t * local_cap + len(ids)] = True
        owner_slot[ids] = t * local_cap + np.arange(len(ids))
    out = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[take]),
                                 body)
    out = out.replace(alive=jnp.asarray(valid),
                      awake=out.awake & jnp.asarray(valid))
    return out, owner_slot


def _axis_exchange(local: BodyState, coord_axis: int, halo_cap: int,
                   halo_width: float, lo: float, hi: float,
                   axis_name: str, n_dev: int):
    """One ppermute halo exchange along one mesh axis; returns
    (from_low_neighbour, from_high_neighbour, overflow)."""
    d = jax.lax.axis_index(axis_name)
    w = (hi - lo) / n_dev
    low_edge = lo + d.astype(jnp.float32) * w
    high_edge = low_edge + w
    c = local.pos[:, coord_axis]
    mask_high = local.alive & (c > high_edge - halo_width)
    mask_low = local.alive & (c < low_edge + halo_width)
    send_high = _pack_halo(local, mask_high, halo_cap)
    send_low = _pack_halo(local, mask_low, halo_cap)
    overflow = (jnp.maximum(jnp.sum(mask_high) - halo_cap, 0)
                + jnp.maximum(jnp.sum(mask_low) - halo_cap, 0))
    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i + 1, i) for i in range(n_dev - 1)]
    from_low = jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis_name, fwd), send_high)
    from_high = jax.tree_util.tree_map(
        lambda a: jax.lax.ppermute(a, axis_name, bwd), send_low)
    return from_low, from_high, overflow


def spatial_world_step_2d(body: BodyState, world: StaticWorld, hull_cv,
                          dt, params: SimParams, config: SimConfig,
                          mesh: Mesh, halo_cap: int, halo_width: float,
                          x_min: float, x_max: float,
                          y_min: float, y_max: float):
    """One step of ONE world sharded over a 2-D ("sx", "sy") mesh.

    ``body`` is laid out by ``partition_by_tile`` and sharded over BOTH
    mesh axes flattened (tile-major).  Per step: x-phase halo ppermute,
    then y-phase packing from local + x-ghosts (corners included), step the
    combined set with the ordinary fused physics_step, keep the local
    slice.  Returns (new_body, global awake count, halo overflow count).
    """
    from jax import shard_map

    ax_x, ax_y = mesh.axis_names[0], mesh.axis_names[1]
    px, py = mesh.devices.shape
    total_cap = body.capacity
    local_cap = total_cap // (px * py)
    # local + 2 x-ghost blocks + 2 y-ghost blocks (y-ghosts can contain
    # forwarded x-ghost corners, so they get the same fixed capacity).
    combined_cap = local_cap + 4 * halo_cap
    cfg = _halo_config(config, combined_cap)

    @partial(shard_map, mesh=mesh,
             in_specs=(P((ax_x, ax_y)), P(), P()),
             out_specs=(P((ax_x, ax_y)), P(), P()),
             check_vma=False)
    def stepper(local, world_rep, hull_rep):
        from_lo_x, from_hi_x, ov_x = _axis_exchange(
            local, 0, halo_cap, halo_width, x_min, x_max, ax_x, px)
        with_x = _tree_concat([local, from_lo_x, from_hi_x])
        from_lo_y, from_hi_y, ov_y = _axis_exchange(
            with_x, 1, halo_cap, halo_width, y_min, y_max, ax_y, py)
        combined = _tree_concat([with_x, from_lo_y, from_hi_y])
        out = step_mod.physics_step(combined, world_rep, hull_rep,
                                    dt, params, cfg)
        new_local = jax.tree_util.tree_map(lambda x: x[:local_cap], out[0])
        awake = jax.lax.psum(jax.lax.psum(
            jnp.sum(new_local.awake & new_local.alive), ax_x), ax_y)
        halo_overflow = jax.lax.psum(jax.lax.psum(ov_x + ov_y, ax_x), ax_y)
        return new_local, awake, halo_overflow

    return stepper(body, world, hull_cv)
