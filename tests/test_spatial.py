"""Spatial domain decomposition: one world sharded into x-slabs with
ppermute halo exchange must match the unsharded step within fp tolerance
(VERDICT r1 item 2; SURVEY.md §2.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from substrata_tpu.parallel.mesh import make_mesh
from substrata_tpu.parallel.spatial import (
    partition_by_slab, shard_partitioned, spatial_world_step,
)
from substrata_tpu.physics import shapes
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.step import physics_step
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

N_DEV = 4
X_MIN, X_MAX = -8.0, 8.0


def _build_world():
    # Generous buffers so neither variant hits a capacity cliff.
    cfg = SimConfig(capacity=64, max_pairs=1024, grid_dim=16, cell_size=4.0,
                    solver_iters=6)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    rng = np.random.default_rng(7)
    # Clusters straddling the slab boundaries at -4, 0, +4 plus scattered
    # bodies — the halo path must carry every cross-boundary contact.
    centers = [-4.0, 0.0, 4.0]
    for c in centers:
        for k in range(4):
            w.add_object(PhysicsObject(
                shape=shapes.make_sphere(0.4),
                pos=np.array([c + (k % 2) * 0.5 - 0.25,
                              (k // 2) * 0.5 - 0.25, 0.5 + 0.45 * k],
                             np.float32),
                motion_type=int(MotionType.DYNAMIC)))
    for i in range(8):
        w.add_object(PhysicsObject(
            shape=shapes.make_box([0.3, 0.3, 0.3]),
            pos=np.array([rng.uniform(X_MIN + 1, X_MAX - 1),
                          rng.uniform(-2, 2), 1.5], np.float32),
            motion_type=int(MotionType.DYNAMIC)))
    w._flush()
    return w


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 4 devices")
@pytest.mark.slow
def test_spatial_sharded_step_matches_unsharded():
    w = _build_world()
    dt = jnp.float32(1 / 60)

    # Unsharded reference: plain fused step.
    ref = w.state
    for _ in range(3):
        ref = physics_step(ref, w.static_world, w._hull_contact_verts,
                           dt, w.params, w.config)[0]

    # Sharded: partition into 4 slabs of 16 slots, halo 8 bodies / 2.5 m.
    mesh = make_mesh(N_DEV, axis="x")
    part, owner_slot = partition_by_slab(w.state, N_DEV, 16, X_MIN, X_MAX)
    part = shard_partitioned(part, mesh)
    for _ in range(3):
        part, awake, halo_ov = spatial_world_step(
            part, w.static_world, w._hull_contact_verts, dt, w.params,
            w.config, mesh, halo_cap=8, halo_width=2.5,
            x_min=X_MIN, x_max=X_MAX)
    assert int(awake) > 0
    assert int(halo_ov) == 0  # ample halo budget: no drops

    ref_np = jax.tree_util.tree_map(np.asarray, ref)
    sh_np = jax.tree_util.tree_map(np.asarray, part)
    alive = np.nonzero(np.asarray(w.state.alive))[0]
    for slot in alive:
        new = owner_slot[slot]
        assert new >= 0
        np.testing.assert_allclose(
            sh_np.pos[new], ref_np.pos[slot], atol=2e-3,
            err_msg=f"body {slot} diverged")
        np.testing.assert_allclose(
            sh_np.linvel[new], ref_np.linvel[slot], atol=5e-3,
            err_msg=f"body {slot} velocity diverged")


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 4 devices")
def test_partition_overflow_raises():
    w = _build_world()
    with pytest.raises(ValueError):
        partition_by_slab(w.state, N_DEV, 2, X_MIN, X_MAX)


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 4 devices")
def test_halo_overflow_counter_fires_at_capacity():
    """A dense cluster straddling a slab boundary with a too-small halo_cap
    must FIRE the halo_overflow counter instead of silently diverging
    (VERDICT r2 weak #4; CLAUDE.md overflow-counter rule)."""
    w = _build_world()
    dt = jnp.float32(1 / 60)
    mesh = make_mesh(N_DEV, axis="x")
    part, _ = partition_by_slab(w.state, N_DEV, 16, X_MIN, X_MAX)
    part = shard_partitioned(part, mesh)
    # halo_cap=1: the 4-body boundary clusters cannot fit.
    part, awake, halo_ov = spatial_world_step(
        part, w.static_world, w._hull_contact_verts, dt, w.params,
        w.config, mesh, halo_cap=1, halo_width=2.5,
        x_min=X_MIN, x_max=X_MAX)
    assert int(halo_ov) > 0, "halo overflow went uncounted"


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_spatial_scale_two_devices_with_drift_and_rebalance():
    """Scale test (VERDICT r2 item 9): ~1.5k bodies on 2 devices with a
    realistic halo_cap; sharded result tracks the unsharded step through a
    drift + periodic repartition cycle, and the halo counter stays 0."""
    X0, X1 = -30.0, 30.0
    cfg = SimConfig(capacity=2048, max_pairs=8192, grid_dim=32,
                    cell_size=2.0, solver_iters=6, pairs_per_body=12)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    rng = np.random.default_rng(3)
    n_bodies = 1500
    # Jittered-grid spawn (no initial interpenetration: overlap-resolution
    # impulses are chaotic and would defeat the short-horizon match below);
    # +x drift pushes everything across the slab boundary at x=0.
    nx, ny = 50, 30
    k = 0
    for ix in range(nx):
        for iy in range(ny):
            if k >= n_bodies:
                break
            w.add_object(PhysicsObject(
                shape=shapes.make_sphere(0.35),
                pos=np.array([
                    X0 + 2 + ix * (X1 - X0 - 4) / nx + rng.uniform(-0.15, 0.15),
                    -6 + iy * 12.0 / ny + rng.uniform(-0.15, 0.15),
                    0.36 + 0.9 * (k % 2)], np.float32),
                linvel=np.array([1.5, 0, 0], np.float32),
                motion_type=int(MotionType.DYNAMIC)))
            k += 1
    w._flush()
    dt = jnp.float32(1 / 60)

    ref = w.state
    mesh = make_mesh(2, axis="x")
    local_cap = 1536
    part, owner_slot = partition_by_slab(ref, 2, local_cap, X0, X1)
    part = shard_partitioned(part, mesh)

    REBALANCE_EVERY = 10   # steps between host repartitions (drift bound:
                           # 1.5 m/s * 10/60 s = 0.25 m << halo_width 1.5)
    total_ov = 0
    for k in range(30):
        ref = physics_step(ref, w.static_world, w._hull_contact_verts,
                           dt, w.params, w.config)[0]
        part, awake, halo_ov = spatial_world_step(
            part, w.static_world, w._hull_contact_verts, dt, w.params,
            w.config, mesh, halo_cap=256, halo_width=1.5,
            x_min=X0, x_max=X1)
        total_ov += int(halo_ov)
        if k == 2:
            # Short-horizon trajectory match: beyond a few steps the
            # body-reorder changes contact ORDER inside compaction, and the
            # fp-level differences amplify chaotically through the 1.5k-
            # body contact piles — per-body agreement is only meaningful
            # before that Lyapunov horizon.
            ref_np = jax.tree_util.tree_map(np.asarray, ref)
            sh_np = jax.tree_util.tree_map(np.asarray, part)
            alive = np.nonzero(np.asarray(w.state.alive))[0]
            errs = np.array([
                np.abs(sh_np.pos[owner_slot[s]] - ref_np.pos[s]).max()
                for s in alive])
            assert errs.mean() < 5e-3, errs.mean()
            assert np.quantile(errs, 0.99) < 5e-2, np.quantile(errs, 0.99)
        if (k + 1) % REBALANCE_EVERY == 0:
            # Host repartition: gather, re-slab, re-shard (the production
            # cadence documented in spatial.py's module docstring).
            gathered = jax.tree_util.tree_map(np.asarray, part)
            merged = jax.tree_util.tree_map(jnp.asarray, gathered)
            part, new_owner = partition_by_slab(merged, 2, local_cap, X0, X1)
            part = shard_partitioned(part, mesh)
            # Compose permutations so owner_slot maps ORIGINAL slot -> slab slot.
            owner_slot = np.where(owner_slot >= 0,
                                  new_owner[owner_slot], -1)
    assert total_ov == 0, f"halo overflow {total_ov} with realistic halo_cap"

    # Long-horizon (through drift + 3 rebalances): statistical equivalence
    # + sanity.  Exact trajectories have diverged chaotically by design.
    ref_np = jax.tree_util.tree_map(np.asarray, ref)
    sh_np = jax.tree_util.tree_map(np.asarray, part)
    alive = np.nonzero(np.asarray(w.state.alive))[0]
    new_idx = owner_slot[alive]
    assert (new_idx >= 0).all()
    assert np.isfinite(sh_np.pos[new_idx]).all()
    # Same bodies, same bulk state: mean position/energy agree closely.
    d_mean = np.abs(sh_np.pos[new_idx].mean(0) - ref_np.pos[alive].mean(0))
    assert (d_mean < 0.05).all(), d_mean
    ke_sh = float((sh_np.linvel[new_idx] ** 2).sum())
    ke_ref = float((ref_np.linvel[alive] ** 2).sum())
    assert abs(ke_sh - ke_ref) < 0.15 * max(ke_ref, 1.0), (ke_sh, ke_ref)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_spatial_2d_tiles_match_unsharded():
    """2-D tile decomposition (4x2 mesh) with two-phase halo exchange must
    match the unsharded step — including a cluster straddling a tile CORNER
    (diagonal-neighbour contacts only reach the owner via the y-pass of an
    x-ghost, the case 1-D slabs never exercise)."""
    from jax.sharding import Mesh
    from substrata_tpu.parallel.spatial import (partition_by_tile,
                                                spatial_world_step_2d)

    PX, PY = 4, 2
    Y_MIN, Y_MAX = -8.0, 8.0
    cfg = SimConfig(capacity=64, max_pairs=1024, grid_dim=16, cell_size=4.0,
                    solver_iters=6)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    # Cluster ON the corner (0, 0) where four tiles meet: one body per
    # quadrant, all mutually touching.
    for (dx, dy) in ((-0.3, -0.3), (0.3, -0.3), (-0.3, 0.3), (0.3, 0.3)):
        w.add_object(PhysicsObject(
            shape=shapes.make_sphere(0.4),
            pos=np.array([dx, dy, 0.5], np.float32),
            motion_type=int(MotionType.DYNAMIC)))
    # A second stack crossing only an x-boundary (x=-4), and scattered.
    for k in range(3):
        w.add_object(PhysicsObject(
            shape=shapes.make_sphere(0.4),
            pos=np.array([-4.0 + (k % 2) * 0.5 - 0.25, 2.0, 0.5 + 0.5 * k],
                         np.float32),
            motion_type=int(MotionType.DYNAMIC)))
    rng = np.random.default_rng(3)
    for i in range(6):
        w.add_object(PhysicsObject(
            shape=shapes.make_box([0.3, 0.3, 0.3]),
            pos=np.array([rng.uniform(-7, 7), rng.uniform(-7, 7), 1.2],
                         np.float32),
            motion_type=int(MotionType.DYNAMIC)))
    w._flush()
    dt = jnp.float32(1 / 60)

    ref = w.state
    for _ in range(3):
        ref = physics_step(ref, w.static_world, w._hull_contact_verts,
                           dt, w.params, w.config)[0]

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(PX, PY), ("sx", "sy"))
    part, owner = partition_by_tile(w.state, PX, PY, local_cap=16,
                                    x_min=X_MIN, x_max=X_MAX,
                                    y_min=Y_MIN, y_max=Y_MAX)
    part = shard_partitioned(part, mesh)
    total_ov = 0
    for _ in range(3):
        part, awake, ov = spatial_world_step_2d(
            part, w.static_world, w._hull_contact_verts, dt, w.params,
            w.config, mesh, halo_cap=8, halo_width=2.0,
            x_min=X_MIN, x_max=X_MAX, y_min=Y_MIN, y_max=Y_MAX)
        total_ov += int(np.asarray(ov))
    assert total_ov == 0

    got_pos = np.asarray(part.pos)
    ref_pos = np.asarray(ref.pos)
    ref_alive = np.asarray(ref.alive)
    for orig in np.nonzero(ref_alive)[0]:
        new = int(owner[orig])
        assert new >= 0
        np.testing.assert_allclose(got_pos[new], ref_pos[orig],
                                   atol=2e-4, err_msg=f"body {orig}")
