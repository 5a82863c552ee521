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
        part, awake = spatial_world_step(
            part, w.static_world, w._hull_contact_verts, dt, w.params,
            w.config, mesh, halo_cap=8, halo_width=2.5,
            x_min=X_MIN, x_max=X_MAX)
    assert int(awake) > 0

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
