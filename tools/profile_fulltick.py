#!/usr/bin/env python
"""Per-component timing of the full-tick extras (vehicles, character,
particles, Winter, ray cell table) on the 10k-body bench world.

Each component is timed as its OWN jitted program over the same body state
(small compiles; the physics step itself is covered by bench.py).  Used to
attribute bench.py's fulltick_extra_ms.
"""

from __future__ import annotations

import os
import sys
import time

import jax

from substrata_tpu.runtime.jax_cache import bench_cache_dir
jax.config.update("jax_compilation_cache_dir", bench_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
if os.environ.get("SUBSTRATA_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SUBSTRATA_BENCH_PLATFORM"])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # reuse the bench world/config builders


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # host readback for honest axon timing
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {dt:8.3f} ms")
    return dt


def main():
    from substrata_tpu.physics import broadphase
    from substrata_tpu.physics.character import character_update
    from substrata_tpu.physics.particles import particles_step, zero_particles
    from substrata_tpu.physics.vehicles.manager import (_apply_vehicle_deltas,
                                                        vehicles_update)

    print(f"devices: {jax.devices()}", flush=True)
    w = bench.build_world()
    cfg, params, sw = w.config, w.params, w.static_world
    char0, vm, vinputs, ps10k, winter_eval = bench.build_fulltick(w)
    body = w.state
    DT = jnp.float32(1 / 60)

    table_fn = jax.jit(lambda b: broadphase.build_cell_table(b, cfg)[0])
    table = table_fn(body)
    jax.block_until_ready(table)

    t_table = timeit("build_cell_table", table_fn, body)

    veh_fn = jax.jit(lambda v, b, t: vehicles_update(
        v, vinputs, b, sw, DT, params, cfg, table=t))
    t_veh = timeit("vehicles_update (8)", veh_fn, vm.veh, body, table)

    char_fn = jax.jit(lambda c, b, t: character_update(
        c, b, sw, jnp.array([3.0, 0.0, 0.0]), False, False, False, DT,
        params, cfg, exclude_body=jnp.int32(-1), table=t))
    t_char = timeit("character_update", char_fn, char0, body, table)

    rng = np.random.default_rng(3)
    for n_p in (2048, 10_000):
        ps = zero_particles(n_p)
        ps = ps.replace(
            pos=jnp.asarray(rng.uniform([-35, -35, 1], [35, 35, 8],
                                        (n_p, 3)).astype(np.float32)),
            vel=jnp.asarray(rng.normal(0, 2, (n_p, 3)).astype(np.float32)),
            opacity=ps.opacity.at[:].set(1.0),
            alive=ps.alive.at[:].set(True))
        part_fn = jax.jit(lambda p, b, t: particles_step(
            p, b, sw, DT, params, cfg, table=t))
        timeit(f"particles_step ({n_p})", part_fn, ps, body, table)

    wfn = jax.jit(winter_eval)
    timeit("winter_eval (512)", wfn, jnp.float32(1.0))

    print(f"table+veh+char sum: {t_table + t_veh + t_char:.3f} ms")


if __name__ == "__main__":
    main()
