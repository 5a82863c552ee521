"""Per-phase timing of the physics step on the current JAX platform."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from substrata_tpu.physics import broadphase, narrowphase, solver, shapes
from substrata_tpu.physics.state import MotionType, SimConfig
from substrata_tpu.physics.step import physics_step
from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld

N = 1000


def timed(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:24s} {ms:8.2f} ms")
    return out


def main():
    cfg = SimConfig(capacity=1024, max_pairs=4096, grid_dim=64, cell_size=2.0,
                    solver_iters=10)
    w = PhysicsWorld(cfg)
    w.set_ground_plane(0.0)
    for i in range(N):
        w.add_object(PhysicsObject(
            shape=shapes.make_box([0.4, 0.4, 0.4]),
            pos=np.array([(i % 10) * 1.2 - 6, ((i // 10) % 10) * 1.2 - 6,
                          0.6 + (i // 100) * 1.2], np.float32),
            motion_type=int(MotionType.DYNAMIC)))
    t0 = time.perf_counter()
    w._flush()
    print(f"build+flush              {time.perf_counter()-t0:8.2f} s")
    body = w.state
    sw = w.static_world
    hull_cv = w._hull_contact_verts
    params = w.params
    dt = jnp.float32(1 / 60)

    # Settle a bit so there are real contacts.
    for _ in range(30):
        body, _, _ = physics_step(body, sw, hull_cv, dt, params, cfg)
    jax.block_until_ready(body)

    bp = jax.jit(lambda b: broadphase.find_pairs(b, cfg))
    pair_a, pair_b, pair_valid, n_pairs, _ = timed("broadphase", bp, body)
    print("   pairs:", int(n_pairs))

    npf = jax.jit(lambda b, pa, pb, pv: narrowphase.pair_contacts(b, pa, pb, pv, cfg))
    timed("pair narrowphase", npf, body, pair_a, pair_b, pair_valid)

    scf = jax.jit(lambda b: narrowphase.static_contacts(b, sw, hull_cv, cfg))
    static_cts = timed("static contacts", scf, body)

    pair_cts, _, _ = npf(body, pair_a, pair_b, pair_valid)
    contacts_p, _ = narrowphase.compact_contacts(pair_cts,
                                                 cfg.max_active_contacts)
    print("   pair contacts valid:", int(jnp.sum(contacts_p.valid)),
          " static valid:", int(jnp.sum(static_cts.valid)))

    svf = jax.jit(lambda b, s, c: solver.solve_contacts(b, s, c, dt, params,
                                                        cfg))
    timed("solver (10 it)", svf, body, static_cts, contacts_p)

    full = jax.jit(lambda b: physics_step(b, sw, hull_cv, dt, params, cfg)[0])
    timed("full step", full, body)


if __name__ == "__main__":
    main()
