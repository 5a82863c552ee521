"""Per-phase timing of the 10k-body bench workload on the current platform.

Mirrors bench.py's world exactly so phase times sum to the headline step.
Every timing block ends with a host readback (axon under-reports with
block_until_ready alone).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from substrata_tpu.physics import broadphase, narrowphase, solver
from substrata_tpu.physics.step import physics_step

import bench


def timed(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]  # true device sync
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {ms:8.2f} ms", flush=True)
    return out


def main():
    w = bench.build_world()
    cfg = w.config
    params = w.params
    sw = w.static_world
    hull_cv = w._hull_contact_verts
    dt = jnp.float32(1 / 60)

    state, cache, pcache = w.state, w.solver_cache, w.pair_cache

    @jax.jit
    def run_step(body, c, pc):
        nb, nc, npc, _, _ = physics_step(body, sw, hull_cv, dt, params, cfg,
                                         c, pc)
        return nb, nc, npc

    # Settle UNDER CHURN (bench-style kicks every 30 steps) so the contact
    # load matches the bench's sustained regime — from pristine piles the
    # first 40 steps see ~half the real pair demand.
    key = jax.random.PRNGKey(7)
    for i in range(240):
        if i % 30 == 0:
            key, sub = jax.random.split(key)
            state = bench._kick(state, sub)
        state, cache, pcache = run_step(state, cache, pcache)
    _ = float(np.asarray(state.pos)[0, 0])
    body = state

    bp = jax.jit(lambda b: broadphase.find_pairs(b, cfg))
    pair_a, pair_b, pair_valid, n_pairs, _ = timed("broadphase", bp, body)
    print("   pairs:", int(n_pairs))

    wm = narrowphase.blocked_manifold_width(cfg, 10_240) or 1
    print(f"   blocked manifold width: {wm}")
    npf = jax.jit(lambda b, pa, pb, pv: narrowphase.pair_contacts(
        b, pa, pb, pv, cfg, blocked_wm=wm if wm > 1 else 0))
    timed("pair narrowphase", npf, body, pair_a, pair_b, pair_valid)

    scf = jax.jit(lambda b: narrowphase.static_contacts(b, sw, hull_cv, cfg))
    static_cts = scf(body)
    timed("static contacts", scf, body)

    pair_cts, _, _ = npf(body, pair_a, pair_b, pair_valid)
    if wm == 1:
        cc = jax.jit(lambda p: narrowphase.compact_contacts(
            p, cfg.max_active_contacts))
        contacts_p, _ = cc(pair_cts)
        timed("pair compact", cc, pair_cts)
    else:
        contacts_p = pair_cts
    print("   pair contacts valid:", int(jnp.sum(contacts_p.valid)),
          " static valid:", int(jnp.sum(static_cts.valid)))

    svf = jax.jit(lambda b, s, p, ca: solver.solve_contacts(
        b, s, p, dt, params, cfg, ca, wm=wm))
    timed(f"solver ({cfg.solver_iters} it, wm={wm})", svf, body, static_cts,
          contacts_p, cache)

    n_e = contacts_p.capacity // wm
    e_a = contacts_p.a.reshape(n_e, wm)[:, 0]
    e_b = contacts_p.b.reshape(n_e, wm)[:, 0]
    e_occ = (e_a >= 0) if wm > 1 else contacts_p.valid
    inc = jax.jit(lambda a, b, o: solver.build_incidence(
        a, b, o, body.capacity, cfg.contacts_per_body))
    timed("  build_incidence (1/window)", inc, e_a, e_b, e_occ)

    timed("FULL STEP (amortized)", run_step, body, cache, pcache)


if __name__ == "__main__":
    main()
