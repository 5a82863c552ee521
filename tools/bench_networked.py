"""Networked-tick benchmark — BASELINE.md benchmark config (5): the full
client tick over a 12k-object replicated world with snapshot send +
interpolation (the reference's whole-world workload, README.md:42).

Topology: loopback server + two full clients.  Client A owns a slice of
dynamic objects and streams physics snapshots at 10 Hz; client B replicates
the full world and runs the complete ClientApp tick (physics substeps,
remote playback/interpolation, scripts, occlusion, send pass).  The metric
is client B's sustained tick rate.

Prints ONE JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from substrata_tpu.runtime.jax_cache import bench_cache_dir
jax.config.update("jax_compilation_cache_dir", bench_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
# Test hook (same contract as bench.py): force a platform so the outage-
# fallback path can be exercised without a real tunnel outage.  The axon
# sitecustomize overrides JAX_PLATFORMS, so this must go through jax.config.
if os.environ.get("SUBSTRATA_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SUBSTRATA_BENCH_PLATFORM"])

_SMOKE = os.environ.get("SUBSTRATA_BENCH_SMOKE", "") not in ("", "0")
N_OBJECTS = 600 if _SMOKE else 12_000
N_DYNAMIC = 64 if _SMOKE else 512   # client-A moving objects streaming snapshots
TICK_HZ = 60.0           # reference clients tick at display rate (60)
BASELINE_TICK_HZ = 60.0


def build():
    from substrata_tpu.client_app import ClientApp
    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    from substrata_tpu.physics.state import SimConfig
    from substrata_tpu.shared.world_object import (COLLIDABLE_FLAG,
                                                   DYNAMIC_FLAG, WorldObject)

    server = Server(port=0, udp_port=0)
    server.start()

    sender = Client("127.0.0.1", server.port)
    sender.start()

    rng = np.random.default_rng(0)
    for i in range(N_OBJECTS):
        dyn = i < N_DYNAMIC
        ob = WorldObject(
            model_url="cube.bmesh",
            flags=COLLIDABLE_FLAG | (DYNAMIC_FLAG if dyn else 0),
            pos=np.array([rng.uniform(-180, 180), rng.uniform(-180, 180),
                          0.4 if not dyn else rng.uniform(2, 6)]))
        sender.send_create_object(ob)

    viewer = Client("127.0.0.1", server.port)
    viewer.start()
    # Device capacity holds the DYNAMIC bodies (+ headroom for loading
    # placeholders): the 11.5k static cubes merge into the static trimesh
    # with virtual anchors (world.add_virtual_anchor), exactly like the
    # reference's one-Jolt-static-body-per-mesh world — a 12k-slot device
    # state for ~500 dynamic bodies made every capacity-proportional pass
    # (static samples vs 138k trimesh tris, broadphase grid, transform
    # block) pay for ghosts.
    cfg = (SimConfig(capacity=512, max_pairs=2048, grid_dim=32,
                     cell_size=4.0, solver_iters=7, pair_rebuild_interval=6)
           if _SMOKE else
           SimConfig(capacity=4_096, max_pairs=8_192, grid_dim=64,
                     cell_size=4.0, solver_iters=7, pair_rebuild_interval=6))
    # Pipelined readbacks (depth 3): the serving configuration for remote
    # TPU runtimes — host consumes step results 3 ticks (50 ms) late, far
    # inside the 100 ms network dejitter delay.  SUBSTRATA_PIPELINE_DEPTH=0
    # measures the synchronous path.
    depth = int(os.environ.get("SUBSTRATA_PIPELINE_DEPTH", "3"))
    app = ClientApp(client=viewer, config=cfg, enable_audio=False,
                    pipeline_depth=depth)
    # The unit-cube model resolves BEFORE object load, so static objects
    # go straight to the trimesh (no placeholder-cube body transient) and
    # dynamic objects get their real convex hull — the reference client
    # behaves this way once its model cache is warm.
    from substrata_tpu.shared.bmesh import write_bmesh
    cv = np.array([[x, y, z] for x in (-.5, .5) for y in (-.5, .5)
                   for z in (-.5, .5)], np.float32)
    ct = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                   [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                   [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    app.resources["cube.bmesh"] = write_bmesh(cv, ct)

    # Replicate WITHOUT stepping physics (each tick is a full 12k-body
    # device step; waiting on the wire needs none of that).
    deadline = time.time() + 120
    while time.time() < deadline and viewer.world_state.num_objects() < N_OBJECTS:
        time.sleep(0.1)
    if viewer.world_state.num_objects() < N_OBJECTS:
        raise RuntimeError(
            f"replication stalled at {viewer.world_state.num_objects()}")
    print(f"# replicated {viewer.world_state.num_objects()} objects",
          file=sys.stderr, flush=True)
    # Now load the replicated objects into the physics world in one pass.
    t0 = time.time()
    for i in range(10):
        app.timer_event(1 / TICK_HZ)
        print(f"# load tick {i}: {len(app.objects)} objects, "
              f"{time.time()-t0:.1f} s", file=sys.stderr, flush=True)
    print(f"# loaded {len(app.objects)} objects in {time.time()-t0:.1f} s",
          file=sys.stderr, flush=True)
    return server, sender, viewer, app


def main():
    server, sender, viewer, app = build()
    # Compile the auto-tier ladder up front: a mid-measurement tier switch
    # otherwise hitches one tick by a full XLA compile (observed 10-50 s on
    # the tunnel), wrecking the mean.  One-time per config with the
    # persistent compilation cache.
    t0 = time.time()
    app.physics_world.prewarm_tiers(player=app.player)
    print(f"# tier prewarm: {time.time()-t0:.1f} s", file=sys.stderr,
          flush=True)

    # Sender streams snapshots for its dynamic objects (10 Hz per object, in
    # slices like the reference's send pass) FROM ITS OWN THREAD — the
    # sender is a separate client; its 64 SSL writes per tick (~9 ms) must
    # not serialize into the viewer's measured tick.  It runs through the
    # warm phase too, so the tier ladder settles under the measured load.
    dyn_uids = [uid for uid, ob in list(viewer.world_state.objects_snapshot().items())
                if ob.is_dynamic()][:N_DYNAMIC]

    import threading
    stop_evt = threading.Event()

    def sender_stream():
        # Realistic owner-side motion (GUIClient.cpp:7390-7530 playback
        # feeds dejittered CONTINUOUS trajectories, not teleports): each
        # object wanders at walking-to-vehicle speed and snapshots sample
        # its path at ~10 Hz (3-tick slices below + the per-object slice
        # rotation = each object updates every ~0.05-0.1 s).  A rare
        # respawn teleport (~2/s across 512 objects) keeps the
        # invalidate-and-rebuild path honest.
        rng = np.random.default_rng(1)
        nd = len(dyn_uids)
        pos = rng.uniform([-180, -180, 1], [180, 180, 4],
                          (nd, 3)).astype(np.float32)
        vel = rng.normal(0, 2.0, (nd, 3)).astype(np.float32)
        vel[:, 2] = 0.0
        tick = 0
        while not stop_evt.is_set():
            pos += vel * (1 / TICK_HZ)
            if tick % 60 == 0:      # wander: re-steer a few objects
                steer = rng.integers(0, nd, 32)
                vel[steer] = rng.normal(0, 2.0, (32, 3)).astype(np.float32)
                vel[steer, 2] = 0.0
            idxs = np.arange(nd)[tick % 3::3][:64]
            if tick % 30 == 0 and len(idxs):   # occasional respawn teleport
                pos[idxs[0]] = rng.uniform([-180, -180, 1], [180, 180, 4])
            for k in idxs:
                sender.send_physics_snapshot(
                    dyn_uids[int(k)], pos[k],
                    np.array([0, 0, 0, 1], np.float32),
                    vel[k], np.zeros(3, np.float32))
            tick += 1
            stop_evt.wait(1 / TICK_HZ)

    st = threading.Thread(target=sender_stream, daemon=True)
    st.start()

    # Warm under load: object loading, remaining compiles, tier settling.
    t0 = time.time()
    n_warm = 30 if _SMOKE else 120
    for i in range(n_warm):
        app.timer_event(1 / TICK_HZ)
        if i % 30 == 0:
            print(f"# warm tick {i}: {time.time()-t0:.1f} s "
                  f"tier={app.physics_world._tier}",
                  file=sys.stderr, flush=True)

    prof_acc: dict[str, float] = {}
    if os.environ.get("SUBSTRATA_NET_PROF"):
        # Attribute think-phase internals (flush / dispatch / digest-pop).
        w = app.physics_world
        for name in ("_flush", "_dispatch_digest"):
            orig = getattr(w, name)

            def timed(fn, nm):
                def g(*a, **k):
                    t1 = time.perf_counter()
                    r = fn(*a, **k)
                    prof_acc[nm] = (prof_acc.get(nm, 0.0)
                                    + (time.perf_counter() - t1) * 1e3)
                    return r
                return g
            setattr(w, name, timed(orig, name))

    n_ticks = 30 if _SMOKE else 150
    phase_acc: dict[str, float] = {}
    tick_ms = np.zeros(n_ticks)
    t0 = time.perf_counter()
    for tick in range(n_ticks):
        t1 = time.perf_counter()
        app.timer_event(1 / TICK_HZ)
        tick_ms[tick] = (time.perf_counter() - t1) * 1e3
        for k, v in app.phase_ms.items():
            phase_acc[k] = phase_acc.get(k, 0.0) + v
    wall = time.perf_counter() - t0
    ticks_per_sec = n_ticks / wall
    stop_evt.set()
    st.join(timeout=2)
    print(f"# tick ms p50={np.percentile(tick_ms, 50):.1f} "
          f"p90={np.percentile(tick_ms, 90):.1f} "
          f"max={tick_ms.max():.1f}", file=sys.stderr, flush=True)
    if prof_acc:
        print("# think internals ms/tick: "
              + " ".join(f"{k}={v / n_ticks:.2f}"
                         for k, v in prof_acc.items()),
              file=sys.stderr, flush=True)
    print("# " + app.physics_world.get_diagnostics().replace("\n", " | "),
          file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"networked client ticks/sec, {N_OBJECTS}-object world",
        "value": round(ticks_per_sec, 2),
        "unit": "ticks/s",
        "vs_baseline": round(ticks_per_sec / BASELINE_TICK_HZ, 3),
        "replicated_objects": viewer.world_state.num_objects(),
        "phase_ms": {k: round(v / n_ticks, 2)
                     for k, v in sorted(phase_acc.items(),
                                        key=lambda kv: -kv[1])},
    }))

    viewer.stop()
    sender.stop()
    server.stop()


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        if "backend" in str(e).lower() or "unavailable" in str(e).lower():
            # TPU tunnel down: parseable failure line instead of a traceback
            # (same contract as bench.py — BENCH capture records WHY).
            print(json.dumps({
                "metric": "networked client ticks/sec (TPU backend unavailable)",
                "value": 0.0, "unit": "ticks/s", "vs_baseline": 0.0,
                "error": str(e)[:200]}))
            raise SystemExit(1)
        raise
