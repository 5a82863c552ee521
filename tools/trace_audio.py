"""Op-level attribution of the 256-source audio mix block.

Same recipe as trace_step10k.py: run the bench_audio workload under
jax.profiler.trace and attribute device time by tf_op.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from substrata_tpu.audio.mix import (
    default_listener, mix_block, room_from_aabb, zero_sources,
)

N_SOURCES = 256


def build_sources():
    rng = np.random.default_rng(0)
    src = zero_sources(N_SOURCES)
    pool = jnp.asarray(np.sin(np.arange(1 << 20) * 0.03).astype(np.float32))
    offsets = rng.integers(0, (1 << 20) - 48000, N_SOURCES)
    src = src.replace(
        alive=src.alive.at[:].set(True),
        looping=src.looping.at[:].set(True),
        buf_offset=src.buf_offset.at[:, 0].set(jnp.asarray(offsets, jnp.int32)),
        buf_len=src.buf_len.at[:, 0].set(48000),
        delta=src.delta.at[:, 0].set(jnp.asarray(
            rng.uniform(0.8, 1.25, N_SOURCES).astype(np.float32))),
        pos=jnp.asarray(rng.uniform(-40, 40, (N_SOURCES, 3)).astype(np.float32)),
        vel=jnp.asarray(rng.normal(0, 3, (N_SOURCES, 3)).astype(np.float32)),
        num_occlusions=jnp.asarray((rng.random(N_SOURCES) < 0.2).astype(np.float32)),
    )
    return src, pool


def main():
    src, pool = build_sources()
    listener = default_listener()
    room = room_from_aabb([-20, -20, 0], [20, 20, 8], reflectivity=0.6)

    step = jax.jit(lambda s, r: mix_block(s, pool, listener, room=r,
                                          use_hrtf=True))
    src2, out, room2 = step(src, room)
    _ = float(np.asarray(out)[0, 0])
    for _ in range(20):
        src2, out, room2 = step(src2, room2)
    _ = float(np.asarray(out)[0, 0])

    trace_dir = "/tmp/substrata_trace_audio"
    n_blocks = 20
    with jax.profiler.trace(trace_dir):
        for _ in range(n_blocks):
            src2, out, room2 = step(src2, room2)
        _ = float(np.asarray(out)[0, 0])

    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)

    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        top = args.get("tf_op") or args.get("name") or ev.get("name", "")
        if not args.get("tf_op"):
            continue
        dur = ev.get("dur", 0) / 1e3
        total += dur
        by_op[top] += dur
        by_cat[ev.get("name", "?").split(".")[0]] += dur

    print(f"total device time: {total:.2f} ms over {n_blocks} blocks "
          f"= {total / n_blocks:.3f} ms/block\n")
    print("top tf_ops (ms/block):")
    for op, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms / n_blocks:7.4f}  {op}")
    print("\nby event-name prefix (ms/block):")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms / n_blocks:7.4f}  {cat}")


if __name__ == "__main__":
    main()
