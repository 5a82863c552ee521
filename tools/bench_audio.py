"""Audio mixing benchmark: source-frames/sec at 256 spatial sources.

The second half of the north-star metric (BASELINE.md: 256 spatial audio
sources at >= 60 Hz real time; real time = 48000 frames/s * 256 sources =
12.29M source-frames/s).  Mixes 256-frame blocks of the fused kernel on the
current platform with forced device syncs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from substrata_tpu.runtime.jax_cache import bench_cache_dir
jax.config.update("jax_compilation_cache_dir", bench_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from substrata_tpu.audio.mix import (
    BLOCK, ENGINE_RATE, Listener, default_listener, mix_block, zero_sources,
)

N_SOURCES = 256
REALTIME_SOURCE_FRAMES = ENGINE_RATE * N_SOURCES  # per second


def main():
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
    listener = default_listener()

    # Full-quality path: HRIR binaural + room-effects reverb enabled
    # (the budget the reference spends in Resonance's binaural HQ mode).
    from substrata_tpu.audio.mix import room_from_aabb
    room0 = room_from_aabb([-20, -20, 0], [20, 20, 8], reflectivity=0.6)

    def step_fn(s_, r_):
        s2, out, r2 = mix_block(s_, pool, listener, room=r_, use_hrtf=True)
        return s2, out, r2

    step3 = jax.jit(step_fn)
    step = None
    src2, out, room = step3(src, room0)
    _ = float(np.asarray(out)[0, 0])
    for _ in range(20):
        src2, out, room = step3(src2, room)
    _ = float(np.asarray(out)[0, 0])

    n_blocks = 200
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        src2, out, room = step3(src2, room)
    _ = float(np.asarray(out)[0, 0])
    wall = time.perf_counter() - t0
    frames = n_blocks * BLOCK
    source_frames_per_sec = frames * N_SOURCES / wall
    blocks_per_sec = n_blocks / wall
    realtime_x = source_frames_per_sec / REALTIME_SOURCE_FRAMES
    print(json.dumps({
        "metric": f"audio source-frames/sec at {N_SOURCES} sources",
        "value": round(source_frames_per_sec),
        "unit": "source-frames/s",
        "vs_baseline": round(realtime_x, 2),
        "blocks_per_sec": round(blocks_per_sec, 1),
        "block_ms": round(1000.0 / blocks_per_sec, 3),
    }))


if __name__ == "__main__":
    main()
