"""Micro-benchmark: audio sample-fetch gather layouts on TPU.

The mix kernel's fetch is 2.8 ms of a 2.9 ms block (trace_audio.py):
a [S,L,B] point-gather into a 1-D pool takes XLA's slow path.  Candidates:

1. current: pool[idx] with idx [S,L,B]  (1-D operand, 3-D index)
2. rows4:   pool.reshape(-1,4) gathered with FLAT [S*L*B] row ids -> one-hot
            select of the 2 interp taps inside each 4-wide row
3. window:  per (s,l) gather NW contiguous 128-wide rows with a flat id,
            then factorized one-hot/tri interpolation (no per-sample gather)
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

S, L, B = 256, 3, 256
POOL = 1 << 20


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.standard_normal(POOL).astype(np.float32))
    offset = jnp.asarray(rng.integers(0, POOL - 4096, (S, L)), jnp.int32)
    playhead = jnp.asarray(rng.uniform(0, 100, (S, L)).astype(np.float32))
    delta = jnp.asarray(rng.uniform(0.8, 2.4, (S, L)).astype(np.float32))

    @jax.jit
    def current(pool, offset, playhead, delta):
        t = playhead[..., None] + delta[..., None] * jnp.arange(B, dtype=jnp.float32)
        i0 = jnp.floor(t).astype(jnp.int32)
        frac = t - i0
        s0 = pool[offset[..., None] + i0]
        s1 = pool[offset[..., None] + i0 + 1]
        return s0 * (1 - frac) + s1 * frac

    @jax.jit
    def rows4(pool, offset, playhead, delta):
        pool4 = pool.reshape(-1, 4)
        t = playhead[..., None] + delta[..., None] * jnp.arange(B, dtype=jnp.float32)
        i0 = jnp.floor(t).astype(jnp.int32)
        frac = t - i0
        g = offset[..., None] + i0                     # [S,L,B] global idx
        rows = (g >> 1) >> 1                           # row of 4
        w = pool4[rows.reshape(-1)].reshape(S, L, B, 4)
        col = (g & 3)[..., None]                       # [S,L,B,1]
        lane = jnp.arange(4, dtype=jnp.int32)
        w0 = jnp.sum(w * (lane == col), -1)
        w1 = jnp.sum(w * (lane == col + 1), -1)
        # col==3 -> tap 2 crosses the row: fold via the row at (g+1)>>2
        rows1 = ((g + 1) >> 2)
        wb = pool4[rows1.reshape(-1)].reshape(S, L, B, 4)
        col1 = ((g + 1) & 3)[..., None]
        w1b = jnp.sum(wb * (lane == col1), -1)
        w1 = jnp.where((g & 3) == 3, w1b, w1)
        return w0 * (1 - frac) + w1 * frac

    @jax.jit
    def window(pool, offset, playhead, delta):
        # Per (s,l): NW contiguous 128-rows from the flattened pool.
        NW = 7  # covers B*delta_max = 256*2.5 = 640 (+127 align +1 interp)
        pool128 = pool.reshape(-1, 128)
        start = offset + jnp.floor(playhead).astype(jnp.int32)
        row0 = start >> 7
        rows = row0[..., None] + jnp.arange(NW, dtype=jnp.int32)  # [S,L,NW]
        w = pool128[rows.reshape(-1)].reshape(S, L, NW * 128)
        # ext: one sample overlap for interpolation across 16-blocks
        wext = jnp.concatenate([w, w[..., -1:]], axis=-1)
        # local fractional position in the window
        t = playhead[..., None] + delta[..., None] * jnp.arange(B, dtype=jnp.float32)
        li = t + (offset - (row0 << 7)).astype(jnp.float32)[..., None]  # [S,L,B]
        # factorize li = 16*q + u(+frac):  one-hot over Q=NW*8 blocks of 16,
        # triangular interp over 17-wide sub-windows.
        Q = NW * 8
        qi = jnp.floor(li / 16.0).astype(jnp.int32)    # [S,L,B]
        u = li - 16.0 * qi.astype(jnp.float32)         # [0,16)
        # W blocks: [S,L,Q,17]
        qs = jnp.arange(Q, dtype=jnp.int32)
        blk = jnp.stack([jax.lax.dynamic_slice_in_dim(wext, k * 16, 17, axis=-1)
                         if False else wext[..., k * 16: k * 16 + 17]
                         for k in range(Q)], axis=-2)  # [S,L,Q,17]
        tri = jnp.maximum(0.0, 1.0 - jnp.abs(
            u[..., None] - jnp.arange(17, dtype=jnp.float32)))  # [S,L,B,17]
        # T1[s,l,q,b] = sum_u blk[s,l,q,u] * tri[s,l,b,u]
        t1 = jnp.einsum("slqu,slbu->slqb", blk, tri)
        oh = (qi[..., None] == qs).astype(jnp.float32)  # [S,L,B,Q]
        return jnp.einsum("slbq,slqb->slb", oh, t1)

    ms_cur = timeit(current, pool, offset, playhead, delta)
    ms_r4 = timeit(rows4, pool, offset, playhead, delta)
    ms_win = timeit(window, pool, offset, playhead, delta)
    # correctness
    a = np.asarray(current(pool, offset, playhead, delta))
    c = np.asarray(window(pool, offset, playhead, delta))
    b = np.asarray(rows4(pool, offset, playhead, delta))
    print(f"current point-gather : {ms_cur:7.3f} ms")
    print(f"rows4 flat gather    : {ms_r4:7.3f} ms   maxerr {np.abs(a-b).max():.2e}")
    print(f"window factorized    : {ms_win:7.3f} ms   maxerr {np.abs(a-c).max():.2e}")


if __name__ == "__main__":
    main()
