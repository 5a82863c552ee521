"""Stage-level breakdown of the windowed audio fetch + interp variants."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np
from jax.lax import Precision

S, L, B = 256, 3, 256
POOL = 1 << 20
NW = 7
Q = NW * 8  # 16-wide blocks


def timeit(fn, *args, n=50):
    out = fn(*args)
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
    def gather_window(pool, offset, playhead):
        pool128 = pool.reshape(-1, 128)
        start = offset + jnp.floor(playhead).astype(jnp.int32)
        row0 = start >> 7
        rows = row0[..., None] + jnp.arange(NW, dtype=jnp.int32)
        w = pool128[rows.reshape(-1)].reshape(S, L, NW * 128)
        return w, row0

    w0, row0 = gather_window(pool, offset, playhead)

    def make_li(offset, playhead, delta, row0):
        t = playhead[..., None] + delta[..., None] * jnp.arange(B, dtype=jnp.float32)
        return t + (offset - (row0 << 7)).astype(jnp.float32)[..., None]

    @jax.jit
    def interp_einsum_hi(w, offset, playhead, delta, row0):
        wext = jnp.concatenate([w, w[..., -1:]], axis=-1)
        li = make_li(offset, playhead, delta, row0)
        qi = jnp.floor(li / 16.0).astype(jnp.int32)
        u = li - 16.0 * qi.astype(jnp.float32)
        blk = wext.reshape(S, L, NW * 128 + 1)[..., :NW * 128].reshape(S, L, Q, 16)
        blk = jnp.concatenate([blk, jnp.roll(blk[..., :1], -1, axis=-2)], -1)
        tri = jnp.maximum(0.0, 1.0 - jnp.abs(
            u[..., None] - jnp.arange(17, dtype=jnp.float32)))
        t1 = jnp.einsum("slqu,slbu->slqb", blk, tri,
                        precision=Precision.HIGHEST)
        oh = (qi[..., None] == jnp.arange(Q)).astype(jnp.float32)
        return jnp.einsum("slbq,slqb->slb", oh, t1,
                          precision=Precision.HIGHEST)

    @jax.jit
    def interp_einsum_bf(w, offset, playhead, delta, row0):
        wext = jnp.concatenate([w, w[..., -1:]], axis=-1)
        li = make_li(offset, playhead, delta, row0)
        qi = jnp.floor(li / 16.0).astype(jnp.int32)
        u = li - 16.0 * qi.astype(jnp.float32)
        blk = wext.reshape(S, L, NW * 128 + 1)[..., :NW * 128].reshape(S, L, Q, 16)
        blk = jnp.concatenate([blk, jnp.roll(blk[..., :1], -1, axis=-2)], -1)
        tri = jnp.maximum(0.0, 1.0 - jnp.abs(
            u[..., None] - jnp.arange(17, dtype=jnp.float32)))
        t1 = jnp.einsum("slqu,slbu->slqb", blk, tri)
        oh = (qi[..., None] == jnp.arange(Q)).astype(jnp.float32)
        return jnp.einsum("slbq,slqb->slb", oh, t1)

    @jax.jit
    def interp_mulreduce(w, offset, playhead, delta, row0):
        # one-hot select of s0/s1 rows via 16-block decomposition but the
        # final tap select via mul-reduce on the 17 axis only after a
        # one-hot q contraction on the MXU (exact 0/1 weights).
        wext = jnp.concatenate([w, w[..., -1:]], axis=-1)
        li = make_li(offset, playhead, delta, row0)
        qi = jnp.floor(li / 16.0).astype(jnp.int32)
        u = li - 16.0 * qi.astype(jnp.float32)
        blk = wext.reshape(S, L, NW * 128 + 1)[..., :NW * 128].reshape(S, L, Q, 16)
        blk = jnp.concatenate([blk, jnp.roll(blk[..., :1], -1, axis=-2)], -1)
        oh = (qi[..., None] == jnp.arange(Q)).astype(jnp.float32)  # [S,L,B,Q]
        # chunk[s,l,b,u] = sum_q oh[s,l,b,q] blk[s,l,q,u]  (exact weights)
        chunk = jnp.einsum("slbq,slqu->slbu", oh, blk,
                           precision=Precision.HIGHEST)
        tri = jnp.maximum(0.0, 1.0 - jnp.abs(
            u[..., None] - jnp.arange(17, dtype=jnp.float32)))
        return jnp.sum(chunk * tri, axis=-1)

    @jax.jit
    def full_hi(pool, offset, playhead, delta):
        w, r0 = gather_window(pool, offset, playhead)
        return interp_einsum_hi(w, offset, playhead, delta, r0)

    @jax.jit
    def full_mr(pool, offset, playhead, delta):
        w, r0 = gather_window(pool, offset, playhead)
        return interp_mulreduce(w, offset, playhead, delta, r0)

    @jax.jit
    def current(pool, offset, playhead, delta):
        t = playhead[..., None] + delta[..., None] * jnp.arange(B, dtype=jnp.float32)
        i0 = jnp.floor(t).astype(jnp.int32)
        frac = t - i0
        s0 = pool[offset[..., None] + i0]
        s1 = pool[offset[..., None] + i0 + 1]
        return s0 * (1 - frac) + s1 * frac

    ref = np.asarray(current(pool, offset, playhead, delta))
    for name, fn, args in [
        ("gather_window only", gather_window, (pool, offset, playhead)),
        ("interp einsum bf16", interp_einsum_bf, (w0, offset, playhead, delta, row0)),
        ("interp einsum hi  ", interp_einsum_hi, (w0, offset, playhead, delta, row0)),
        ("interp mul-reduce ", interp_mulreduce, (w0, offset, playhead, delta, row0)),
        ("full hi           ", full_hi, (pool, offset, playhead, delta)),
        ("full mul-reduce   ", full_mr, (pool, offset, playhead, delta)),
    ]:
        ms = timeit(fn, *args)
        err = ""
        if name.startswith(("interp", "full")):
            out = np.asarray(fn(*args))
            err = f"  maxerr {np.abs(ref - out).max():.2e}"
        print(f"{name}: {ms:7.3f} ms{err}")


if __name__ == "__main__":
    main()
