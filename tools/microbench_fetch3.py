"""Device-time attribution of fetch/interp variants via profiler traces.

Wall-clock timing of sub-ms jits is dispatch-dominated on the remote TPU
runtime; this version traces each variant and reports device time per call.
"""

import glob
import gzip
import json
import os
import sys

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
Q = NW * 8


def device_ms(fn, args, tag, n=30):
    out = fn(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    trace_dir = f"/tmp/mb3_{tag}"
    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            out = fn(*args)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args_ = ev.get("args") or {}
        if not args_.get("tf_op"):
            continue
        total += ev.get("dur", 0) / 1e3
    return total / n


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

    def interp_body(w, offset, playhead, delta, row0, prec):
        wext = jnp.concatenate([w, w[..., -1:]], axis=-1)
        t = playhead[..., None] + delta[..., None] * jnp.arange(B, dtype=jnp.float32)
        li = t + (offset - (row0 << 7)).astype(jnp.float32)[..., None]
        qi = jnp.floor(li / 16.0).astype(jnp.int32)
        u = li - 16.0 * qi.astype(jnp.float32)
        blk = wext[..., :NW * 128].reshape(S, L, Q, 16)
        blk = jnp.concatenate([blk, jnp.roll(blk[..., :1], -1, axis=-2)], -1)
        tri = jnp.maximum(0.0, 1.0 - jnp.abs(
            u[..., None] - jnp.arange(17, dtype=jnp.float32)))
        t1 = jnp.einsum("slqu,slbu->slqb", blk, tri, precision=prec)
        oh = (qi[..., None] == jnp.arange(Q)).astype(jnp.float32)
        return jnp.einsum("slbq,slqb->slb", oh, t1, precision=prec)

    @jax.jit
    def full_hi(pool, offset, playhead, delta):
        w, r0 = gather_window(pool, offset, playhead)
        return interp_body(w, offset, playhead, delta, r0, Precision.HIGHEST)

    @jax.jit
    def full_default(pool, offset, playhead, delta):
        w, r0 = gather_window(pool, offset, playhead)
        return interp_body(w, offset, playhead, delta, r0, None)

    @jax.jit
    def current(pool, offset, playhead, delta):
        t = playhead[..., None] + delta[..., None] * jnp.arange(B, dtype=jnp.float32)
        i0 = jnp.floor(t).astype(jnp.int32)
        frac = t - i0
        s0 = pool[offset[..., None] + i0]
        s1 = pool[offset[..., None] + i0 + 1]
        return s0 * (1 - frac) + s1 * frac

    ref = np.asarray(current(pool, offset, playhead, delta))
    for name, fn in [("current", current), ("full_hi", full_hi),
                     ("full_default", full_default),
                     ("gather_only", None)]:
        if name == "gather_only":
            ms = device_ms(gather_window, (pool, offset, playhead), name)
            print(f"{name:13s}: {ms:7.3f} ms/call (device)")
            continue
        ms = device_ms(fn, (pool, offset, playhead, delta), name)
        err = np.abs(ref - np.asarray(fn(pool, offset, playhead, delta))).max()
        print(f"{name:13s}: {ms:7.3f} ms/call (device)  maxerr {err:.2e}")


if __name__ == "__main__":
    main()
