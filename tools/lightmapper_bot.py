"""Lightmapper bot (lightmapper_bot/LightMapperBot.cpp parity).

The reference bot connects as a protocol client, finds objects whose
LIGHTMAP_NEEDS_COMPUTING_FLAG is set, path-traces a lightmap with the
Indigo renderer, uploads it, sets ``lightmap_url`` and clears the flag.

This build replaces the GL/Indigo ray tracer with the engine's OWN device
ray caster (physics/queries.trace_rays): for each object we bake an
ambient-occlusion + sun-visibility map over the object's AABB footprint —
every texel's surface height probe, its hemisphere occlusion fan, and its
sun shadow ray are batched into a handful of device calls, so the bake
runs on the TPU.  The result is written as a PNG resource and the object
is updated over the protocol exactly like the reference
(LightMapperBot.cpp: set lightmap_url, clear flag, send full update).

Usage:
  python tools/lightmapper_bot.py --host localhost --port 7600 --out res/
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substrata_tpu.shared.world_object import (
    LIGHTMAP_NEEDS_COMPUTING_FLAG, WorldObject)

SUN_DIR = np.array([0.45, 0.3, 0.84])       # matches the client sky
SUN_DIR = SUN_DIR / np.linalg.norm(SUN_DIR)
N_HEMI = 16                                  # hemisphere rays per texel


def _hemisphere_dirs(n: int) -> np.ndarray:
    """Cosine-weighted fixed hemisphere fan (golden-angle spiral)."""
    i = np.arange(n) + 0.5
    phi = i * (math.pi * (3.0 - math.sqrt(5.0)))
    cos_t = np.sqrt(1.0 - i / n)             # cosine-weighted
    sin_t = np.sqrt(1.0 - cos_t ** 2)
    return np.stack([np.cos(phi) * sin_t, np.sin(phi) * sin_t, cos_t],
                    axis=1).astype(np.float32)


def bake_object_lightmap(world, ob_pos, half_extent: float, res: int = 32):
    """Bake an AO+sun map over the [res, res] footprint around ob_pos using
    the physics world's device ray caster.  Returns [res, res] luminance
    in [0, 1]."""
    import jax.numpy as jnp

    from substrata_tpu.physics import queries

    world._flush()
    xs = np.linspace(-half_extent, half_extent, res) + ob_pos[0]
    ys = np.linspace(-half_extent, half_extent, res) + ob_pos[1]
    gx, gy = np.meshgrid(xs, ys)
    n_tex = res * res

    # 1. Surface probe: one down-ray per texel finds the bake height.
    top = np.stack([gx.ravel(), gy.ravel(),
                    np.full(n_tex, ob_pos[2] + 50.0)], axis=1).astype(np.float32)
    down = np.tile(np.array([[0, 0, -1]], np.float32), (n_tex, 1))
    hits = queries.trace_rays(
        jnp.asarray(top), jnp.asarray(down), jnp.full((n_tex,), 100.0),
        world.state, world.static_world, world.config)
    t = np.asarray(hits.t)
    hit = np.asarray(hits.hit)
    surf_z = np.where(hit, top[:, 2] - t + 0.05, ob_pos[2] + 0.05)

    origins = np.stack([top[:, 0], top[:, 1], surf_z], axis=1)

    # 2. Hemisphere occlusion fan: n_tex * N_HEMI rays in ONE batch.
    fan = _hemisphere_dirs(N_HEMI)                           # [K, 3]
    o_rep = np.repeat(origins, N_HEMI, axis=0).astype(np.float32)
    d_rep = np.tile(fan, (n_tex, 1)).astype(np.float32)
    occl = queries.trace_rays(
        jnp.asarray(o_rep), jnp.asarray(d_rep),
        jnp.full((n_tex * N_HEMI,), 8.0),
        world.state, world.static_world, world.config)
    blocked = np.asarray(occl.hit).reshape(n_tex, N_HEMI)
    ao = 1.0 - blocked.mean(axis=1)

    # 3. Sun shadow ray per texel.
    sun = np.tile(SUN_DIR[None].astype(np.float32), (n_tex, 1))
    sh = queries.trace_rays(
        jnp.asarray(origins.astype(np.float32)), jnp.asarray(sun),
        jnp.full((n_tex,), 60.0),
        world.state, world.static_world, world.config)
    lit = 1.0 - np.asarray(sh.hit).astype(np.float32)

    lum = np.clip(0.25 + 0.35 * ao + 0.4 * lit, 0.0, 1.0)
    return lum.reshape(res, res)


def lightmap_png_bytes(lum: np.ndarray) -> bytes:
    import io
    import struct
    import zlib

    rgb = (np.repeat(lum[:, :, None], 3, axis=2) * 255).astype(np.uint8)
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return (struct.pack(">I", len(data)) + c
                + struct.pack(">I", zlib.crc32(c)))

    out = io.BytesIO()
    out.write(b"\x89PNG\r\n\x1a\n")
    out.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
    out.write(chunk(b"IDAT", zlib.compress(raw, 6)))
    out.write(chunk(b"IEND", b""))
    return out.getvalue()


def bake_pending(app, out_dir: str, res: int = 32, log=print):
    """Bake lightmaps for every replicated object with the
    needs-computing flag; write PNGs, set lightmap_url, clear the flag,
    and send full updates when connected.  Returns baked uids."""
    os.makedirs(out_dir, exist_ok=True)
    baked = []
    for uid, ob in list(app.objects.items()):
        if not (ob.flags & LIGHTMAP_NEEDS_COMPUTING_FLAG):
            continue
        half = max(1.0, float(np.max(np.abs(np.asarray(ob.scale)))) * 2.0)
        lum = bake_object_lightmap(app.physics_world,
                                   np.asarray(ob.pos, np.float64), half, res)
        url = f"lightmap_ob_{uid}.png"
        with open(os.path.join(out_dir, url), "wb") as f:
            f.write(lightmap_png_bytes(lum))
        ob.lightmap_url = url
        ob.flags &= ~LIGHTMAP_NEEDS_COMPUTING_FLAG
        if app.client is not None:
            app.client.send_object_full_update(ob)
        log(f"baked {url} ({res}x{res}, mean lum "
            f"{lum.mean():.2f})")
        baked.append(uid)
    return baked


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=7600)
    ap.add_argument("--out", default="lightmaps")
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()

    from substrata_tpu.client_app import ClientApp
    from substrata_tpu.net.client import Client
    from substrata_tpu.physics.state import SimConfig

    client = Client(args.host, args.port)
    client.start()
    app = ClientApp(client=client, config=SimConfig(
        capacity=2048, max_pairs=8192, grid_dim=64, cell_size=4.0),
        enable_audio=False)
    while True:
        for _ in range(30):                  # let the world replicate
            app.timer_event(1 / 30)
            time.sleep(1 / 30)
        n = bake_pending(app, args.out, res=args.res)
        if args.once:
            break
        if not n:
            time.sleep(5.0)
    client.stop()


if __name__ == "__main__":
    main()
