"""Screenshot / map-tile bot: a headless protocol client that connects to a
server, replicates the world, and renders top-down map tiles to PNG.

Parity with screenshot_bot/ (headless protocol client rendering map tiles
and screenshots server-side).  Rendering here is a simple top-down
rasteriser over the replicated object AABBs + terrain (the GL renderer is
out of TPU scope); PNGs are written with a dependency-free encoder.
"""

from __future__ import annotations

import argparse
import os
import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substrata_tpu.net.client import Client


def write_png(path: str, rgb: np.ndarray):
    """Minimal PNG writer (8-bit RGB)."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].astype(np.uint8).tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


def render_map_tile(objects, center, tile_w: float = 128.0, res: int = 256,
                    terrain=None) -> np.ndarray:
    """Top-down rasterisation of object footprints (+ terrain shading)."""
    img = np.zeros((res, res, 3), np.float32)
    cx, cy = center
    # Terrain shading.
    if terrain is not None:
        xs = np.linspace(cx - tile_w / 2, cx + tile_w / 2, res)
        ys = np.linspace(cy - tile_w / 2, cy + tile_w / 2, res)
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        xy = np.stack([gx.ravel(), gy.ravel()], axis=1)
        h = terrain.eval_terrain_heights(xy).reshape(res, res)
        shade = np.clip(0.35 + 0.04 * h, 0.1, 0.8)
        img[:, :, 0] = shade * 0.55
        img[:, :, 1] = shade * 0.8
        img[:, :, 2] = shade * 0.45
    else:
        img[:] = 0.22

    scale = res / tile_w
    for ob in objects:
        px = int((ob.pos[0] - (cx - tile_w / 2)) * scale)
        py = int((ob.pos[1] - (cy - tile_w / 2)) * scale)
        size = max(1, int(np.max(np.asarray(ob.scale)) * scale * 0.5))
        x0, x1 = max(0, px - size), min(res, px + size + 1)
        y0, y1 = max(0, py - size), min(res, py + size + 1)
        if x0 >= x1 or y0 >= y1:
            continue
        colour = np.array([0.8, 0.75, 0.7])
        if ob.materials:
            colour = np.asarray(ob.materials[0].colour_rgb, np.float32)
        img[y0:y1, x0:x1] = colour
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)[::-1]  # +y up


def screenshot_once(host: str, port: int, out_path: str, center=(0.0, 0.0),
                    tile_w: float = 128.0, res: int = 256, world: str = "",
                    settle: float = 1.5) -> str:
    c = Client(host, port, world_name=world)
    c.start()
    time.sleep(settle)
    with c.world_state.lock:
        objects = list(c.world_state.objects_snapshot().values())
    c.stop()
    img = render_map_tile(objects, center, tile_w, res)
    write_png(out_path, img)
    return out_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", default="map_tile.png")
    ap.add_argument("--cx", type=float, default=0.0)
    ap.add_argument("--cy", type=float, default=0.0)
    ap.add_argument("--tile-w", type=float, default=128.0)
    args = ap.parse_args()
    print(screenshot_once(args.host, args.port, args.out,
                          (args.cx, args.cy), args.tile_w))
