"""CryptoVoxels world-import bot (cv_bot parity).

The reference's cv_bot (cv_bot/CVBot.cpp + CryptoVoxelsLoader.cpp) loads
CryptoVoxels parcel JSON files and materialises them as Substrata voxel
objects over the protocol.  This is the same importer, TPU-build style:

  * parcel JSON schema (CryptoVoxelsLoader.cpp:520-640): ``parcel`` object
    with id + bounds x1..z2 (2 voxels per metre), ``content.voxels`` =
    base64(zlib(uint16 grid)) iterated x-outer / z-inner
    (CryptoVoxelsLoader.cpp:1136-1158), ``content.features`` (image quads)
  * CV is y-up left-handed; voxels map to Substrata z-up via
    (rx, ry, rz) -> (-rx, -rz, ry) and the object origin via
    (x1, y1, z1) -> (-x1, -z1, y1) with the -0.9 m ground embed offset,
    scale 0.5 (voxels are 0.5 m in CV) — CryptoVoxelsLoader.cpp:1146-1178
  * objects carry content = "CryptoVoxels Parcel #<id>" so re-runs update
    instead of duplicating (CryptoVoxelsLoader.cpp:317-344)

Usage:
  python tools/cv_bot.py --dir CV_data/ --host localhost --port 7600
  python tools/cv_bot.py --parcel parcel3.json --dry-run
"""

from __future__ import annotations

import argparse
import base64
import json
import math
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substrata_tpu.shared.voxel import compress_voxel_group
from substrata_tpu.shared.world_object import (ObjectType, WorldMaterial,
                                               WorldObject)

PARCEL_PREFIX = "CryptoVoxels Parcel #"
FINAL_OFFSET = np.array([0.0, 0.0, -0.9])   # embed 2 underground voxel rows

# CV default palette (CryptoVoxelsLoader.cpp:483-492).
DEFAULT_COLOURS = ["#ffffff", "#888888", "#000000", "#ff71ce",
                   "#01cdfe", "#05ffa1", "#b967ff", "#fffb96"]


def _hex_colour(h: str):
    h = h.lstrip("#")
    return [int(h[i:i + 2], 16) / 255.0 for i in (0, 2, 4)]


def parse_parcel(doc: dict):
    """Parcel JSON -> (id, voxel coords [N,3] i32 substrata frame,
    material indices [N], material list, object pos, features)."""
    p = doc["parcel"]
    pid = int(p["id"])
    x1, y1, z1 = int(p["x1"]), int(p["y1"]), int(p["z1"])
    x2, y2, z2 = int(p["x2"]), int(p["y2"]), int(p["z2"])
    vx, vy, vz = 2 * (x2 - x1), 2 * (y2 - y1), 2 * (z2 - z1)
    content = p.get("content", {}) or {}

    coords = np.zeros((0, 3), np.int32)
    mats = np.zeros((0,), np.int32)
    mat_list = []
    if content.get("voxels"):
        raw = zlib.decompress(base64.b64decode(content["voxels"]))
        grid = np.frombuffer(raw, "<u2")
        n = vx * vy * vz
        if len(grid) < n:
            raise ValueError(f"parcel {pid}: voxel grid too small "
                             f"({len(grid)} < {n})")
        grid = grid[:n].reshape(vx, vy, vz)   # x-outer, z-inner read order
        rx, ry, rz = np.nonzero(grid)
        vals = grid[rx, ry, rz]
        # CV y-up -> substrata z-up (CryptoVoxelsLoader.cpp:1150-1155).
        coords = np.stack([-rx, -rz, ry], axis=1).astype(np.int32)
        # Stable material table keyed by raw voxel value.
        uniq = sorted(set(int(v) for v in vals))
        index_of = {v: i for i, v in enumerate(uniq)}
        mats = np.array([index_of[int(v)] for v in vals], np.int32)
        for v in uniq:
            col = DEFAULT_COLOURS[(v >> 5) & 0x7] if v >= 32 else \
                DEFAULT_COLOURS[v % len(DEFAULT_COLOURS)]
            mat_list.append(WorldMaterial(
                colour_rgb=tuple(_hex_colour(col)),
                opacity=0.2 if (v & 0x4000) else 1.0))

    pos = np.array([-x1, -z1, y1], np.float64) + FINAL_OFFSET
    features = content.get("features", []) or []
    return pid, coords, mats, mat_list, pos, features


def parcel_to_objects(doc: dict, next_uid):
    """Build the WorldObjects for one parcel (voxel group + image quads)."""
    pid, coords, mats, mat_list, pos, features = parse_parcel(doc)
    out = []
    if len(coords):
        ob = WorldObject(uid=next_uid())
        ob.object_type = int(ObjectType.VOXEL_GROUP)
        ob.voxel_data = compress_voxel_group(coords, mats)
        ob.materials = mat_list
        ob.pos = pos
        ob.scale = np.full(3, 0.5, np.float32)
        ob.content = PARCEL_PREFIX + str(pid)
        out.append(ob)
    p = doc["parcel"]
    centre = np.array([(p["x1"] + p["x2"]) / 2, 0.0,
                       (p["z1"] + p["z2"]) / 2])
    for f in features:
        if f.get("type") != "image" or not f.get("url"):
            continue
        fpos = np.asarray(f.get("position", [0, 0, 0]), np.float64) + centre
        ob = WorldObject(uid=next_uid())
        ob.object_type = int(ObjectType.GENERIC)
        ob.model_url = "Quad_obj_13906643289783913481.igmesh"
        ob.materials = [WorldMaterial(colour_texture_url=f["url"])]
        # CV (x, y, z) y-up -> substrata (-x, -z, y).
        ob.pos = np.array([-fpos[0], -fpos[2], fpos[1]]) + FINAL_OFFSET
        sc = np.asarray(f.get("scale", [1, 1, 1]), np.float32)
        ob.scale = np.array([abs(sc[0]) or 1, abs(sc[2]) or 1,
                             abs(sc[1]) or 1], np.float32)
        rot = np.asarray(f.get("rotation", [0, 0, 0]), np.float64)
        ob.angle = float(-rot[1])
        ob.axis = np.array([0, 0, 1], np.float32)
        ob.content = PARCEL_PREFIX + str(pid) + " feature " \
            + f.get("uuid", "?")
        out.append(ob)
    return out


def import_parcels(paths, client=None, start_uid: int = 200_000,
                   log=print):
    """Load parcel JSONs and create their objects (over the protocol when a
    client is given).  Returns the list of WorldObjects."""
    uid_counter = [start_uid]

    def next_uid():
        uid_counter[0] += 1
        return uid_counter[0]

    all_obs = []
    total_voxels = 0
    for path in paths:
        with open(path) as f:
            doc = json.load(f)
        obs = parcel_to_objects(doc, next_uid)
        for ob in obs:
            if client is not None:
                client.send_create_object(ob)
        n_vox = sum(len(np.frombuffer(o.voxel_data, np.uint8)) // 1
                    for o in obs if o.voxel_data)
        total_voxels += n_vox
        log(f"{os.path.basename(path)}: {len(obs)} objects")
        all_obs.extend(obs)
    log(f"imported {len(all_obs)} objects from {len(paths)} parcels")
    return all_obs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dir", help="directory of parcel*.json files")
    ap.add_argument("--parcel", action="append", default=[],
                    help="individual parcel JSON path")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=7600)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    paths = list(args.parcel)
    if args.dir:
        paths += sorted(os.path.join(args.dir, n) for n in os.listdir(args.dir)
                        if n.endswith(".json"))
    if not paths:
        ap.error("no parcel files given")

    client = None
    if not args.dry_run:
        from substrata_tpu.net.client import Client
        client = Client(args.host, args.port)
    import_parcels(paths, client)
    if client is not None:
        import time
        time.sleep(0.5)
        client.close()


if __name__ == "__main__":
    main()
