"""CryptoVoxels importer (tools/cv_bot.py — cv_bot parity): parcel JSON ->
voxel WorldObjects, coordinate-frame conversion, and replication over a
loopback server."""

import base64
import json
import os
import sys
import time
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import cv_bot
from substrata_tpu.net.client import Client
from substrata_tpu.net.server import Server
from substrata_tpu.shared.voxel import decompress_voxel_group
from substrata_tpu.shared.world_object import ObjectType


def make_parcel_doc(pid=3, x1=2, y1=0, z1=4, x2=5, y2=3, z2=7):
    vx, vy, vz = 2 * (x2 - x1), 2 * (y2 - y1), 2 * (z2 - z1)
    grid = np.zeros((vx, vy, vz), "<u2")
    grid[0, 0, 0] = 1          # material value 1
    grid[1, 0, 0] = 1
    grid[0, 1, 2] = 5          # different material value
    payload = base64.b64encode(zlib.compress(grid.tobytes())).decode()
    return {
        "parcel": {
            "id": pid, "x1": x1, "y1": y1, "z1": z1,
            "x2": x2, "y2": y2, "z2": z2,
            "content": {
                "voxels": payload,
                "features": [{
                    "type": "image", "url": "http://example.com/a.png",
                    "uuid": "u1", "position": [1.0, 2.0, 0.5],
                    "rotation": [0, 0.5, 0], "scale": [2, 1, 1],
                }],
            },
        },
    }


def test_parcel_parsing_and_frame_conversion():
    doc = make_parcel_doc()
    pid, coords, mats, mat_list, pos, feats = cv_bot.parse_parcel(doc)
    assert pid == 3
    assert len(coords) == 3
    # CV voxel (rx, ry, rz) -> substrata (-rx, -rz, ry).
    assert [-0, -0, 0] in coords.tolist()
    assert [-1, -0, 0] in coords.tolist()
    assert [0, -2, 1] in coords.tolist()
    assert len(mat_list) == 2 and mats.max() == 1
    # Object origin: (x1, y1, z1) -> (-x1, -z1, y1) + (0, 0, -0.9).
    assert np.allclose(pos, [-2, -4, 0 - 0.9])
    assert len(feats) == 1


def test_objects_roundtrip_voxel_payload():
    obs = cv_bot.parcel_to_objects(make_parcel_doc(), iter(range(1, 99)).__next__)
    vg = [o for o in obs if o.object_type == int(ObjectType.VOXEL_GROUP)]
    assert len(vg) == 1
    coords, mats = decompress_voxel_group(vg[0].voxel_data)
    assert len(coords) == 3
    assert vg[0].content == "CryptoVoxels Parcel #3"
    quads = [o for o in obs if o.object_type == int(ObjectType.GENERIC)]
    assert len(quads) == 1
    assert quads[0].materials[0].colour_texture_url == "http://example.com/a.png"


def test_import_replicates_over_loopback_server(tmp_path):
    path = tmp_path / "parcel3.json"
    path.write_text(json.dumps(make_parcel_doc()))
    s = Server(port=0, udp_port=0)
    s.start()
    try:
        watcher = Client("127.0.0.1", s.port)
        watcher.start()
        bot = Client("127.0.0.1", s.port)
        bot.start()
        cv_bot.import_parcels([str(path)], client=bot, log=lambda *a: None)
        deadline = time.time() + 5
        while time.time() < deadline and watcher.world_state.num_objects() < 2:
            time.sleep(0.05)
        obs = list(watcher.world_state.objects_snapshot().values())
        assert len(obs) == 2
        vg = [o for o in obs
              if o.object_type == int(ObjectType.VOXEL_GROUP)]
        assert len(vg) == 1
        coords, mats = decompress_voxel_group(vg[0].voxel_data)
        assert len(coords) == 3
        bot.stop()
        watcher.stop()
    finally:
        s.stop()
