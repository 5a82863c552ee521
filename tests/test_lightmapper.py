"""Lightmapper bot: TPU-ray-traced AO/sun bake over the physics world
(lightmapper_bot parity without a GL renderer)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import lightmapper_bot
from substrata_tpu.client_app import ClientApp
from substrata_tpu.physics.state import SimConfig
import pytest

from substrata_tpu.shared.world_object import (
    COLLIDABLE_FLAG, LIGHTMAP_NEEDS_COMPUTING_FLAG, WorldObject)


@pytest.mark.slow
def test_bake_writes_png_clears_flag_and_shadows(tmp_path):
    app = ClientApp(config=SimConfig(capacity=256, max_pairs=1024,
                                     grid_dim=32, cell_size=4.0),
                    enable_audio=False)
    floor = WorldObject(uid=1, pos=np.array([0, 0, 0.5]),
                        flags=COLLIDABLE_FLAG | LIGHTMAP_NEEDS_COMPUTING_FLAG)
    floor.scale = np.array([4, 4, 0.5], np.float32)
    floor.model_url = "cube.bmesh"
    app.create_object(floor)
    wall = WorldObject(uid=2, pos=np.array([2.0, 0, 2.5]),
                       flags=COLLIDABLE_FLAG)
    wall.scale = np.array([0.3, 4, 2.0], np.float32)
    wall.model_url = "cube.bmesh"
    app.create_object(wall)
    for _ in range(5):
        app.timer_event(1 / 30)

    baked = lightmapper_bot.bake_pending(app, str(tmp_path), res=24,
                                         log=lambda *a: None)
    assert baked == [1]
    assert floor.lightmap_url == "lightmap_ob_1.png"
    assert not (floor.flags & LIGHTMAP_NEEDS_COMPUTING_FLAG)
    data = (tmp_path / floor.lightmap_url).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # The wall must actually darken part of the map (occlusion + shadow).
    lum = lightmapper_bot.bake_object_lightmap(
        app.physics_world, np.array([0, 0, 0.5]), 8.0, res=24)
    assert lum.min() < lum.max() - 0.15, (lum.min(), lum.max())
