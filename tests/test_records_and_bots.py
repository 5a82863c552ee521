"""Shared records, rate limiter, chat bot, server scripting, reconnect,
remote vehicle replay."""

import os
import sys
import time

import numpy as np
import pytest

from substrata_tpu.shared.records import (
    GearItem, GestureSettings, LODChunk, RateLimiter, TerrainSpecSection,
    WorldSettings,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def wait_for(pred, timeout=6.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.03)
    return False


def test_world_settings_roundtrip():
    ws = WorldSettings(
        terrain_sections=[TerrainSpecSection(0, 0, "h.exr", "m.png", "t.png"),
                          TerrainSpecSection(1, 0, "h2.exr", "", "")],
        terrain_section_width_m=512.0, default_terrain_z=-2.0,
        water_z=3.5, water_enabled=True)
    back = WorldSettings.from_bytes(ws.to_bytes())
    assert back.water_enabled and back.water_z == 3.5
    assert len(back.terrain_sections) == 2
    assert back.terrain_sections[0].heightmap_url == "h.exr"


def test_lod_chunk_roundtrip():
    c = LODChunk(x=-3, y=7, mesh_url="chunk.stme", needs_rebuild=True)
    back = LODChunk.from_bytes(c.to_bytes())
    assert (back.x, back.y) == (-3, 7)
    assert back.needs_rebuild and back.mesh_url == "chunk.stme"


def test_rate_limiter():
    rl = RateLimiter(max_events=3, period=1.0, clock=lambda: 0.0)
    assert rl.check_add_event(0.0)
    assert rl.check_add_event(0.1)
    assert rl.check_add_event(0.2)
    assert not rl.check_add_event(0.3)  # over the limit
    assert rl.check_add_event(1.15)     # window slid


def test_chat_bot_end_to_end():
    from chat_bot import ChatBot
    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    s = Server(port=0, udp_port=0)
    s.start()
    try:
        bot = ChatBot("127.0.0.1", s.port, name="Gerald")
        user = Client("127.0.0.1", s.port)
        user.start()
        time.sleep(0.2)
        user.send_chat("alice", "hello there")
        got = []

        def check():
            bot.poll_once()
            got.extend(m for n, m in user.pop_events().chat if n == "Gerald")
            return bool(got)

        assert wait_for(check)
        assert "Hello" in got[0]
        bot.stop()
        user.stop()
    finally:
        s.stop()


def test_server_script_events_fire():
    import struct
    from substrata_tpu.net import protocol as P
    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    s = Server(port=0, udp_port=0)
    s.start()
    try:
        touched = []
        s.script_vm.handlers_for(44).on_user_touched_object.add(
            lambda av, uid: touched.append((av, uid)))
        c = Client("127.0.0.1", s.port)
        c.start()
        c.send_message(P.make_message(P.USER_TOUCHED_OBJECT_MESSAGE,
                                      struct.pack("<Q", 44)))
        assert wait_for(lambda: touched)
        assert touched[0][1] == 44
        c.stop()
    finally:
        s.stop()


def test_avatar_vehicle_replay_fields_propagate():
    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    from substrata_tpu.physics.vehicles import VehiclePhysicsInput
    from substrata_tpu.shared.avatar import Avatar
    s = Server(port=0, udp_port=0)
    s.start()
    try:
        a = Client("127.0.0.1", s.port); a.start()
        b = Client("127.0.0.1", s.port); b.start()
        a.send_avatar_created(Avatar(name="driver"))
        assert wait_for(lambda: a.avatar_uid in b.world_state.avatars_snapshot())
        bits = VehiclePhysicsInput(forward=1.0, right=-1.0).to_bitflags()
        a.send_avatar_transform([1, 2, 3], [0, 0, 0], anim_state=0,
                                vehicle_uid=777, seat=0, input_bitflags=bits)

        def got():
            av = b.world_state.avatars_snapshot().get(a.avatar_uid)
            return av is not None and av.entered_vehicle_uid == 777
        assert wait_for(got)
        av = b.world_state.avatars_snapshot()[a.avatar_uid]
        replay = VehiclePhysicsInput.from_bitflags(av.last_physics_input_bitflags)
        assert replay.forward == 1.0 and replay.right == -1.0
        a.stop(); b.stop()
    finally:
        s.stop()


def test_client_app_reconnect():
    from substrata_tpu.client_app import ClientApp
    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    from substrata_tpu.physics.state import SimConfig
    s = Server(port=0, udp_port=0)
    s.start()
    try:
        c = Client("127.0.0.1", s.port)
        c.start()
        fake_now = [100.0]
        app = ClientApp(client=c, enable_audio=False,
                        config=SimConfig(capacity=32, max_pairs=64,
                                         grid_dim=16, cell_size=4.0),
                        clock=lambda: fake_now[0])
        app.reconnect_factory = lambda: _connect_started("127.0.0.1", s.port)
        # Kill the connection; advance past the 10 s reconnect period.
        c.stop()
        assert not app.client.connected
        fake_now[0] += 11.0
        app.timer_event(1 / 60)
        assert app.client.connected
        assert "reconnected" in " ".join(app.log_messages)
        app.client.stop()
    finally:
        s.stop()


def _connect_started(host, port):
    from substrata_tpu.net.client import Client
    c = Client(host, port)
    c.start()
    return c


def test_gear_and_gesture_records():
    g = GearItem(name="hat", model_url="hat.glb", attach_bone="head")
    assert g.pre_attach_transform.shape == (4, 4)
    gs = GestureSettings(name="Wave", duration=2.5)
    assert gs.name == "Wave"
