"""End-to-end loopback tests for the protocol message families added for
full Protocol.h parity: moveTo/rotateTo/summon, CreateObject/DestroyObject,
parcels query, world settings, seats/vehicle exit, audio-stream control,
gear, map tiles, LOD chunks, eth submission, and BuilderAI streaming
(shared/Protocol.h:123-131, 1101-1111, 1400-1406, 3004-3005, 3150-3160,
3700-3701, 3800-3801, 3900-3902, 10020-10021, 12001-12003, 15000-15013)."""

import time

import numpy as np
import pytest

from substrata_tpu.net import protocol as P
from substrata_tpu.net.client import Client
from substrata_tpu.net.server import Server
from substrata_tpu.shared.parcel import Parcel
from substrata_tpu.shared.records import GearItem, LODChunk, WorldSettings
from substrata_tpu.shared.world_object import WorldObject


def _sv(server, fn):
    """Read server world state under its GUARDED_BY lock."""
    with server.worlds_state.lock:
        return fn(server.worlds_state.get_world(""))


@pytest.fixture
def server():
    s = Server(port=0)
    s.start()
    yield s
    s.stop()


def _drain(client, pred, timeout=5.0):
    """Poll pop_events until pred(collected_events) returns a value."""
    deadline = time.monotonic() + timeout
    collected = []
    while time.monotonic() < deadline:
        ev = client.pop_events()
        collected.append(ev)
        out = pred(collected)
        if out is not None:
            return out
        time.sleep(0.02)
    raise AssertionError("timed out waiting for events")


def _wait(cond, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return
        time.sleep(0.02)
    raise AssertionError("timed out")


def test_create_destroy_object_requests(server):
    c1 = Client("127.0.0.1", server.port)
    c2 = Client("127.0.0.1", server.port)
    c1.start(); c2.start()
    try:
        ob = WorldObject(model_url="x.glb", pos=np.array([1., 2., 3.]))
        c1.request_create_object(ob)
        # Both clients receive the broadcast ObjectCreated with a real uid.
        uid1 = _drain(c1, lambda evs: next(
            (u for e in evs for u in e.objects_created), None))
        uid2 = _drain(c2, lambda evs: next(
            (u for e in evs for u in e.objects_created), None))
        assert uid1 == uid2 and uid1 > 0
        assert _sv(server, lambda w: w.objects[uid1].creator_id) \
            == c1.avatar_uid

        c1.request_destroy_object(uid1)
        _wait(lambda: uid1 not in _sv(server, lambda w: dict(w.objects)))
        _drain(c2, lambda evs: (True if any(
            uid1 in e.objects_destroyed for e in evs) else None))
    finally:
        c1.stop(); c2.stop()


def test_move_to_and_summon(server):
    c1 = Client("127.0.0.1", server.port)
    c2 = Client("127.0.0.1", server.port)
    c1.start(); c2.start()
    try:
        ob = WorldObject(pos=np.array([0., 0., 1.]))
        c1.request_create_object(ob)
        uid = _drain(c1, lambda evs: next(
            (u for e in evs for u in e.objects_created), None))

        c1.send_object_move_to(uid, [5.0, 0.0, 1.0], duration=2.0,
                               easing=P.MOVE_TO_EASING_SMOOTHSTEP)
        mv = _drain(c2, lambda evs: next(
            (m for e in evs for m in e.move_tos), None))
        assert mv["uid"] == uid and not mv["is_rotation"]
        np.testing.assert_allclose(mv["target_pos"], [5, 0, 1])
        # Server applied the authoritative endpoint.
        _wait(lambda: _sv(server, lambda w: w.objects[uid].pos[0]) == 5.0)

        c1.send_summon_object(uid, [9.0, 9.0, 1.0])
        uid_s, pos, aa = _drain(c2, lambda evs: next(
            (s for e in evs for s in e.summons), None))
        assert uid_s == uid
        np.testing.assert_allclose(pos, [9, 9, 1])
    finally:
        c1.stop(); c2.stop()


def test_parcels_query_and_world_settings(server):
    with server.worlds_state.lock:
        w = server.worlds_state.get_world("")
        w.parcels[3] = Parcel(parcel_id=3, owner_id=7,
                          aabb_min=np.zeros(3), aabb_max=np.ones(3) * 10)
    w.settings = WorldSettings(default_terrain_z=2.5, water_enabled=True,
                               water_z=-1.0)
    c = Client("127.0.0.1", server.port)
    c.start()
    try:
        # initial world-settings push
        _wait(lambda: c.world_state.world_settings is not None)
        assert c.world_state.world_settings.default_terrain_z == 2.5
        c.query_parcels()
        parcels = _drain(c, lambda evs: next(
            (pl for e in evs for pl in e.parcel_lists), None))
        assert parcels[0].parcel_id == 3 and parcels[0].owner_id == 7
        assert c.world_state.parcels_snapshot()[3].owner_id == 7
    finally:
        c.stop()


def test_seats_audio_streams(server):
    c1 = Client("127.0.0.1", server.port)
    c2 = Client("127.0.0.1", server.port)
    c1.start(); c2.start()
    try:
        from substrata_tpu.shared.avatar import Avatar
        c1.send_avatar_created(Avatar(name="driver"))
        c2.send_avatar_created(Avatar(name="watcher"))
        time.sleep(0.2)
        c1.send_seat_change(P.AVATAR_SAT_ON_SEAT, vehicle_uid=44,
                            seat_index=1)
        kind, av, veh, seat = _drain(c2, lambda evs: next(
            (s for e in evs for s in e.seat_changes), None))
        assert (kind, veh, seat) == (P.AVATAR_SAT_ON_SEAT, 44, 1)
        sv = _sv(server, lambda w: w.avatars[c1.avatar_uid])
        assert sv.entered_vehicle_uid == 44 and sv.vehicle_seat_index == 1

        c1.send_seat_change(P.AVATAR_EXITED_VEHICLE, vehicle_uid=44)
        _wait(lambda: _sv(server, lambda w: w.avatars[c1.avatar_uid]
              .entered_vehicle_uid) == 0)

        c1.send_audio_stream_state(True, stream_id=5)
        kind, av, rate, sid = _drain(c2, lambda evs: next(
            (s for e in evs for s in e.audio_streams), None))
        assert kind == P.AUDIO_STREAM_TO_SERVER_STARTED and sid == 5
        assert _sv(server, lambda w: w.avatars[c1.avatar_uid]
                   .audio_stream_id) == 5
    finally:
        c1.stop(); c2.stop()


def test_gear_family(server):
    c = Client("127.0.0.1", server.port)
    c.start()
    try:
        c.send_create_gear_item(GearItem(name="tophat", model_url="hat.glb"))
        g = _drain(c, lambda evs: next(
            (g for e in evs for g in e.gear), None))
        assert g.name == "tophat" and g.item_id > 0
        assert g.owner_id == c.avatar_uid

        c.send_gear_action(P.PICK_UP_GEAR_ITEM, g.item_id)
        g2 = _drain(c, lambda evs: next(
            (x for e in evs for x in e.gear if x.equipped), None))
        assert g2.item_id == g.item_id

        c.send_gear_action(P.CLONE_GEAR_ITEM_IN_INVENTORY, g.item_id)
        _wait(lambda: len(server.user_gear[c.avatar_uid]) == 2)

        c.query_user_gear()
        # list reply contains both items
        _drain(c, lambda evs: (True if sum(
            len(e.gear) for e in evs) >= 2 else None))
    finally:
        c.stop()


def test_map_tiles_and_lod_chunks(server):
    server.site_data.add_screenshot(b"png", is_map_tile=True,
                                    tile_x=1, tile_y=2, tile_z=0)
    server.worlds_state.lod_chunks[("", 4, 5)] = LODChunk(
        x=4, y=5, mesh_url="chunk_4_5.bmesh")
    c = Client("127.0.0.1", server.port)
    c.start()
    try:
        c.query_map_tiles()
        tiles = _drain(c, lambda evs: next(
            (e.map_tiles for e in evs if e.map_tiles), None))
        assert tiles[0][:3] == (1, 2, 0)
        c.query_lod_chunks()
        chunk = _drain(c, lambda evs: next(
            (ch for e in evs for ch in e.lod_chunks), None))
        assert (chunk.x, chunk.y) == (4, 5)
        assert chunk.mesh_url == "chunk_4_5.bmesh"
    finally:
        c.stop()


def test_eth_submission(server):
    c = Client("127.0.0.1", server.port)
    c.start()
    try:
        c.submit_eth_transaction(7, "0x" + "ab" * 20)
        ok, parcel_id, raw_hex = _drain(c, lambda evs: next(
            (x for e in evs for x in e.eth), None))
        assert ok and parcel_id == 7
        assert len(bytes.fromhex(raw_hex)) > 60     # signed RLP payload
        assert server.eth_submitted[0][0] == 7
    finally:
        c.stop()


def test_builder_ai_streaming(server):
    c = Client("127.0.0.1", server.port)
    c.start()
    try:
        c.send_builder_ai_message("build 2 cubes at (3, 4, 0)")
        events = _drain(c, lambda evs: (
            [x for e in evs for x in e.builder_ai]
            if any(k == "turn_complete"
                   for e in evs for k, _ in e.builder_ai) else None),
            timeout=10.0)
        kinds = [k for k, _ in events]
        assert "text_delta" in kinds and "tool_activity" in kinds
        assert kinds[-1] == "turn_complete"
        # Two cubes should exist in the world now, created as this avatar.
        with server.worlds_state.lock:
            w = server.worlds_state.get_world("")
            cubes = [ob for ob in w.objects.values()
                 if ob.creator_id == c.avatar_uid]
        assert len(cubes) == 2
        assert cubes[0].pos[0] == pytest.approx(3.0)
    finally:
        c.stop()


def test_gestures_selection_partial_updates_world_switch(server):
    """The remaining WorkerThread message families: gesture relay (1010/
    1011, stored on the avatar), selection relay (6000/6001), partial
    object updates (3010-3012, permission-gated), world switch (600), and
    protocol sign-up/log-out (8002/8001)."""
    from substrata_tpu.shared.avatar import Avatar

    c1 = Client("127.0.0.1", server.port)
    c2 = Client("127.0.0.1", server.port)
    c1.start(); c2.start()
    try:
        c1.send_avatar_created(Avatar(uid=c1.avatar_uid, name="gesturer"))
        _wait(lambda: c1.avatar_uid in c2.world_state.avatars_snapshot())

        # Gesture: relayed to c2, recorded server-side.
        c1.send_perform_gesture("Wave", flags=1, start_global_time=12.5)
        got = []
        _wait(lambda: (got.extend(c2.pop_events().gestures),
                       (c1.avatar_uid, "Wave") in got)[1])
        assert _sv(server, lambda w: w.avatars[c1.avatar_uid]
                   .performing_gesture) == "Wave"
        c1.send_stop_gesture()
        _wait(lambda: _sv(server, lambda w: w.avatars[c1.avatar_uid]
                          .performing_gesture) == "")

        # Object + selection relay.
        c1.request_create_object(WorldObject(model_url="a.glb", flags=1))
        uid = _drain(c1, lambda evs: next(
            (u for e in evs for u in e.objects_created), None))
        c1.send_select_object(uid)
        sels = []
        _wait(lambda: (sels.extend(c2.pop_events().selections),
                       (uid, True) in sels)[1])

        # Partial updates from the creator: apply + replicate.
        c1.send_object_model_url_changed(uid, "b.glb")
        c1.send_object_flags_changed(uid, 3)
        c1.send_object_lightmap_url_changed(uid, "lm.png")
        def c2_sees():
            ob = c2.world_state.objects_snapshot().get(uid)
            return (ob is not None and ob.model_url == "b.glb"
                    and ob.flags == 3 and ob.lightmap_url == "lm.png")
        _wait(c2_sees)
        # Non-creator partial update on a STATIC object is rejected.
        c2.send_object_model_url_changed(uid, "evil.glb")
        time.sleep(0.3)
        assert _sv(server, lambda w: w.objects[uid].model_url) == "b.glb"

        # World switch: c1 hops to 'moon', receives ITS initial state and
        # stops seeing main-world broadcasts.
        c3 = Client("127.0.0.1", server.port, world_name="moon")
        c3.start()
        c3.send_create_object(WorldObject(model_url="rock.glb", flags=1))
        _wait(lambda: len(c3.world_state.objects_snapshot()) == 1)
        c1.send_change_world("moon")
        def c1_sees_moon():
            obs = c1.world_state.objects_snapshot()
            return any(o.model_url == "rock.glb" for o in obs.values())
        _wait(c1_sees_moon)

        # Protocol sign-up binds the new account; log-out clears it.
        c2.send_sign_up("newbie", "n@x", "newbiepw1")
        logins = []
        _wait(lambda: (logins.extend(c2.pop_events().logged_in),
                       len(logins) > 0)[1])
        assert logins[0][1] == "newbie"
        assert c2.logged_in_user_id == logins[0][0] > 0
        c2.send_log_out()
        _wait(lambda: c2.logged_in_user_id == 0)
        c3.stop()
    finally:
        c1.stop(); c2.stop()
