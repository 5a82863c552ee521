"""Accounts, webserver, stress harness, camera, avatar graphics, physics
checkpoint tests."""

import http.client
import time
import urllib.parse

import numpy as np
import pytest

from substrata_tpu.avatar_graphics import (
    ANIM_FLY, ANIM_IDLE, ANIM_RUN, ANIM_SIT, ANIM_WALK, AvatarGraphics,
    AvatarGraphicsManager,
)
from substrata_tpu.camera import CameraController, CameraMode
from substrata_tpu.server_side.accounts import (
    AccountStore, AuctionState, ParcelAuction,
)
from substrata_tpu.server_side.webserver import WebServer
from substrata_tpu.shared.avatar import ANIM_STATE_FLYING, Avatar


def test_account_lifecycle():
    store = AccountStore()
    u = store.create_user("alice", "a@example.com", "hunter2345")
    assert u.is_password_valid("hunter2345")
    assert not u.is_password_valid("wrong")
    with pytest.raises(ValueError):
        store.create_user("alice", "x@y", "zzzzzz")
    s = store.login("alice", "hunter2345")
    assert s is not None
    assert store.user_for_session(s.session_id) is u
    assert store.login("alice", "nope") is None
    # API keys.
    k = store.create_api_key(u.user_id)
    assert store.user_for_api_key(k.key) is u
    # Password reset invalidates sessions.
    pr = store.request_password_reset("alice")
    assert store.reset_password(pr.token, "newpass1234")
    assert store.user_for_session(s.session_id) is None
    assert store.login("alice", "newpass1234") is not None
    assert not store.reset_password(pr.token, "again")  # single use


def test_parcel_auction():
    a = ParcelAuction(auction_id=1, parcel_id=5, start_time=0.0, end_time=100.0,
                      start_price=1000.0, end_price=100.0)
    assert a.current_price(0) == 1000.0
    assert a.current_price(50) == pytest.approx(550.0)
    assert a.current_price(1000) == 100.0
    assert a.try_lock(user_id=7, now=50.0)
    assert not a.try_lock(user_id=8, now=60.0)  # locked by 7
    assert a.complete_sale(7, now=60.0)
    assert a.state == int(AuctionState.SOLD)
    assert a.sold_price == pytest.approx(460.0)


def test_webserver_routes():
    store = AccountStore()
    ws = WebServer(store, port=0)
    ws.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", ws.port, timeout=5)
        conn.request("GET", "/")
        assert conn.getresponse().read().decode().count("substrata-tpu")
        # Signup + login sets a session cookie.
        body = urllib.parse.urlencode(
            {"username": "bob", "email": "b@x", "password": "pw123456"})
        conn.request("POST", "/signup", body,
                     {"Content-Type": "application/x-www-form-urlencoded"})
        assert conn.getresponse().status == 200
        conn.request("POST", "/login", body,
                     {"Content-Type": "application/x-www-form-urlencoded"})
        r = conn.getresponse()
        cookie = r.getheader("Set-Cookie")
        r.read()
        assert r.status == 200 and "session_id=" in cookie
        sid = cookie.split(";")[0]
        conn.request("GET", "/account", headers={"Cookie": sid})
        r = conn.getresponse()
        assert b"bob" in r.read()
        conn.request("GET", "/api/stats")
        r = conn.getresponse()
        import json
        assert json.loads(r.read())["users"] == 1
        conn.request("GET", "/nonexistent")
        assert conn.getresponse().status == 404
    finally:
        ws.stop()


def test_stress_harness():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stress_test import run_stress_test
    # Half the bots load the browser transport (webserver WebSocket
    # upgrade), half raw TCP — both paths under concurrent load.
    stats = run_stress_test(n_bots=6, seconds=1.0, ws_frac=0.5)
    assert stats["errors"] == []
    assert stats["websocket_bots"] == 3
    assert stats["messages_sent"] > 6 * 20  # ~60 Hz for 1 s each


def test_camera_controller():
    cam = CameraController()
    f0 = cam.get_forwards_move_vec()
    np.testing.assert_allclose(f0, [0, 1, 0], atol=1e-6)
    cam.mouse_look(dx_pixels=500, dy_pixels=0)
    f1 = cam.get_forwards_move_vec()
    assert abs(f1[0]) > 0.5  # turned
    cam.mouse_look(0, -10000)
    assert cam.pitch == pytest.approx(cam.PITCH_LIMIT)  # clamped
    # Right vector stays perpendicular + horizontal.
    r = cam.get_right_move_vec()
    assert abs(np.dot(r, f1)) < 0.3
    assert r[2] == 0.0
    cam.mode = CameraMode.THIRD_PERSON
    pos = cam.camera_position()
    assert np.linalg.norm(pos - cam.eye_pos) == pytest.approx(cam.third_person_dist)


def test_avatar_anim_state_machine():
    g = AvatarGraphics()
    # Idle at rest.
    for _ in range(30):
        g.update([0, 0, 0], 0.0, 0, 1 / 60)
    assert g.cur_anim == ANIM_IDLE
    # Walking at 3 m/s.
    pos = np.zeros(3)
    foot_strikes = 0
    for i in range(120):
        pos = pos + np.array([3.0 / 60, 0, 0])
        ev = g.update(pos, 0.0, 0, 1 / 60)
        foot_strikes += ev.footstrike
    assert g.cur_anim == ANIM_WALK
    assert foot_strikes >= 4  # footsteps fired at stride intervals
    # Running at 15 m/s.
    for i in range(60):
        pos = pos + np.array([15.0 / 60, 0, 0])
        g.update(pos, 0.0, 0, 1 / 60)
    assert g.cur_anim == ANIM_RUN
    # Flying flag wins.
    g.update(pos, 0.0, ANIM_STATE_FLYING, 1 / 60)
    assert g.cur_anim == ANIM_FLY
    # Gesture playback expires.
    assert g.perform_gesture("Wave")
    for _ in range(int(2.6 * 60)):
        g.update(pos, 0.0, 0, 1 / 60)
    assert g.gesture is None


def test_avatar_graphics_manager_vehicle_sit():
    mgr = AvatarGraphicsManager()
    av = Avatar(uid=3, pos=np.zeros(3))
    av.entered_vehicle_uid = 77
    mgr.update_avatar(av, 1 / 60)
    assert av.graphics.cur_anim == ANIM_SIT
    mgr.remove_avatar(3)
    assert 3 not in mgr.by_uid


def test_physics_checkpoint_roundtrip(tmp_path):
    from substrata_tpu.physics import shapes
    from substrata_tpu.physics.state import MotionType, SimConfig
    from substrata_tpu.physics.world import PhysicsObject, PhysicsWorld
    w = PhysicsWorld(SimConfig(capacity=32, max_pairs=64, grid_dim=16, cell_size=4.0))
    w.set_ground_plane(0.0)
    ob = w.add_object(PhysicsObject(shape=shapes.make_sphere(0.5),
                                    pos=np.array([0, 0, 8.0], np.float32),
                                    motion_type=int(MotionType.DYNAMIC)))
    for _ in range(30):  # still mid-fall at save time
        w.think(1 / 60)
    w.sync_transforms()
    path = str(tmp_path / "snap.npz")
    w.save_snapshot(path)
    z_at_save = float(ob.pos[2])

    w2 = PhysicsWorld(SimConfig(capacity=32, max_pairs=64, grid_dim=16, cell_size=4.0))
    w2.load_snapshot(path)
    z_loaded = float(np.asarray(w2.state.pos)[ob.slot, 2])
    assert z_loaded == pytest.approx(z_at_save, abs=1e-5)
    # The restored world continues simulating deterministically.
    for _ in range(60):
        w2.think(1 / 60)
    assert float(np.asarray(w2.state.pos)[ob.slot, 2]) < z_at_save
