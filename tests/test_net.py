"""Networked replication tests: loopback server + simulated clients — the
fake-network harness the reference lacks (SURVEY.md §4: 'the TPU build
should do better: a loopback in-process server + K simulated clients')."""

import struct
import time

import numpy as np
import pytest

from substrata_tpu.net import protocol as P
from substrata_tpu.net.client import Client
from substrata_tpu.net.server import RecordDatabase, Server
from substrata_tpu.net.snapshots import (
    OWNERSHIP_PERIOD, PhysicsOwnership, SnapshotRings,
)
from substrata_tpu.shared.avatar import Avatar
from substrata_tpu.shared.world_object import DYNAMIC_FLAG, WorldObject


def wait_for(pred, timeout=5.0, interval=0.02):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(interval)
    return False


# World-state replicas are GUARDED_BY their lock (enforced suite-wide via
# SUBSTRATA_LOCK_CHECKS, see shared/guarded.py) — snapshot under the lock.
def obs_snapshot(c):
    ws = c.world_state
    with ws.lock:
        return dict(ws.objects)


def avatars_snapshot(c):
    ws = c.world_state
    with ws.lock:
        return dict(ws.avatars)


def slot_of(c, uid):
    ws = c.world_state
    with ws.lock:
        return ws._slot_by_uid.get(uid)


@pytest.fixture
def server():
    s = Server(port=0, udp_port=0)
    s.start()
    yield s
    s.stop()


def connect(server, world=""):
    c = Client("127.0.0.1", server.port, world_name=world)
    c.start()
    return c


def test_handshake_and_time_sync(server):
    c = connect(server)
    assert c.avatar_uid > 0
    assert wait_for(lambda: c.world_state.time_sync.synced)
    c.send_ping()
    assert wait_for(lambda: c.world_state.time_sync.last_rtt > 0)
    c.stop()


def test_object_create_replicates(server):
    a = connect(server)
    b = connect(server)
    ob = WorldObject(model_url="cube.glb", flags=DYNAMIC_FLAG | 1,
                     pos=np.array([1, 2, 3.0]))
    a.send_create_object(ob)
    assert wait_for(lambda: len(obs_snapshot(b)) == 1)
    got = list(obs_snapshot(b).values())[0]
    assert got.model_url == "cube.glb"
    assert np.allclose(got.pos, [1, 2, 3])
    assert got.uid > 0
    # Late joiner gets the initial send.
    c = connect(server)
    assert wait_for(lambda: len(obs_snapshot(c)) == 1)
    for cl in (a, b, c):
        cl.stop()


def test_physics_snapshot_roundtrip(server):
    a = connect(server)
    b = connect(server)
    ob = WorldObject(flags=DYNAMIC_FLAG | 1)
    a.send_create_object(ob)
    assert wait_for(lambda: len(obs_snapshot(a)) == 1)
    uid = list(obs_snapshot(a))[0]
    assert wait_for(lambda: uid in obs_snapshot(b))

    # A owns + streams snapshots; B's ring fills, A doesn't get an echo.
    a.send_ownership_taken(uid, a.world_state.global_time())
    for i in range(5):
        a.send_physics_snapshot(uid, [i * 1.0, 0, 1], [0, 0, 0, 1],
                                [1, 0, 0], [0, 0, 0])
        time.sleep(0.12)

    def b_has_snapshots():
        slot = slot_of(b, uid)
        return slot is not None and b.world_state.snapshots.next_i[slot] >= 4
    assert wait_for(b_has_snapshots)
    slot_a = slot_of(a, uid)
    if slot_a is not None:
        assert a.world_state.snapshots.next_i[slot_a] == 0  # no echo to owner
    # B sees A as the owner.
    slot_b = slot_of(b, uid)
    assert b.world_state.ownership.owner_id[slot_b] == a.avatar_uid
    a.stop()
    b.stop()


def test_avatar_replication(server):
    a = connect(server)
    b = connect(server)
    av = Avatar(name="alice")
    a.send_avatar_created(av)
    assert wait_for(lambda: a.avatar_uid in avatars_snapshot(b))
    a.send_avatar_transform([5, 6, 7], [0, 0, 1.5])
    assert wait_for(lambda: abs(
        avatars_snapshot(b)[a.avatar_uid].pos[0] - 5) < 1e-5)
    a.stop()
    # Disconnect destroys the avatar on B.
    assert wait_for(lambda: a.avatar_uid not in avatars_snapshot(b))
    b.stop()


def test_chat_broadcast(server):
    a = connect(server)
    b = connect(server)
    a.send_chat("alice", "hello world")
    found = []

    def got():
        found.extend(b.pop_events().chat)
        return any(m == "hello world" for _, m in found)

    assert wait_for(got)
    a.stop(); b.stop()


def test_world_isolation(server):
    a = connect(server, world="alpha")
    b = connect(server, world="beta")
    a.send_create_object(WorldObject(flags=1))
    time.sleep(0.5)
    assert len(obs_snapshot(b)) == 0
    a.stop(); b.stop()


def test_static_object_rejects_physics_updates(server):
    a = connect(server)
    ob = WorldObject(flags=1)  # collidable, NOT dynamic
    a.send_create_object(ob)
    assert wait_for(lambda: len(obs_snapshot(a)) == 1)
    uid = list(obs_snapshot(a))[0]
    a.send_physics_snapshot(uid, [9, 9, 9], [0, 0, 0, 1], [0, 0, 0], [0, 0, 0])
    time.sleep(0.4)
    with server.worlds_state.lock:
        sv_ob = server.worlds_state.get_world("").objects[uid]
        assert not np.allclose(sv_ob.pos, [9, 9, 9])  # dynamic-only guard held
    a.stop()


def test_udp_voice_relay(server):
    import socket as pysock
    a = connect(server)
    b = connect(server)
    sa = pysock.socket(pysock.AF_INET, pysock.SOCK_DGRAM)
    sa.bind(("127.0.0.1", 0))
    sb = pysock.socket(pysock.AF_INET, pysock.SOCK_DGRAM)
    sb.bind(("127.0.0.1", 0))
    sb.settimeout(2.0)
    # Register both endpoints via discovery packets (type 2).
    sa.sendto(struct.pack("<BQ", P.UDP_DISCOVERY_PACKET, a.avatar_uid),
              ("127.0.0.1", server.udp_port))
    sb.sendto(struct.pack("<BQ", P.UDP_DISCOVERY_PACKET, b.avatar_uid),
              ("127.0.0.1", server.udp_port))
    assert wait_for(lambda: len(server.udp_endpoints) == 2)
    # A sends a voice packet (type 1) -> relayed to B, not back to A.
    voice = struct.pack("<BQ", P.UDP_VOICE_PACKET, a.avatar_uid) + b"opusdata"
    sa.sendto(voice, ("127.0.0.1", server.udp_port))
    data, _ = sb.recvfrom(65536)
    assert data.endswith(b"opusdata")
    sa.close(); sb.close(); a.stop(); b.stop()


def test_record_database_roundtrip(tmp_path):
    path = str(tmp_path / "world.db")
    db = RecordDatabase(path)
    db.put(b"ob//1", b"hello")
    db.put(b"ob//2", b"world")
    db.put(b"ob//1", b"hello2")  # override
    db.flush()
    db2 = RecordDatabase(path)
    assert db2.get(b"ob//1") == b"hello2"
    assert db2.get(b"ob//2") == b"world"
    db2.delete(b"ob//2")
    db2.flush()
    db3 = RecordDatabase(path)
    assert db3.get(b"ob//2") is None


def test_server_persistence(tmp_path):
    path = str(tmp_path / "world.db")
    s = Server(port=0, udp_port=0, db_path=path)
    s.start()
    c = connect(s)
    c.send_create_object(WorldObject(model_url="persist.glb", flags=1))
    def sv_count():
        with s.worlds_state.lock:
            return len(s.worlds_state.get_world("").objects)
    assert wait_for(lambda: sv_count() == 1)
    c.stop()
    s.stop()  # flushes
    s2 = Server(port=0, udp_port=0, db_path=path)
    with s2.worlds_state.lock:
        obs = dict(s2.worlds_state.get_world("").objects)
    assert len(obs) == 1
    assert list(obs.values())[0].model_url == "persist.glb"
    s2.stop()


def test_snapshot_interpolation_math():
    rings = SnapshotRings(8)
    # Feed snapshots 0.1 s apart moving +x at 10 m/s.
    for i in range(4):
        rings.insert_snapshot(0, [i * 1.0, 0, 0], [0, 0, 0, 1], [10, 0, 0],
                              [0, 0, 0], client_time=i * 0.1,
                              local_time=i * 0.1, physics=False)
    # Render at t=0.5: delayed by 0.2 -> t=0.3 = exactly snapshot 3.
    pos, rot = rings.interpolated_transforms(np.array([0]), 0.5)
    assert abs(pos[0, 0] - 3.0) < 1e-5
    # Render at t=0.45 -> delayed 0.25 -> halfway between snap 2 and 3.
    pos, _ = rings.interpolated_transforms(np.array([0]), 0.45)
    assert abs(pos[0, 0] - 2.5) < 1e-5


def test_dejitter_playback():
    rings = SnapshotRings(8)
    rings.set_transmission_time_offset(0, 0.05)
    rings.insert_snapshot(0, [1, 0, 0], [0, 0, 0, 1], [0, 0, 0], [0, 0, 0],
                          client_time=10.0, local_time=10.05, physics=True)
    # Not due before client_time + offset + 0.1 padding = 10.15.
    due, *_ = rings.due_physics_snapshots(np.array([0]), 10.1)
    assert not due[0]
    due, pos, rot, lv, av = rings.due_physics_snapshots(np.array([0]), 10.16)
    assert due[0]
    assert pos[0, 0] == 1.0
    # Consumed: not due again.
    due, *_ = rings.due_physics_snapshots(np.array([0]), 10.2)
    assert not due[0]


def test_ownership_arbitration():
    own = PhysicsOwnership(4)
    assert own.try_claim(0, avatar_uid=7, global_time=100.0)
    assert not own.try_claim(0, avatar_uid=8, global_time=101.0)  # held by 7
    # Expiry after 10 s frees it (GUIClient.cpp:10636).
    assert own.try_claim(0, avatar_uid=8, global_time=100.0 + OWNERSHIP_PERIOD + 1)
    # Conflicting remote claim with EARLIER timestamp wins (docs:148-187).
    own.apply_remote_claim(0, avatar_uid=9, claim_time=105.0)
    assert own.owner_id[0] == 9
    # Later remote claim does not steal.
    own.apply_remote_claim(0, avatar_uid=10, claim_time=109.0)
    assert own.owner_id[0] == 9
    assert own.needs_renewal(0, 105.0 + OWNERSHIP_PERIOD * 0.6)


def test_smoothing_decay():
    rings = SnapshotRings(4)
    rings.set_smoothing_from_correction(
        0, old_pos=[1, 0, 0], old_rot=[0, 0, 0, 1],
        new_pos=[0, 0, 0], new_rot=[0, 0, 0, 1])
    assert abs(rings.smooth_translation[0, 0] - 1.0) < 1e-6
    # smooth_change_factor = 1 - 3*min(0.1, dt) per tick (GUIClient.cpp:6634).
    for _ in range(60):
        rings.decay_smoothing(1 / 60.0)
    assert abs(rings.smooth_translation[0, 0]) < 0.05


def test_batched_smoothing_matches_scalar():
    """set_smoothing_from_corrections (the playback hot path) must compute
    exactly what N scalar set_smoothing_from_correction calls compute."""
    rng = np.random.default_rng(3)
    k = 17
    old_pos = rng.normal(size=(k, 3)).astype(np.float32)
    new_pos = rng.normal(size=(k, 3)).astype(np.float32)

    def rand_quat(n):
        q = rng.normal(size=(n, 4)).astype(np.float32)
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    old_rot, new_rot = rand_quat(k), rand_quat(k)
    a, b = SnapshotRings(32), SnapshotRings(32)
    idx = rng.permutation(32)[:k]
    for i in range(k):
        a.set_smoothing_from_correction(idx[i], old_pos[i], old_rot[i],
                                        new_pos[i], new_rot[i])
    b.set_smoothing_from_corrections(idx, old_pos, old_rot, new_pos, new_rot)
    np.testing.assert_allclose(a.smooth_translation, b.smooth_translation,
                               atol=1e-6)
    np.testing.assert_allclose(a.smooth_rotation, b.smooth_rotation,
                               atol=1e-6)


def test_batched_transform_insert_matches_scalar():
    """PhysicsWorld.set_new_ob_transforms_batch must leave identical
    mirrors, dirty sets, wake regions, and structural flags as the scalar
    set_new_ob_to_world_transform loop it replaces."""
    from substrata_tpu import MotionType, PhysicsObject, PhysicsWorld
    from substrata_tpu.physics import shapes
    from substrata_tpu.physics.state import SimConfig

    rng = np.random.default_rng(5)

    def build():
        w = PhysicsWorld(SimConfig(capacity=64, max_pairs=256, grid_dim=16,
                                   cell_size=4.0))
        w.set_ground_plane(0.0)
        obs = [w.add_object(PhysicsObject(
            shape=shapes.make_sphere(0.4),
            pos=np.array([i * 2.0, 0, 1], np.float32),
            motion_type=int(MotionType.DYNAMIC))) for i in range(12)]
        w.think(1 / 60)
        return w, obs

    pos = rng.normal(size=(12, 3)).astype(np.float32) * 3
    rot = np.tile(np.array([0, 0, 0, 1], np.float32), (12, 1))
    lv = rng.normal(size=(12, 3)).astype(np.float32)
    av = rng.normal(size=(12, 3)).astype(np.float32) * 0.1

    wa, oa = build()
    for i, o in enumerate(oa):
        wa.set_new_ob_to_world_transform(o, pos[i], rot[i],
                                         linvel=lv[i], angvel=av[i])
    wb, ob = build()
    wb.set_new_ob_transforms_batch(ob, pos, rot, lv, av)

    for x, y in zip(oa, ob):
        np.testing.assert_allclose(x.pos, y.pos)
        np.testing.assert_allclose(x.linvel, y.linvel)
        np.testing.assert_allclose(x.angvel, y.angvel)
    assert wa._structural_dirty == wb._structural_dirty
    assert sorted(wa._xform_dirty) == sorted(wb._xform_dirty)
    assert len(wa._wake_regions) == len(wb._wake_regions)
    for (ca, ra), (cb, rb) in zip(wa._wake_regions, wb._wake_regions):
        np.testing.assert_allclose(ca, cb)
        assert ra == rb
    # Both settle identically afterwards.
    for _ in range(30):
        wa.think(1 / 60)
        wb.think(1 / 60)
    wa.sync_transforms()
    wb.sync_transforms()
    for x, y in zip(oa, ob):
        np.testing.assert_allclose(x.pos, y.pos, atol=1e-5)


def test_resource_upload_download_roundtrip(server, tmp_path):
    """Network asset transfer (Protocol.h:167-170 + connection types
    501/502): client A uploads a resource, the server broadcasts
    NewResourceOnServer, and client B — which has never seen the file —
    downloads it over a dedicated download connection."""
    from substrata_tpu.net.client import ResourceDownloader, upload_resource
    from substrata_tpu.shared.resources import ResourceManager

    b = connect(server)
    data = b"BMESH" + bytes(range(256)) * 8
    code = upload_resource("127.0.0.1", server.port, "chair_abc123.glb", data)
    assert code == P.UPLOAD_ALLOWED

    # B hears the announcement on its updates connection.
    heard = []
    assert wait_for(lambda: (heard.extend(b.pop_events().new_resources),
                             "chair_abc123.glb" in heard)[1])

    # B fetches over a download connection into its ResourceManager.
    rm = ResourceManager(str(tmp_path / "client_b_res"))
    dl = ResourceDownloader("127.0.0.1", server.port, rm)
    out = dl.fetch(["chair_abc123.glb", "missing.glb"])
    dl.close()
    assert out["chair_abc123.glb"] == data
    assert out["missing.glb"] is None
    assert rm.is_file_present("chair_abc123.glb")
    assert rm.load_resource("chair_abc123.glb") == data
    b.stop()


def test_upload_rejections(server):
    from substrata_tpu.net.client import upload_resource
    # Bad file type.
    assert upload_resource("127.0.0.1", server.port, "evil.exe",
                           b"x") == P.INVALID_FILE_TYPE
    # Read-only server.
    server.read_only = True
    try:
        assert upload_resource("127.0.0.1", server.port, "ok.glb",
                               b"x") == P.SERVER_IS_IN_READ_ONLY_MODE
    finally:
        server.read_only = False


def test_get_files_on_updates_connection(server):
    """GetFiles also works on the normal updates connection (blocking
    helper Client.download_files)."""
    from substrata_tpu.net.client import upload_resource
    upload_resource("127.0.0.1", server.port, "tone.mp3", b"\xff\xfbsome")
    a = connect(server)
    out = a.download_files(["tone.mp3"])
    assert out["tone.mp3"] == b"\xff\xfbsome"
    a.stop()


def test_compressed_initial_send(server):
    """Clients advertising STREAMING_COMPRESSED_OBJECT_SUPPORT receive the
    world as ONE ObjectInitialSendCompressed zlib batch (Protocol.h:137)."""
    a = connect(server)
    for i in range(10):
        a.send_create_object(WorldObject(flags=1))
    assert wait_for(lambda: len(obs_snapshot(a)) >= 10)
    # New client with the capability: receives all objects (via the batch).
    b = Client("127.0.0.1", server.port,
               capabilities=P.STREAMING_COMPRESSED_OBJECT_SUPPORT)
    b.start()
    assert wait_for(lambda: len(obs_snapshot(b)) >= 10)
    # And one WITHOUT the capability still gets everything per-object.
    c = Client("127.0.0.1", server.port, capabilities=0)
    c.start()
    assert wait_for(lambda: len(obs_snapshot(c)) >= 10)
    a.stop(); b.stop(); c.stop()


def test_protocol_login_binds_account_and_ids_never_collide(server):
    """LogInMessage 8000 (Protocol.h:196-204): binding an account to the
    game connection makes created objects account-owned; anonymous avatar
    uids allocate from a base disjoint from account UserIDs so an
    anonymous connection can never alias a logged-in user in the shared
    u32 identity fields (creator_id, physics ownership)."""
    from substrata_tpu.net.server import AVATAR_UID_BASE

    alice = server.accounts.create_user("alice", "al@x", "alicepw1")
    a = connect(server)     # will log in
    b = connect(server)     # stays anonymous
    assert a.avatar_uid >= AVATAR_UID_BASE
    assert b.avatar_uid >= AVATAR_UID_BASE

    # Wrong password -> error event, identity unchanged.
    a.send_login("alice", "wrongpw")
    errs = []
    assert wait_for(lambda: (errs.extend(a.pop_events().errors),
                             any("failed" in e.lower() for e in errs))[1])
    assert a.logged_in_user_id == 0

    # Correct login -> LoggedInMessage with the account id.
    a.send_login("alice", "alicepw1")
    logins = []
    assert wait_for(lambda: (logins.extend(a.pop_events().logged_in),
                             len(logins) > 0)[1])
    assert logins[0] == (alice.user_id, "alice")

    # Objects created after login carry the ACCOUNT id; anonymous ones
    # carry the (high-based) avatar uid.
    a.send_create_object(WorldObject(model_url="acct.glb", flags=1))
    b.send_create_object(WorldObject(model_url="anon.glb", flags=1))

    def creators():
        with server.worlds_state.lock:
            return {ob.model_url: ob.creator_id
                    for ob in server.worlds_state.get_world("")
                    .objects.values()}
    assert wait_for(lambda: len(creators()) == 2)
    got = creators()
    assert got["acct.glb"] == alice.user_id
    assert got["anon.glb"] == b.avatar_uid >= AVATAR_UID_BASE
    assert got["anon.glb"] != alice.user_id
    a.stop(); b.stop()
