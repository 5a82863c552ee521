"""Server asset pipeline + backup bot tests (reference: MeshLODGenThread,
ChunkGenThread, backup_bot)."""

import os
import sys
import time

import numpy as np
import pytest

from substrata_tpu.server_side.asset_pipeline import (
    ChunkGenThread, MeshLODGenThread, pack_mesh, unpack_mesh,
)
from substrata_tpu.shared.lod import lod_model_url
from substrata_tpu.shared.resources import ResourceManager

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def grid_mesh(n=16):
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=1).astype(np.float32)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            v = i * n + j
            tris.append([v, v + n, v + 1])
            tris.append([v + 1, v + n, v + n + 1])
    tris = np.array(tris, np.int32)
    return verts, tris, np.zeros(len(tris), np.int32)


def test_mesh_container_roundtrip():
    v, t, m = grid_mesh(4)
    v2, t2, m2 = unpack_mesh(pack_mesh(v, t, m))
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(t2, t)


def test_lod_gen_thread(tmp_path):
    rm = ResourceManager(str(tmp_path))
    v, t, m = grid_mesh(16)
    rm.store_resource("house.stme", pack_mesh(v, t, m))
    worker = MeshLODGenThread(rm)
    worker.start()
    worker.enqueue("house.stme")
    t0 = time.time()
    while len(worker.generated) < 2 and time.time() - t0 < 10:
        time.sleep(0.05)
    worker.stop()
    assert worker.errors == []
    assert rm.is_file_present(lod_model_url("house.stme", 1))
    assert rm.is_file_present(lod_model_url("house.stme", 2))
    v1, t1, _ = unpack_mesh(rm.load_resource(lod_model_url("house.stme", 1)))
    v2_, t2_, _ = unpack_mesh(rm.load_resource(lod_model_url("house.stme", 2)))
    assert len(t2_) <= len(t1) < len(t)


def test_texture_lod_gen_thread(tmp_path):
    """generateBasisTexture parity: one queued texture yields base/_lod1/
    _lod2 .ktx2 resources at the reference's per-level sizes."""
    import io

    from PIL import Image

    from substrata_tpu.shared.texture_compress import (lod_texture_url,
                                                       read_ktx2)
    rm = ResourceManager(str(tmp_path))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (300, 512, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    rm.store_resource("wall.png", buf.getvalue())
    worker = MeshLODGenThread(rm)
    worker.start()
    worker.enqueue_texture("wall.png")
    t0 = time.time()
    while len(worker.generated) < 3 and time.time() - t0 < 30:
        time.sleep(0.05)
    worker.stop()
    assert worker.errors == []
    # Base level: source already <= 4096, rounded up to multiple of 4.
    meta0, lv0 = read_ktx2(rm.load_resource(lod_texture_url("wall.png", 0)))
    assert (meta0["width"], meta0["height"]) == (512, 300)
    meta1, _ = read_ktx2(rm.load_resource(lod_texture_url("wall.png", 1)))
    assert (meta1["width"], meta1["height"]) == (256, 152)  # long edge 256
    meta2, _ = read_ktx2(rm.load_resource(lod_texture_url("wall.png", 2)))
    assert (meta2["width"], meta2["height"]) == (64, 40)    # long edge 64
    # Full mip chains, BC1 sizing: level0 of the base = ceil dims /4 blocks.
    assert len(lv0[0]) == (512 // 4) * (300 // 4) * 8


def test_server_upload_kicks_texture_pipeline(tmp_path):
    """Uploading an image resource over connection type 501 enqueues
    compressed-texture generation when a pipeline is attached (Server.cpp
    new-resource -> MeshLODGenThread flow)."""
    import io

    from PIL import Image

    from substrata_tpu.net.client import upload_resource
    from substrata_tpu.net.server import Server
    from substrata_tpu.shared.texture_compress import lod_texture_url
    server = Server(port=0, udp_port=0, resource_dir=str(tmp_path))
    server.lod_gen = MeshLODGenThread(server.resources)
    server.lod_gen.start()
    server.start()
    try:
        img = np.zeros((32, 32, 3), np.uint8)
        img[:16] = 200
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        code = upload_resource("127.0.0.1", server.port, "mural.png",
                               buf.getvalue())
        from substrata_tpu.net import protocol as P
        assert code == P.UPLOAD_ALLOWED
        t0 = time.time()
        while len(server.lod_gen.generated) < 3 and time.time() - t0 < 30:
            time.sleep(0.05)
        assert server.lod_gen.errors == []
        for level in (0, 1, 2):
            assert server.resources.is_file_present(
                lod_texture_url("mural.png", level))
    finally:
        server.stop()
        server.lod_gen.stop()


def test_chunk_gen_thread(tmp_path):
    rm = ResourceManager(str(tmp_path))
    v, t, m = grid_mesh(8)
    rm.store_resource("a.stme", pack_mesh(v, t, m))
    rm.store_resource("b.stme", pack_mesh(v, t, m))
    worker = ChunkGenThread(rm)
    worker.start()
    m1 = np.eye(4, dtype=np.float32)
    m2 = np.eye(4, dtype=np.float32)
    m2[0, 3] = 10.0
    worker.enqueue("main", (0, 0), [("a.stme", m1), ("b.stme", m2)])
    t0 = time.time()
    while not worker.generated and time.time() - t0 < 10:
        time.sleep(0.05)
    worker.stop()
    assert worker.errors == []
    cv, ct, cm = unpack_mesh(rm.load_resource(worker.generated[0]))
    # Merged + simplified: covers both placements, far fewer tris.
    assert cv[:, 0].max() > 10.0
    assert len(ct) < 2 * len(t)


def test_backup_bot_roundtrip(tmp_path):
    from backup_bot import backup_once, restore_into_server
    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    from substrata_tpu.shared.world_object import WorldObject

    s = Server(port=0, udp_port=0)
    s.start()
    try:
        c = Client("127.0.0.1", s.port)
        c.start()
        for i in range(5):
            c.send_create_object(WorldObject(model_url=f"m{i}.glb", flags=1))
        t0 = time.time()
        def _count():
            with s.worlds_state.lock:
                return len(s.worlds_state.get_world("").objects)
        while _count() < 5 and time.time() - t0 < 5:
            time.sleep(0.05)
        c.stop()
        path = backup_once("127.0.0.1", s.port, str(tmp_path))
        assert os.path.exists(path)
        # Restore into a fresh server.
        s2 = Server(port=0, udp_port=0)
        s2.start()
        try:
            n = restore_into_server(path, "127.0.0.1", s2.port)
            assert n == 5

            def _count2():
                with s2.worlds_state.lock:
                    return len(s2.worlds_state.get_world("").objects)
            t0 = time.time()
            while _count2() < 5 and time.time() - t0 < 5:
                time.sleep(0.05)
            with s2.worlds_state.lock:
                obs = dict(s2.worlds_state.get_world("").objects)
            assert len(obs) == 5
            assert sorted(o.model_url for o in obs.values()) == [
                f"m{i}.glb" for i in range(5)]
        finally:
            s2.stop()
    finally:
        s.stop()


def test_generate_world_lod_chunks(tmp_path):
    """Full ChunkGenThread flow: world objects -> per-chunk combined meshes
    + LODChunk records in worlds_state.lod_chunks."""
    from substrata_tpu.net.server import ServerAllWorldsState
    from substrata_tpu.server_side.asset_pipeline import (
        generate_world_lod_chunks,
    )
    from substrata_tpu.shared.world_object import WorldObject

    rm = ResourceManager(str(tmp_path))
    v, t, m = grid_mesh(8)
    rm.store_resource("house.stme", pack_mesh(v, t, m))
    ws = ServerAllWorldsState()
    with ws.lock:
        w = ws.get_world("")
        # Two objects in chunk (0,0), one in chunk (1,0) at x=130.
        for i, x in enumerate([5.0, 20.0, 130.0]):
            ob = WorldObject(uid=i + 1, model_url="house.stme",
                             pos=np.array([x, 10.0, 0.0]))
            w.objects[ob.uid] = ob
    chunks = generate_world_lod_chunks(ws, rm)
    assert {(c.x, c.y) for c in chunks} == {(0, 0), (1, 0)}
    assert ("", 0, 0) in ws.lod_chunks and ("", 1, 0) in ws.lod_chunks
    # Combined chunk mesh exists as a resource and transforms applied:
    cv, ct, cm = unpack_mesh(rm.load_resource(ws.lod_chunks[("", 1, 0)].mesh_url))
    assert len(cv) > 0
    assert cv[:, 0].min() >= 129.0   # object at x=130 stayed in world space


def test_config_and_settings(tmp_path):
    from substrata_tpu.runtime.config import (
        ServerCredentials, SettingsStore, parse_server_config,
        parse_sub_url, server_arg_parser,
    )

    cfg = parse_server_config(
        "<config><enable_registration>false</enable_registration>"
        "<AI_model_id>claude-x</AI_model_id>"
        "<unknown_field>zzz</unknown_field></config>")
    assert cfg.enable_registration is False
    assert cfg.AI_model_id == "claude-x"
    assert cfg.enable_LOD_chunking is True      # default survives

    creds = ServerCredentials.parse(
        "# comment\npaypal_client_id = abc\n\nbad line\nx=1")
    assert creds.get("paypal_client_id") == "abc" and creds.get("x") == "1"

    sp = str(tmp_path / "settings.json")
    s = SettingsStore(sp)
    s.set_bool("ui/show_minimap", True)
    s.set_double("audio/volume", 0.7)
    s2 = SettingsStore(sp)                       # persisted across instances
    assert s2.get_bool("ui/show_minimap") is True
    assert s2.get_double("audio/volume") == 0.7

    args = server_arg_parser().parse_args(["--db_path", "/tmp/db", "--test"])
    assert args.db_path == "/tmp/db" and args.test

    host, port, world = parse_sub_url("sub://play.example.com:7700/moon")
    assert (host, port, world) == ("play.example.com", 7700, "moon")
