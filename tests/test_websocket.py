"""Protocol-over-WebSocket: the web-client transport path
(WebServerRequestHandler.cpp:874-882: upgrade, wrap, hand to a game
WorkerThread; net/websocket.py + the /webclient page)."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from substrata_tpu.net import protocol as P
from substrata_tpu.net.client import Client
from substrata_tpu.net.server import Server
from substrata_tpu.net.websocket import (ClientWebSocketStream, OP_BINARY,
                                         OP_PING, WebSocketStream,
                                         accept_key, client_handshake,
                                         encode_frame)
from substrata_tpu.shared.world_object import WorldObject


def wait_for(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.02)
    return False


def test_accept_key_rfc_example():
    # The worked example from RFC 6455 section 1.3.
    assert (accept_key("dGhlIHNhbXBsZSBub25jZQ==")
            == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")


def test_frame_roundtrip_all_length_classes():
    a, b = socket.socketpair()
    try:
        ws = WebSocketStream(b)
        for n in (0, 1, 125, 126, 65535, 65536, 200_000):
            payload = bytes(i & 0xFF for i in range(n))
            a.sendall(encode_frame(payload, OP_BINARY, mask=True))
            got = b""
            while len(got) < n:
                d = ws.recv(65536)
                assert d != b"" or n == 0
                if not d:
                    break
                got += d
            assert got == payload, n
        # Fragmented delivery: split one frame across many sends.
        frame = encode_frame(b"hello world", OP_BINARY, mask=True)
        for i in range(len(frame)):
            a.sendall(frame[i:i + 1])
        got = b""
        while len(got) < 11:
            got += ws.recv(64)
        assert got == b"hello world"
    finally:
        a.close()
        b.close()


def test_ping_answered_with_pong():
    a, b = socket.socketpair()
    try:
        ws = WebSocketStream(b)
        a.sendall(encode_frame(b"beat", OP_PING, mask=True))
        a.sendall(encode_frame(b"data", OP_BINARY, mask=True))
        assert ws.recv(16) == b"data"
        a.settimeout(2.0)
        raw = a.recv(64)
        assert raw[0] & 0x0F == 0x0A       # pong opcode
        assert raw[2:] == b"beat"
    finally:
        a.close()
        b.close()


@pytest.fixture
def stack():
    """Game server + webserver with the websocket bridge."""
    from substrata_tpu.server_side.accounts import AccountStore
    from substrata_tpu.server_side.webserver import WebServer

    gs = Server(port=0, udp_port=0)
    gs.start()
    web = WebServer(AccountStore(), worlds_state=gs.worlds_state, port=0,
                    game_server=gs)
    web.start()
    yield gs, web
    web.stop()
    gs.stop()


class WsProtocolClient:
    """Minimal protocol client over ws:// — what the browser JS does."""

    def __init__(self, port):
        raw = socket.create_connection(("127.0.0.1", port), timeout=5.0)
        client_handshake(raw, f"127.0.0.1:{port}")
        self.s = ClientWebSocketStream(raw)
        self.s.sendall(struct.pack("<II", P.CYBERSPACE_HELLO,
                                   P.CYBERSPACE_PROTOCOL_VERSION))
        code, _ver = struct.unpack("<II", self._recv_exact(8))
        assert code == P.CLIENT_PROTOCOL_OK
        self.s.sendall(struct.pack("<III", P.CONNECTION_TYPE_UPDATES, 0, 0))
        (self.avatar_uid,) = struct.unpack("<Q", self._recv_exact(8))
        self.reader = P.MessageReader()
        self.messages = []

    def _recv_exact(self, n):
        buf = b""
        while len(buf) < n:
            d = self.s.recv(n - len(buf))
            if not d:
                raise ConnectionError("eof")
            buf += d
        return buf

    def pump(self, duration=0.3):
        self.s.settimeout(0.1)
        deadline = time.time() + duration
        while time.time() < deadline:
            try:
                d = self.s.recv(65536)
            except TimeoutError:
                continue
            if not d:
                break
            self.reader.feed(d)
            self.messages.extend(self.reader.messages())

    def close(self):
        self.s.close()


def test_protocol_over_websocket_replicates_both_ways(stack):
    gs, web = stack
    # A normal TCP client and a websocket client share the world.
    tcp = Client("127.0.0.1", gs.port)
    tcp.start()
    wsc = WsProtocolClient(web.port)
    assert wsc.avatar_uid > 0 and wsc.avatar_uid != tcp.avatar_uid

    # TCP -> WS: object created over TCP appears on the websocket side.
    tcp.send_create_object(WorldObject(model_url="bridge.glb", flags=1,
                                       pos=np.array([4.0, 5.0, 0.5])))
    found = {}

    def ws_saw_object():
        wsc.pump(0.2)
        for t, payload in wsc.messages:
            if t in (P.OBJECT_CREATED, P.OBJECT_INITIAL_SEND):
                ob = WorldObject.from_bytes(payload)
                found[ob.uid] = ob
        return any(o.model_url == "bridge.glb" for o in found.values())
    assert wait_for(ws_saw_object)
    ob = next(o for o in found.values() if o.model_url == "bridge.glb")
    assert np.allclose(ob.pos, [4.0, 5.0, 0.5])

    # WS -> TCP: chat from the websocket client reaches the TCP client.
    wsc.s.sendall(P.make_message(
        P.CHAT_MESSAGE_ID, P.pack_chat_message("webby", "hi from browser")))
    heard = []
    assert wait_for(lambda: (heard.extend(tcp.pop_events().chat),
                             ("webby", "hi from browser") in heard)[1])

    # WS avatar transform reaches the TCP client's replica.
    wsc.s.sendall(P.make_message(
        P.AVATAR_CREATED,
        _avatar_bytes(wsc.avatar_uid, "webby", [1.0, 2.0, 1.67])))
    wsc.s.sendall(P.make_message(
        P.AVATAR_TRANSFORM_UPDATE,
        P.pack_avatar_transform_update(wsc.avatar_uid, [7.0, 8.0, 1.67],
                                       [0, 0, 0.5], 1)))

    def tcp_sees_avatar():
        avs = tcp.world_state.avatars_snapshot()
        av = avs.get(wsc.avatar_uid)
        return av is not None and abs(float(av.pos[0]) - 7.0) < 1e-5
    assert wait_for(tcp_sees_avatar)

    wsc.close()
    tcp.stop()


def _avatar_bytes(uid, name, pos):
    from substrata_tpu.shared.avatar import Avatar
    av = Avatar(uid=uid, name=name, pos=np.asarray(pos, np.float64))
    return av.to_bytes()


def test_webclient_page_served(stack):
    import http.client
    gs, web = stack
    conn = http.client.HTTPConnection("127.0.0.1", web.port, timeout=5)
    conn.request("GET", "/webclient")
    r = conn.getresponse()
    body = r.read().decode()
    assert r.status == 200
    assert "WebSocket" in body and "CYBERSPACE" not in body
    assert str(P.CYBERSPACE_HELLO) in body      # speaks the real protocol
    assert "AVATAR_TRANSFORM_UPDATE" in body


def test_upgrade_without_game_server_404s():
    from substrata_tpu.server_side.accounts import AccountStore
    from substrata_tpu.server_side.webserver import WebServer
    web = WebServer(AccountStore(), port=0)
    web.start()
    try:
        raw = socket.create_connection(("127.0.0.1", web.port), timeout=5)
        raw.sendall(b"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                    b"Connection: Upgrade\r\nSec-WebSocket-Key: AAAA\r\n\r\n")
        raw.settimeout(3.0)
        head = raw.recv(4096).decode("latin-1", "replace")
        assert "404" in head.split("\r\n")[0]
        raw.close()
    finally:
        web.stop()


def test_websocket_cookie_login_binds_account_identity():
    """WorkerThread.cpp:183-187 parity: a websocket game connection carrying
    the web session cookie acts AS that account — objects it creates are
    owned by the user id (durable across connections), and parcel write
    permissions keyed on the account apply."""
    import http.client
    import urllib.parse

    from substrata_tpu.server_side.accounts import AccountStore
    from substrata_tpu.server_side.webserver import WebServer
    from substrata_tpu.shared.parcel import Parcel

    store = AccountStore()
    store.create_user("admin", "a@x", "adminpw1")       # god user id 1
    alice = store.create_user("alice", "al@x", "alicepw1")
    gs = Server(port=0, udp_port=0)
    gs.start()
    web = WebServer(store, worlds_state=gs.worlds_state, port=0,
                    game_server=gs)
    web.start()
    try:
        # Web login -> session cookie.
        conn = http.client.HTTPConnection("127.0.0.1", web.port, timeout=5)
        body = urllib.parse.urlencode({"username": "alice",
                                       "password": "alicepw1"})
        conn.request("POST", "/login_post", body,
                     {"Content-Type": "application/x-www-form-urlencoded"})
        r = conn.getresponse()
        cookie = r.getheader("Set-Cookie").split(";")[0]
        r.read()

        # Alice owns a parcel; a STATIC object inside it belongs to someone
        # else, so only parcel write perms can authorise editing it.
        with gs.worlds_state.lock:
            w = gs.worlds_state.get_world("")
            w.parcels[5] = Parcel(parcel_id=5, owner_id=alice.user_id,
                                  aabb_min=np.array([0., 0., 0.]),
                                  aabb_max=np.array([10., 10., 10.]))

        other = Client("127.0.0.1", gs.port)
        other.start()
        target = WorldObject(model_url="statue.glb", flags=1,  # static
                             pos=np.array([5.0, 5.0, 1.0]))
        other.request_create_object(target)
        assert wait_for(
            lambda: len(other.world_state.objects_snapshot()) == 1)
        uid = list(other.world_state.objects_snapshot())[0]

        # Cookie-authenticated websocket connection.
        raw = socket.create_connection(("127.0.0.1", web.port), timeout=5)
        from substrata_tpu.net.websocket import client_handshake as hs
        hs(raw, f"127.0.0.1:{web.port}", extra_headers={"Cookie": cookie})
        s = ClientWebSocketStream(raw)
        s.sendall(struct.pack("<II", P.CYBERSPACE_HELLO,
                              P.CYBERSPACE_PROTOCOL_VERSION))
        buf = b""
        while len(buf) < 8:
            buf += s.recv(8 - len(buf))
        s.sendall(struct.pack("<III", P.CONNECTION_TYPE_UPDATES, 0, 0))
        buf = b""
        while len(buf) < 8:
            buf += s.recv(8 - len(buf))

        # 1. Created objects carry the ACCOUNT id as creator.
        mine = WorldObject(model_url="alice.glb", flags=1,
                           pos=np.array([1.0, 1.0, 1.0]))
        s.sendall(P.make_message(P.OBJECT_CREATED, mine.to_bytes()))

        def created_with_account_id():
            with gs.worlds_state.lock:
                for ob in gs.worlds_state.get_world("").objects.values():
                    if ob.model_url == "alice.glb":
                        return ob.creator_id == alice.user_id
            return False
        assert wait_for(created_with_account_id)

        # 2. Parcel write perms: edit someone else's STATIC object inside
        #    alice's parcel (rejected for anonymous connections).
        target2 = WorldObject.from_bytes(
            next(ob.to_bytes()
                 for ob in other.world_state.objects_snapshot().values()
                 if ob.uid == uid))
        target2.content = "edited by alice"
        s.sendall(P.make_message(P.OBJECT_FULL_UPDATE, target2.to_bytes()))

        def edited():
            with gs.worlds_state.lock:
                ob = gs.worlds_state.get_world("").objects.get(uid)
                return ob is not None and ob.content == "edited by alice"
        assert wait_for(edited), "parcel write perms not honoured over ws"
        s.close()
        other.stop()
    finally:
        web.stop()
        gs.stop()
