"""TLS on both planes (VERDICT r2 item 6).

Reference parity: the game server TLS-wraps every accepted connection
(server/ListenerThread.cpp accept -> TLS handshake) and the webserver
serves HTTPS (server/Server.cpp:519-522).
"""

import ssl
import urllib.request

import numpy as np

from substrata_tpu.net.client import Client
from substrata_tpu.net.server import Server
from substrata_tpu.net.tls import (generate_self_signed_cert,
                                   make_client_context, make_server_context)
from substrata_tpu.shared.world_object import WorldObject


def test_game_protocol_over_tls_loopback():
    cert, key = generate_self_signed_cert()
    srv = Server(tls_context=make_server_context(cert, key))
    srv.start()
    try:
        ctx = make_client_context(cafile=cert)
        c1 = Client("127.0.0.1", srv.port, tls_context=ctx,
                    server_hostname="localhost")
        c2 = Client("127.0.0.1", srv.port, tls_context=ctx,
                    server_hostname="localhost")
        c1.start()
        c2.start()
        assert c1.connected and c2.connected
        assert c1.avatar_uid != c2.avatar_uid
        # Object created by c1 must replicate to c2 over the TLS links.
        ob = WorldObject(uid=0, pos=np.array([1.0, 2.0, 3.0]))
        c1.send_create_object(ob)
        import time
        deadline = time.time() + 5.0
        found = False
        while time.time() < deadline and not found:
            with c2.world_state.lock:
                found = any(
                    np.allclose(o.pos, [1.0, 2.0, 3.0])
                    for o in c2.world_state.objects_snapshot().values())
            time.sleep(0.05)
        assert found, "object did not replicate over TLS"
        c1.stop()
        c2.stop()
    finally:
        srv.stop()


def test_plaintext_client_rejected_by_tls_server():
    cert, key = generate_self_signed_cert()
    srv = Server(tls_context=make_server_context(cert, key))
    srv.start()
    try:
        try:
            # Explicit plaintext opt-out against a TLS server: must fail.
            Client("127.0.0.1", srv.port, tls_context=None)
            connected = True
        except (ConnectionError, OSError, TimeoutError):
            connected = False
        assert not connected
    finally:
        srv.stop()


def test_tls_is_the_default_on_the_game_plane():
    """VERDICT r3 item 10: Server() and Client() with no TLS arguments must
    speak TLS (dev cert), like the reference's always-wrapped game plane
    (ListenerThread.cpp); plaintext requires the explicit opt-out."""
    srv = Server(port=0, udp_port=0)
    srv.start()
    try:
        c = Client("127.0.0.1", srv.port)
        assert isinstance(c.sock, ssl.SSLSocket)
        # The dev-cert context VERIFIES (not CERT_NONE).
        from substrata_tpu.net.tls import dev_client_context
        assert dev_client_context().verify_mode == ssl.CERT_REQUIRED
        c.start()
        assert c.connected
        c.stop()
        # Plaintext opt-out cannot talk to the default (TLS) server.
        try:
            Client("127.0.0.1", srv.port, tls_context=None)
            plain_ok = True
        except (ConnectionError, OSError, TimeoutError):
            plain_ok = False
        assert not plain_ok
    finally:
        srv.stop()


def test_webserver_https():
    from substrata_tpu.server_side.accounts import AccountStore
    from substrata_tpu.server_side.webserver import WebServer
    cert, key = generate_self_signed_cert()
    ws = WebServer(AccountStore(), tls_context=make_server_context(cert, key))
    ws.start()
    try:
        ctx = ssl.create_default_context(cafile=cert)
        ctx.check_hostname = False
        body = urllib.request.urlopen(
            f"https://127.0.0.1:{ws.port}/", context=ctx, timeout=5).read()
        assert b"<html" in body.lower() or len(body) > 0
    finally:
        ws.stop()


def test_websocket_game_connection_over_wss():
    """wss:// — the web client's production transport: TLS webserver
    upgrade -> WebSocketStream over the SSL socket -> game WorkerThread.
    (The reference serves the webclient over HTTPS and notes cookie login
    works over TLS websockets, WorkerThread.cpp:183-187.)"""
    import socket
    import struct
    import time

    from substrata_tpu.net import protocol as P
    from substrata_tpu.net.websocket import (ClientWebSocketStream,
                                             client_handshake)
    from substrata_tpu.server_side.accounts import AccountStore
    from substrata_tpu.server_side.webserver import WebServer

    cert, key = generate_self_signed_cert()
    gs = Server(port=0, udp_port=0)
    gs.start()
    web = WebServer(AccountStore(), worlds_state=gs.worlds_state, port=0,
                    game_server=gs, tls_context=make_server_context(cert, key),
                    secure_cookies=True)
    web.start()
    try:
        raw = socket.create_connection(("127.0.0.1", web.port), timeout=5)
        tls = make_client_context(cert).wrap_socket(
            raw, server_hostname="localhost")
        client_handshake(tls, "localhost")
        s = ClientWebSocketStream(tls)
        s.sendall(struct.pack("<II", P.CYBERSPACE_HELLO,
                              P.CYBERSPACE_PROTOCOL_VERSION))
        buf = b""
        while len(buf) < 8:
            buf += s.recv(8 - len(buf))
        code, ver = struct.unpack("<II", buf)
        assert code == P.CLIENT_PROTOCOL_OK and ver == 54
        s.sendall(struct.pack("<III", P.CONNECTION_TYPE_UPDATES, 0, 0))
        buf = b""
        while len(buf) < 8:
            buf += s.recv(8 - len(buf))
        (uid,) = struct.unpack("<Q", buf)
        assert uid > 0
        # A message round-trips over the encrypted upgraded stream.
        s.sendall(P.make_message(P.PING, b"x" * 8))
        reader = P.MessageReader()
        got = []
        s.settimeout(0.2)
        deadline = time.time() + 5
        while time.time() < deadline and not got:
            try:
                d = s.recv(65536)
            except TimeoutError:
                continue
            reader.feed(d)
            got += [t for t, _ in reader.messages() if t == P.PONG]
        assert got, "no PONG over wss"
        s.close()
    finally:
        web.stop()
        gs.stop()
