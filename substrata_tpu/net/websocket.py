"""RFC 6455 WebSocket server-side support (stdlib only).

The reference's web client is the gui_client compiled with Emscripten: it
speaks the SAME binary protocol, tunnelled through a WebSocket the
webserver upgrades and hands to a game WorkerThread
(webserver/WebServerRequestHandler.cpp:874-882: wrap the accepted socket
in a WebSocket, spawn WorkerThread(websocket, is_websocket_connection)).
This module is that wrap: a handshake helper plus ``WebSocketStream``, a
byte-STREAM adapter over binary frames exposing the four socket methods
WorkerConnection uses (recv / sendall / settimeout / close), so the game
server code runs unchanged over a browser connection.

Framing notes (RFC 6455 §5):
- client->server frames MUST be masked; server->client MUST NOT be.
- the protocol's own length-prefixed messages don't align with WS frame
  boundaries, so received binary/continuation payloads concatenate into a
  plain receive buffer (stream semantics).
- ping is answered with pong inline; close is answered and surfaces as EOF.
"""

from __future__ import annotations

import base64
import hashlib
import os
import struct
import threading

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10

# Untrusted-length bound: the game protocol caps messages at 64 MiB
# (protocol.MessageReader); a frame claiming more is hostile or corrupt —
# close instead of waiting forever for bytes that will never come.
MAX_FRAME = 64 * 1024 * 1024


def accept_key(sec_websocket_key: str) -> str:
    digest = hashlib.sha1((sec_websocket_key.strip() + _WS_GUID).encode())
    return base64.b64encode(digest.digest()).decode()


def handshake_response(sec_websocket_key: str) -> bytes:
    return ("HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept_key(sec_websocket_key)}\r\n"
            "\r\n").encode()


def encode_frame(payload: bytes, opcode: int = OP_BINARY,
                 mask: bool = False) -> bytes:
    """One complete frame (FIN set).  ``mask=True`` is the client side
    (used by tests and by any Python client speaking ws://)."""
    n = len(payload)
    head = bytearray([0x80 | (opcode & 0x0F)])
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head.append(mask_bit | n)
    elif n < (1 << 16):
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        head += key
        masked = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return bytes(head) + masked
    return bytes(head) + payload


class WebSocketStream:
    """Socket-like byte stream over WebSocket frames.

    ``sock`` is the underlying (already-upgraded) TCP/TLS socket.  The
    adapter is used by exactly one reader thread and any number of senders
    (sends serialise on the caller's lock, same contract as a raw socket
    with WorkerConnection.send_lock)."""

    def __init__(self, sock):
        self._sock = sock
        self._raw = bytearray()       # undecoded wire bytes (partial frames
                                      # survive socket timeouts intact)
        self._rbuf = bytearray()      # de-framed payload bytes
        self._closed = False
        # Frames must hit the wire whole: pong replies go out on the
        # reader thread while data frames go out on sender threads, so
        # every frame send takes this lock (a raw socket needs no such
        # lock only because its sends are not framed).
        self._wlock = threading.Lock()

    # -- socket API used by WorkerConnection -----------------------------
    def settimeout(self, t):
        self._sock.settimeout(t)

    def _send_frame(self, frame: bytes):
        with self._wlock:
            self._sock.sendall(frame)

    def sendall(self, data: bytes):
        self._send_frame(encode_frame(bytes(data), OP_BINARY, mask=False))

    def recv(self, n: int) -> bytes:
        """Stream recv.  Raises socket.timeout like a raw socket (the
        worker loop's idle heartbeat relies on it); b'' = closed."""
        while not self._rbuf:
            if self._closed:
                return b""
            self._drain_frames()
            if self._rbuf or self._closed:
                break
            data = self._sock.recv(65536)   # timeout propagates to caller
            if not data:
                self._closed = True
                return b""
            self._raw.extend(data)
        out = bytes(self._rbuf[:n])
        del self._rbuf[:n]
        return out

    def close(self):
        if not self._closed:
            self._closed = True
            try:
                self._send_frame(encode_frame(b"", OP_CLOSE, mask=False))
            except OSError:
                pass
        try:
            self._sock.close()
        except OSError:
            pass

    # -- framing ----------------------------------------------------------
    def _drain_frames(self):
        """Decode every complete frame in the raw buffer (pure, no IO)."""
        while True:
            raw = self._raw
            if len(raw) < 2:
                return
            b0, b1 = raw[0], raw[1]
            opcode = b0 & 0x0F
            masked = bool(b1 & 0x80)
            n = b1 & 0x7F
            off = 2
            if n == 126:
                if len(raw) < 4:
                    return
                (n,) = struct.unpack_from(">H", raw, 2)
                off = 4
            elif n == 127:
                if len(raw) < 10:
                    return
                (n,) = struct.unpack_from(">Q", raw, 2)
                off = 10
            if n > MAX_FRAME:
                self._closed = True
                return
            key_off = off
            if masked:
                off += 4
            if len(raw) < off + n:
                return
            payload = bytes(raw[off:off + n])
            if masked:
                key = raw[key_off:key_off + 4]
                payload = bytes(b ^ key[i % 4]
                                for i, b in enumerate(payload))
            del raw[:off + n]
            if opcode in (OP_BINARY, OP_CONT, OP_TEXT):
                self._rbuf.extend(payload)
            elif opcode == OP_PING:
                try:
                    self._send_frame(encode_frame(payload, OP_PONG,
                                                  mask=False))
                except OSError:
                    self._closed = True
                    return
            elif opcode == OP_CLOSE:
                try:
                    self._send_frame(encode_frame(payload[:2], OP_CLOSE,
                                                  mask=False))
                except OSError:
                    pass
                self._closed = True
                return


class ClientWebSocketStream(WebSocketStream):
    """Client-side adapter (masked sends) — lets the Python Client speak
    ws:// for tests of the browser path."""

    def sendall(self, data: bytes):
        self._send_frame(encode_frame(bytes(data), OP_BINARY, mask=True))


def client_handshake(sock, host: str, path: str = "/",
                     extra_headers: dict | None = None) -> None:
    """Perform the client side of the upgrade on a connected socket.
    ``extra_headers`` e.g. {"Cookie": "session_id=..."} — websocket game
    connections can authenticate with the web session cookie
    (WorkerThread.cpp:183-187)."""
    key = base64.b64encode(os.urandom(16)).decode()
    extra = "".join(f"{k}: {v}\r\n"
                    for k, v in (extra_headers or {}).items())
    req = (f"GET {path} HTTP/1.1\r\n"
           f"Host: {host}\r\n"
           "Upgrade: websocket\r\n"
           "Connection: Upgrade\r\n"
           f"Sec-WebSocket-Key: {key}\r\n"
           f"{extra}"
           "Sec-WebSocket-Version: 13\r\n\r\n").encode()
    sock.sendall(req)
    buf = b""
    while b"\r\n\r\n" not in buf:
        d = sock.recv(4096)
        if not d:
            raise ConnectionError("eof during websocket handshake")
        buf += d
    head = buf.split(b"\r\n\r\n", 1)[0].decode("latin-1")
    if " 101 " not in head.split("\r\n", 1)[0]:
        raise ConnectionError(f"upgrade refused: {head.splitlines()[0]}")
    expect = accept_key(key)
    for line in head.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "sec-websocket-accept":
            if v.strip() != expect:
                raise ConnectionError("bad Sec-WebSocket-Accept")
            return
    raise ConnectionError("missing Sec-WebSocket-Accept")
