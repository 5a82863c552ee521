"""Fuzzing for the untrusted-bytes decoders (reference: docs/fuzzing.txt —
the reference fuzzes its format decoders with libFuzzer; here hypothesis
drives the same attack surface: protocol framing/payload codecs, WorldObject
deserialisation, voxel group decompression, glTF/GLB parsing, WAV reading).

Property: hostile input may raise a CONTROLLED error (ValueError,
struct.error, ...) but must never crash the process, hang, or succeed with
unbounded allocation."""

import struct
import zlib

import numpy as np
import pytest

try:
    from hypothesis import HealthCheck, given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from substrata_tpu.net import protocol
from substrata_tpu.shared.voxel import compress_voxel_group, decompress_voxel_group
from substrata_tpu.shared.world_object import WorldObject
from substrata_tpu.shared import gltf as gltf_mod
from substrata_tpu.audio import readers

# Errors a decoder is ALLOWED to raise on hostile input.
DECODE_ERRORS = (ValueError, struct.error, EOFError, KeyError, IndexError,
                 UnicodeDecodeError, OverflowError, zlib.error, TypeError,
                 NotImplementedError, MemoryError)

FUZZ = settings(max_examples=200, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


@FUZZ
@given(st.binary(max_size=4096))
def test_fuzz_message_reader(data):
    r = protocol.MessageReader()
    r.feed(data)
    try:
        for msg_type, payload in r.messages():
            assert len(payload) <= len(data)
    except DECODE_ERRORS:
        pass


@FUZZ
@given(st.binary(max_size=512))
def test_fuzz_payload_codecs(payload):
    for fn in (protocol.unpack_physics_transform_update,
               protocol.unpack_physics_ownership_taken,
               protocol.unpack_avatar_transform_update,
               protocol.unpack_time_sync,
               protocol.unpack_chat_message):
        try:
            fn(payload)
        except DECODE_ERRORS:
            pass
    try:
        protocol.unpack_string(payload, 0)
    except DECODE_ERRORS:
        pass


@FUZZ
@given(st.binary(max_size=2048))
def test_fuzz_world_object_from_bytes(data):
    try:
        ob = WorldObject.from_bytes(data)
        # If it decodes, it must round-trip without crashing.
        ob.to_bytes()
    except DECODE_ERRORS:
        pass


@FUZZ
@given(st.binary(max_size=2048))
def test_fuzz_voxel_decompress(data):
    try:
        coords, mats = decompress_voxel_group(data)
        assert len(coords) == len(mats)
        # A decoded group must be bounded by its payload, not attacker-sized.
        assert len(coords) <= 4_000_000
    except DECODE_ERRORS:
        pass


@FUZZ
@given(st.binary(max_size=2048))
def test_fuzz_voxel_bitflip_roundtrip(data):
    """Flip bytes inside an otherwise-valid compressed voxel group."""
    coords = np.array([[0, 0, 0], [1, 0, 0], [0, 2, 1]], np.int32)
    mats = np.array([0, 1, 0], np.int32)
    blob = bytearray(compress_voxel_group(coords, mats))
    for i, b in enumerate(data[:len(blob)]):
        blob[i % len(blob)] ^= b
    try:
        decompress_voxel_group(bytes(blob))
    except DECODE_ERRORS:
        pass


@FUZZ
@given(st.binary(max_size=2048))
def test_fuzz_glb_loader(data):
    # Raw hostile bytes + hostile bytes behind a valid GLB magic/header.
    for blob in (data, b"glTF" + data):
        try:
            gltf_mod.load_gltf(blob)
        except DECODE_ERRORS:
            pass


@FUZZ
@given(st.binary(max_size=2048))
def test_fuzz_wav_reader(data):
    for blob in (data, b"RIFF" + data, b"RIFF\xff\xff\xff\xffWAVE" + data):
        try:
            readers.read_wav(blob)
        except DECODE_ERRORS:
            pass


def test_fuzz_websocket_frames():
    """The WebSocket frame parser consumes untrusted wire bytes — random
    garbage must never crash, hang, or emit unbounded buffers (CLAUDE.md
    decoder-fuzz rule; docs/fuzzing.txt in the reference)."""
    import socket

    from substrata_tpu.net.websocket import (MAX_FRAME, WebSocketStream,
                                             encode_frame)

    rng = np.random.default_rng(42)
    for trial in range(40):
        a, b = socket.socketpair()
        try:
            ws = WebSocketStream(b)
            blob = rng.integers(0, 256, rng.integers(1, 2000),
                                dtype=np.uint8).tobytes()
            a.sendall(blob)
            a.shutdown(socket.SHUT_WR)
            ws.settimeout(1.0)
            total = 0
            for _ in range(200):
                d = ws.recv(65536)
                if not d:
                    break
                total += len(d)
            assert total <= len(blob)     # payload never exceeds input
        finally:
            a.close()
            b.close()

    # A frame CLAIMING a huge length closes the stream instead of waiting
    # forever for bytes that will never arrive.
    a, b = socket.socketpair()
    try:
        ws = WebSocketStream(b)
        hdr = bytes([0x82, 0xFF]) + struct.pack(">Q", MAX_FRAME + 1) + b"\0" * 4
        a.sendall(hdr + b"somedata")
        ws.settimeout(1.0)
        assert ws.recv(64) == b""
    finally:
        a.close()
        b.close()

    # Valid frames intermixed with a ping still round-trip after fuzzing.
    a, b = socket.socketpair()
    try:
        ws = WebSocketStream(b)
        a.sendall(encode_frame(b"ok", mask=True))
        assert ws.recv(16) == b"ok"
    finally:
        a.close()
        b.close()


def test_fuzz_server_dispatch_all_message_ids():
    """Send EVERY known protocol message id (plus unknown ids) with random
    payloads at a live server over a real connection: the worker must stay
    alive (bad payloads surface as ValueError/struct.error caught by the
    worker loop, never a wedged server), and the connection must still be
    functional afterwards."""
    import time

    from substrata_tpu.net.client import Client
    from substrata_tpu.net.server import Server
    from substrata_tpu.shared.world_object import WorldObject

    ids = sorted({v for k, v in vars(protocol).items()
                  if isinstance(v, int) and k.isupper()
                  and 100 <= v <= 20_000})
    rng = np.random.default_rng(9)
    srv = Server(port=0, udp_port=0)
    srv.start()
    try:
        for trial in range(2):
            c = Client("127.0.0.1", srv.port)
            c.start()
            for mid in ids:
                n = int(rng.integers(0, 64))
                payload = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
                c.send_message(protocol.make_message(mid, payload))
            c.send_message(protocol.make_message(99_999, b"unknown id"))
            time.sleep(0.3)
            c.stop()
        # Server still serves a fresh, well-behaved client.
        c2 = Client("127.0.0.1", srv.port)
        c2.start()
        c2.send_create_object(WorldObject(model_url="after.glb", flags=1))
        t0 = time.time()
        while time.time() - t0 < 5:
            if c2.world_state.num_objects() >= 1:
                break
            time.sleep(0.05)
        assert c2.world_state.num_objects() >= 1, \
            "server wedged after fuzzed dispatch"
        c2.stop()
    finally:
        srv.stop()
