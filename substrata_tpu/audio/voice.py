"""Voice chat: capture -> encode -> UDP to server -> relay -> decode ->
per-avatar streaming audio source.

Reference surface:
- audio/MicReadThread.{h,cpp}: mic capture, resample to a codec-legal rate,
  Opus encode (MicReadThread.cpp:304-331), AudioStreamToServerStarted
  control message then UDP voice packets; periodic stream renewal (377).
- gui_client/ClientUDPHandlerThread.{h,cpp}: per-avatar decoder keyed by
  stream id with reset-on-renew (84-121), sequence tracking with
  packet-loss concealment (190-191), decoded PCM pushed into the avatar's
  streaming AudioSource.
- server relay: server/UDPHandlerThread.cpp (implemented in net.server).

Codec: Opus via the system libopus (runtime.codecs), matching the
reference (MicReadThread.cpp:304-331) — with G.711-style mu-law and PCM16
fallbacks for environments without libopus.  The wire format tags each
packet with a codec id so mixed deployments interoperate.

Voice packet layout (type 1, relayed verbatim by the server):
  u8 type=1 | u64 avatar_uid | u32 stream_id | u32 seq | u8 codec | payload
"""

from __future__ import annotations

import socket
import struct
import threading
import time

import numpy as np

from substrata_tpu.net import protocol as P

CODEC_MULAW = 0
CODEC_PCM16 = 1
CODEC_OPUS = 2  # system libopus via runtime.codecs


def default_codec() -> int:
    from substrata_tpu.runtime import codecs
    return CODEC_OPUS if codecs.has_opus() else CODEC_MULAW

VOICE_FRAME = 960          # 20 ms @ 48 kHz (Opus frame parity)
STREAM_RENEW_PERIOD = 30.0  # periodic stream renewal (MicReadThread.cpp:377)

_HDR = struct.Struct("<BQIIB")


# ---------------------------------------------------------------------------
# mu-law codec (vectorised G.711-style, 48 kHz mono)
# ---------------------------------------------------------------------------
_MU = 255.0


def mulaw_encode(x: np.ndarray) -> bytes:
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return ((y * 127.0) + 128.0).astype(np.uint8).tobytes()


def mulaw_decode(data: bytes) -> np.ndarray:
    y = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 127.0
    return (np.sign(y) * ((1.0 + _MU) ** np.abs(y) - 1.0) / _MU).astype(np.float32)


def encode_frame(pcm: np.ndarray, codec: int = CODEC_MULAW) -> bytes:
    """Stateless encode (mu-law / PCM16).  Opus is stateful — VoiceInput
    holds a per-stream runtime.codecs.OpusEncoder instead."""
    if codec == CODEC_MULAW:
        return mulaw_encode(pcm)
    if codec == CODEC_PCM16:
        return (np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes()
    raise ValueError(f"codec {codec} not available")


def decode_frame(data: bytes, codec: int) -> np.ndarray:
    """Stateless decode (mu-law / PCM16); Opus decodes via the receiver's
    per-stream decoder."""
    if codec == CODEC_MULAW:
        return mulaw_decode(data)
    if codec == CODEC_PCM16:
        return np.frombuffer(data, "<i2").astype(np.float32) / 32767.0
    raise ValueError(f"codec {codec} not available")


def pack_voice_packet(avatar_uid: int, stream_id: int, seq: int,
                      payload: bytes, codec: int = CODEC_MULAW) -> bytes:
    return _HDR.pack(P.UDP_VOICE_PACKET, avatar_uid, stream_id, seq, codec) + payload


def unpack_voice_packet(data: bytes):
    ptype, uid, stream_id, seq, codec = _HDR.unpack_from(data, 0)
    return ptype, uid, stream_id, seq, codec, data[_HDR.size:]


class VoiceInput:
    """MicReadThread parity: pull frames from a capture source, encode and
    send voice packets to the server's UDP port.

    capture_source: callable(n_samples) -> f32 [n] mono at 48 kHz (the mic
    device stand-in; hardware capture plugs in here).
    """

    def __init__(self, server_host: str, server_udp_port: int, avatar_uid: int,
                 capture_source, codec: int | None = None):
        self.avatar_uid = avatar_uid
        self.capture = capture_source
        self.codec = default_codec() if codec is None else codec
        self._opus_enc = None
        if self.codec == CODEC_OPUS:
            from substrata_tpu.runtime import codecs
            self._opus_enc = codecs.OpusEncoder(rate=48_000)
        self.addr = (server_host, server_udp_port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.stream_id = 1
        self.seq = 0
        self._stream_started = time.monotonic()
        self._running = False
        self._thread = None
        self.packets_sent = 0

    @property
    def local_udp_port(self) -> int:
        return self.sock.getsockname()[1]

    def send_discovery(self):
        """Register this endpoint with the server relay (type-2 packet,
        UDPHandlerThread.cpp:86-95)."""
        self.sock.sendto(struct.pack("<BQ", P.UDP_DISCOVERY_PACKET,
                                     self.avatar_uid), self.addr)

    def send_one_frame(self):
        pcm = self.capture(VOICE_FRAME)
        if pcm is None:
            return False
        # Stream renewal: new stream id resets the receiver's decoder.
        if time.monotonic() - self._stream_started > STREAM_RENEW_PERIOD:
            self.stream_id += 1
            self.seq = 0
            self._stream_started = time.monotonic()
            if self._opus_enc is not None:
                from substrata_tpu.runtime import codecs
                self._opus_enc = codecs.OpusEncoder(rate=48_000)
        if self.codec == CODEC_OPUS:
            payload = self._opus_enc.encode(np.asarray(pcm, np.float32))
        else:
            payload = encode_frame(pcm, self.codec)
        pkt = pack_voice_packet(self.avatar_uid, self.stream_id, self.seq,
                                payload, self.codec)
        self.sock.sendto(pkt, self.addr)
        self.seq += 1
        self.packets_sent += 1
        return True

    def start(self):
        self._running = True
        self.send_discovery()

        def loop():
            while self._running:
                if not self.send_one_frame():
                    time.sleep(0.005)
                else:
                    time.sleep(VOICE_FRAME / 48_000.0)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread:
            self._thread.join(timeout=1.0)
        self.sock.close()


class VoiceReceiver:
    """ClientUDPHandlerThread parity: receive relayed voice packets, track
    per-avatar streams (decoder reset on stream renewal), conceal lost
    packets with silence, and push PCM into per-avatar streaming audio
    sources."""

    def __init__(self, server_host: str, server_udp_port: int, avatar_uid: int,
                 audio_engine=None):
        self.avatar_uid = avatar_uid
        self.audio = audio_engine
        self.addr = (server_host, server_udp_port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(0.2)
        # Per-avatar stream state: uid -> (stream_id, last_seq)
        self.streams: dict[int, tuple[int, int]] = {}
        self.decoders: dict[int, object] = {}  # uid -> OpusDecoder
        self.sources: dict[int, object] = {}   # uid -> streaming AudioSource
        self.packets_received = 0
        self.packets_lost = 0
        self._running = False
        self._thread = None
        self.last_error = None
        self.received_pcm: dict[int, list] = {}  # for engines without audio

    @property
    def local_udp_port(self) -> int:
        return self.sock.getsockname()[1]

    def send_discovery(self):
        self.sock.sendto(struct.pack("<BQ", P.UDP_DISCOVERY_PACKET,
                                     self.avatar_uid), self.addr)

    def _source_for(self, uid: int):
        if self.audio is None:
            return None
        src = self.sources.get(uid)
        if src is None or src.slot < 0:
            from substrata_tpu.audio.engine import (
                AudioSource, SOURCE_TYPE_STREAMING,
            )
            src = AudioSource(source_type=SOURCE_TYPE_STREAMING,
                              remove_on_finish=False, spatial=True)
            self.audio.add_source(src)
            self.sources[uid] = src
        return src

    def set_avatar_position(self, uid: int, pos):
        src = self.sources.get(uid)
        if src is not None and self.audio is not None:
            src.pos = np.asarray(pos, np.float32)
            self.audio.source_position_updated(src)

    def handle_packet(self, data: bytes):
        ptype, uid, stream_id, seq, codec, payload = unpack_voice_packet(data)
        if ptype != P.UDP_VOICE_PACKET or uid == self.avatar_uid:
            return
        self.packets_received += 1
        prev = self.streams.get(uid)
        if prev is None or prev[0] != stream_id:
            # New/renewed stream: decoder reset (ClientUDPHandlerThread:84-121).
            self.streams[uid] = (stream_id, seq)
            self.decoders.pop(uid, None)
            lost = 0
        else:
            lost = max(0, seq - prev[1] - 1)
            self.streams[uid] = (stream_id, seq)
        dec = None
        if codec == CODEC_OPUS:
            dec = self.decoders.get(uid)
            if dec is None:
                from substrata_tpu.runtime import codecs
                dec = self.decoders[uid] = codecs.OpusDecoder(rate=48_000)
        src = self._source_for(uid)
        if lost:
            # Packet-loss concealment: Opus PLC interpolates the gap
            # (ClientUDPHandlerThread.cpp:190-191); mu-law gets silence.
            self.packets_lost += lost
            if dec is not None:
                gap = np.concatenate([dec.decode(None, VOICE_FRAME)
                                      for _ in range(min(lost, 5))])
            else:
                gap = np.zeros(min(lost, 5) * VOICE_FRAME, np.float32)
            if src is not None:
                self.audio.stream_samples(src, gap)
            elif dec is not None:
                self.received_pcm.setdefault(uid, []).append(gap)
        pcm = (dec.decode(payload, VOICE_FRAME) if dec is not None
               else decode_frame(payload, codec))
        if src is not None:
            self.audio.stream_samples(src, pcm)
        else:
            self.received_pcm.setdefault(uid, []).append(pcm)

    def start(self):
        self._running = True
        self.send_discovery()

        def loop():
            while self._running:
                try:
                    data, _ = self.sock.recvfrom(65536)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if len(data) >= _HDR.size and data[0] == P.UDP_VOICE_PACKET:
                    try:
                        self.handle_packet(data)
                    except Exception as e:  # keep the RX loop alive
                        self.last_error = e

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread:
            self._thread.join(timeout=1.0)
        self.sock.close()
