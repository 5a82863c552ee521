"""Voice pipeline tests: codec, TX -> server relay -> RX -> audio engine
(reference: audio/MicReadThread + gui_client/ClientUDPHandlerThread +
server/UDPHandlerThread)."""

import time

import numpy as np
import pytest

from substrata_tpu.audio.engine import AudioEngine
from substrata_tpu.audio.mix import BLOCK, ENGINE_RATE
from substrata_tpu.audio.voice import (
    VOICE_FRAME, VoiceInput, VoiceReceiver, decode_frame, encode_frame,
    mulaw_decode, mulaw_encode, pack_voice_packet, unpack_voice_packet,
)
from substrata_tpu.net.client import Client
from substrata_tpu.net.server import Server


def sine(freq, n, rate=ENGINE_RATE, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)).astype(np.float32)


def test_mulaw_roundtrip():
    x = sine(440, 960)
    y = mulaw_decode(mulaw_encode(x))
    assert len(y) == len(x)
    # mu-law SNR for speech-level signals should be decent.
    err = np.sqrt(np.mean((x - y) ** 2))
    assert err < 0.02, err


def test_packet_roundtrip():
    pcm = sine(300, VOICE_FRAME)
    pkt = pack_voice_packet(7, stream_id=2, seq=5, payload=encode_frame(pcm))
    ptype, uid, sid, seq, codec, payload = unpack_voice_packet(pkt)
    assert (uid, sid, seq) == (7, 2, 5)
    out = decode_frame(payload, codec)
    assert np.sqrt(np.mean((pcm - out) ** 2)) < 0.02


def test_voice_end_to_end_through_server():
    server = Server(port=0, udp_port=0)
    server.start()
    try:
        ca = Client("127.0.0.1", server.port); ca.start()
        cb = Client("127.0.0.1", server.port); cb.start()

        pos = {"i": 0}
        tone = sine(440, ENGINE_RATE)

        def capture(n):
            i = pos["i"]
            pos["i"] = i + n
            return tone[i % len(tone):(i % len(tone)) + n] if i + n <= len(tone) * 4 else None

        eng = AudioEngine(max_sources=8)
        tx = VoiceInput("127.0.0.1", server.udp_port, ca.avatar_uid, capture)
        rx = VoiceReceiver("127.0.0.1", server.udp_port, cb.avatar_uid,
                           audio_engine=eng)
        rx.start()
        tx.send_discovery()
        time.sleep(0.2)
        for _ in range(10):
            tx.send_one_frame()
            time.sleep(0.005)
        # The first packet compiles the streaming path; queued packets drain
        # after — poll until they do.
        t0 = time.time()
        while rx.packets_received < 8 and time.time() - t0 < 60:
            time.sleep(0.1)
        assert rx.packets_received >= 8, (rx.packets_received, rx.last_error)
        # The avatar's streaming source renders audible sound.
        src = rx.sources.get(ca.avatar_uid)
        assert src is not None
        src.pos = np.array([0, 1, 0], np.float32)
        eng.source_position_updated(src)
        out = eng.render(6)
        assert np.sqrt(np.mean(out ** 2)) > 0.01
        tx.stop(); rx.stop(); ca.stop(); cb.stop()
    finally:
        server.stop()


def test_packet_loss_concealment():
    rx = VoiceReceiver.__new__(VoiceReceiver)
    rx.avatar_uid = 99
    rx.audio = None
    rx.streams = {}
    rx.decoders = {}
    rx.sources = {}
    rx.packets_received = 0
    rx.packets_lost = 0
    rx.received_pcm = {}
    pcm = encode_frame(sine(300, VOICE_FRAME))
    rx.handle_packet(pack_voice_packet(1, 5, 0, pcm))
    rx.handle_packet(pack_voice_packet(1, 5, 3, pcm))  # seq 1, 2 lost
    assert rx.packets_lost == 2
    # Stream renewal resets sequence tracking (no false loss).
    rx.handle_packet(pack_voice_packet(1, 6, 0, pcm))
    assert rx.packets_lost == 2


def test_opus_codec_roundtrip():
    """Opus voice codec (reference: MicReadThread.cpp:304-331 encodes with
    libopus; this build binds the system library)."""
    from substrata_tpu.runtime import codecs
    if not codecs.has_opus():
        pytest.skip("libopus not available")
    enc = codecs.OpusEncoder(rate=48_000)
    dec = codecs.OpusDecoder(rate=48_000)
    x = sine(440, VOICE_FRAME * 10)
    out = []
    for i in range(10):
        pkt = enc.encode(x[i * VOICE_FRAME:(i + 1) * VOICE_FRAME])
        assert 0 < len(pkt) < 1000  # compressed well below PCM16's 1920 B
        out.append(dec.decode(pkt, VOICE_FRAME))
    y = np.concatenate(out)
    assert len(y) == len(x)
    # Opus has ~6.5 ms of codec lookahead delay, so compare the decoded
    # signal's dominant frequency and steady-state level, not samples.
    b = y[VOICE_FRAME * 2:]
    sp = np.abs(np.fft.rfft(b))
    freqs = np.fft.rfftfreq(len(b), 1 / 48_000)
    assert abs(freqs[int(np.argmax(sp))] - 440) < 10
    assert abs(float(np.sqrt(np.mean(b ** 2))) - 0.5 / np.sqrt(2)) < 0.1


def test_opus_loss_concealment_interpolates():
    from substrata_tpu.audio.voice import CODEC_OPUS
    from substrata_tpu.runtime import codecs
    if not codecs.has_opus():
        pytest.skip("libopus not available")
    rx = VoiceReceiver.__new__(VoiceReceiver)
    rx.avatar_uid = 99
    rx.audio = None
    rx.streams = {}
    rx.decoders = {}
    rx.sources = {}
    rx.packets_received = 0
    rx.packets_lost = 0
    rx.received_pcm = {}
    enc = codecs.OpusEncoder(rate=48_000)
    x = sine(300, VOICE_FRAME * 6)
    pkts = [enc.encode(x[i * VOICE_FRAME:(i + 1) * VOICE_FRAME])
            for i in range(6)]
    for i, p in enumerate(pkts):
        if i == 3:
            continue  # drop one packet
        rx.handle_packet(pack_voice_packet(1, 5, i, p, codec=CODEC_OPUS))
    assert rx.packets_lost == 1
    pcm = np.concatenate(rx.received_pcm[1])
    # PLC fills the gap: output covers all 6 frames, and the concealed
    # region is non-silent (Opus interpolates, unlike the mu-law path).
    assert len(pcm) == 6 * VOICE_FRAME
    concealed = pcm[3 * VOICE_FRAME:4 * VOICE_FRAME]
    assert float(np.abs(concealed).max()) > 0.01
