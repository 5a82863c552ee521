"""Audio engine tests (reference: audio/AudioEngine.cpp pipeline semantics)."""

import numpy as np
import pytest

from substrata_tpu.audio import AudioEngine, AudioSource
from substrata_tpu.audio.engine import SOURCE_TYPE_STREAMING
from substrata_tpu.audio.mix import BLOCK, ENGINE_RATE
from substrata_tpu.audio.resampler import AudioResampler, resample
from substrata_tpu.audio.readers import read_wav, SoundFile
from substrata_tpu.maths import quat as quatm


def sine(freq, seconds=0.5, rate=ENGINE_RATE, amp=0.5):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def rms(x):
    return float(np.sqrt(np.mean(np.square(x))))


def test_mono_source_renders():
    eng = AudioEngine(max_sources=16)
    src = AudioSource(pos=np.array([0, 1, 0], np.float32), looping=True,
                      remove_on_finish=False)
    eng.add_source(src, sound=sine(440))
    out = eng.render(4)
    assert out.shape == (4 * BLOCK, 2)
    assert rms(out) > 0.05
    assert np.abs(out).max() <= 1.0


def test_distance_attenuation():
    eng = AudioEngine(max_sources=16)
    near = AudioSource(pos=np.array([0, 1, 0], np.float32), looping=True,
                       remove_on_finish=False)
    eng.add_source(near, sound=sine(440))
    out_near = eng.render(4)
    eng.remove_source(near)
    far = AudioSource(pos=np.array([0, 30, 0], np.float32), looping=True,
                      remove_on_finish=False)
    eng.add_source(far, sound=sine(440))
    eng.render(1)  # gain ramp settles
    out_far = eng.render(4)
    assert rms(out_far) < rms(out_near) * 0.2


def test_pan_left_right():
    eng = AudioEngine(max_sources=16)
    left = AudioSource(pos=np.array([-5, 0.01, 0], np.float32), looping=True,
                       remove_on_finish=False)
    eng.add_source(left, sound=sine(440))
    eng.render(1)
    out = eng.render(4)
    assert rms(out[:, 0]) > rms(out[:, 1]) * 2.0, (rms(out[:, 0]), rms(out[:, 1]))


def test_one_shot_finishes_and_retires():
    eng = AudioEngine(max_sources=16)
    src = AudioSource(pos=np.zeros(3, np.float32), looping=False,
                      remove_on_finish=True)
    eng.add_source(src, sound=sine(440, seconds=BLOCK / ENGINE_RATE * 2))
    eng.render(4)
    assert src.slot == -1  # retired
    assert int(np.asarray(eng.sources.alive).sum()) == 0


def test_occlusion_attenuates():
    eng = AudioEngine(max_sources=16)
    src = AudioSource(pos=np.array([0, 2, 0], np.float32), looping=True,
                      remove_on_finish=False)
    eng.add_source(src, sound=sine(440))
    eng.render(2)
    clear = rms(eng.render(4))
    src.num_occlusions = 2
    eng.source_num_occlusions_updated(src)
    eng.render(2)
    occluded = rms(eng.render(4))
    assert occluded < clear * 0.7


def test_doppler_shifts_pitch():
    eng = AudioEngine(max_sources=16)
    # Source approaching fast: rendered tone frequency rises.
    src = AudioSource(pos=np.array([0, 50, 0], np.float32),
                      vel=np.array([0, -30, 0], np.float32), looping=True,
                      remove_on_finish=False)
    eng.add_source(src, sound=sine(440, seconds=2.0))
    out = eng.render(40)[:, 0]
    # Estimate dominant frequency by zero crossings.
    zc = np.where(np.diff(np.signbit(out)))[0]
    freq = len(zc) / 2 / (len(out) / ENGINE_RATE)
    assert freq > 455, freq  # approaching at 30 m/s -> ~+9%


def test_mix_sources_engine_sound():
    eng = AudioEngine(max_sources=16)
    src = AudioSource(pos=np.array([0, 1, 0], np.float32), looping=True,
                      remove_on_finish=False)
    eng.add_source(src, mixes=[
        (sine(200), 1.0, 1.0), (sine(400), 1.0, 0.0), (sine(800), 1.0, 0.0)])
    low = eng.render(4)
    # Crossfade to the high layer with pitch shift.
    eng.set_source_mix_params(src, deltas=[1.0, 1.0, 1.5], factors=[0.0, 0.0, 1.0])
    eng.render(1)
    high = eng.render(4)
    zc_l = len(np.where(np.diff(np.signbit(low[:, 0])))[0])
    zc_h = len(np.where(np.diff(np.signbit(high[:, 0])))[0])
    assert zc_h > zc_l * 2  # 800 Hz * 1.5 vs 200 Hz


def test_streaming_source_underflow_zero_pads():
    eng = AudioEngine(max_sources=16)
    src = AudioSource(pos=np.array([0, 1, 0], np.float32),
                      source_type=SOURCE_TYPE_STREAMING, remove_on_finish=False)
    eng.add_source(src)
    # No data yet -> silence.
    out = eng.render(2)
    assert rms(out) < 1e-6
    # Push half a second of tone -> audible.
    eng.stream_samples(src, sine(440, seconds=0.2))
    out = eng.render(4)
    assert rms(out) > 0.05


def test_master_volume_and_mute_fade():
    eng = AudioEngine(max_sources=16)
    src = AudioSource(pos=np.array([0, 1, 0], np.float32), looping=True,
                      remove_on_finish=False)
    eng.add_source(src, sound=sine(440))
    eng.render(2)
    base = rms(eng.render(4))
    eng.set_master_volume(0.25)
    quiet = rms(eng.render(4))
    assert quiet == pytest.approx(base * 0.25, rel=0.2)
    eng.set_master_volume(1.0)
    eng.mute_source(src, fade_time=0.02)
    eng.render(6)  # fade out over ~2 blocks
    muted = rms(eng.render(4))
    assert muted < base * 0.05


def test_pump_thread_and_device_callback():
    eng = AudioEngine(max_sources=16)
    src = AudioSource(pos=np.array([0, 1, 0], np.float32), looping=True,
                      remove_on_finish=False)
    eng.add_source(src, sound=sine(440))
    eng.start()
    import time
    time.sleep(1.0)
    out = eng.read_output(2 * BLOCK)
    eng.shutdown()
    assert rms(out) > 0.02
    # Underflow path zero-pads.
    out2 = eng.read_output(ENGINE_RATE * 2)
    assert out2.shape == (ENGINE_RATE * 2, 2)


def test_wav_roundtrip(tmp_path):
    import wave
    data = (sine(440, 0.1) * 32767).astype(np.int16)
    p = tmp_path / "t.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(data.tobytes())
    sf = read_wav(str(p))
    assert sf.sample_rate == 44100
    assert sf.num_channels == 1
    assert abs(sf.maxVal() - 0.5) < 0.01


def test_resampler_preserves_frequency():
    x = sine(1000, 0.2, rate=44100)
    y = resample(x, 44100, 48000)
    assert len(y) == pytest.approx(len(x) * 48000 / 44100, abs=2)
    zc = len(np.where(np.diff(np.signbit(y)))[0])
    freq = zc / 2 / (len(y) / 48000)
    assert freq == pytest.approx(1000, rel=0.02)


def test_streaming_resampler_api():
    r = AudioResampler(44100, 48000)
    x = sine(500, 0.1, rate=44100)
    pos = 0
    chunks = []
    for _ in range(10):
        need = r.num_src_samples_needed(256)
        chunk = x[pos:pos + need]
        if len(chunk) < need:
            break
        pos += need
        chunks.append(r.resample(chunk, 256))
    out = np.concatenate(chunks)
    zc = len(np.where(np.diff(np.signbit(out)))[0])
    freq = zc / 2 / (len(out) / 48000)
    assert freq == pytest.approx(500, rel=0.05)


def test_mp3_decode_fixture(tmp_path):
    """MP3 decode via libmpg123 (reference decodes with vendored minimp3,
    audio/MP3AudioFileReader.cpp); fixture encoded with libmp3lame."""
    from substrata_tpu.runtime import codecs
    from substrata_tpu.audio.readers import read_sound_file
    if not (codecs.has_mp3() and codecs.has_mp3_encode()):
        pytest.skip("mp3 codecs not available")
    x = sine(440, 1.0, rate=48000)
    path = str(tmp_path / "tone.mp3")
    codecs.encode_mp3(x, 48000, path)
    sf = read_sound_file(path)
    assert sf.sample_rate == 48000
    mono = sf.buf if sf.buf.ndim == 1 else sf.buf[:, 0]
    assert len(mono) > 40000
    sp = np.abs(np.fft.rfft(mono[4000:4000 + 32768]))
    freqs = np.fft.rfftfreq(32768, 1 / 48000)
    assert abs(freqs[int(np.argmax(sp))] - 440) < 5


def test_mp3_streamer_feeds_sources(tmp_path):
    """StreamerThread parity: shared decoder fans out to attached sources,
    keeping ~TARGET_BUFFERED samples queued (StreamerThread.cpp:27-60)."""
    from substrata_tpu.runtime import codecs
    from substrata_tpu.audio.streamer import AudioStreamer, TARGET_BUFFERED
    from substrata_tpu.audio.engine import (
        AudioEngine, AudioSource, SOURCE_TYPE_STREAMING,
    )
    if not (codecs.has_mp3() and codecs.has_mp3_encode()):
        pytest.skip("mp3 codecs not available")
    x = sine(220, 1.0, rate=48000)
    path = str(tmp_path / "loop.mp3")
    codecs.encode_mp3(x, 48000, path)
    eng = AudioEngine(max_sources=8)
    s1 = AudioSource(source_type=SOURCE_TYPE_STREAMING, remove_on_finish=False)
    s2 = AudioSource(source_type=SOURCE_TYPE_STREAMING, remove_on_finish=False)
    eng.add_source(s1)
    eng.add_source(s2)
    st = AudioStreamer(eng)
    st.attach(path, s1, loop=True)
    st.attach(path, s2, loop=True)
    for _ in range(8):
        st.pump()
        st.consume(256)
    # Both sources' write heads advanced by the same decoded sample count.
    wh1 = float(eng.sources.stream_write_head[s1.slot])
    wh2 = float(eng.sources.stream_write_head[s2.slot])
    assert wh1 == wh2 and wh1 >= TARGET_BUFFERED
    st.stop()


def test_hrtf_itd_and_ild():
    """A source hard to the right must reach the right ear EARLIER (ITD)
    and LOUDER (ILD) — the properties the HRIR bank adds over pan+LPF
    (reference: Resonance kBinauralHighQuality, AudioEngine.cpp:857-868)."""
    from substrata_tpu.audio.mix import (
        default_listener, mix_block, zero_sources,
    )
    import jax.numpy as jnp
    src = zero_sources(4)
    # Impulse at sample 100 in the pool.
    pool = jnp.zeros(4096).at[100].set(1.0)
    src = src.replace(
        alive=src.alive.at[0].set(True),
        buf_len=src.buf_len.at[0, 0].set(4096),
        pos=src.pos.at[0].set(jnp.array([3.0, 0.0, 0.0])))  # hard right
    _, out = mix_block(src, pool, default_listener(), use_hrtf=True)
    out = np.asarray(out)
    l, r = out[:, 0], out[:, 1]
    assert np.abs(r).max() > 0
    # ITD via low-passed cross-correlation (ITD is a low-frequency cue;
    # onset thresholds lock onto pinna colouration of measured HRIRs).
    n = len(l)
    freq = np.fft.rfftfreq(4 * n, 1.0 / 48_000)
    keep = (freq < 1500.0).astype(float)
    lf = np.fft.irfft(np.fft.rfft(l, 4 * n) * keep)[:n]
    rf = np.fft.irfft(np.fft.rfft(r, 4 * n) * keep)[:n]
    corr = np.correlate(lf, rf, mode="full")      # lag of RIGHT vs LEFT
    lag = int(np.argmax(corr)) - (n - 1)
    assert lag > 0, lag                   # right ear leads
    assert np.abs(r).max() > 2.5 * max(np.abs(l).max(), 1e-9)  # and louder


def test_room_reverb_tail():
    """Room effects: after the dry impulse passes, the FDN keeps producing
    energy (reverb tail), and a bigger wet level means more tail."""
    from substrata_tpu.audio.mix import (
        default_listener, mix_block, room_from_aabb, zero_sources,
    )
    import jax.numpy as jnp
    src = zero_sources(4)
    pool = jnp.zeros(4096).at[10].set(1.0)
    src = src.replace(
        alive=src.alive.at[0].set(True),
        buf_len=src.buf_len.at[0, 0].set(4096),
        pos=src.pos.at[0].set(jnp.array([0.0, 2.0, 0.0])))
    room = room_from_aabb([-5, -5, 0], [5, 5, 3], reflectivity=0.8)
    lst = default_listener()
    tail = 0.0
    for blk in range(8):
        src, out, room = mix_block(src, pool, lst, room=room)
        if blk >= 2:  # impulse long gone; only the FDN can make sound
            tail += float(np.abs(np.asarray(out)).sum())
    assert tail > 0.01, tail


def test_hrtf_off_matches_legacy_pan():
    """use_hrtf=False keeps the round-1 constant-power pan path working."""
    from substrata_tpu.audio.mix import (
        default_listener, mix_block, zero_sources,
    )
    import jax.numpy as jnp
    src = zero_sources(4)
    pool = jnp.sin(jnp.arange(4096) * 0.1).astype(jnp.float32)
    src = src.replace(
        alive=src.alive.at[0].set(True),
        buf_len=src.buf_len.at[0, 0].set(4096),
        looping=src.looping.at[0].set(True),
        pos=src.pos.at[0].set(jnp.array([3.0, 0.0, 0.0])))
    _, out = mix_block(src, pool, default_listener(), use_hrtf=False)
    out = np.asarray(out)
    assert np.abs(out[:, 1]).mean() > 5.0 * np.abs(out[:, 0]).mean()
