"""The fused per-block mix kernel.

Replaces the reference's ResonanceThread inner loop (AudioEngine.cpp:345-555):
for each active source pull 256 frames (shared buffer with looping /
mix-sources with per-layer pitch + crossfade / streaming circular buffer),
resample, spatialise, and downmix to interleaved stereo.

TPU mapping:
- sample fetch + linear-interp resampling: two gathers into the sample pool
  ([S, B] indices), masked for end-of-buffer / looping
- distance attenuation (1/d rolloff with 1 m reference, Resonance default),
  occlusion low-pass + gain (SetSoundObjectOcclusionIntensity parity),
  smoothed per-block gain ramps to avoid zipper noise
- binaural-lite spatialisation: constant-power pan from listener-frame
  azimuth + head-shadow one-pole low-pass for rear/occluded sources
  (kBinauralHighQuality stand-in), stereo sources bypass spatialisation
  (CreateStereoSource parity)
- downmix: [2S gains] x [S, B] samples as ONE matmul on the MXU
- 3-layer engine mix-sources (MixSource, AudioEngine.h:61-69): three
  pitch-shifted loop layers with mix factors, summed per source
"""

from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 256            # frames per block (AudioEngine.cpp:580-585)
ENGINE_RATE = 48_000   # Hz stereo f32 output (AudioEngine.cpp:576-612)
NUM_MIX_LAYERS = 3     # engine-sound layers (BikePhysics.cpp:261-270)
SPEED_OF_SOUND = 343.0  # Doppler (AudioEngine.cpp:131-146)

# Windowed-fetch contract: every buffer in the sample pool carries
# FETCH_PAD extra samples after its end, holding a copy of the buffer's
# head (so looping reads never wrap inside a block) — see
# AudioEngine.load_sound.  DELTA_MAX bounds the effective playback rate
# (pitch * doppler) so the per-block read span is statically known.
# Sized for blocks up to MAX_SUPERBLOCK frames.
MAX_SUPERBLOCK = 1024
DELTA_MAX = 2.5
FETCH_PAD = int(MAX_SUPERBLOCK * DELTA_MAX) + 512  # 3072, row-aligned slack

from substrata_tpu.audio.hrtf import TAPS as HRIR_TAPS, hrir_bank, quantize_direction

# Reverb feedback-delay network (room effects, AudioEngine.cpp:738-767).
FDN_LINES = 4
FDN_MAX_DELAY = 8192   # ~170 ms at 48 kHz


@flax.struct.dataclass
class RoomState:
    """Room reverb state + parameters (set from the containing object's
    AABB like the reference's SetRoomProperties/reflection pass)."""

    delay_lines: jnp.ndarray   # [FDN_LINES, FDN_MAX_DELAY]
    write_idx: jnp.ndarray     # [] i32
    delays: jnp.ndarray        # [FDN_LINES] i32 per-line delay
    feedback: jnp.ndarray      # [] f32 decay gain
    wet: jnp.ndarray           # [] f32 reverb send level (0 = off)


def default_room() -> RoomState:
    return RoomState(
        delay_lines=jnp.zeros((FDN_LINES, FDN_MAX_DELAY), jnp.float32),
        write_idx=jnp.int32(0),
        delays=jnp.array([1323, 1811, 2203, 2707], jnp.int32),
        feedback=jnp.float32(0.0),
        wet=jnp.float32(0.0),
    )


def room_from_aabb(aabb_min, aabb_max, reflectivity: float) -> RoomState:
    """Room parameters from the enclosing object's AABB (the reference
    derives Resonance room properties + reflections the same way,
    AudioEngine.cpp:738-767)."""
    dims = np.maximum(np.asarray(aabb_max, np.float64)
                      - np.asarray(aabb_min, np.float64), 0.5)
    # First-order reflection path lengths per dimension pair -> delays,
    # de-tuned by small co-prime factors so modes don't stack.
    base = np.array([dims[0], dims[1], dims[2],
                     float(np.linalg.norm(dims)) * 0.5])
    # Min delay = MAX_SUPERBLOCK so the FDN processes whole blocks in
    # parallel (reads never depend on writes within the same block) for any
    # supported block size, incl. the 800-frame combined-tick superblock.
    delays = np.clip((base / 343.0 * ENGINE_RATE
                      * np.array([1.0, 1.13, 1.31, 1.53])).astype(np.int64),
                     MAX_SUPERBLOCK, FDN_MAX_DELAY - 1)
    refl = float(np.clip(reflectivity, 0.0, 0.98))
    room = default_room()
    return room.replace(delays=jnp.asarray(delays, jnp.int32),
                        feedback=jnp.float32(0.55 + 0.4 * refl),
                        wet=jnp.float32(0.25 * refl))


# Householder feedback matrix: orthogonal, fully mixing, cheap.  Kept as a
# host np array so importing this module never initialises a JAX backend
# (bench.py's outage-fallback path relies on host-only imports).
_FDN_MIX = np.array([[0.5, 0.5, 0.5, 0.5],
                     [0.5, -0.5, 0.5, -0.5],
                     [0.5, 0.5, -0.5, -0.5],
                     [0.5, -0.5, -0.5, 0.5]], np.float32)


@flax.struct.dataclass
class SourceState:
    """SoA state for all audio sources, capacity S."""

    # Playback
    buf_offset: jnp.ndarray    # [S, L] i32 pool offset per mix layer
    buf_len: jnp.ndarray       # [S, L] i32 (0 = layer unused)
    playhead: jnp.ndarray      # [S, L] f32 fractional sample position
    delta: jnp.ndarray         # [S, L] f32 playback rate (pitch * src_rate/48k)
    mix_factor: jnp.ndarray    # [S, L] f32 per-layer gain (mix sources)
    looping: jnp.ndarray       # [S] bool
    remove_on_finish: jnp.ndarray  # [S] bool
    finished: jnp.ndarray      # [S] bool
    paused: jnp.ndarray        # [S] bool
    # Spatial
    pos: jnp.ndarray           # [S, 3] world position
    vel: jnp.ndarray           # [S, 3] for Doppler
    spatial: jnp.ndarray       # [S] bool (False = plain stereo source)
    volume: jnp.ndarray        # [S]
    mute_factor: jnp.ndarray   # [S] current mute-fade volume factor
    mute_target: jnp.ndarray   # [S] fade target (timed mute/unmute)
    mute_rate: jnp.ndarray     # [S] fade rate per second
    num_occlusions: jnp.ndarray  # [S] f32
    doppler_factor: jnp.ndarray  # [S] smoothed doppler playback scale
    # DSP state
    lp_state: jnp.ndarray      # [S] one-pole low-pass memory
    prev_gain_l: jnp.ndarray   # [S] last block's gains (for ramps)
    prev_gain_r: jnp.ndarray   # [S]
    smoothed_level: jnp.ndarray  # [S] output level meter (AudioSource parity)
    alive: jnp.ndarray         # [S] bool
    # Streaming sources: layer 0 is a ring buffer; reads beyond write_head
    # zero-pad (underflow parity, AudioEngine.cpp:461-474).
    stream_mode: jnp.ndarray   # [S] bool
    stream_write_head: jnp.ndarray  # [S] f32 absolute samples written
    # HRIR convolution history: last TAPS-1 fetched samples per source so
    # block boundaries convolve seamlessly.
    hrir_hist: jnp.ndarray     # [S, TAPS-1] f32

    @property
    def capacity(self):
        return self.pos.shape[0]


def zero_sources(capacity: int) -> SourceState:
    f = jnp.float32
    s, l = capacity, NUM_MIX_LAYERS
    return SourceState(
        buf_offset=jnp.zeros((s, l), jnp.int32),
        buf_len=jnp.zeros((s, l), jnp.int32),
        playhead=jnp.zeros((s, l), f),
        delta=jnp.ones((s, l), f),
        mix_factor=jnp.zeros((s, l), f).at[:, 0].set(1.0),
        looping=jnp.zeros((s,), bool),
        remove_on_finish=jnp.zeros((s,), bool),
        finished=jnp.zeros((s,), bool),
        paused=jnp.zeros((s,), bool),
        pos=jnp.zeros((s, 3), f),
        vel=jnp.zeros((s, 3), f),
        spatial=jnp.ones((s,), bool),
        volume=jnp.ones((s,), f),
        mute_factor=jnp.ones((s,), f),
        mute_target=jnp.ones((s,), f),
        mute_rate=jnp.zeros((s,), f),
        num_occlusions=jnp.zeros((s,), f),
        doppler_factor=jnp.ones((s,), f),
        lp_state=jnp.zeros((s,), f),
        prev_gain_l=jnp.zeros((s,), f),
        prev_gain_r=jnp.zeros((s,), f),
        smoothed_level=jnp.zeros((s,), f),
        alive=jnp.zeros((s,), bool),
        stream_mode=jnp.zeros((s,), bool),
        stream_write_head=jnp.zeros((s,), f),
        hrir_hist=jnp.zeros((s, HRIR_TAPS - 1), f),
    )


@flax.struct.dataclass
class Listener:
    pos: jnp.ndarray      # [3]
    right: jnp.ndarray    # [3] head frame
    forward: jnp.ndarray  # [3]
    up: jnp.ndarray       # [3]
    vel: jnp.ndarray      # [3]
    master_volume: jnp.ndarray  # []


def default_listener() -> Listener:
    return Listener(pos=jnp.zeros(3), right=jnp.array([1.0, 0.0, 0.0]),
                    forward=jnp.array([0.0, 1.0, 0.0]),
                    up=jnp.array([0.0, 0.0, 1.0]), vel=jnp.zeros(3),
                    master_volume=jnp.float32(1.0))


def _fetch_all(pool, src: "SourceState", eff_delta, block: int):
    """Fetch `block` frames for every (source, layer) with linear interp.

    TPU layout (the whole point — see CLAUDE.md design rules): a naive
    pool[idx] with a [S,L,B] index tensor takes XLA's point-gather path
    (~2.8 ms/block measured, 97% of the kernel).  Instead:

      1. gather NW contiguous 128-wide ROWS of the pool per (s,l) with one
         FLAT row-id vector (the fast gather layout; ~0.01 ms), then
      2. interpolate inside the gathered window WITHOUT a gather: factorise
         the local fractional index into a one-hot over 16-sample chunks
         and a 17-wide triangular (linear-interp) kernel, contracted on the
         MXU at Precision.HIGHEST (bf16 passes would cost ~-40 dB SNR).

    Looping/streaming never wrap inside a block: buffers carry FETCH_PAD
    trailing samples mirroring their head (AudioEngine.load_sound), and the
    playhead is re-wrapped between blocks.  Reads past the end of
    non-looping buffers / past a stream's write head are masked to zero
    (underflow zero-pad parity, AudioEngine.cpp:461-474).

    Returns (samples [S, L, B], new_playheads [S, L]).
    """
    s, l = src.playhead.shape
    nw = (127 + int(block * DELTA_MAX) + 1) // 128 + 2  # window rows
    q = nw * 8                                          # 16-wide chunks
    pool128 = pool.reshape(-1, 128)
    n_rows = pool128.shape[0]

    lenf = jnp.maximum(src.buf_len.astype(jnp.float32), 1.0)     # [S, L]
    wrap = (src.looping | src.stream_mode)[:, None]              # [S, 1]
    ph = jnp.where(wrap, jnp.mod(src.playhead, lenf), src.playhead)
    ph = jnp.maximum(ph, 0.0)
    ph_int = jnp.floor(ph).astype(jnp.int32)                     # [S, L]
    ph_frac = ph - ph_int.astype(jnp.float32)

    # 1. Window row gather (flat 1-D row ids -> rows of 128).
    start_i = src.buf_offset + jnp.minimum(ph_int, jnp.maximum(src.buf_len - 1, 0))
    row0 = jnp.clip(start_i >> 7, 0, n_rows - nw)                # [S, L]
    rows = row0[..., None] + jnp.arange(nw, dtype=jnp.int32)     # [S, L, NW]
    w = pool128[rows.reshape(-1)].reshape(s, l, nw * 128)

    # 2. Factorised in-window linear interpolation.
    bf = jnp.arange(block, dtype=jnp.float32)
    t_rel = ph_frac[..., None] + eff_delta[..., None] * bf       # [S, L, B]
    li = t_rel + (start_i - (row0 << 7)).astype(jnp.float32)[..., None]
    li = jnp.clip(li, 0.0, nw * 128 - 1.001)
    qi = jnp.floor(li * (1.0 / 16.0)).astype(jnp.int32)          # [S, L, B]
    u = li - 16.0 * qi.astype(jnp.float32)                       # [0, 16)
    blk = w.reshape(s, l, q, 16)
    # 17th column = next chunk's first sample (interp across chunk edges).
    blk = jnp.concatenate([blk, jnp.roll(blk[..., :1], -1, axis=-2)], -1)
    tri = jnp.maximum(0.0, 1.0 - jnp.abs(
        u[..., None] - jnp.arange(17, dtype=jnp.float32)))       # [S, L, B, 17]
    t1 = jnp.einsum("slqu,slbu->slqb", blk, tri,
                    precision=jax.lax.Precision.HIGHEST)
    oh = (qi[..., None] == jnp.arange(q, dtype=jnp.int32)).astype(jnp.float32)
    out = jnp.einsum("slbq,slqb->slb", oh, t1,
                     precision=jax.lax.Precision.HIGHEST)        # [S, L, B]

    # 3. Range masks.
    sidx = ph[..., None] + eff_delta[..., None] * bf             # rel. buffer
    t_abs = src.playhead[..., None] + eff_delta[..., None] * bf  # absolute
    in_range = jnp.where(
        src.stream_mode[:, None, None],
        t_abs < src.stream_write_head[:, None, None] - 1.0,
        src.looping[:, None, None] | (sidx < lenf[..., None] - 1.0))
    out = out * in_range

    new_playhead = src.playhead + eff_delta * block
    new_playhead = jnp.where(src.looping[:, None] & ~src.stream_mode[:, None],
                             jnp.mod(new_playhead, lenf), new_playhead)
    return out, new_playhead


@partial(jax.jit, static_argnames=("use_hrtf", "block"))
def mix_block(src: SourceState, pool: jnp.ndarray, listener: Listener,
              dt_block=None, room: RoomState | None = None,
              use_hrtf: bool = True, block: int = BLOCK):
    """Mix one stereo block of `block` frames (default 256).

    Returns (new_src, out [B, 2]) — or (new_src, out, new_room) when a
    RoomState is passed (room-effects reverb, AudioEngine.cpp:738-767).
    use_hrtf=True spatialises through the HRIR FIR bank (measured-style
    interaural time + level differences, audio/hrtf.py); False falls back
    to constant-power pan + head-shadow low-pass (the round-1 path).

    block may be any multiple of 16 up to MAX_SUPERBLOCK; larger blocks
    amortise per-dispatch cost (the combined physics+audio tick mixes one
    60 Hz tick of audio, 800 frames, in a single call)."""
    assert block % 16 == 0 and block <= MAX_SUPERBLOCK
    if dt_block is None:
        dt_block = block / ENGINE_RATE
    s = src.capacity
    active = src.alive & ~src.paused & ~src.finished

    # --- Doppler: playback-rate scale from projected velocities
    # (AudioEngine.cpp:131-146), smoothed to avoid pitch jumps. ---
    to_src = src.pos - listener.pos[None, :]
    dist = jnp.linalg.norm(to_src, axis=-1)
    dirn = to_src / jnp.maximum(dist, 1e-6)[:, None]
    v_src = jnp.sum(src.vel * dirn, -1)       # velocity away from listener
    v_lis = jnp.sum(listener.vel[None, :] * dirn, -1)
    doppler = jnp.clip((SPEED_OF_SOUND - v_lis) / jnp.maximum(SPEED_OF_SOUND - (-v_src), 1.0),
                       0.5, 2.0)
    doppler = jnp.where(src.spatial, doppler, 1.0)
    # Per-256-frame smoothing factor 0.2, scaled to the block length.
    dop_alpha = 1.0 - (1.0 - 0.2) ** (block / 256.0)
    dop_smooth = src.doppler_factor + (doppler - src.doppler_factor) * dop_alpha

    # --- Windowed fetch of all (source, layer) streams (see _fetch_all).
    eff_delta = jnp.clip(src.delta * dop_smooth[:, None], 0.0, DELTA_MAX)
    raw, new_heads = _fetch_all(pool, src, eff_delta, block)     # [S, L, B]
    layer_gain = src.mix_factor * (src.buf_len > 0)              # [S, L]
    samples = jnp.einsum("slb,sl->sb", raw, layer_gain,
                         precision=jax.lax.Precision.HIGHEST)
    samples = samples * active[:, None]

    # End-of-buffer bookkeeping (non-looping): finished when layer 0 passes
    # the end (EOF retirement, AudioEngine.cpp:496-517).
    finished = src.finished | (
        (~src.looping) & (~src.stream_mode) & active
        & (new_heads[:, 0] >= src.buf_len[:, 0].astype(jnp.float32) - 1.0))

    # --- Mute fades (timed mute/unmute, AudioEngine.h:79-128). ---
    mute = src.mute_factor + jnp.clip(src.mute_target - src.mute_factor,
                                      -src.mute_rate * dt_block, src.mute_rate * dt_block)

    # --- Spatial gains ---
    # Distance rolloff: 1/d beyond 1 m (Resonance kLogarithmic-ish).
    dist_gain = jnp.minimum(1.0, 1.0 / jnp.maximum(dist, 1.0))
    # Occlusion: each occluding surface attenuates + darkens
    # (sourceNumOcclusionsUpdated -> SetSoundObjectOcclusionIntensity).
    occ_gain = 1.0 / (1.0 + src.num_occlusions)
    # Azimuth in head frame -> constant-power pan.
    x = jnp.sum(to_src * listener.right[None, :], -1)
    y = jnp.sum(to_src * listener.forward[None, :], -1)
    az = jnp.arctan2(x, jnp.maximum(jnp.abs(y), 1e-6) * jnp.sign(y + (y == 0)))
    pan = jnp.clip(x / jnp.maximum(dist, 1e-6), -1.0, 1.0)
    theta = (pan + 1.0) * (jnp.pi / 4.0)
    gl_sp = jnp.cos(theta)
    gr_sp = jnp.sin(theta)
    behind = y < 0.0

    gain = src.volume * mute * jnp.where(src.spatial, dist_gain * occ_gain, 1.0)
    gl = gain * jnp.where(src.spatial, gl_sp, 0.70710678)
    gr = gain * jnp.where(src.spatial, gr_sp, 0.70710678)
    gl = gl * active
    gr = gr * active

    # --- Occlusion low-pass (one-pole, scanned over frames); with HRTF on,
    # head shadow comes from the HRIRs so only occlusion darkens here.
    if use_hrtf:
        fc = jnp.where(src.num_occlusions > 0, 800.0, 20000.0)
        use_lp = src.num_occlusions > 0
    else:
        fc = jnp.where(src.num_occlusions > 0, 800.0,
                       jnp.where(behind & src.spatial, 3000.0, 20000.0))
        use_lp = (src.num_occlusions > 0) | (behind & src.spatial)
    alpha = jnp.clip(2.0 * jnp.pi * fc / ENGINE_RATE, 0.0, 1.0)

    # One-pole low-pass as an associative scan over frames (log2(B) fully
    # vectorised passes instead of a B-step sequential lax.scan):
    # y[n] = a*y[n-1] + b[n], composed as affine maps (a, b).
    a_el = jnp.broadcast_to((1.0 - alpha)[:, None], samples.shape)
    b_el = alpha[:, None] * samples

    def compose(lhs, rhs):
        return lhs[0] * rhs[0], rhs[1] + rhs[0] * lhs[1]

    cum_a, cum_b = jax.lax.associative_scan((
        lambda l, r: compose(l, r)), (a_el, b_el), axis=1)
    filtered = cum_a * src.lp_state[:, None] + cum_b       # [S, B]
    lp_out = filtered[:, -1]
    samples = jnp.where(use_lp[:, None], filtered, samples)

    if use_hrtf:
        # --- HRIR spatialisation: gather each source's quantised-direction
        # FIR pair and convolve (48 static shifts -> one einsum per ear).
        bank = jnp.asarray(hrir_bank())                    # [A, E, 2, T]
        zc = jnp.sum(to_src * listener.up[None, :], -1)
        ai, ei = quantize_direction(x, y, zc, dist)
        h = bank[ai, ei]                                   # [S, 2, T]
        x_ext = jnp.concatenate([src.hrir_hist, samples], axis=1)  # [S, B+T-1]
        t = HRIR_TAPS
        windows = jnp.stack([x_ext[:, t - 1 - k: t - 1 - k + block]
                             for k in range(t)], axis=2)   # [S, B, T]
        conv_l = jnp.einsum("sbt,st->sb", windows, h[:, 0])
        conv_r = jnp.einsum("sbt,st->sb", windows, h[:, 1])
        sig_l = jnp.where(src.spatial[:, None], conv_l, samples)
        sig_r = jnp.where(src.spatial[:, None], conv_r, samples)
        # Direction is in the HRIRs; both channels carry the full gain.
        gl = gain * jnp.where(src.spatial, 1.0, 0.70710678) * active
        gr = gl
        new_hist = x_ext[:, block:]
    else:
        sig_l = sig_r = samples
        new_hist = src.hrir_hist

    # --- Gain ramp over the block (zipper-noise suppression) then the
    # stereo downmix as one [2, S] @ [S, B] matmul on the MXU. ---
    ramp = jnp.linspace(0.0, 1.0, block, dtype=jnp.float32)[None, :]
    gl_t = src.prev_gain_l[:, None] + (gl[:, None] - src.prev_gain_l[:, None]) * ramp
    gr_t = src.prev_gain_r[:, None] + (gr[:, None] - src.prev_gain_r[:, None]) * ramp
    left = jnp.sum(gl_t * sig_l, axis=0)
    right = jnp.sum(gr_t * sig_r, axis=0)
    out = jnp.stack([left, right], axis=1) * listener.master_volume

    new_room = None
    if room is not None:
        # --- Room-effects reverb (FDN): mono send of spatial sources,
        # block-parallel because every line delay >= BLOCK. ---
        send = jnp.sum(samples * (gain * active
                                  * src.spatial.astype(jnp.float32))[:, None],
                       axis=0)                             # [B]
        b = jnp.arange(block, dtype=jnp.int32)
        rpos = jnp.mod(room.write_idx - room.delays[:, None] + b[None, :],
                       FDN_MAX_DELAY)                      # [L, B]
        taps = jnp.take_along_axis(room.delay_lines, rpos, axis=1)
        mixed = (_FDN_MIX @ taps) * room.feedback          # [L, B]
        in_gain = jnp.array([1.0, 0.8, 0.6, 0.5], jnp.float32)
        new_vals = mixed + send[None, :] * in_gain[:, None]
        wpos = jnp.mod(room.write_idx + b, FDN_MAX_DELAY)
        lines = room.delay_lines.at[:, wpos].set(new_vals)
        wet_l = (taps[0] + taps[2]) * room.wet
        wet_r = (taps[1] + taps[3]) * room.wet
        out = out + jnp.stack([wet_l, wet_r], axis=1) * listener.master_volume
        new_room = room.replace(
            delay_lines=lines,
            write_idx=jnp.mod(room.write_idx + block, FDN_MAX_DELAY))

    out = jnp.clip(out, -1.0, 1.0)  # device-callback clamp (AudioEngine.cpp:191-226)

    level = jnp.max(jnp.abs(samples), axis=1) * gain
    smoothed = src.smoothed_level * 0.9 + level * 0.1

    new_src = src.replace(
        playhead=new_heads, finished=finished, mute_factor=mute,
        doppler_factor=dop_smooth, lp_state=lp_out,
        prev_gain_l=gl, prev_gain_r=gr, smoothed_level=smoothed,
        hrir_hist=new_hist,
        alive=src.alive & ~(finished & src.remove_on_finish),
    )
    if room is not None:
        return new_src, out, new_room
    return new_src, out
