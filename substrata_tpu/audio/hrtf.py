"""HRIR bank for binaural spatialisation.

The reference spatialises through Resonance Audio's kBinauralHighQuality
HRTF path (audio/AudioEngine.cpp:857-868).  No measured-HRIR dataset ships
in this image, so the bank is synthesised from the standard spherical-head
model (Brown & Duda 1998): per-ear fractional interaural time delay
(Woodworth) + head-shadow one-pole/one-zero magnitude response + a mild
elevation shelf, rendered to short FIR taps by frequency sampling.  That
yields the two things the round-1 pan+LPF path lacked — true interaural
TIME difference and per-direction spectral shaping — while staying a pure
gather + small-FIR convolution in the mix kernel.

Bank layout: [N_AZ, N_EL, 2 ears, TAPS] f32, azimuth quantised over the
full circle (0 = front, positive = right), elevation over [-45, +45] deg.
"""

from __future__ import annotations

import numpy as np

N_AZ = 16
N_EL = 3
TAPS = 48
HEAD_RADIUS = 0.0875       # m (average human head)
SPEED_OF_SOUND = 343.0
RATE = 48_000


def _ear_response(az: float, el: float, ear_sign: float) -> np.ndarray:
    """FIR taps for one ear via frequency sampling of the spherical-head
    model.  az/el radians; ear_sign +1 = right ear, -1 = left."""
    # Angle between the source direction and this ear's axis.
    ear_az = ear_sign * np.pi / 2.0
    cos_inc = np.cos(el) * np.cos(az - ear_az)
    theta = np.arccos(np.clip(cos_inc, -1.0, 1.0))  # 0 = straight at ear

    # Woodworth ITD: extra path length around the head to the far ear.
    rel = az - ear_az
    rel = (rel + np.pi) % (2 * np.pi) - np.pi
    a = HEAD_RADIUS
    extra = np.where(np.abs(rel) < np.pi / 2,
                     a * (1.0 - np.cos(rel)),
                     a * (1.0 + np.abs(rel) - np.pi / 2))
    delay_s = min(extra / SPEED_OF_SOUND, (TAPS - 16) / RATE)

    # Brown-Duda head-shadow: H(w) = (1 + j a(theta) w / (2 w0)) /
    # (1 + j w / (2 w0)), w0 = c / head_radius; a(theta) in [0.1, 2] boosts
    # toward-the-ear incidence and shadows the far side.
    alpha = 1.05 + 0.95 * np.cos(theta * (180.0 / 150.0))
    w0 = SPEED_OF_SOUND / HEAD_RADIUS
    nfft = 128
    w = 2.0 * np.pi * np.fft.rfftfreq(nfft, 1.0 / RATE)
    h = (1.0 + 1j * alpha * w / (2.0 * w0)) / (1.0 + 1j * w / (2.0 * w0))

    # Elevation shelf: sources above get slightly brighter, below darker
    # (coarse pinna/torso stand-in).
    shelf = 1.0 + 0.25 * np.sin(el) * (w / (w[-1] + 1e-9))
    # Fractional interaural delay applied in the frequency domain (+1.5
    # samples of causal headroom shared by both ears).
    h = h * shelf * np.exp(-1j * w * (delay_s + 1.5 / RATE))

    taps = np.fft.irfft(h, nfft)[:TAPS]
    # Hann fade on the tail to suppress truncation ringing.
    win = np.ones(TAPS)
    win[TAPS // 2:] = 0.5 * (1 + np.cos(np.linspace(0, np.pi, TAPS - TAPS // 2)))
    return (taps * win).astype(np.float32)


_BANK = None


def hrir_bank() -> np.ndarray:
    """[N_AZ, N_EL, 2, TAPS] FIR bank (built once, ~12 KB)."""
    global _BANK
    if _BANK is None:
        bank = np.zeros((N_AZ, N_EL, 2, TAPS), np.float32)
        azs = np.linspace(0, 2 * np.pi, N_AZ, endpoint=False)
        els = np.linspace(-np.pi / 4, np.pi / 4, N_EL)
        for i, az in enumerate(azs):
            for j, el in enumerate(els):
                bank[i, j, 0] = _ear_response(az, el, -1.0)  # left
                bank[i, j, 1] = _ear_response(az, el, +1.0)  # right
        # Normalise overall energy so HRTF on/off is level-matched.
        rms = np.sqrt((bank ** 2).sum(axis=-1, keepdims=True).mean())
        _BANK = bank / max(rms, 1e-6) * 0.7071
    return _BANK


def quantize_direction(x, y, z, dist):
    """Map head-frame direction components to (az_idx, el_idx) arrays.

    x = right, y = forward, z = up components of the source offset."""
    import jax.numpy as jnp
    az = jnp.arctan2(x, y)                       # 0 front, +right
    el = jnp.arctan2(z, jnp.maximum(jnp.sqrt(x * x + y * y), 1e-6))
    ai = jnp.mod(jnp.round(az / (2 * jnp.pi) * N_AZ), N_AZ).astype(jnp.int32)
    ei = jnp.clip(jnp.round((el + jnp.pi / 4) / (jnp.pi / 2) * (N_EL - 1)),
                  0, N_EL - 1).astype(jnp.int32)
    return ai, ei
