"""HRIR bank for binaural spatialisation.

The reference spatialises through Resonance Audio's kBinauralHighQuality
HRTF path (audio/AudioEngine.cpp:857-868), whose filters come from the
SADIE binaural measurement database (Subject_002, spherical-harmonic
domain — resonance-audio/third_party/SADIE_hrtf_database, Apache-2.0).

This module renders that same MEASURED dataset to a direction-grid FIR
bank: the order-3 ACN/SN3D SH HRIRs (16 channels x 256 taps, 48 kHz,
extracted once by tools/extract_sadie.py into audio/assets/) are projected
onto each grid direction with real spherical harmonics; the right ear uses
the left-right symmetry fold (negate the sin-azimuth SH terms), exactly as
Resonance's symmetric binaural decoder does.  Conventions verified
empirically: +90 deg AmbiX azimuth renders ~10 dB louder in the left ear
with the mirror image at -90 (tests/test_hrtf_properties.py).

When the asset is missing the bank falls back to the analytic
spherical-head model (Brown & Duda 1998: Woodworth ITD + head-shadow
magnitude + elevation shelf) used in earlier rounds.

Bank layout: [N_AZ, N_EL, 2 ears, TAPS] f32, azimuth quantised over the
full circle (0 = front, positive = right), elevation over [-45, +45] deg.
"""

from __future__ import annotations

import os

import numpy as np

N_AZ = 16
N_EL = 3
HEAD_RADIUS = 0.0875       # m (average human head)
SPEED_OF_SOUND = 343.0
RATE = 48_000

_ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "assets", "sadie_sh_hrir.npz")
_HAS_MEASURED = os.path.exists(_ASSET)
# Measured responses carry real interaural delay + pinna tails: 64 taps
# hold >= 99% of the rendered energy (window [8, 72) of the 256-tap SH
# HRIRs).  The analytic fallback keeps its original 48.
TAPS = 64 if _HAS_MEASURED else 48
_MEASURED_WINDOW_START = 8


def _ear_response(az: float, el: float, ear_sign: float) -> np.ndarray:
    """Analytic-fallback FIR taps for one ear via frequency sampling of the
    spherical-head model.  az/el radians; ear_sign +1 = right ear, -1 = left."""
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


def _sh_ambix_order3(az: float, el: float) -> np.ndarray:
    """Real spherical harmonics, ACN order / SN3D normalisation (AmbiX),
    through order 3.  az counter-clockwise from front (+ = left), el up."""
    ca, sa = np.cos(az), np.sin(az)
    ce, se = np.cos(el), np.sin(el)
    return np.array([
        1.0,
        sa * ce, se, ca * ce,
        np.sqrt(3) / 2 * np.sin(2 * az) * ce * ce,
        np.sqrt(3) / 2 * sa * np.sin(2 * el),
        0.5 * (3 * se * se - 1),
        np.sqrt(3) / 2 * ca * np.sin(2 * el),
        np.sqrt(3) / 2 * np.cos(2 * az) * ce * ce,
        np.sqrt(5 / 8) * np.sin(3 * az) * ce ** 3,
        np.sqrt(15) / 2 * np.sin(2 * az) * se * ce * ce,
        np.sqrt(3 / 8) * sa * ce * (5 * se * se - 1),
        0.5 * se * (5 * se * se - 3),
        np.sqrt(3 / 8) * ca * ce * (5 * se * se - 1),
        np.sqrt(15) / 2 * np.cos(2 * az) * se * ce * ce,
        np.sqrt(5 / 8) * np.cos(3 * az) * ce ** 3,
    ], np.float32)


# Left->right mirror: negate the sin-azimuth (m < 0) SH components.
_MIRROR = np.array([1, -1, 1, 1, -1, -1, 1, 1, 1,
                    -1, -1, -1, 1, 1, 1, 1], np.float32)


def _measured_bank() -> np.ndarray:
    d = np.load(_ASSET)
    sh = d["sh_hrir"].astype(np.float32)          # [16, 256]
    assert int(d["rate"]) == RATE, "SADIE asset must be 48 kHz"
    w0 = _MEASURED_WINDOW_START
    bank = np.zeros((N_AZ, N_EL, 2, TAPS), np.float32)
    azs = np.linspace(0, 2 * np.pi, N_AZ, endpoint=False)   # + = RIGHT (ours)
    els = np.linspace(-np.pi / 4, np.pi / 4, N_EL)
    for i, az in enumerate(azs):
        for j, el in enumerate(els):
            y = _sh_ambix_order3(-az, el)         # AmbiX + = left
            left = (y[:, None] * sh).sum(0)
            right = ((y * _MIRROR)[:, None] * sh).sum(0)
            bank[i, j, 0] = left[w0:w0 + TAPS]
            bank[i, j, 1] = right[w0:w0 + TAPS]
    return bank


_BANK = None


def hrir_bank() -> np.ndarray:
    """[N_AZ, N_EL, 2, TAPS] FIR bank (built once; measured SADIE data when
    the asset ships, analytic spherical-head fallback otherwise)."""
    global _BANK
    if _BANK is None:
        if _HAS_MEASURED:
            bank = _measured_bank()
        else:
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
