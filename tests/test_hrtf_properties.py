"""Psychoacoustic property checks for the HRIR bank (audio/hrtf.py) —
the MEASURED SADIE Subject_002 bank when the extracted asset is present,
the analytic spherical-head fallback otherwise — against EXTERNAL
analytic references.

References used:
- Woodworth & Schlosberg's spherical-head ITD model,
  ITD(az) = (a/c)(sin az + az) for |az| <= 90 deg — the standard
  closed-form fit to measured interaural delays.  Kuhn (1977) shows
  MEASURED low-frequency ITD exceeds the Woodworth (high-frequency)
  value by up to ~50% (3(a/c)sin az vs 2(a/c)sin az asymptotics), so
  the measured-bank comparison uses a matching tolerance band.
- ILD lateralisation: the ear nearer the source receives MORE energy,
  monotonically in |az| up to the shadow maximum near +-90 deg.
- Duplex symmetry: mirrored azimuths swap ears exactly (SADIE's SH bank
  is decoded through Resonance's symmetric fold; the head model is
  symmetric by construction).
"""

import numpy as np
import pytest

from substrata_tpu.audio.hrtf import (HEAD_RADIUS, N_AZ, N_EL, RATE,
                                      SPEED_OF_SOUND, TAPS, hrir_bank)

EL0 = N_EL // 2   # horizontal plane


def _itd_samples(left: np.ndarray, right: np.ndarray) -> float:
    """Interaural delay via LOW-PASSED cross-correlation peak with
    parabolic sub-sample refinement (positive = right ear leads).

    ITD is a low-frequency cue: raw broadband xcorr locks onto pinna
    colouration of measured responses (at 90 deg it reports ~26 us
    against a true ~700 us delay); low-passing below ~1.5 kHz before
    correlating is the standard estimator fix."""
    n = len(left)
    nfft = 4 * n
    freq = np.fft.rfftfreq(nfft, 1.0 / RATE)
    keep = (freq < 1500.0).astype(float)
    left = np.fft.irfft(np.fft.rfft(left, nfft) * keep)[:n]
    right = np.fft.irfft(np.fft.rfft(right, nfft) * keep)[:n]
    corr = np.correlate(left, right, mode="full")   # lag of RIGHT vs LEFT
    lags = np.arange(-n + 1, n)
    k = int(np.argmax(corr))
    # Parabolic interpolation around the peak.
    if 0 < k < len(corr) - 1:
        y0, y1, y2 = corr[k - 1], corr[k], corr[k + 1]
        denom = y0 - 2 * y1 + y2
        frac = 0.5 * (y0 - y2) / denom if abs(denom) > 1e-12 else 0.0
    else:
        frac = 0.0
    return float(lags[k] + frac)


def test_itd_matches_woodworth():
    """Bank ITD tracks the Woodworth model.  Tolerance: measured
    low-frequency ITD runs up to ~50% above the Woodworth high-frequency
    fit (Kuhn 1977), and the bank quantises azimuth to 22.5 deg — so
    accept within 40% relative (60 us absolute floor near the median
    plane)."""
    bank = hrir_bank()
    azs = np.linspace(0, 2 * np.pi, N_AZ, endpoint=False)
    a_over_c = HEAD_RADIUS / SPEED_OF_SOUND
    for i, az in enumerate(azs):
        rel = (az + np.pi) % (2 * np.pi) - np.pi   # [-pi, pi), + = right
        if abs(rel) > np.pi / 2:                   # rear cone: model folds
            continue
        expect_s = a_over_c * (np.sin(abs(rel)) + abs(rel))
        got = _itd_samples(bank[i, EL0, 0], bank[i, EL0, 1])
        got_s = abs(got) / RATE
        # Source on the right (+rel): LEFT ear is delayed.
        if abs(rel) > 0.3:
            assert (got > 0) == (rel > 0), (np.degrees(rel), got)
        assert abs(got_s - expect_s) < max(0.4 * expect_s, 6e-5), (
            f"az={np.degrees(rel):.0f}deg: ITD {got_s*1e6:.0f}us vs "
            f"Woodworth {expect_s*1e6:.0f}us")


def test_max_itd_is_physiological():
    """Lateral sources: |ITD| in the 600-800 us band measured for
    human-sized heads (Woodworth at 90 deg with a=8.75 cm: ~655 us)."""
    bank = hrir_bank()
    azs = np.linspace(0, 2 * np.pi, N_AZ, endpoint=False)
    itds = [abs(_itd_samples(bank[i, EL0, 0], bank[i, EL0, 1])) / RATE
            for i in range(N_AZ)]
    assert 5e-4 < max(itds) < 9e-4, max(itds)


def test_ild_sign_and_monotonicity():
    """Near ear louder; ILD grows with lateralisation over the front
    quadrant."""
    bank = hrir_bank()
    azs = np.linspace(0, 2 * np.pi, N_AZ, endpoint=False)

    def ild_db(i):
        e_l = np.sum(bank[i, EL0, 0] ** 2)
        e_r = np.sum(bank[i, EL0, 1] ** 2)
        return 10 * np.log10(e_r / e_l)

    # Right-hemisphere sources: right ear louder (and vice versa).
    for i, az in enumerate(azs):
        rel = (az + np.pi) % (2 * np.pi) - np.pi
        if 0.3 < abs(rel) < np.pi - 0.3:
            assert (ild_db(i) > 0) == (rel > 0), (np.degrees(rel), ild_db(i))
    # Growth from front to side over the quantised front-right arc.
    # Measured HRTFs are NOT strictly monotone here: diffraction focuses
    # energy at the contralateral ear near 90 deg (the acoustic "bright
    # spot"), dipping ILD a couple of dB off its ~70 deg peak — so allow
    # each step to fall up to 3 dB below the running maximum instead of
    # demanding monotonicity (which only the analytic model satisfies).
    front_right = [i for i, az in enumerate(azs) if 0 <= az <= np.pi / 2]
    ilds = [ild_db(i) for i in front_right]
    run_max = -np.inf
    for v in ilds:
        assert v >= run_max - 3.0, ilds
        run_max = max(run_max, v)
    assert ilds[-1] > 2.0, f"side ILD too weak: {ilds[-1]:.2f} dB"


def test_left_right_mirror_symmetry():
    """az and -az swap ears exactly (spherical head has no asymmetry)."""
    bank = hrir_bank()
    for i in range(1, N_AZ // 2):
        j = N_AZ - i
        np.testing.assert_allclose(bank[i, EL0, 0], bank[j, EL0, 1],
                                   atol=1e-6)
        np.testing.assert_allclose(bank[i, EL0, 1], bank[j, EL0, 0],
                                   atol=1e-6)


def test_front_back_spectral_difference_and_energy():
    """The bank is energy-normalised and every direction keeps usable
    energy (no dead direction), with causal FIRs (no pre-ringing before
    the direct path)."""
    bank = hrir_bank()
    energies = (bank ** 2).sum(axis=-1)
    # The quietest direction is the fully-shadowed far ear — low but alive
    # (a true dead zero would mean a broken FIR row, not head shadow).
    assert energies.min() > 0.01
    rms = np.sqrt((bank ** 2).sum(axis=-1).mean())
    assert abs(rms - 0.7071) < 0.02
    assert bank.shape == (N_AZ, N_EL, 2, TAPS)
    assert np.isfinite(bank).all()
