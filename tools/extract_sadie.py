#!/usr/bin/env python
"""Extract the SADIE Subject_002 spherical-harmonic HRIRs from the
reference's bundled Resonance Audio third-party assets
(resonance-audio/third_party/SADIE_hrtf_database — Apache-2.0; the same
measured dataset the reference's kBinauralHighQuality path decodes with,
dsp/sh_hrir_creator.cc) into a small .npz the audio engine loads at import.

This extracts DATA (measured impulse responses), not code: the byte arrays
in hrtf_assets.cc are verbatim WAV files.  Run once; the output asset is
checked in (substrata_tpu/audio/assets/sadie_sh_hrir.npz, ~25 KB).
"""

import io
import os
import re
import struct
import sys

import numpy as np

SRC = ("/root/reference/resonance-audio/third_party/SADIE_hrtf_database/"
       "generated/hrtf_assets.cc")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "substrata_tpu", "audio", "assets", "sadie_sh_hrir.npz")


def parse_assets(path):
    text = open(path).read()
    out = {}
    # Entries look like: {"WAV/.../sh_hrir_order_3.wav", {0x52, 0x49, ...}},
    for m in re.finditer(r'\{"([^"]+)",\s*\{([^}]*)\}\}', text, re.S):
        name, body = m.group(1), m.group(2)
        data = bytes(int(tok, 16) for tok in re.findall(r'0x[0-9a-fA-F]+', body))
        out[name] = data
    return out


def decode_wav(data):
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid, ln = data[pos:pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            samples = np.frombuffer(body, "<i2")
        pos += 8 + ln + (ln & 1)
    audio_fmt, n_ch, rate, _, _, bits = fmt
    assert audio_fmt == 1 and bits == 16, (audio_fmt, bits)
    x = samples.astype(np.float32) / 32768.0
    return x.reshape(-1, n_ch).T, rate   # [C, T]


def main():
    assets = parse_assets(SRC)
    for k, v in assets.items():
        print(k, len(v), "bytes")
    key = "WAV/Subject_002/SH/sh_hrir_order_3.wav"
    hr, rate = decode_wav(assets[key])
    print("order-3 SH HRIR:", hr.shape, "at", rate, "Hz, peak",
          float(np.abs(hr).max()))
    assert hr.shape[0] == 16, hr.shape
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT, sh_hrir=hr.astype(np.float32), rate=np.int32(rate),
        order=np.int32(3),
        provenance=np.bytes_(
            b"SADIE binaural measurements, Subject_002, spherical-harmonic "
            b"domain (ACN/SN3D); extracted from Resonance Audio "
            b"third_party/SADIE_hrtf_database (Apache-2.0)"))
    print("wrote", OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    sys.exit(main())
