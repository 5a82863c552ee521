"""`.basis` ETC1S read-path tests against the reference's own shipped
fixtures (resources/sprites/*.basis + resources/foam_windowed.basis — the
output of shared/LODGeneration.cpp generateBasisTexture).

Correctness evidence is structural + quantitative:
- every VLC section (endpoint codebook, selector codebook, model tables,
  every slice) must decode to byte-exact EOF — the streams leave no slack,
  so a mis-specified field desynchronises the Huffman decode and fails;
- decoded mip chains must be self-consistent: mip N box-filtered matches
  mip N+1 within ETC1S re-encode tolerance (alpha-weighted PSNR, since
  encoders put arbitrary RGB under fully-transparent texels).
"""

import glob
import os

import numpy as np
import pytest

from substrata_tpu.shared.basis_transcode import (
    BasisDecodeError, _decode_slice, basis_info, parse_basis,
    transcode_basis_to_rgba,
)

FIXTURES = sorted(glob.glob("/root/reference/resources/**/*.basis",
                            recursive=True))

pytestmark = pytest.mark.skipif(not FIXTURES,
                                reason="reference .basis fixtures not present")


def test_all_reference_fixtures_decode_exactly():
    """Every slice of every reference-generated .basis decodes with strict
    byte-exact stream consumption (codebooks assert EOF internally)."""
    n_slices = 0
    for f in FIXTURES:
        bf = parse_basis(open(f, "rb").read())
        for sl in bf.slices:
            ep, se = _decode_slice(bf, sl)
            assert ep.shape == (sl.num_blocks_y, sl.num_blocks_x)
            assert int(ep.max()) < len(bf.endpoints)
            assert int(se.max()) < len(bf.selectors)
            n_slices += 1
    assert n_slices >= 200   # 13 files x ~20 slices


def test_basis_info_fields():
    info = basis_info(open(FIXTURES[0], "rb").read())
    assert info["width"] >= 4 and info["height"] >= 4
    assert info["levels"] >= 1
    assert info["endpoints"] > 0 and info["selectors"] > 0


@pytest.mark.parametrize("name", ["sprites/smoke_sprite_front.basis",
                                  "foam_windowed.basis"])
def test_cross_mip_psnr(name):
    """Mip level 1 must match a box-downsampled level 0 within lossy-codec
    tolerance — garbage decoding (wrong codebooks, desynced slice VLC)
    produces ~8-12 dB; a correct decode lands 30+ dB."""
    path = os.path.join("/root/reference/resources", name)
    data = open(path, "rb").read()
    i0 = transcode_basis_to_rgba(data, 0).astype(np.float32)
    i1 = transcode_basis_to_rgba(data, 1).astype(np.float32)
    a = i0[: (i0.shape[0] // 2) * 2, : (i0.shape[1] // 2) * 2]
    ds = (a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2] + a[1::2, 1::2]) / 4
    b = i1[: ds.shape[0], : ds.shape[1]]
    w = (ds[:, :, 3:4] / 255) * (b[:, :, 3:4] / 255)
    mse_rgb = float((((ds[:, :, :3] - b[:, :, :3]) ** 2) * w).sum()
                    / np.maximum(w.sum() * 3, 1))
    psnr_rgb = 10 * np.log10(255 ** 2 / max(mse_rgb, 1e-9))
    mse_a = float(((ds[:, :, 3] - b[:, :, 3]) ** 2).mean())
    psnr_a = 10 * np.log10(255 ** 2 / max(mse_a, 1e-9))
    assert psnr_rgb > 30.0, psnr_rgb
    assert psnr_a > 25.0, psnr_a


def test_transcode_shapes_and_alpha():
    data = open(os.path.join("/root/reference/resources",
                             "sprites/foam_sprite_top.basis"), "rb").read()
    img = transcode_basis_to_rgba(data, 0)
    assert img.shape == (512, 512, 4) and img.dtype == np.uint8
    # Alpha slice is real data, not constant fill.
    assert 0 < img[:, :, 3].mean() < 255


def test_decode_texture_dispatch():
    from substrata_tpu.shared.texture_compress import (
        decode_texture, generate_compressed_texture)
    data = open(FIXTURES[0], "rb").read()
    img = decode_texture("foo.basis", data, level=2)
    assert img.ndim == 3 and img.shape[2] == 4
    # ktx2 branch round-trips our own pipeline output (smooth gradient —
    # BC1 on white noise is legitimately ~13 dB and proves nothing).
    y, x = np.mgrid[0:32, 0:32]
    src = np.stack([x * 8, y * 8, (x + y) * 4], axis=2).astype(np.uint8)
    ktx = generate_compressed_texture(src, lod_level=0)
    out = decode_texture("foo.ktx2", ktx)
    assert out.shape == (32, 32, 4)
    mse = float(((out[:, :, :3].astype(np.float32) - src) ** 2).mean())
    assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 25.0


def test_rejects_garbage():
    with pytest.raises(BasisDecodeError):
        parse_basis(b"not a basis file at all")
    good = open(FIXTURES[0], "rb").read()
    with pytest.raises(BasisDecodeError):
        parse_basis(good[:200])   # truncated mid-codebook
