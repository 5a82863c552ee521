"""BC1 encode + KTX2 container (shared/texture_compress.py) — the
compressed-texture half of the LOD pipeline (LODGeneration.cpp:265-404
generateBasisTexture parity, with BC1/KTX2 standing in for ETC1S/basis)."""

import numpy as np
import pytest

from substrata_tpu.shared.texture_compress import (
    VK_FORMAT_BC1_RGB_SRGB, VK_FORMAT_BC1_RGB_UNORM, bc1_compress,
    decode_bc1, generate_compressed_texture, lod_texture_url, mip_chain,
    read_ktx2, write_ktx2)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_bc1_flat_block_exact():
    img = np.full((4, 4, 3), 87, np.uint8)
    out = decode_bc1(bc1_compress(img), 4, 4)
    # 87 is representable in 565 within rounding of the bit-replicated
    # palette; a flat block must come back within quantisation error.
    assert np.abs(out.astype(int) - 87).max() <= 4


def test_bc1_two_colour_block():
    img = np.zeros((4, 4, 3), np.uint8)
    img[:, 2:] = 255
    out = decode_bc1(bc1_compress(img), 4, 4)
    assert np.abs(out[:, :2].astype(int)).max() <= 8
    assert np.abs(out[:, 2:].astype(int) - 255).max() <= 8


def test_bc1_gradient_quality():
    x = np.linspace(0, 255, 64)
    img = np.stack(np.broadcast_arrays(
        x[None, :], x[:, None], 128.0 * np.ones((64, 64))), axis=-1)
    img = img.astype(np.uint8)
    out = decode_bc1(bc1_compress(img), 64, 64)
    assert psnr(img, out) > 32.0


def test_bc1_photo_like_quality():
    rng = np.random.default_rng(0)
    # Smooth random field (photo-like): random lowres upsampled.
    low = rng.uniform(0, 255, (9, 9, 3))
    img = np.kron(low, np.ones((8, 8, 1)))[:64, :64]
    img = (img + rng.normal(0, 6, img.shape)).clip(0, 255).astype(np.uint8)
    out = decode_bc1(bc1_compress(img), 64, 64)
    assert psnr(img, out) > 28.0


def test_bc1_nonmultiple_of_4_dims():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (10, 7, 3), np.uint8)
    data = bc1_compress(img)
    assert len(data) == ((10 + 3) // 4) * ((7 + 3) // 4) * 8
    out = decode_bc1(data, 7, 10)
    assert out.shape == (10, 7, 3)


def test_mip_chain_dims():
    img = np.zeros((64, 16, 3), np.uint8)
    mips = mip_chain(img)
    assert [(w, h) for _, w, h in mips] == [
        (16, 64), (8, 32), (4, 16), (2, 8), (1, 4), (1, 2), (1, 1)]


@pytest.mark.parametrize("supercompress", [False, True])
def test_ktx2_roundtrip(supercompress):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    mips = mip_chain(img)
    blocks = [bc1_compress(m) for m, _, _ in mips]
    data = write_ktx2(blocks, 32, 32, srgb=False,
                      supercompress=supercompress)
    meta, levels = read_ktx2(data)
    assert meta["vk_format"] == VK_FORMAT_BC1_RGB_UNORM
    assert meta["width"] == 32 and meta["height"] == 32
    assert meta["levels"] == len(mips) == 6
    assert levels == blocks          # bit-exact payload round-trip
    if not supercompress:
        # Level byte offsets must be 8-aligned, smallest level stored first.
        import struct
        offs = [struct.unpack_from("<QQQ", data, 80 + i * 24)[0]
                for i in range(meta["levels"])]
        assert all(o % 8 == 0 for o in offs)
        assert offs == sorted(offs, reverse=True)


def test_generate_compressed_texture_lod_sizing():
    """The reference's per-level long-edge clamps (LODGeneration.cpp:270):
    lod0 -> 1024, lod1 -> 256, lod2 -> 64, base level -> 4096."""
    img = np.zeros((256, 512, 3), np.uint8)
    img[:, :, 0] = np.linspace(0, 255, 512)[None, :]
    meta, levels = read_ktx2(generate_compressed_texture(img, lod_level=2))
    assert meta["width"] == 64 and meta["height"] == 32
    assert meta["vk_format"] == VK_FORMAT_BC1_RGB_SRGB
    assert meta["levels"] == 7        # 64x32 ... 1x1
    # Level 0 decodes back to a recognisable gradient.
    out = decode_bc1(levels[0], 64, 32)
    assert psnr(np.linspace(0, 255, 64)[None, :, None]
                * np.array([1.0, 0, 0]) * np.ones((32, 64, 3)),
                out) > 25.0
    # lod1 sizing
    meta1, _ = read_ktx2(generate_compressed_texture(img, lod_level=1))
    assert meta1["width"] == 256 and meta1["height"] == 128
    # base level: unchanged (already < 4096), dims already multiple of 4
    metab, _ = read_ktx2(generate_compressed_texture(img))
    assert metab["width"] == 512 and metab["height"] == 256


def test_lod_texture_url_scheme():
    assert lod_texture_url("tex_abc.png", 0) == "tex_abc.ktx2"
    assert lod_texture_url("tex_abc.png", 1) == "tex_abc_lod1.ktx2"
    assert lod_texture_url("noext", 2) == "noext_lod2.ktx2"
