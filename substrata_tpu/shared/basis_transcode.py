"""Basis Universal `.basis` (ETC1S) read path: transcode to RGBA pixels.

The reference's LOD pipeline emits `.basis` ETC1S textures
(shared/LODGeneration.cpp:265-404 generateBasisTexture ->
basisu::basis_compressor) and every client consumes them
(URL scheme WorldMaterial.cpp:44-90).  Our own pipeline EMITS BC1-in-KTX2
(shared/texture_compress.py — a deliberate TPU-side redesign); this module
is the interop READ path so worlds served by a reference server are fully
consumable: parse the `.basis` container, decode the ETC1S codebooks and
slice bitstreams, and return RGBA numpy images per mip level.

Implemented from the public Basis Universal specification (the format of
binomial LLC's basis_universal; ETC1S mode, non-video, no global/hybrid
selector palettes — the configuration the reference encoder uses:
LODGeneration.cpp:359-396 sets quality/threading only).  Verified against
the reference's own shipped fixtures (resources/sprites/*.basis,
resources/foam_windowed.basis): the VLC bitstreams leave no slack — a
mis-specified field desynchronises the Huffman stream and fails the strict
bounds/consumption checks — and decoded mip chains are checked for
cross-mip consistency (mip N box-filtered ≈ mip N+1) in tests.

Layout notes:
- All integers little-endian; bitstreams are LSB-first (Deflate-style).
- Huffman tables are canonical (code lengths only), lengths themselves
  Huffman-coded with zero-run/repeat codes, like Deflate's code-length
  code but with basis' own alphabet (21 symbols, sorted order below).
- ETC1S endpoint = (RGB555 base color, 3-bit ETC1 intensity-table index);
  selector = 4x4 2-bit indices into the signed ETC1 modifier table.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


class BasisDecodeError(ValueError):
    pass


SIG = 0x4273          # 'B' 's' little-endian
TEXFMT_ETC1S = 0

# Header flags.
FLAG_Y_FLIPPED = 2
FLAG_HAS_ALPHA_SLICES = 4
FLAG_USES_GLOBAL_CODEBOOK = 8
FLAG_SRGB = 16

# Slice desc flags.
SLICE_HAS_ALPHA = 1

# Huffman code-length alphabet (basis_spec: 21 codes, Deflate-like).
_SMALL_ZERO_RUN = 17   # 3 extra bits, run 3..10 of zero lengths
_BIG_ZERO_RUN = 18     # 7 extra bits, run 11..138
_SMALL_REPEAT = 19     # 2 extra bits, repeat prev nonzero 3..6
_BIG_REPEAT = 20       # 7 extra bits, repeat prev nonzero 7..134
_SORTED_CODELENGTH_CODES = (
    _SMALL_ZERO_RUN, _BIG_ZERO_RUN, _SMALL_REPEAT, _BIG_REPEAT,
    0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15, 16)
_MAX_SYMS_LOG2 = 14

# Endpoint color5 delta-model selection thresholds.  The delta symbol is a
# raw 5-bit modular delta: v = (prev + sym) & 31; which of the three Huffman
# models codes it depends on the previous value's range ([0,9] / [10,21] /
# [22,31]).  Empirically pinned: exactly ONE (thresholds, init, field-order)
# combination decodes the endpoint sections of all 13 reference-shipped
# .basis files to byte-exact EOF (see tests).
_COLOR5_PAL0_PREV_HI = 9
_COLOR5_PAL1_PREV_HI = 21

# Endpoint-pred model: one symbol carries the 8 pred bits of a 2x2 block
# group (4 blocks x 2 bits); symbol 256 = repeat-last escape followed by a
# VLC-coded extra repeat count.
_ENDPOINT_PRED_REPEAT_LAST = 256
_ENDPOINT_PRED_MIN_REPEAT = 3
_ENDPOINT_PRED_VLC_BITS = 4

# Selector-history RLE.
_SEL_RLE_THRESH = 3
_SEL_RLE_TOTAL = 64    # 6-bit run alphabet; last value = escape

# ETC1 intensity modifier tables (ETC1 spec), indexed [inten][selector].
ETC1_INTEN_TABLES = np.array([
    [-8, -2, 2, 8], [-17, -5, 5, 17], [-29, -9, 9, 29], [-42, -13, 13, 42],
    [-60, -18, 18, 60], [-80, -24, 24, 80], [-106, -33, 33, 106],
    [-183, -47, 47, 183]], np.int32)


class _BitReader:
    """LSB-first bit reader over a bytes buffer."""

    __slots__ = ("data", "n", "pos", "buf", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.buf = 0
        self.bits = 0

    def get_bits(self, num: int) -> int:
        while self.bits < num:
            b = self.data[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.buf |= b << self.bits
            self.bits += 8
        out = self.buf & ((1 << num) - 1)
        self.buf >>= num
        self.bits -= num
        return out

    def get_bit(self) -> int:
        return self.get_bits(1)

    def decode_vlc(self, chunk_bits: int) -> int:
        """Chunked VLC: (chunk_bits+1)-bit groups LSB-first, top bit of each
        group = continuation."""
        chunk_size = 1 << chunk_bits
        v = 0
        ofs = 0
        while True:
            s = self.get_bits(chunk_bits + 1)
            v |= (s & (chunk_size - 1)) << ofs
            ofs += chunk_bits
            if not (s & chunk_size):
                return v
            if ofs > 32:
                raise BasisDecodeError("basis: runaway VLC")


class _Huffman:
    """Canonical Huffman decoder for LSB-first streams (codes assigned
    canonically MSB-first per (length, symbol) order, then bit-reversed)."""

    __slots__ = ("table", "max_len")

    def __init__(self, code_sizes):
        counts = {}
        for s in code_sizes:
            if s:
                counts[s] = counts.get(s, 0) + 1
        self.table = {}
        self.max_len = max(counts) if counts else 0
        if not counts:
            return
        code = 0
        next_code = {}
        for length in range(1, self.max_len + 1):
            code = (code + counts.get(length - 1, 0)) << 1
            next_code[length] = code
        for sym, size in enumerate(code_sizes):
            if not size:
                continue
            c = next_code[size]
            next_code[size] += 1
            rev = 0
            for _ in range(size):
                rev = (rev << 1) | (c & 1)
                c >>= 1
            self.table[(size, rev)] = sym

    def decode(self, br: _BitReader) -> int:
        cur = 0
        for length in range(1, self.max_len + 1):
            cur |= br.get_bit() << (length - 1)
            sym = self.table.get((length, cur))
            if sym is not None:
                return sym
        raise BasisDecodeError("basis: invalid Huffman code in stream")


def _read_huffman_table(br: _BitReader) -> _Huffman | None:
    total_used_syms = br.get_bits(_MAX_SYMS_LOG2)
    if not total_used_syms:
        return None
    num_cl = br.get_bits(5)
    if not 1 <= num_cl <= len(_SORTED_CODELENGTH_CODES):
        raise BasisDecodeError("basis: bad code-length code count")
    cl_sizes = [0] * 21
    for i in range(num_cl):
        cl_sizes[_SORTED_CODELENGTH_CODES[i]] = br.get_bits(3)
    cl_table = _Huffman(cl_sizes)
    sizes = [0] * total_used_syms
    ofs = 0
    while ofs < total_used_syms:
        c = cl_table.decode(br)
        if c <= 16:
            sizes[ofs] = c
            ofs += 1
        elif c == _SMALL_ZERO_RUN:
            ofs += br.get_bits(3) + 3
        elif c == _BIG_ZERO_RUN:
            ofs += br.get_bits(7) + 11
        else:
            if not ofs or not sizes[ofs - 1]:
                raise BasisDecodeError("basis: repeat with no prev code size")
            prev = sizes[ofs - 1]
            n = (br.get_bits(2) + 3 if c == _SMALL_REPEAT
                 else br.get_bits(7) + 7)
            for _ in range(n):
                if ofs >= total_used_syms:
                    raise BasisDecodeError("basis: code-size repeat overrun")
                sizes[ofs] = prev
                ofs += 1
    if ofs != total_used_syms:
        raise BasisDecodeError("basis: code-size run overrun")
    return _Huffman(sizes)


@dataclass
class _SliceDesc:
    image_index: int
    level_index: int
    flags: int
    orig_width: int
    orig_height: int
    num_blocks_x: int
    num_blocks_y: int
    file_ofs: int
    file_size: int


@dataclass
class BasisFile:
    """Parsed .basis container + decoded ETC1S codebooks."""

    width: int
    height: int
    levels: int
    has_alpha: bool
    srgb: bool
    y_flipped: bool
    endpoints: np.ndarray       # [E, 4] u8: r5, g5, b5, inten3
    selectors: np.ndarray       # [S, 4, 4] u8 (2-bit values), [y][x]
    slices: list
    _data: bytes
    _tables: tuple


def _u24(data, o):
    return data[o] | data[o + 1] << 8 | data[o + 2] << 16


def parse_basis(data: bytes) -> BasisFile:
    if len(data) < 77:
        raise BasisDecodeError("basis: truncated header")
    sig, ver, header_size = struct.unpack_from("<HHH", data, 0)
    if sig != SIG:
        raise BasisDecodeError("basis: bad signature")
    if header_size < 77:
        raise BasisDecodeError(f"basis: unexpected header size {header_size}")
    total_slices = _u24(data, 14)
    total_images = _u24(data, 17)
    tex_format = data[20]
    (flags,) = struct.unpack_from("<H", data, 21)
    tex_type = data[23]
    (total_endpoints,) = struct.unpack_from("<H", data, 39)
    (ep_ofs,) = struct.unpack_from("<I", data, 41)
    ep_size = _u24(data, 45)
    (total_selectors,) = struct.unpack_from("<H", data, 48)
    (sel_ofs,) = struct.unpack_from("<I", data, 50)
    sel_size = _u24(data, 54)
    tables_ofs, tables_size, slice_desc_ofs = struct.unpack_from(
        "<III", data, 57)
    if tex_format != TEXFMT_ETC1S:
        raise BasisDecodeError(f"basis: tex_format {tex_format} is not ETC1S")
    if flags & FLAG_USES_GLOBAL_CODEBOOK:
        raise BasisDecodeError("basis: global codebooks not supported")
    if tex_type not in (0, 3):   # 2D / 2D array
        raise BasisDecodeError(f"basis: tex_type {tex_type} not supported")
    if total_images != 1:
        raise BasisDecodeError("basis: multi-image files not supported")

    slices = []
    for i in range(total_slices):
        o = slice_desc_ofs + i * 23
        if o + 23 > len(data):
            raise BasisDecodeError("basis: truncated slice descs")
        slices.append(_SliceDesc(
            image_index=_u24(data, o),
            level_index=data[o + 3],
            flags=data[o + 4],
            orig_width=struct.unpack_from("<H", data, o + 5)[0],
            orig_height=struct.unpack_from("<H", data, o + 7)[0],
            num_blocks_x=struct.unpack_from("<H", data, o + 9)[0],
            num_blocks_y=struct.unpack_from("<H", data, o + 11)[0],
            file_ofs=struct.unpack_from("<I", data, o + 13)[0],
            file_size=struct.unpack_from("<I", data, o + 17)[0]))
        if slices[-1].file_ofs + slices[-1].file_size > len(data):
            raise BasisDecodeError("basis: slice data out of range")

    endpoints = _decode_endpoints(
        data[ep_ofs:ep_ofs + ep_size], total_endpoints)
    selectors = _decode_selectors(
        data[sel_ofs:sel_ofs + sel_size], total_selectors)
    tables = _decode_tables(data[tables_ofs:tables_ofs + tables_size])

    color_slices = [s for s in slices if not (s.flags & SLICE_HAS_ALPHA)]
    if not color_slices:
        raise BasisDecodeError("basis: no color slices")
    return BasisFile(
        width=color_slices[0].orig_width,
        height=color_slices[0].orig_height,
        levels=len(color_slices),
        has_alpha=bool(flags & FLAG_HAS_ALPHA_SLICES),
        srgb=bool(flags & FLAG_SRGB),
        y_flipped=bool(flags & FLAG_Y_FLIPPED),
        endpoints=endpoints, selectors=selectors, slices=slices,
        _data=data, _tables=tables)


def _decode_endpoints(blob: bytes, num: int) -> np.ndarray:
    br = _BitReader(blob)
    model0 = _read_huffman_table(br)
    model1 = _read_huffman_table(br)
    model2 = _read_huffman_table(br)
    inten_model = _read_huffman_table(br)
    grayscale = br.get_bit() != 0
    out = np.zeros((num, 4), np.uint8)
    prev = [16, 16, 16]
    prev_inten = 0
    for i in range(num):
        prev_inten = (inten_model.decode(br) + prev_inten) & 7
        out[i, 3] = prev_inten
        for c in range(1 if grayscale else 3):
            p = prev[c]
            if p <= _COLOR5_PAL0_PREV_HI:
                m = model0
            elif p <= _COLOR5_PAL1_PREV_HI:
                m = model1
            else:
                m = model2
            v = (p + m.decode(br)) & 31
            prev[c] = v
            out[i, c] = v
        if grayscale:
            prev[1] = prev[2] = prev[0]
            out[i, 1] = out[i, 2] = out[i, 0]
    if br.pos != len(blob) or br.bits >= 8:
        raise BasisDecodeError("basis: endpoint section size mismatch")
    return out


def _decode_selectors(blob: bytes, num: int) -> np.ndarray:
    """Selector codebook: 3 mode bits (global / hybrid / raw — all zero in
    every reference-encoder file; the delta path below decodes those files
    to byte-exact EOF), then a byte-delta Huffman model: selector 0's four
    row bytes are raw, each later row byte is (decoded sym XOR same row of
    the previous selector).  Row byte = 4 pixels x 2-bit code, pixel x at
    bits 2x."""
    br = _BitReader(blob)
    mode_bits = (br.get_bit(), br.get_bit(), br.get_bit())
    if any(mode_bits):
        raise BasisDecodeError(
            f"basis: unsupported selector codebook mode bits {mode_bits} "
            "(global/hybrid/raw palettes)")
    out = np.zeros((num, 4, 4), np.uint8)
    model = _read_huffman_table(br)
    prev_bytes = [0, 0, 0, 0]
    for i in range(num):
        for y in range(4):
            if i == 0:
                cur = br.get_bits(8)
            else:
                cur = model.decode(br) ^ prev_bytes[y]
            prev_bytes[y] = cur
            for x in range(4):
                out[i, y, x] = (cur >> (x * 2)) & 3
    if br.pos != len(blob) or br.bits >= 8:
        raise BasisDecodeError("basis: selector section size mismatch")
    return out


def _decode_tables(blob: bytes):
    br = _BitReader(blob)
    endpoint_pred = _read_huffman_table(br)
    delta_endpoint = _read_huffman_table(br)
    selector = _read_huffman_table(br)
    selector_rle = _read_huffman_table(br)
    history_size = br.get_bits(13)
    if endpoint_pred is None or delta_endpoint is None or selector is None:
        raise BasisDecodeError("basis: missing slice model tables")
    return endpoint_pred, delta_endpoint, selector, selector_rle, history_size


class _ApproxMTF:
    """basis' approximate move-to-front list: use() swaps the entry halfway
    toward the front; add() overwrites a rover cycling through the back
    half."""

    def __init__(self, n: int):
        self.values = [0] * n
        self.rover = n // 2

    def add(self, value: int):
        self.values[self.rover] = value
        self.rover += 1
        if self.rover >= len(self.values):
            self.rover = len(self.values) // 2

    def use(self, index: int):
        if index:
            j = index // 2
            self.values[j], self.values[index] = (
                self.values[index], self.values[j])


def _decode_slice(bf: BasisFile, sl: _SliceDesc):
    """Decode one slice's VLC stream into per-block (endpoint_index,
    selector_index) arrays [by, bx]."""
    (endpoint_pred_model, delta_endpoint_model, selector_model,
     selector_rle_model, history_size) = bf._tables
    num_endpoints = len(bf.endpoints)
    num_selectors = len(bf.selectors)
    bx_n, by_n = sl.num_blocks_x, sl.num_blocks_y
    total_blocks = bx_n * by_n
    br = _BitReader(bf._data[sl.file_ofs:sl.file_ofs + sl.file_size])

    sel_history_first_sym = num_selectors
    sel_rle_sym = history_size + sel_history_first_sym
    history = _ApproxMTF(history_size) if history_size else None
    cur_rle_count = 0

    ep_idx = np.zeros((by_n, bx_n), np.int32)
    sel_idx = np.zeros((by_n, bx_n), np.int32)
    # Endpoint preds arrive one 257-ary symbol per 2x2 block GROUP (8 bits =
    # 4 blocks x 2-bit pred), decoded at the group's top-left block; symbol
    # 256 repeats the previous group symbol (VLC-coded extra count).
    n_groups_x = (bx_n + 1) // 2
    group_pred = [0] * n_groups_x
    prev_pred_sym = 0
    pred_repeat_left = 0
    prev_endpoint_index = 0

    for by in range(by_n):
        row_prev = ep_idx[by - 1] if by else None
        for bx in range(bx_n):
            if (bx & 1) == 0 and (by & 1) == 0:
                if pred_repeat_left > 0:
                    pred_repeat_left -= 1
                    sym = prev_pred_sym
                else:
                    sym = endpoint_pred_model.decode(br)
                    if sym == _ENDPOINT_PRED_REPEAT_LAST:
                        pred_repeat_left = (
                            br.decode_vlc(_ENDPOINT_PRED_VLC_BITS)
                            + _ENDPOINT_PRED_MIN_REPEAT - 1)
                        sym = prev_pred_sym
                    else:
                        prev_pred_sym = sym
                group_pred[bx >> 1] = sym
            pred = (group_pred[bx >> 1]
                    >> (2 * ((by & 1) * 2 + (bx & 1)))) & 3

            # Pred meanings pinned empirically (tests decode every slice of
            # all 13 reference fixtures to byte-exact EOF; image-level
            # cross-mip PSNR separates the permutations): 0 = repeat the
            # raster-previous block's index (== left neighbour except at
            # column 0), 1 = block above, 2 = upper-left, 3 = explicit
            # delta vs the previously-used index (mod num_endpoints).
            if pred == 0:
                endpoint_index = prev_endpoint_index
            elif pred == 1:
                if not by:
                    raise BasisDecodeError("basis: above pred at row 0")
                endpoint_index = int(row_prev[bx])
            elif pred == 2:
                if not bx or not by:
                    raise BasisDecodeError("basis: upper-left pred at edge")
                endpoint_index = int(row_prev[bx - 1])
            else:
                delta = delta_endpoint_model.decode(br)
                endpoint_index = delta + prev_endpoint_index
                if endpoint_index >= num_endpoints:
                    endpoint_index -= num_endpoints
            ep_idx[by, bx] = endpoint_index
            prev_endpoint_index = endpoint_index

            # --- Selector ---
            if cur_rle_count > 0:
                cur_rle_count -= 1
                sym = sel_history_first_sym   # history entry 0
            else:
                sym = selector_model.decode(br)
                if sym == sel_rle_sym:
                    run = selector_rle_model.decode(br)
                    if run == _SEL_RLE_TOTAL - 1:
                        # Escape: VLC-coded long run (7-bit chunks).
                        cur_rle_count = br.decode_vlc(7) + _SEL_RLE_THRESH
                    else:
                        cur_rle_count = run + _SEL_RLE_THRESH
                    if cur_rle_count > total_blocks:
                        raise BasisDecodeError("basis: selector RLE overrun")
                    sym = sel_history_first_sym
                    cur_rle_count -= 1
            if sym >= sel_history_first_sym:
                if history is None:
                    raise BasisDecodeError("basis: history ref w/o buffer")
                hist_i = sym - sel_history_first_sym
                if hist_i >= len(history.values):
                    raise BasisDecodeError("basis: history index range")
                selector_index = history.values[hist_i]
                history.use(hist_i)
            else:
                selector_index = sym
                if history is not None:
                    history.add(selector_index)
            if selector_index >= num_selectors:
                raise BasisDecodeError("basis: selector index range")
            sel_idx[by, bx] = selector_index
    if br.pos != sl.file_size or br.bits >= 8:
        raise BasisDecodeError(
            f"basis: slice stream size mismatch ({br.pos} of {sl.file_size})")
    return ep_idx, sel_idx


def _blocks_to_rgba(bf: BasisFile, ep_idx, sel_idx, w, h) -> np.ndarray:
    """ETC1S blocks -> RGB8 image [h, w, 3] (vectorised numpy)."""
    base5 = bf.endpoints[ep_idx, :3].astype(np.int32)           # [by,bx,3]
    base8 = (base5 << 3) | (base5 >> 2)
    inten = bf.endpoints[ep_idx, 3].astype(np.int32)            # [by,bx]
    sels = bf.selectors[sel_idx]                                # [by,bx,4,4]
    mods = ETC1_INTEN_TABLES[inten[..., None, None],
                             sels.astype(np.int32)]             # [by,bx,4,4]
    px = base8[:, :, None, None, :] + mods[..., None]           # +[...,3]
    px = np.clip(px, 0, 255).astype(np.uint8)
    by_n, bx_n = ep_idx.shape
    img = px.transpose(0, 2, 1, 3, 4).reshape(by_n * 4, bx_n * 4, 3)
    return img[:h, :w]


def transcode_basis_to_rgba(data: bytes, level: int = 0) -> np.ndarray:
    """Decode one mip level of a .basis ETC1S file to RGBA8 [h, w, 4].

    Alpha slices (flags bit cSliceDescFlagsHasAlpha) decode as grayscale
    ETC1S and feed the A channel; opaque files get A=255.
    """
    bf = parse_basis(data)
    color = [s for s in bf.slices if not (s.flags & SLICE_HAS_ALPHA)]
    alpha = [s for s in bf.slices if s.flags & SLICE_HAS_ALPHA]
    if not 0 <= level < len(color):
        raise BasisDecodeError(f"basis: level {level} of {len(color)}")
    sl = color[level]
    ep, se = _decode_slice(bf, sl)
    rgb = _blocks_to_rgba(bf, ep, se, sl.orig_width, sl.orig_height)
    out = np.concatenate([rgb, np.full(rgb.shape[:2] + (1,), 255, np.uint8)],
                         axis=2)
    if bf.has_alpha and level < len(alpha):
        asl = alpha[level]
        aep, ase = _decode_slice(bf, asl)
        argb = _blocks_to_rgba(bf, aep, ase, asl.orig_width, asl.orig_height)
        out[:, :, 3] = argb[:, :, 0]
    if bf.y_flipped:
        out = out[::-1]
    return out


def basis_info(data: bytes) -> dict:
    bf = parse_basis(data)
    return {"width": bf.width, "height": bf.height, "levels": bf.levels,
            "has_alpha": bf.has_alpha, "srgb": bf.srgb,
            "endpoints": len(bf.endpoints), "selectors": len(bf.selectors)}
