"""Baseline JPEG codec — pure stdlib, grayscale + color 4:4:4.

Closes the image-codec gap in the multimodal seam (PGM/PPM/PNG/WAV are
real since rounds 3-4; JPEG was an honest ``CodecUnavailable`` stub, then
grayscale-real in round 4, color 4:4:4 in round 5).  Scope: 8-bit
baseline DCT JPEG (SOF0), one component (grayscale) or three components
YCbCr with NO subsampling (all sampling factors 1×1), standard
interchange tables (ITU-T T.81 Annex K quantization and Huffman tables).
Subsampled (4:2:0 etc.) and progressive streams still raise
``CodecUnavailable`` honestly — they need an upsampling contract this
exact-integer scope doesn't define.

Determinism: the whole transform path is EXACT integer arithmetic on
Python big ints — the cosine basis is a hardcoded integer table
(scale 2¹¹; the 8 distinct cos(kπ/16) values as literals, so no libm call
anywhere), forward/inverse DCT accumulate exact products with one defined
round-half-away division at the end, quantization uses the same division,
and the RGB↔YCbCr converts are fixed-point 2¹⁶ integer dot products with
the same rounding rule.  Same bytes in → same bytes out on every
platform, which is what lets round-trips be unit-tested bit-for-bit and
flat-image round-trips be value-exact (a flat block is DC-only and the DC
path round-trips losslessly for step-16 quantization).

Malformed-input contract (matches the other codecs in
``operators/multimodal.py``): every parse failure — truncated segment,
short DQT/DHT/SOF body, bad marker alignment — surfaces as
``CodecUnavailable``, never a bare ``struct.error``/``IndexError``.
Standalone markers (TEM 0x01, RSTn 0xD0-0xD7) and 0xFF fill bytes are
handled per T.81 B.1.1.2, and DQT/DHT bodies may carry multiple
concatenated tables.

References: ITU-T T.81 (JPEG), public domain; no third-party code.
"""

from __future__ import annotations

import struct

# cos(kπ/16) · 2¹¹, k = 0..7 — hardcoded so no platform libm is involved
_A = 2048
_COS = [2048, 2009, 1892, 1703, 1448, 1138, 784, 400]
# C(0) = 1/√2 scaled; C(u>0) = 1 scaled
_CU = [1448] + [_A] * 7
_IDCT_DEN = 4 * _A**4

# standard luminance quantization table (T.81 Annex K.1), row-major
STD_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# standard chrominance quantization table (T.81 Annex K.2), row-major
STD_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# standard Huffman tables (T.81 Annex K.3): (bits[1..16], values)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# chrominance Huffman tables (T.81 Annex K.3, Tables K.4/K.6)
DC_BITS_CHROMA = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_CHROMA = list(range(12))
AC_BITS_CHROMA = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_CHROMA = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _cos_entry(u: int, x: int) -> int:
    """cos((2x+1)uπ/16) · 2¹¹ from the literal table — integer index
    arithmetic only (period 32, even symmetry, sign flip past π/2)."""
    a = ((2 * x + 1) * u) % 32
    if a > 16:
        a = 32 - a
    if a == 8:
        return 0
    return _COS[a] if a < 8 else -_COS[16 - a]


_CT = [[_cos_entry(u, x) for x in range(8)] for u in range(8)]


def _rdiv(n: int, d: int) -> int:
    """Round-half-away-from-zero integer division (d > 0) — the one
    rounding rule used everywhere in the transform path."""
    if n >= 0:
        return (n + d // 2) // d
    return -((-n + d // 2) // d)


def _fdct_quant(block: list, quant: list) -> list:
    """Level-shifted 8×8 spatial block → quantized coefficients
    (row-major), exact big-int DCT-II then per-coefficient rounding."""
    # tmp[u][y] = Σ_x s[x][y]·CT[u][x]
    tmp = [[0] * 8 for _ in range(8)]
    for u in range(8):
        ctu = _CT[u]
        for y in range(8):
            acc = 0
            for x in range(8):
                acc += block[x * 8 + y] * ctu[x]
            tmp[u][y] = acc
    out = [0] * 64
    for u in range(8):
        cu = _CU[u]
        for v in range(8):
            ctv = _CT[v]
            acc = 0
            for y in range(8):
                acc += tmp[u][y] * ctv[y]
            s = _rdiv(cu * _CU[v] * acc, _IDCT_DEN)
            out[u * 8 + v] = _rdiv(s, quant[u * 8 + v])
    return out


def _build_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman code assignment (T.81 Annex C): symbol →
    (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(DC_BITS, DC_VALS)
_AC_CODES = _build_codes(AC_BITS, AC_VALS)
_DC_CODES_CHROMA = _build_codes(DC_BITS_CHROMA, DC_VALS_CHROMA)
_AC_CODES_CHROMA = _build_codes(AC_BITS_CHROMA, AC_VALS_CHROMA)

# RGB → YCbCr fixed-point 2¹⁶ coefficients (JFIF / BT.601 full-range);
# luma row sums to exactly 65536 so a flat gray image stays flat
_YR, _YG, _YB = 19595, 38470, 7471
_CBR, _CBG, _CBB = -11059, -21709, 32768
_CRR, _CRG, _CRB = 32768, -27439, -5329
# inverse (YCbCr → RGB), same scale
_RCR = 91881       # 1.402
_GCB, _GCR = 22554, 46802  # 0.344136, 0.714136
_BCB = 116130      # 1.772


def _clamp8(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _category(v: int) -> tuple:
    """JPEG magnitude category: (size, appended bits)."""
    if v == 0:
        return 0, 0
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(w: "_BitWriter", zz: list, prev_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one zigzagged quantized block; returns its DC for
    the caller's per-component predictor."""
    diff = zz[0] - prev_dc
    s, bits = _category(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(bits, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s, bits = _category(zz[i])
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _block_from_plane(plane: bytes, width: int, height: int,
                      bx: int, by: int) -> list:
    """Edge-replicated, level-shifted 8×8 block from a single-channel
    plane (row-major bytes)."""
    block = [0] * 64
    for x in range(8):  # x = row within block
        sy = min(by * 8 + x, height - 1)
        for y in range(8):
            sx = min(bx * 8 + y, width - 1)
            block[x * 8 + y] = plane[sy * width + sx] - 128
    return block


def encode_jpeg(width: int, height: int, pixels: bytes) -> bytes:
    """Baseline grayscale JPEG encoder.  Edge-replicates to 8×8 block
    alignment; standard tables; interchange format (JFIF APP0)."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    bw, bh = (width + 7) // 8, (height + 7) // 8

    w = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            q = _fdct_quant(
                _block_from_plane(pixels, width, height, bx, by), STD_QUANT
            )
            zz = [q[ZIGZAG[i]] for i in range(64)]
            prev_dc = _encode_block(w, zz, prev_dc, _DC_CODES, _AC_CODES)
    entropy = w.flush()

    zz_quant = bytes(STD_QUANT[ZIGZAG[i]] for i in range(64))
    out = b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + zz_quant)
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


def encode_jpeg_color(width: int, height: int, pixels: bytes) -> bytes:
    """Baseline color JPEG encoder: YCbCr 4:4:4 (no subsampling), SOF0,
    standard Annex K luminance/chrominance quantization and Huffman
    tables.  ``pixels`` is interleaved RGB (3·width·height bytes).

    Color convert is fixed-point 2¹⁶ integer arithmetic with the codec's
    one rounding rule — fully deterministic, no float anywhere.  Each MCU
    is one Y block + one Cb block + one Cr block (sampling 1×1 each),
    with per-component DC predictors, exactly T.81's interleaved order
    for this frame shape."""
    if len(pixels) != 3 * width * height:
        raise ValueError(f"need {3 * width * height} bytes, got {len(pixels)}")
    n = width * height
    yp, cbp, crp = bytearray(n), bytearray(n), bytearray(n)
    for i in range(n):
        r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        yp[i] = _clamp8(_rdiv(_YR * r + _YG * g + _YB * b, 65536))
        cbp[i] = _clamp8(128 + _rdiv(_CBR * r + _CBG * g + _CBB * b, 65536))
        crp[i] = _clamp8(128 + _rdiv(_CRR * r + _CRG * g + _CRB * b, 65536))

    bw, bh = (width + 7) // 8, (height + 7) // 8
    w = _BitWriter()
    prev_dc = [0, 0, 0]
    planes = (bytes(yp), bytes(cbp), bytes(crp))
    quants = (STD_QUANT, STD_QUANT_CHROMA, STD_QUANT_CHROMA)
    dc_codes = (_DC_CODES, _DC_CODES_CHROMA, _DC_CODES_CHROMA)
    ac_codes = (_AC_CODES, _AC_CODES_CHROMA, _AC_CODES_CHROMA)
    for by in range(bh):
        for bx in range(bw):
            for c in range(3):
                q = _fdct_quant(
                    _block_from_plane(planes[c], width, height, bx, by),
                    quants[c],
                )
                zz = [q[ZIGZAG[i]] for i in range(64)]
                prev_dc[c] = _encode_block(
                    w, zz, prev_dc[c], dc_codes[c], ac_codes[c]
                )
    entropy = w.flush()

    zz_luma = bytes(STD_QUANT[ZIGZAG[i]] for i in range(64))
    zz_chroma = bytes(STD_QUANT_CHROMA[ZIGZAG[i]] for i in range(64))
    out = b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + zz_luma + b"\x01" + zz_chroma)
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x11\x00"  # Y: sampling 1x1, quant 0
        + b"\x02\x11\x01"  # Cb: sampling 1x1, quant 1
        + b"\x03\x11\x01",  # Cr: sampling 1x1, quant 1
    )
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_CHROMA) + bytes(DC_VALS_CHROMA))
    out += _seg(0xFFC4, b"\x11" + bytes(AC_BITS_CHROMA) + bytes(AC_VALS_CHROMA))
    out += _seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        from .multimodal import CodecUnavailable

        if self.pos >= len(self.data):
            raise CodecUnavailable("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # destuff
            else:
                # RSTn or a stray marker: restart intervals (DRI) are not
                # in scope — refuse honestly rather than misparse
                raise CodecUnavailable(
                    "marker inside entropy stream (restart intervals "
                    "unsupported)"
                )
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _decode_table(codes: dict) -> dict:
    return {(ln, code): sym for sym, (code, ln) in codes.items()}


def _read_huffman(r: "_BitReader", table: dict) -> int:
    from .multimodal import CodecUnavailable

    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise CodecUnavailable("invalid JPEG Huffman code")


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _decode_block(r: "_BitReader", dc_tab: dict, ac_tab: dict,
                  prev_dc: int) -> tuple:
    """Entropy-decode one block: returns (row-major coefficients, new DC
    predictor value)."""
    from .multimodal import CodecUnavailable

    zz = [0] * 64
    s = _read_huffman(r, dc_tab)
    diff = _extend(r.bits(s), s) if s else 0
    dc = prev_dc + diff
    zz[0] = dc
    i = 1
    while i < 64:
        rs = _read_huffman(r, ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            i += 16
            continue
        i += rs >> 4
        if i > 63:
            raise CodecUnavailable("AC index overflow")
        sz = rs & 0x0F
        zz[i] = _extend(r.bits(sz), sz)
        i += 1
    coeffs = [0] * 64
    for i in range(64):
        coeffs[ZIGZAG[i]] = zz[i]
    return coeffs, dc


def _parse_segments(payload: bytes) -> dict:
    """Marker-scan a baseline JPEG up to SOS.  Returns the parsed header
    state; every malformation raises ``CodecUnavailable`` (the module's
    error contract).  Handles 0xFF fill bytes, standalone markers (TEM,
    RSTn), and multi-table DQT/DHT bodies per T.81 B.1.1.2 / B.2.4."""
    from .multimodal import CodecUnavailable

    quant_tabs: dict = {}
    huff: dict = {}
    comps = None
    width = height = None
    sos = None
    entropy_start = None
    pos = 2
    try:
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                raise CodecUnavailable("bad JPEG marker alignment")
            # any number of 0xFF fill bytes may precede the marker code
            while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
                pos += 1
            if pos + 2 > len(payload):
                raise CodecUnavailable("truncated JPEG marker")
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                # TEM / RSTn: standalone, no length field
                pos += 2
                continue
            if pos + 4 > len(payload):
                raise CodecUnavailable("truncated JPEG segment header")
            (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            if ln < 2 or pos + 2 + ln > len(payload):
                raise CodecUnavailable("truncated JPEG segment body")
            body = payload[pos + 4 : pos + 2 + ln]
            pos += 2 + ln
            if marker == 0xDB:  # DQT: one or more concatenated tables
                i = 0
                while i < len(body):
                    pq_tq = body[i]
                    if pq_tq >> 4 != 0:
                        raise CodecUnavailable(
                            "16-bit quantization tables unsupported"
                        )
                    if i + 65 > len(body):
                        raise CodecUnavailable("short DQT body")
                    zz = list(body[i + 1 : i + 65])
                    tab = [0] * 64
                    for j in range(64):
                        tab[ZIGZAG[j]] = zz[j]
                    quant_tabs[pq_tq & 0x0F] = tab
                    i += 65
            elif marker == 0xC0:  # SOF0 baseline
                if len(body) < 6:
                    raise CodecUnavailable("short SOF0 body")
                prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or nc not in (1, 3):
                    raise CodecUnavailable(
                        "JPEG decode implemented for 8-bit baseline, "
                        "1 (grayscale) or 3 (YCbCr 4:4:4) components"
                    )
                if len(body) < 6 + 3 * nc:
                    raise CodecUnavailable("short SOF0 component list")
                comps = []
                for ci in range(nc):
                    cid = body[6 + 3 * ci]
                    samp = body[7 + 3 * ci]
                    tq = body[8 + 3 * ci]
                    if samp != 0x11:
                        raise CodecUnavailable(
                            "subsampled JPEG not supported (4:4:4 only)"
                        )
                    comps.append((cid, tq))
                height, width = h, w_
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                raise CodecUnavailable("non-baseline JPEG not supported")
            elif marker == 0xC4:  # DHT: one or more concatenated tables
                i = 0
                while i < len(body):
                    if i + 17 > len(body):
                        raise CodecUnavailable("short DHT body")
                    tc_th = body[i]
                    bits = list(body[i + 1 : i + 17])
                    nvals = sum(bits)
                    if i + 17 + nvals > len(body):
                        raise CodecUnavailable("short DHT values")
                    vals = list(body[i + 17 : i + 17 + nvals])
                    huff[(tc_th >> 4, tc_th & 0x0F)] = _decode_table(
                        _build_codes(bits, vals)
                    )
                    i += 17 + nvals
            elif marker == 0xDA:  # SOS
                if len(body) < 1:
                    raise CodecUnavailable("short SOS body")
                ns = body[0]
                if len(body) < 1 + 2 * ns:
                    raise CodecUnavailable("short SOS component list")
                sos = {}
                for ci in range(ns):
                    cid = body[1 + 2 * ci]
                    tds = body[2 + 2 * ci]
                    sos[cid] = (tds >> 4, tds & 0x0F)
                entropy_start = pos
                break
            # APP0/COM/DRI-absent/etc: skipped
    except (struct.error, IndexError) as exc:
        raise CodecUnavailable(f"malformed JPEG segment: {exc}") from exc
    if comps is None or sos is None or entropy_start is None:
        raise CodecUnavailable("JPEG missing required segments")
    return {
        "quant_tabs": quant_tabs,
        "huff": huff,
        "comps": comps,
        "width": width,
        "height": height,
        "sos": sos,
        "entropy_start": entropy_start,
    }


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JPEG decoder for the scope the module's encoders emit
    (and other 8-bit baseline SOF0 streams that are either
    single-component or 3-component 4:4:4).  Returns the PGM/PPM-shaped
    dict ``{"width","height","maxval","n_channels","pixel_sum"}``;
    ``pixel_sum`` is the exact integer sum over the true image (padding
    excluded) — grayscale sums the gray samples, color sums all three
    RGB samples per pixel (fixed-point 2¹⁶ integer YCbCr→RGB, clamped)."""
    from .multimodal import CodecUnavailable

    if payload[:2] != b"\xff\xd8":
        raise CodecUnavailable("not a JPEG SOI")
    hdr = _parse_segments(payload)
    width, height = hdr["width"], hdr["height"]
    comps = hdr["comps"]
    tables = []
    for cid, tq in comps:
        if tq not in hdr["quant_tabs"]:
            raise CodecUnavailable(f"missing quant table {tq}")
        if cid not in hdr["sos"]:
            raise CodecUnavailable(f"component {cid} absent from SOS")
        td, ta = hdr["sos"][cid]
        if (0, td) not in hdr["huff"] or (1, ta) not in hdr["huff"]:
            raise CodecUnavailable("missing Huffman table for component")
        tables.append(
            (hdr["quant_tabs"][tq], hdr["huff"][(0, td)], hdr["huff"][(1, ta)])
        )
    end = payload.rfind(b"\xff\xd9")
    r = _BitReader(
        payload[hdr["entropy_start"] : end if end > 0 else len(payload)]
    )

    bw, bh = (width + 7) // 8, (height + 7) // 8
    nc = len(comps)
    total = 0
    prev_dc = [0] * nc
    for by in range(bh):
        for bx in range(bw):
            mcu = []
            for c in range(nc):
                quant, dc_tab, ac_tab = tables[c]
                coeffs, prev_dc[c] = _decode_block(
                    r, dc_tab, ac_tab, prev_dc[c]
                )
                mcu.append(_dequant_idct_with(coeffs, quant))
            if nc == 1:
                px = mcu[0]
                for x in range(8):
                    sy = by * 8 + x
                    if sy >= height:
                        break
                    for y in range(8):
                        if bx * 8 + y < width:
                            total += px[x * 8 + y]
            else:
                yb, cbb, crb = mcu
                for x in range(8):
                    sy = by * 8 + x
                    if sy >= height:
                        break
                    for y in range(8):
                        if bx * 8 + y >= width:
                            continue
                        i = x * 8 + y
                        yv, cb, cr = yb[i], cbb[i] - 128, crb[i] - 128
                        total += _clamp8(yv + _rdiv(_RCR * cr, 65536))
                        total += _clamp8(
                            yv - _rdiv(_GCB * cb + _GCR * cr, 65536)
                        )
                        total += _clamp8(yv + _rdiv(_BCB * cb, 65536))
    return {
        "width": width,
        "height": height,
        "maxval": 255,
        "n_channels": nc,
        "pixel_sum": total,
    }


def _dequant_idct_with(coeffs: list, quant: list) -> list:
    """Dequantize + exact integer IDCT with the stream's own quantization
    table; returns clamped row-major pixels."""
    dq = [coeffs[i] * quant[i] for i in range(64)]
    tmp = [[0] * 8 for _ in range(8)]
    for x in range(8):
        for v in range(8):
            acc = 0
            for u in range(8):
                acc += _CU[u] * dq[u * 8 + v] * _CT[u][x]
            tmp[x][v] = acc
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            acc = 0
            for v in range(8):
                acc += _CU[v] * tmp[x][v] * _CT[v][y]
            val = _rdiv(acc, _IDCT_DEN) + 128
            out[x * 8 + y] = 0 if val < 0 else 255 if val > 255 else val
    return out
