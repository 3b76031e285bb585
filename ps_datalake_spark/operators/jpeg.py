"""Baseline JPEG codec in pure Python + numpy (no codec libraries).

Implements the parts of ISO/IEC 10918-1 (ITU T.81) needed for a real
training-data pipeline's image-metadata pass: baseline sequential DCT
(SOF0), 8-bit samples, interleaved scans, sampling factors 1-2 (4:4:4 and
4:2:0), multiple DQT/DHT tables per marker segment, restart intervals
(DRI/RSTn), and JFIF byte stuffing.  The encoder exists so fixtures can be
synthesized without any external library; the decoder is general over
baseline JFIF streams.

Determinism conventions (mirrored literally by the SQL oracles in
queries/llm_ops.py::b39_decode_jpeg):

* every float→int sample rounding is ``floor(x + 0.5 + 1e-6)`` — half-up
  with a 1e-6 guard so an exact .5 boundary computed through float DCT /
  color arithmetic cannot be tipped by a last-ulp error in either direction;
* RGB↔YCbCr uses the JFIF constants (0.299/0.587/0.114, 1.402/1.772,
  0.344136/0.714136);
* chroma upsampling is pixel replication (nearest neighbour).

For an image whose 8×8 blocks are each a uniform color (the planted
fixtures: horizontal bands with heights that are multiples of 16), the
whole lossy path collapses to an ANALYTIC form any correct baseline codec
must reproduce: FDCT of a constant block has only a DC term 8·(v−128), so
the reconstructed sample is round(8·(v−128)/q)·q/8 + 128 per channel — a
closed formula over the planted colors and quant table that the DuckDB
oracle evaluates in SQL.  That makes the oracle implementation-independent:
it checks JPEG mathematics, not this module's own output.
"""

from __future__ import annotations

import struct

import numpy as np

_EPS = 1e-6


def _r(x):
    """The module-wide rounding convention: floor(x + 0.5 + 1e-6)."""
    return np.floor(x + 0.5 + _EPS)


# ---------------------------------------------------------------------------
# Constant tables (ITU T.81 Annex K)
# ---------------------------------------------------------------------------

# Annex K.1 quantization tables, natural (row-major) order.
STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

STD_CHR_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag[k] = natural-order index of the k-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# DCT-II basis: M[u, x] = C(u)/2 * cos((2x+1)uπ/16); F = M B Mᵀ, B = Mᵀ F M
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Scale the Annex K tables by an IJG-style quality factor (1-100)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    lum = np.clip((STD_LUM_QT * scale + 50) // 100, 1, 255).astype(np.int32)
    chr_ = np.clip((STD_CHR_QT * scale + 50) // 100, 1, 255).astype(np.int32)
    return lum, chr_


def _build_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the bit-serial decoder."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _build_codes(bits, huffval).items():
        out[(length, code)] = sym
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """Entropy-encode one quantized block in zigzag order; returns new DC
    predictor."""
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF color convert with the module rounding convention; float in [0,255]."""
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(_r(np.stack([y, cb, cr], axis=-1)), 0, 255)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a top-down uint8 RGB array as a baseline JFIF JPEG.

    ``subsampling``: '444' (no chroma subsampling, MCU 8×8) or '420'
    (2×2 chroma subsampling, MCU 16×16).  ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every N MCUs (exercises the decoder's
    resynchronization path).
    """
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = img.shape[0], img.shape[1]
    lum_qt, chr_qt = quality_tables(quality)
    ycc = rgb_to_ycbcr(img)

    if subsampling == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
    else:
        samp = [(2, 2), (1, 1), (1, 1)]
        # 2x2 box average with the module rounding, after edge padding to even
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        planes = [
            ycc[:, :, 0],
            np.clip(_r(padded[:, :, 1].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))), 0, 255),
            np.clip(_r(padded[:, :, 2].reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))), 0, 255),
        ]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad every plane to its MCU grid by edge replication
    padded_planes = []
    for (hi, vi), plane in zip(samp, planes):
        pw_i, ph_i = mcus_x * hi * 8, mcus_y * vi * 8
        padded_planes.append(
            np.pad(plane, ((0, ph_i - plane.shape[0]), (0, pw_i - plane.shape[1])), mode="edge")
        )

    qts = [lum_qt, chr_qt, chr_qt]
    dc_codes = [_build_codes(*_DC_LUM), _build_codes(*_DC_CHR), _build_codes(*_DC_CHR)]
    ac_codes = [_build_codes(*_AC_LUM), _build_codes(*_AC_CHR), _build_codes(*_AC_CHR)]

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()  # byte-align before the marker
                bw.out += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                preds = [0, 0, 0]
            mcu_count += 1
            for ci, (hi, vi) in enumerate(samp):
                qt = qts[ci].reshape(8, 8).astype(np.float64)
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = padded_planes[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = _DCT_M @ block @ _DCT_M.T
                        zz_nat = _r(coef / qt).astype(np.int32)
                        zz = zz_nat.reshape(-1)[ZIGZAG]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], dc_codes[ci], ac_codes[ci]
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0x00]) + bytes(lum_qt.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(chr_qt.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for tc_th, (bits, vals) in (
        ((0, 0), _DC_LUM), ((1, 0), _AC_LUM), ((0, 1), _DC_CHR), ((1, 1), _AC_CHR)
    ):
        body = bytes([(tc_th[0] << 4) | tc_th[1]]) + bytes(bits) + bytes(vals)
        out += seg(0xC4, body)
    sos = bytes([3])
    for ci in range(3):
        td_ta = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and RSTn awareness."""

    def __init__(self, raw: bytes, pos: int) -> None:
        self.raw = raw
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None  # set when a non-RST marker is hit

    def _fill(self) -> None:
        if self.pos >= len(self.raw):
            raise _ScanEnd()
        b = self.raw[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.raw):
                raise _ScanEnd()  # truncated right after an FF byte
            nxt = self.raw[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by reset()
                raise _RestartMarker(nxt)
            else:
                self.marker = nxt
                raise _ScanEnd()
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bits(self, n: int) -> int:
        while self._n < n:
            self._fill()
        v = (self._acc >> (self._n - n)) & ((1 << n) - 1)
        self._n -= n
        self._acc &= (1 << self._n) - 1
        return v

    def reset_at_rst(self) -> None:
        """Consume an RSTn marker and byte-align."""
        self._acc = 0
        self._n = 0
        self.pos += 2  # skip FF Dn


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _ScanEnd(Exception):
    pass


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy-coded data")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def parse_jpeg(raw: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG into a top-down uint8 RGB ndarray."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (h, w, comps) where comps = [(id, hi, vi, qt_id)]
    restart_interval = 0

    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # optional 0xFF fill bytes before a marker are legal (T.81 B.1.1.2)
        while pos + 1 < len(raw) and raw[pos + 1] == 0xFF:
            pos += 1
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        if pos + 2 + length > len(raw):
            raise ValueError("truncated marker segment")
        body = raw[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported (baseline)")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                qts[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline / ext seq)
            precision, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline frame type 0xFF{marker:02X} not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tables = {}
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan_tables[cs] = (tdta >> 4, tdta & 0xF)
            return _decode_scan(
                raw, pos, frame, qts, huff, scan_tables, restart_interval
            )
        # APPn/COM and others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(raw, pos, frame, qts, huff, scan_tables, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = []
    for cid, hi, vi, tq in comps:
        planes.append(np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64))

    br = _BitReader(raw, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    complete = False
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    # byte-align and swallow the RSTn, reset DC predictors
                    try:
                        while True:
                            br.bits(1)
                    except _RestartMarker:
                        br.reset_at_rst()
                        preds = [0] * len(comps)
                for ci, (cid, hi, vi, tq) in enumerate(comps):
                    td, ta = scan_tables[cid]
                    dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                    qt = qts[tq].astype(np.float64)
                    for by in range(vi):
                        for bx in range(hi):
                            zz = np.zeros(64, dtype=np.int32)
                            s = _decode_huff(br, dc_tab)
                            diff = _extend(br.bits(s), s) if s else 0
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = _decode_huff(br, ac_tab)
                                r_, s_ = rs >> 4, rs & 0xF
                                if s_ == 0:
                                    if r_ == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r_
                                if k > 63:
                                    raise ValueError("AC run past block end")
                                zz[k] = _extend(br.bits(s_), s_)
                                k += 1
                            nat = np.zeros(64, dtype=np.float64)
                            nat[ZIGZAG] = zz
                            coef = nat.reshape(8, 8) * qt
                            block = _DCT_M.T @ coef @ _DCT_M + 128.0
                            y0 = (my * vi + by) * 8
                            x0 = (mx * hi + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
                mcu_count += 1
        complete = True
    except _ScanEnd:
        if not complete:
            raise ValueError("entropy-coded data ended before the last MCU")
    except _RestartMarker:
        # a RSTn outside the expected restart phase (bit error, or a foreign
        # DRI cadence): surface the documented error type, never the
        # internal control-flow exception
        raise ValueError("unexpected restart marker in entropy-coded data")

    out = np.zeros((h, w, 3), dtype=np.float64)
    for ci, (cid, hi, vi, tq) in enumerate(comps[:3]):
        plane = np.clip(_r(planes[ci]), 0, 255)
        up = plane.repeat(vmax // vi, axis=0).repeat(hmax // hi, axis=1)
        out[:, :, ci] = up[:h, :w]
    if len(comps) == 1:
        y = out[:, :, 0]
        return np.clip(_r(np.stack([y, y, y], axis=-1)), 0, 255).astype(np.uint8)
    y, cb, cr = out[:, :, 0], out[:, :, 1] - 128.0, out[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(_r(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
