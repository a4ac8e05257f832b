"""Minimal baseline JPEG codec — pure stdlib+numpy, no image libraries.

Companion to png_codec: gives the binaryFile image source a REAL decode
path for a SECOND format without PIL (reference feature_extractor.py:20
opens icons generically through PIL; when PIL exists it is still
preferred — see images.decode_image). Everything here follows the
public JPEG spec (ITU-T T.81): baseline sequential DCT, 8-bit samples,
Huffman entropy coding, JFIF YCbCr color.

Decoder supports: SOF0/SOF1 (baseline sequential) AND SOF2
(progressive: spectral selection + successive approximation — DC
first/refine, AC first/refine with EOB runs, per T.81 G.1.2 and the
libjpeg phuff arithmetic), 1- or 3-component images, sampling factors
up to 2x2 (4:4:4, 4:2:2, 4:2:0), restart intervals, stuffed bytes.
Arithmetic coding, hierarchical (SOF5+), and 12-bit precision raise
ValueError rather than guessing.

Encoder emits: 4:4:4 baseline with the Annex K example quantization /
Huffman tables (quality-scaled per the classic IJG curve). It exists to
build committed test fixtures and for round-trip property tests; decode
(encode(img)) must approximate img within normal quantization error.
"""

from __future__ import annotations

import struct

import numpy as np

from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path

# --- tables from ITU-T T.81 Annex K (public example tables) -------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# (bits[1..16], values) — canonical Huffman specs, T.81 tables K.3-K.6
DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: orthonormal 8-point DCT-II matrix: F = A @ f @ A.T, f = A.T @ F @ A
_A = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """Classic IJG quality curve: 50 = Annex K tables verbatim."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# --- encoder ------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        """Pad with 1-bits to a byte boundary (before a marker)."""
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)

    def marker(self, byte2: int) -> None:
        self.align()
        self.buf += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """v -> (size, amplitude bits) per T.81 F.1.2.1 (negative = ones'
    complement of |v| at that size)."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    if v < 0:
        v += (1 << size) - 1
    return size, v


def _encode_block(
    w: _BitWriter,
    coefs: np.ndarray,
    pred: int,
    dc: dict[int, tuple[int, int]],
    ac: dict[int, tuple[int, int]],
) -> int:
    zz = coefs.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    size, amp = _magnitude(diff)
    code, length = dc[size]
    w.write(code, length)
    if size:
        w.write(amp, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        size, amp = _magnitude(v)
        c, ln = ac[(run << 4) | size]
        w.write(c, ln)
        w.write(amp, size)
        run = 0
    if last < 63:
        c, ln = ac[0x00]  # EOB
        w.write(c, ln)
    return int(zz[0])


def _clamped_block(plane: np.ndarray, y0: int, x0: int) -> np.ndarray:
    """8x8 block at (y0, x0), edge-replicated past the boundary."""
    h, w = plane.shape
    ys = np.minimum(np.arange(y0, y0 + 8), h - 1)
    xs = np.minimum(np.arange(x0, x0 + 8), w - 1)
    return plane[np.ix_(ys, xs)]


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF JPEG bytes.

    ``subsample=True`` emits 4:2:0 (Y at 2x2 blocks per MCU, chroma
    averaged 2x2 then coded at 1 block) — the dominant real-world
    layout; default is 4:4:4. ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs. Both exist chiefly so the DECODER's
    subsampling/restart paths are testable against known pixels."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects HxWx3 uint8")
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y_p = 0.299 * r + 0.587 * g + 0.114 * b
    cb_p = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr_p = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample:
        # average 2x2 neighborhoods (pad by edge replication if odd)
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        def down(p: np.ndarray) -> np.ndarray:
            padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            return padded.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cb_p, cr_p = down(cb_p), down(cr_p)
    qts = [_quality_scale(QT_LUMA, quality), _quality_scale(QT_CHROMA, quality)]
    dc_tabs = [_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS),
               _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS),
               _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    def code_block(writer, plane, y0, x0, ci, preds):
        block = _clamped_block(plane, y0, x0) - 128.0
        coef = _A @ block @ _A.T
        ti = 0 if ci == 0 else 1
        q = np.rint(coef / qts[ti].reshape(8, 8)).astype(np.int32)
        preds[ci] = _encode_block(writer, q, preds[ci], dc_tabs[ti], ac_tabs[ti])

    yh = 2 if subsample else 1  # Y sampling factor (both axes)
    mcu_px = 8 * yh
    mcux, mcuy = -(-w // mcu_px), -(-h // mcu_px)
    writer = _BitWriter()
    preds = [0, 0, 0]
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.marker(0xD0 + ((n_mcu // restart_interval - 1) % 8))
                preds = [0, 0, 0]
            n_mcu += 1
            for by in range(yh):
                for bx in range(yh):
                    code_block(
                        writer, y_p,
                        (my * yh + by) * 8, (mx * yh + bx) * 8, 0, preds,
                    )
            code_block(writer, cb_p, my * 8, mx * 8, 1, preds)
            code_block(writer, cr_p, my * 8, mx * 8, 2, preds)
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits[1:]) + bytes(vals)

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qts[0].reshape(-1)[ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qts[1].reshape(-1)[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    y_hv = (yh << 4) | yh
    for cid, hv, tq in ((1, y_hv, 0), (2, 0x11, 1), (3, 0x11, 1)):
        sof += bytes([cid, hv, tq])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += seg(0xFFC4, dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    out += seg(0xFFC4, dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
    out += seg(0xFFC4, dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan + b"\xff\xd9"  # EOI
    return out


# --- decoder ------------------------------------------------------------


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers
    (RSTn are consumed by the MCU loop via restart())."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: stop; restart() consumes it
                else:
                    break  # EOI / next segment
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:  # at marker: spec pads with 1-bits
                return 1
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: amplitude bits -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> HxWx3 uint8 RGB (grayscale broadcast)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    try:
        return _decode_jpeg_body(payload)
    except (struct.error, IndexError, KeyError, TypeError) as e:
        # truncated/inconsistent streams surface as the documented
        # ValueError (KeyError: SOS referencing an undeclared table;
        # TypeError: SOS before SOF), never as raw internal errors
        raise ValueError(f"corrupt JPEG: {e!r}") from e


def _next_marker(payload: bytes, pos: int) -> int:
    """Position of the next non-stuffing, non-RST marker at/after pos
    (the end of an entropy-coded segment)."""
    while pos + 1 < len(payload):
        if (
            payload[pos] == 0xFF
            and payload[pos + 1] != 0x00
            and not (0xD0 <= payload[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return len(payload)


def _decode_jpeg_body(payload: bytes) -> np.ndarray:
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    progressive = False
    saw_scan = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            o = 0
            while o < len(data):
                pq, tq = data[o] >> 4, data[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(data[o + 1 : o + 65], dtype=np.uint8)
                t = np.empty(64, dtype=np.int32)
                t[ZIGZAG] = zz
                qts[tq] = t.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            o = 0
            while o < len(data):
                tc, th = data[o] >> 4, data[o] & 0xF
                bits = [0] + list(data[o + 1 : o + 17])
                n = sum(bits)
                vals = list(data[o + 17 : o + 17 + n])
                tab = _huff_decode_table(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = tab
                o += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if hmax > 2 or vmax > 2:
                    raise ValueError("sampling factors above 2 unsupported")
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for c in comps:
                    # full interleaved-grid block storage, zigzag order
                    c["coef"] = np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                    )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG (SOF marker 0xFF{marker:02X}); codec "
                "handles baseline sequential (SOF0/SOF1) and "
                "progressive (SOF2) only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            ns = data[0]
            order = []
            for i in range(ns):
                cid, tt = data[1 + 2 * i], data[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                # progressive AC-only scans may omit the DC table id
                # (and vice versa); resolve lazily so an undeclared
                # table only errors if the scan actually uses it
                comp["dc"] = dc_tabs.get(tt >> 4)
                comp["ac"] = ac_tabs.get(tt & 0xF)
                order.append(comp)
            if not progressive:
                return _decode_scan(
                    payload, pos + 2 + seglen, order, qts, h, w,
                    restart_interval,
                )
            ss, se, ahal = data[1 + 2 * ns], data[2 + 2 * ns], data[3 + 2 * ns]
            pos = _decode_progressive_scan(
                payload, pos + 2 + seglen, order,
                ss, se, ahal >> 4, ahal & 0xF,
                restart_interval, w, h,
                max(c["h"] for c in comps), max(c["v"] for c in comps),
            )
            saw_scan = True
            continue
        pos += 2 + seglen
    if progressive and saw_scan:
        return _progressive_finish(comps, qts, h, w)
    raise ValueError("no SOS marker found")


def _dc_scan_block(r: _BitReader, c: dict, blk: np.ndarray,
                   ah: int, al: int) -> None:
    """One block of a progressive DC scan (T.81 G.1.2.1): first pass
    decodes the point-transformed diff chain; refinement appends one
    magnitude bit per block (plain two's-complement OR, the libjpeg
    arithmetic the encoders mirror)."""
    if ah == 0:
        size = _decode_huff(r, c["dc"])
        diff = _extend(r.bits(size), size)
        c["pred"] += diff
        blk[0] = c["pred"] << al
    elif r.bit():
        blk[0] |= 1 << al


def _ac_first_block(r: _BitReader, ac: dict, blk: np.ndarray,
                    ss: int, se: int, al: int, eobrun: int) -> int:
    """One block of an AC spectral-selection first pass (G.1.2.2):
    baseline-style run/size coding inside the [Ss, Se] band, plus EOB
    RUNS (rs with size 0, run < 15 encodes 2^run + bits(run) all-zero
    band remainders, this block included)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(r, ac)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr == 15:  # ZRL: 16 zeros inside the band
                k += 16
                continue
            eobrun = (1 << rr) - 1
            if rr:
                eobrun += r.bits(rr)
            break
        k += rr
        if k > se:
            raise ValueError("AC index out of band")
        blk[k] = _extend(r.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(r: _BitReader, ac: dict, blk: np.ndarray,
                     ss: int, se: int, al: int, eobrun: int) -> int:
    """One block of an AC successive-approximation refinement scan
    (G.1.2.3, the libjpeg decode_mcu_AC_refine arithmetic): zero-
    history positions may gain a new +-2^Al coefficient; every already-
    nonzero position visited consumes one correction bit appended at
    magnitude bit Al."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(r, ac)
            rr, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if rr != 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.bits(rr)
                    break
                # rr == 15: a run of 16 zero-HISTORY coefficients
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                newval = p1 if r.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if r.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if rr == 0:
                        if newval:
                            blk[k] = newval
                        k += 1
                        break
                    rr -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0 and r.bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    payload: bytes,
    pos: int,
    scan: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    ri: int,
    w: int,
    h: int,
    hmax: int,
    vmax: int,
) -> int:
    """Decode one progressive scan into the components' coefficient
    grids (zigzag order) and return the stream position of the next
    marker segment. Interleaved scans (ns > 1) are DC-only per T.81;
    AC scans run non-interleaved over the single component's own
    sampled block grid."""
    r = _BitReader(payload, pos)
    eobrun = 0
    for c in scan:
        c["pred"] = 0
    if len(scan) > 1:
        if ss != 0:
            raise ValueError("interleaved progressive AC scan")
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and n_mcu and n_mcu % ri == 0:
                    r.restart()
                    for c in scan:
                        c["pred"] = 0
                n_mcu += 1
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = c["coef"][
                                my * c["v"] + by, mx * c["h"] + bx
                            ]
                            _dc_scan_block(r, c, blk, ah, al)
    else:
        c = scan[0]
        # non-interleaved: the component's OWN sampled dimensions
        # (T.81 A.1.1), not the padded interleaved MCU grid
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if ri and n and n % ri == 0:
                    r.restart()
                    c["pred"] = 0
                    eobrun = 0
                n += 1
                blk = c["coef"][by, bx]
                if ss == 0:
                    _dc_scan_block(r, c, blk, ah, al)
                elif ah == 0:
                    eobrun = _ac_first_block(
                        r, c["ac"], blk, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_block(
                        r, c["ac"], blk, ss, se, al, eobrun
                    )
    return _next_marker(payload, r.pos)


def _progressive_finish(
    comps: list[dict], qts: dict[int, np.ndarray], h: int, w: int
) -> np.ndarray:
    """All scans consumed: dequantize + IDCT every accumulated block
    and hand the planes to the shared assembly path."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        q = qts[c["tq"]].reshape(-1).astype(np.float64)
        bh, bw = c["coef"].shape[:2]
        nat = np.zeros((bh, bw, 64), dtype=np.float64)
        nat[..., ZIGZAG] = c["coef"]
        nat *= q[None, None, :]
        blocks = nat.reshape(bh, bw, 8, 8)
        out = np.einsum("ji,abjk,kl->abil", _A, blocks, _A) + 128.0
        c["plane"] = out.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _assemble_rgb(comps, h, w, hmax, vmax)


def _decode_scan(
    payload: bytes,
    pos: int,
    comps: list[dict],
    qts: dict[int, np.ndarray],
    h: int,
    w: int,
    restart_interval: int,
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        c["pred"] = 0
    r = _BitReader(payload, pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                r.restart()
                for c in comps:
                    c["pred"] = 0
            n_mcu += 1
            for c in comps:
                q = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = _decode_huff(r, c["dc"])
                        diff = _extend(r.bits(size), size)
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, c["ac"])
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
                        block = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = block
    return _assemble_rgb(comps, h, w, hmax, vmax)


def _assemble_rgb(
    comps: list[dict], h: int, w: int, hmax: int, vmax: int
) -> np.ndarray:
    """Crop planes to nominal size, upsample subsampled chroma to full
    res, convert to RGB — shared by the baseline and progressive paths
    so both decode to identical pixels from identical coefficients."""
    full = []
    for c in comps:
        plane = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        # rint like the color path: truncation would bias ~0.5 down
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
