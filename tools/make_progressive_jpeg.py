"""Foreign-style PROGRESSIVE JPEG generator (fixture source for the
decoder's SOF2 support).

Independence contract (the make_foreign_style_gif.py protocol): this
module shares NO code with multimodal/jpeg_codec.py — its own zigzag
table, its own forward/inverse DCT, its own quantization tables (NOT
the Annex K pair the repo encoder uses), its own canonical Huffman
construction (fixed-length tables that include the EOBn symbols
baseline tables lack), its own bit writer — so decoding these bytes is
a cross-implementation check against the public T.81 spec, not a
self round-trip. The repo encoder emits baseline 4:4:4 only; every
stream built here (SOF2, successive approximation, EOB runs, AC
refinement, interleaved-DC + per-component-AC scan scripts, 4:2:0
subsampling, restart intervals inside progressive scans) is a byte
shape it cannot produce.

For each fixture this module returns THREE artifacts per image:
- progressive bytes (the scan script exercising DC first/refine and
  AC first/refine with EOB runs),
- BASELINE bytes encoding the IDENTICAL quantized coefficients (its
  own baseline writer) — decode(progressive) must equal
  decode(baseline) BIT-EXACTLY, a float-free pin that the scan
  machinery reconstructs the exact coefficient grid,
- expected RGB pixels computed by this module's own dequant + IDCT +
  upsample + JFIF color path (independent ground truth).
"""

from __future__ import annotations

import struct

import numpy as np

# --- own tables (deliberately NOT jpeg_codec's Annex K pair) ----------

_ZZ = [  # zigzag scan order: position k -> natural (row*8+col) index
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: flat-ish luma / skewed chroma quantizers — valid, non-Annex-K
_QL = np.full((8, 8), 12, dtype=np.int32)
_QL[0, 0] = 8
_QC = np.full((8, 8), 20, dtype=np.int32)
_QC[0, 0] = 10
_QC[4:, 4:] = 40

_C = np.array(
    [[np.cos((2 * j + 1) * i * np.pi / 16) for j in range(8)]
     for i in range(8)]
)
_C[0] *= 1 / np.sqrt(2)
_C *= 0.5  # orthonormal DCT-II basis


def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    return np.rint(f / q).astype(np.int64)


def _idct(coef_nat: np.ndarray) -> np.ndarray:
    return _C.T @ coef_nat @ _C + 128.0


# --- canonical Huffman with EOBn coverage ------------------------------

def _fixed_table(symbols: list[int], length: int):
    """All symbols at one code length (canonical assignment in symbol
    order) — legal per T.81 as long as 2^length > len(symbols)."""
    assert (1 << length) > len(symbols)
    codes = {s: (i, length) for i, s in enumerate(symbols)}
    bits = [0] * 17
    bits[length] = len(symbols)
    return codes, bits, symbols


_DC_SYMS = list(range(12))
_AC_SYMS = (
    [(r << 4) | s for s in range(1, 11) for r in range(16)]
    + [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
)
_DC_CODES, _DC_BITS, _DC_VALS = _fixed_table(_DC_SYMS, 5)
_AC_CODES, _AC_BITS, _AC_VALS = _fixed_table(_AC_SYMS, 9)


class _BitW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.put(1, 1)

    def take(self) -> bytes:
        self.align()
        b, self.out = bytes(self.out), bytearray()
        return b


def _amp(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.2.1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


# --- block planes ------------------------------------------------------

def _plane_blocks(plane: np.ndarray, q: np.ndarray,
                  bh: int, bw: int) -> np.ndarray:
    """(bh, bw, 64) quantized coefficients in ZIGZAG order; the plane
    is edge-replicated to the full block grid first."""
    ph, pw = bh * 8, bw * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[: plane.shape[0], : plane.shape[1]] = plane
    padded[plane.shape[0]:, : plane.shape[1]] = plane[-1:, :]
    padded[:, plane.shape[1]:] = padded[:, plane.shape[1] - 1 : plane.shape[1]]
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            nat = _fdct_quant(
                padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q
            ).reshape(-1)
            out[by, bx] = nat[_ZZ]
    return out


# --- marker segments ---------------------------------------------------

def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dqt(tq: int, q: np.ndarray) -> bytes:
    zz = q.reshape(-1)[_ZZ].astype(np.uint8)
    return _seg(0xDB, bytes([tq]) + zz.tobytes())


def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(
        0xC4, bytes([(tc << 4) | th]) + bytes(bits[1:17]) + bytes(vals)
    )


def _sof(marker: int, h: int, w: int, comps: list[dict]) -> bytes:
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        body += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    return _seg(marker, body)


def _sos(comps: list[dict], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comps)])
    for c in comps:
        body += bytes([c["id"], (c["td"] << 4) | c["ta"]])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


# --- progressive scan encoders (T.81 G.1.2 / libjpeg jcphuff) ----------

def _enc_dc_first(w: _BitW, blocks_per_comp: list[np.ndarray],
                  comps: list[dict], mcu_order, al: int) -> None:
    preds = [0] * len(comps)
    for mcu in mcu_order:
        for ci, by, bx in mcu:
            v = int(blocks_per_comp[ci][by, bx, 0]) >> al
            size, bits = _amp(v - preds[ci])
            preds[ci] = v
            w.put(*(_DC_CODES[size]))
            if size:
                w.put(bits, size)


def _enc_dc_refine(w: _BitW, blocks_per_comp: list[np.ndarray],
                   mcu_order, al: int) -> None:
    for mcu in mcu_order:
        for ci, by, bx in mcu:
            w.put((int(blocks_per_comp[ci][by, bx, 0]) >> al) & 1, 1)


def _pt(v: int, al: int) -> int:
    """Point transform: arithmetic shift toward zero of the magnitude
    (libjpeg's encode-side convention)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _enc_ac_first(w: _BitW, blocks: np.ndarray, order,
                  ss: int, se: int, al: int) -> None:
    eobrun = 0

    def emit_eobrun() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            w.put(*(_AC_CODES[nb << 4]))
            if nb:
                w.put(eobrun - (1 << nb), nb)
            eobrun = 0

    for by, bx in order:
        blk = blocks[by, bx]
        r = 0
        for k in range(ss, se + 1):
            t = _pt(int(blk[k]), al)
            if t == 0:
                r += 1
                continue
            emit_eobrun()
            while r > 15:
                w.put(*(_AC_CODES[0xF0]))
                r -= 16
            size, bits = _amp(t)
            w.put(*(_AC_CODES[(r << 4) | size]))
            w.put(bits, size)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _enc_ac_refine(w: _BitW, blocks: np.ndarray, order,
                   ss: int, se: int, al: int) -> None:
    eobrun = 0
    ebits: list[int] = []  # correction bits riding the pending EOB run

    def emit_eobrun() -> None:
        nonlocal eobrun, ebits
        if eobrun:
            nb = eobrun.bit_length() - 1
            w.put(*(_AC_CODES[nb << 4]))
            if nb:
                w.put(eobrun - (1 << nb), nb)
            for b in ebits:
                w.put(b, 1)
            ebits = []
            eobrun = 0

    for by, bx in order:
        blk = blocks[by, bx]
        absval = [abs(int(blk[k])) >> al for k in range(64)]
        eob = ss - 1
        for k in range(ss, se + 1):
            if absval[k] == 1:
                eob = k
        r = 0
        br: list[int] = []  # correction bits since the last symbol
        for k in range(ss, se + 1):
            t = absval[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                emit_eobrun()
                w.put(*(_AC_CODES[0xF0]))
                r -= 16
                for b in br:
                    w.put(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            emit_eobrun()
            w.put(*(_AC_CODES[(r << 4) | 1]))
            w.put(1 if int(blk[k]) >= 0 else 0, 1)
            for b in br:
                w.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            ebits.extend(br)
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


# --- baseline twin (same coefficients, sequential scan) ----------------

def _enc_baseline_scan(w: _BitW, blocks_per_comp: list[np.ndarray],
                       mcu_order) -> None:
    preds = [0] * len(blocks_per_comp)
    for mcu in mcu_order:
        for ci, by, bx in mcu:
            blk = blocks_per_comp[ci][by, bx]
            size, bits = _amp(int(blk[0]) - preds[ci])
            preds[ci] = int(blk[0])
            w.put(*(_DC_CODES[size]))
            if size:
                w.put(bits, size)
            r = 0
            for k in range(1, 64):
                t = int(blk[k])
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    w.put(*(_AC_CODES[0xF0]))
                    r -= 16
                size, bits = _amp(t)
                w.put(*(_AC_CODES[(r << 4) | size]))
                w.put(bits, size)
                r = 0
            if r > 0:
                w.put(*(_AC_CODES[0x00]))  # EOB


# --- top-level builders -------------------------------------------------

def _expected_rgb(planes_coef, qs, samp, h, w):
    """Independent ground truth: dequant + own IDCT + nearest-neighbor
    chroma upsample + JFIF color convert."""
    full = []
    hmax = max(sh for sh, sv in samp)
    vmax = max(sv for sh, sv in samp)
    for blocks, q, (sh, sv) in zip(planes_coef, qs, samp):
        bh, bw = blocks.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                nat = np.zeros(64, dtype=np.float64)
                nat[_ZZ] = blocks[by, bx]
                nat *= q.reshape(-1)
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct(
                    nat.reshape(8, 8)
                )
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr,
         y - 0.344136 * cb - 0.714136 * cr,
         y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def build_gray(h: int = 21, w: int = 13, seed: int = 7,
               restart: int = 0,
               al_first: int = 1) -> tuple[bytes, bytes, np.ndarray]:
    """Grayscale progressive fixture: DC first at Al=al_first, AC band
    first passes at Al=al_first, then one full DC+AC refinement sweep
    per approximation level down to 0 (al_first=2 exercises two
    stacked AC refinement passes — the correction-bit path on
    already-nonzero coefficients). Odd dimensions so edge blocks
    exercise padding + crop. Returns (progressive bytes,
    baseline-twin bytes, expected RGB)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = (
        8.0 * (yy % 11) + 6.0 * (xx % 7) + rng.randint(0, 60, (h, w))
    ).clip(0, 255)
    bh, bw = -(-h // 8), -(-w // 8)
    blocks = _plane_blocks(img, _QL, bh, bw)
    order = [(by, bx) for by in range(bh) for bx in range(bw)]
    mcu_order = [[(0, by, bx)] for by, bx in order]
    comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "td": 0, "ta": 0}]

    head = b"\xff\xd8" + _dqt(0, _QL)
    head += _dht(0, 0, _DC_BITS, _DC_VALS) + _dht(1, 0, _AC_BITS, _AC_VALS)
    if restart:
        head += _seg(0xDD, struct.pack(">H", restart))

    w_ = _BitW()
    prog = head + _sof(0xC2, h, w, comps)
    bands = [(1, 5), (6, 63)]
    scans = [(0, 0, 0, al_first, "dcf")] + [
        (b0, b1, 0, al_first, "acf") for b0, b1 in bands
    ]
    for al in range(al_first - 1, -1, -1):
        scans += [(0, 0, al + 1, al, "dcr")] + [
            (b0, b1, al + 1, al, "acr") for b0, b1 in bands
        ]
    # a nonzero DRI applies to EVERY scan that follows (T.81 B.2.4.4),
    # so the restart variant chunks ALL six scans — including the AC
    # ones, whose EOB-run state must flush and reset at each marker
    step = restart if restart else len(order)
    for ss, se, ah, al, kind in scans:
        prog += _sos(comps, ss, se, ah, al)
        for i0 in range(0, len(order), step):
            if kind == "dcf":
                _enc_dc_first(
                    w_, [blocks], comps, mcu_order[i0 : i0 + step], al
                )
            elif kind == "dcr":
                _enc_dc_refine(
                    w_, [blocks], mcu_order[i0 : i0 + step], al
                )
            elif kind == "acf":
                _enc_ac_first(
                    w_, blocks, order[i0 : i0 + step], ss, se, al
                )
            else:
                _enc_ac_refine(
                    w_, blocks, order[i0 : i0 + step], ss, se, al
                )
            prog += w_.take()
            if i0 + step < len(order):
                prog += bytes([0xFF, 0xD0 + (i0 // step) % 8])
    prog += b"\xff\xd9"

    base = b"\xff\xd8" + _dqt(0, _QL)
    base += _dht(0, 0, _DC_BITS, _DC_VALS) + _dht(1, 0, _AC_BITS, _AC_VALS)
    base += _sof(0xC0, h, w, comps) + _sos(comps, 0, 63, 0, 0)
    _enc_baseline_scan(w_, [blocks], mcu_order)
    base += w_.take() + b"\xff\xd9"

    expected = _expected_rgb([blocks], [_QL], [(1, 1)], h, w)
    return prog, base, expected


def build_color420(h: int = 19, w: int = 27,
                   seed: int = 11) -> tuple[bytes, bytes, np.ndarray]:
    """4:2:0 color progressive fixture: interleaved DC scans + per-
    component AC scans (the scan-script shape libjpeg's default
    progression uses). Returns (progressive, baseline twin, expected
    RGB)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (5.0 * yy + 3.0 * xx + rng.randint(0, 40, (h, w))).clip(0, 255)
    g = (255.0 - 4.0 * xx + rng.randint(0, 40, (h, w))).clip(0, 255)
    b = (7.0 * (yy % 9) + rng.randint(0, 40, (h, w))).clip(0, 255)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    hmax = vmax = 2
    mcux, mcuy = -(-w // 16), -(-h // 16)

    def down(p: np.ndarray) -> np.ndarray:
        ph = p.shape[0] + (p.shape[0] & 1)
        pw = p.shape[1] + (p.shape[1] & 1)
        pad = np.empty((ph, pw))
        pad[: p.shape[0], : p.shape[1]] = p
        pad[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        pad[:, p.shape[1]:] = pad[:, p.shape[1] - 1 : p.shape[1]]
        return 0.25 * (
            pad[0::2, 0::2] + pad[1::2, 0::2]
            + pad[0::2, 1::2] + pad[1::2, 1::2]
        )

    planes = [y, down(cb), down(cr)]
    samp = [(2, 2), (1, 1), (1, 1)]
    qs = [_QL, _QC, _QC]
    blocks = []
    for p, (sh, sv), q in zip(planes, samp, qs):
        blocks.append(_plane_blocks(p, q, mcuy * sv, mcux * sh))

    comps = [
        {"id": 1, "h": 2, "v": 2, "tq": 0, "td": 0, "ta": 0},
        {"id": 2, "h": 1, "v": 1, "tq": 1, "td": 0, "ta": 0},
        {"id": 3, "h": 1, "v": 1, "tq": 1, "td": 0, "ta": 0},
    ]
    mcu_order = []
    for my in range(mcuy):
        for mx in range(mcux):
            units = []
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        units.append((ci, my * sv + by, mx * sh + bx))
            mcu_order.append(units)

    head = b"\xff\xd8" + _dqt(0, _QL) + _dqt(1, _QC)
    head += _dht(0, 0, _DC_BITS, _DC_VALS) + _dht(1, 0, _AC_BITS, _AC_VALS)

    w_ = _BitW()
    prog = head + _sof(0xC2, h, w, comps)
    prog += _sos(comps, 0, 0, 0, 1)
    _enc_dc_first(w_, blocks, comps, mcu_order, 1)
    prog += w_.take()
    for ci in range(3):
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        order = [
            (by, bx)
            for by in range(-(-ch // 8))
            for bx in range(-(-cw // 8))
        ]
        prog += _sos([comps[ci]], 1, 63, 0, 1)
        _enc_ac_first(w_, blocks[ci], order, 1, 63, 1)
        prog += w_.take()
    prog += _sos(comps, 0, 0, 1, 0)
    _enc_dc_refine(w_, blocks, mcu_order, 0)
    prog += w_.take()
    for ci in range(3):
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        order = [
            (by, bx)
            for by in range(-(-ch // 8))
            for bx in range(-(-cw // 8))
        ]
        prog += _sos([comps[ci]], 1, 63, 1, 0)
        _enc_ac_refine(w_, blocks[ci], order, 1, 63, 0)
        prog += w_.take()
    prog += b"\xff\xd9"

    base = head + _sof(0xC0, h, w, comps) + _sos(comps, 0, 63, 0, 0)
    _enc_baseline_scan(w_, blocks, mcu_order)
    base += w_.take() + b"\xff\xd9"

    expected = _expected_rgb(blocks, qs, samp, h, w)
    return prog, base, expected


if __name__ == "__main__":
    for name, built in (
        ("gray", build_gray()),
        ("gray_rst", build_gray(restart=3)),
        ("color420", build_color420()),
    ):
        prog, base, exp = built
        print(name, len(prog), len(base), exp.shape)
