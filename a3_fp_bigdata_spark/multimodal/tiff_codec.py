"""Pure-python TIFF codec (baseline, uncompressed) — no image libraries.

Fifth real image container for the multimodal tier (PNG, JPEG baseline,
GIF87a/89a, BMP, now TIFF): scanned-document and scientific corpora are
overwhelmingly TIFF, and the uncompressed baseline profile (TIFF 6.0
spec, Compression=1) covers the archival-dump slice without PIL.

- decode: both byte orders (II little / MM big endian), first IFD;
  8-bit RGB / RGBA (extra samples ignored), 8-bit grayscale
  (both PhotometricInterpretation polarities), and palette-color
  (ColorMap, 16-bit entries); multi-strip and single-strip layouts;
  chunky planar configuration.
- encode: single-strip 8-bit RGB little-endian (the universally
  readable baseline).

r11 adds the two compressions that dominate real archival TIFF:
LZW (Compression=5, spec §13 — MSB-first codes, 9→12-bit widths with
the spec's early-change rule, per-strip streams) and PackBits
(Compression=32773, spec §9), plus the horizontal-differencing
Predictor (tag 317 value 2) that LZW files overwhelmingly carry.
JPEG-in-TIFF, tiled layouts, and planar configuration 2 still raise
NotImplementedError loudly — the same honest-ceiling contract as
images.decode_image (reference feature_extractor.py:20 accepts
anything PIL opens; this module covers the archival slice without
PIL).
"""

from __future__ import annotations

import struct

import numpy as np

from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path

#: tag ids (TIFF 6.0 §8)
_W, _H = 256, 257
_BPS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _PREDICTOR, _COLORMAP, _TILE_OFF = 284, 317, 320, 324


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, ClearCode
    256 / EOI 257, code width 9..12 with the EARLY-CHANGE rule (width
    bumps when the NEXT table slot would be 2^width - 1 — TIFF writers
    switch one code earlier than GIF's LSB-first variant)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal acc, bits, pos
        while bits < width:
            if pos >= len(data):
                return EOI  # ran off the end: treat as end of stream
            acc = (acc << 8) | data[pos]
            pos += 1
            bits += 8
        bits -= width
        code = (acc >> bits) & ((1 << width) - 1)
        return code

    while True:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table) or not table:
                raise ValueError(f"LZW: bad first code {code}")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError(f"LZW: code {code} beyond table")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # early change, decoder side: the encoder widens as soon as its
        # next FREE slot is 2^width - 1, and the decoder's table runs
        # one entry BEHIND the encoder's (the entry for code k is only
        # completed while processing code k+1) — so the decoder widens
        # at 2^width - 2 (libtiff's maxcode-1 rule; verified by
        # round-trip against the independent spec-transcribed writer
        # in tests across both width boundaries and a CLEAR restart)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """PackBits (spec §9): n in [0,127] copies n+1 literals; n in
    [-127,-1] repeats the next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            if i + n + 1 > len(data):
                # mirror the repeat-run truncation check — a clipped
                # slice would silently shorten the strip (ADVICE r11)
                raise ValueError("PackBits: truncated literal run")
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            if i >= len(data):
                raise ValueError("PackBits: truncated run")
            out += bytes([data[i]]) * (1 - n)
            i += 1
    return bytes(out)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _read_ifd(payload: bytes, bo: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    (n,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        if typ not in _TYPE_FMT:
            continue  # rationals/undefined: nothing here needs them
        size = _TYPE_SIZE[typ] * count
        off = base + 8 if size <= 4 else struct.unpack_from(
            bo + "I", payload, base + 8
        )[0]
        fmt = bo + str(count) + _TYPE_FMT[typ]
        tags[tag] = list(struct.unpack_from(fmt, payload, off))
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF bytes -> HxWx3 uint8 RGB array (first IFD)."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF: missing II/MM byte-order mark")
    bo = "<" if payload[:2] == b"II" else ">"
    (magic,) = struct.unpack_from(bo + "H", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic} (want 42)")
    t = _read_ifd(payload, bo)
    if _TILE_OFF in t:
        raise NotImplementedError("tiled TIFF not supported (strips only)")
    comp = t.get(_COMP, [1])[0]
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (uncompressed, LZW, "
            "PackBits; JPEG-in-TIFF needs PIL)"
        )
    if t.get(_PLANAR, [1])[0] != 1:
        raise NotImplementedError("planar TIFF not supported (chunky only)")
    predictor = t.get(_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} (none / horizontal only)"
        )
    w, h = t[_W][0], t[_H][0]
    spp = t.get(_SPP, [1])[0]
    bps = t.get(_BPS, [1] * spp)
    photo = t.get(_PHOTO, [1])[0]
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"TIFF bits-per-sample {bps} (8 only)")
    offs = t[_STRIP_OFF]
    cnts = t.get(_STRIP_CNT, [w * h * spp])
    strips = [payload[o : o + c] for o, c in zip(offs, cnts)]
    if comp == 5:
        strips = [_lzw_decode(s) for s in strips]
    elif comp == 32773:
        strips = [_packbits_decode(s) for s in strips]
    if comp != 1:
        # per-strip length check (ADVICE r11): the aggregate check
        # below can pass a multi-strip file whose strips decoded to
        # the wrong individual lengths (pixels shifted across strip
        # boundaries) as long as the TOTAL still covers w*h*spp.
        # Every strip must decode to exactly rows_per_strip rows of
        # w*spp bytes; the last strip covers the remainder.
        rps = t.get(_ROWS_PER_STRIP, [h])[0]
        for k, s in enumerate(strips):
            rows = rps if k < len(strips) - 1 else h - rps * k
            if len(s) != rows * w * spp:
                raise ValueError(
                    f"TIFF strip {k}: decoded {len(s)} bytes, "
                    f"expected {rows * w * spp}"
                )
    data = b"".join(strips)
    if len(data) < w * h * spp:
        raise ValueError("truncated TIFF strip data")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * spp).reshape(
        h, w, spp
    )
    if predictor == 2:
        # horizontal differencing: each row stores per-sample deltas;
        # undo with a wrapping prefix sum along the row, per channel
        px = np.add.accumulate(px, axis=1, dtype=np.uint8)
    if photo == 3:  # palette-color: ColorMap is 3 planes of 16-bit
        if _COLORMAP not in t:
            raise ValueError("palette TIFF (photometric 3) missing ColorMap")
        cmap = t[_COLORMAP]
        n = len(cmap) // 3
        pal = (
            np.array(cmap, dtype=np.uint32).reshape(3, n).T // 257
        ).astype(np.uint8)
        return pal[px[:, :, 0]]
    if photo in (0, 1) and spp == 1:  # grayscale
        g = px[:, :, 0]
        if photo == 0:  # WhiteIsZero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photo == 2 and spp >= 3:  # RGB (+ ignored extra samples)
        return np.ascontiguousarray(px[:, :, :3])
    raise NotImplementedError(
        f"TIFF photometric {photo} with {spp} samples not supported"
    )


def encode_tiff(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> single-strip uncompressed little-endian TIFF."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_tiff expects HxWx3 uint8")
    h, w = arr.shape[:2]
    pix = arr.tobytes()
    # layout: header(8) | BPS array(6) | pixel data | pad? | IFD
    bps_off = 8
    pix_off = bps_off + 6
    # TIFF 6.0 requires word-aligned IFDs; an odd strip length would
    # land the IFD on an odd offset (strict readers reject it)
    pad = len(pix) % 2
    ifd_off = pix_off + len(pix) + pad
    entries = [
        (_W, 4, 1, w),
        (_H, 4, 1, h),
        (_BPS, 3, 3, bps_off),
        (_COMP, 3, 1, 1),
        (_PHOTO, 3, 1, 2),
        (_STRIP_OFF, 4, 1, pix_off),
        (_SPP, 3, 1, 3),
        (_ROWS_PER_STRIP, 4, 1, h),
        (_STRIP_CNT, 4, 1, len(pix)),
        (_PLANAR, 3, 1, 1),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        ifd += struct.pack("<HHII", tag, typ, count, val)
    ifd += struct.pack("<I", 0)  # no next IFD
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + struct.pack("<3H", 8, 8, 8)
        + pix
        + b"\x00" * pad
        + ifd
    )
