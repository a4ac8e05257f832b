"""Minimal PNG codec — pure stdlib+numpy, no image libraries.

The container ships no PIL, but PNG baseline (8-bit, non-interlaced)
is decodable with zlib + the five scanline filters from the public PNG
spec (RFC 2083). This gives the binaryFile image source a REAL decode
path for the committed fixture set (reference feature_extractor.py:20
does ``Image.open(path).convert('RGB')``; when PIL exists it is still
preferred — see images.decode_image).

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette,
8-bit indices via PLTE), 4 (gray+alpha), 6 (RGBA), interlace 0 AND 1
(Adam7: seven sub-image passes, each its own filtered scanline stream,
scattered back on the spec's 8x8 grid — r11, closing the named
image-format gap). That covers everything the encoder here emits and
the overwhelming majority of real-world icons (palette PNG is the
dominant icon encoding — Icons-50-style sets are mostly type 3);
anything else raises ValueError rather than guessing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # type 3: 1 index byte/px

#: Adam7 pass grid per the PNG spec §8.2: (x_start, y_start, x_step,
#: y_step) for each of the seven passes. A pass whose sub-image is
#: empty for the actual dimensions contributes NO bytes (not even
#: filter bytes).
ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8 RGB (alpha dropped, gray broadcast)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    try:
        return _decode_png_body(payload)
    except (struct.error, zlib.error, IndexError) as e:
        # truncated/corrupt chunks surface as the documented ValueError,
        # not as raw worker-side struct/zlib errors
        raise ValueError(f"corrupt PNG: {e}") from e


def unfilter_scanlines(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Decompressed PNG scanline stream (filter byte + samples per
    row) -> (h, w*ch) uint8 sample matrix, applying the five spec
    filters. Shared by the still decoder below and the APNG frame
    decoder (apng_codec), whose fdAT streams carry the identical
    scanline encoding at per-frame dimensions."""
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline stream length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=off + 1
        ).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (int(line[i]) + int(line[i - ch])) & 0xFF
        elif ftype == 2:  # Up
            line += prev  # uint8 wraps, exactly the spec's mod-256
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                line[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = int(line[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                line[i] = (
                    int(line[i]) + _paeth(left, int(prev[i]), ul)
                ) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = line
        prev = line
    return out


def _decode_png_body(payload: bytes) -> np.ndarray:
    pos, idat = 8, []
    w = h = depth = ctype = interlace = palette = None
    while pos + 8 <= len(payload):
        (length,), ctype_b = (
            struct.unpack(">I", payload[pos : pos + 4]),
            payload[pos + 4 : pos + 8],
        )
        data = payload[pos + 8 : pos + 8 + length]
        if ctype_b == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype_b == b"PLTE":
            if len(data) % 3 or not 3 <= len(data) <= 768:
                raise ValueError(f"bad PLTE length {len(data)}")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype_b == b"IDAT":
            idat.append(data)
        elif ctype_b == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if w is None:
        raise ValueError("no IHDR chunk")
    if depth != 8 or interlace not in (0, 1) or ctype not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={ctype}, "
            f"interlace={interlace}); codec handles 8-bit, "
            "interlace 0 or 1 (Adam7)"
        )
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    try:
        if interlace == 0:
            arr = unfilter_scanlines(raw, h, w, ch).reshape(h, w, ch)
        else:
            arr = _deinterlace_adam7(raw, h, w, ch)
    except ValueError as e:
        raise ValueError(f"IDAT {e}") from e
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError(
                f"palette index {int(idx.max())} >= PLTE entries "
                f"{len(palette)}"
            )
        return palette[idx]  # HxW lookup -> HxWx3 RGB
    if ctype == 0:
        return np.repeat(arr, 3, axis=2)
    if ctype == 4:
        return np.repeat(arr[:, :, :1], 3, axis=2)
    return arr[:, :, :3]  # RGB / RGBA sans alpha


def _deinterlace_adam7(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Adam7 stream -> (h, w, ch) uint8: the decompressed bytes are
    seven back-to-back scanline streams (one per non-empty pass), each
    filtered INDEPENDENTLY at its own sub-image dimensions, scattered
    back onto the 8x8 grid by (start, step) strided assignment."""
    arr = np.zeros((h, w, ch), dtype=np.uint8)
    off = 0
    for x0, y0, xs, ys in ADAM7_PASSES:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        nbytes = ph * (pw * ch + 1)
        sub = unfilter_scanlines(raw[off : off + nbytes], ph, pw, ch)
        off += nbytes
        arr[y0::ys, x0::xs] = sub.reshape(ph, pw, ch)
    if off != len(raw):
        raise ValueError(
            f"interlaced stream length mismatch ({len(raw) - off} "
            "trailing bytes)"
        )
    return arr


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_palette_png(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """HxW uint8 index array + Nx3 uint8 palette -> color-type-3 PNG.
    Fixture builder for the palette decode path;
    decode_png(encode_palette_png(i, p)) == p[i] exactly."""
    if idx.ndim != 2 or idx.dtype != np.uint8:
        raise ValueError("encode_palette_png expects HxW uint8 indices")
    if (
        palette.ndim != 2 or palette.shape[1] != 3
        or palette.dtype != np.uint8 or not 1 <= len(palette) <= 256
    ):
        raise ValueError("palette must be Nx3 uint8, 1 <= N <= 256")
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("index out of palette range")
    h, w = idx.shape
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def encode_png(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> PNG bytes (filter 0 scanlines). Used to build
    test fixtures; decode_png(encode_png(a)) == a exactly."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )
