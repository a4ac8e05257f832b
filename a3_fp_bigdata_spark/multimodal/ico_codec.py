"""Pure-python ICO (favicon) codec — no image libraries.

Sixth real image container for the multimodal tier (PNG, JPEG, GIF,
BMP, TIFF, WebP-lossless): every site ships a favicon, so web-crawl
image corpora carry ICO at high frequency. The container is a
directory of sub-images, each payload either a PNG stream (modern
256px entries) or a headerless Windows DIB whose height field covers
BOTH the XOR (color) and AND (1-bit transparency) masks — decode
composes the repo's existing png_codec / bmp_codec cores instead of
re-implementing pixels.

- decode: picks the LARGEST entry (ties: highest bit depth) — PIL's
  default for ``Image.open(ico)`` — and returns HxWx3 RGB. Alpha (32bpp
  DIB alpha or the AND mask) is dropped, matching the engine's PIL
  parity contract (``convert('RGB')`` discards alpha; images.py's
  decode_image docstring).
- encode (fixture builder): wraps pre-encoded PNG payloads or RGB
  arrays (as 32bpp DIBs with an empty AND mask) into a valid ICONDIR.

CUR files (type 2, cursors) raise NotImplementedError loudly — the
same honest-ceiling contract as the other codecs (reference
feature_extractor.py:20 accepts anything PIL opens; this module covers
the favicon slice without PIL).
"""

from __future__ import annotations

import struct

import numpy as np

from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _dib_to_bmp(sub: bytes) -> bytes:
    """ICO sub-image DIB (headerless, doubled height) -> a complete BMP
    file decode_bmp accepts: halve the height back to the XOR mask's
    rows and prepend a BITMAPFILEHEADER whose pixel offset skips the
    DIB header + palette. The AND mask trails the XOR rows and is
    simply not addressed by the corrected height."""
    if len(sub) < 40:
        raise ValueError("ICO DIB truncated before BITMAPINFOHEADER")
    (hdr_size,) = struct.unpack_from("<I", sub, 0)
    if hdr_size < 40:
        raise NotImplementedError(
            f"ICO DIB header size {hdr_size} (BITMAPINFOHEADER+ only)"
        )
    width, height2 = struct.unpack_from("<ii", sub, 4)
    if height2 <= 0 or height2 % 2:
        raise ValueError(f"ICO DIB height {height2} not a positive double")
    _, bpp = struct.unpack_from("<HH", sub, 12)
    (colors_used,) = struct.unpack_from("<I", sub, 32)
    n_colors = 0
    if bpp <= 8:
        n_colors = colors_used or (1 << bpp)
    fixed = bytearray(sub)
    struct.pack_into("<i", fixed, 8, height2 // 2)
    pix_off = 14 + hdr_size + 4 * n_colors
    file_hdr = struct.pack(
        "<2sIHHI", b"BM", 14 + len(fixed), 0, 0, pix_off
    )
    return file_hdr + bytes(fixed)


def decode_ico(payload: bytes) -> np.ndarray:
    """ICO bytes -> HxWx3 uint8 RGB of the largest sub-image."""
    if len(payload) < 6:
        raise ValueError("not an ICO: too short for ICONDIR")
    reserved, img_type, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or img_type not in (1, 2):
        raise ValueError("not an ICO: bad ICONDIR signature")
    if img_type == 2:
        raise NotImplementedError("CUR (cursor) files not supported")
    if count == 0:
        raise ValueError("ICO with zero images")
    entries = []
    for i in range(count):
        base = 6 + 16 * i
        if base + 16 > len(payload):
            raise ValueError("truncated ICONDIR entry table")
        w, h, _ncol, _rsv, _planes, bpp, size, off = struct.unpack_from(
            "<BBBBHHII", payload, base
        )
        w, h = w or 256, h or 256  # 0 encodes 256
        entries.append((w * h, bpp, off, size))
    # largest area wins, bit depth breaks ties (PIL's size ordering)
    _, _, off, size = max(entries)
    if off + size > len(payload):
        raise ValueError("ICO entry payload out of bounds")
    sub = payload[off : off + size]
    if sub[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        from a3_fp_bigdata_spark.multimodal.png_codec import decode_png

        return decode_png(sub)
    from a3_fp_bigdata_spark.multimodal.bmp_codec import decode_bmp

    return decode_bmp(_dib_to_bmp(sub))


def _rgb_to_ico_dib(arr: np.ndarray) -> tuple[bytes, int, int, int]:
    """HxWx3 uint8 -> (32bpp DIB payload with opaque alpha + empty AND
    mask, w, h, bpp) for encode_ico."""
    h, w = arr.shape[:2]
    bgra = np.empty((h, w, 4), dtype=np.uint8)
    bgra[:, :, 0] = arr[:, :, 2]
    bgra[:, :, 1] = arr[:, :, 1]
    bgra[:, :, 2] = arr[:, :, 0]
    bgra[:, :, 3] = 255
    xor_rows = bgra[::-1].tobytes()  # bottom-up, 4-byte aligned already
    and_row_bytes = ((w + 31) // 32) * 4
    and_mask = b"\x00" * (and_row_bytes * h)  # all visible
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0,
        len(xor_rows) + len(and_mask), 0, 0, 0, 0,
    )
    return hdr + xor_rows + and_mask, w, h, 32


def encode_ico(images: list) -> bytes:
    """Fixture builder: each item is either PNG bytes (stored verbatim,
    the modern favicon layout) or an HxWx3 uint8 array (stored as a
    32bpp DIB). Dimensions up to 256 (ICO's byte-sized fields)."""
    dirs, payloads = [], []
    off = 6 + 16 * len(images)
    for img in images:
        if isinstance(img, (bytes, bytearray)):
            from a3_fp_bigdata_spark.multimodal.png_codec import decode_png

            arr = decode_png(bytes(img))
            payload, w, h, bpp = bytes(img), arr.shape[1], arr.shape[0], 32
        else:
            payload, w, h, bpp = _rgb_to_ico_dib(np.asarray(img))
        if w > 256 or h > 256:
            raise ValueError(f"ICO sub-image {w}x{h} exceeds 256")
        dirs.append(
            struct.pack(
                "<BBBBHHII", w % 256, h % 256, 0, 0, 1, bpp,
                len(payload), off,
            )
        )
        payloads.append(payload)
        off += len(payload)
    return (
        struct.pack("<HHH", 0, 1, len(images))
        + b"".join(dirs)
        + b"".join(payloads)
    )
