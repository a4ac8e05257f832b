"""Pure-python BMP (Windows DIB) codec — no image libraries.

Fourth real image container for the multimodal tier (after PNG, JPEG
baseline, GIF87a/89a): BMP is the trivial-on-purpose format training
corpora still carry (screenshots, Windows exports, dataset dumps), and
its uncompressed rows make it the cheapest honest decode. Implements
the public file format (Windows BITMAPFILEHEADER + BITMAPINFOHEADER
and the larger V4/V5 headers):

- decode: 24-bit and 32-bit BI_RGB, and 1/4/8-bit paletted images;
  bottom-up (positive height) and top-down (negative height) row
  order; 4-byte row padding.
- encode: 24-bit BI_RGB bottom-up (the universally readable baseline).

RLE4/RLE8 compression and BI_BITFIELDS masks raise NotImplementedError
loudly — the same honest-ceiling contract as images.decode_image
(reference feature_extractor.py:20 accepts anything PIL opens; this
module covers the BMP slice without PIL).
"""

from __future__ import annotations

import struct

import numpy as np

from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> HxWx3 uint8 RGB array."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(
            f"BITMAPCOREHEADER (size {hdr_size}) not supported; "
            "need BITMAPINFOHEADER (40) or larger"
        )
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    (colors_used,) = struct.unpack_from("<I", payload, 46)
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    if compression != 0:  # BI_RGB only
        raise NotImplementedError(
            f"BMP compression {compression} not supported (BI_RGB only; "
            "RLE/bitfields need PIL)"
        )
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    top_down = height < 0
    h, w = abs(height), width
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"BMP bpp {bpp} not supported")

    row_bytes = ((w * bpp + 31) // 32) * 4  # rows pad to 4 bytes
    need = pix_off + row_bytes * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: need {need}, have {len(payload)}")
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=pix_off
    ).reshape(h, row_bytes)
    if not top_down:
        raw = raw[::-1]

    if bpp in (24, 32):
        step = bpp // 8
        px = raw[:, : w * step].reshape(h, w, step)
        # stored BGR(A): reverse the first three channels
        return np.ascontiguousarray(px[:, :, 2::-1])

    # paletted: entries are BGRX quads right after the DIB header
    n_colors = colors_used or (1 << bpp)
    if n_colors > (1 << bpp):
        raise ValueError(
            f"BMP colors_used {n_colors} exceeds 2^{bpp} palette capacity"
        )
    pal_off = 14 + hdr_size
    pal = np.frombuffer(
        payload, dtype=np.uint8, count=4 * n_colors, offset=pal_off
    ).reshape(n_colors, 4)[:, 2::-1]  # BGRX -> RGB
    if bpp == 8:
        idx = raw[:, :w]
    else:
        # unpack 1/4-bit indices, most-significant bits first
        per = 8 // bpp
        shifts = np.arange(per - 1, -1, -1, dtype=np.uint8) * bpp
        mask = (1 << bpp) - 1
        expanded = (
            raw[:, :, None] >> shifts[None, None, :]
        ) & mask  # (h, row_bytes, per)
        idx = expanded.reshape(h, -1)[:, :w]
    if int(idx.max(initial=0)) >= n_colors:
        raise ValueError("BMP palette index out of range")
    return pal[idx]


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit BI_RGB bottom-up BMP bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects HxWx3 uint8")
    h, w = arr.shape[:2]
    row_bytes = ((w * 3 + 3) // 4) * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    return header + pix
