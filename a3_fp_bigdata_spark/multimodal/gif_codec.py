"""Minimal GIF codec — pure stdlib+numpy, no image libraries.

Closes the engine's last image-format gap short of WebP: the container
ships no PIL, but GIF87a/89a is decodable from the public spec (GIF89a
specification, CompuServe 1990) with nothing beyond byte plumbing and
the GIF flavor of LZW. The reference's extractor accepts anything PIL
opens (reference feature_extractor.py:20 ``Image.open(...).convert(
'RGB')``); this codec covers the GIF slice of that surface for real —
including ANIMATED GIFs, which gives ``frame_sample`` a genuine
multi-frame container format instead of only the synthetic
fixed-stride payloads.

Supported: GIF87a + GIF89a, global and local color tables, interlaced
images (the four-pass row order), multi-frame animations with graphic
control extensions — transparency and disposal methods 0/1 (leave),
2 (restore to background), 3 (restore to previous). Anything
structurally out of spec raises ValueError rather than guessing.

Scale note (same as png_codec/jpeg_codec): pure-python decode is the
FIXTURE/TEST path proving the Arrow plumbing with real bytes; a
production deployment swaps the decode interior for a native library
with zero plan changes (images.decode_image already prefers PIL).
"""

from __future__ import annotations

import struct

import numpy as np

from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable 3..12-bit codes, LSB-first bit packing)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-LZW codestream -> index bytes (exactly n_pixels of them)."""
    clear = 1 << min_code_size
    end = clear + 1
    # dict entries are bytes; codes < clear are single literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond table")
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(
            f"LZW underrun: {len(out)} of {n_pixels} pixels decoded"
        )
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Index bytes -> GIF-LZW codestream (real compression, so the
    round-trip test exercises the decoder's table growth + KwKwK)."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # widen when the JUST-ADDED code (next_code-1) first needs the
        # wider width; the decoder lags one table entry behind (the
        # KwKwK asymmetry) and widens on its own size reaching
        # 2^code_size — the off-by-one cancels and both sides switch
        # width at the same stream position
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= (1 << 12):
            emit(clear)
            table = fresh()
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container parsing
# ---------------------------------------------------------------------------


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (data, pos
    after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("sub-blocks truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        if len(chunks[-1]) != n:
            raise ValueError("sub-block truncated")
        pos += n


def _color_table(payload: bytes, pos: int, size_bits: int):
    n = 2 << size_bits  # 2^(bits+1) entries
    raw = payload[pos : pos + 3 * n]
    if len(raw) != 3 * n:
        raise ValueError("color table truncated")
    return np.frombuffer(raw, np.uint8).reshape(n, 3), pos + 3 * n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of composited HxWx3 uint8 RGB frames.

    Frames are full-canvas composites (what a viewer shows), not raw
    sub-rectangles: each image descriptor is painted onto the logical
    screen honoring transparency, then disposal decides what the NEXT
    frame starts from. The initial canvas is zero-filled (black) like
    PIL/browser compositing, so a first frame smaller than the logical
    screen is surrounded by black; disposal 2 restores its rectangle
    to the file's background COLOR (spec + PIL fill-with-background).
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    try:
        return _decode_body(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF: {e}") from e


def _decode_body(payload: bytes) -> list[np.ndarray]:
    W, H, packed, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        global_pal, pos = _color_table(payload, pos, packed & 0x07)
    if W == 0 or H == 0:
        raise ValueError("zero-sized logical screen")
    # Initial canvas: ZERO-filled (black), matching PIL / browsers,
    # which composite onto transparent-black — NOT the spec's
    # background color (a first frame smaller than the logical screen
    # therefore shows black around it, like PIL's convert('RGB')).
    # The background COLOR still exists separately: disposal method 2
    # ("restore to background color") fills the disposed rectangle
    # with it when a global table names one, per the spec and PIL's
    # fill-with-background dispose.
    canvas = np.zeros((H, W, 3), np.uint8)
    if global_pal is not None and bg_idx < len(global_pal):
        background = np.broadcast_to(global_pal[bg_idx], (H, W, 3)).copy()
    else:
        background = np.zeros((H, W, 3), np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    saw_trailer = False
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9:  # graphic control
                # data = [packed, delay_lo, delay_hi, transparent_idx]
                if len(data) < 4:
                    raise ValueError("short graphic control extension")
                gpacked = data[0]
                disposal = (gpacked >> 2) & 0x07
                transparent = data[3] if gpacked & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        # image descriptor
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            pal, pos = _color_table(payload, pos, ipacked & 0x07)
        if pal is None:
            raise ValueError("image has no color table")
        if left + w > W or top + h > H:
            raise ValueError("frame rectangle outside logical screen")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW min code size {min_code}")
        data, pos = _sub_blocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(data, min_code, w * h), np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("pixel index beyond color table")
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = pal[idx]
        if transparent is not None:
            opaque = (idx != transparent)[:, :, None]
            region[...] = np.where(opaque, rgb, region)
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + h, left : left + w] = background[
                top : top + h, left : left + w
            ]
        elif disposal == 3:
            canvas = saved  # type: ignore[assignment]
        transparent, disposal = None, 0
    if not saw_trailer:
        # a complete-looking prefix of a truncated download must not
        # silently pass as a shorter animation
        raise ValueError("truncated GIF: missing trailer")
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> first frame as HxWx3 uint8 RGB (images.decode_image
    contract, matching PIL's convert('RGB') on frame 0)."""
    return decode_gif_frames(payload)[0]


# ---------------------------------------------------------------------------
# Encoder (fixture generation + round-trip tests)
# ---------------------------------------------------------------------------


def encode_gif(
    frames: list[np.ndarray],
    *,
    interlace: bool = False,
    transparent_color: tuple[int, int, int] | None = None,
    disposal: int = 1,
) -> bytes:
    """RGB frames -> GIF89a bytes (one global palette built from the
    union of colors; > 256 distinct colors raises — fixtures are
    synthetic). With ``transparent_color``, pixels of that color are
    encoded as transparent in frames AFTER the first (frame 0 paints
    the full canvas so composites stay deterministic). Contract: a
    transparent-colored pixel in frame N>0 decodes to frame N-1's
    pixel ("unchanged"), so round-trip equality holds only for
    monotone delta-animations where that color never repaints over a
    foreground pixel — the shape GIF transparency exists for."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be HxWx3 uint8")
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0
    )
    if len(colors) > 256:
        raise ValueError("fixture encoder supports <= 256 colors")
    size_bits = max(int(np.ceil(np.log2(max(len(colors), 2)))), 1)
    pal = np.zeros((1 << size_bits, 3), np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    min_code = max(size_bits, 2)
    # honest background index: the transparent color if one was named
    # (disposal-2 restores must reveal it — a silent fallback here
    # would make a disposal-2 restore reveal the WRONG color), else
    # frame 0's top-left
    if transparent_color is not None:
        t_key = tuple(int(c) for c in np.uint8(transparent_color))
        if t_key not in lut:
            raise ValueError(
                "transparent_color does not appear in any frame; the "
                "palette is built from frame pixels, so it has no "
                "index to encode as transparent"
            )
        bg_idx = int(lut[t_key])
    else:
        bg_idx = int(lut[tuple(frames[0][0, 0])])

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), bg_idx, 0)
    out += pal.tobytes()
    if len(frames) > 1:
        # Netscape looping extension — exercises the decoder's generic
        # extension skip path
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fi, frame in enumerate(frames):
        idx = np.array(
            [lut[tuple(px)] for px in frame.reshape(-1, 3)], np.uint8
        ).reshape(h, w)
        t_idx = None
        if transparent_color is not None and fi > 0:
            t_idx = lut.get(tuple(np.uint8(transparent_color)))
        if len(frames) > 1 or t_idx is not None:
            gpacked = (disposal << 2) | (1 if t_idx is not None else 0)
            out += bytes([0x21, 0xF9, 4, gpacked, 0, 0, t_idx or 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        rows = idx
        if interlace:
            order = np.concatenate(
                [np.arange(s, h, st) for s, st in _INTERLACE_PASSES]
            )
            rows = idx[order]
        out.append(min_code)
        stream = _lzw_encode(rows.tobytes(), min_code)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
