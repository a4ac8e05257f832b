"""Minimal APNG decoder — pure stdlib+numpy, no image libraries.

APNG (the PNG third-edition animation extension; originally the
Mozilla spec) stores animation control in three ancillary chunks a
plain PNG decoder ignores:

- ``acTL`` (before IDAT): num_frames, num_plays;
- ``fcTL`` per frame: sequence number, sub-rectangle (w, h, x, y),
  delay fraction, ``dispose_op`` (0 NONE / 1 BACKGROUND / 2 PREVIOUS)
  and ``blend_op`` (0 SOURCE / 1 OVER);
- ``fdAT``: sequence number + an IDAT-equivalent zlib stream for
  every frame after the first (frame 0 reuses IDAT when its fcTL
  precedes IDAT).

This decoder parses the control chunks, decodes each frame's
scanline stream with the SAME unfilter machinery as the still
decoder (png_codec.unfilter_scanlines — fdAT bodies are byte-for-byte
IDAT streams at frame dimensions), and composites sub-rectangles
onto an RGBA canvas per the spec's dispose/blend state machine.
Output frames are full-canvas RGB composites over opaque black
(rgb * alpha / 255, float64 then rint), the analog of
gif_codec.decode_gif_frames' viewer semantics.

Pixel support matches png_codec: bit depth 8, non-interlaced, color
types 0/2/3/4/6, plus palette-alpha via tRNS for type 3 (the only
tRNS form an animated icon corpus actually uses — type 0/2 color-key
transparency raises loudly instead of guessing).

Reference parity target: the reference's extractor accepts anything
PIL opens (feature_extractor.py:20), and PIL's ApngImagePlugin
iterates composited frames the same way; the committed fixtures pin
this decoder against an independent numpy compositor
(tools/make_apng_fixtures.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from a3_fp_bigdata_spark.multimodal.png_codec import (
    _CHANNELS,
    _SIGNATURE,
    unfilter_scanlines,
)
from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path

APNG_DISPOSE_NONE = 0
APNG_DISPOSE_BACKGROUND = 1
APNG_DISPOSE_PREVIOUS = 2
APNG_BLEND_SOURCE = 0
APNG_BLEND_OVER = 1


def is_apng(payload: bytes) -> bool:
    """True iff the bytes are a PNG containing an acTL chunk before
    IDAT (the spec's animation marker)."""
    if payload[:8] != _SIGNATURE:
        return False
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"acTL":
            return True
        if ctype in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


def _to_rgba(
    samples: np.ndarray,
    w: int,
    h: int,
    ctype: int,
    palette: np.ndarray | None,
    trns: bytes | None,
) -> np.ndarray:
    """(h, w*ch) unfiltered samples -> HxWx4 uint8 RGBA."""
    ch = _CHANNELS[ctype]
    arr = samples.reshape(h, w, ch)
    out = np.empty((h, w, 4), dtype=np.uint8)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette frame without PLTE chunk")
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index beyond PLTE entries")
        out[:, :, :3] = palette[idx]
        alpha = np.full(len(palette), 255, dtype=np.uint8)
        if trns is not None:
            if len(trns) > len(palette):
                raise ValueError("tRNS longer than palette")
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        out[:, :, 3] = alpha[idx]
        return out
    if trns is not None:
        # gray/truecolor color-key transparency: rare in animated
        # corpora; refuse loudly rather than mis-compositing
        raise ValueError(
            f"tRNS with color type {ctype} not supported (palette only)"
        )
    if ctype == 0:
        out[:, :, :3] = np.repeat(arr, 3, axis=2)
        out[:, :, 3] = 255
    elif ctype == 4:
        out[:, :, :3] = np.repeat(arr[:, :, :1], 3, axis=2)
        out[:, :, 3] = arr[:, :, 1]
    elif ctype == 2:
        out[:, :, :3] = arr
        out[:, :, 3] = 255
    else:  # ctype == 6
        out[...] = arr
    return out


def blend_over(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """APNG blend_op OVER on non-premultiplied uint8 RGBA: the spec's
    source-over formula evaluated in float64 and rounded with rint —
    deterministic IEEE arithmetic, so the fixture generator's
    independent compositor reproduces it bit-for-bit."""
    sa = src[:, :, 3:4].astype(np.float64) / 255.0
    da = dst[:, :, 3:4].astype(np.float64) / 255.0
    oa = sa + da * (1.0 - sa)
    num = (
        src[:, :, :3].astype(np.float64) * sa
        + dst[:, :, :3].astype(np.float64) * da * (1.0 - sa)
    )
    rgb = np.where(oa > 0, num / np.where(oa > 0, oa, 1.0), 0.0)
    out = np.empty_like(dst)
    out[:, :, :3] = np.rint(rgb).astype(np.uint8)
    out[:, :, 3] = np.rint(oa[:, :, 0] * 255.0).astype(np.uint8)
    return out


def flatten_rgba(canvas: np.ndarray) -> np.ndarray:
    """RGBA canvas -> RGB over opaque black (viewer semantics; the
    GIF decoder's zero-filled initial canvas is the same choice)."""
    a = canvas[:, :, 3:4].astype(np.float64) / 255.0
    return np.rint(canvas[:, :, :3].astype(np.float64) * a).astype(
        np.uint8
    )


def decode_apng_frames(payload: bytes) -> list[np.ndarray]:
    """APNG bytes -> list of composited HxWx3 uint8 RGB frames."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    try:
        return _decode_apng_body(payload)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"corrupt APNG: {e}") from e


def _decode_apng_body(payload: bytes) -> list[np.ndarray]:
    pos = 8
    w = h = depth = ctype = interlace = None
    palette = trns = None
    n_frames_declared = None
    #: frames under construction: (fctl, [zlib byte chunks])
    frames: list[tuple[dict, list[bytes]]] = []
    idat: list[bytes] = []
    idat_fctl: dict | None = None
    seq_expected = 0
    saw_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype_b = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype_b == b"IHDR":
            w, h, depth, ctype, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype_b == b"acTL":
            n_frames_declared, _plays = struct.unpack(">II", data)
        elif ctype_b == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype_b == b"tRNS":
            trns = data
        elif ctype_b == b"fcTL":
            (seq, fw, fh, fx, fy, _dn, _dd, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", data
            )
            if seq != seq_expected:
                raise ValueError(
                    f"fcTL sequence {seq}, expected {seq_expected}"
                )
            seq_expected += 1
            fctl = {
                "w": fw, "h": fh, "x": fx, "y": fy,
                "dispose": dispose, "blend": blend,
            }
            if not idat and idat_fctl is None:
                idat_fctl = fctl  # IDAT is frame 0
            elif not idat:
                # two fcTL chunks before any IDAT: malformed — refuse
                # loudly rather than silently treating the second as a
                # post-IDAT animation frame fed by later fdAT chunks
                raise ValueError("second fcTL before IDAT")
            else:
                frames.append((fctl, []))
        elif ctype_b == b"IDAT":
            idat.append(data)
        elif ctype_b == b"fdAT":
            (seq,) = struct.unpack(">I", data[:4])
            if seq != seq_expected:
                raise ValueError(
                    f"fdAT sequence {seq}, expected {seq_expected}"
                )
            seq_expected += 1
            if not frames:
                raise ValueError("fdAT before any post-IDAT fcTL")
            frames[-1][1].append(data[4:])
        elif ctype_b == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if w is None:
        raise ValueError("no IHDR chunk")
    if not saw_iend:
        raise ValueError("truncated APNG: missing IEND")
    if n_frames_declared is None:
        raise ValueError("not an APNG (no acTL chunk)")
    if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
        raise ValueError(
            f"unsupported APNG (depth={depth}, color={ctype}, "
            f"interlace={interlace}); codec handles 8-bit non-interlaced"
        )
    # assemble the frame list in decode order
    todo: list[tuple[dict, bytes]] = []
    if idat_fctl is not None:
        if (
            idat_fctl["w"] != w or idat_fctl["h"] != h
            or idat_fctl["x"] or idat_fctl["y"]
        ):
            raise ValueError("frame 0 must cover the full canvas")
        todo.append((idat_fctl, b"".join(idat)))
    for fctl, chunks in frames:
        if not chunks:
            raise ValueError("fcTL without frame data")
        todo.append((fctl, b"".join(chunks)))
    if len(todo) != n_frames_declared:
        raise ValueError(
            f"acTL declares {n_frames_declared} frames, found {len(todo)}"
        )
    if not todo:
        raise ValueError("APNG contains no animation frames")
    ch = _CHANNELS[ctype]
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    out: list[np.ndarray] = []
    for i, (fctl, z) in enumerate(todo):
        fw, fh, fx, fy = fctl["w"], fctl["h"], fctl["x"], fctl["y"]
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("frame rectangle outside canvas")
        samples = unfilter_scanlines(zlib.decompress(z), fh, fw, ch)
        rgba = _to_rgba(samples, fw, fh, ctype, palette, trns)
        dispose = fctl["dispose"]
        if i == 0 and dispose == APNG_DISPOSE_PREVIOUS:
            dispose = APNG_DISPOSE_BACKGROUND  # spec: frame-0 fallback
        saved = (
            canvas[fy : fy + fh, fx : fx + fw].copy()
            if dispose == APNG_DISPOSE_PREVIOUS
            else None
        )
        region = canvas[fy : fy + fh, fx : fx + fw]
        if fctl["blend"] == APNG_BLEND_SOURCE:
            region[...] = rgba
        elif fctl["blend"] == APNG_BLEND_OVER:
            region[...] = blend_over(region, rgba)
        else:
            raise ValueError(f"bad blend_op {fctl['blend']}")
        out.append(flatten_rgba(canvas))
        if dispose == APNG_DISPOSE_BACKGROUND:
            canvas[fy : fy + fh, fx : fx + fw] = 0
        elif dispose == APNG_DISPOSE_PREVIOUS:
            canvas[fy : fy + fh, fx : fx + fw] = saved
        elif dispose != APNG_DISPOSE_NONE:
            raise ValueError(f"bad dispose_op {dispose}")
    return out


def decode_apng(payload: bytes) -> np.ndarray:
    """APNG bytes -> first composited frame as HxWx3 uint8 RGB."""
    return decode_apng_frames(payload)[0]
