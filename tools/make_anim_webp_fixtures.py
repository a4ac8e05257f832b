"""Generate committed ANIMATED-WebP fixtures + independent ground truth.

Container assembly is done HERE byte-by-byte (this repo has no WebP
muxer, so the VP8X/ANIM/ANMF layout is foreign to the codebase by
construction); per-frame BITSTREAMS come from the system libwebp
(lossless RGBA, lossy RGB, lossy RGBA-with-ALPH), extracted from still
encodes and re-wrapped as ANMF frame data — so frame pixels are pinned
by a genuinely foreign encoder exactly like the lossy/alpha still
corpora.

Ground-truth composites come from an INDEPENDENT per-pixel scalar
compositor written here (no shared code with webp_codec/apng_codec,
which are deliberately not imported for the math): canvas held as
python floats quantized to uint8 between frames, the container spec's
non-premultiplied source-over evaluated per pixel, dispose-to-
background clearing to transparent (the WebPAnimDecoder/browser
convention the decoder documents). Per-frame source pixels for the
truth side are libwebp's own decodes: RGBA straight from
WebPDecodeRGBA for lossless; for lossy frames the ALPHA channel from
WebPDecodeRGBA plus luma/chroma from WebPDecodeYUV converted through
the repo's pinned yuv_to_rgb (the one shared conversion on every
path — bit-exact to the pure decoder by the r12 VP8 goldens).

The test (tests/test_multimodal.py) decodes the committed bytes with
the repo decoder and requires ARRAY EQUALITY against the committed
expected frames (tests/golden/anim_webp_frames.npz).

Usage: python tools/make_anim_webp_fixtures.py   (idempotent)
"""
from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal import webp_native as N
from tools.make_alpha_webp_fixtures import _encode_lossless_rgba

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX_DIR = os.path.join(
    REPO, "a3_fp_bigdata_spark", "multimodal", "fixtures", "anim_webp"
)
GOLDEN = os.path.join(REPO, "tests", "golden", "anim_webp_frames.npz")


# ---------------------------------------------------------------------------
# container assembly (the foreign-by-construction muxer)
# ---------------------------------------------------------------------------


def chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def u24(v: int) -> bytes:
    return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])


def extract_bitstream_chunks(still: bytes) -> bytes:
    """Pull the ALPH (if any) + VP8/VP8L chunks out of a still encode,
    re-serialized with their own headers — exactly the ANMF frame-data
    layout."""
    out = b""
    pos = 12
    while pos + 8 <= len(still):
        tag = still[pos : pos + 4]
        (size,) = struct.unpack("<I", still[pos + 4 : pos + 8])
        body = still[pos + 8 : pos + 8 + size]
        if tag in (b"ALPH", b"VP8 ", b"VP8L"):
            out += chunk(tag, body)
        pos += 8 + size + (size & 1)
    assert out, "still encode had no bitstream chunk"
    return out


def anmf(fx: int, fy: int, fw: int, fh: int, dur_ms: int,
         no_blend: bool, dispose_bg: bool, frame_data: bytes) -> bytes:
    assert fx % 2 == 0 and fy % 2 == 0, "ANMF offsets are stored /2"
    flags = (0x02 if no_blend else 0) | (0x01 if dispose_bg else 0)
    body = (
        u24(fx // 2) + u24(fy // 2) + u24(fw - 1) + u24(fh - 1)
        + u24(dur_ms) + bytes([flags]) + frame_data
    )
    return chunk(b"ANMF", body)


def animated_container(canvas_w: int, canvas_h: int, frames: list[bytes],
                       has_alpha: bool, bg_bgra: bytes = b"\x00" * 4,
                       loops: int = 0) -> bytes:
    flags = 0x02 | (0x10 if has_alpha else 0)
    vp8x = bytes([flags]) + b"\x00" * 3 + u24(canvas_w - 1) + u24(canvas_h - 1)
    anim = bg_bgra + struct.pack("<H", loops)
    payload = chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim) + b"".join(frames)
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


# ---------------------------------------------------------------------------
# foreign per-frame truth pixels (libwebp decode of the still encode)
# ---------------------------------------------------------------------------


def truth_rgba(still: bytes) -> np.ndarray:
    """libwebp's own decode of a still encode, with lossy color routed
    through the ONE shared yuv_to_rgb (see module docstring)."""
    rgba = N.decode_rgba(still)
    pos, lossy = 12, False
    while pos + 8 <= len(still):
        tag = still[pos : pos + 4]
        (size,) = struct.unpack("<I", still[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            lossy = True
        pos += 8 + size + (size & 1)
    if lossy:
        from a3_fp_bigdata_spark.multimodal.vp8_codec import yuv_to_rgb

        rgb = yuv_to_rgb(*N.decode_yuv(still))
        return np.dstack([rgb, rgba[..., 3]])
    return rgba


# ---------------------------------------------------------------------------
# the INDEPENDENT scalar compositor (ground truth; no repo imports)
# ---------------------------------------------------------------------------


def scalar_compose(canvas_w: int, canvas_h: int, placed) -> list[np.ndarray]:
    """placed: list of (fx, fy, rgba_array, no_blend, dispose_bg).
    Returns one flattened HxWx3 RGB frame per placement, composited
    per-pixel in plain python floats."""
    canvas = [[[0, 0, 0, 0] for _ in range(canvas_w)] for _ in range(canvas_h)]
    out = []
    for fx, fy, rgba, no_blend, dispose_bg in placed:
        fh, fw = rgba.shape[:2]
        for y in range(fh):
            for x in range(fw):
                sr, sg, sb, sa8 = (int(v) for v in rgba[y, x])
                cy, cx = fy + y, fx + x
                if no_blend:
                    canvas[cy][cx] = [sr, sg, sb, sa8]
                    continue
                dr, dg, db, da8 = canvas[cy][cx]
                sa = sa8 / 255.0
                da = da8 / 255.0
                oa = sa + da * (1.0 - sa)
                if oa > 0:
                    px = [
                        int(np.rint((c_s * sa + c_d * da * (1.0 - sa)) / oa))
                        for c_s, c_d in ((sr, dr), (sg, dg), (sb, db))
                    ]
                else:
                    px = [0, 0, 0]
                canvas[cy][cx] = px + [int(np.rint(oa * 255.0))]
        # snapshot: flatten over opaque black
        frame = np.zeros((canvas_h, canvas_w, 3), dtype=np.uint8)
        for y in range(canvas_h):
            for x in range(canvas_w):
                r, g, b, a8 = canvas[y][x]
                a = a8 / 255.0
                frame[y, x] = [
                    int(np.rint(r * a)), int(np.rint(g * a)),
                    int(np.rint(b * a)),
                ]
        out.append(frame)
        if dispose_bg:
            for y in range(fh):
                for x in range(fw):
                    canvas[fy + y][fx + x] = [0, 0, 0, 0]
    return out


# ---------------------------------------------------------------------------
# fixture definitions
# ---------------------------------------------------------------------------


def grad_rgb(h, w, p):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * (3 + p)) % 256, (yy * (5 + p)) % 256, ((xx + yy) * (2 + p)) % 256],
        axis=2,
    ).astype(np.uint8)


def build_fixtures():
    fixtures = {}

    # 1. three full-canvas LOSSLESS frames, overwrite, no disposal
    w, h = 44, 36
    stills = [
        _encode_lossless_rgba(
            np.dstack([grad_rgb(h, w, p), np.full((h, w), 255, np.uint8)])
        )
        for p in range(3)
    ]
    frames = [
        anmf(0, 0, w, h, 40, True, False, extract_bitstream_chunks(s))
        for s in stills
    ]
    placed = [(0, 0, truth_rgba(s), True, False) for s in stills]
    fixtures["anim_lossless_full.webp"] = (
        animated_container(w, h, frames, True), w, h, placed
    )

    # 2. opaque base + two SEMI-TRANSPARENT lossless sub-rects, BLENDED
    w, h = 48, 40
    base = _encode_lossless_rgba(
        np.dstack([grad_rgb(h, w, 1), np.full((h, w), 255, np.uint8)])
    )
    yy, xx = np.mgrid[0:16, 0:20]
    sub1 = np.dstack([
        grad_rgb(16, 20, 7),
        (40 + (xx * 9 + yy * 5) % 200).astype(np.uint8),  # fractional alpha
    ])
    sub2 = np.dstack([
        grad_rgb(12, 16, 11),
        (((xx[:12, :16] // 4 + yy[:12, :16] // 4) % 2) * 255).astype(np.uint8),
    ])
    s1, s2 = _encode_lossless_rgba(sub1), _encode_lossless_rgba(sub2)
    frames = [
        anmf(0, 0, w, h, 50, True, False, extract_bitstream_chunks(base)),
        anmf(8, 6, 20, 16, 50, False, False, extract_bitstream_chunks(s1)),
        anmf(24, 20, 16, 12, 50, False, False, extract_bitstream_chunks(s2)),
    ]
    placed = [
        (0, 0, truth_rgba(base), True, False),
        (8, 6, truth_rgba(s1), False, False),
        (24, 20, truth_rgba(s2), False, False),
    ]
    fixtures["anim_subrect_blend.webp"] = (
        animated_container(w, h, frames, True), w, h, placed
    )

    # 3. DISPOSE-TO-BACKGROUND: overwritten sub-rect cleared after use
    w, h = 40, 32
    base = _encode_lossless_rgba(
        np.dstack([grad_rgb(h, w, 2), np.full((h, w), 255, np.uint8)])
    )
    boxa = _encode_lossless_rgba(
        np.dstack([grad_rgb(12, 12, 9), np.full((12, 12), 255, np.uint8)])
    )
    yy, xx = np.mgrid[0:10, 0:14]
    boxb = np.dstack([
        grad_rgb(10, 14, 4),
        (128 + (xx * 3 + yy * 7) % 100).astype(np.uint8),
    ])
    sb = _encode_lossless_rgba(boxb)
    frames = [
        anmf(0, 0, w, h, 60, True, False, extract_bitstream_chunks(base)),
        anmf(4, 4, 12, 12, 60, True, True, extract_bitstream_chunks(boxa)),
        anmf(10, 8, 14, 10, 60, False, False, extract_bitstream_chunks(sb)),
    ]
    placed = [
        (0, 0, truth_rgba(base), True, False),
        (4, 4, truth_rgba(boxa), True, True),
        (10, 8, truth_rgba(sb), False, False),
    ]
    fixtures["anim_dispose_bg.webp"] = (
        animated_container(w, h, frames, True), w, h, placed
    )

    # 4. LOSSY VP8 frames (full canvas, overwrite) — the keyframe lane
    w, h = 48, 32
    stills = [N.encode_rgb(grad_rgb(h, w, p), q)
              for p, q in ((0, 75.0), (3, 50.0), (6, 88.0))]
    frames = [
        anmf(0, 0, w, h, 40, True, False, extract_bitstream_chunks(s))
        for s in stills
    ]
    placed = [(0, 0, truth_rgba(s), True, False) for s in stills]
    fixtures["anim_lossy_q.webp"] = (
        animated_container(w, h, frames, False), w, h, placed
    )

    # 5. MIXED: lossless base, lossy+ALPH blended sub-rect (disposed),
    #    lossy opaque overwrite
    w, h = 48, 40
    base = _encode_lossless_rgba(
        np.dstack([grad_rgb(h, w, 5), np.full((h, w), 255, np.uint8)])
    )
    yy, xx = np.mgrid[0:24, 0:32]
    lossy_alpha = np.dstack([
        grad_rgb(24, 32, 8),
        (30 + (xx * 5 + yy * 11) % 190).astype(np.uint8),
    ])
    la = N.encode_rgba(lossy_alpha, 80.0)
    assert b"ALPH" in la, "expected an ALPH chunk in the lossy-alpha encode"
    lo = N.encode_rgb(grad_rgb(16, 24, 13), 70.0)
    frames = [
        anmf(0, 0, w, h, 70, True, False, extract_bitstream_chunks(base)),
        anmf(8, 8, 32, 24, 70, False, True, extract_bitstream_chunks(la)),
        anmf(16, 12, 24, 16, 70, True, False, extract_bitstream_chunks(lo)),
    ]
    placed = [
        (0, 0, truth_rgba(base), True, False),
        (8, 8, truth_rgba(la), False, True),
        (16, 12, truth_rgba(lo), True, False),
    ]
    fixtures["anim_mixed_alpha.webp"] = (
        animated_container(w, h, frames, True), w, h, placed
    )
    return fixtures


if __name__ == "__main__":
    from a3_fp_bigdata_spark.multimodal.webp_codec import decode_webp_frames

    os.makedirs(FIX_DIR, exist_ok=True)
    goldens = {}
    for name, (data, w, h, placed) in build_fixtures().items():
        with open(os.path.join(FIX_DIR, name), "wb") as fh:
            fh.write(data)
        truth = scalar_compose(w, h, placed)
        for i, frame in enumerate(truth):
            goldens[f"{name}/frame{i}"] = frame
        mine = decode_webp_frames(data)
        assert len(mine) == len(truth), name
        for i, (m, t) in enumerate(zip(mine, truth)):
            assert np.array_equal(m, t), (name, i)
        print(f"{name}: {len(truth)} frames OK ({len(data)} bytes)")
    np.savez_compressed(GOLDEN, **goldens)
    print(f"goldens -> {GOLDEN}")
