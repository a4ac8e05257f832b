"""Generate the committed LOSSY WebP (VP8 keyframe) fixtures.

Unlike every other fixture generator in this repo (same-author
spec-transcribed writers), the encoder here is the SYSTEM libwebp via
ctypes (webp_native) — a genuinely FOREIGN VP8 implementation — and
the committed goldens are libwebp's OWN decoded YUV planes
(tests/golden/vp8_yuv.npz). The pure-python vp8_codec must reproduce
them BIT-FOR-BIT; its RGB surface goldens are derived through the
shared yuv_to_rgb so the test pins the full decode_image path too.

Committed artifacts survive environments without libwebp: the tests
decode the committed .webp bytes against the committed goldens; an
env-gated twin re-derives the goldens from libwebp when present.

Deterministic content (no RNG): gradients, checkers, and a synthetic
photo pattern at three quality levels, odd dimensions included.

Usage: python tools/make_lossy_webp_fixtures.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal import webp_native as N

LOSSY_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    os.pardir,
    "a3_fp_bigdata_spark",
    "multimodal",
    "fixtures",
    "lossy_webp",
)
GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    os.pardir,
    "tests",
    "golden",
    "vp8_yuv.npz",
)


def _photo(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 60 * np.sin(yy / 9.0) + 40 * np.cos(xx / 13.0)).clip(0, 255)
    g = (xx * 3 + yy * 2) % 256
    b = ((xx // 8 + yy // 8) % 2) * 180 + 40
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _grad(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 5) % 256, (yy * 7) % 256, (xx + yy) % 256], axis=2
    ).astype(np.uint8)


def source_images() -> dict[str, tuple[np.ndarray, float]]:
    return {
        "lossy_photo_q75.webp": (_photo(64, 80), 75.0),
        "lossy_photo_q30.webp": (_photo(64, 80), 30.0),
        "lossy_grad_q88.webp": (_grad(32, 48), 88.0),
        "lossy_odd_q60.webp": (_photo(23, 37), 60.0),
        "lossy_checker_q50.webp": (
            (((np.add.outer(np.arange(40) // 4, np.arange(40) // 4)) % 2)
             .astype(np.uint8)[:, :, None] * 200 + 30).repeat(3, axis=2),
            50.0,
        ),
    }


if __name__ == "__main__":
    from a3_fp_bigdata_spark.multimodal.vp8_codec import decode_vp8_yuv

    os.makedirs(LOSSY_FIXTURE_DIR, exist_ok=True)
    goldens = {}
    for name, (arr, q) in source_images().items():
        data = N.encode_rgb(np.ascontiguousarray(arr), q)
        with open(os.path.join(LOSSY_FIXTURE_DIR, name), "wb") as fh:
            fh.write(data)
        Y, U, V = N.decode_yuv(data)
        goldens[name + "/Y"] = Y
        goldens[name + "/U"] = U
        goldens[name + "/V"] = V
        # sanity: the pure decoder must already agree at write time
        import struct

        pos = 12
        while True:
            tag = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if tag == b"VP8 ":
                frame = data[pos + 8 : pos + 8 + size]
                break
            pos += 8 + size + (size & 1)
        Yp, Up, Vp = decode_vp8_yuv(frame)
        assert np.array_equal(Yp, Y) and np.array_equal(Up, U) and np.array_equal(Vp, V), name
        print(f"wrote {name} ({len(data)} bytes) {arr.shape[1]}x{arr.shape[0]} q{q} — pure decoder bit-exact")
    np.savez_compressed(GOLDEN_PATH, **goldens)
    print(f"goldens -> {GOLDEN_PATH}")
