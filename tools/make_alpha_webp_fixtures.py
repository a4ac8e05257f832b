"""Generate the committed ALPHA-WebP fixtures (VP8X + ALPH stills and
lossless RGBA/palette streams).

Foreign-encoder protocol like make_lossy_webp_fixtures: the system
libwebp encodes deterministic content; goldens are libwebp's OWN
decoded RGBA (tests/golden/webp_alpha.npz) — for lossy files the RGB
channels there go through libwebp's fancy upsampler, so the committed
golden records the ALPHA plane plus the YUV planes, and the repo's RGB
surface derives through the shared yuv_to_rgb. Lossless entries pin
full RGBA.

Content exercises every ALPH lane the encoder emits (raw + headerless
VP8L with filters) plus the VP8L paths r12 closed: pixel bundling
(palette <= 16), the 2-D distance map, and single-symbol full-form
codes.

Usage: python tools/make_alpha_webp_fixtures.py
"""
import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal import webp_native as N

ALPHA_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    os.pardir,
    "a3_fp_bigdata_spark",
    "multimodal",
    "fixtures",
    "alpha_webp",
)
GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    os.pardir,
    "tests",
    "golden",
    "webp_alpha.npz",
)


def _encode_lossless_rgba(img: np.ndarray) -> bytes:
    lib = N._lib
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(img).tobytes(),
        img.shape[1], img.shape[0], img.shape[1] * 4, ctypes.byref(out),
    )
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def source_images() -> dict[str, tuple[np.ndarray, float | None]]:
    """name -> (RGBA array, lossy quality or None for lossless)."""
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 4) % 256, (yy * 6) % 256, (xx + 2 * yy) % 256], axis=2
    ).astype(np.uint8)
    grad_a = ((xx * 255) // (w - 1)).astype(np.uint8)
    binary_a = (((xx // 8 + yy // 8) % 2) * 255).astype(np.uint8)
    # deterministic "noise" alpha without RNG: a full-range mix
    noise_a = ((xx * 37 + yy * 113 + xx * yy) % 256).astype(np.uint8)
    # lossless small-palette RGBA (pixel bundling + distance map)
    pal = np.array(
        [[10, 200, 40, 255], [230, 30, 90, 128], [60, 60, 220, 255],
         [255, 255, 0, 64]], dtype=np.uint8
    )
    pal_img = pal[((xx // 3 + yy // 5) % 4)]
    return {
        "alpha_grad_q80.webp": (np.dstack([rgb, grad_a]), 80.0),
        "alpha_binary_q60.webp": (np.dstack([rgb, binary_a]), 60.0),
        "alpha_noise_q80.webp": (np.dstack([rgb, noise_a]), 80.0),
        "lossless_rgba.webp": (np.dstack([rgb, grad_a]), None),
        "lossless_pal4.webp": (pal_img, None),
    }


if __name__ == "__main__":
    from a3_fp_bigdata_spark.multimodal.webp_codec import (
        _walk_chunks,
        decode_webp_rgba,
    )
    from a3_fp_bigdata_spark.multimodal.vp8_codec import decode_vp8_yuv

    os.makedirs(ALPHA_FIXTURE_DIR, exist_ok=True)
    goldens = {}
    for name, (img, q) in source_images().items():
        if q is None:
            data = _encode_lossless_rgba(img)
        else:
            data = N.encode_rgba(img, q)
        with open(os.path.join(ALPHA_FIXTURE_DIR, name), "wb") as fh:
            fh.write(data)
        gold_rgba = N.decode_rgba(data)
        goldens[name + "/A"] = gold_rgba[..., 3]
        tags = [t for t, _ in _walk_chunks(data)]
        if b"VP8 " in tags:
            Y, U, V = N.decode_yuv(data)
            goldens[name + "/Y"] = Y
            goldens[name + "/U"] = U
            goldens[name + "/V"] = V
        else:
            goldens[name + "/RGBA"] = gold_rgba
        # sanity: pure decoder agrees at write time
        mine = decode_webp_rgba(data)
        assert np.array_equal(mine[..., 3], gold_rgba[..., 3]), name
        if b"VP8 " in tags:
            frame = [b for t, b in _walk_chunks(data) if t == b"VP8 "][0]
            Yp, Up, Vp = decode_vp8_yuv(frame)
            assert (
                np.array_equal(Yp, goldens[name + "/Y"])
                and np.array_equal(Up, goldens[name + "/U"])
                and np.array_equal(Vp, goldens[name + "/V"])
            ), name
        else:
            assert np.array_equal(mine, gold_rgba), name
        print(f"wrote {name} ({len(data)} bytes) chunks={tags} — pure decoder bit-exact")
    np.savez_compressed(GOLDEN_PATH, **goldens)
    print(f"goldens -> {GOLDEN_PATH}")
