"""Generate the committed ICO (favicon) fixtures.

Three files in multimodal/fixtures/ico/, all deterministic (no RNG),
expected pixels re-derivable at test time via expected_arrays():

- fav_png_multi.ico   — PNG-payload entries at 16/32/48 px (the modern
                        favicon layout); the LARGEST (48) must win.
- fav_dib32.ico       — one 32bpp DIB entry (alpha + empty AND mask),
                        24x24 gradient.
- fav_dib_vs_png.ico  — a small 16px DIB next to a larger 40px PNG:
                        pins that selection is by AREA, not entry
                        order or payload kind.

Usage: python tools/make_ico_fixtures.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal.ico_codec import decode_ico, encode_ico
from a3_fp_bigdata_spark.multimodal.png_codec import encode_png

ICO_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    os.pardir,
    "a3_fp_bigdata_spark",
    "multimodal",
    "fixtures",
    "ico",
)


def _grad(n: int, r0: int, g0: int, b0: int) -> np.ndarray:
    """n x n deterministic gradient: channel ramps offset per axis."""
    ys, xs = np.mgrid[0:n, 0:n]
    return np.stack(
        [
            ((r0 + 3 * xs + ys) % 256).astype(np.uint8),
            ((g0 + 2 * ys) % 256).astype(np.uint8),
            ((b0 + 5 * xs) % 256).astype(np.uint8),
        ],
        axis=2,
    )


def expected_arrays() -> dict[str, tuple[np.ndarray, bytes]]:
    """name -> (expected decoded array = the LARGEST entry's pixels,
    the exact file bytes)."""
    a16, a32, a48 = _grad(16, 10, 40, 90), _grad(32, 60, 5, 130), _grad(48, 200, 90, 20)
    png_multi = encode_ico(
        [encode_png(a16), encode_png(a32), encode_png(a48)]
    )
    d24 = _grad(24, 120, 180, 33)
    dib32 = encode_ico([d24])
    a40 = _grad(40, 77, 140, 210)
    mixed = encode_ico([_grad(16, 9, 9, 9), encode_png(a40)])
    return {
        "fav_png_multi.ico": (a48, png_multi),
        "fav_dib32.ico": (d24, dib32),
        "fav_dib_vs_png.ico": (a40, mixed),
    }


if __name__ == "__main__":
    os.makedirs(ICO_FIXTURE_DIR, exist_ok=True)
    for name, (exp, data) in expected_arrays().items():
        out = os.path.join(ICO_FIXTURE_DIR, name)
        with open(out, "wb") as fh:
            fh.write(data)
        got = decode_ico(data)
        assert np.array_equal(got, exp), name
        means = [round(float(got[:, :, c].mean()), 4) for c in range(3)]
        print(f"wrote {out} ({len(data)} bytes) means={means} dims={got.shape[:2]}")
