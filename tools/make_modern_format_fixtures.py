"""Build the committed modern-format fixture set (fixtures/modern/):
progressive JPEGs from tools/make_progressive_jpeg.py and lossless
WebPs from tools/make_vp8l.py — the mm12 binaryFile surface.

Both generators are independent of the repo decoders (their module
docstrings state the contract), and both return the EXPECTED pixels
alongside the bytes; this script writes the files and prints the
expected per-image channel means the mm12 golden test pins.

Run from the repo root: python tools/make_modern_format_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.make_progressive_jpeg import build_color420, build_gray  # noqa: E402
from tools.make_vp8l import build_palette, build_plain, build_predicted  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "a3_fp_bigdata_spark", "multimodal", "fixtures", "modern",
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    prog_gray, _, exp_gray = build_gray(restart=3)
    prog_color, _, exp_color = build_color420()
    webp_plain, exp_plain = build_plain()
    webp_pred, exp_pred = build_predicted()
    webp_pal, exp_pal = build_palette()
    files = {
        "prog_gray_rst.jpg": (prog_gray, exp_gray),
        "prog_color420.jpg": (prog_color, exp_color),
        "vp8l_plain.webp": (webp_plain, exp_plain),
        "vp8l_predicted.webp": (webp_pred, exp_pred),
        "vp8l_palette.webp": (webp_pal, exp_pal),
    }
    for name, (data, expected) in files.items():
        with open(os.path.join(OUT, name), "wb") as fh:
            fh.write(data)
        means = expected.reshape(-1, 3).astype(np.float64).mean(axis=0)
        print(
            f"{name}: {len(data)}B {expected.shape[1]}x"
            f"{expected.shape[0]} means="
            f"({means[0]:.6f}, {means[1]:.6f}, {means[2]:.6f})"
        )


def expected_features() -> dict[str, tuple]:
    """(means_rgb, width, height) per fixture file, re-derived from the
    generators — the golden the mm12 test compares Spark's decode
    against (no committed numbers to go stale)."""
    out = {}
    for name, built in (
        ("prog_gray_rst.jpg", build_gray(restart=3)[::2]),
        ("prog_color420.jpg", build_color420()[::2]),
        ("vp8l_plain.webp", build_plain()),
        ("vp8l_predicted.webp", build_predicted()),
        ("vp8l_palette.webp", build_palette()),
    ):
        data, expected = built
        means = expected.reshape(-1, 3).astype(np.float64).mean(axis=0)
        out[name] = (
            tuple(float(m) for m in means),
            expected.shape[1],
            expected.shape[0],
            data,
        )
    return out


if __name__ == "__main__":
    main()
