"""Generate the committed palette-PNG fixture (color type 3).

The original five icon fixtures are filter-0 RGB PNGs emitted by
png_codec.encode_png; this script adds the PALETTE rung —
icon_palette.png, a color-type-3 image with a 16-entry PLTE — so the
decode path real icon sets actually use (indexed color) is exercised
by a committed artifact, not only by in-memory round-trips.

Deterministic by construction (no RNG): palette entry i is
(i*16+7, 250-i*13, (i*29) % 256) and the 28x20 index plane is
(x + 2*y) % 16. Prints the expected mm4 feature tuple to pin in
tests/test_multimodal.py.

Usage: python tools/make_png_fixtures.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal.binary_files import FIXTURE_DIR
from a3_fp_bigdata_spark.multimodal.png_codec import (
    decode_png,
    encode_palette_png,
)

W, H, N = 28, 20, 16

palette = np.stack(
    [
        np.array([i * 16 + 7 for i in range(N)], dtype=np.uint8),
        np.array([250 - i * 13 for i in range(N)], dtype=np.uint8),
        np.array([(i * 29) % 256 for i in range(N)], dtype=np.uint8),
    ],
    axis=1,
)
xs, ys = np.meshgrid(np.arange(W), np.arange(H))
idx = ((xs + 2 * ys) % N).astype(np.uint8)

payload = encode_palette_png(idx, palette)
out = os.path.join(FIXTURE_DIR, "icon_palette.png")
with open(out, "wb") as fh:
    fh.write(payload)

rgb = decode_png(payload)
assert (rgb == palette[idx]).all()
means = [round(float(rgb[:, :, c].mean()), 4) for c in range(3)]
print(f"wrote {out} ({len(payload)} bytes)")
print(f"pinned features: ({means[0]}, {means[1]}, {means[2]}, {W}, {H})")
