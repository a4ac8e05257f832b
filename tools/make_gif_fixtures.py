"""Generate the committed GIF fixtures (static interlaced + animated).

Two artifacts, both deterministic by construction (no RNG):

- ``icon_spiral.gif`` — static, INTERLACED, 32-entry palette: pins the
  four-pass row reorder and palette decode on a committed file.
- ``anim_pulse.gif`` — 4-frame animation with a transparent color and
  disposal=1: frame 0 paints the full canvas, frames 1-3 each move a
  bright block across a background encoded as transparent, so the
  decoder's compositing (paint-over + keep-under-transparency) is what
  produces the pinned per-frame means.

Prints the expected mm4/mm6 feature tuples to pin in
tests/test_multimodal.py.

Usage: python tools/make_gif_fixtures.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal.binary_files import FIXTURE_DIR
from a3_fp_bigdata_spark.multimodal.gif_codec import (
    decode_gif_frames,
    encode_gif,
)

# ---- static interlaced spiral, 32 colors -------------------------------
W, H, N = 33, 26, 32
palette = np.stack(
    [
        np.array([(i * 37 + 11) % 256 for i in range(N)], dtype=np.uint8),
        np.array([(255 - i * 7) % 256 for i in range(N)], dtype=np.uint8),
        np.array([(i * i) % 256 for i in range(N)], dtype=np.uint8),
    ],
    axis=1,
)
xs, ys = np.meshgrid(np.arange(W), np.arange(H))
idx = ((xs * xs + ys * 3 + (xs * ys) // 4) % N).astype(np.uint8)
spiral = palette[idx]

payload = encode_gif([spiral], interlace=True)
out = os.path.join(FIXTURE_DIR, "icon_spiral.gif")
with open(out, "wb") as fh:
    fh.write(payload)
dec = decode_gif_frames(payload)
assert len(dec) == 1 and (dec[0] == spiral).all()
means = [round(float(spiral[:, :, c].mean()), 4) for c in range(3)]
print(f"wrote {out} ({len(payload)} bytes)")
print(f"pinned mm4 features: ({means[0]}, {means[1]}, {means[2]}, {W}, {H})")

# ---- animated pulse, transparency + disposal=1 --------------------------
AW, AH = 24, 16
BG = (40, 40, 40)
frames = []
base = np.full((AH, AW, 3), BG, np.uint8)
frames.append(base.copy())
for step in range(1, 4):
    f = frames[-1].copy()
    x = 2 + step * 5
    f[4:12, x : x + 5] = (215, 55 + 40 * step, 15)
    frames.append(f)

apayload = encode_gif(frames, transparent_color=BG, disposal=1)
aout = os.path.join(FIXTURE_DIR, "anim_pulse.gif")
with open(aout, "wb") as fh:
    fh.write(apayload)
adec = decode_gif_frames(apayload)
assert len(adec) == len(frames)
for got, want in zip(adec, frames):
    assert (got == want).all()
print(f"wrote {aout} ({len(apayload)} bytes)")
for i, f in enumerate(frames):
    m = [round(float(f[:, :, c].mean()), 4) for c in range(3)]
    print(f"pinned mm6 frame {i}: ({m[0]}, {m[1]}, {m[2]}, {AW}, {AH})")
