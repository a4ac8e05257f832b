"""Generate the committed image NEAR-DUP fixture set (mm7).

Ten deterministic images (no RNG beyond a fixed-seed generator) in
`multimodal/fixtures/neardup/`: six distinct base patterns plus four
PLANTED perturbed twins — the ground truth an image-dedup rung must
recover:

| twin | perturbation | why it must pair |
|---|---|---|
| nd_grad_bright.png  | +10 brightness on nd_grad (no clipping) | gradient signs survive a uniform shift |
| nd_rings_copy.gif   | SAME pixels as nd_rings.png, GIF-encoded | lossless re-encode, identical decode |
| nd_stripes_dim.png  | -12 brightness on nd_stripes | ditto bright |
| nd_waves_copy.png   | SAME pixels as nd_waves.png, new filename | exact pixel dup, different bytes/id |
| nd_blobs_lossy.jpg  | LOSSY JPEG re-encode of nd_blobs (q=85) | DCT noise flips only near-tie gradients (nonzero but small hamming — exercises the radius, not just distance 0) |

The generator VERIFIES the margins before writing anything: every
planted pair's dHash distance must be <= the engine's pairing radius
(IMG_NEARDUP_MAX_HAMMING), every non-planted pair's must exceed it by
a safety margin — so the recorded expected-pair list is derived from
the construction (planted twins), not from trusting the hash, and a
future hash change that silently weakens separation fails HERE, not
in a flaky test. Prints the pinned pair list for
tests/test_multimodal.py.

Usage: python tools/make_image_neardup_fixtures.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal.bmp_codec import decode_bmp, encode_bmp
from a3_fp_bigdata_spark.multimodal.gif_codec import encode_gif
from a3_fp_bigdata_spark.multimodal.tiff_codec import decode_tiff, encode_tiff
from a3_fp_bigdata_spark.multimodal.jpeg_codec import decode_jpeg, encode_jpeg
from a3_fp_bigdata_spark.multimodal.phash import (
    IMG_NEARDUP_MAX_HAMMING,
    NEARDUP_FIXTURE_DIR,
    dhash64,
)
from a3_fp_bigdata_spark.multimodal.png_codec import decode_png, encode_png

NEGATIVE_MARGIN = 14  # non-planted pairs must be at least this far

W, H = 48, 32
yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

# six distinct base patterns, values kept in [20, 235] so brightness
# twins never clip (clipping is what flips dHash gradient bits)
bases: dict[str, np.ndarray] = {}

g = 40 + 150 * (xx / (W - 1)) + 25 * np.sin(yy / 3.0)
bases["nd_grad"] = np.stack([g, g * 0.9 + 10, g * 0.8 + 20], -1)

r = np.sqrt((xx - W / 2) ** 2 + (yy - H / 2) ** 2)
rings = 60 + 28 * ((r // 3) % 6)
bases["nd_rings"] = np.stack([rings, 230 - rings * 0.5, rings * 0.7 + 30], -1)

stripes = 50 + 160 * (((xx + 2 * yy) // 5) % 2)
bases["nd_stripes"] = np.stack(
    [stripes, stripes * 0.6 + 30, 200 - stripes * 0.4], -1
)

blobs = 120 + 90 * np.sin(xx / 4.5) * np.cos(yy / 3.5)
bases["nd_blobs"] = np.stack([blobs, 240 - blobs * 0.8, blobs * 0.9], -1)

waves = 110 + 80 * np.sin((xx + yy) / 6.0) + 30 * np.cos(xx / 9.0)
bases["nd_waves"] = np.stack([waves * 0.8 + 20, waves, 230 - waves * 0.7], -1)

rng = np.random.default_rng(20260815)
noise = rng.integers(30, 226, (H // 4, W // 4))
noise = np.kron(noise, np.ones((4, 4)))  # blocky so pooling sees it
bases["nd_noise"] = np.stack([noise, noise[::-1, :], noise[:, ::-1]], -1)

imgs: dict[str, np.ndarray] = {
    k: np.clip(v, 0, 255).astype(np.uint8) for k, v in bases.items()
}

# planted twins (construction IS the ground truth)
imgs["nd_grad_bright"] = np.clip(
    imgs["nd_grad"].astype(np.int16) + 10, 0, 255
).astype(np.uint8)
imgs["nd_stripes_dim"] = np.clip(
    imgs["nd_stripes"].astype(np.int16) - 12, 0, 255
).astype(np.uint8)
imgs["nd_rings_copy"] = imgs["nd_rings"].copy()  # written as GIF below
imgs["nd_waves_copy"] = imgs["nd_waves"].copy()
imgs["nd_waves_bmp"] = imgs["nd_waves"].copy()  # written as BMP below
imgs["nd_noise_tiff"] = imgs["nd_noise"].copy()  # written as TIFF below
# the lossy twin: what mm7 will SEE is the decoded JPEG, so hash that
_blobs_jpeg = encode_jpeg(imgs["nd_blobs"], quality=85)
imgs["nd_blobs_lossy"] = decode_jpeg(_blobs_jpeg)

PLANTED = {
    frozenset({"nd_grad", "nd_grad_bright"}),
    frozenset({"nd_stripes", "nd_stripes_dim"}),
    frozenset({"nd_rings", "nd_rings_copy"}),
    frozenset({"nd_waves", "nd_waves_copy"}),
    frozenset({"nd_waves", "nd_waves_bmp"}),
    frozenset({"nd_waves_copy", "nd_waves_bmp"}),
    frozenset({"nd_noise", "nd_noise_tiff"}),
    frozenset({"nd_blobs", "nd_blobs_lossy"}),
}

# GIF needs <= 256 distinct colors: quantize the rings pattern (both
# the PNG base and its GIF twin share the SAME quantized pixels)
ring_q = (imgs["nd_rings"] // 16) * 16 + 8
imgs["nd_rings"] = ring_q
imgs["nd_rings_copy"] = ring_q.copy()
n_colors = len(np.unique(ring_q.reshape(-1, 3), axis=0))
assert n_colors <= 256, f"rings palette too big: {n_colors}"

# ---- margin verification BEFORE writing --------------------------------
hashes = {k: dhash64(v) for k, v in imgs.items()}
names = sorted(imgs)
violations = []
pairs_within = []
for i, a in enumerate(names):
    for b in names[i + 1 :]:
        d = bin(
            (hashes[a] & (2**64 - 1)) ^ (hashes[b] & (2**64 - 1))
        ).count("1")
        planted = frozenset({a, b}) in PLANTED
        if planted and d > IMG_NEARDUP_MAX_HAMMING:
            violations.append(f"planted pair {a}/{b} too far: {d}")
        if not planted and d < NEGATIVE_MARGIN:
            violations.append(f"negative pair {a}/{b} too close: {d}")
        if d <= IMG_NEARDUP_MAX_HAMMING:
            pairs_within.append((a, b, d))
assert not violations, "\n".join(violations)
assert {frozenset({a, b}) for a, b, _ in pairs_within} == PLANTED

# ---- write --------------------------------------------------------------
os.makedirs(NEARDUP_FIXTURE_DIR, exist_ok=True)
for name, arr in imgs.items():
    if name == "nd_noise_tiff":
        path = os.path.join(NEARDUP_FIXTURE_DIR, f"{name}.tif")
        payload = encode_tiff(arr)
        assert np.array_equal(decode_tiff(payload), arr)
    elif name == "nd_waves_bmp":
        path = os.path.join(NEARDUP_FIXTURE_DIR, f"{name}.bmp")
        payload = encode_bmp(arr)
        assert np.array_equal(decode_bmp(payload), arr)
    elif name == "nd_rings_copy":
        path = os.path.join(NEARDUP_FIXTURE_DIR, f"{name}.gif")
        payload = encode_gif([arr])
    elif name == "nd_blobs_lossy":
        path = os.path.join(NEARDUP_FIXTURE_DIR, f"{name}.jpg")
        payload = _blobs_jpeg  # arr already IS its decode
        assert np.array_equal(decode_jpeg(payload), arr)
    else:
        path = os.path.join(NEARDUP_FIXTURE_DIR, f"{name}.png")
        payload = encode_png(arr)
        assert np.array_equal(decode_png(payload), arr)
    with open(path, "wb") as fh:
        fh.write(payload)
    print(f"wrote {path} ({len(payload)} bytes)")

print("\npinned mm7 expected pairs (origin_a, origin_b, hamming):")
_EXTS = {"nd_rings_copy": "gif", "nd_blobs_lossy": "jpg", "nd_waves_bmp": "bmp", "nd_noise_tiff": "tif"}
ext = lambda n: f"{n}.{_EXTS.get(n, 'png')}"  # noqa: E731
for a, b, d in sorted(pairs_within):
    print(f"  ({ext(a)!r}, {ext(b)!r}, {d}),")
