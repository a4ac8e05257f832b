"""Regenerate the committed JPEG fixtures under multimodal/fixtures/.

Deterministic patterns -> jpeg_codec.encode_jpeg -> committed bytes.
Run from the repo root: python tools/make_jpeg_fixtures.py
The pinned feature values in tests/test_multimodal.py derive from
decoding these exact bytes; regenerate both together.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a3_fp_bigdata_spark.multimodal.binary_files import FIXTURE_DIR
from a3_fp_bigdata_spark.multimodal.jpeg_codec import decode_jpeg, encode_jpeg


def gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            ((yy + xx) * 255 // max(h + w - 2, 1)).astype(np.uint8),
        ],
        axis=2,
    )


def rings(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    d = np.hypot(yy - h / 2, xx - w / 2)
    v = ((np.cos(d / 3.0) + 1) * 127.5).astype(np.uint8)
    return np.stack([v, 255 - v, np.full((h, w), 64, np.uint8)], axis=2)


FIXTURES = {
    # 4:4:4, plain — the simple decoder path
    "photo_grad.jpg": lambda: encode_jpeg(gradient(24, 32), quality=90),
    # 4:2:0 with restart markers — the subsample + DRI/RSTn paths
    "photo_rings.jpg": lambda: encode_jpeg(
        rings(32, 48), quality=85, subsample=True, restart_interval=2
    ),
}


def main() -> None:
    for name, build in FIXTURES.items():
        payload = build()
        path = os.path.join(FIXTURE_DIR, name)
        with open(path, "w+b") as fh:
            fh.write(payload)
        arr = decode_jpeg(payload)
        means = arr.reshape(-1, 3).mean(axis=0)
        print(
            f"{name}: {len(payload)} bytes, {arr.shape[1]}x{arr.shape[0]}, "
            f"means=({means[0]:.4f}, {means[1]:.4f}, {means[2]:.4f})"
        )


if __name__ == "__main__":
    main()
