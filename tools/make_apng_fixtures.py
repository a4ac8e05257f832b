"""Generate committed APNG fixtures + independent ground truth.

Hand-assembles APNG byte streams (this repo has NO APNG encoder, so
every container feature here is foreign to the codebase by
construction): fcTL/fdAT sequencing, sub-rectangle frames, dispose
NONE/BACKGROUND/PREVIOUS, blend SOURCE and OVER with FRACTIONAL
alpha, palette frames with fractional tRNS alpha, a gray+alpha
stream, and the IDAT-not-part-of-animation case (default image that
viewers skip).

Ground-truth composites come from an INDEPENDENT per-pixel
compositor written here in scalar Python (no shared code with
a3_fp_bigdata_spark.multimodal.apng_codec, which is deliberately not
imported): canvas quantized to uint8 RGBA between frames, source-over
evaluated per pixel in float, exactly the spec formula. The test
(tests/test_multimodal.py) decodes the committed bytes with the
repo decoder and requires ARRAY EQUALITY against the committed
expected frames.

Usage: python tools/make_apng_fixtures.py   (idempotent, writes
fixtures/apng/*.png + tests/golden/apng_frames.npz)
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX_DIR = os.path.join(
    REPO, "a3_fp_bigdata_spark", "multimodal", "fixtures", "apng"
)
GOLDEN = os.path.join(REPO, "tests", "golden", "apng_frames.npz")

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def scanlines(arr: np.ndarray) -> bytes:
    """HxWxC uint8 -> zlib stream; alternates filter 0 and filter 2
    rows so the frame path exercises real unfiltering, not just
    pass-through."""
    h = arr.shape[0]
    rows = []
    prev = np.zeros(arr.shape[1] * arr.shape[2], dtype=np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        if y % 2 == 1:
            rows.append(b"\x02" + ((line - prev) & 0xFF).astype(np.uint8).tobytes())
        else:
            rows.append(b"\x00" + line.tobytes())
        prev = line
    return zlib.compress(b"".join(rows), 9)


def fctl(seq, w, h, x, y, dispose, blend) -> bytes:
    return chunk(
        b"fcTL",
        struct.pack(">IIIIIHHBB", seq, w, h, x, y, 1, 10, dispose, blend),
    )


def fdat(seq: int, z: bytes) -> bytes:
    return chunk(b"fdAT", struct.pack(">I", seq) + z)


# --------------------------------------------------------------------------
# Independent compositor (scalar Python, quantized canvas between frames)
# --------------------------------------------------------------------------


def composite(
    canvas_size: tuple[int, int],
    steps: list[tuple[np.ndarray, int, int, int, int]],
) -> list[np.ndarray]:
    """steps: (rgba_frame, x, y, dispose, blend) in play order.
    Returns the expected RGB frames (over opaque black)."""
    H, W = canvas_size
    canvas = [[(0, 0, 0, 0) for _ in range(W)] for _ in range(H)]
    frames = []
    for i, (rgba, fx, fy, dispose, blend) in enumerate(steps):
        fh, fw = rgba.shape[:2]
        if i == 0 and dispose == 2:
            dispose = 1
        saved = None
        if dispose == 2:
            saved = [
                [canvas[fy + r][fx + c] for c in range(fw)]
                for r in range(fh)
            ]
        for r in range(fh):
            for c in range(fw):
                sr, sg, sb, s_a = (int(v) for v in rgba[r, c])
                if blend == 0:
                    canvas[fy + r][fx + c] = (sr, sg, sb, s_a)
                else:
                    dr, dg, db, d_a = canvas[fy + r][fx + c]
                    sa = s_a / 255.0
                    da = d_a / 255.0
                    oa = sa + da * (1.0 - sa)
                    if oa > 0:
                        orr = (sr * sa + dr * da * (1.0 - sa)) / oa
                        og = (sg * sa + dg * da * (1.0 - sa)) / oa
                        ob = (sb * sa + db * da * (1.0 - sa)) / oa
                    else:
                        orr = og = ob = 0.0
                    canvas[fy + r][fx + c] = (
                        int(np.rint(orr)),
                        int(np.rint(og)),
                        int(np.rint(ob)),
                        int(np.rint(oa * 255.0)),
                    )
        shown = np.zeros((H, W, 3), dtype=np.uint8)
        for r in range(H):
            for c in range(W):
                pr, pg, pb, pa = canvas[r][c]
                shown[r, c] = (
                    int(np.rint(pr * pa / 255.0)),
                    int(np.rint(pg * pa / 255.0)),
                    int(np.rint(pb * pa / 255.0)),
                )
        frames.append(shown)
        if dispose == 1:
            for r in range(fh):
                for c in range(fw):
                    canvas[fy + r][fx + c] = (0, 0, 0, 0)
        elif dispose == 2:
            for r in range(fh):
                for c in range(fw):
                    canvas[fy + r][fx + c] = saved[r][c]
    return frames


def grad_rgba(h, w, seed, alpha) -> np.ndarray:
    rng = np.random.default_rng(seed)
    arr = np.empty((h, w, 4), dtype=np.uint8)
    arr[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    arr[:, :, 1] = np.linspace(255, 0, h, dtype=np.uint8)[:, None]
    arr[:, :, 2] = rng.integers(0, 256, (h, w), dtype=np.uint8)
    arr[:, :, 3] = alpha
    return arr


def build_rgba_over() -> tuple[bytes, list[np.ndarray]]:
    """ctype 6, 40x28: full first frame, then fractional-alpha OVER,
    semi-transparent SOURCE + dispose BACKGROUND, and a dispose
    PREVIOUS revert — the full dispose/blend matrix on true RGBA."""
    W, H = 40, 28
    f0 = grad_rgba(H, W, 1, 255)
    f1 = grad_rgba(12, 16, 2, 128)           # OVER, fractional alpha
    f2 = grad_rgba(10, 10, 3, 90)            # SOURCE writes alpha verbatim
    f3 = grad_rgba(8, 20, 4, 200)            # OVER after BACKGROUND hole
    f4 = grad_rgba(6, 6, 5, 255)             # after PREVIOUS revert
    steps = [
        (f0, 0, 0, 0, 0),     # dispose NONE, blend SOURCE
        (f1, 5, 4, 0, 1),     # OVER onto gradient
        (f2, 20, 10, 1, 0),   # SOURCE, then clear its rect
        (f3, 10, 18, 2, 1),   # OVER, then revert its rect
        (f4, 30, 2, 0, 1),
    ]
    payload = SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 6, 0, 0, 0)
    )
    payload += chunk(b"acTL", struct.pack(">II", 5, 0))
    payload += fctl(0, W, H, 0, 0, 0, 0)
    payload += chunk(b"IDAT", scanlines(f0))
    seq = 1
    for rgba, x, y, d, b in steps[1:]:
        payload += fctl(seq, rgba.shape[1], rgba.shape[0], x, y, d, b)
        seq += 1
        payload += fdat(seq, scanlines(rgba))
        seq += 1
    payload += chunk(b"IEND", b"")
    return payload, composite((H, W), steps)


def build_palette_trns() -> tuple[bytes, list[np.ndarray]]:
    """ctype 3 with FRACTIONAL tRNS alpha: palette entries at alpha
    255/180/60/0, sub-rect frames blended OVER."""
    W, H = 24, 18
    pal = np.array(
        [[200, 30, 30], [30, 200, 30], [30, 30, 200], [240, 240, 40]],
        dtype=np.uint8,
    )
    trns = bytes([255, 180, 60, 0])
    rng = np.random.default_rng(7)
    i0 = rng.integers(0, 4, (H, W), dtype=np.uint8)
    i1 = rng.integers(0, 4, (9, 12), dtype=np.uint8)
    i2 = rng.integers(0, 4, (6, 8), dtype=np.uint8)

    def idx_rgba(idx):
        rgba = np.zeros(idx.shape + (4,), dtype=np.uint8)
        rgba[:, :, :3] = pal[idx]
        rgba[:, :, 3] = np.frombuffer(trns, dtype=np.uint8)[idx]
        return rgba

    steps = [
        (idx_rgba(i0), 0, 0, 0, 0),
        (idx_rgba(i1), 3, 2, 0, 1),
        (idx_rgba(i2), 12, 8, 1, 1),
    ]
    payload = SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 3, 0, 0, 0)
    )
    payload += chunk(b"acTL", struct.pack(">II", 3, 0))
    payload += chunk(b"PLTE", pal.tobytes())
    payload += chunk(b"tRNS", trns)
    payload += fctl(0, W, H, 0, 0, 0, 0)
    payload += chunk(
        b"IDAT", scanlines(i0.reshape(H, W, 1))
    )
    payload += fctl(1, 12, 9, 3, 2, 0, 1)
    payload += fdat(2, scanlines(i1.reshape(9, 12, 1)))
    payload += fctl(3, 8, 6, 12, 8, 1, 1)
    payload += fdat(4, scanlines(i2.reshape(6, 8, 1)))
    payload += chunk(b"IEND", b"")
    return payload, composite((H, W), steps)


def build_default_image_skipped() -> tuple[bytes, list[np.ndarray]]:
    """First fcTL AFTER IDAT: the IDAT default image is NOT part of
    the animation (viewers skip it); both frames come from fdAT."""
    W, H = 16, 12
    default_img = np.full((H, W, 4), 255, dtype=np.uint8)  # never shown
    f0 = grad_rgba(H, W, 11, 255)
    f1 = grad_rgba(5, 7, 12, 140)
    steps = [(f0, 0, 0, 0, 0), (f1, 4, 3, 0, 1)]
    payload = SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 6, 0, 0, 0)
    )
    payload += chunk(b"acTL", struct.pack(">II", 2, 0))
    payload += chunk(b"IDAT", scanlines(default_img))
    payload += fctl(0, W, H, 0, 0, 0, 0)
    payload += fdat(1, scanlines(f0))
    payload += fctl(2, 7, 5, 4, 3, 0, 1)
    payload += fdat(3, scanlines(f1))
    payload += chunk(b"IEND", b"")
    return payload, composite((H, W), steps)


def build_gray_alpha() -> tuple[bytes, list[np.ndarray]]:
    """ctype 4 (gray+alpha): gray broadcast to RGB, fractional OVER."""
    W, H = 20, 14
    rng = np.random.default_rng(21)
    g0 = rng.integers(0, 256, (H, W), dtype=np.uint8)
    g1 = rng.integers(0, 256, (6, 9), dtype=np.uint8)

    def ga_rgba(g, alpha):
        rgba = np.empty(g.shape + (4,), dtype=np.uint8)
        rgba[:, :, 0] = rgba[:, :, 1] = rgba[:, :, 2] = g
        rgba[:, :, 3] = alpha
        return rgba

    def ga_samples(g, alpha):
        s = np.empty(g.shape + (2,), dtype=np.uint8)
        s[:, :, 0] = g
        s[:, :, 1] = alpha
        return s

    steps = [(ga_rgba(g0, 255), 0, 0, 0, 0), (ga_rgba(g1, 77), 6, 5, 0, 1)]
    payload = SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 4, 0, 0, 0)
    )
    payload += chunk(b"acTL", struct.pack(">II", 2, 0))
    payload += fctl(0, W, H, 0, 0, 0, 0)
    payload += chunk(b"IDAT", scanlines(ga_samples(g0, 255)))
    payload += fctl(1, 9, 6, 6, 5, 0, 1)
    payload += fdat(2, scanlines(ga_samples(g1, 77)))
    payload += chunk(b"IEND", b"")
    return payload, composite((H, W), steps)


def main() -> None:
    os.makedirs(FIX_DIR, exist_ok=True)
    builders = {
        "anim_rgba_over": build_rgba_over,
        "anim_palette_trns": build_palette_trns,
        "anim_default_skipped": build_default_image_skipped,
        "anim_gray_alpha": build_gray_alpha,
    }
    golden = {}
    for name, fn in builders.items():
        payload, frames = fn()
        with open(os.path.join(FIX_DIR, f"{name}.png"), "wb") as f:
            f.write(payload)
        golden[name] = np.stack(frames)
        print(f"{name}: {len(payload)} bytes, {len(frames)} frames, "
              f"canvas {frames[0].shape[1]}x{frames[0].shape[0]}")
    np.savez_compressed(GOLDEN, **golden)
    print(f"golden -> {GOLDEN}")


if __name__ == "__main__":
    main()
