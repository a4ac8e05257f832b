"""Hand-assemble an animated GIF the repo's encoder CANNOT produce —
the container/compositing-level foreign-encoder pin (VERDICT r8 #2).

encode_gif only emits: one global palette, full-canvas frames, one
disposal method for all frames, and table-growing LZW. This generator
writes `fixtures/foreign/anim_disposal23.gif` with everything it
doesn't: per-frame LOCAL color tables, SUB-RECTANGLE frames, mixed
disposal methods (1, 2 restore-to-background, 3 restore-to-previous),
per-frame transparency, and the "uncompressed GIF" LZW variant
(fixed-width literal codes with pre-emptive CLEARs so the table never
grows — a real encoder strategy, byte-stream shape the repo encoder
never produces).

Ground-truth composites are computed HERE with independent numpy
compositing logic (paint/restore rules written against the GIF89a
spec, sharing no code with gif_codec) and saved to
`tests/golden/foreign_anim_frames.npz`; the test decodes the committed
bytes with gif_codec and requires array equality.

Usage: python tools/make_foreign_style_gif.py
"""
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FOREIGN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "a3_fp_bigdata_spark", "multimodal", "fixtures", "foreign",
)
GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "foreign_anim_frames.npz",
)


def lzw_uncompressed(indices: bytes, min_code_size: int) -> bytes:
    """GIF-LZW 'uncompressed' variant: emit every pixel as a literal
    code at the initial width, inserting a CLEAR whenever the decoder's
    table is about to force a width increase. Never defines a multi-
    pixel code — the exact opposite stream shape of a table-growing
    encoder."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    table_len = end + 1
    prev = False
    for b in indices:
        emit(b)
        if prev:
            table_len += 1  # decoder appends prev+entry[:1]
        prev = True
        # decoder widens once its table reaches 2^code_size; clear
        # just before that can happen so the width never changes
        if table_len >= (1 << code_size) - 1:
            emit(clear)
            table_len = end + 1
            prev = False
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def sub_blocks(stream: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


W, H = 20, 14

# global palette (4 entries): bg = dark blue, then 3 foreground colors
GLOBAL_PAL = np.array(
    [(10, 10, 60), (200, 40, 40), (40, 200, 40), (240, 240, 200)],
    np.uint8,
)
# local palettes differ from the global one on purpose
LOCAL_PAL_1 = np.array(
    [(255, 128, 0), (0, 128, 255), (128, 0, 128), (20, 20, 20)], np.uint8
)
LOCAL_PAL_2 = np.array(
    [(90, 200, 250), (250, 250, 90), (5, 5, 5), (170, 40, 220)], np.uint8
)

# frame 0: full canvas, global palette — a deterministic diagonal wash
f0_idx = ((np.add.outer(np.arange(H), np.arange(W))) % 4).astype(np.uint8)
# frame 1: 7x4 rect at (x=3, y=2), LOCAL_PAL_1, disposal=2
f1_idx = (
    (np.arange(4)[:, None] + 2 * np.arange(7)[None, :]) % 4
).astype(np.uint8)
F1_POS, F1_WH = (3, 2), (7, 4)
# frame 2: 6x5 rect at (x=11, y=7), LOCAL_PAL_2 with index 2
# TRANSPARENT, disposal=3
f2_idx = (
    (np.arange(5)[:, None] * 3 + np.arange(6)[None, :]) % 4
).astype(np.uint8)
F2_POS, F2_WH = (11, 7), (6, 5)
F2_TRANSPARENT = 2
# frame 3: 5x5 rect at origin, global palette, disposal=1 (leave)
f3_idx = ((np.arange(5)[:, None] * np.arange(5)[None, :]) % 4).astype(
    np.uint8
)
F3_POS, F3_WH = (0, 0), (5, 5)

# ---- independent compositing ground truth (GIF89a spec rules) -----------
expected = []
canvas = np.zeros((H, W, 3), np.uint8)  # viewer convention: black
bg_rgb = GLOBAL_PAL[0]

# frame 0 paints full canvas; disposal 1 (leave)
canvas[:, :] = GLOBAL_PAL[f0_idx]
expected.append(canvas.copy())

# frame 1 paints its rect from LOCAL_PAL_1; after display, disposal 2
# restores that rect to the BACKGROUND COLOR
(x, y), (w, h) = F1_POS, F1_WH
canvas[y : y + h, x : x + w] = LOCAL_PAL_1[f1_idx]
expected.append(canvas.copy())
canvas[y : y + h, x : x + w] = bg_rgb

# frame 2 paints its rect from LOCAL_PAL_2, transparent index 2 leaves
# the canvas showing through; after display, disposal 3 restores the
# pre-frame canvas
saved = canvas.copy()
(x, y), (w, h) = F2_POS, F2_WH
region = canvas[y : y + h, x : x + w]
opaque = f2_idx != F2_TRANSPARENT
region[opaque] = LOCAL_PAL_2[f2_idx][opaque]
expected.append(canvas.copy())
canvas = saved

# frame 3 paints at the origin from the global palette; disposal 1
(x, y), (w, h) = F3_POS, F3_WH
canvas[y : y + h, x : x + w] = GLOBAL_PAL[f3_idx]
expected.append(canvas.copy())

# ---- byte assembly -------------------------------------------------------
out = bytearray(b"GIF89a")
out += struct.pack("<HHBBB", W, H, 0x80 | 1, 0, 0)  # 4-entry GCT, bg=0
out += GLOBAL_PAL.tobytes()


def gce(disposal: int, transparent: int | None) -> bytes:
    packed = (disposal << 2) | (1 if transparent is not None else 0)
    return bytes(
        [0x21, 0xF9, 4, packed, 3, 0, transparent or 0, 0]
    )


def image(
    pos, wh, idx, *, local_pal=None, min_code=2
) -> bytes:
    (x, y), (w, h) = pos, wh
    packed = 0
    buf = bytearray()
    if local_pal is not None:
        packed |= 0x80 | 1  # 4-entry local table
    buf += b"\x2c" + struct.pack("<HHHHB", x, y, w, h, packed)
    if local_pal is not None:
        buf += local_pal.tobytes()
    buf.append(min_code)
    buf += sub_blocks(lzw_uncompressed(idx.tobytes(), min_code))
    return bytes(buf)


out += gce(1, None) + image((0, 0), (W, H), f0_idx)
out += gce(2, None) + image(F1_POS, F1_WH, f1_idx, local_pal=LOCAL_PAL_1)
out += gce(3, F2_TRANSPARENT) + image(
    F2_POS, F2_WH, f2_idx, local_pal=LOCAL_PAL_2
)
out += gce(1, None) + image(F3_POS, F3_WH, f3_idx)
out.append(0x3B)

os.makedirs(FOREIGN_DIR, exist_ok=True)
path = os.path.join(FOREIGN_DIR, "anim_disposal23.gif")
with open(path, "wb") as fh:
    fh.write(bytes(out))
print(f"wrote {path} ({len(out)} bytes)")

np.savez(GOLDEN, **{f"frame_{i}": f for i, f in enumerate(expected)})
print(f"wrote {GOLDEN} ({len(expected)} expected composites)")
for i, f in enumerate(expected):
    m = [round(float(f[:, :, c].mean()), 4) for c in range(3)]
    print(f"  frame {i} means: {m}")
