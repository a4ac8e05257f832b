"""Generate the committed archival-TIFF fixture set (LZW / PackBits /
predictor) + golden pixel arrays for mm14's decode pin.

Independent of tiff_codec: the LZW writer below is a fresh
transcription of TIFF 6.0 §13 (MSB-first packing, 9..12-bit codes,
early width change when the next code to assign would be 2^width - 1,
CLEAR at table 4094), the PackBits writer of §9, and the predictor is
forward horizontal differencing — so a codec bug cannot cancel out in
generation. Deterministic content (seeded); expected RGB arrays land
in tests/golden/tiff_lzw.npz keyed by filename.

Usage: python tools/make_tiff_lzw_fixtures.py
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "a3_fp_bigdata_spark", "multimodal", "fixtures", "archival",
)
GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "tiff_lzw.npz",
)


def lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    sink = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            sink.append((acc >> nbits) & 0xFF)

    width = 9
    put(CLEAR, width)
    dic = {bytes([i]): i for i in range(256)}
    next_code = 258
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in dic:
            cur = nxt
            continue
        put(dic[cur], width)
        dic[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            put(CLEAR, width)
            width = 9
            dic = {bytes([i]): i for i in range(256)}
            next_code = 258
        cur = bytes([byte])
    if cur:
        put(dic[cur], width)
    put(EOI, width)
    if nbits:
        sink.append((acc << (8 - nbits)) & 0xFF)
    return bytes(sink)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_end = i + 1
        while (
            lit_end < len(data)
            and lit_end - i < 128
            and not (
                lit_end + 2 < len(data)
                and data[lit_end] == data[lit_end + 1] == data[lit_end + 2]
            )
        ):
            lit_end += 1
        out += bytes([lit_end - i - 1]) + data[i:lit_end]
        i = lit_end
    return bytes(out)


def build_tiff(
    samples: np.ndarray,
    comp: int,
    strips: int,
    photometric: int,
    predictor: int = 1,
) -> bytes:
    """Multi-strip little-endian TIFF around the sample grid (HxWxspp)."""
    h, w, spp = samples.shape
    rows_per_strip = (h + strips - 1) // strips
    payloads = []
    for y in range(0, h, rows_per_strip):
        chunk = samples[y : y + rows_per_strip]
        if predictor == 2:
            chunk = chunk.astype(np.int16)
            chunk = np.concatenate(
                [chunk[:, :1], np.diff(chunk, axis=1)], axis=1
            ).astype(np.uint8)
        raw = chunk.tobytes()
        payloads.append(
            lzw_encode(raw) if comp == 5
            else packbits_encode(raw) if comp == 32773
            else raw
        )
    bps_off = 8
    data_off = bps_off + 2 * spp
    offs, cur = [], data_off
    for p in payloads:
        offs.append(cur)
        cur += len(p)
    pad = cur % 2
    ifd_off = cur + pad
    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [comp]),
        (262, 3, [photometric]),
        (273, 4, offs),
        (277, 3, [spp]),
        (278, 4, [rows_per_strip]),
        (279, 4, [len(p) for p in payloads]),
        (284, 3, [1]),
    ]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    entries.sort()
    fmt = {3: "H", 4: "I"}
    ifd = struct.pack("<H", len(entries))
    extra = b""
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    for tag, typ, values in entries:
        body = struct.pack("<" + str(len(values)) + fmt[typ], *values)
        if len(body) <= 4:
            ifd += struct.pack("<HHI", tag, typ, len(values)) + body.ljust(
                4, b"\x00"
            )
        else:
            ifd += struct.pack(
                "<HHII", tag, typ, len(values), extra_off + len(extra)
            )
            extra += body
    ifd += struct.pack("<I", 0)
    bps_block = struct.pack("<" + str(spp) + "H", *([8] * spp))
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + bps_block
        + b"".join(payloads)
        + b"\x00" * pad
        + ifd
        + extra
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(6011)

    # scanned-document look: mostly-white page, dark glyph blobs, a rule
    page = np.full((72, 96, 3), 245, np.uint8)
    for _ in range(60):
        y, x = rng.integers(4, 66), rng.integers(4, 90)
        page[y : y + 3, x : x + 4] = rng.integers(10, 60)
    page[36:38, 8:88] = 30
    # photo-ish gradient with noise (exercises many LZW codes)
    yy, xx = np.mgrid[0:64, 0:80]
    photo = np.stack(
        [
            (yy * 3 + xx) % 256,
            (xx * 2) % 256,
            ((yy + xx) * 2) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    photo = (
        photo.astype(np.int16) + rng.integers(-6, 7, photo.shape)
    ).clip(0, 255).astype(np.uint8)
    # grayscale microfilm-style frame
    gray = ((yy * 4) % 200 + 20).astype(np.uint8)[:, :, None]

    fixtures = {
        "arch_page_lzw.tif": (page, 5, 3, 2, 1),
        "arch_photo_lzw_pred.tif": (photo, 5, 2, 2, 2),
        "arch_page_packbits.tif": (page, 32773, 2, 2, 1),
        "arch_gray_lzw.tif": (gray, 5, 1, 1, 1),
    }
    golden = {}
    for name, (arr, comp, strips, photo_i, pred) in fixtures.items():
        payload = build_tiff(arr, comp, strips, photo_i, pred)
        with open(os.path.join(OUT_DIR, name), "wb") as fh:
            fh.write(payload)
        # expected RGB: gray broadcasts, RGB passes through
        rgb = np.repeat(arr, 3, axis=2) if arr.shape[2] == 1 else arr
        golden[name] = rgb
        print(f"{name}: {len(payload)} bytes, {arr.shape}")
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, **golden)
    print(f"golden -> {GOLDEN}")


if __name__ == "__main__":
    main()
