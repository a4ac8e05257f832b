"""Foreign-style lossless-WebP (VP8L) generator — fixture source for
multimodal/webp_codec.py.

Independence contract (the make_progressive_jpeg protocol): own
LSB-first bit writer, own canonical-code construction and
code-length-code serialization, own forward AND inverse transform
implementations — nothing imported from the decoder, so a green test
is a cross-implementation check against the public VP8L spec.

VP8L is LOSSLESS, which makes the ground truth absolute: each builder
returns (webp bytes, expected RGB) where the expectation is the
generator's own reconstruction of the token stream through ITS
inverse transforms — decode_webp(bytes) must equal it EXACTLY, no
tolerance.

Streams exercise: literals, LZ77 backward references (plain-distance
codes > 120), the color cache, SIMPLE prefix codes (1- and 2-symbol),
full code-length-coded canonical codes, subtract-green + per-block
predictor transforms, cross-color, a color-indexing palette, and a
meta prefix-code image with two code groups.
"""

from __future__ import annotations

import numpy as np

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15]
_HASH_MUL = 0x1E35A7BD


class BitW:
    """LSB-first bit writer (the VP8L stream convention)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def put(self, val: int, n: int) -> None:
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def put_code(self, code: int, length: int) -> None:
        """Prefix-code bits go MSB-first, one stream bit each."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def take(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{symbol: length} -> {symbol: (code, length)}, DEFLATE canonical
    (codes assigned in (length, symbol) order)."""
    max_len = max(lengths.values())
    bl = [0] * (max_len + 1)
    for ln in lengths.values():
        bl[ln] += 1
    code = 0
    nxt = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl[ln - 1]) << 1
        nxt[ln] = code
    out = {}
    for sym in sorted(lengths):
        ln = lengths[sym]
        out[sym] = (nxt[ln], ln)
        nxt[ln] += 1
    return out


def two_level_lengths(symbols: list[int]) -> dict[int, int]:
    """A COMPLETE code over the given symbols using at most two code
    lengths (Kraft equality: n_short = 2^L - n at L-1, rest at L)."""
    n = len(symbols)
    assert n >= 2
    L = (n - 1).bit_length()
    if (1 << L) < n:
        L += 1
    n_short = (1 << L) - n
    lengths = {}
    for i, s in enumerate(sorted(symbols)):
        lengths[s] = (L - 1) if i < n_short and L > 1 else L
    return lengths


class Code:
    """One serialized prefix code + its encode map."""

    def __init__(self, w: BitW, symbols: list[int], alphabet: int) -> None:
        symbols = sorted(set(symbols))
        self.enc: dict[int, tuple[int, int]] = {}
        if len(symbols) == 1:
            w.put(1, 1)          # simple
            w.put(0, 1)          # num_symbols - 1 = 0
            w.put(1, 1)          # 8-bit first symbol
            w.put(symbols[0], 8)
            self.enc[symbols[0]] = (0, 0)  # zero bits per symbol
            return
        if len(symbols) == 2:
            w.put(1, 1)          # simple
            w.put(1, 1)          # two symbols
            w.put(1, 1)          # 8-bit first symbol
            w.put(symbols[0], 8)
            w.put(symbols[1], 8)
            self.enc[symbols[0]] = (0, 1)
            self.enc[symbols[1]] = (1, 1)
            return
        # full form: two-level code serialized through the clc
        lengths = two_level_lengths(symbols)
        used = sorted(set(lengths.values()))
        w.put(0, 1)  # not simple
        # clc: symbol 0 (zero-length runs) at 1 bit, the two (or one)
        # real lengths at 2 bits — complete by construction
        if len(used) == 1:
            clc_len = {0: 1, used[0]: 2, 15: 2}  # pad with a dummy 15
        else:
            clc_len = {0: 1, used[0]: 2, used[1]: 2}
        num_clc = max(_CLC_ORDER.index(s) for s in clc_len) + 1
        w.put(num_clc - 4, 4)
        for i in range(num_clc):
            w.put(clc_len.get(_CLC_ORDER[i], 0), 3)
        w.put(0, 1)  # no explicit max-symbol: all alphabet entries coded
        clc_codes = canonical_codes(clc_len)
        for sym in range(alphabet):
            ln = lengths.get(sym, 0)
            c, cl = clc_codes[ln] if ln else clc_codes[0]
            w.put_code(c, cl)
        self.enc = canonical_codes(lengths)

    def emit(self, w: BitW, sym: int) -> None:
        code, ln = self.enc[sym]
        if ln:
            w.put_code(code, ln)


def lz77_emit(w: BitW, value: int, code: "Code") -> None:
    """Emit the prefix-coded LZ77 value (length or distance-code)."""
    if value <= 4:
        code.emit(w, value - 1)
        return
    for pc in range(4, 40):
        extra = (pc - 2) >> 1
        lo = ((2 + (pc & 1)) << extra) + 1
        hi = lo + (1 << extra) - 1
        if lo <= value <= hi:
            code.emit(w, pc)
            w.put(value - lo, extra)
            return
    raise ValueError(f"LZ77 value {value} out of range")


def lz77_symbol(value: int) -> int:
    if value <= 4:
        return value - 1
    for pc in range(4, 40):
        extra = (pc - 2) >> 1
        lo = ((2 + (pc & 1)) << extra) + 1
        if lo <= value <= lo + (1 << extra) - 1:
            return pc
    raise ValueError(value)


def _hash(px: int, cache_bits: int) -> int:
    return (_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)


def tokens_to_pixels(tokens, n: int, cache_bits: int) -> list[int]:
    """Replay a token list into the n-pixel ARGB sequence (the
    generator's own model of the decoder's pixel loop)."""
    out: list[int] = []
    cache = [0] * (1 << cache_bits) if cache_bits else None
    for t in tokens:
        if t[0] == "lit":
            out.append(t[1])
            if cache is not None:
                cache[_hash(t[1], cache_bits)] = t[1]
        elif t[0] == "copy":
            _, length, dist = t
            for _ in range(length):
                px = out[-dist]
                out.append(px)
                if cache is not None:
                    cache[_hash(px, cache_bits)] = px
        else:  # cache hit
            out.append(cache[t[1]])
    assert len(out) == n, (len(out), n)
    return out


def emit_tokens(w: BitW, tokens, codes: list[Code]) -> None:
    green, red, blue, alpha, dist = codes
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            green.emit(w, (px >> 8) & 0xFF)
            red.emit(w, (px >> 16) & 0xFF)
            blue.emit(w, px & 0xFF)
            alpha.emit(w, (px >> 24) & 0xFF)
        elif t[0] == "copy":
            _, length, d = t
            green.emit(w, 256 + lz77_symbol(length))
            if length > 4:
                pc = lz77_symbol(length)
                extra = (pc - 2) >> 1
                lo = ((2 + (pc & 1)) << extra) + 1
                w.put(length - lo, extra)
            lz77_emit(w, d + 120, dist)  # plain distance code
        else:
            green.emit(w, 256 + 24 + t[1])


def token_symbols(tokens, cache_bits: int):
    """Symbol sets each of the five codes needs."""
    g, r, b, a, d = set(), set(), set(), set(), set()
    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            g.add((px >> 8) & 0xFF)
            r.add((px >> 16) & 0xFF)
            b.add(px & 0xFF)
            a.add((px >> 24) & 0xFF)
        elif t[0] == "copy":
            g.add(256 + lz77_symbol(t[1]))
            d.add(lz77_symbol(t[2] + 120))
        else:
            g.add(256 + 24 + t[1])
    # every code must exist; give unused ones a 1-symbol simple code
    for s in (r, b, a, d):
        if not s:
            s.add(0)
    return g, r, b, a, d


def write_codes(w: BitW, tokens, cache_bits: int) -> list[Code]:
    g, r, b, a, d = token_symbols(tokens, cache_bits)
    alpha_g = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    return [
        Code(w, sorted(g), alpha_g),
        Code(w, sorted(r), 256),
        Code(w, sorted(b), 256),
        Code(w, sorted(a), 256),
        Code(w, sorted(d), 40),
    ]


def riff(vp8l_payload: bytes) -> bytes:
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def header(w: BitW, width: int, height: int) -> None:
    w.put(width - 1, 14)
    w.put(height - 1, 14)
    w.put(0, 1)  # alpha hint
    w.put(0, 3)  # version


def _argb(a, r, g, b) -> int:
    return (int(a) << 24) | (int(r) << 16) | (int(g) << 8) | int(b)


def _rng_tokens(rng, n: int, cache_bits: int, values: list[int]):
    """Literal/copy/cache token mix covering n pixels: planted copies
    (plain distances) and cache hits whenever the model cache holds
    the value we are about to emit."""
    tokens = []
    count = 0
    cache = [0] * (1 << cache_bits) if cache_bits else None
    recent: list[int] = []
    while count < n:
        room = n - count
        roll = rng.rand()
        if roll < 0.15 and count >= 3 and room >= 3:
            dist = int(rng.randint(1, min(count, 30) + 1))
            length = int(rng.randint(2, min(room, 12) + 1))
            tokens.append(("copy", length, dist))
            for _ in range(length):
                px = recent[-dist]
                recent.append(px)
                if cache is not None:
                    cache[_hash(px, cache_bits)] = px
            count += length
        else:
            px = values[int(rng.randint(0, len(values)))]
            if (
                cache is not None
                and roll > 0.8
                and cache[_hash(px, cache_bits)] == px
            ):
                tokens.append(("cache", _hash(px, cache_bits)))
                recent.append(px)
                count += 1
                continue
            tokens.append(("lit", px))
            recent.append(px)
            if cache is not None:
                cache[_hash(px, cache_bits)] = px
            count += 1
    return tokens


def build_plain(width: int = 23, height: int = 17, seed: int = 5):
    """No transforms: literal/copy/cache stream over a 24-value ARGB
    palette-ish distribution. Alpha constant (1-symbol simple code)."""
    rng = np.random.RandomState(seed)
    values = [
        _argb(255, rng.randint(256), rng.randint(256), rng.randint(256))
        for _ in range(24)
    ]
    cache_bits = 6
    tokens = _rng_tokens(rng, width * height, cache_bits, values)
    w = BitW()
    header(w, width, height)
    w.put(0, 1)  # no transforms
    w.put(1, 1)  # color cache present
    w.put(cache_bits, 4)
    w.put(0, 1)  # no meta prefix image
    codes = write_codes(w, tokens, cache_bits)
    emit_tokens(w, tokens, codes)
    pixels = tokens_to_pixels(tokens, width * height, cache_bits)
    arr = np.array(pixels, dtype=np.uint32).reshape(height, width)
    rgb = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=2
    ).astype(np.uint8)
    return riff(b"\x2f" + w.take()), rgb


# --- transform variants -------------------------------------------------

_PRED_MODES = [1, 2, 7, 12]  # left, top, avg(L,T), clamp-add-sub-full


def _pred(mode: int, l, t, tl):
    l = l.astype(np.int32)
    t = t.astype(np.int32)
    tl = tl.astype(np.int32)
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 7:
        return (l + t) >> 1
    if mode == 12:
        return np.clip(l + t - tl, 0, 255)
    raise ValueError(mode)


def build_predicted(width: int = 21, height: int = 19, seed: int = 9):
    """subtract-green + per-block predictor over a smooth image: the
    generator applies the FORWARD passes (residual = pixel - pred mod
    256 on the green-subtracted plane), writes the transform bits +
    mode sub-image + residual literals, and expects the ORIGINAL
    pixels back — lossless, exact."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    img = np.zeros((height, width, 4), dtype=np.uint8)  # ARGB planes
    img[..., 0] = 255
    img[..., 1] = (7 * yy + 3 * xx + rng.randint(0, 9, (height, width))) % 256
    img[..., 2] = (5 * yy + 11 * xx + rng.randint(0, 9, (height, width))) % 256
    img[..., 3] = (3 * yy + 2 * xx + rng.randint(0, 9, (height, width))) % 256

    # forward subtract-green
    sg = img.astype(np.int32).copy()
    sg[..., 1] = (sg[..., 1] - sg[..., 2]) % 256
    sg[..., 3] = (sg[..., 3] - sg[..., 2]) % 256
    sg = sg.astype(np.uint8)

    # forward predictor (block modes from a deterministic pattern)
    bits = 3
    bw = -(-width // (1 << bits))
    bh = -(-height // (1 << bits))
    modes = np.array(
        [[_PRED_MODES[(bx + by) % len(_PRED_MODES)] for bx in range(bw)]
         for by in range(bh)],
        dtype=np.uint8,
    )
    res = np.zeros_like(sg)
    black = np.array([255, 0, 0, 0], np.int32)
    for y in range(height):
        for x in range(width):
            if x == 0 and y == 0:
                p = black
            elif y == 0:
                p = sg[0, x - 1].astype(np.int32)
            elif x == 0:
                p = sg[y - 1, 0].astype(np.int32)
            else:
                tr = sg[y - 1, x + 1] if x + 1 < width else sg[y, 0]
                mode = int(modes[y >> bits, x >> bits])
                if mode == 12:
                    p = _pred(12, sg[y, x - 1], sg[y - 1, x],
                              sg[y - 1, x - 1])
                else:
                    p = _pred(mode, sg[y, x - 1], sg[y - 1, x],
                              sg[y - 1, x - 1])
                del tr  # only modes 1/2/7/12 used; TR unused by them
            res[y, x] = ((sg[y, x].astype(np.int32) - p) % 256).astype(
                np.uint8
            )

    w = BitW()
    header(w, width, height)
    # transforms are read in stream order and inverted in reverse:
    # write subtract-green FIRST so the decoder un-predicts first,
    # then re-adds green (matching the forward order above)
    w.put(1, 1)
    w.put(2, 2)  # subtract-green
    w.put(1, 1)
    w.put(0, 2)  # predictor
    w.put(bits - 2, 3)
    # mode sub-image: literal ARGB pixels (255, 0, mode, 0)
    sub_tokens = [
        ("lit", _argb(255, 0, modes[by, bx], 0))
        for by in range(bh)
        for bx in range(bw)
    ]
    w.put(0, 1)  # sub-image: no color cache
    sub_codes = write_codes(w, sub_tokens, 0)
    emit_tokens(w, sub_tokens, sub_codes)
    w.put(0, 1)  # end of transforms
    # main image: residual literals, no cache, no meta
    tokens = [
        ("lit", _argb(*res[y, x]))
        for y in range(height)
        for x in range(width)
    ]
    w.put(0, 1)  # no color cache
    w.put(0, 1)  # no meta prefix image
    codes = write_codes(w, tokens, 0)
    emit_tokens(w, tokens, codes)
    rgb = np.stack([img[..., 1], img[..., 2], img[..., 3]], axis=2)
    return riff(b"\x2f" + w.take()), rgb


def build_cross_color(width: int = 18, height: int = 14, seed: int = 4):
    """Cross-color transform with per-block multipliers: forward pass
    subtracts the green->red / green->blue / red->blue deltas, the
    stream carries the multiplier sub-image."""
    rng = np.random.RandomState(seed)
    img = np.zeros((height, width, 4), dtype=np.uint8)
    img[..., 0] = 255
    for c in (1, 2, 3):
        img[..., c] = rng.randint(0, 256, (height, width))
    bits = 3
    bw = -(-width // (1 << bits))
    bh = -(-height // (1 << bits))
    g2r = np.array([[(bx * 37 + by * 11) % 256 for bx in range(bw)]
                    for by in range(bh)], dtype=np.uint8)
    g2b = np.array([[(bx * 5 + by * 73) % 256 for bx in range(bw)]
                    for by in range(bh)], dtype=np.uint8)
    r2b = np.array([[(bx * 101 + by * 29) % 256 for bx in range(bw)]
                    for by in range(bh)], dtype=np.uint8)

    def s8(v):
        v = int(v)
        return v - 256 if v >= 128 else v

    def delta(m, c):
        return (s8(m) * s8(c)) >> 5

    res = img.astype(np.int32).copy()
    for y in range(height):
        for x in range(width):
            by, bx = y >> bits, x >> bits
            a, red, g, b = img[y, x].astype(np.int32)
            # forward: subtract in the spec's forward order
            new_red = (red - delta(g2r[by, bx], g)) % 256
            new_b = (b - delta(g2b[by, bx], g)) % 256
            new_b = (new_b - delta(r2b[by, bx], red)) % 256
            res[y, x] = (a, new_red, g, new_b)
    res = res.astype(np.uint8)

    w = BitW()
    header(w, width, height)
    w.put(1, 1)
    w.put(1, 2)  # cross-color transform
    w.put(bits - 2, 3)
    sub_tokens = [
        ("lit", _argb(255, r2b[by, bx], g2b[by, bx], g2r[by, bx]))
        for by in range(bh)
        for bx in range(bw)
    ]
    w.put(0, 1)
    sub_codes = write_codes(w, sub_tokens, 0)
    emit_tokens(w, sub_tokens, sub_codes)
    w.put(0, 1)  # end of transforms
    tokens = [
        ("lit", _argb(*res[y, x]))
        for y in range(height)
        for x in range(width)
    ]
    w.put(0, 1)
    w.put(0, 1)
    codes = write_codes(w, tokens, 0)
    emit_tokens(w, tokens, codes)
    rgb = np.stack([img[..., 1], img[..., 2], img[..., 3]], axis=2)
    return riff(b"\x2f" + w.take()), rgb


def build_palette(width: int = 25, height: int = 11, seed: int = 3,
                  n_colors: int = 40):
    """Color-indexing transform (> 16 colors, so no pixel bundling):
    the palette rides as a delta-coded 1-row sub-image, pixel greens
    index it."""
    rng = np.random.RandomState(seed)
    palette = np.zeros((n_colors, 4), dtype=np.uint8)
    palette[:, 0] = 255
    palette[:, 1:] = rng.randint(0, 256, (n_colors, 3))
    idx = rng.randint(0, n_colors, (height, width))

    w = BitW()
    header(w, width, height)
    w.put(1, 1)
    w.put(3, 2)  # color indexing
    w.put(n_colors - 1, 8)
    deltas = np.diff(
        np.vstack([np.zeros((1, 4), np.int32), palette.astype(np.int32)]),
        axis=0,
    ) % 256
    sub_tokens = [("lit", _argb(*d)) for d in deltas.astype(np.uint8)]
    w.put(0, 1)
    sub_codes = write_codes(w, sub_tokens, 0)
    emit_tokens(w, sub_tokens, sub_codes)
    w.put(0, 1)  # end of transforms
    tokens = [
        ("lit", _argb(255, 0, idx[y, x], 0))
        for y in range(height)
        for x in range(width)
    ]
    w.put(0, 1)
    w.put(0, 1)
    codes = write_codes(w, tokens, 0)
    emit_tokens(w, tokens, codes)
    rgb = palette[idx][..., 1:4]
    return riff(b"\x2f" + w.take()), rgb


def build_meta_groups(width: int = 24, height: int = 16, seed: int = 8):
    """Two prefix-code groups selected by a meta image (left half
    group 0, right half group 1) — each group coding a disjoint color
    family, so a group mixup decodes visibly wrong."""
    rng = np.random.RandomState(seed)
    meta_bits = 3
    mw = -(-width // (1 << meta_bits))
    mh = -(-height // (1 << meta_bits))
    group_of = np.array(
        [[0 if bx < mw // 2 else 1 for bx in range(mw)] for by in range(mh)]
    )
    vals0 = [_argb(255, rng.randint(128), rng.randint(128), rng.randint(128))
             for _ in range(8)]
    vals1 = [_argb(255, 128 + rng.randint(128), 128 + rng.randint(128),
                   128 + rng.randint(128)) for _ in range(8)]
    tokens = []
    arr = np.zeros((height, width), dtype=np.uint32)
    for y in range(height):
        for x in range(width):
            g = group_of[y >> meta_bits, x >> meta_bits]
            px = (vals0 if g == 0 else vals1)[int(rng.randint(8))]
            tokens.append((g, ("lit", px)))
            arr[y, x] = px

    w = BitW()
    header(w, width, height)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no color cache
    w.put(1, 1)  # meta prefix image present
    w.put(meta_bits - 2, 3)
    meta_tokens = [
        ("lit", _argb(255, 0, group_of[by, bx], 0))
        for by in range(mh)
        for bx in range(mw)
    ]
    w.put(0, 1)  # meta sub-image: no cache
    meta_codes = write_codes(w, meta_tokens, 0)
    emit_tokens(w, meta_tokens, meta_codes)
    codes0 = write_codes(w, [t for g, t in tokens if g == 0], 0)
    codes1 = write_codes(w, [t for g, t in tokens if g == 1], 0)
    for g, t in tokens:
        emit_tokens(w, [t], codes0 if g == 0 else codes1)
    rgb = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=2
    ).astype(np.uint8)
    return riff(b"\x2f" + w.take()), rgb


if __name__ == "__main__":
    for name, built in (
        ("plain", build_plain()),
        ("predicted", build_predicted()),
        ("cross_color", build_cross_color()),
        ("palette", build_palette()),
        ("meta", build_meta_groups()),
    ):
        data, rgb = built
        print(name, len(data), rgb.shape)
