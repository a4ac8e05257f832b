"""Multimodal plumbing tests: the decode is a stub, everything around it
(schemas, Arrow batch iteration, resize/frame math, feature values) is
real and checked exactly."""

from __future__ import annotations

import numpy as np
import pytest

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.multimodal import images as M
from tests.conftest import SF0001


def test_decode_stub_deterministic():
    a = M.decode_image(b"hello world " * 10)
    b = M.decode_image(b"hello world " * 10)
    assert np.array_equal(a, b)
    assert a.dtype == np.uint8 and a.ndim == 3 and a.shape[2] == 3


def test_native_fast_path_matches_pure_python_on_every_fixture():
    """Env-gated like the live-Kafka test: when PIL IS installed,
    decode_image routes through it as the native fast path — this pin
    proves fast-path == pure-python on EVERY committed fixture, so the
    swap changes throughput, never values. Lossless codecs
    (PNG/GIF/BMP/TIFF/VP8L) must match exactly; JPEG allows per-pixel
    |diff| <= 2 (decoder-specific IDCT rounding) with tiny mean."""
    if not M.HAVE_PIL:
        pytest.skip("PIL not installed; fast path unreachable (pure "
                    "path is covered by the golden pins)")
    import glob
    import os

    fix_root = os.path.join(os.path.dirname(M.__file__), "fixtures")
    media_types = {
        ".png": "image/png", ".jpg": "image/jpeg", ".gif": "image/gif",
        ".bmp": "image/bmp", ".tif": "image/tiff", ".webp": "image/webp",
    }
    n_checked = 0
    for pattern in ("*", "neardup/*", "modern/*", "foreign/*"):
        for path in sorted(glob.glob(os.path.join(fix_root, pattern))):
            ext = os.path.splitext(path)[1]
            mt = media_types.get(ext)
            if mt is None:
                continue
            payload = open(path, "rb").read()
            pure = M.decode_image_pure(payload, mt)
            fast = M.decode_image(payload, mt)  # PIL path under HAVE_PIL
            assert fast.shape == pure.shape, path
            if ext == ".jpg":
                diff = np.abs(fast.astype(int) - pure.astype(int))
                assert diff.max() <= 2, (path, diff.max())
                assert diff.mean() < 0.5, (path, diff.mean())
            else:
                assert np.array_equal(fast, pure), path
            n_checked += 1
    assert n_checked >= 20, n_checked  # the committed corpus is bigger


def test_decode_real_format_raises_without_pil():
    if M.HAVE_PIL:
        pytest.skip("PIL installed; stub gate not reachable")
    # the pure-python codecs cover PNG/JPEG/GIF/BMP/TIFF/ICO and the
    # FULL WebP family (VP8L lossless, lossy VP8 keyframes, VP8X
    # stills, r13 animation); formats beyond them (AVIF etc.) still
    # need PIL and must say so, not guess — and a FRAMELESS animated
    # container refuses loudly rather than returning an empty canvas
    with pytest.raises(NotImplementedError):
        M.decode_image(b"unknown", "image/avif")
    import struct as _struct

    anim = (
        b"RIFF" + _struct.pack("<I", 40) + b"WEBP"
        + b"VP8X" + _struct.pack("<I", 10) + b"\x02" + b"\x00" * 9
        + b"ANIM" + _struct.pack("<I", 6) + b"\x00" * 6
    )
    with pytest.raises(ValueError, match="no ANMF frames"):
        M.decode_image(anim, "image/webp")
    # corrupt bytes fail loudly in the codecs, not silently
    with pytest.raises(ValueError):
        M.decode_image(b"\x89PNG\r\n\x1a\njunk", "image/png")
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xff\xe0jpegish", "image/jpeg")


def test_feature_extraction_matches_local_math(spark):
    media = M.media_table(spark, SF0001).limit(50)
    got = {r.media_id: r for r in M.extract_features(media).collect()}
    docs = {
        r.doc_id: r.text
        for r in table(spark, SF0001, "documents").limit(50).collect()
    }
    assert set(got) == set(docs)
    for did, text in docs.items():
        arr = M.decode_image(text.encode("utf-8"))
        means = arr.reshape(-1, 3).mean(axis=0)
        r = got[did]
        assert r.img_height == arr.shape[0] and r.img_width == arr.shape[1]
        assert abs(r.img_avg_red - means[0]) < 1e-9
        assert abs(r.img_avg_blue - means[2]) < 1e-9


def test_resize_shapes_and_determinism(spark):
    media = M.media_table(spark, SF0001).limit(20)
    rows = M.resize_images(media, 8, 8).collect()
    assert len(rows) == 20
    assert all(len(r.payload) == 8 * 8 * 3 for r in rows)
    # resize of a known array: nearest-neighbor picks exact source pixels
    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = M.resize_nn(arr, 2, 2)
    assert np.array_equal(out, arr[[0, 2]][:, [0, 2]])


def test_frame_sampling_counts(spark):
    media = M.media_table(spark, SF0001).limit(30)
    frames = M.frame_sample(media, frame_bytes=64, every_n=3).collect()
    docs = table(spark, SF0001, "documents").limit(30).collect()
    expected = sum(
        len(range(0, len(d.text.encode("utf-8")) // 64, 3)) for d in docs
    )
    assert len(frames) == expected
    assert all(len(f.frame) == 64 for f in frames)


def test_feature_table_is_broadcast_joinable(spark):
    """The feature output joins back to documents like the reference's
    image_features dim (spark_script.py:24) — broadcast, no shuffle of
    the big side."""
    from pyspark.sql import functions as F

    media = M.media_table(spark, SF0001)
    feats = M.extract_features(media.limit(100))
    joined = media.join(F.broadcast(feats), "media_id", "left_outer")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_png_codec_roundtrip_and_filters():
    """decode(encode(a)) == a, and all five PNG scanline filter types
    unfilter correctly (hand-built IDAT streams per the spec)."""
    import struct
    import zlib

    from a3_fp_bigdata_spark.multimodal import png_codec as C

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_png(C.encode_png(a)), a)

    def build(filters, arr):
        h, w = arr.shape[:2]
        ch, stride = 3, arr.shape[1] * 3
        prev = np.zeros(stride, dtype=np.int32)
        raw = b""
        for y in range(h):
            line = arr[y].reshape(-1).astype(np.int32)
            f = filters[y % len(filters)]
            enc = line.copy()
            if f == 1:
                for i in range(stride - 1, ch - 1, -1):
                    enc[i] = (line[i] - line[i - ch]) % 256
            elif f == 2:
                enc = (line - prev) % 256
            elif f == 3:
                for i in range(stride):
                    left = line[i - ch] if i >= ch else 0
                    enc[i] = (line[i] - ((left + prev[i]) >> 1)) % 256
            elif f == 4:
                for i in range(stride):
                    left = line[i - ch] if i >= ch else 0
                    ul = prev[i - ch] if i >= ch else 0
                    enc[i] = (line[i] - C._paeth(left, prev[i], ul)) % 256
            raw += bytes([f]) + enc.astype(np.uint8).tobytes()
            prev = line
        return (
            b"\x89PNG\r\n\x1a\n"
            + C._chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + C._chunk(b"IDAT", zlib.compress(raw))
            + C._chunk(b"IEND", b"")
        )

    b = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    for filters in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert np.array_equal(C.decode_png(build(filters, b)), b), filters


def test_binaryfile_image_dir_features(spark):
    """mm4: binaryFile scan of the committed PNG fixtures -> REAL decode
    -> channel means/dims pinned to the generator's known patterns."""
    from a3_fp_bigdata_spark.multimodal import binary_files as B

    feats = {}
    media = B.image_dir_source(spark, B.FIXTURE_DIR)
    assert media.schema["payload"].dataType.typeName() == "binary"
    named = media.join(
        B.extract_features(media), "media_id"
    ).select("meta.origin", "img_avg_red", "img_avg_green",
             "img_avg_blue", "img_width", "img_height")
    for r in named.collect():
        feats[r.origin] = (
            round(r.img_avg_red, 4), round(r.img_avg_green, 4),
            round(r.img_avg_blue, 4), r.img_width, r.img_height,
        )
    assert feats["icon_solid_red.png"] == (200.0, 10.0, 30.0, 16, 16)
    assert feats["icon_grad_small.png"] == (66.5, 88.5, 166.6, 20, 12)
    assert feats["icon_grad_large.png"] == (56.5, 90.5, 146.0, 32, 48)
    assert feats["icon_checker.png"] == (127.5, 127.5, 127.5, 24, 24)
    assert feats["icon_dark.png"] == (5.0, 5.0, 5.0, 40, 8)
    # color-type-3 (palette/PLTE) decode: tools/make_png_fixtures.py
    assert feats["icon_palette.png"] == (127.4571, 152.1286, 105.8714,
                                         28, 20)
    assert len(feats) == 6


def test_mm4_registered_and_deterministic(spark):
    from a3_fp_bigdata_spark import registry

    q = registry.all_queries()["mm4_image_dir_features"]
    a = [tuple(r) for r in q(spark, SF0001).collect()]
    b = [tuple(r) for r in q(spark, SF0001).collect()]
    assert a == b and len(a) == 10  # 6 PNGs + 2 JPEGs + 2 GIFs


def test_binaryfile_jpeg_fixture_features(spark):
    """The two committed JPEG fixtures (one 4:4:4, one 4:2:0 with
    restart markers — tools/make_jpeg_fixtures.py) decode through the
    pure-python baseline codec inside the Spark pipeline; channel means
    pinned to the decoder's deterministic output."""
    from a3_fp_bigdata_spark.multimodal import binary_files as B

    if M.HAVE_PIL:
        # JPEG is lossy and decode_image prefers PIL when present;
        # libjpeg's integer IDCT differs from jpeg_codec's float path
        # by fractions per channel, so the exact pins below are
        # pure-python-decoder-specific (PNG pins are PIL-safe: lossless)
        pytest.skip("PIL installed; pins target the pure-python decoder")
    media = B.image_dir_source(spark, B.FIXTURE_DIR, glob="*.jpg")
    named = B.extract_features(media).join(media, "media_id").select(
        "meta.origin", "img_avg_red", "img_avg_green", "img_avg_blue",
        "img_width", "img_height",
    )
    feats = {
        r.origin: (
            round(r.img_avg_red, 4), round(r.img_avg_green, 4),
            round(r.img_avg_blue, 4), r.img_width, r.img_height,
        )
        for r in named.collect()
    }
    assert feats["photo_grad.jpg"] == (127.0052, 127.0729, 127.0273, 32, 24)
    assert feats["photo_rings.jpg"] == (133.554, 121.3848, 64.0046, 48, 32)
    assert len(feats) == 2


def test_audio_dir_features_pinned(spark):
    """mm5: binaryFile scan of the committed WAV fixtures -> stdlib
    decode -> features pinned against the generator's analytic
    waveforms (sine RMS = A/sqrt(2), square RMS = A, silence = 0)."""
    import math

    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal import audio as A
    from a3_fp_bigdata_spark.multimodal.binary_files import image_dir_source

    media = image_dir_source(spark, A.FIXTURE_DIR, glob="*.wav")
    named = A.extract_audio_features(media).join(media, "media_id").select(
        "meta.origin", "duration_s", "sample_rate", "n_channels", "rms", "peak"
    )
    feats = {
        r.origin: (r.duration_s, r.sample_rate, r.n_channels, r.rms, r.peak)
        for r in named.collect()
    }
    assert len(feats) == 3
    d, sr, nch, rms, peak = feats["tone_440.wav"]
    assert (d, sr, nch) == (1.0, 8000, 1)
    assert abs(rms - 0.5 / math.sqrt(2)) < 1e-3 and abs(peak - 0.5) < 1e-3
    d, sr, nch, rms, peak = feats["silence.wav"]
    assert (d, rms, peak) == (0.5, 0.0, 0.0)
    d, sr, nch, rms, peak = feats["square_220.wav"]
    assert d == 0.75 and abs(rms - 0.25) < 1e-3 and abs(peak - 0.25) < 1e-3

    # registered and deterministic
    q = registry.all_queries()["mm5_audio_dir_features"]
    a = [tuple(r) for r in q(spark, SF0001).collect()]
    assert a == [tuple(r) for r in q(spark, SF0001).collect()] and len(a) == 3

    # r12 scratch-oracle rewrite: the query now re-derives features
    # from materialized integer PCM rows via Spark SQL aggregation —
    # pin that this derivation equals the direct UDF float math
    # (extract_audio_features) on every fixture
    direct = {
        r.media_id: (r.duration_s, r.sample_rate, r.n_channels, r.rms, r.peak)
        for r in A.extract_audio_features(media).collect()
    }
    for row in a:
        assert direct[row[0]] == tuple(row[1:]), (row, direct[row[0]])

    # codec error contract
    with pytest.raises(ValueError):
        A.decode_wav(b"RIFFjunkWAVE")


def test_jpeg_codec_roundtrip_modes():
    """decode(encode(img)) stays within baseline-JPEG quantization error
    across 4:4:4 / 4:2:0 / restart-interval encodings, odd dims included."""
    from a3_fp_bigdata_spark.multimodal import jpeg_codec as J

    h, w = 29, 45
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (yy * 255 // (h - 1)).astype(np.uint8),
            (xx * 255 // (w - 1)).astype(np.uint8),
            ((yy + xx) * 255 // (h + w - 2)).astype(np.uint8),
        ],
        axis=2,
    )
    for kw, tol in [
        ({}, 8),
        ({"subsample": True}, 16),
        ({"restart_interval": 2}, 8),
        ({"subsample": True, "restart_interval": 1}, 16),
    ]:
        dec = J.decode_jpeg(J.encode_jpeg(img, quality=90, **kw))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= tol, (kw, err.max())
    # solid color survives exactly (DC-only blocks)
    solid = np.full((16, 16, 3), (200, 10, 30), np.uint8)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(solid)), solid)
    # unsupported shapes refuse loudly
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"not a jpeg")


def test_mm2_features_match_committed_golden(spark):
    """mm2 is a rows-only driver flagship (its stub-decode pixel math
    has no SQL oracle); this pins its FULL sf0.001 output against a
    committed golden parquet, so the evidence is 'value-exact vs a
    reviewed snapshot', not just 'ran'. Regenerate the golden file only
    for an intentional decoder change (see tests/golden/README)."""
    import os

    import pandas as pd

    from a3_fp_bigdata_spark import registry

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "mm2_features_sf0.001.parquet"
    )
    golden = pd.read_parquet(golden_path).sort_values("media_id")
    got = (
        registry.all_queries()["mm2_image_features"](spark, SF0001)
        .toPandas()
        .sort_values("media_id")
    )
    assert list(got.columns) == list(golden.columns)
    assert len(got) == len(golden)
    for c in ("media_id", "img_width", "img_height"):
        assert got[c].tolist() == golden[c].tolist(), c
    for c in ("img_avg_red", "img_avg_green", "img_avg_blue"):
        diff = (got[c].to_numpy() - golden[c].to_numpy())
        assert abs(diff).max() < 1e-9, c


def test_png_palette_codec_roundtrip_and_errors():
    """Color-type-3 decode: exact palette lookup on round-trip, loud
    ValueError on a missing PLTE and on indices past the palette."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from a3_fp_bigdata_spark.multimodal import png_codec as P

    pal = np.stack(
        [np.arange(8, dtype=np.uint8) * 30,
         255 - np.arange(8, dtype=np.uint8) * 20,
         np.arange(8, dtype=np.uint8) * 7],
        axis=1,
    )
    idx = (np.add.outer(np.arange(9), np.arange(13)) % 8).astype(np.uint8)
    out = P.decode_png(P.encode_palette_png(idx, pal))
    assert out.shape == (9, 13, 3)
    assert (out == pal[idx]).all()

    # index 7 with a 4-entry palette: out of range, not a silent wrap
    with pytest.raises(ValueError, match="palette index"):
        P.decode_png(
            P._SIGNATURE
            + P._chunk(b"IHDR", struct.pack(">IIBBBBB", 13, 9, 8, 3, 0, 0, 0))
            + P._chunk(b"PLTE", pal[:4].tobytes())
            + P._chunk(b"IDAT", zlib.compress(
                b"".join(b"\x00" + idx[y].tobytes() for y in range(9))))
            + P._chunk(b"IEND", b"")
        )

    # palette PNG with no PLTE chunk at all
    with pytest.raises(ValueError, match="PLTE"):
        P.decode_png(
            P._SIGNATURE
            + P._chunk(b"IHDR", struct.pack(">IIBBBBB", 13, 9, 8, 3, 0, 0, 0))
            + P._chunk(b"IDAT", zlib.compress(
                b"".join(b"\x00" + idx[y].tobytes() for y in range(9))))
            + P._chunk(b"IEND", b"")
        )


def test_gif_codec_roundtrip_and_compositing():
    """GIF87a/89a decode: LZW (incl. 12-bit table growth), interlace,
    multi-frame compositing with transparency and disposal; every
    strict prefix of a valid file raises (truncation never passes as a
    shorter animation)."""
    from a3_fp_bigdata_spark.multimodal import gif_codec as G

    rng = np.random.default_rng(7)

    # static few-color round trip, plain and interlaced
    img = rng.integers(0, 4, (23, 17, 3)).astype(np.uint8) * 60
    assert np.array_equal(G.decode_gif(G.encode_gif([img])), img)
    assert np.array_equal(
        G.decode_gif(G.encode_gif([img], interlace=True)), img
    )

    # full 256-entry palette forces the LZW table through 12-bit codes
    pal = np.unique(rng.integers(0, 256, (256, 3)).astype(np.uint8), axis=0)
    big = pal[rng.integers(0, len(pal), (64, 64))]
    assert np.array_equal(G.decode_gif(G.encode_gif([big])), big)

    # animation: frames after the first encode the background color as
    # transparent — the decoder's composite must reproduce each full
    # frame by painting over the previous canvas
    f0 = np.full((10, 12, 3), 200, np.uint8)
    f1 = f0.copy(); f1[2:5, 3:7] = (10, 20, 30)
    f2 = f1.copy(); f2[7:9, 0:4] = (90, 0, 90)
    g = G.encode_gif([f0, f1, f2], transparent_color=(200, 200, 200))
    dec = G.decode_gif_frames(g)
    assert len(dec) == 3
    for got, want in zip(dec, [f0, f1, f2]):
        assert np.array_equal(got, want)

    # decode_image dispatch: image/gif -> frame 0 without PIL
    assert np.array_equal(M.decode_image(g, "image/gif"), f0)

    # truncation and garbage fail loudly at every cut point
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif_frames(b"NOPE")
    for cut in range(6, len(g)):
        with pytest.raises(ValueError):
            G.decode_gif_frames(g[:cut])

    # raw LZW round trip at a non-trivial alphabet
    stream = rng.integers(0, 256, 70000).astype(np.uint8).tobytes()
    assert G._lzw_decode(G._lzw_encode(stream, 8), 8, len(stream)) == stream


def test_gif_subrect_first_frame_and_disposal2():
    """PIL-convention compositing on frames that do NOT cover the
    logical screen: the initial canvas is zero-filled (black), so a
    sub-rectangle first frame is surrounded by black — not by the
    file's background color; disposal 2 then restores the frame's
    rectangle to the background COLOR before the next frame paints.
    The GIF is assembled block-by-block here (descriptor offsets, GCE
    bytes) rather than through encode_gif, which only emits
    full-canvas frames."""
    import struct

    from a3_fp_bigdata_spark.multimodal import gif_codec as G

    W, H = 8, 6
    # global palette: idx0 = background (blue), idx1 = red, idx2 = green
    pal = b"\x00\x00\xff" + b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\x00"
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", W, H, 0x80 | 1, 0, 0)  # 4-entry GCT, bg=0
    out += pal

    def image(left, top, w, h, indices, disposal):
        buf = bytearray(
            bytes([0x21, 0xF9, 4, disposal << 2, 0, 0, 0, 0])
        )  # GCE: disposal, no transparency
        buf += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        buf.append(2)  # min code size
        stream = G._lzw_encode(bytes(indices), 2)
        buf.append(len(stream))
        buf += stream
        buf.append(0)
        return buf

    # frame 0: 3x2 red rect at (2,1), disposal=2 (restore bg after)
    out += image(2, 1, 3, 2, [1] * 6, disposal=2)
    # frame 1: 2x1 green rect at (0,0), disposal=0
    out += image(0, 0, 2, 1, [2] * 2, disposal=0)
    out.append(0x3B)

    frames = G.decode_gif_frames(bytes(out))
    assert len(frames) == 2
    f0, f1 = frames
    # frame 0: red rect; EVERYTHING else black (zero-filled canvas,
    # NOT the blue background color)
    assert (f0[1:3, 2:5] == (255, 0, 0)).all()
    mask = np.ones((H, W), bool)
    mask[1:3, 2:5] = False
    assert (f0[mask] == 0).all()
    # frame 1: disposal 2 restored frame 0's rect to the BACKGROUND
    # color (blue), then the green rect painted at the origin
    assert (f1[0, 0:2] == (0, 255, 0)).all()
    assert (f1[1:3, 2:5] == (0, 0, 255)).all()
    mask2 = np.ones((H, W), bool)
    mask2[1:3, 2:5] = False
    mask2[0, 0:2] = False
    assert (f1[mask2] == 0).all()


def test_encode_gif_rejects_unpaintable_transparent_color():
    """encode_gif must refuse a transparent_color that appears in no
    frame: the palette is built from frame pixels, so the color has no
    index — the old silent fallback made the background index lie to
    disposal-2 restores."""
    from a3_fp_bigdata_spark.multimodal import gif_codec as G

    frames = [np.full((4, 4, 3), 200, np.uint8)]
    with pytest.raises(ValueError, match="transparent_color"):
        G.encode_gif(frames, transparent_color=(1, 2, 3))


def test_binaryfile_gif_fixture_features(spark):
    """The two committed GIF fixtures decode through the pure-python
    codec inside the Spark pipeline (mm4's glob includes *.gif); the
    animated fixture contributes its FIRST frame. Pins are
    tools/make_gif_fixtures.py's printed values — GIF is lossless
    palettized color, so they are PIL-safe like the PNG pins."""
    from a3_fp_bigdata_spark.multimodal import binary_files as B

    media = B.image_dir_source(spark, B.FIXTURE_DIR, glob="*.gif")
    named = B.extract_features(media).join(media, "media_id").select(
        "meta.origin", "img_avg_red", "img_avg_green", "img_avg_blue",
        "img_width", "img_height",
    )
    feats = {
        r.origin: (
            round(r.img_avg_red, 4), round(r.img_avg_green, 4),
            round(r.img_avg_blue, 4), r.img_width, r.img_height,
        )
        for r in named.collect()
    }
    # static interlaced, 32-entry palette
    assert feats["icon_spiral.gif"] == (119.4044, 150.3834, 89.7681, 33, 26)
    # animation -> frame 0 (solid background)
    assert feats["anim_pulse.gif"] == (40.0, 40.0, 40.0, 24, 16)
    assert len(feats) == 2


def test_mm6_gif_frame_features_pinned(spark):
    """mm6: the real-container frame explode — anim_pulse.gif fans out
    to its 4 composited frames, icon_spiral.gif to 1; per-frame channel
    means pinned to the fixture generator's analytic values."""
    from a3_fp_bigdata_spark import registry

    q = registry.all_queries()["mm6_gif_frame_features"]
    rows = q(spark, SF0001).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in q(spark, SF0001).collect()]
    # media_id hashes the filename; recover origin via n_frames (4 vs 1)
    anim = [r for r in rows if r.n_frames == 4]
    static = [r for r in rows if r.n_frames == 1]
    assert len(anim) == 4 and len(static) == 1
    assert [r.frame_idx for r in anim] == [0, 1, 2, 3]
    pins = [
        (40.0, 40.0, 40.0),
        (58.2292, 45.7292, 37.3958),
        (76.4583, 55.625, 34.7917),
        (94.6875, 69.6875, 32.1875),
    ]
    for r, (pr, pg, pb) in zip(anim, pins):
        assert (
            round(r.img_avg_red, 4), round(r.img_avg_green, 4),
            round(r.img_avg_blue, 4), r.img_width, r.img_height,
        ) == (pr, pg, pb, 24, 16)
    s = static[0]
    assert (
        round(s.img_avg_red, 4), round(s.img_avg_green, 4),
        round(s.img_avg_blue, 4), s.img_width, s.img_height,
    ) == (119.4044, 150.3834, 89.7681, 33, 26)


def test_gif_lzw_foreign_encoder_variants():
    """Real-world GIFs come from encoders we didn't write. Two spec-
    legal variants our encoder never emits must still decode: (a) a
    'deferred clear' stream that fills the 12-bit table and keeps
    going without ever resetting (the table freezes at 4096 — decoders
    that keep growing their table desync), and (b) a stream that emits
    CLEAR mid-stream at an arbitrary point."""
    from a3_fp_bigdata_spark.multimodal import gif_codec as G

    # (a) deferred clear: encoder that freezes its table at 4096
    def encode_frozen(indices: bytes, min_code: int) -> bytes:
        clear, end = 1 << min_code, (1 << min_code) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code, code_size = end + 1, min_code + 1
        out, acc, nbits = bytearray(), 0, 0

        def emit(code: int) -> None:
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += code_size
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        w = b""
        for b in indices:
            wk = w + bytes([b])
            if wk in table:
                w = wk
                continue
            emit(table[w])
            if next_code < (1 << 12):  # freeze, never reset
                table[wk] = next_code
                next_code += 1
                if next_code - 1 == (1 << code_size) and code_size < 12:
                    code_size += 1
            w = bytes([b])
        if w:
            emit(table[w])
        emit(end)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    rng = np.random.default_rng(11)
    # enough entropy to overflow 4096 table entries at 8-bit codes
    idx = rng.integers(0, 256, 60000).astype(np.uint8).tobytes()
    got = G._lzw_decode(encode_frozen(idx, 8), 8, len(idx))
    assert got == idx

    # (b) mid-stream CLEAR + full table reset: a high-entropy stream
    # long enough to wrap the 12-bit table more than twice forces our
    # encoder to emit CLEAR at arbitrary mid-stream points, exercising
    # the decoder's reset path (fresh table, narrow code size, prev
    # dropped) several times in one image
    idx2 = rng.integers(0, 256, 150000).astype(np.uint8).tobytes()
    enc2 = G._lzw_encode(idx2, 8)
    assert G._lzw_decode(enc2, 8, len(idx2)) == idx2


# ---------------------------------------------------------------------------
# mm7: perceptual-hash image near-dup
# ---------------------------------------------------------------------------


def test_dhash64_bit_level_independent():
    """dhash64 pinned bit-by-bit against an inline re-derivation with
    explicit loops (no shared pooling/packing code): same luma, same
    integer-boundary tiling, same gradient rule — any drift in the
    engine's vectorized math shows up as a differing bit index."""
    from a3_fp_bigdata_spark.multimodal import phash as P

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (21, 30, 3)).astype(np.uint8)

    # independent: per-cell Python loops over the 8x9 tiling
    h, w = 21, 30
    g = [
        [
            0.299 * float(arr[y, x, 0])
            + 0.587 * float(arr[y, x, 1])
            + 0.114 * float(arr[y, x, 2])
            for x in range(w)
        ]
        for y in range(h)
    ]
    rb = [(r * h) // 8 for r in range(8)] + [h]
    cb = [(c * w) // 9 for c in range(9)] + [w]
    pooled = [
        [
            sum(
                g[y][x]
                for y in range(rb[r], rb[r + 1])
                for x in range(cb[c], cb[c + 1])
            )
            / ((rb[r + 1] - rb[r]) * (cb[c + 1] - cb[c]))
            for c in range(9)
        ]
        for r in range(8)
    ]
    want = 0
    for r in range(8):
        for c in range(8):
            if pooled[r][c] > pooled[r][c + 1]:
                want |= 1 << (r * 8 + c)
    if want >= 1 << 63:
        want -= 1 << 64
    assert P.dhash64(arr) == want


def test_dhash64_invariances():
    """The two planted-twin perturbations are invariances BY DESIGN:
    a uniform brightness shift without clipping preserves every
    gradient sign (distance 0); a same-pixel re-encode is trivially
    distance 0; and scaling 2x preserves the pooled grid closely
    (small distance)."""
    from a3_fp_bigdata_spark.multimodal import phash as P

    rng = np.random.default_rng(9)
    base = rng.integers(40, 200, (16, 24, 3)).astype(np.uint8)

    def dist(a, b):
        return bin(
            (P.dhash64(a) & (2**64 - 1)) ^ (P.dhash64(b) & (2**64 - 1))
        ).count("1")

    bright = np.clip(base.astype(np.int16) + 15, 0, 255).astype(np.uint8)
    assert dist(base, bright) == 0
    # scaling is approximate, not exact: 2x changes the integer tile
    # boundaries when dims aren't multiples of the 8x9 grid, flipping
    # a few near-tie gradients — but it stays within pairing radius
    from a3_fp_bigdata_spark.multimodal.phash import IMG_NEARDUP_MAX_HAMMING

    up = M.resize_nn(base, 32, 48)
    assert dist(base, up) <= IMG_NEARDUP_MAX_HAMMING


def test_mm7_planted_pairs_exact(spark):
    """mm7 recovers EXACTLY the generator's planted perturbed twins
    (tools/make_image_neardup_fixtures.py prints this list): the
    re-encoded copies at hamming 0, the brightness shifts at 0, the
    lossy JPEG twin at 4 — and no false pair among the 70 non-planted
    combinations (13 images; the waves triple is an identical-pixel
    PNG/PNG/BMP triangle, so all three of its pairs are planted, and
    the noise base carries an identical-pixel TIFF twin). Ground truth is the fixture CONSTRUCTION, not the
    hash under test."""
    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal.binary_files import image_dir_source
    from a3_fp_bigdata_spark.multimodal.phash import NEARDUP_FIXTURE_DIR

    q = registry.all_queries()["mm7_image_near_dup"]
    rows = q(spark, SF0001).collect()
    origin = {
        r.media_id: r.meta.origin
        for r in image_dir_source(
            spark, NEARDUP_FIXTURE_DIR, glob="*.{png,jpg,jpeg,gif,bmp,tif,tiff}"
        )
        .select("media_id", "meta")
        .collect()
    }
    got = {
        (*sorted((origin[r.media_a], origin[r.media_b])), r.hamming)
        for r in rows
    }
    assert got == {
        ("nd_blobs.png", "nd_blobs_lossy.jpg", 4),
        ("nd_grad.png", "nd_grad_bright.png", 0),
        ("nd_noise.png", "nd_noise_tiff.tif", 0),
        ("nd_rings.png", "nd_rings_copy.gif", 0),
        ("nd_stripes.png", "nd_stripes_dim.png", 0),
        ("nd_waves.png", "nd_waves_bmp.bmp", 0),
        ("nd_waves.png", "nd_waves_copy.png", 0),
        ("nd_waves_bmp.bmp", "nd_waves_copy.png", 0),
    }


# ---------------------------------------------------------------------------
# foreign-encoder GIF fixtures (bytes no repo tool generated)
# ---------------------------------------------------------------------------

FOREIGN_DIR = __import__("os").path.join(
    __import__("os").path.dirname(M.__file__), "fixtures", "foreign"
)


def test_foreign_anim_disposal23_composites():
    """The hand-assembled foreign-style animation (local palettes,
    sub-rectangle frames, disposal 1/2/3, transparency, uncompressed
    fixed-width LZW — see fixtures/foreign/README.md) decodes to
    EXACTLY the composites the generator derived with its own
    spec-rule numpy logic. This pins the compositing/disposal paths
    against bytes the encoder under test cannot produce."""
    import os

    from a3_fp_bigdata_spark.multimodal import gif_codec as G

    payload = open(
        os.path.join(FOREIGN_DIR, "anim_disposal23.gif"), "rb"
    ).read()
    # structural sanity straight off the bytes: two local color tables
    # and all three disposal methods present
    gces = [
        payload[i + 3] for i in range(len(payload) - 3)
        if payload[i] == 0x21 and payload[i + 1] == 0xF9
    ]
    assert {(g >> 2) & 7 for g in gces} == {1, 2, 3}
    frames = G.decode_gif_frames(payload)
    exp = np.load(
        os.path.join(
            os.path.dirname(__file__), "golden", "foreign_anim_frames.npz"
        )
    )
    assert len(frames) == 4
    for i, got in enumerate(frames):
        assert np.array_equal(got, exp[f"frame_{i}"]), f"frame {i}"


def test_foreign_static_gifs_through_spark_pipeline(spark):
    """Real-world GIF89a icons from the CPython distribution (written
    by foreign encoders: transparency on frame 0, folder.gif also
    interlaced) decode through the full Spark plumbing — binaryFile
    scan -> mapInPandas -> features. Pins are regression values from
    the pure-python decoder under the zero-filled-canvas convention
    (transparent first-frame pixels stay black)."""
    from a3_fp_bigdata_spark.multimodal import binary_files as B

    if M.HAVE_PIL:
        pytest.skip("pins are pure-python-decoder-specific under PIL")
    media = B.image_dir_source(spark, FOREIGN_DIR, glob="*.gif")
    named = B.extract_features(media).join(media, "media_id").select(
        "meta.origin", "img_avg_red", "img_avg_green", "img_avg_blue",
        "img_width", "img_height",
    )
    feats = {
        r.origin: (
            round(r.img_avg_red, 4), round(r.img_avg_green, 4),
            round(r.img_avg_blue, 4), r.img_width, r.img_height,
        )
        for r in named.collect()
    }
    assert feats["python.gif"] == (91.5898, 97.1484, 67.4453, 16, 16)
    assert feats["folder.gif"] == (178.7026, 173.041, 95.3179, 15, 13)
    assert feats["anim_disposal23.gif"] == (122.5, 122.5, 85.0, 20, 14)
    assert len(feats) == 3


# ---------------------------------------------------------------------------
# BMP codec (pure python, multimodal/bmp_codec.py)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_various_shapes():
    """encode_bmp -> decode_bmp is the identity for 24-bit RGB, across
    widths that exercise every 4-byte row-padding remainder."""
    import numpy as np

    from a3_fp_bigdata_spark.multimodal.bmp_codec import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (8, 8), (7, 13), (16, 31), (5, 2)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(arr)), arr), (h, w)


def _bmp_header(w, h, bpp, pix_off, compression=0, colors_used=0):
    import struct

    return struct.pack(
        "<2sIHHI", b"BM", 0, 0, 0, pix_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, 0, 0, 0,
        colors_used, 0,
    )


def test_bmp_decodes_topdown_32bit_and_paletted():
    """Hand-assembled foreign-layout BMPs (bytes encode_bmp never
    produces): negative-height top-down 32-bit BGRA, an 8-bit paletted
    image, and a 4-bit paletted image with padded rows."""
    import numpy as np

    from a3_fp_bigdata_spark.multimodal.bmp_codec import decode_bmp

    # --- top-down 32-bit: 2 rows x 1 col, first stored row IS row 0
    px = bytes([255, 0, 0, 0,   0, 0, 255, 0])  # BGRA: blue px, red px
    data = _bmp_header(1, -2, 32, 14 + 40) + px
    out = decode_bmp(data)
    assert out.shape == (2, 1, 3)
    assert tuple(out[0, 0]) == (0, 0, 255)  # blue first (top-down)
    assert tuple(out[1, 0]) == (255, 0, 0)

    # --- 8-bit paletted, bottom-up, 2x2: palette BGRX
    pal = bytes([0, 0, 255, 0,  0, 255, 0, 0,  255, 0, 0, 0])  # R,G,B
    rows = bytes([2, 1, 0, 0]) + bytes([0, 2, 0, 0])  # padded to 4
    data = _bmp_header(2, 2, 8, 14 + 40 + 12, colors_used=3) + pal + rows
    out = decode_bmp(data)
    assert out.shape == (2, 2, 3)
    # bottom-up: stored row 0 is IMAGE row 1
    assert tuple(out[1, 0]) == (0, 0, 255)   # index 2 -> blue
    assert tuple(out[1, 1]) == (0, 255, 0)   # index 1 -> green
    assert tuple(out[0, 0]) == (255, 0, 0)   # index 0 -> red
    assert tuple(out[0, 1]) == (0, 0, 255)   # index 2 -> blue

    # --- 4-bit paletted, 3 px wide (nibbles MSB-first + padding)
    rows4 = bytes([0x12, 0x00, 0, 0])  # indices 1,2,0 across 3 px
    data = _bmp_header(3, -1, 4, 14 + 40 + 12, colors_used=3) + pal + rows4
    out = decode_bmp(data)
    assert out.shape == (1, 3, 3)
    assert tuple(out[0, 0]) == (0, 255, 0)   # 1 -> green
    assert tuple(out[0, 1]) == (0, 0, 255)   # 2 -> blue
    assert tuple(out[0, 2]) == (255, 0, 0)   # 0 -> red


def test_bmp_rejects_compressed_and_truncated():
    import numpy as np
    import pytest as _pytest

    from a3_fp_bigdata_spark.multimodal.bmp_codec import (
        decode_bmp,
        encode_bmp,
    )

    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_bmp(arr)
    with _pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(_bmp_header(2, 2, 8, 54, compression=1) + b"\0" * 64)
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-3])
    with _pytest.raises(ValueError, match="magic"):
        decode_bmp(b"notabmp" + bytes(64))
    with _pytest.raises(ValueError, match="palette capacity"):
        decode_bmp(
            _bmp_header(1, 1, 8, 54, colors_used=500) + b"\0" * 2048
        )


def test_decode_image_dispatches_bmp():
    import numpy as np

    from a3_fp_bigdata_spark.multimodal.bmp_codec import encode_bmp
    from a3_fp_bigdata_spark.multimodal.images import HAVE_PIL, decode_image

    if HAVE_PIL:  # container has no PIL; guard for dev boxes that do
        return
    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(decode_image(encode_bmp(arr), "image/bmp"), arr)


# ---------------------------------------------------------------------------
# TIFF codec (pure python, multimodal/tiff_codec.py)
# ---------------------------------------------------------------------------


def test_tiff_roundtrip_various_shapes():
    import numpy as np

    from a3_fp_bigdata_spark.multimodal.tiff_codec import (
        decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(13)
    for h, w in [(1, 1), (3, 5), (8, 8), (7, 13), (16, 31)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(arr)), arr), (h, w)


def _tiff_be(entries, tail, pix):
    """Hand-assemble a BIG-endian TIFF: header | pixel data | IFD."""
    import struct

    ifd_off = 8 + len(pix)
    ifd = struct.pack(">H", len(entries))
    for tag, typ, count, val in entries:
        if typ == 3 and count == 1:
            ifd += struct.pack(">HHIHH", tag, typ, count, val, 0)
        else:
            ifd += struct.pack(">HHII", tag, typ, count, val)
    ifd += struct.pack(">I", 0)
    return struct.pack(">2sHI", b"MM", 42, ifd_off) + pix + ifd + tail


def test_tiff_decodes_bigendian_gray_palette_and_multistrip():
    """Hand-assembled foreign-layout TIFFs (bytes encode_tiff never
    produces): big-endian grayscale in BOTH photometric polarities,
    palette-color with a 16-bit ColorMap, and a little-endian
    two-strip RGB image."""
    import struct

    import numpy as np

    from a3_fp_bigdata_spark.multimodal.tiff_codec import decode_tiff

    # --- big-endian 2x2 grayscale, BlackIsZero then WhiteIsZero
    pix = bytes([0, 64, 128, 255])
    for photo, want00 in ((1, 0), (0, 255)):
        data = _tiff_be(
            [(256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8),
             (259, 3, 1, 1), (262, 3, 1, photo), (273, 4, 1, 8),
             (277, 3, 1, 1), (279, 4, 1, 4)],
            b"", pix,
        )
        out = decode_tiff(data)
        assert out.shape == (2, 2, 3)
        assert out[0, 0, 0] == want00 and out[0, 0, 0] == out[0, 0, 2]

    # --- big-endian 1x3 palette-color (ColorMap entries are 16-bit;
    #     65535 -> 255 after the /257 fold)
    cmap_off = 8 + 4  # pix padded to 4 for alignment
    cmap = struct.pack(
        ">24H",
        65535, 0, 0, 0, 0, 0, 0, 0,   # red plane (8 entries)
        0, 65535, 0, 0, 0, 0, 0, 0,   # green plane
        0, 0, 65535, 0, 0, 0, 0, 0,   # blue plane
    )
    data = _tiff_be(
        [(256, 3, 1, 3), (257, 3, 1, 1), (258, 3, 1, 8),
         (259, 3, 1, 1), (262, 3, 1, 3), (273, 4, 1, 8),
         (277, 3, 1, 1), (279, 4, 1, 3),
         (320, 3, 24, cmap_off + 2 + 9 * 12 + 4)],
        b"", bytes([0, 1, 2]) + b"\0",
    )
    # ColorMap data lives AFTER the IFD: recompute its real offset
    # (header 8 + pix 4 + count 2 + 9 entries * 12 + next-IFD 4)
    out = decode_tiff(data + cmap)
    assert out.shape == (1, 3, 3)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[0, 1]) == (0, 255, 0)
    assert tuple(out[0, 2]) == (0, 0, 255)

    # --- little-endian 2x2 RGB split into two strips
    import struct as st

    pix = bytes(range(12))
    ifd_off = 8 + 12
    tail_off = ifd_off + 2 + 8 * 12 + 4  # 8 IFD entries + next-IFD ptr
    entries = [
        (256, 4, 1, 2), (257, 4, 1, 2), (258, 3, 3, tail_off),
        (259, 3, 1, 1), (262, 3, 1, 2),
        (273, 4, 2, tail_off + 6),
        (277, 3, 1, 3), (279, 4, 2, tail_off + 6 + 8),
    ]
    ifd = st.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        ifd += st.pack("<HHII", tag, typ, count, val)
    ifd += st.pack("<I", 0)
    tail = (
        st.pack("<3H", 8, 8, 8)
        + st.pack("<2I", 8, 8 + 6)        # strip offsets
        + st.pack("<2I", 6, 6)            # strip byte counts
    )
    data = st.pack("<2sHI", b"II", 42, ifd_off) + pix + ifd + tail
    out = decode_tiff(data)
    assert out.shape == (2, 2, 3)
    assert np.array_equal(out.reshape(-1), np.arange(12, dtype=np.uint8))


def test_tiff_rejects_compressed_tiled_planar():
    import struct

    import pytest as _pytest

    from a3_fp_bigdata_spark.multimodal.tiff_codec import decode_tiff

    def mk(extra):
        """1x1 big-endian gray TIFF with `extra` IFD entries. SHORT
        values are left-justified in the 4-byte field per the spec."""
        entries = sorted(
            [(256, 3, 1, 1), (257, 3, 1, 1), (258, 3, 1, 8),
             (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1),
             (279, 4, 1, 1)] + extra
        )
        ifd = struct.pack(">H", len(entries))
        for tag, typ, count, val in entries:
            if typ == 3:
                ifd += struct.pack(">HHIHH", tag, typ, count, val, 0)
            else:
                ifd += struct.pack(">HHII", tag, typ, count, val)
        ifd += struct.pack(">I", 0)
        return struct.pack(">2sHI", b"MM", 42, 12) + b"\0\0\0\0" + ifd

    with _pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(mk([(259, 3, 1, 7)]))  # JPEG-in-TIFF (5/32773 decode now)
    with _pytest.raises(NotImplementedError, match="tiled"):
        decode_tiff(mk([(259, 3, 1, 1), (324, 4, 1, 8)]))
    with _pytest.raises(NotImplementedError, match="planar"):
        decode_tiff(mk([(259, 3, 1, 1), (284, 3, 1, 2)]))
    with _pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(16))
    with _pytest.raises(ValueError, match="ColorMap"):
        decode_tiff(mk([(259, 3, 1, 1), (262, 3, 1, 3)]))


def test_mm8_cluster_partition_and_keeper(spark):
    """mm8 collapses the planted pairs to EXACTLY the generator's
    groups — five twin pairs plus the waves PNG/PNG/BMP triangle (A~B,
    A~C, B~C all planted, must become ONE cluster) — with one keeper
    per cluster, the min media_id, which is also the cluster_id.
    Ground truth is the fixture construction, not the hash under
    test."""
    from collections import defaultdict

    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal.binary_files import image_dir_source
    from a3_fp_bigdata_spark.multimodal.phash import NEARDUP_FIXTURE_DIR

    rows = registry.all_queries()["mm8_image_dedup_clusters"](
        spark, SF0001
    ).collect()
    origin = {
        r.media_id: r.meta.origin
        for r in image_dir_source(
            spark, NEARDUP_FIXTURE_DIR, glob="*.{png,jpg,jpeg,gif,bmp,tif,tiff}"
        )
        .select("media_id", "meta")
        .collect()
    }
    assert len(rows) == len(origin) == 13  # one row per image
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.cluster_id].append(r)
    got = {frozenset(origin[r.media_id] for r in rs) for rs in clusters.values()}
    assert got == {
        frozenset({"nd_blobs.png", "nd_blobs_lossy.jpg"}),
        frozenset({"nd_grad.png", "nd_grad_bright.png"}),
        frozenset({"nd_noise.png", "nd_noise_tiff.tif"}),
        frozenset({"nd_rings.png", "nd_rings_copy.gif"}),
        frozenset({"nd_stripes.png", "nd_stripes_dim.png"}),
        frozenset(
            {"nd_waves.png", "nd_waves_bmp.bmp", "nd_waves_copy.png"}
        ),
    }
    for cid, rs in clusters.items():
        keepers = [r for r in rs if r.is_keeper]
        assert len(keepers) == 1, (cid, rs)
        assert keepers[0].media_id == min(r.media_id for r in rs) == cid


# ---------------------------------------------------------------------------
# mm9: envelope-hash audio near-dup
# ---------------------------------------------------------------------------


def test_envelope_hash64_bit_level_independent():
    """envelope_hash64 pinned bit-by-bit against an inline
    re-derivation with explicit Python loops (no shared pooling/
    packing code): same mono mix, same integer-boundary 65-window
    tiling, same gradient rule — any drift in the engine's vectorized
    math shows up as a differing bit index."""
    from a3_fp_bigdata_spark.multimodal import audio_fp as AF

    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, (1000, 2))

    mono = [abs((float(a) + float(b)) / 2.0) for a, b in x]
    n = len(mono)
    b = [(i * n) // 65 for i in range(65)] + [n]
    w = [
        sum(mono[b[i] : b[i + 1]]) / (b[i + 1] - b[i])
        for i in range(65)
    ]
    want = 0
    for i in range(64):
        if w[i] > w[i + 1]:
            want |= 1 << i
    if want >= 1 << 63:
        want -= 1 << 64
    assert AF.envelope_hash64(x) == want


def test_envelope_hash64_invariances():
    """The planted-twin perturbations are invariances BY DESIGN: a
    positive gain preserves every window comparison (distance 0); an
    exact-fraction linear resample preserves the window means closely
    (small distance, inside pairing radius)."""
    from a3_fp_bigdata_spark.multimodal import audio_fp as AF

    rng = np.random.default_rng(12)
    levels = rng.uniform(0.1, 0.95, 65)
    env = np.repeat(levels, 160)
    t = np.arange(env.shape[0]) / 8000.0
    base = (env * np.sin(2 * np.pi * 440.0 * t)).reshape(-1, 1)

    def dist(a, b):
        return bin(
            (AF.envelope_hash64(a) & (2**64 - 1))
            ^ (AF.envelope_hash64(b) & (2**64 - 1))
        ).count("1")

    assert dist(base, base * 0.3) == 0
    # linear 2x upsample: window boundaries stay at the same clip
    # fractions, so means shift only by interpolation smoothing
    n = base.shape[0]
    src = np.arange(n * 2) / 2.0
    i0 = np.minimum(src.astype(np.int64), n - 1)
    i1 = np.minimum(i0 + 1, n - 1)
    frac = (src - i0)[:, None]
    up = base[i0] * (1 - frac) + base[i1] * frac
    assert dist(base, up) <= AF.AUDIO_NEARDUP_MAX_HAMMING


def test_mm9_planted_pairs_exact(spark):
    """mm9 recovers EXACTLY the generator's planted perturbed twins
    (tools/make_audio_neardup_fixtures.py prints this list): the gain/
    resample/noise/copy twins at hamming 0, the level-swap variant at
    4 (nonzero — exercises the radius), and no false pair among the
    non-planted combinations (11 clips). Ground truth is the fixture
    CONSTRUCTION, not the hash under test."""
    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal.audio_fp import (
        AUDIO_NEARDUP_FIXTURE_DIR,
    )
    from a3_fp_bigdata_spark.multimodal.binary_files import image_dir_source

    q = registry.all_queries()["mm9_audio_near_dup"]
    rows = q(spark, SF0001).collect()
    origin = {
        r.media_id: r.meta.origin
        for r in image_dir_source(
            spark, AUDIO_NEARDUP_FIXTURE_DIR, glob="*.wav"
        )
        .select("media_id", "meta")
        .collect()
    }
    got = {
        (*sorted((origin[r.media_a], origin[r.media_b])), r.hamming)
        for r in rows
    }
    assert got == {
        ("ad_walk1.wav", "ad_walk1_gain.wav", 0),
        ("ad_walk2.wav", "ad_walk2_resamp.wav", 0),
        ("ad_walk3.wav", "ad_walk3_noise.wav", 0),
        ("ad_walk4.wav", "ad_walk4_copy.wav", 0),
        ("ad_walk5.wav", "ad_walk5_var.wav", 4),
    }


def test_mm10_audio_clusters_partition_and_keeper(spark):
    """mm10 labels every fixture clip exactly once, components are
    precisely the planted twin groups (each pair collapses to one
    2-clip cluster; the singleton base clip stays alone), and the
    keeper is the min-id member of each cluster — the same contract
    test_mm8_cluster_partition_and_keeper pins for images."""
    from collections import defaultdict

    from a3_fp_bigdata_spark import registry

    rows = registry.all_queries()["mm10_audio_dedup_clusters"](
        spark, SF0001
    ).collect()
    # 11 fixture clips, one row each
    assert len(rows) == 11
    assert len({r.media_id for r in rows}) == 11

    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.cluster_id].append(r)
    # 5 planted pairs + 1 unpaired base clip = 6 components
    sizes = sorted(len(v) for v in by_cluster.values())
    assert sizes == [1, 2, 2, 2, 2, 2]
    for cid, rs in by_cluster.items():
        keepers = [r for r in rs if r.is_keeper]
        assert len(keepers) == 1, (cid, rs)
        assert keepers[0].media_id == min(r.media_id for r in rs) == cid


def test_mm11_split_leakage_flags_exactly_the_straddlers(spark):
    """mm11 = (mm7 ∪ mm9 pairs) filtered to pairs straddling the media
    split — re-derived independently here from the pair queries plus
    the predicate arithmetic, with BOTH modalities contributing leaks
    AND non-leaks (the fixture pct was chosen to exercise both
    directions of the filter)."""
    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal.phash import MEDIA_VAL_PCT
    from a3_fp_bigdata_spark.operators.text_analysis import (
        SAMPLE_MULT,
        SAMPLE_PREMOD,
    )

    def is_val(m: int) -> bool:
        return (abs(m) % SAMPLE_PREMOD) * SAMPLE_MULT % 100 < MEDIA_VAL_PCT

    qs = registry.all_queries()
    want = set()
    skipped = {"image": 0, "audio": 0}
    for modality, qname in (
        ("image", "mm7_image_near_dup"),
        ("audio", "mm9_audio_near_dup"),
    ):
        for r in qs[qname](spark, SF0001).collect():
            va, vb = is_val(r.media_a), is_val(r.media_b)
            if va == vb:
                skipped[modality] += 1
                continue
            train, val = (
                (r.media_b, r.media_a) if va else (r.media_a, r.media_b)
            )
            want.add((modality, train, val, r.hamming))

    got = {
        (r.modality, r.train_media, r.val_media, r.hamming)
        for r in qs["mm11_media_split_leakage"](spark, SF0001).collect()
    }
    assert got == want
    # every flagged train_media really is train-side, val_media val-side
    for _, train, val, _ in got:
        assert not is_val(train) and is_val(val)
    # both modalities leak AND both have same-side pairs the audit
    # correctly leaves alone
    assert {m for m, *_ in got} == {"image", "audio"}
    assert skipped["image"] >= 1 and skipped["audio"] >= 1


def test_progressive_jpeg_decodes_bit_exact():
    """SOF2 support, pinned the foreign-GIF way: the fixtures come
    from tools/make_progressive_jpeg.py — an INDEPENDENT encoder (own
    DCT, non-Annex-K quantizers, EOBn-bearing fixed-length Huffman
    tables, own bit writer) emitting byte shapes the repo encoder
    cannot produce. Two pins per fixture, both exact:
    decode(progressive) == decode(baseline twin built from the SAME
    quantized coefficients) — a float-free proof the scan machinery
    (DC/AC first + refine, EOB runs, restarts) reconstructs the exact
    coefficient grid — and == the generator's own dequant+IDCT+color
    ground truth."""
    import numpy as np

    from a3_fp_bigdata_spark.multimodal.jpeg_codec import decode_jpeg
    from tools.make_progressive_jpeg import build_color420, build_gray

    cases = [
        build_gray(),                        # 2-band Al=1 script
        build_gray(restart=3),               # restarts inside EVERY scan
        build_gray(al_first=2),              # stacked AC refinement
        build_gray(al_first=2, restart=2),   # both at once
        build_gray(h=40, w=33, seed=123),    # multi-block rows
        build_color420(),                    # interleaved DC + 4:2:0
        build_color420(h=9, w=31, seed=3),
    ]
    for prog, base, expected in cases:
        got = decode_jpeg(prog)
        assert np.array_equal(got, decode_jpeg(base))
        assert np.array_equal(got, expected)


def test_progressive_jpeg_truncation_raises():
    """A progressive stream cut mid-scan (and one cut before any scan)
    surfaces as the documented ValueError, never a raw internal
    error."""
    import pytest

    from a3_fp_bigdata_spark.multimodal.jpeg_codec import decode_jpeg
    from tools.make_progressive_jpeg import build_gray

    prog, _, _ = build_gray()
    with pytest.raises(ValueError):
        decode_jpeg(prog[: len(prog) // 2] )
    sof2 = prog.find(b"\xff\xc2")
    with pytest.raises(ValueError):
        decode_jpeg(prog[: sof2 + 10])


def test_vp8l_webp_decodes_bit_exact():
    """Lossless-WebP support, pinned the foreign-fixture way: streams
    come from tools/make_vp8l.py (independent bit writer, canonical
    code construction, and FORWARD transform passes), and because
    VP8L is lossless the expectation is absolute — decode_webp must
    reproduce the generator's source pixels EXACTLY across literals,
    LZ77 copies, color-cache hits, simple + full prefix codes, and
    all four transforms (predictor, cross-color, subtract-green,
    palette), plus a two-group meta prefix image."""
    import numpy as np

    from a3_fp_bigdata_spark.multimodal.images import decode_image
    from a3_fp_bigdata_spark.multimodal.webp_codec import decode_webp
    from tools.make_vp8l import (
        build_cross_color,
        build_meta_groups,
        build_palette,
        build_plain,
        build_predicted,
    )

    for builder in (
        build_plain,
        build_predicted,
        build_cross_color,
        build_palette,
        build_meta_groups,
    ):
        data, expected = builder()
        assert np.array_equal(decode_webp(data), expected), builder
    # dispatch through the media-schema decode path too
    data, expected = build_plain(seed=77)
    assert np.array_equal(decode_image(data, "image/webp"), expected)


def test_vp8l_webp_guards_are_loud():
    """Subset boundaries fail loudly: truncated stream, bad container,
    and the documented NotImplementedError for lossy VP8."""
    import struct

    import pytest

    from a3_fp_bigdata_spark.multimodal.webp_codec import decode_webp
    from tools.make_vp8l import build_plain

    data, _ = build_plain()
    with pytest.raises(ValueError):
        decode_webp(data[: len(data) - 6])
    with pytest.raises(ValueError):
        decode_webp(b"RIFX" + data[4:])
    # r12: lossy VP8 keyframes now DECODE (vp8_codec); a garbage VP8
    # chunk still fails loudly inside the frame parser
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(ValueError, match="frame too short"):
        decode_webp(lossy)


def test_mm12_modern_formats_match_generator_goldens(spark):
    """mm12's channel means over the committed progressive-JPEG and
    VP8L fixtures equal the FOREIGN generators' own expected pixels'
    means exactly (re-derived at test time, plus a committed-bytes
    equality check so the on-disk fixtures can't drift from the
    generators silently)."""
    import os

    import numpy as np

    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal.binary_files import (
        MODERN_FIXTURE_DIR,
    )
    from tools.make_modern_format_fixtures import expected_features

    want = expected_features()
    # committed bytes == generator bytes (regeneration is deterministic)
    for name, (_, _, _, data) in want.items():
        with open(os.path.join(MODERN_FIXTURE_DIR, name), "rb") as fh:
            assert fh.read() == data, f"{name} drifted from its generator"

    rows = registry.all_queries()["mm12_modern_format_features"](
        spark, SF0001
    ).collect()
    assert len(rows) == len(want)
    # media_id is xxhash64(filename): re-derive the name->id map in Spark
    names = spark.createDataFrame(
        [(n,) for n in want], "fname string"
    ).selectExpr("fname", "xxhash64(fname) AS media_id").collect()
    id_to_name = {r.media_id: r.fname for r in names}
    for r in rows:
        means, w, h, _ = want[id_to_name[r.media_id]]
        assert (r.img_width, r.img_height) == (w, h)
        got = (r.img_avg_red, r.img_avg_green, r.img_avg_blue)
        assert np.allclose(got, means, rtol=0, atol=1e-9), (got, means)


# ---------------------------------------------------------------------------
# APNG: fcTL/fdAT animation decode (apng_codec) + mm13
# ---------------------------------------------------------------------------

APNG_DIR = __import__("os").path.join(
    __import__("os").path.dirname(M.__file__), "fixtures", "apng"
)


def _apng_golden():
    import os

    return np.load(
        os.path.join(
            os.path.dirname(__file__), "golden", "apng_frames.npz"
        )
    )


def test_apng_composites_match_independent_ground_truth():
    """Every committed APNG (sub-rectangle frames, dispose NONE/
    BACKGROUND/PREVIOUS, blend SOURCE/OVER with fractional alpha,
    palette tRNS alpha, IDAT-default-image-skipped) decodes to
    EXACTLY the frames the generator derived with its own scalar
    spec compositor (tools/make_apng_fixtures.py imports nothing
    from apng_codec)."""
    import os

    from a3_fp_bigdata_spark.multimodal.apng_codec import (
        decode_apng_frames,
        is_apng,
    )

    golden = _apng_golden()
    assert set(golden.files) == {
        "anim_rgba_over", "anim_palette_trns",
        "anim_default_skipped", "anim_gray_alpha",
    }
    for name in golden.files:
        payload = open(os.path.join(APNG_DIR, f"{name}.png"), "rb").read()
        assert is_apng(payload)
        frames = decode_apng_frames(payload)
        exp = golden[name]
        assert len(frames) == len(exp)
        for got, want in zip(frames, exp):
            assert np.array_equal(got, want), name


def test_apng_still_decoder_ignores_animation_chunks():
    """png_codec must keep decoding an APNG's IDAT as a plain still
    (acTL/fcTL/fdAT are ancillary): the default-image fixture's IDAT
    is an all-white canvas that no animation frame shows."""
    import os

    from a3_fp_bigdata_spark.multimodal.png_codec import decode_png

    payload = open(
        os.path.join(APNG_DIR, "anim_default_skipped.png"), "rb"
    ).read()
    arr = decode_png(payload)
    assert arr.shape == (12, 16, 3)
    assert (arr == 255).all()  # the skipped default image, not frame 0


def test_apng_malformed_streams_raise():
    import os
    import struct
    import zlib

    from a3_fp_bigdata_spark.multimodal.apng_codec import (
        decode_apng_frames,
        is_apng,
    )
    from a3_fp_bigdata_spark.multimodal.png_codec import encode_png

    # plain PNG: no acTL -> not an APNG, decoder refuses
    still = encode_png(np.zeros((4, 4, 3), np.uint8))
    assert not is_apng(still)
    with pytest.raises(ValueError, match="no acTL"):
        decode_apng_frames(still)

    path = os.path.join(APNG_DIR, "anim_rgba_over.png")
    payload = open(path, "rb").read()

    def patch_first(payload, ctype, mutate):
        pos = 8
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            if payload[pos + 4 : pos + 8] == ctype:
                start, end = pos + 8, pos + 8 + length
                data = mutate(bytearray(payload[start:end]))
                body = payload[pos + 4 : pos + 8] + bytes(data)
                crc = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
                return (
                    payload[:pos]
                    + struct.pack(">I", len(data))
                    + body
                    + crc
                    + payload[end + 4 :]
                )
            pos += 12 + length
        raise AssertionError("chunk not found")

    # broken fcTL sequence number
    def bump_seq(d):
        d[3] += 5
        return d

    with pytest.raises(ValueError, match="sequence"):
        decode_apng_frames(patch_first(payload, b"fcTL", bump_seq))

    # frame count mismatch vs acTL
    def lie_frames(d):
        d[0:4] = struct.pack(">I", 9)
        return d

    with pytest.raises(ValueError, match="declares 9 frames"):
        decode_apng_frames(patch_first(payload, b"acTL", lie_frames))

    # truncation: a complete-looking prefix without IEND must not pass
    with pytest.raises(ValueError, match="IEND"):
        decode_apng_frames(payload[:-12])

    # two fcTL chunks before IDAT: malformed, must refuse (not silently
    # treat the second as a post-IDAT animation frame)
    def dup_fctl_before_idat(payload):
        pos = 8
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            if payload[pos + 4 : pos + 8] == b"fcTL":
                end = pos + 12 + length
                data = bytearray(payload[pos + 8 : pos + 8 + length])
                data[0:4] = struct.pack(">I", 1)  # next sequence number
                body = b"fcTL" + bytes(data)
                crc = struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
                dup = struct.pack(">I", len(data)) + body + crc
                return payload[:end] + dup + payload[end:]
            pos += 12 + length
        raise AssertionError("fcTL not found")

    with pytest.raises(ValueError, match="second fcTL before IDAT"):
        decode_apng_frames(dup_fctl_before_idat(payload))


def test_mm13_apng_query_matches_golden_means(spark):
    from a3_fp_bigdata_spark.multimodal.binary_files import (
        mm13_apng_frame_features,
    )

    rows = mm13_apng_frame_features(spark, SF0001).collect()
    golden = _apng_golden()
    # media_id is the basename-ordered index from image_dir_source
    names = sorted(golden.files)
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == len(names)
    total = 0
    for mid, media_rows in by_media.items():
        media_rows.sort(key=lambda r: r["frame_idx"])
        # match this media to the golden entry with the same frame
        # count AND canvas dims (media_id assignment is scan-internal)
        cands = [
            n for n in names
            if len(golden[n]) == len(media_rows)
            and golden[n].shape[1] == media_rows[0]["img_height"]
            and golden[n].shape[2] == media_rows[0]["img_width"]
        ]
        assert len(cands) == 1, (mid, cands)
        exp = golden[cands[0]]
        for r, frame in zip(media_rows, exp):
            means = frame.reshape(-1, 3).mean(axis=0)
            assert abs(r["img_avg_red"] - float(means[0])) < 1e-9
            assert abs(r["img_avg_green"] - float(means[1])) < 1e-9
            assert abs(r["img_avg_blue"] - float(means[2])) < 1e-9
            total += 1
    assert total == sum(len(golden[n]) for n in names)


def test_apng_property_random_animations_decode_exactly():
    """Property test: RANDOM animations — arbitrary sub-rectangles,
    dispose NONE/BACKGROUND/PREVIOUS, blend SOURCE/OVER, arbitrary
    fractional alpha — assembled by the generator's byte builders and
    composited by its independent scalar compositor, must decode to
    EXACTLY the expected frames. 40 seeded cases cover far more
    dispose/blend/geometry interleavings than the four committed
    fixtures."""
    import struct

    import numpy as np

    from a3_fp_bigdata_spark.multimodal.apng_codec import (
        decode_apng_frames,
    )
    from tools.make_apng_fixtures import (
        SIG,
        chunk,
        composite,
        fctl,
        fdat,
        scanlines,
    )

    for seed in range(40):
        rng = np.random.default_rng(1000 + seed)
        H = int(rng.integers(6, 13))
        W = int(rng.integers(6, 13))
        n_frames = int(rng.integers(1, 5))
        steps = []
        for i in range(n_frames):
            if i == 0:
                fh, fw, fy, fx = H, W, 0, 0
            else:
                fh = int(rng.integers(1, H + 1))
                fw = int(rng.integers(1, W + 1))
                fy = int(rng.integers(0, H - fh + 1))
                fx = int(rng.integers(0, W - fw + 1))
            rgba = rng.integers(0, 256, (fh, fw, 4), dtype=np.uint8)
            dispose = int(rng.integers(0, 3))
            blend = int(rng.integers(0, 2))
            steps.append((rgba, fx, fy, dispose, blend))
        payload = SIG + chunk(
            b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 6, 0, 0, 0)
        )
        payload += chunk(b"acTL", struct.pack(">II", n_frames, 0))
        # fctl(seq, w, h, x, y, dispose, blend)
        payload += fctl(0, W, H, 0, 0, steps[0][3], steps[0][4])
        payload += chunk(b"IDAT", scanlines(steps[0][0]))
        seq = 1
        for rgba, fx, fy, dispose, blend in steps[1:]:
            payload += fctl(
                seq, rgba.shape[1], rgba.shape[0], fx, fy, dispose, blend
            )
            seq += 1
            payload += fdat(seq, scanlines(rgba))
            seq += 1
        payload += chunk(b"IEND", b"")
        expected = composite((H, W), steps)
        got = decode_apng_frames(payload)
        assert len(got) == len(expected), seed
        for i, (g, e) in enumerate(zip(got, expected)):
            assert np.array_equal(g, e), (seed, i)


def test_apng_guards_reject_unsupported_and_out_of_bounds():
    """Remaining decoder guards: color-key tRNS (type-2) refuses
    loudly instead of mis-compositing, a frame rectangle outside the
    canvas refuses, and is_apng stays false for non-PNG bytes."""
    import struct

    import numpy as np

    from a3_fp_bigdata_spark.multimodal.apng_codec import (
        decode_apng_frames,
        is_apng,
    )
    from tools.make_apng_fixtures import SIG, chunk, fctl, fdat, scanlines

    assert not is_apng(b"GIF89a" + b"\x00" * 20)
    assert not is_apng(b"")

    rgb = np.zeros((4, 4, 3), np.uint8)

    def base(extra_after_ihdr=b"", fw=4, fh=4, fx=0, fy=0):
        p = SIG + chunk(
            b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
        )
        p += chunk(b"acTL", struct.pack(">II", 2, 0))
        p += extra_after_ihdr
        p += fctl(0, 4, 4, 0, 0, 0, 0)
        p += chunk(b"IDAT", scanlines(rgb))
        p += fctl(1, fw, fh, fx, fy, 0, 0)
        p += fdat(2, scanlines(np.zeros((fh, fw, 3), np.uint8)))
        p += chunk(b"IEND", b"")
        return p

    # color-key transparency on truecolor: explicit refusal
    with pytest.raises(ValueError, match="tRNS with color type 2"):
        decode_apng_frames(
            base(extra_after_ihdr=chunk(b"tRNS", struct.pack(">HHH", 0, 0, 0)))
        )

    # frame rectangle outside the canvas: refusal, not a silent crop
    with pytest.raises(ValueError, match="outside canvas"):
        decode_apng_frames(base(fw=3, fh=3, fx=2, fy=2))


# ---------------------------------------------------------------------------
# Adam7 interlaced PNG (r11)
# ---------------------------------------------------------------------------


def _encode_adam7(samples, ctype, palette=None):
    """Independent interlaced-PNG byte builder (spec transcription —
    imports nothing from png_codec): slice each Adam7 pass out of the
    sample grid, emit filter-0 scanlines per pass, concatenate, zlib."""
    import struct
    import zlib

    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    h, w = samples.shape[:2]
    raw = b""
    for x0, y0, xs, ys in passes:
        sub = samples[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()

    def chunk(ct, data):
        return (struct.pack(">I", len(data)) + ct + data
                + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
    )
    if palette is not None:
        out += chunk(b"PLTE", palette.tobytes())
    return out + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b"")


def test_adam7_interlaced_png_decodes_exactly():
    """Adam7 decode vs the independent encoder above, across every
    color type and awkward dimensions (passes that are empty, 1-pixel
    passes, dims not multiples of 8) — PNG is lossless, so equality is
    exact."""
    from a3_fp_bigdata_spark.multimodal.png_codec import decode_png

    rng = np.random.default_rng(1107)
    dims = [(1, 1), (2, 3), (7, 5), (8, 8), (9, 10), (16, 33), (40, 17)]
    for h, w in dims:
        # RGB (2)
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(_encode_adam7(rgb, 2)), rgb)
        # gray (0) -> broadcast
        g = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
        assert np.array_equal(
            decode_png(_encode_adam7(g, 0)), np.repeat(g, 3, axis=2)
        )
        # RGBA (6) -> alpha dropped
        rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        assert np.array_equal(
            decode_png(_encode_adam7(rgba, 6)), rgba[:, :, :3]
        )
        # gray+alpha (4) -> first channel broadcast
        ga = rng.integers(0, 256, (h, w, 2), dtype=np.uint8)
        assert np.array_equal(
            decode_png(_encode_adam7(ga, 4)),
            np.repeat(ga[:, :, :1], 3, axis=2),
        )
        # palette (3) -> PLTE lookup
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (h, w, 1), dtype=np.uint8)
        assert np.array_equal(
            decode_png(_encode_adam7(idx, 3, palette=pal)),
            pal[idx[:, :, 0]],
        )


def test_adam7_trailing_bytes_rejected():
    """An interlaced stream with surplus bytes after the last pass is
    corrupt and must refuse loudly."""
    import struct
    import zlib

    from a3_fp_bigdata_spark.multimodal.png_codec import decode_png

    rgb = np.zeros((4, 4, 3), np.uint8)
    payload = _encode_adam7(rgb, 2)
    # rebuild with two junk bytes appended INSIDE the compressed stream
    pos = 8
    out = payload[:8]
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ct = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ct == b"IDAT":
            raw = zlib.decompress(data) + b"\x00\x00"
            data = zlib.compress(raw, 9)
        out += (struct.pack(">I", len(data)) + ct + data
                + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF))
        pos += 12 + length
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_png(out)


# ---------------------------------------------------------------------------
# TIFF LZW / PackBits / predictor (r11)
# ---------------------------------------------------------------------------


def _tiff_lzw_encode(data):
    """Independent TIFF-LZW writer (spec §13 transcription, string-table
    dict — structurally unlike the decoder's list): MSB-first packing,
    early width change (switch when the next code to ASSIGN would be
    2^width - 1), CLEAR at table 4094."""
    CLEAR, EOI = 256, 257
    sink = bytearray()
    acc = nbits = 0

    def put(code, width):
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


def _tiff_packbits_encode(data):
    """Independent PackBits writer: literal runs <= 128, repeat runs
    for >= 3 equal bytes."""
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


def _build_tiff(arr, comp, strips, predictor=1, strip_rows_override=None):
    """Independent multi-strip TIFF builder for the compressed paths.
    ``strip_rows_override`` lets a test lie about where strips split
    (the IFD still claims the computed rows_per_strip) to pin the
    per-strip decoded-length check."""
    import struct

    h, w = arr.shape[:2]
    rows_per_strip = (h + strips - 1) // strips
    strip_rows = strip_rows_override or [
        arr[y : y + rows_per_strip] for y in range(0, h, rows_per_strip)
    ]
    payloads = []
    for chunk in strip_rows:
        if predictor == 2:
            chunk = chunk.astype(np.int16)
            chunk = np.concatenate(
                [chunk[:, :1], np.diff(chunk, axis=1)], axis=1
            ).astype(np.uint8)
        raw = chunk.tobytes()
        if comp == 5:
            payloads.append(_tiff_lzw_encode(raw))
        elif comp == 32773:
            payloads.append(_tiff_packbits_encode(raw))
        else:
            payloads.append(raw)
    bps_off = 8
    data_off = bps_off + 6
    offs, cur = [], data_off
    for p in payloads:
        offs.append(cur)
        cur += len(p)
    pad = cur % 2
    ifd_off = cur + pad
    n_strips = len(payloads)
    # offset arrays > 4 bytes must live out-of-line: append after IFD
    entries = []

    def arr_entry(tag, typ, values):
        entries.append((tag, typ, values))

    arr_entry(256, 4, [w])
    arr_entry(257, 4, [h])
    arr_entry(258, 3, [8, 8, 8])
    arr_entry(259, 3, [comp])
    arr_entry(262, 3, [2])
    arr_entry(273, 4, offs)
    arr_entry(277, 3, [3])
    arr_entry(278, 4, [rows_per_strip])
    arr_entry(279, 4, [len(p) for p in payloads])
    arr_entry(284, 3, [1])
    if predictor != 1:
        arr_entry(317, 3, [predictor])
    entries.sort()
    ifd = struct.pack("<H", len(entries))
    extra = b""
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    fmt = {3: "H", 4: "I"}
    size = {3: 2, 4: 4}
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
    return (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + struct.pack("<3H", 8, 8, 8)
        + b"".join(payloads)
        + b"\x00" * pad
        + ifd
        + extra
    )


def test_tiff_lzw_packbits_predictor_decode_exactly():
    """LZW (incl. width changes past 511/1023 entries and a CLEAR
    restart on big inputs), PackBits, and horizontal predictor — all
    against the independent builder above. Lossless: equality exact."""
    from a3_fp_bigdata_spark.multimodal.tiff_codec import decode_tiff

    rng = np.random.default_rng(317)
    # structured image (compressible: runs + gradients) AND noise
    grad = np.arange(64, dtype=np.uint8)[None, :, None]
    structured = np.broadcast_to(grad, (48, 64, 3)).copy()
    structured[10:20] = 200
    noise = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (120, 90, 3), dtype=np.uint8)  # forces CLEAR
    for arr in (structured, noise, big):
        for comp in (5, 32773):
            for strips in (1, 3):
                got = decode_tiff(_build_tiff(arr, comp, strips))
                assert np.array_equal(got, arr), (comp, strips, arr.shape)
        # LZW + horizontal predictor (the real-world archival combo)
        got = decode_tiff(_build_tiff(arr, 5, 2, predictor=2))
        assert np.array_equal(got, arr), ("predictor", arr.shape)


def test_tiff_packbits_truncated_literal_run_raises():
    """ADVICE r11: a literal run extending past the strip end must
    raise like the repeat-run path, not silently clip."""
    from a3_fp_bigdata_spark.multimodal.tiff_codec import (
        _packbits_decode,
    )

    # header 0x05 promises 6 literal bytes; only 3 follow
    with pytest.raises(ValueError, match="truncated literal run"):
        _packbits_decode(b"\x05abc")
    # repeat-run truncation still raises too
    with pytest.raises(ValueError, match="truncated run"):
        _packbits_decode(b"\xfe")
    # -128 no-op at end of stream stays legal
    assert _packbits_decode(b"\x00a\x80") == b"a"


def test_tiff_misaligned_strips_raise_even_when_total_matches():
    """ADVICE r11: strips split at the wrong rows (1+3 instead of the
    IFD's claimed 2+2) keep the TOTAL byte count right, so only a
    per-strip decoded-length check catches the shifted pixels."""
    from a3_fp_bigdata_spark.multimodal.tiff_codec import decode_tiff

    rng = np.random.default_rng(279)
    arr = rng.integers(0, 256, (4, 8, 3), dtype=np.uint8)
    # sanity: the honest 2+2 split decodes exactly
    assert np.array_equal(decode_tiff(_build_tiff(arr, 32773, 2)), arr)
    bad = _build_tiff(
        arr, 32773, 2, strip_rows_override=[arr[:1], arr[1:]]
    )
    with pytest.raises(ValueError, match="strip 0"):
        decode_tiff(bad)


def test_tiff_unsupported_compression_still_raises():
    from a3_fp_bigdata_spark.multimodal.tiff_codec import (
        decode_tiff,
        encode_tiff,
    )

    payload = bytearray(encode_tiff(np.zeros((4, 4, 3), np.uint8)))
    # patch the COMP entry (tag 259) value to 7 (JPEG-in-TIFF)
    import struct

    ifd_off = struct.unpack_from("<I", payload, 4)[0]
    (n,) = struct.unpack_from("<H", payload, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", payload, base)[0]
        if tag == 259:
            struct.pack_into("<H", payload, base + 8, 7)
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(bytes(payload))


def test_mm14_archival_tiff_query_matches_golden_means(spark):
    """The registered archival-TIFF query must reproduce the
    independent generator's exact channel means for every fixture
    (matched by dimensions + filename hash)."""
    import os

    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark.multimodal.binary_files import (
        mm14_archival_tiff_features,
    )

    rows = mm14_archival_tiff_features(spark, SF0001).collect()
    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "tiff_lzw.npz")
    )
    names = sorted(golden.files)
    assert len(rows) == len(names)
    # media_id = xxhash64(filename): recompute to match rows to goldens
    spark_hash = {
        r["fname"]: r["h"]
        for r in spark.createDataFrame(
            [(n,) for n in names], "fname string"
        )
        .select("fname", F.xxhash64("fname").alias("h"))
        .collect()
    }
    by_id = {r["media_id"]: r for r in rows}
    for name in names:
        r = by_id[spark_hash[name]]
        exp = golden[name]
        assert (r["img_height"], r["img_width"]) == exp.shape[:2], name
        means = exp.reshape(-1, 3).mean(axis=0)
        assert abs(r["img_avg_red"] - float(means[0])) < 1e-9, name
        assert abs(r["img_avg_green"] - float(means[1])) < 1e-9, name
        assert abs(r["img_avg_blue"] - float(means[2])) < 1e-9, name


# ---------------------------------------------------------------------------
# ICO: favicon container decode (ico_codec) + mm15
# ---------------------------------------------------------------------------


def test_ico_codec_roundtrip_and_selection():
    """decode_ico must return the LARGEST entry's exact pixels for
    every committed fixture (re-derived from the generator), across
    PNG payloads, 32bpp DIBs (doubled XOR+AND height), and mixed
    containers where a later/larger PNG must beat an earlier DIB."""
    import os

    from a3_fp_bigdata_spark.multimodal.binary_files import ICO_FIXTURE_DIR
    from a3_fp_bigdata_spark.multimodal.ico_codec import decode_ico
    from tools.make_ico_fixtures import expected_arrays

    want = expected_arrays()
    for name, (exp, data) in want.items():
        # committed bytes == generator bytes (no silent fixture drift)
        with open(os.path.join(ICO_FIXTURE_DIR, name), "rb") as fh:
            assert fh.read() == data, f"{name} drifted from its generator"
        assert np.array_equal(decode_ico(data), exp), name


def test_ico_codec_error_contract():
    import struct

    from a3_fp_bigdata_spark.multimodal.ico_codec import decode_ico

    with pytest.raises(ValueError, match="too short"):
        decode_ico(b"\x00\x00\x01")
    with pytest.raises(ValueError, match="signature"):
        decode_ico(b"\x01\x00\x01\x00\x01\x00" + b"\x00" * 16)
    # CUR (type 2) refuses loudly
    with pytest.raises(NotImplementedError, match="CUR"):
        decode_ico(struct.pack("<HHH", 0, 2, 1) + b"\x00" * 16)
    with pytest.raises(ValueError, match="zero images"):
        decode_ico(struct.pack("<HHH", 0, 1, 0))


def test_mm15_favicon_query_matches_generator(spark):
    """The registered favicon query reproduces the generator's exact
    channel means + dims per fixture (matched by filename hash)."""
    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark import registry
    from tools.make_ico_fixtures import expected_arrays

    want = expected_arrays()
    rows = registry.all_queries()["mm15_favicon_features"](
        spark, SF0001
    ).collect()
    assert len(rows) == len(want)
    spark_hash = {
        r["h"]: r["fname"]
        for r in spark.createDataFrame(
            [(n,) for n in want], "fname string"
        )
        .select("fname", F.xxhash64("fname").alias("h"))
        .collect()
    }
    for r in rows:
        exp, _ = want[spark_hash[r["media_id"]]]
        assert (r["img_height"], r["img_width"]) == exp.shape[:2]
        means = exp.reshape(-1, 3).mean(axis=0)
        assert abs(r["img_avg_red"] - float(means[0])) < 1e-9
        assert abs(r["img_avg_green"] - float(means[1])) < 1e-9
        assert abs(r["img_avg_blue"] - float(means[2])) < 1e-9


# ---------------------------------------------------------------------------
# VP8: lossy WebP keyframe decode (vp8_codec) + mm16
# ---------------------------------------------------------------------------


def _vp8_frame(data):
    import struct

    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _lossy_webp_fixture_bytes():
    import os

    from a3_fp_bigdata_spark.multimodal.binary_files import (
        LOSSY_WEBP_FIXTURE_DIR,
    )

    out = {}
    for name in sorted(os.listdir(LOSSY_WEBP_FIXTURE_DIR)):
        with open(os.path.join(LOSSY_WEBP_FIXTURE_DIR, name), "rb") as fh:
            out[name] = fh.read()
    return out


def _vp8_goldens():
    import os

    return np.load(
        os.path.join(os.path.dirname(__file__), "golden", "vp8_yuv.npz")
    )


def test_vp8_decoder_bit_exact_vs_libwebp_goldens():
    """THE foreign-implementation equality pin: the pure-python VP8
    keyframe decoder must reproduce the committed YUV planes —
    libwebp's OWN decode of the same committed bytes — bit for bit on
    every fixture. A single wrong entry in any probability table, a
    predictor slip, or a loop-filter off-by-one desyncs or drifts and
    fails this."""
    from a3_fp_bigdata_spark.multimodal.vp8_codec import decode_vp8_yuv

    golden = _vp8_goldens()
    fixtures = _lossy_webp_fixture_bytes()
    assert len(fixtures) == 5
    for name, data in fixtures.items():
        Y, U, V = decode_vp8_yuv(_vp8_frame(data))
        assert np.array_equal(Y, golden[name + "/Y"]), name
        assert np.array_equal(U, golden[name + "/U"]), name
        assert np.array_equal(V, golden[name + "/V"]), name


def test_vp8_goldens_re_derivable_from_system_libwebp():
    """Env-gated oracle re-derivation (the PIL-equality test's shape):
    when the system libwebp is present, its decode of the committed
    bytes must equal the committed goldens — pinning that the goldens
    ARE the foreign implementation's output, not this repo's."""
    from a3_fp_bigdata_spark.multimodal import webp_native as N

    if not N.HAVE_LIBWEBP:
        pytest.skip("libwebp not available")
    golden = _vp8_goldens()
    for name, data in _lossy_webp_fixture_bytes().items():
        Y, U, V = N.decode_yuv(data)
        assert np.array_equal(Y, golden[name + "/Y"]), name
        assert np.array_equal(U, golden[name + "/U"]), name
        assert np.array_equal(V, golden[name + "/V"]), name


def test_vp8_property_random_images_match_libwebp():
    """Env-gated property test: random content/dims/quality through
    libwebp's ENCODER must decode bit-identically (YUV) in the pure
    decoder — exercises segmentation headers, all intra modes, the
    token categories, and the loop filter across random streams."""
    from a3_fp_bigdata_spark.multimodal import webp_native as N
    from a3_fp_bigdata_spark.multimodal.vp8_codec import decode_vp8_yuv

    if not N.HAVE_LIBWEBP:
        pytest.skip("libwebp not available")
    rng = np.random.default_rng(1234)
    for trial in range(8):
        h, w = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        if trial % 2:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            arr = np.stack(
                [(xx * 3) % 256, (yy * 5) % 256, (xx * xx + yy) % 256],
                axis=2,
            ).astype(np.uint8)
        data = N.encode_rgb(np.ascontiguousarray(arr), float(rng.choice([15, 50, 80, 95])))
        Yg, Ug, Vg = N.decode_yuv(data)
        Y, U, V = decode_vp8_yuv(_vp8_frame(data))
        assert np.array_equal(Y, Yg) and np.array_equal(U, Ug) and np.array_equal(V, Vg), (h, w, trial)


def test_vp8_error_contract():
    from a3_fp_bigdata_spark.multimodal.vp8_codec import decode_vp8
    from a3_fp_bigdata_spark.multimodal.webp_codec import decode_webp

    data = next(iter(_lossy_webp_fixture_bytes().values()))
    frame = bytearray(_vp8_frame(data))
    # interframe bit set -> loud refusal
    frame[0] |= 1
    with pytest.raises(NotImplementedError, match="interframe"):
        decode_vp8(bytes(frame))
    # bad start code
    frame2 = bytearray(_vp8_frame(data))
    frame2[3] = 0x00
    with pytest.raises(ValueError, match="start code"):
        decode_vp8(bytes(frame2))
    # animated WebP DECODES since r13 — but a frameless ANIM container
    # still refuses loudly rather than returning an empty canvas
    anim = (
        b"RIFF" + (40).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + (10).to_bytes(4, "little") + b"\x02" + b"\x00" * 9
        + b"ANIM" + (6).to_bytes(4, "little") + b"\x00" * 6
    )
    with pytest.raises(ValueError, match="no ANMF frames"):
        decode_webp(anim)


def test_lossy_webp_through_decode_image_and_mm16(spark):
    """The full pipeline surface: decode_image_pure handles lossy VP8
    through the webp container, and the registered mm16 query's
    channel means equal the goldens' YUV converted by the SHARED
    yuv_to_rgb (one conversion on every path, so fast == pure)."""
    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal.images import decode_image_pure
    from a3_fp_bigdata_spark.multimodal.vp8_codec import yuv_to_rgb

    golden = _vp8_goldens()
    fixtures = _lossy_webp_fixture_bytes()
    want = {}
    for name, data in fixtures.items():
        rgb = yuv_to_rgb(
            golden[name + "/Y"], golden[name + "/U"], golden[name + "/V"]
        )
        got = decode_image_pure(data, "image/webp")
        assert np.array_equal(got, rgb), name
        want[name] = rgb

    rows = registry.all_queries()["mm16_lossy_webp_features"](
        spark, SF0001
    ).collect()
    assert len(rows) == len(want)
    spark_hash = {
        r["h"]: r["fname"]
        for r in spark.createDataFrame(
            [(n,) for n in want], "fname string"
        )
        .select("fname", F.xxhash64("fname").alias("h"))
        .collect()
    }
    for r in rows:
        exp = want[spark_hash[r["media_id"]]]
        assert (r["img_height"], r["img_width"]) == exp.shape[:2]
        means = exp.reshape(-1, 3).mean(axis=0)
        assert abs(r["img_avg_red"] - float(means[0])) < 1e-9
        assert abs(r["img_avg_green"] - float(means[1])) < 1e-9
        assert abs(r["img_avg_blue"] - float(means[2])) < 1e-9


# ---------------------------------------------------------------------------
# Alpha WebP: VP8X + ALPH decode + the VP8L paths r12 closed + mm17
# ---------------------------------------------------------------------------


def _alpha_webp_fixture_bytes():
    import os

    from a3_fp_bigdata_spark.multimodal.binary_files import (
        ALPHA_WEBP_FIXTURE_DIR,
    )

    out = {}
    for name in sorted(os.listdir(ALPHA_WEBP_FIXTURE_DIR)):
        with open(os.path.join(ALPHA_WEBP_FIXTURE_DIR, name), "rb") as fh:
            out[name] = fh.read()
    return out


def _alpha_goldens():
    import os

    return np.load(
        os.path.join(os.path.dirname(__file__), "golden", "webp_alpha.npz")
    )


def test_alpha_webp_bit_exact_vs_libwebp_goldens():
    """VP8X stills: the ALPH plane (both container lanes, prediction
    filters) and the color channels must reproduce libwebp's own
    decode bit-for-bit — alpha directly, lossy color at YUV level,
    lossless RGBA in full (including the small-palette pixel-bundled
    and distance-mapped streams the VP8L decoder previously refused)."""
    from a3_fp_bigdata_spark.multimodal.vp8_codec import decode_vp8_yuv
    from a3_fp_bigdata_spark.multimodal.webp_codec import (
        _walk_chunks,
        decode_webp_rgba,
    )

    golden = _alpha_goldens()
    fixtures = _alpha_webp_fixture_bytes()
    assert len(fixtures) == 5
    lossy = lossless = 0
    for name, data in fixtures.items():
        mine = decode_webp_rgba(data)
        assert np.array_equal(mine[..., 3], golden[name + "/A"]), name
        if name + "/RGBA" in golden.files:
            assert np.array_equal(mine, golden[name + "/RGBA"]), name
            lossless += 1
        else:
            frame = [b for t, b in _walk_chunks(data) if t == b"VP8 "][0]
            Y, U, V = decode_vp8_yuv(frame)
            assert np.array_equal(Y, golden[name + "/Y"]), name
            assert np.array_equal(U, golden[name + "/U"]), name
            assert np.array_equal(V, golden[name + "/V"]), name
            lossy += 1
    assert lossy == 3 and lossless == 2


def test_alpha_webp_goldens_re_derivable_from_system_libwebp():
    from a3_fp_bigdata_spark.multimodal import webp_native as N

    if not N.HAVE_LIBWEBP:
        pytest.skip("libwebp not available")
    golden = _alpha_goldens()
    for name, data in _alpha_webp_fixture_bytes().items():
        rgba = N.decode_rgba(data)
        assert np.array_equal(rgba[..., 3], golden[name + "/A"]), name


def test_vp8l_property_random_lossless_match_libwebp():
    """Env-gated property test against libwebp's REAL lossless
    encoder: random palettes (bundling), tiled repeats (distance
    map), gradients (predictors incl. the mode-13 truncating
    division), noise, and RGBA — decode must equal libwebp's decode
    exactly."""
    import ctypes

    from a3_fp_bigdata_spark.multimodal import webp_native as N
    from a3_fp_bigdata_spark.multimodal.webp_codec import (
        decode_webp_rgba,
    )

    if not N.HAVE_LIBWEBP:
        pytest.skip("libwebp not available")
    lib = N._lib
    for fn in ("WebPEncodeLosslessRGB", "WebPEncodeLosslessRGBA"):
        f = getattr(lib, fn)
        f.restype = ctypes.c_size_t
        f.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]

    def enc(img):
        out = ctypes.POINTER(ctypes.c_uint8)()
        a = np.ascontiguousarray(img)
        f = (
            lib.WebPEncodeLosslessRGB
            if img.shape[2] == 3
            else lib.WebPEncodeLosslessRGBA
        )
        n = f(a.tobytes(), img.shape[1], img.shape[0],
              img.shape[1] * img.shape[2], ctypes.byref(out))
        d = ctypes.string_at(out, n)
        lib.WebPFree(out)
        return d

    rng = np.random.default_rng(4321)
    for trial in range(10):
        h, w = int(rng.integers(5, 80)), int(rng.integers(5, 80))
        kind = trial % 5
        if kind == 0:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == 1:
            base = rng.integers(0, 256, (h, 8, 3), dtype=np.uint8)
            img = np.tile(base, (1, (w + 7) // 8, 1))[:, :w]
        elif kind == 2:
            pal = rng.integers(
                0, 256, (int(rng.integers(2, 17)), 3), dtype=np.uint8
            )
            img = pal[rng.integers(0, len(pal), (h, w))]
        elif kind == 3:
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256],
                axis=2,
            ).astype(np.uint8)
        else:
            img = np.dstack(
                [rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
                 ((np.mgrid[0:h, 0:w][1] * 255) // max(w - 1, 1)).astype(np.uint8)]
            )
        data = enc(img)
        gold = N.decode_rgba(data)
        mine = decode_webp_rgba(data)
        assert np.array_equal(mine, gold), (trial, kind, h, w)


def test_mm17_alpha_features_match_goldens(spark):
    """The registered alpha-feature query's means (incl. mean alpha)
    equal the golden-derived RGBA exactly — lossy color through the
    shared yuv_to_rgb, alpha/lossless straight from the goldens."""
    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal.vp8_codec import yuv_to_rgb

    golden = _alpha_goldens()
    want = {}
    for name in _alpha_webp_fixture_bytes():
        if name + "/RGBA" in golden.files:
            rgba = golden[name + "/RGBA"]
        else:
            rgb = yuv_to_rgb(
                golden[name + "/Y"], golden[name + "/U"], golden[name + "/V"]
            )
            rgba = np.dstack([rgb, golden[name + "/A"]])
        want[name] = rgba
    rows = registry.all_queries()["mm17_alpha_webp_features"](
        spark, SF0001
    ).collect()
    assert len(rows) == len(want)
    spark_hash = {
        r["h"]: r["fname"]
        for r in spark.createDataFrame([(n,) for n in want], "fname string")
        .select("fname", F.xxhash64("fname").alias("h"))
        .collect()
    }
    for r in rows:
        exp = want[spark_hash[r["media_id"]]]
        assert (r["img_height"], r["img_width"]) == exp.shape[:2]
        means = exp.reshape(-1, 4).mean(axis=0)
        assert abs(r["img_avg_red"] - float(means[0])) < 1e-9
        assert abs(r["img_avg_green"] - float(means[1])) < 1e-9
        assert abs(r["img_avg_blue"] - float(means[2])) < 1e-9
        assert abs(r["img_avg_alpha"] - float(means[3])) < 1e-9


def test_decode_image_webp_never_pil_engine_lane_matches_pure():
    """ADVICE r12 (medium): decode_image must NEVER route image/webp
    through PIL — PIL's lossy RGB goes through libwebp's fancy
    upsampler and structurally differs from the engine's pinned
    nearest-neighbor yuv_to_rgb, so mm16's features would drift per
    environment. This pins the whole dispatch: on every committed WebP
    fixture (simple lossy VP8, VP8X+ALPH alpha stills, lossless), the
    production entry point decode_image equals the pure reference
    decode_webp bit for bit — which, on a box where the libwebp ctypes
    lane resolves (this one), also proves the NATIVE lane taken by the
    dispatch is bit-identical to pure."""
    from a3_fp_bigdata_spark.multimodal import images
    from a3_fp_bigdata_spark.multimodal.webp_codec import decode_webp

    fixtures = {}
    fixtures.update(_lossy_webp_fixture_bytes())
    fixtures.update(_alpha_webp_fixture_bytes())
    assert fixtures
    for name, data in fixtures.items():
        want = decode_webp(data)
        got = images.decode_image(data, "image/webp")
        assert got.dtype == np.uint8 and got.shape == want.shape, name
        assert np.array_equal(got, want), name


def test_webp_container_probe():
    """The cheap chunk walk behind the native-lane dispatch: base
    bitstream tag + animation flag, on real fixtures and a synthetic
    ANIM container."""
    from a3_fp_bigdata_spark.multimodal.images import _webp_container_probe

    lossy = next(iter(_lossy_webp_fixture_bytes().values()))
    assert _webp_container_probe(lossy) == (b"VP8 ", False)
    alpha = _alpha_webp_fixture_bytes()
    assert _webp_container_probe(alpha["lossless_rgba.webp"]) == (
        b"VP8L",
        False,
    )
    anim = (
        b"RIFF" + (40).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + (10).to_bytes(4, "little") + b"\x02" + b"\x00" * 9
        + b"ANIM" + (6).to_bytes(4, "little") + b"\x00" * 6
    )
    assert _webp_container_probe(anim) == (None, True)
    assert _webp_container_probe(b"nope") == (None, False)


def _anim_webp_fixture_bytes():
    import os

    from a3_fp_bigdata_spark.multimodal.binary_files import (
        ANIM_WEBP_FIXTURE_DIR,
    )

    out = {}
    for name in sorted(os.listdir(ANIM_WEBP_FIXTURE_DIR)):
        with open(os.path.join(ANIM_WEBP_FIXTURE_DIR, name), "rb") as fh:
            out[name] = fh.read()
    return out


def _anim_webp_goldens():
    import os

    return np.load(
        os.path.join(
            os.path.dirname(__file__), "golden", "anim_webp_frames.npz"
        )
    )


def test_anim_webp_frames_match_independent_compositor():
    """r13: animated WebP (VP8X ANIM/ANMF) — every composited frame of
    every committed fixture must ARRAY-EQUAL the committed ground
    truth from the INDEPENDENT scalar compositor
    (tools/make_anim_webp_fixtures.py; frame pixels pinned by libwebp
    itself). Covers sub-rectangle placement, fractional-alpha
    source-over blending, overwrite frames, dispose-to-background,
    and lossless/lossy/lossy+ALPH frame bitstreams."""
    from a3_fp_bigdata_spark.multimodal.webp_codec import (
        decode_webp_frames,
    )

    golden = _anim_webp_goldens()
    fixtures = _anim_webp_fixture_bytes()
    assert len(fixtures) == 5
    for name, data in fixtures.items():
        frames = decode_webp_frames(data)
        want = [
            golden[k]
            for k in sorted(
                (k for k in golden.files if k.startswith(name + "/")),
                key=lambda k: int(k.rsplit("frame", 1)[1]),
            )
        ]
        assert len(frames) == len(want) > 1, name
        for i, (got, exp) in enumerate(zip(frames, want)):
            assert got.shape == exp.shape, (name, i)
            assert np.array_equal(got, exp), (name, i)


def test_anim_webp_first_frame_surfaces():
    """decode_webp / decode_webp_rgba on an animated container return
    the FIRST composited canvas (PIL frame-0 convention, like GIF) —
    and decode_image routes it through the pure compositor lane (the
    native one-shot API refuses multi-frame files)."""
    from a3_fp_bigdata_spark.multimodal import images
    from a3_fp_bigdata_spark.multimodal.webp_codec import (
        decode_webp,
        decode_webp_anim_rgba,
        decode_webp_rgba,
    )

    data = _anim_webp_fixture_bytes()["anim_subrect_blend.webp"]
    canvases = decode_webp_anim_rgba(data)
    assert np.array_equal(decode_webp_rgba(data), canvases[0])
    assert np.array_equal(decode_webp(data), canvases[0][..., :3])
    assert np.array_equal(
        images.decode_image(data, "image/webp"), canvases[0][..., :3]
    )


def test_mm18_anim_features_match_goldens(spark):
    """The registered animated-WebP query's per-frame means equal the
    committed independent-compositor truth exactly."""
    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark import registry

    golden = _anim_webp_goldens()
    names = sorted(_anim_webp_fixture_bytes())
    rows = registry.all_queries()["mm18_anim_webp_features"](
        spark, SF0001
    ).collect()
    spark_hash = {
        r["h"]: r["fname"]
        for r in spark.createDataFrame([(n,) for n in names], "fname string")
        .select("fname", F.xxhash64("fname").alias("h"))
        .collect()
    }
    assert len(rows) == sum(
        1 for k in golden.files
    )  # one row per (fixture, frame)
    for r in rows:
        fname = spark_hash[r["media_id"]]
        exp = golden[f"{fname}/frame{r['frame_idx']}"]
        assert (r["img_height"], r["img_width"]) == exp.shape[:2]
        means = exp.reshape(-1, 3).mean(axis=0)
        assert abs(r["img_avg_red"] - float(means[0])) < 1e-9, (fname, r)
        assert abs(r["img_avg_green"] - float(means[1])) < 1e-9
        assert abs(r["img_avg_blue"] - float(means[2])) < 1e-9


def test_vp8x_canvas_fields_match_libwebp_writer():
    """ADVICE r13: the animation path's VP8X canvas parse (_u24 at
    offsets 4/7) was only exercised on containers this repo wrote —
    self-consistent layouts can hide a field-offset slip. Pin the
    offsets against libwebp's OWN VP8X headers (the committed alpha
    stills): declared canvas must equal the decoded bitstream dims,
    and the ALPHA flag bit (0x10) must be set exactly on the ALPH
    carriers."""
    from a3_fp_bigdata_spark.multimodal.webp_codec import (
        _walk_chunks,
        decode_webp_rgba,
    )

    seen = 0
    for name, data in _alpha_webp_fixture_bytes().items():
        chunks = dict(_walk_chunks(data))
        if b"VP8X" not in chunks:
            continue
        seen += 1
        body = chunks[b"VP8X"]
        w = body[4] | (body[5] << 8) | (body[6] << 16)
        h = body[7] | (body[8] << 8) | (body[9] << 16)
        rgba = decode_webp_rgba(data)
        assert (h + 1, w + 1) == rgba.shape[:2], name
        assert bool(body[0] & 0x10) == (b"ALPH" in chunks), name
    assert seen >= 3  # the lossy-alpha stills all carry VP8X


def test_mm19_resize_attestation_matches_resize_nn(spark):
    """The registered resize-attestation query's sampled means must
    equal resize_nn applied directly to the decoded fixture arrays —
    the cross-engine SQL replay and the numpy index math are the same
    function."""
    import os

    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark import registry
    from a3_fp_bigdata_spark.multimodal.binary_files import FIXTURE_DIR
    from a3_fp_bigdata_spark.multimodal.images import (
        decode_image,
        resize_nn,
    )

    names = sorted(
        n for n in os.listdir(FIXTURE_DIR) if n.endswith(".png")
    )
    want = {}
    for n in names:
        with open(os.path.join(FIXTURE_DIR, n), "rb") as fh:
            arr = decode_image(fh.read(), "image/png")
        rs = resize_nn(arr, 8, 8).reshape(-1, 3).astype(np.int64)
        want[n] = (rs.mean(axis=0), arr.shape)
    rows = registry.all_queries()["mm19_resize_attested"](
        spark, SF0001
    ).collect()
    assert len(rows) == len(want)
    spark_hash = {
        r["h"]: r["fname"]
        for r in spark.createDataFrame([(n,) for n in names], "fname string")
        .select("fname", F.xxhash64("fname").alias("h"))
        .collect()
    }
    for r in rows:
        means, shape = want[spark_hash[r["media_id"]]]
        assert (r["img_height"], r["img_width"]) == shape[:2]
        assert abs(r["rs_avg_red"] - float(means[0])) < 1e-9
        assert abs(r["rs_avg_green"] - float(means[1])) < 1e-9
        assert abs(r["rs_avg_blue"] - float(means[2])) < 1e-9


def test_anim_webp_randomized_vs_independent_compositor():
    """Property sweep over the blend/dispose matrix (the committed
    fixtures are hand-picked; this walks a wider space): randomized
    canvases and frame stacks — random even offsets, random sub-rect
    sizes, random no-blend/dispose flags, fractional/binary/opaque
    alpha — assembled through the fixture tool's muxer around
    libwebp-encoded LOSSLESS bitstreams, then required to ARRAY-EQUAL
    the tool's independent scalar compositor frame by frame."""
    from a3_fp_bigdata_spark.multimodal import webp_native as N

    if not N.HAVE_LIBWEBP:
        pytest.skip("libwebp not available")
    import os as _os
    import sys

    sys.path.insert(
        0, _os.path.join(_os.path.dirname(__file__), _os.pardir)
    )
    from tools.make_anim_webp_fixtures import (
        animated_container,
        anmf,
        extract_bitstream_chunks,
        scalar_compose,
        truth_rgba,
    )
    from tools.make_alpha_webp_fixtures import _encode_lossless_rgba
    from a3_fp_bigdata_spark.multimodal.webp_codec import (
        decode_webp_frames,
    )

    rng = np.random.default_rng(1337)
    for trial in range(12):
        cw = int(rng.integers(10, 40))
        ch = int(rng.integers(10, 40))
        n_frames = int(rng.integers(2, 5))
        frames, placed = [], []
        for i in range(n_frames):
            if i == 0:
                fx = fy = 0
                fw, fh = cw, ch
            else:
                fw = int(rng.integers(1, cw + 1))
                fh = int(rng.integers(1, ch + 1))
                fx = 2 * int(rng.integers(0, (cw - fw) // 2 + 1))
                fy = 2 * int(rng.integers(0, (ch - fh) // 2 + 1))
            kind = rng.integers(0, 3)
            rgb = rng.integers(0, 256, (fh, fw, 3), dtype=np.uint8)
            if kind == 0:
                a = np.full((fh, fw), 255, np.uint8)
            elif kind == 1:
                a = rng.integers(0, 256, (fh, fw), dtype=np.uint8)
            else:
                a = (rng.integers(0, 2, (fh, fw)) * 255).astype(np.uint8)
            still = _encode_lossless_rgba(np.dstack([rgb, a]))
            no_blend = bool(rng.integers(0, 2)) or i == 0
            dispose = bool(rng.integers(0, 2))
            frames.append(
                anmf(fx, fy, fw, fh, 40, no_blend, dispose,
                     extract_bitstream_chunks(still))
            )
            placed.append((fx, fy, truth_rgba(still), no_blend, dispose))
        data = animated_container(cw, ch, frames, True)
        got = decode_webp_frames(data)
        want = scalar_compose(cw, ch, placed)
        assert len(got) == len(want) == n_frames, trial
        for i, (g, w) in enumerate(zip(got, want)):
            assert np.array_equal(g, w), (trial, i)
