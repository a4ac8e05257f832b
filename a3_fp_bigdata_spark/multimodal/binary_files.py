"""Path-addressed image directories via Spark's binaryFile source.

The reference walks an icon directory with os.listdir and opens each
file with PIL (feature_extractor.py:15-22, dataset Icons-50). The
Spark-native form is ``spark.read.format("binaryFile")``: a
distributed scan that yields (path, modificationTime, length, content)
rows, splitting the FILE LIST (not file bytes) across executors — at
100 TB of images the listing itself is parallelized and each task
reads only its own files from object storage. ``pathGlobFilter``
prunes non-image files at the source, before any bytes move.

The rows are mapped onto the engine's media schema (media_id, payload,
media_type, meta) so every downstream operator — extract_features,
resize_images, frame_sample — works unchanged on directory-sourced
images. media_id hashes the FILENAME, not the absolute path, so ids
are stable across checkouts/machines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.multimodal.images import extract_features
from a3_fp_bigdata_spark.registry import query

#: Committed icon fixture set (6 deterministic PNGs — incl. one
#: color-type-3 palette/PLTE image, tools/make_png_fixtures.py — + 2
#: deterministic baseline JPEGs, one 4:4:4, one 4:2:0 with restart
#: markers; tools/make_jpeg_fixtures.py — + 2 deterministic GIFs, one
#: static interlaced, one 4-frame animation with transparency;
#: tools/make_gif_fixtures.py). pytest pins their exact channel means.
FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def image_dir_source(
    spark: SparkSession, path: str, glob: str = "*.png"
) -> DataFrame:
    """Image directory -> media-schema DataFrame (binaryFile scan)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(fname, r"\."), -1))
    return raw.select(
        F.xxhash64(fname).alias("media_id"),
        F.col("content").alias("payload"),
        F.concat(F.lit("image/"), ext).alias("media_type"),
        F.struct(
            fname.alias("origin"),
            F.lit(None).cast("string").alias("lang"),
            F.col("length").cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


@query("mm4_image_dir_features")
def mm4_image_dir_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference shape (feature_extractor.py:15-34): scan an
    image directory, decode every PNG, JPEG and GIF for real
    (png_codec / jpeg_codec / gif_codec; PIL when present), emit
    per-image channel means + dimensions (animated GIF contributes its
    first frame, PIL's convert('RGB') behavior). Rows-only: the input
    is the committed fixture directory, not a parquet table, so there
    is no DuckDB twin; pytest pins the exact feature values."""
    media = image_dir_source(
        spark, FIXTURE_DIR, glob="*.{png,jpg,jpeg,gif}"
    )
    return extract_features(media).orderBy("media_id")


@query("mm6_gif_frame_features")
def mm6_gif_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a REAL container format: binaryFile-scan the
    committed GIFs, explode each into composited frames inside the
    Arrow batch (gif_codec decodes transparency + disposal), emit
    per-frame channel means. The video-pipeline shape — demux to
    frames, featurize per frame — with genuine bytes instead of
    frame_sample's synthetic fixed-stride payloads. Rows-only: fixture
    directory input, no DuckDB twin; pytest pins the per-frame values."""
    from a3_fp_bigdata_spark.multimodal.images import gif_frame_features

    media = image_dir_source(spark, FIXTURE_DIR, glob="*.gif")
    return gif_frame_features(media).orderBy("media_id", "frame_idx")


#: committed modern-format fixture set (tools/make_modern_format_
#: fixtures.py): PROGRESSIVE JPEGs (SOF2, incl. a restart-interval
#: stream) and LOSSLESS WebPs (VP8L: plain/predicted/palette) from the
#: two independent foreign-style generators, with expected pixels
#: re-derivable from the generators at test time.
MODERN_FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "fixtures", "modern"
)


@query("mm12_modern_format_features")
def mm12_modern_format_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """mm4's binaryFile->decode->featurize shape over the MODERN
    formats a 2020s web crawl actually contains: progressive JPEG
    (SOF2) and lossless WebP (VP8L) — both decoded for real by the
    pure-python codecs (jpeg_codec, webp_codec; PIL when present).
    Rows-only like mm4 (fixture-directory input, no DuckDB twin);
    pytest pins the exact channel means against the foreign
    generators' OWN expected pixels, so a decode drift in either
    codec is a red golden, not a silent feature shift."""
    media = image_dir_source(
        spark, MODERN_FIXTURE_DIR, glob="*.{jpg,webp}"
    )
    return extract_features(media).orderBy("media_id")


#: committed APNG fixture set (tools/make_apng_fixtures.py):
#: hand-assembled fcTL/fdAT streams with sub-rectangle frames, the
#: full dispose matrix, fractional-alpha OVER blending, palette+tRNS
#: alpha, and an IDAT-default-image-skipped case — expected composites
#: from the generator's INDEPENDENT scalar compositor
#: (tests/golden/apng_frames.npz).
APNG_FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "fixtures", "apng"
)


@query("mm13_apng_frame_features")
def mm13_apng_frame_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """mm6's frame-sampling shape over APNG — the OTHER real animation
    container a web crawl contains, with features GIF cannot express
    (fractional alpha, OVER blending, 24-bit frames): binaryFile-scan
    the committed APNGs, explode each into composited full-canvas
    frames (apng_codec honors fcTL/fdAT sequencing, dispose NONE/
    BACKGROUND/PREVIOUS, blend SOURCE/OVER, palette tRNS alpha, and
    skips the non-animated IDAT default image), emit per-frame channel
    means. Rows-only like mm6 (fixture-directory input, no DuckDB
    twin); pytest pins exact frame arrays against the independent
    compositor's committed ground truth."""
    from a3_fp_bigdata_spark.multimodal.images import (
        apng_frame_features,
    )

    media = image_dir_source(spark, APNG_FIXTURE_DIR, glob="*.png")
    return apng_frame_features(media).orderBy("media_id", "frame_idx")


#: committed archival-TIFF fixture set (tools/make_tiff_lzw_fixtures
#: .py): LZW (incl. the horizontal predictor) and PackBits strips from
#: an INDEPENDENT spec-transcribed writer, scanned-document / photo /
#: grayscale content — expected pixels in tests/golden/tiff_lzw.npz.
ARCHIVAL_FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "fixtures", "archival"
)


@query("mm14_archival_tiff_features")
def mm14_archival_tiff_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """mm4's binaryFile->decode->featurize shape over ARCHIVAL TIFF —
    the scanned-document / microfilm slice of real corpora, where LZW
    and PackBits compression (with the horizontal predictor) dominate:
    all decoded for real by tiff_codec's r11 decompressors (PIL when
    present). Rows-only like mm4/mm12 (fixture-directory input, no
    DuckDB twin); pytest pins the exact channel means against the
    independent generator's own pixel arrays, so an LZW width-change
    or predictor bug is a red golden, not a silent feature shift."""
    media = image_dir_source(
        spark, ARCHIVAL_FIXTURE_DIR, glob="*.tif"
    )
    return extract_features(media).orderBy("media_id")
