"""Audio columns: opaque WAV bytes -> typed features, Arrow-batched.

The reference has no audio path; this is the engine extension a
multimodal training pipeline needs, built exactly like the image path
(images.py / binary_files.py): payloads stay opaque ``binary`` columns
with typed metadata, decode happens worker-side in Arrow batches, and
the decoder is REAL — RIFF/WAVE PCM parses with the stdlib ``wave``
module + numpy, no external audio libs. Non-WAV codecs (mp3, flac)
would need a library that is not in this container and raise
NotImplementedError honestly, same contract as images.decode_image.

Scale shape: the binaryFile listing distributes the FILE LIST, each
task reads only its own files; features are one mapInPandas pass,
memory O(batch). At 100 TB of audio the same plan holds with the
listing parallelized over object storage.
"""

from __future__ import annotations

import io
import os
import wave

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.pickling import ship_by_value
from a3_fp_bigdata_spark.registry import query

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float samples in [-1, 1] shaped (n, channels),
    sample_rate). 8/16/32-bit integer PCM; anything else raises
    ValueError rather than guessing."""
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            sr = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"corrupt WAV: {e}") from e
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width} bytes")
    return x.reshape(-1, nch), sr


def encode_wav(
    samples: np.ndarray, sample_rate: int, channels: int = 1
) -> bytes:
    """Float samples in [-1, 1] -> 16-bit PCM WAV bytes (fixture
    builder; decode_wav(encode_wav(x)) == x to 16-bit resolution)."""
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


_AUDIO_FEATURE_SCHEMA = (
    "media_id long, duration_s double, sample_rate int, n_channels int, "
    "rms double, peak double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> per-clip features, one Arrow batch at a
    time: duration, sample rate, channel count, RMS and peak amplitude
    — the columns an audio-corpus curation filter keys on (silence/
    clipping detection, length buckets)."""

    def batches(it):
        for pdf in it:
            out = {
                "media_id": [], "duration_s": [], "sample_rate": [],
                "n_channels": [], "rms": [], "peak": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x, sr = decode_wav(bytes(payload))
                out["media_id"].append(mid)
                out["duration_s"].append(round(x.shape[0] / sr, 6))
                out["sample_rate"].append(sr)
                out["n_channels"].append(x.shape[1])
                out["rms"].append(round(float(np.sqrt((x**2).mean())), 6))
                out["peak"].append(round(float(np.abs(x).max()), 6))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=_AUDIO_FEATURE_SCHEMA
    )


@query("mm5_audio_dir_features")
def mm5_audio_dir_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile scan of the committed WAV fixtures -> REAL stdlib
    decode -> per-clip features. Rows-only (directory input has no
    DuckDB twin); pytest pins the exact values against the generator's
    known waveforms (tools/make_wav_fixtures.py)."""
    from a3_fp_bigdata_spark.multimodal.binary_files import image_dir_source

    media = image_dir_source(spark, FIXTURE_DIR, glob="*.wav").withColumn(
        "media_type", F.lit("audio/wav")  # source labels by extension
    )
    return extract_audio_features(media).orderBy("media_id")
