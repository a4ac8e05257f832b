"""Kafka edge (S7, S8) + the JSON payload codec both directions share.

The reference's producer/consumer are row-at-a-time Python Kafka clients
(producer.py:34-48 json.dumps per row; consumer.py:74-95 poll loop +
json.loads). Spark-first, both collapse into DataFrame transforms around
the built-in kafka connector:

    stream = kafka_source(spark, "broker:9092", "topic")      # S8
    parsed = parse_payload(stream, schema)                     # from_json
    ...
    to_payload(df, key_col="appId").write.format("kafka")...   # S7

``to_payload`` / ``parse_payload`` are pure column transforms — they work
identically on batch and streaming frames, so the codec is unit-testable
without a broker (and IS, in tests + the src2 registry query). The broker
round-trip itself needs the kafka connector JAR + a broker, neither of
which exists in this container; ``kafka_source``/``kafka_sink_options``
only construct the plan/options and raise a clear error if the connector
is absent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: to_json's default timestamp formats are millisecond-precision; pin
#: microsecond formats on BOTH directions so the codec is lossless for
#: both timestamp kinds (micros is Spark's native resolution).
#: TIMESTAMP (LTZ) serializes with a zone offset (XXX); TIMESTAMP_NTZ is
#: zoneless by definition, so its format carries none — which also means
#: an NTZ-serialized string cannot be parsed back as LTZ (from_json
#: yields null on the missing offset): parse_payload must be given the
#: SAME schema the payload was encoded from. Use ``df.schema``.
_JSON_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def to_payload(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """S7 codec: one JSON message per row — ``value`` is the whole row as
    JSON (NaN/None serialize to JSON null, matching producer.py:84's
    NaN-scrub), ``key`` an optional partitioning column cast to string."""
    cols: list[Column] = [
        F.to_json(F.struct(*df.columns), _JSON_OPTS).alias("value")
    ]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def parse_payload(df: DataFrame, schema: T.StructType) -> DataFrame:
    """S8 codec: JSON ``value`` -> typed columns via ``from_json``.
    Unparseable messages yield a row of nulls (PERMISSIVE) rather than
    killing the stream — the reference's consumer likewise skips bad
    records (consumer.py:80-83). ``schema`` must match the encoding
    side's schema, timestamp kind included (see _JSON_OPTS)."""
    return df.select(
        F.from_json(F.col("value").cast("string"), schema, _JSON_OPTS).alias("r")
    ).select("r.*")


def kafka_source_options(
    brokers: str, topic: str, *, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """S8: the exact reader option set, constructible (and testable)
    without the connector JAR or a broker. ``startingOffsets=earliest``
    mirrors the reference consumer's auto_offset_reset='earliest'
    (consumer.py:76); ``subscribe`` (not assign) lets the connector
    spread the topic's partitions — 3 in the reference's compose file
    (docker-compose.yml:13-31) — across executors, one Kafka partition
    per Spark input partition."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S8: streaming Kafka source (consumer.py:74-79 re-expressed)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        brokers, topic, starting_offsets=starting_offsets
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_sink_options(brokers: str, topic: str) -> dict[str, str]:
    """S7: writer options for ``df.write/writeStream.format('kafka')``.
    Delivery is at-least-once like the reference's retries=3 producer
    (producer.py:43-48); exactly-once needs idempotent downstream keys."""
    return {"kafka.bootstrap.servers": brokers, "topic": topic}
