"""CSV directory scan + batch-append sink (S1, S9, S10).

Reference behavior re-expressed:
- S1: ``spark.read.csv(folder, header=True, inferSchema=False,
  escape='"')`` (reference spark_script.py:168) — a whole-directory scan
  treated as one table. We keep the directory-as-table model but demand an
  explicit schema: on a 100 TB lake, inference is an extra full scan and
  silently wrong types are an outage. ``PERMISSIVE`` mode keeps the
  reference's tolerance of malformed rows (consumer.py:35-59 reindexing).
- S9: the consumer's timestamped 60 s CSV batches (consumer.py:19-67)
  become a plain partitioned append — one file per micro-batch comes for
  free from the streaming sink; batch callers use ``append_csv_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Spark's default CSV timestamp formats are millisecond-precision; pin
#: microsecond formats symmetrically on write and read so a CSV round
#: trip is lossless for both timestamp kinds (same rationale as the JSON
#: codec's kafka_io._JSON_OPTS).
_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    escape: str = '"',
) -> DataFrame:
    """S1: scan every CSV under ``path`` as one table with a declared
    schema. PERMISSIVE mode nulls out unparseable fields and captures the
    raw line in ``_corrupt_record`` when the schema declares it, matching
    the reference's drift tolerance without pandas-side reindexing."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("escape", escape)
        .option("mode", "PERMISSIVE")
        .options(**_TS_OPTS)
        .csv(path)
    )


def append_csv_batch(df: DataFrame, path: str) -> None:
    """S9: append one batch of rows as CSV files under ``path``.

    The reference serializes each window via pandas on one machine
    (consumer.py:59-66); a distributed append writes one file per
    partition in parallel and never funnels rows through the driver."""
    df.write.mode("append").option("header", True).options(**_TS_OPTS).csv(
        path
    )
