"""SparkSession builders.

The reference builds bare local sessions with ``spark.driver.memory=3g``
(reference spark_script.py:160, app.py:75) and relies on stock Catalyst.
Our builder keeps that simplicity but turns on the scale knobs that matter
on a real cluster: AQE (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for any Python exchange, and a UTC session timezone so
results are stable across machines (and comparable to external oracles).

Nothing here is cluster-specific: on a 1000-executor deployment the same
builder is used with ``master`` left to spark-submit and
``shuffle_partitions`` sized ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def session_token(spark: SparkSession) -> str:
    """Session-unique cache-key token. ``id(spark)`` is NOT one:
    CPython reuses object ids after garbage collection, so a cache
    keyed on it can hand a DataFrame/model bound to a dead session to
    a new one. ``applicationId`` (timestamp-suffixed in local mode,
    cluster-unique on YARN/K8s) outlives no context and never
    recurs."""
    return spark.sparkContext.applicationId


def build_session(
    app_name: str = "a3_fp_bigdata_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with scale-sane defaults.

    ``master=None`` leaves the choice to the environment (spark-submit /
    existing session); tests and bench pass ``local[N]`` explicitly.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.config("spark.master", master)
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    conf = {
        # Adaptive execution: coalesce post-shuffle partitions, split skewed
        # joins, demote to broadcast at runtime — the 100 TB safety net.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(n_shuffle),
        # Arrow for every Python<->JVM exchange (pandas UDFs, toPandas).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Deterministic timestamps regardless of host TZ.
        "spark.sql.session.timeZone": "UTC",
        # Legacy-data compat: lets TIMESTAMP(NANOS) parquet (older driver
        # testdata generations) load as long nanos, which data.py widens
        # when — and only when — the loaded type is actually LongType.
        # A no-op for the current timestamp[us] data (loads as NTZ).
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Parquet scans: vectorized reader is default-on; keep split size
        # explicit so partition counts stay predictable as inputs grow.
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.ui.enabled": os.environ.get("SPARK_GRAFT_UI", "false"),
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_session(cores: int | None = None, **kwargs) -> SparkSession:
    """Local test/bench session: ``local[cores]`` threads in one JVM."""
    n = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return build_session(master=f"local[{n}]", shuffle_partitions=n, **kwargs)
