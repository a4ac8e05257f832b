"""Grouped-map Pandas UDF (applyInPandas) — the §2.10 shape the engine
exposes for per-group Python logic that built-ins can't express
(per-group model fits, custom normalizations, resampling).

The demo operator is per-group z-score normalization, chosen BECAUSE it
is also SQL-expressible — so the whole Arrow path (grouping, pandas
batch per group, schema mapping) is oracle-checked end to end, unlike
typical UDF code that only gets spot tests.

Scale: applyInPandas shuffles once on the group key and streams one
Arrow batch per group through Python. Groups must fit in executor
memory — fine for bounded keys (event types); for unbounded keys
prefer window expressions (see a4/a5). Keep real hot paths JVM-side;
this operator exists for the cases that genuinely need pandas.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query

# Ship closures by value — executors may not have the repo on sys.path
# (same rationale as multimodal/images.py).
try:
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def zscore_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group sample z-score via applyInPandas (ddof=1, matching
    stddev_samp). Rows are rounded to 4 so distributed float summation
    order can't leak into comparisons."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value]
        std = v.std(ddof=1)
        z = (v - v.mean()) / std if std and std > 0 else v * 0.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                key: pdf[key],
                "z": z.round(4),
            }
        )

    return df.groupBy(key).applyInPandas(
        norm, schema=f"event_id long, {key} string, z double"
    )


@query(
    "g1_zscore_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type),
                 4) AS z
    FROM events
    WHERE NOT isnan(value) AND value IS NOT NULL
    """,
)
def g1_zscore_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score through the Arrow grouped-map path,
    hash-checked against the pure-SQL window form. NaN/null rows are
    excluded on both sides (pandas skipna vs SQL null-skipping disagree
    about NaN contamination)."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    return zscore_per_group(
        ev.select("event_id", "event_type", "value"), "event_type", "value"
    )
