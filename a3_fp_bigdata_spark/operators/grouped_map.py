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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.functions.rounding import half_up_sql
from a3_fp_bigdata_spark.registry import query


from a3_fp_bigdata_spark.pickling import ship_by_value

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path


def zscore_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group sample z-score via applyInPandas (ddof=1, matching
    stddev_samp). Rows are rounded to 4 so distributed float summation
    order can't leak into comparisons."""

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value]
        std = v.std(ddof=1)
        if pd.isna(std) or std == 0:
            # match SQL: (x-avg)/stddev_samp is NULL when the divisor is
            # NULL (single-row group) or zero (constant group)
            z = pd.Series([None] * len(v), index=v.index, dtype=object)
        else:
            # shared half-up rounding (functions.rounding's form,
            # replayed in numpy): pandas .round is half-EVEN, the SQL
            # engines' native rounds tip differently again — the floor
            # form is the one definition all three share
            z = np.floor(((v - v.mean()) / std) * 10000 + 0.5) / 10000
            mask = z.notna()
            z = z.astype(object).where(mask, None)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                key: pdf[key],
                "z": z,
            }
        )

    return df.groupBy(key).applyInPandas(
        norm, schema=f"event_id long, {key} string, z double"
    )


#: g1's z-score rendered through the shared rounding definition
#: (a module constant: py3.11 f-strings cannot nest triple quotes).
_Z_EXPR = half_up_sql(
    "(value - avg(value) OVER (PARTITION BY event_type))"
    " / stddev_samp(value) OVER (PARTITION BY event_type)"
)


@query(
    "g1_zscore_grouped_map",
    oracle=f"""
    SELECT event_id, event_type,
           {_Z_EXPR} AS z
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


@query(
    "g2_cogroup_conversion",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           count(*) FILTER (WHERE event_type = 'click') AS n_clicks
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY user_id
    """,
)
def g2_cogroup_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map (two frames, one Python function per key): per-user
    purchase/click counts via cogroup().applyInPandas — the two-sided
    UDF shape for per-key reconciliation/custom joins. Users appearing
    on either side emit a row (cogroup is full-outer over keys), which
    the oracle's IN-filtered groupBy reproduces. As with g1, chosen to
    be SQL-checkable so the cogroup plumbing itself is verified."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id"
    )

    def conv(key: tuple, p: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_purchases": [len(p)],
                "n_clicks": [len(c)],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            conv, schema="user_id long, n_purchases long, n_clicks long"
        )
    )
