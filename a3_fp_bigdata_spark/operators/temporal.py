"""Temporal joins Spark lacks as built-ins: as-of and range (north-star
"custom operators" — composition of existing DataFrame ops, no UDF).

- As-of join: for each left row, the latest right row at-or-before its
  timestamp per key. Databases ship this natively (DuckDB ASOF JOIN,
  kdb aj); Spark expresses it as a TAGGED UNION + window last():
  one shuffle on the key, no range explosion — linear, scales to any
  corpus because state per key is one running value.
- Range join: pair rows whose timestamps fall within a bound. A naive
  theta-join is quadratic per key; the scalable form is BUCKETIZATION:
  equi-join on coarse time buckets (each left row probes its own and
  the next bucket), then filter exactly. Work ∝ true matches + bucket
  fan-out, never |L|x|R|.

Both oracles are written with explicitly deterministic tie-breaks
((ts, event_id) total order) so value-hash comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query

RANGE_MINUTES = 10
_BUCKET_SECS = RANGE_MINUTES * 60


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    tie_break: str,
) -> DataFrame:
    """Latest right row at-or-before each left row's ``ts``, per ``key``.

    Tagged union: right rows carry their payload, left rows carry null;
    a window ordered by (ts, is_left, tie_break) takes last(payload,
    ignoreNulls) so each left row sees exactly the right rows at-or-
    before it (right sorts before left on equal ts). One hash-partition
    shuffle on the key — the linear-state form of the operator.
    """
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (key, ts, tie_break) else F.lit(None).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_is_left", tie_break)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = tagged_l.unionByName(tagged_r)
    filled = unioned.select(
        *lcols,
        "_is_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left")


@query(
    "j8_asof_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click'
    ), pairs AS (
      SELECT p.event_id, p.user_id,
             c.value AS asof_value, c.event_id AS asof_event_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT event_id, user_id, asof_value, asof_event_id
    FROM pairs WHERE rn = 1
    """,
)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click
    at-or-before it. Inner form for the oracle (purchases with no prior
    click dropped — a nullable BIGINT widens to float64 through pandas
    fetch paths, poisoning value-hash compares; pytest covers the
    left-null behavior). The oracle is the quadratic inequality-join
    form with an explicit (ts DESC, event_id DESC) tie-break; our
    union+window form orders by (ts, is_left, event_id) ascending,
    which selects the same row."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        value_cols=["value", "event_id"],
        tie_break="event_id",
    )
    return out.filter(F.col("asof_event_id").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("asof_value").alias("asof_value"),
        F.col("asof_event_id").alias("asof_event_id"),
    )


@query(
    "j9_range_join",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, ts, event_type FROM events
    )
    SELECT a.event_id, count(b.event_id) AS n_following
    FROM e a LEFT JOIN e b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL {RANGE_MINUTES} MINUTE
    WHERE a.event_type = 'error'
    GROUP BY a.event_id
    """,
)
def j9_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, bucketized: for each error event, count the same
    user's events in the following {RANGE_MINUTES} minutes.

    Each left row probes its own time bucket and the next (a window of
    w seconds spans at most 2 buckets of w), so the join is an
    EQUI-join on (user_id, bucket) + exact filter — the shuffle moves
    O(|L| * 2 + |R|) rows, never the quadratic per-key cross product.
    """
    ev = table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / _BUCKET_SECS).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        bucket.alias("a_bucket"),
    )
    # probe own + next bucket
    probes = errors.withColumn(
        "probe_bucket", F.explode(F.array(F.col("a_bucket"), F.col("a_bucket") + 1))
    )
    others = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        bucket.alias("b_bucket"),
    )
    joined = probes.join(
        others,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("probe_bucket") == F.col("b_bucket"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (
            F.col("b_ts")
            <= F.col("a_ts") + F.expr(f"INTERVAL {RANGE_MINUTES} MINUTES")
        ),
        "left_outer",
    )
    return joined.groupBy(F.col("a_id").alias("event_id")).agg(
        F.count("b_id").alias("n_following")
    )
