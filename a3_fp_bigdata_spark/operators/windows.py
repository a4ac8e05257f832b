"""Window functions — engine-generic surface (SURVEY.md §2.5).

The reference uses no window functions (its only rank-like logic hides
inside StringIndexer's frequency ordering, covered by a6_freq_rank); a
complete engine exposes them, and the top-k-per-group shape is the scale
replacement for the reference's global top-k when a per-category answer
is needed.

Scale notes: every window here partitions by a key — one shuffle on that
key, then a per-partition sort. Never use a global (unpartitioned)
ORDER BY window over big data: it funnels everything into one task
(a6_freq_rank's global window is fine only because its input is the
5-row aggregate output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql
from a3_fp_bigdata_spark.registry import query
from a3_fp_bigdata_spark.tscompat import epoch_micros, epoch_seconds


def topk_per_group(
    df: DataFrame, part_cols: list[str], order_cols: list, k: int
) -> DataFrame:
    """Top-k rows per group via row_number — the distributed pattern for
    'best n per category'. order_cols must total-order within a group."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


@query(
    "w1_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority class (row_number window)."""
    return topk_per_group(
        table(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        ),
        part_cols=["o_orderpriority"],
        order_cols=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )


@query(
    "w2_lag_delta",
    oracle=f"""
    SELECT event_id, user_id,
           {half_up_sql('''value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)''', 2)}
             AS delta
    FROM events
    """,
)
def w2_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user delta vs previous event (lag). event_id tie-break makes
    the frame total-ordered."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        half_up(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@query(
    "w3_running_sum",
    oracle=f"""
    SELECT event_id, user_id,
           {half_up_sql('''sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)''', 2)} AS running_value
    FROM events
    """,
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user sum (cumulative frame)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        half_up(F.sum("value").over(w), 2).alias("running_value"),
    )


@query(
    "w4_dense_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           dense_rank() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC) AS bal_rank
    FROM customer
    """,
)
def w4_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense rank of account balance within market segment. Rank values
    depend only on the order key, so ties are deterministic."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.dense_rank().over(w).alias("bal_rank")
    )


@query(
    "w5_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sessions AS (
      SELECT user_id, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def w5_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap > 30 min starts a new session, cumsum
    assigns ids, then a per-session rollup. The streaming twin is
    session_window (streaming module)."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = table(spark, sf_dir, "events")
    prev_ts = F.lag("ts").over(by_user)
    # micro-exact gap (tscompat works for NTZ and LTZ ts); comparing in
    # micros matches the oracle's `ts - lag(ts) > INTERVAL 30 MINUTE`
    # exactly — a seconds-truncated gap would misclassify 30:00.xx gaps
    gap_us = epoch_micros(F.col("ts")) - epoch_micros(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("_new", is_new)
        .withColumn("session_id", F.sum("_new").over(cum).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "w6_ntile_percent_rank",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS quartile,
           {half_up_sql('''percent_rank() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey)''', 6)} AS pr
    FROM customer
    """,
)
def w6_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: balance quartile + percentile
    position per market segment. The unique (acctbal, custkey) order
    makes rank positions — and therefore ntile/percent_rank — engine-
    independent. One hash shuffle on the partition key, like w1-w5."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        half_up(F.percent_rank().over(w), 6).alias("pr"),
    )


@query(
    "w7_time_range_rolling",
    oracle=f"""
    SELECT event_id,
           {half_up_sql('''sum(value) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
           )''')} AS roll_10m
    FROM events
    """,
)
def w7_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval rolling aggregate: per-user 10-minute trailing sum
    via rangeBetween over epoch seconds — the RANGE frame the w1-w6
    row-frame windows don't exercise. BOTH engines order by truncated
    epoch seconds: RANGE includes ALL peers of the current order value,
    so the order key must be identical down to its resolution (ordering
    one side by raw micro-timestamps silently changes which same-second
    rows are peers — measured as wildly different sums, not epsilons).
    One shuffle on user_id."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_seconds(F.col("ts")))
        .rangeBetween(-600, Window.currentRow)
    )
    return ev.select(
        "event_id", half_up(F.sum("value").over(w)).alias("roll_10m")
    )
