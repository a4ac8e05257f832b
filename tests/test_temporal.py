"""As-of and range join semantics (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.operators import temporal as TP
from tests.conftest import SF0001


def test_asof_left_rows_without_match_keep_nulls(spark):
    """The generic operator is LEFT as-of: rows with no prior right row
    survive with null payload (the registered query filters them only
    for oracle type-stability)."""
    ev = table(spark, SF0001, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = TP.asof_join(
        purchases, clicks, key="user_id", ts="ts",
        value_cols=["value", "event_id"], tie_break="event_id",
    )
    assert out.count() == purchases.count()  # left semantics: no row lost


def test_asof_match_is_latest_at_or_before(spark):
    ev = table(spark, SF0001, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = TP.asof_join(
        purchases, clicks, key="user_id", ts="ts",
        value_cols=["value", "event_id"], tie_break="event_id",
    ).filter(F.col("asof_event_id").isNotNull())
    sample = out.limit(20).collect()
    click_rows = {
        (r.user_id, r.event_id): r.ts for r in clicks.collect()
    }
    purch_ts = {r.event_id: r.ts for r in purchases.collect()}
    for r in sample:
        matched_ts = click_rows[(r.user_id, r.asof_event_id)]
        assert matched_ts <= purch_ts[r.event_id]


def test_range_join_equals_naive_theta_join(spark):
    """Bucketized range join == the naive inequality join it optimizes."""
    ev = table(spark, SF0001, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    naive = (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") > F.col("a_ts"))
            & (
                F.col("b_ts")
                <= F.col("a_ts") + F.expr(f"INTERVAL {TP.RANGE_MINUTES} MINUTES")
            ),
            "left_outer",
        )
        .groupBy(F.col("a_id").alias("event_id"))
        .agg(F.count("b_id").alias("n_following"))
    )
    from a3_fp_bigdata_spark import registry

    bucketized = registry.all_queries()["j9_range_join"](spark, SF0001)
    assert sorted(map(tuple, bucketized.collect())) == sorted(
        map(tuple, naive.collect())
    )
