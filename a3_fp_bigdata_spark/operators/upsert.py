"""Merge/upsert — the lakehouse data-maintenance operator (engine
extension; the reference only ever overwrites whole tables,
spark_script.py:153).

Without a transactional table format, upsert is the classic anti-join
form: keep every base row whose key is NOT updated, then union the
updates (which both replace and insert). One shuffle on the key; with
the base bucketed on the key (sources.parquet_io.write_bucketed_table)
the anti-join is co-located and the rewrite touches only matching
buckets. On Delta/Iceberg the same logical op is MERGE INTO — this is
the engine-portable fallback with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """UPSERT: updates win on key collision, new keys are inserted.
    Columns are aligned by name (updates must carry base's schema)."""
    untouched = base.join(updates, on=key, how="left_anti")
    return untouched.unionByName(updates.select(*base.columns))


@query(
    "u1_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, c_nationkey,
             round(c_acctbal + 1000, 2) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT 9000000 + c_custkey, 'new#' || CAST(c_custkey AS VARCHAR),
             c_nationkey, 0.0, c_mktsegment
      FROM customer WHERE c_custkey % 100 = 0
    )
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, c_mktsegment
    FROM (
      SELECT * FROM customer WHERE c_custkey NOT IN
        (SELECT c_custkey FROM updates)
      UNION ALL
      SELECT * FROM updates
    )
    """,
)
def u1_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert round: 10% of customers get a balance bump (update), 1%
    are cloned as fresh keys (insert). Deterministic derivation so the
    oracle reproduces the exact update set."""
    cust = table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 1000, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    inserts = cust.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 9000000).alias("c_custkey"),
        F.concat(F.lit("new#"), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    merged = merge_upsert(cust, updates.unionByName(inserts), "c_custkey")
    return merged.select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )
