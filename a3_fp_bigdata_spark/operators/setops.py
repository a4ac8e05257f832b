"""Set operations — engine-generic surface (SURVEY.md §2.7).

The reference's only union is the implicit multi-file CSV directory scan
(S1) and a pandas concat (feature_extractor.py:47); a complete engine
exposes union/intersect/except. Spark implements INTERSECT/EXCEPT as
semi/anti hash joins over distinct inputs — one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query


@query(
    "so1_union_all",
    oracle="""
    SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier
    """,
)
def so1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by name (multi-file scan generalization, ref S1/S10).
    unionByName is position-independent — the safe union at scale where
    upstream column order drifts."""
    cust = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp)


@query(
    "so2_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def so2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: nations having both customers and suppliers."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


@query(
    "so3_except",
    oracle="""
    SELECT c_custkey % 7 AS shard FROM customer
    EXCEPT
    SELECT s_suppkey % 5 FROM supplier
    """,
)
def so3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference over shard ids: customer shards (mod 7) minus
    supplier shards (mod 5) — always exactly {5, 6}, at every SF. (The
    round-1 form, customer nations minus supplier nations, was empty —
    every nation has suppliers — so the 0=0 compare was vacuous.)"""
    cust = table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 7).alias("shard")
    )
    supp = table(spark, sf_dir, "supplier").select(
        (F.col("s_suppkey") % 5).alias("shard")
    )
    return cust.subtract(supp)
