"""Sorts / limits / top-k — SURVEY.md §2.6 rows T1-T8.

The reference's dominant serving pattern is ORDER BY ... DESC LIMIT n
(reference app.py:170-305). Spark executes orderBy+limit as
`TakeOrderedAndProject` — a distributed partial top-k (per-partition heap,
then a driver merge of n*partitions candidates), never a full sort; this
is exactly the plan that survives 100 TB.

Determinism: every LIMIT here is under a TOTAL order (unique tie-break
key) so the selected row set is well-defined on any engine. The
reference's distinct-after-orderBy quirk (app.py:170-173) is deliberately
fixed to distinct -> orderBy -> limit (SURVEY.md §2.6 ⚠).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query


@query(
    "t1_topk_multikey",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def t1_topk_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key top-k (T1; reference app.py:209-215 category browse)."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)
    )


@query(
    "t2_distinct_topk",
    oracle="""
    SELECT l_returnflag, l_linestatus
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    ORDER BY l_returnflag, l_linestatus
    LIMIT 15
    """,
)
def t2_distinct_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct then ordered limit (T2; reference app.py:170-173 search
    suggestions). The reference ordered BEFORE distinct, which discards the
    sort in Spark — we do distinct -> orderBy -> limit and document the
    deviation (SURVEY.md §2.6)."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
        .limit(15)
    )


@query(
    "t3_topk_dynamic_key",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def t3_topk_dynamic_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-sort-column top-k with category filter (T3; reference
    app.py:227-258 /top_apps). The sort column arrives as a validated
    parameter — see serving.top_records for the parameterized form."""
    from a3_fp_bigdata_spark.serving import top_records

    return top_records(
        table(spark, sf_dir, "orders"),
        sort_by="o_totalprice",
        limit=10,
        category=("o_orderpriority", "1-URGENT"),
        tie_break="o_orderkey",
        select_cols=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )


@query(
    "t6_sort_asc",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_name",
)
def t6_sort_asc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small ascending sort (T6; reference spark_script.py:80, app.py:161)."""
    return table(spark, sf_dir, "nation").orderBy("n_name")


@query(
    "t7_limit_sample",
    oracle="SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 3",
)
def t7_limit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample fetch (T7; reference app.py:153 `limit(3)`). The reference's
    bare limit has engine-defined row choice; we pin a key order so the
    sample is reproducible."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy("o_orderkey")
        .select("o_orderkey", "o_orderstatus")
        .limit(3)
    )


@query(
    "t8_first_row",
    oracle="SELECT c_custkey, c_name, c_nationkey FROM customer WHERE c_custkey = 7 LIMIT 1",
)
def t8_first_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-row fetch on a unique key (T8; reference app.py:189 `.first()`)."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 7)
        .select("c_custkey", "c_name", "c_nationkey")
        .limit(1)
    )
