"""Serving-layer query shapes — the reference's seven API endpoints
(SURVEY.md §2.12, reference app.py:144-308) as pure DataFrame functions.

The HTTP layer is deliberately absent: each endpoint IS its query plan.
Mapped onto the driver test tables (orders/customer as the catalog,
embeddings.label as the cluster column) so every shape is
oracle-checkable. All top-k paths compile to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query


def valid_cols(df: DataFrame, wanted: list[str]) -> list[str]:
    """Drift-tolerant projection (P9/§1.3; reference app.py:213-214):
    intersect the wanted list with what the schema actually has."""
    present = set(df.columns)
    return [c for c in wanted if c in present]


def top_records(
    df: DataFrame,
    sort_by: str,
    limit: int,
    tie_break: str,
    select_cols: list[str],
    category: tuple[str, str] | None = None,
) -> DataFrame:
    """The /top_apps shape (reference app.py:227-258): optional category
    filter -> validated dynamic sort column -> top-k -> projection.
    Raises on an unknown sort column, like the reference's 400."""
    if sort_by not in df.columns:
        raise ValueError(f"invalid sort_by column: {sort_by}")
    if category is not None:
        col, value = category
        df = df.filter(F.col(col) == F.lit(value))
    return (
        df.orderBy(F.desc(sort_by), F.asc(tie_break))
        .select(*valid_cols(df, select_cols))
        .limit(limit)
    )


@query(
    "srv_check_data",
    oracle="""
    SELECT count(*) AS cnt, min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM orders
    """,
)
def srv_check_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/check_data (reference app.py:144-154): health summary of the
    serving table. The reference returned count + 3 arbitrary rows; the
    arbitrary sample is t7_limit_sample — here the deterministic stats."""
    return table(spark, sf_dir, "orders").agg(
        F.count("*").alias("cnt"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "srv_categories",
    oracle="""
    SELECT DISTINCT c_mktsegment AS category FROM customer
    WHERE c_mktsegment IS NOT NULL
    ORDER BY category
    """,
)
def srv_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/categories (reference app.py:156-162): distinct non-null labels,
    sorted. The reference dropped nulls in Python post-collect; here the
    IsNotNull is pushed into the scan (P8)."""
    return (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("category"))
        .filter(F.col("category").isNotNull())
        .distinct()
        .orderBy("category")
    )


@query(
    "srv_search_suggestions",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM (SELECT DISTINCT c_custkey, c_name, c_mktsegment
          FROM customer WHERE contains(lower(c_name), '19'))
    ORDER BY c_custkey
    LIMIT 15
    """,
)
def srv_search_suggestions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/search_app_suggestions (reference app.py:164-182): substring
    autocomplete -> distinct -> top-15. distinct BEFORE orderBy (the
    reference's post-sort distinct discarded the order; SURVEY §2.6 ⚠)."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.lower(F.col("c_name")).contains("19"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .distinct()
        .orderBy("c_custkey")
        .limit(15)
    )


@query(
    "srv_details_by_id",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey = 4242 LIMIT 1
    """,
)
def srv_details_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/app_details_by_id (reference app.py:184-204): unique-key point
    lookup, first row."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 4242)
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority",
        )
        .limit(1)
    )


@query(
    "srv_recommend_by_category",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    WHERE lower(o_orderpriority) = '2-high'
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def srv_recommend_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/recommend_apps_by_category (reference app.py:206-225):
    case-insensitive category filter -> multi-key top-20."""
    return (
        table(spark, sf_dir, "orders")
        .filter(F.lower(F.col("o_orderpriority")) == "2-high")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(20)
    )


@query(
    "srv_top_apps",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def srv_top_apps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/top_apps (reference app.py:227-258) at the UI's max page size.
    The dynamic-sort + category-param variant is t3_topk_dynamic_key."""
    return top_records(
        table(spark, sf_dir, "orders"),
        sort_by="o_totalprice",
        limit=50,
        tie_break="o_orderkey",
        select_cols=["o_orderkey", "o_custkey", "o_totalprice"],
    )


@query(
    "srv_similar_in_cluster",
    oracle="""
    SELECT vec_id, label
    FROM embeddings
    WHERE label = (SELECT label FROM embeddings WHERE vec_id = 5)
      AND vec_id <> 5
    ORDER BY vec_id
    LIMIT 10
    """,
)
def srv_similar_in_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/recommend_similar_app_by_name (reference app.py:260-292):
    cluster-membership similarity — look up the anchor's cluster, return
    top peers from the same cluster, excluding the anchor (P7's
    conjunction). The anchor row is a broadcast 1-row join, not a
    driver round-trip."""
    emb = table(spark, sf_dir, "embeddings")
    anchor = emb.filter(F.col("vec_id") == 5).select(
        F.col("label").alias("anchor_label")
    )
    return (
        emb.join(F.broadcast(anchor), F.col("label") == F.col("anchor_label"))
        .filter(F.col("vec_id") != 5)
        .select("vec_id", "label")
        .orderBy("vec_id")
        .limit(10)
    )


@query(
    "srv_apps_in_cluster",
    oracle="""
    SELECT vec_id, label FROM embeddings
    WHERE label = 3
    ORDER BY vec_id
    LIMIT 20
    """,
)
def srv_apps_in_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/apps_in_cluster (reference app.py:295-308): cluster listing,
    top-20."""
    return (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("label") == 3)
        .select("vec_id", "label")
        .orderBy("vec_id")
        .limit(20)
    )
