"""Projections / filters / predicates — SURVEY.md §2.2 rows P1-P8.

Every reference predicate shape (reference app.py:170-305,
spark_script.py:32-45) re-expressed as declarative Column expressions so
Catalyst pushes them into the parquet scan (`PushedFilters`) and prunes
columns (`ReadSchema`). Nothing here materializes; at 100 TB these all
stay scan-local with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query


@query(
    "p1_projection",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection (P1; reference app.py:213-214 valid_cols select).

    Catalyst column pruning: the scan reads only 3 of 6 column chunks.
    """
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "p2_cast_projection",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(o_linenum_str AS INT) AS linenum_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
    FROM (SELECT o_orderkey, o_totalprice, o_orderdate,
                 CAST(o_orderkey % 7 AS VARCHAR) AS o_linenum_str
          FROM orders)
    """,
)
def p2_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-cast projection loop (P2; reference spark_script.py:32-40).

    FLOOR before the long cast: Spark truncates double->long while ANSI
    engines round, so the truncation is made explicit and portable.
    """
    df = table(spark, sf_dir, "orders")
    return df.select(
        "o_orderkey",
        F.floor("o_totalprice").alias("price_floor"),
        (F.col("o_orderkey") % 7).cast("string").cast("int").alias("linenum_int"),
        # date -> ISO string on BOTH sides: engines agree on DATE
        # semantics but clients disagree on how DATE crosses the wire
        # (DuckDB's pandas client widens to midnight timestamps), so the
        # portable cast target for a value-hash compare is the string.
        F.to_date("o_orderdate").cast("string").alias("order_date"),
    )


@query(
    "p3_nonnull_conjunction",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE value IS NOT NULL AND user_id IS NOT NULL AND props IS NOT NULL
    """,
)
def p3_nonnull_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-null conjunction training filter (P3; reference spark_script.py:43-45)."""
    df = table(spark, sf_dir, "events")
    return df.filter(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("props").isNotNull()
    ).select("event_id", "user_id", "value")


@query(
    "p4_eq_predicate",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 421",
)
def p4_eq_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-lookup equality predicate (P4; reference app.py:189)."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == F.lit(421))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "p5_ci_equality",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE lower(c_mktsegment) = 'building'
    """,
)
def p5_ci_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive equality (P5; reference app.py:264,209)."""
    return (
        table(spark, sf_dir, "customer")
        .filter(F.lower(F.col("c_mktsegment")) == F.lit("building"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "p6_substring_predicate",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents WHERE contains(lower(text), 'merge batch')
    """,
)
def p6_substring_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring/LIKE predicate (P6; reference app.py:170 autocomplete).
    Probe phrase 'merge batch' occurs in ~5% of the synthetic corpus at
    every SF, so the oracle compare is selective AND non-vacuous (the
    round-1 probe matched 0 rows — a 0=0 compare can't catch bugs)."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.lower(F.col("text")).contains("merge batch"))
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "p7_conj_inequality",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_returnflag = 'A' AND l_linenumber <> 1
    """,
)
def p7_conj_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction with inequality (P7; reference app.py:274 same-cluster,
    different-app predicate)."""
    df = table(spark, sf_dir, "lineitem")
    return df.filter(
        (F.col("l_returnflag") == "A") & (F.col("l_linenumber") != 1)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "p8_notnull_pushed",
    oracle="SELECT doc_id, lang FROM documents WHERE lang IS NOT NULL",
)
def p8_notnull_pushed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-drop pushed into the engine (P8) — the reference filtered None
    genres in Python after collect (app.py:161); here it's a pushed-down
    IsNotNull predicate."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull())
        .select("doc_id", "lang")
    )
