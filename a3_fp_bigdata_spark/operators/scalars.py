"""Scalar-function operators F3-F6 (SURVEY §2.8) — the reference's
Python-side row logic as native Spark expressions.

F1 (keyword extraction) and F2 (token overlap) live in
operators/text_analysis.py; this module covers the remainder:
F3 NaN->null normalization (reference producer.py:84), F4 seeded random
element choice (producer.py:92-101), F5 URL rewrite
(app_scraper.py:86-91), F6 renames (app.py:39-44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.functions.text import rewrite_icon_url
from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql
from a3_fp_bigdata_spark.registry import query


@query(
    "f3_nan_normalize",
    oracle="""
    SELECT event_id,
           CASE WHEN isnan(value) THEN NULL ELSE value END AS value_clean,
           CASE WHEN isnan(value) OR value IS NULL THEN 1 ELSE 0 END
               AS was_missing
    FROM events
    """,
)
def f3_nan_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: NaN -> null normalization before serialization (the
    reference's per-field `None if pd.isna(v) else v`, producer.py:84).
    nanvl-style CASE keeps it a pure projection — no shuffle, fully
    codegen'd, and the parquet scan reads only two columns."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.isnan("value"), F.lit(None)).otherwise(F.col("value")).alias(
            "value_clean"
        ),
        (F.isnan("value") | F.col("value").isNull())
        .cast("int")
        .alias("was_missing"),
    )


@query(
    "f4_seeded_choice",
    oracle="""
    SELECT o_orderkey,
           ['bronze', 'silver', 'gold', 'platinum']
               [CAST(o_orderkey % 4 AS INTEGER) + 1] AS tier
    FROM orders
    """,
)
def f4_seeded_choice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: the reference assigns a random element per row
    (random.choice over icon categories, producer.py:92-101). For a
    reproducible engine the choice is keyed, not random: index an array
    literal by the row key (dense int keys are already uniform mod 4;
    production mixes with xxhash64 first). Deterministic replay, and the
    keyed form is expressible in any engine so it oracles exactly."""
    tiers = F.array(*[F.lit(t) for t in ("bronze", "silver", "gold", "platinum")])
    orders = table(spark, sf_dir, "orders")
    # element_at is 1-based, matching DuckDB list indexing.
    return orders.select(
        "o_orderkey",
        F.element_at(tiers, (F.col("o_orderkey") % 4 + 1).cast("int")).alias(
            "tier"
        ),
    )


@query(
    "f5_url_rewrite",
    oracle="""
    SELECT doc_id,
           CASE WHEN position('=s' IN source) > 0
                THEN split_part(source, '=s', 1) || '=s512'
                ELSE source || '=s512' END AS icon_url
    FROM documents
    """,
)
def f5_url_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: icon URL size rewrite `url.split('=s')[0] + '=s512'`
    (app_scraper.py:86-91) as substring_index+concat over the documents
    source column (stand-in URL strings)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rewrite_icon_url(F.col("source")).alias("icon_url")
    )


@query(
    "f6_rename_projection",
    oracle="""
    SELECT c_custkey AS app_id, c_name AS title, c_acctbal AS score
    FROM customer
    """,
)
def f6_rename_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: the API layer's key-rename surgery (app.py:39-44) as aliases —
    a zero-cost projection, not a row-dict rewrite."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("app_id"),
        F.col("c_name").alias("title"),
        F.col("c_acctbal").alias("score"),
    )


@query(
    "f7_display_format",
    oracle=f"""
    SELECT o_orderpriority,
           format('{{:,}}', CAST(count(*) AS BIGINT)) AS n_display,
           printf('%.2f', {half_up_sql('avg(o_totalprice)', 2)})
             AS avg_display
    FROM orders GROUP BY o_orderpriority
    """,
)
def f7_display_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 (index.html:684-691): toLocaleString/toFixed display
    formatting, in-engine — thousands-separated counts
    (format_number, 0 dp) and fixed-2-decimal averages. Rounding to 2
    decimals BEFORE formatting keeps Java's HALF_UP and C's
    round-half-even printf from ever seeing a digit-5 midpoint, so the
    strings agree exactly across engines."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.format_number(F.count("*"), 0).alias("n_display"),
        F.format_string(
            "%.2f", half_up(F.avg("o_totalprice"), 2)
        ).alias("avg_display"),
    )
