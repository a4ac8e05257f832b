"""Explicit StructType registry for every source the engine reads.

The reference reads everything schemaless (``inferSchema=False`` at
spark_script.py:168, defensive pandas reindexing at consumer.py:35-59).
We declare schemas up front — on a 100 TB lake, schema inference is a
full extra scan and silent drift is an outage.

Two groups:
- ``APPS_*``: the reference's own data shapes (FIXTURES.md §A).
- ``TESTDATA``: the driver's TPC-H-ish tables (TESTDATA.md) used by the
  correctness oracle; declared so ``spark.read.schema(...)`` never infers.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference-shaped sources (FIXTURES.md §A; cites are reference file:line)
# --------------------------------------------------------------------------

#: Core columns of the apps batch CSV (consumer.py:35-44 canonical list;
#: cast targets from spark_script.py:32-36). Remaining CSV columns are
#: pass-through strings handled by the drift-tolerant projection helper.
APPS_CORE = T.StructType(
    [
        T.StructField("appId", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("genre", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("minInstalls", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("developer", T.StringType()),
        T.StructField("developerId", T.StringType()),
        T.StructField("reviews", T.StringType()),
        T.StructField("genreId", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("icon_path", T.StringType()),
        T.StructField("icon_category_assigned", T.StringType()),
    ]
)

#: image_features.parquet shape (feature_extractor.py:25-31).
IMAGE_FEATURES = T.StructType(
    [
        T.StructField("appId", T.StringType()),
        T.StructField("img_avg_red", T.DoubleType()),
        T.StructField("img_avg_green", T.DoubleType()),
        T.StructField("img_avg_blue", T.DoubleType()),
        T.StructField("img_width", T.LongType()),
        T.StructField("img_height", T.LongType()),
    ]
)

#: Serving table written by the ETL+ML stage (spark_script.py:136-153;
#: footer of api_app_info_final_with_features/part-00000).
API_APP_INFO = T.StructType(
    [
        T.StructField("appId", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("genre", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("minInstalls", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("icon_path", T.StringType()),
        T.StructField("cluster", T.IntegerType(), nullable=False),
        T.StructField("PredictedRating", T.DoubleType(), nullable=False),
        T.StructField("img_avg_red", T.FloatType()),
        T.StructField("img_avg_green", T.FloatType()),
        T.StructField("img_avg_blue", T.FloatType()),
    ]
)

#: JSON value schema of one Kafka message (producer.py:84-106: all app
#: columns NaN->null plus icon enrichment). Used with ``from_json``.
APP_EVENT_JSON = APPS_CORE

#: Cast map applied after a string-typed CSV scan — mirrors the training
#: cast map (spark_script.py:32-36); the serve-time map (app.py:118-124)
#: disagreed on float vs double — we normalize to the training map and
#: document the deviation (SURVEY.md §7 risk register).
APPS_CAST_MAP: dict[str, T.DataType] = {
    "score": T.DoubleType(),
    "minInstalls": T.LongType(),
    "price": T.DoubleType(),
    "img_avg_red": T.FloatType(),
    "img_avg_green": T.FloatType(),
    "img_avg_blue": T.FloatType(),
    "img_width": T.IntegerType(),
    "img_height": T.IntegerType(),
}

# --------------------------------------------------------------------------
# Driver test tables (TESTDATA.md / FIXTURES.md §B)
#
# Timestamp columns are declared TIMESTAMP_NTZ: the driver parquet
# stores physical timestamp[us] with isAdjustedToUTC=false, which Spark
# 4.x loads as NTZ — the declared schema must match what the files
# actually carry (tests/test_env_drift.py pins this against the footer).
# --------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}
