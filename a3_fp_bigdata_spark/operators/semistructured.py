"""Semi-structured and collection functions (engine-generic surface).

The reference never touches arrays/maps/JSON inside Spark (SURVEY §1.2
'nested/array/map: not used anywhere') — its JSON work happens in Python
Kafka clients. A general engine needs the column-level surface: JSON
path extraction over string columns, array construction/aggregation,
map building. All pure JVM expressions (codegen'd, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql
from a3_fp_bigdata_spark.registry import query


@query(
    "x1_json_extract",
    oracle=f"""
    SELECT event_type,
           {half_up_sql("avg(CAST(json_extract(props, '$.k') AS INTEGER))")}
               AS avg_k,
           max(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def x1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props payload column, aggregated.
    get_json_object evaluates inside the scan projection — at 100 TB
    prefer parsing ONCE via from_json to a struct column (src2) over
    repeated path probes; a single-path probe like this is the
    break-even case."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        half_up(F.avg(k)).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count("*").alias("n"),
    )


@query(
    "x2_array_agg_ops",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
               AS types,
           len(list(DISTINCT event_type)) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def x2_array_agg_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + sort: per-user distinct event-type list.
    collect_set is a map-side-combinable agg; sort_array fixes the
    element order, and the array crosses the compare boundary as a
    joined string (array-typed result columns render differently per
    client — same pitfall family as p2's DATE)."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
                "types"
            ),
            F.size(F.collect_set("event_type")).alias("n_types"),
        )
    )


@query(
    "x3_array_flatten_positional",
    oracle="""
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) - 1 AS pos,
           event_id, event_type
    FROM events
    """,
)
def x3_array_flatten_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested round-trip: rows -> per-user event array -> positional
    flatten. collect_list's element order is partition-arrival order
    (non-deterministic), so the array is sorted by a struct whose field
    order (ts, event_id) IS the sort key before posexplode re-indexes
    it — the oracle states the same contract as a window rank. At scale
    this is one map-side-combinable agg + one generator, no extra
    shuffle beyond the groupBy."""
    ev = table(spark, sf_dir, "events")
    arr = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        ev.groupBy("user_id")
        .agg(arr.alias("evs"))
        .select("user_id", F.posexplode("evs").alias("pos", "e"))
        .select(
            "user_id",
            "pos",
            F.col("e.event_id").alias("event_id"),
            F.col("e.event_type").alias("event_type"),
        )
    )
