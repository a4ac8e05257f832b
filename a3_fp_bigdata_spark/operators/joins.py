"""Joins — SURVEY.md §2.3 rows J1-J3 plus the generic surface.

The reference's only Spark join is one big⋈small left-outer on appId
(reference spark_script.py:24, 925k x 4.3k rows); its other "joins" are
driver-side dict merges (app.py:55-65) and a genre->icon lookup with a
default (producer.py:17-31). Here every shape is a declarative join:

- small dimensions get an explicit `broadcast()` hint — at 100 TB the fact
  side never shuffles for these joins (broadcast-hash, map-side);
- semi/anti express EXISTS/NOT EXISTS without materializing the right side;
- the lookup-with-default becomes a broadcast map literal + coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql
from a3_fp_bigdata_spark.registry import query


def left_outer_enrich(
    fact: DataFrame, dim: DataFrame, on: str | list[str]
) -> DataFrame:
    """J1: fact left-outer-joined to a broadcast dimension (reference
    spark_script.py:24 apps ⋈ image_features). Broadcast keeps the fact
    side shuffle-free regardless of its size."""
    return fact.join(broadcast(dim), on=on, how="left_outer")


@query(
    "j1_left_outer_broadcast",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders LEFT OUTER JOIN customer ON o_custkey = c_custkey
    """,
)
def j1_left_outer_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer equi-join, big fact x small dim (J1)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    joined = left_outer_enrich(
        orders, customer, on=[orders.o_custkey == customer.c_custkey]
    )
    return joined.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@query(
    "j2_inner_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_name, p_retailprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size > 40
    """,
)
def j2_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic inner equi-join with a pushed dimension predicate. The
    p_size filter is applied before the join, shrinking the broadcast."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return li.join(broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_name", "p_retailprice"
    )


@query(
    "j3_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def j3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order.
    Semi joins never duplicate or widen the left side — at scale this is
    a broadcast of the distinct filtered keys."""
    cust = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, how="left_semi"
    ).select("c_custkey", "c_name")


@query(
    "j4_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, how="left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j5_multiway_join",
    oracle=f"""
    SELECT r_name, count(*) AS n_customers,
           {half_up_sql('sum(c_acctbal)', 2)} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j5_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiway star join + aggregate. Both dims broadcast; the only
    shuffle is the final group-by on a 5-value key."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            half_up(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "j6_lookup_with_default",
    oracle="""
    SELECT event_id, event_type,
           CAST(CASE event_type
                WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
                WHEN 'purchase' THEN 5.0 ELSE 0.1 END AS DOUBLE) AS weight
    FROM events
    """,
)
def j6_lookup_with_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension lookup with a default key (J3; reference producer.py:17-31
    genre->icon-category map with 'default' fallback). A map literal is
    evaluated per-row JVM-side — no join, no shuffle."""
    weights = F.create_map(
        F.lit("click"), F.lit(1.0),
        F.lit("view"), F.lit(0.5),
        F.lit("purchase"), F.lit(5.0),
    )
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.coalesce(weights[F.col("event_type")], F.lit(0.1)).alias("weight"),
    )


SALT_BUCKETS = 8


def salted_join(
    big: DataFrame,
    skewed_dim: DataFrame,
    big_key: str,
    dim_key: str,
    *,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Skew-mitigating equi-join: the big side gets a random-but-
    deterministic salt in [0, buckets); the dim side is exploded into
    `buckets` replicas, one per salt value. The shuffle key becomes
    (key, salt), so a hot key's rows spread over `buckets` reducers
    instead of melting one.

    This is the manual form of what AQE skew-join does at runtime
    (session.py enables it); keep the manual operator for engines-off
    debugging and for sinks that pre-date AQE stats (first write of a
    new table). The salt MUST be independent of the key (a key-derived
    salt is constant per key and would leave the hot key in one
    bucket): round-robin within each input partition spreads even a
    single hot key evenly. The join result is salt-invariant, so the
    salt needs no cross-run determinism.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )
    salted_dim = skewed_dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_big.join(
        salted_dim,
        (F.col(big_key) == F.col(dim_key)) & (salted_big["_salt"] == salted_dim["_salt"]),
    ).drop("_salt")


@query(
    "j7_salted_skew_join",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n,
           {half_up_sql('sum(o_totalprice)', 2)} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def j7_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-extension: the salted join produces byte-identical results to
    the plain join (oracle = plain SQL join) while spreading each join
    key over SALT_BUCKETS shuffle partitions. The merge-join hint forces
    the shuffle path so the salt actually exercises (broadcast would
    bypass it at this scale)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer").hint("merge")
    joined = salted_join(orders, customer, "o_custkey", "c_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        half_up(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "j10_salted_hotkey",
    oracle=f"""
    WITH skewed AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE o_custkey END AS k,
             o_totalprice
      FROM orders
    )
    SELECT c_mktsegment, count(*) AS n,
           {half_up_sql('sum(o_totalprice)', 2)} AS total
    FROM skewed JOIN customer ON k = c_custkey
    GROUP BY c_mktsegment
    """,
)
def j10_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under GENUINE skew: half of all orders collapse onto
    customer key 1 (a deterministic derivation the oracle reproduces),
    so an unsalted shuffle join would melt one reducer with 50% of the
    fact table. salted_join spreads the hot key over SALT_BUCKETS
    shuffle partitions; the result is salt-invariant (oracle = plain
    join). bench.py times this at sf0.1 every round, putting a number
    on the skew path rather than leaving it a claim."""
    orders = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("k"),
        "o_totalprice",
    )
    customer = table(spark, sf_dir, "customer").hint("merge")
    joined = salted_join(orders, customer, "k", "c_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        half_up(F.sum("o_totalprice"), 2).alias("total"),
    )


#: Bloom geometry for j11: 4096 bits / 64 longs, 3 seeded hash probes.
#: At the canonical build size (~300 keys, sf0.01) kn/m ≈ 0.22 so the
#: false-positive rate is ~0.8%; production sizes m to the build-side
#: cardinality estimate the same way (m ≈ 10-15 bits/key).
BLOOM_BITS = 4096
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_HASHES = 3


def _bloom_bit(key, seed: int):
    return F.pmod(F.xxhash64(F.lit(seed), key), F.lit(BLOOM_BITS))


def build_bloom(keys: DataFrame) -> list[int]:
    """Fold a key column's bloom filter down to BLOOM_WORDS longs.

    Distributed shape: each key row contributes (word, mask) pairs for
    its {BLOOM_HASHES} probe positions; a map-side-combinable bit_or
    per word reduces the whole build side to at most {BLOOM_WORDS}
    rows, and ONLY those reach the driver — the collect is the
    64-long broadcast artifact itself, never the keys."""
    col = F.col(keys.columns[0])
    pairs = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (_bloom_bit(col, s) / 64).cast("int").alias("w"),
                        F.call_function(
                            "shiftleft",
                            F.lit(1).cast("long"),
                            _bloom_bit(col, s).cast("int") % 64,
                        ).alias("m"),
                    )
                    for s in range(BLOOM_HASHES)
                ]
            )
        ).alias("p")
    ).select("p.w", "p.m")
    words = [0] * BLOOM_WORDS
    for r in pairs.groupBy("w").agg(F.bit_or("m").alias("bits")).collect():
        words[r.w] = r.bits
    return words


def bloom_might_contain(key, words: list[int]):
    """Scan-side membership test: all {BLOOM_HASHES} probe bits set in
    the literal word array — pure JVM expressions, no UDF, pushable
    below the join's exchange."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for s in range(BLOOM_HASHES):
        bit = _bloom_bit(key, s)
        word = F.element_at(arr, (bit / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), bit.cast("int") % 64
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


@query(
    "j11_bloom_prefilter_join",
    oracle=f"""
    SELECT o.o_orderstatus,
           count(*) AS n,
           {half_up_sql('sum(o.o_totalprice)', 2)} AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderstatus
    """,
)
def j11_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via a hand-rolled bloom filter — the shuffle
    -join survival technique for when the build side is too big to
    broadcast EXACTLY but its bloom still fits anywhere: probe rows
    failing the membership test are dropped AT THE SCAN, before the
    exchange, so the shuffle moves only (matches + ~0.8% false
    positives) instead of the whole fact table. Spark 3.3+ grows a
    runtime form of this (spark.sql.optimizer.runtime.bloomFilter);
    the explicit version is engine-portable, sizable per-build, and
    inspectable in the plan. Blooms have NO false negatives, so the
    final shuffled join re-checks exact equality and the result is
    bit-identical to the plain join — which is precisely what the
    oracle verifies.

    The join itself is hinted shuffle-hash (the scenario where
    broadcast is off the table); at sf the optimizer would happily
    broadcast, but the PLAN this pins — filter below exchange — is
    the 100 TB shape."""
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    words = build_bloom(cust.select("c_custkey"))
    orders = table(spark, sf_dir, "orders").filter(
        bloom_might_contain(F.col("o_custkey"), words)
    )
    joined = orders.join(
        cust.select("c_custkey").hint("shuffle_hash"),
        orders.o_custkey == F.col("c_custkey"),
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        half_up(F.sum("o_totalprice"), 2).alias("total"),
    )
