"""dq1 expectation suite — the checks must actually FIRE.

Zero violations on the clean driver data proves nothing by itself; these
tests corrupt specific rows (duplicate pk, dangling fk, illegal enum,
null/absurd/negative values) and assert each expectation counts exactly
the corruption injected, and that the publish gate raises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.operators import quality_checks as Q
from tests.conftest import SF0001


def _corrupted(spark):
    """(orders, customer, lineitem) with one violation per check."""
    orders = table(spark, SF0001, "orders")
    customer = table(spark, SF0001, "customer")
    lineitem = table(spark, SF0001, "lineitem")
    first_order = orders.limit(1)
    orders_bad = (
        orders
        # duplicate pk: re-append the first order row
        .unionByName(first_order)
        # dangling fk + illegal status: one synthetic row
        .unionByName(
            first_order.withColumn(
                "o_orderkey", F.lit(-1).cast("long")
            ).withColumn(
                "o_custkey", F.lit(-999_999).cast("long")
            ).withColumn("o_orderstatus", F.lit("X"))
        )
        # NULL status: must count as a domain violation (NOT IN over
        # NULL is NULL — the naive check would silently pass it)
        .unionByName(
            first_order.withColumn(
                "o_orderkey", F.lit(-2).cast("long")
            ).withColumn(
                "o_orderstatus", F.lit(None).cast("string")
            )
        )
    )
    first_li = lineitem.limit(1)
    lineitem_bad = (
        lineitem.unionByName(
            first_li.withColumn(
                "l_quantity", F.lit(None).cast("double")
            )
        )
        .unionByName(
            first_li.withColumn("l_quantity", F.lit(9_999.0))
        )
        .unionByName(
            first_li.withColumn("l_extendedprice", F.lit(-5.0))
        )
    )
    return orders_bad, customer, lineitem_bad


def test_every_expectation_fires_on_corruption(spark, monkeypatch):
    orders_bad, customer, lineitem_bad = _corrupted(spark)

    def patched(spark_, sf_dir_, name):
        return {
            "orders": orders_bad,
            "customer": customer,
            "lineitem": lineitem_bad,
        }[name]

    monkeypatch.setattr(Q, "table", patched)
    report = {
        r.check_name: r
        for r in Q.dq1_expectations(spark, SF0001).collect()
    }
    # the duplicated pk row ALSO duplicates its (valid) fk/status, so
    # only the synthetic rows violate fk/domain: dangling-fk row for
    # the fk check; illegal 'X' + NULL status for the domain check
    assert report["orders_pk_unique"].n_violations == 1
    assert report["orders_fk_customer"].n_violations == 1
    assert report["orders_status_domain"].n_violations == 2
    assert report["lineitem_qty_not_null"].n_violations == 1
    # the null row is NOT a range violation (null comparisons are
    # null -> otherwise(0)); only the absurd-quantity row counts
    assert report["lineitem_qty_range"].n_violations == 1
    assert report["lineitem_price_positive"].n_violations == 1
    # n_checked grew by the injected rows
    assert report["orders_pk_unique"].n_checked == (
        table(spark, SF0001, "orders").count() + 3
    )


def test_clean_data_passes_and_gate_raises_on_violations(spark, monkeypatch):
    clean = Q.dq1_expectations(spark, SF0001)
    assert clean.filter(F.col("n_violations") > 0).count() == 0
    Q.run_expectations(clean)  # must not raise

    orders_bad, customer, lineitem_bad = _corrupted(spark)
    monkeypatch.setattr(
        Q,
        "table",
        lambda s, d, name: {
            "orders": orders_bad,
            "customer": customer,
            "lineitem": lineitem_bad,
        }[name],
    )
    with pytest.raises(ValueError, match="orders_pk_unique"):
        Q.run_expectations(Q.dq1_expectations(spark, SF0001))


def test_gate_fails_closed_on_empty_table(spark, monkeypatch):
    """An empty lineitem (broken upstream write) must FAIL the gate:
    its checks report n_checked=0, n_violations=0 — a pass under a
    naive `violations > 0` filter, which is exactly how an empty table
    would publish."""
    empty_li = table(spark, SF0001, "lineitem").filter(F.lit(False))
    real = Q.table
    monkeypatch.setattr(
        Q,
        "table",
        lambda s, d, name: empty_li
        if name == "lineitem"
        else real(s, d, name),
    )
    report = Q.dq1_expectations(spark, SF0001)
    li_rows = report.filter(
        F.col("check_name").startswith("lineitem")
    ).collect()
    assert all(
        r.n_checked == 0 and r.n_violations == 0 for r in li_rows
    )  # coalesced, never NULL
    with pytest.raises(ValueError, match="lineitem_qty_not_null"):
        Q.run_expectations(report)


def test_profile_drift_matches_python_replay(spark):
    """dq2: the three-metric drift report equals a plain-Python replay
    of both snapshot profiles (same keyed derivation, same half-up
    rounding, same relative threshold) — and the simulated regression
    actually fires the row-count and null-rate alarms."""
    import math

    from a3_fp_bigdata_spark.operators import quality_checks as Q

    rows = table(spark, SF0001, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()

    def profile(vals):
        n = len(vals)
        nulls = sum(1 for v in vals if v is None)
        present = [v for v in vals if v is not None]
        return (
            float(n),
            sum(present) / len(present) if present else None,
            nulls / n,
        )

    def hup(x):
        return math.floor(x * 10000 + 0.5) / 10000

    a = profile([r.o_totalprice for r in rows])
    b = profile(
        [
            None if r.o_orderkey % Q.DRIFT_NULL_MOD == 0 else r.o_totalprice
            for r in rows
            if r.o_orderkey % Q.DRIFT_DROP_MOD != 0
        ]
    )
    expected = {}
    for i, m in enumerate(("n_rows", "price_mean", "price_null_rate")):
        drift = abs(b[i] - a[i]) > Q.DRIFT_TOL * abs(a[i]) + 1e-12
        expected[m] = (hup(a[i]), hup(b[i]), drift)
    got = {
        r.metric: (r.snap_a, r.snap_b, r.drifted)
        for r in Q.dq2_profile_drift(spark, SF0001).collect()
    }
    assert got == expected
    assert got["n_rows"][2] is True  # the 10% drop fires
    assert got["price_null_rate"][2] is True  # the null pollution fires


def test_dq3_planted_orphans_flag_their_edge_only(spark, tmp_path):
    """Crafted star schema with exactly two violations (an order
    pointing at a missing customer, a lineitem at a missing order) —
    dq3 must flag those edges with the right orphan counts, keep the
    healthy edges ok, and NOT count a null FK as an orphan."""
    import shutil

    from a3_fp_bigdata_spark.operators.quality_checks import (
        dq3_referential_integrity,
    )

    # healthy copies of the dimension chain
    for t in ("region", "nation", "supplier", "customer"):
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet",
            tmp_path / f"{t}.parquet",
        )
    customers = spark.read.parquet(str(tmp_path / "customer.parquet"))
    good_cust = customers.first()["c_custkey"]
    orders = spark.createDataFrame(
        [
            (1, good_cust, "O", 10.0, "1998-01-01", "1-URGENT"),
            (2, 999_999_999, "O", 10.0, "1998-01-01", "1-URGENT"),  # orphan
            (3, None, "O", 10.0, "1998-01-01", "1-URGENT"),  # null: NOT one
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    orders.coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1998-01-02"),
         (777, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1998-01-02")],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate string",
    )
    lineitem.coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["fk_edge"]: (r["n_orphans"], r["ok"])
        for r in dq3_referential_integrity(spark, str(tmp_path)).collect()
    }
    assert got["orders.o_custkey -> customer.c_custkey"] == (1, 0)
    assert got["lineitem.l_orderkey -> orders.o_orderkey"] == (1, 0)
    assert got["customer.c_nationkey -> nation.n_nationkey"] == (0, 1)
    assert got["supplier.s_nationkey -> nation.n_nationkey"] == (0, 1)
    assert got["nation.n_regionkey -> region.r_regionkey"] == (0, 1)


# --- dq4: embedding-space drift monitor --------------------------------------


def test_dq4_invariants_and_python_replay(spark):
    """The drift rows must satisfy the formula exactly (replayed in
    python from the collected counts) and the histogram must cover the
    whole corpus: totals add up, shares floor-divide, drifted is the
    threshold predicate verbatim."""
    from tests.conftest import SF0001
    from a3_fp_bigdata_spark.operators import quality_checks as QC

    rows = QC.dq4_embedding_drift(spark, SF0001).collect()
    assert 1 <= len(rows) <= QC.EMB_DRIFT_CELLS
    t_old = sum(r["n_old"] for r in rows)
    t_new = sum(r["n_new"] for r in rows)
    import duckdb

    con = duckdb.connect()
    (n_vecs,) = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF0001}/embeddings.parquet')"
    ).fetchone()
    assert t_old + t_new == n_vecs  # every vector lands in one cell
    for r in rows:
        assert r["share_old_bp"] == r["n_old"] * 10000 // t_old
        assert r["share_new_bp"] == r["n_new"] * 10000 // t_new
        assert r["drifted"] == int(
            abs(r["share_old_bp"] - r["share_new_bp"]) > QC.EMB_DRIFT_BP
        )


def test_dq4_planted_shift_fires_and_identical_split_does_not(spark, tmp_path):
    """Control + treatment on a crafted corpus: when old and new
    snapshots draw from the SAME directions, no cell drifts; when the
    new snapshot abandons one direction for another, the affected
    cells must flag."""
    import numpy as np

    from a3_fp_bigdata_spark.operators import quality_checks as QC
    from a3_fp_bigdata_spark.operators.similarity import N_PLANES
    from a3_fp_bigdata_spark.operators.text_analysis import sample_predicate_sql

    rng = np.random.default_rng(7)
    dim = 16
    planes = rng.standard_normal((N_PLANES, dim))
    dir_a = rng.standard_normal(dim)
    dir_b = rng.standard_normal(dim)

    def write(corpus_shifted: bool, path):
        # vec_id 1..N_PLANES are the hyperplanes (sim2's convention)
        rows = [(0, (dir_a + 0.01 * rng.standard_normal(dim)).tolist())]
        rows += [(i + 1, planes[i].tolist()) for i in range(N_PLANES)]
        vid = N_PLANES + 1
        pred_py = lambda k: ((k % 1_000_003) * 2_654_435_761) % 100 < QC.EMB_SNAPSHOT_PCT  # noqa: E731
        for _ in range(4000):
            is_old = pred_py(vid)
            base = dir_a if (is_old or not corpus_shifted) else dir_b
            rows.append(
                (vid, (base + 0.05 * rng.standard_normal(dim)).tolist())
            )
            vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        df.coalesce(1).write.mode("overwrite").parquet(
            str(path / "embeddings.parquet")
        )

    # the python replica of sample_predicate must BE sample_predicate
    assert sample_predicate_sql("k", QC.EMB_SNAPSHOT_PCT) == (
        "(((k) % 1000003) * 2654435761) % 100 < " + str(QC.EMB_SNAPSHOT_PCT)
    )

    ctrl = tmp_path / "ctrl"
    ctrl.mkdir()
    write(False, ctrl)
    ctrl_rows = QC.dq4_embedding_drift(spark, str(ctrl)).collect()
    assert sum(r["drifted"] for r in ctrl_rows) == 0, ctrl_rows

    shift = tmp_path / "shift"
    shift.mkdir()
    write(True, shift)
    shift_rows = QC.dq4_embedding_drift(spark, str(shift)).collect()
    assert sum(r["drifted"] for r in shift_rows) >= 1, shift_rows


def test_dq5_chi_square_decision_planted_shift(spark, tmp_path):
    """dq5's one-row verdict: the smoothed chi-square must stay under
    the pinned χ²_0.999 critical value on a null split (same
    directions in both snapshots) and fire on a planted distribution
    shift; the micro-unit statistic must equal an independent python
    replay of the exact integer construction from the histogram."""
    import numpy as np

    from a3_fp_bigdata_spark.operators import quality_checks as QC
    from a3_fp_bigdata_spark.operators.similarity import N_PLANES

    rng = np.random.default_rng(11)
    dim = 16
    planes = rng.standard_normal((N_PLANES, dim))
    dir_a = rng.standard_normal(dim)
    dir_b = rng.standard_normal(dim)

    def write(corpus_shifted: bool, path):
        rows = [(0, (dir_a + 0.01 * rng.standard_normal(dim)).tolist())]
        rows += [(i + 1, planes[i].tolist()) for i in range(N_PLANES)]
        vid = N_PLANES + 1
        pred = lambda k: ((k % 1_000_003) * 2_654_435_761) % 100 < QC.EMB_SNAPSHOT_PCT  # noqa: E731
        for _ in range(3000):
            base = dir_a if (pred(vid) or not corpus_shifted) else dir_b
            rows.append((vid, (base + 0.05 * rng.standard_normal(dim)).tolist()))
            vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        df.coalesce(1).write.mode("overwrite").parquet(
            str(path / "embeddings.parquet")
        )

    ctrl, shift = tmp_path / "ctrl", tmp_path / "shift"
    ctrl.mkdir(), shift.mkdir()
    write(False, ctrl)
    write(True, shift)

    r = QC.dq5_drift_decision(spark, str(ctrl)).collect()[0]
    assert (r["n_cells"], r["df"]) == (QC.EMB_DRIFT_CELLS, QC.EMB_DRIFT_CELLS - 1)
    assert r["crit_micro"] == QC.CHI2_CRIT_MICRO
    assert r["drifted"] == 0 and r["chi2_micro"] <= QC.CHI2_CRIT_MICRO, r

    s = QC.dq5_drift_decision(spark, str(shift)).collect()[0]
    assert s["drifted"] == 1 and s["chi2_micro"] > QC.CHI2_CRIT_MICRO, s

    # independent python replay of the exact integer construction,
    # from the SAME histogram the decision consumed
    hist = {
        row["cell"]: (row["n_old"], row["n_new"])
        for row in QC._drift_cell_hist(spark, str(shift)).collect()
    }
    cells = [
        (hist.get(c, (0, 0))[0] + QC.CHI2_SMOOTH,
         hist.get(c, (0, 0))[1] + QC.CHI2_SMOOTH)
        for c in range(QC.EMB_DRIFT_CELLS)
    ]
    t_o = sum(so for so, _ in cells)
    t_n = sum(sn for _, sn in cells)
    import math

    micro = sum(
        math.floor(
            (float(sn * t_o - so * t_n) * float(sn * t_o - so * t_n))
            / ((float(t_o) * float(t_n)) * float(so))
            * 1000000
            + 0.5
        )
        for so, sn in cells
    )
    assert micro == s["chi2_micro"]


def test_dq5_overflow_guard_fails_loudly(spark):
    """ADVICE r12: past the exact-int64 bound Spark would WRAP the
    cross-product silently while DuckDB raises — the guard makes Spark
    raise too (same failure MODE on both engines). A snapshot total
    over CHI2_MAX_TOTAL must error, never return a wrapped verdict."""
    import pytest

    from a3_fp_bigdata_spark.operators import quality_checks as QC

    ok = spark.createDataFrame(
        [(0, 10, 20), (1, 30, 5)], "cell long, n_old long, n_new long"
    )
    row = QC.chi2_drift_decision(spark, ok).collect()[0]
    assert row["n_cells"] == QC.EMB_DRIFT_CELLS

    huge = spark.createDataFrame(
        [(0, QC.CHI2_MAX_TOTAL + 1, 20)],
        "cell long, n_old long, n_new long",
    )
    with pytest.raises(Exception, match="exact-\\s*int64 bound|ASSERT"):
        QC.chi2_drift_decision(spark, huge).collect()
