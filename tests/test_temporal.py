"""As-of and range join semantics (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.operators import temporal as TP
from tests.conftest import SF0001


def test_asof_left_rows_without_match_keep_nulls(spark):
    """The generic operator is LEFT as-of: rows with no prior right row
    survive with null payload (the registered query filters them only
    for oracle type-stability)."""
    ev = table(spark, SF0001, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = TP.asof_join(
        purchases, clicks, key="user_id", ts="ts",
        value_cols=["value", "event_id"], tie_break="event_id",
    )
    assert out.count() == purchases.count()  # left semantics: no row lost


def test_asof_match_is_latest_at_or_before(spark):
    ev = table(spark, SF0001, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = TP.asof_join(
        purchases, clicks, key="user_id", ts="ts",
        value_cols=["value", "event_id"], tie_break="event_id",
    ).filter(F.col("asof_event_id").isNotNull())
    sample = out.limit(20).collect()
    click_rows = {
        (r.user_id, r.event_id): r.ts for r in clicks.collect()
    }
    purch_ts = {r.event_id: r.ts for r in purchases.collect()}
    for r in sample:
        matched_ts = click_rows[(r.user_id, r.asof_event_id)]
        assert matched_ts <= purch_ts[r.event_id]


def test_range_join_equals_naive_theta_join(spark):
    """Bucketized range join == the naive inequality join it optimizes."""
    ev = table(spark, SF0001, "events")
    a = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    naive = (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") > F.col("a_ts"))
            & (
                F.col("b_ts")
                <= F.col("a_ts") + F.expr(f"INTERVAL {TP.RANGE_MINUTES} MINUTES")
            ),
            "left_outer",
        )
        .groupBy(F.col("a_id").alias("event_id"))
        .agg(F.count("b_id").alias("n_following"))
    )
    from a3_fp_bigdata_spark import registry

    bucketized = registry.all_queries()["j9_range_join"](spark, SF0001)
    assert sorted(map(tuple, bucketized.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_gapfill_grid_is_dense_and_locf_carries(spark):
    """w8: every user's grid is a dense hourly walk from their first
    to their last event hour; gap slots carry the latest prior rounded
    mean and never a null (the first slot is always observed)."""
    from datetime import timedelta

    from a3_fp_bigdata_spark import registry

    rows = registry.all_queries()["w8_gapfill_locf"](
        spark, SF0001
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.hour)
        for prev, cur in zip(rs, rs[1:]):
            assert cur.hour - prev.hour == timedelta(hours=1), user
        assert rs[0].n_events > 0  # grid starts at an observed hour
        assert all(r.value_locf is not None for r in rs)
        # LOCF: a gap slot's value equals the previous slot's value
        for prev, cur in zip(rs, rs[1:]):
            if cur.n_events == 0:
                assert cur.value_locf == prev.value_locf, (user, cur.hour)


def test_linear_interp_is_between_neighbors_and_matches_observed(spark):
    """w9: observed slots keep their own (rounded) mean; interpolated
    slots lie within [min, max] of the neighboring observed values
    (linearity implies betweenness); trailing gaps flatten to LOCF."""
    from a3_fp_bigdata_spark import registry

    w8 = {
        (r.user_id, r.hour): r
        for r in registry.all_queries()["w8_gapfill_locf"](
            spark, SF0001
        ).collect()
    }
    rows = registry.all_queries()["w9_linear_interp"](
        spark, SF0001
    ).collect()
    assert len(rows) == len(w8)
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.hour)
        observed = [
            (i, r) for i, r in enumerate(rs) if w8[(user, r.hour)].n_events
        ]
        for i, r in enumerate(rs):
            if w8[(user, r.hour)].n_events:
                continue
            before = [o for o in observed if o[0] < i]
            after = [o for o in observed if o[0] > i]
            assert before
            lo_r = before[-1][1]
            if not after:  # trailing gap: LOCF
                assert abs(r.value_interp - lo_r.value_interp) < 1e-9
                continue
            hi_r = after[0][1]
            lo = min(lo_r.value_interp, hi_r.value_interp)
            hi = max(lo_r.value_interp, hi_r.value_interp)
            assert lo - 1e-4 <= r.value_interp <= hi + 1e-4, (user, r.hour)


# --- w10: finite-horizon EWMA (stateless lag-chain) -------------------------


def test_ewma_replay_matches_plain_python(spark):
    """Independent replay: recompute the truncated EWMA in plain Python
    (same dyadic weights, same left-fold order) for two users and
    require EXACT equality — the bit-exactness claim in the docstring,
    pinned without DuckDB."""
    out = TP.w10_ewma_smooth(spark, SF0001)
    users = [r[0] for r in out.select("user_id").distinct().limit(2).collect()]
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in out.filter(F.col("user_id").isin(users)).collect()
    }
    ev = (
        table(spark, SF0001, "events")
        .filter(F.col("user_id").isin(users))
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    import collections

    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    import math

    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        hist: list[float] = []
        for r in rows:
            hist.append(r["value"])
            num = den = 0.0
            for j in range(TP.EWMA_LAGS):
                if j < len(hist):
                    num = num + hist[-1 - j] * (0.5 ** j)
                    den = den + 0.5 ** j
            expected = math.floor((num / den) * 1e4 + 0.5) / 1e4
            assert got[(uid, r["event_id"])] == expected


def test_ewma_partition_head_equals_value(spark):
    """The first observation per user renormalizes to itself (no decay
    toward a phantom zero history)."""
    out = TP.w10_ewma_smooth(spark, SF0001)
    ev = table(spark, SF0001, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "value")
    )
    joined = out.join(first, ["user_id", "event_id"]).select(
        "ewma", F.floor(F.col("value") * 1e4 + F.lit(0.5)) / 1e4
    )
    assert all(a == b for a, b in joined.collect())


# --- w11: rolling z-score anomaly flags --------------------------------------


def test_rolling_zscore_replay_matches_plain_python(spark):
    """Independent replay for two users: trailing-window integer
    moments and the z expression recomputed in plain Python must match
    EXACTLY (the integer-moment bit-exactness claim), including the
    history-exclusion (current row not in its own baseline) and the
    min-history withholding."""
    import math

    out = TP.w11_rolling_zscore(spark, SF0001)
    users = [r[0] for r in out.select("user_id").distinct().limit(2).collect()]
    got = {
        (r["user_id"], r["event_id"]): (r["n_hist"], r["z"], r["is_anomaly"])
        for r in out.filter(F.col("user_id").isin(users)).collect()
    }
    ev = (
        table(spark, SF0001, "events")
        .filter(F.col("user_id").isin(users))
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    import collections

    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    n_checked = 0
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        cents = [math.floor(r["value"] * 100 + 0.5) for r in rows]
        for i, r in enumerate(rows):
            hist = cents[max(0, i - TP.ZSCORE_HISTORY): i]
            key = (uid, r["event_id"])
            if len(hist) < TP.ZSCORE_MIN_HIST:
                assert key not in got
                continue
            n, s1, s2 = len(hist), sum(hist), sum(c * c for c in hist)
            var_num = n * s2 - s1 * s1
            if var_num > 0:
                zraw = (cents[i] * n - s1) / math.sqrt(
                    var_num * n / (n - 1)
                )
                z = math.floor(zraw * 1e4 + 0.5) / 1e4
                flag = int(
                    zraw > TP.ZSCORE_FLAG_AT or zraw < -TP.ZSCORE_FLAG_AT
                )
            else:
                z, flag = None, 0
            assert got[key] == (n, z, flag), (key, got[key], (n, z, flag))
            n_checked += 1
    assert n_checked > 10  # non-vacuous


# --- j12: bucketized interval-overlap join -----------------------------------


def test_j12_matches_quadratic_python_replay(spark):
    """The bucketized equi-join must find EXACTLY the quadratic truth
    (bucketization is an optimization, never a semantics change), and
    touching intervals (e1 == s2) must NOT pair — overlap is strict."""
    import duckdb

    from tests.conftest import SF0001
    from a3_fp_bigdata_spark.operators import temporal as TP

    got = {
        (r["a_id"], r["b_id"]): r["overlap_s"]
        for r in TP.j12_interval_overlap_join(spark, SF0001).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
               CAST(floor(value) AS BIGINT) % {TP.OVL_DUR_MOD}
                 + {TP.OVL_DUR_MIN} AS dur
        FROM read_parquet('{SF0001}/events.parquet')
        WHERE event_type = 'error'
        """
    ).fetchall()
    ivs = [(eid, s, s + dur) for eid, s, dur in rows]
    want = {}
    for i, (ia, sa, ea) in enumerate(ivs):
        for ib, sb, eb in ivs[i + 1 :]:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            if sa < eb and sb < ea:
                want[(lo, hi)] = min(ea, eb) - max(sa, sb)
    assert got == want
    assert got  # non-vacuous at sf0.001
    # every overlap is strictly positive and bounded by the max duration
    assert all(
        0 < v < TP.OVL_DUR_MOD + TP.OVL_DUR_MIN for v in got.values()
    )


def test_j12_touching_intervals_do_not_pair(spark, tmp_path):
    """Crafted corpus: [t, t+60) and [t+60, t+120) share a boundary
    instant but zero seconds — strict overlap excludes them; [t, t+61)
    and [t+60, ...) overlap exactly 1 s."""
    import datetime

    from a3_fp_bigdata_spark.operators import temporal as TP

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, off_s, dur_s):
        # dur = floor(value) % MOD + MIN  -> value = dur - MIN (< MOD)
        return (
            eid,
            t0 + datetime.timedelta(seconds=off_s),
            1,
            "error",
            float(dur_s - TP.OVL_DUR_MIN),
            "{}",
        )

    rows = [
        ev(1, 0, 60),     # [0, 60)
        ev(2, 60, 60),    # [60, 120): touches 1, no overlap
        ev(3, 59, 61),    # [59, 120): overlaps 1 by 1s, 2 by 60s
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        (r["a_id"], r["b_id"]): r["overlap_s"]
        for r in TP.j12_interval_overlap_join(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {(1, 3): 1, (2, 3): 60}
