"""Temporal joins Spark lacks as built-ins: as-of and range (north-star
"custom operators" — composition of existing DataFrame ops, no UDF).

- As-of join: for each left row, the latest right row at-or-before its
  timestamp per key. Databases ship this natively (DuckDB ASOF JOIN,
  kdb aj); Spark expresses it as a TAGGED UNION + window last():
  one shuffle on the key, no range explosion — linear, scales to any
  corpus because state per key is one running value.
- Range join: pair rows whose timestamps fall within a bound. A naive
  theta-join is quadratic per key; the scalable form is BUCKETIZATION:
  equi-join on coarse time buckets (each left row probes its own and
  the next bucket), then filter exactly. Work ∝ true matches + bucket
  fan-out, never |L|x|R|.

Both oracles are written with explicitly deterministic tie-breaks
((ts, event_id) total order) so value-hash comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql
from a3_fp_bigdata_spark.registry import query

RANGE_MINUTES = 10
_BUCKET_SECS = RANGE_MINUTES * 60


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    tie_break: str,
) -> DataFrame:
    """Latest right row at-or-before each left row's ``ts``, per ``key``.

    Tagged union: right rows carry their payload, left rows carry null;
    a window ordered by (ts, is_left, tie_break) takes last(payload,
    ignoreNulls) so each left row sees exactly the right rows at-or-
    before it (right sorts before left on equal ts). One hash-partition
    shuffle on the key — the linear-state form of the operator.
    """
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (key, ts, tie_break) else F.lit(None).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_is_left", tie_break)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = tagged_l.unionByName(tagged_r)
    filled = unioned.select(
        *lcols,
        "_is_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left")


@query(
    "j8_asof_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'click'
    ), pairs AS (
      SELECT p.event_id, p.user_id,
             c.value AS asof_value, c.event_id AS asof_event_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT event_id, user_id, asof_value, asof_event_id
    FROM pairs WHERE rn = 1
    """,
)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click
    at-or-before it. Inner form for the oracle (purchases with no prior
    click dropped — a nullable BIGINT widens to float64 through pandas
    fetch paths, poisoning value-hash compares; pytest covers the
    left-null behavior). The oracle is the quadratic inequality-join
    form with an explicit (ts DESC, event_id DESC) tie-break; our
    union+window form orders by (ts, is_left, event_id) ascending,
    which selects the same row."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        value_cols=["value", "event_id"],
        tie_break="event_id",
    )
    return out.filter(F.col("asof_event_id").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("asof_value").alias("asof_value"),
        F.col("asof_event_id").alias("asof_event_id"),
    )


@query(
    "j9_range_join",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, ts, event_type FROM events
    )
    SELECT a.event_id, count(b.event_id) AS n_following
    FROM e a LEFT JOIN e b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL {RANGE_MINUTES} MINUTE
    WHERE a.event_type = 'error'
    GROUP BY a.event_id
    """,
)
def j9_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, bucketized: for each error event, count the same
    user's events in the following {RANGE_MINUTES} minutes.

    Each left row probes its own time bucket and the next (a window of
    w seconds spans at most 2 buckets of w), so the join is an
    EQUI-join on (user_id, bucket) + exact filter — the shuffle moves
    O(|L| * 2 + |R|) rows, never the quadratic per-key cross product.
    """
    ev = table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / _BUCKET_SECS).cast("long")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        bucket.alias("a_bucket"),
    )
    # probe own + next bucket
    probes = errors.withColumn(
        "probe_bucket", F.explode(F.array(F.col("a_bucket"), F.col("a_bucket") + 1))
    )
    others = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        bucket.alias("b_bucket"),
    )
    joined = probes.join(
        others,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("probe_bucket") == F.col("b_bucket"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (
            F.col("b_ts")
            <= F.col("a_ts") + F.expr(f"INTERVAL {RANGE_MINUTES} MINUTES")
        ),
        "left_outer",
    )
    return joined.groupBy(F.col("a_id").alias("event_id")).agg(
        F.count("b_id").alias("n_following")
    )


#: Gap-fill resolution: HOURLY, as one shared definition (the Spark
#: grid step, the oracle's generate_series step, and the
#: date_trunc('hour') rollup/bounds buckets are a package deal —
#: changing resolution means changing the truncation unit everywhere,
#: not turning one knob, so there is deliberately no free parameter).
#: Over the events table's ~30-day span the grid is ~720 slots/key.
GAPFILL_STEP_HOURS = 1

#: Shared grid derivation (SQL): per-user hourly rollup bounds and the
#: dense grid between them — ONE definition consumed by both w8's and
#: w9's oracles so the two fills can never disagree on their grid.
_SQL_GRID_CTES = f"""bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(h0, h1,
                    INTERVAL {GAPFILL_STEP_HOURS} HOUR)) AS hour
      FROM bounds
    )"""


def _hourly_grid(ev: DataFrame) -> DataFrame:
    """(user_id, hour) dense hourly grid between each user's first and
    last event — the Spark twin of _SQL_GRID_CTES, shared by w8/w9."""
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    return bounds.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("h0"),
                F.col("h1"),
                F.expr(f"interval {GAPFILL_STEP_HOURS} hour"),
            )
        ).alias("hour"),
    )


@query(
    "w8_gapfill_locf",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             count(*) AS n_events, {half_up_sql('avg(value)')} AS v
      FROM events GROUP BY 1, 2
    ), {_SQL_GRID_CTES}
    SELECT g.user_id, g.hour,
           CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
           last_value(h.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf
    FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    """,
)
def w8_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill + last-observation-carried-forward — the
    hypertable resample: per user, materialize a dense hourly grid
    between that user's first and last event (explode(sequence) over
    timestamps), left-join the hourly rollup onto it, and forward-fill
    empty slots from the latest observed hour. The first grid slot is
    never empty (it contains the user's min ts), so LOCF has no
    leading-null case. Dashboards, feature pipelines, and downstream
    joins all want this dense form; the reference has no time-series
    surface at all.

    Scale: rollup and bounds are map-side-combinable aggregates; grid
    fan-out is a narrow Generate (slots = span/step per key, bounded
    and known up front); the fill is one partitioned window over
    (user, hour) — each key's grid sorts independently, no global
    sort, no Python. At 100 TB the same plan shards by key; a key's
    grid always fits an executor because span/step bounds it."""
    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy("user_id", hour.alias("hour")).agg(
        F.count("*").alias("n_events"),
        # shared half-up rounding (functions.rounding): avg() of
        # 2-decimal event values lands on exact decimal halves, where
        # native round() tips differently across engines
        half_up(F.avg("value")).alias("v"),
    )
    grid = _hourly_grid(ev)
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0))
            .cast("long")
            .alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


#: w10's horizon: how many trailing observations the EWMA sees. A
#: finite window (vs the textbook infinite recurrence) is what makes
#: the smoother expressible as a STATELESS lag-chain — no recursion,
#: no applyInPandas — and 2^-9 ~ 0.2% leftover weight is below the
#: output rounding anyway.
EWMA_LAGS = 8


def _ewma_terms() -> list[tuple[int, float]]:
    """(lag, weight) pairs, weight = 2^-lag. Dyadic weights are EXACT
    in binary floating point, and value * 2^-j is a pure exponent
    shift (no mantissa rounding), so both engines' term products are
    bit-identical — the parity argument below rests on this."""
    return [(j, 0.5 ** j) for j in range(EWMA_LAGS)]


def _ewma_sql() -> str:
    """DuckDB rendering of the EWMA ratio — generated from the SAME
    (lag, weight) list as the Spark side so the +-association order
    (left fold, lag 0 first) is identical token-for-token."""
    num = " + ".join(
        f"COALESCE(lag(value, {j}) OVER win * {w!r}, 0.0)"
        for j, w in _ewma_terms()
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER win IS NULL"
        f" THEN 0.0 ELSE {w!r} END"
        for j, w in _ewma_terms()
    )
    return f"({num}) / ({den})"


@query(
    "w10_ewma_smooth",
    oracle=f"""
    SELECT user_id, event_id, ts,
           {half_up_sql(_ewma_sql())} AS ewma
    FROM events
    WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w10_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user — the smoothing
    pass every metrics/feature pipeline runs before thresholding. The
    textbook EWMA is a sequential recurrence (state = previous output),
    which would force applyInPandas; truncating the horizon to
    EWMA_LAGS observations re-expresses it as a stateless lag-chain:
    ewma_t = sum_j value_(t-j) * 2^-j / sum_j 2^-j over the lags that
    exist (partition heads renormalize over the shorter history
    instead of decaying toward zero).

    Parity is BIT-exact, not just rounded-close: the weights are
    dyadic (2^-j, exact doubles), each product is an exponent shift
    (no rounding), and both engines evaluate the sum in the same
    left-fold order because Spark's expression tree and the oracle's
    SQL are generated from the one _ewma_terms() list. The final
    divide sees identical numerators/denominators, so half_up can
    never tip differently.

    Scale: ONE partitioned window, O(EWMA_LAGS) per row, running-frame
    lags only (no UnboundedFollowing rescans, no Python, no global
    sort). At 100 TB this is a single hash-shuffle on user_id followed
    by codegen'd per-key sorted scans."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # materialize each lag ONCE as a named column, then fold — num and
    # den both reference every lag, and building them from F.lag(...)
    # expressions directly doubles the Window node's expression list
    # (14 _weN slots instead of 7 in the executed plan)
    lagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        *[
            (F.lag("value", j).over(w) if j else F.col("value")).alias(
                f"v{j}"
            )
            for j, _ in _ewma_terms()
        ],
    )
    num: Column | None = None
    den: Column | None = None
    for j, wt in _ewma_terms():
        v = F.col(f"v{j}")
        term = F.coalesce(v * F.lit(wt), F.lit(0.0))
        mask = F.when(v.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = term if num is None else num + term
        den = mask if den is None else den + mask
    return lagged.select(
        "user_id", "event_id", "ts", half_up(num / den).alias("ewma")
    )


#: w9's interpolant, rendered through the shared rounding definition.
_W9_INTERP = """CASE
             WHEN v IS NOT NULL THEN v
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv)
                  * (epoch(hour) - epoch(ph)) / (epoch(nh) - epoch(ph))
           END"""


@query(
    "w9_linear_interp",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             avg(value) AS v
      FROM events GROUP BY 1, 2
    ), {_SQL_GRID_CTES}, joined AS (
      SELECT g.user_id, g.hour, h.v,
             last_value(h.v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN h.v IS NOT NULL THEN g.hour END
                        IGNORE NULLS) OVER w_prev AS ph,
             first_value(h.v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN h.v IS NOT NULL THEN g.hour END
                         IGNORE NULLS) OVER w_next AS nh
      FROM grid g LEFT JOIN hourly h USING (user_id, hour)
      WINDOW
        w_prev AS (PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY g.user_id ORDER BY g.hour
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, hour,
           {half_up_sql(_W9_INTERP)} AS value_interp
    FROM joined
    """,
)
def w9_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with LINEAR interpolation: empty grid slots take the
    value on the straight line between the nearest observed hours
    before and after (time-weighted, epoch-seconds arithmetic via
    tscompat — NTZ timestamps never cast to long directly). Trailing
    gaps (no next observation) fall back to LOCF; leading gaps cannot
    occur (the grid starts at an observed hour). The interpolation
    runs on the RAW hourly means and the final output rounds through
    an explicit floor(x*1e4 + 0.5)/1e4 shared by both engines — see
    the in-body comment on why native round() cannot be trusted here
    (the 2-decimal source values make exact decimal-halfway
    interpolants common, and the engines' native rounding rules tip
    halves differently).

    Scale: same shape as w8 plus the forward-looking window pair —
    every frame is an O(n) running accumulator over a per-key grid
    (two directional sorts inside one exchange, see the in-body
    comment on why the naive UnboundedFollowing frame is quadratic);
    no global sort, no Python."""
    from a3_fp_bigdata_spark.tscompat import epoch_seconds

    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy("user_id", hour.alias("hour")).agg(
        F.avg("value").alias("v")
    )
    grid = _hourly_grid(ev)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # "nearest observed at-or-after" is computed as a RUNNING last()
    # over the DESC ordering, not first() over (current -> unbounded
    # following): Spark's UnboundedFollowing frame re-scans the frame
    # per row — O(n^2) per key (measured 15+ s on the 1500x720 grid at
    # sf0.1) — while both unbounded-PRECEDING frames are O(n) running
    # accumulators. Costs one extra directional sort, stays linear.
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("hour"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    joined = grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(w_prev).alias("ph"),
        F.last("v", ignorenulls=True).over(w_next).alias("nv"),
        F.last(obs_hour, ignorenulls=True).over(w_next).alias("nh"),
    )
    # association mirrors the oracle exactly — ((nv-pv) * dt) / span,
    # multiply BEFORE divide — so both engines produce the same f64
    # bit pattern and round(4) can never tip differently
    num = epoch_seconds(F.col("hour")) - epoch_seconds(F.col("ph"))
    den = epoch_seconds(F.col("nh")) - epoch_seconds(F.col("ph"))
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv") + (F.col("nv") - F.col("pv")) * num / den
        )
    )
    # shared half-up rounding (functions.rounding — factored from this
    # very query's round-5 fix): the interpolants of terminating-
    # decimal inputs land on exact decimal halves constantly, and
    # Spark (BigDecimal HALF_UP on the shortest decimal repr) vs
    # DuckDB (float multiply-shift) tip such halves differently; an
    # identical arithmetic expression on identical doubles cannot
    # disagree
    return joined.select(
        "user_id",
        "hour",
        half_up(interp).alias("value_interp"),
    )


#: w11 — trailing-history window for the rolling z-score (8 events,
#: EXCLUDING the current row: an anomaly must not dilute the baseline
#: it is judged against) and the minimum history for a meaningful
#: sample stddev.
ZSCORE_HISTORY = 8
ZSCORE_MIN_HIST = 4
ZSCORE_FLAG_AT = 3  # |z| > 3 flags


@query(
    "w11_rolling_zscore",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ), agg AS (
      SELECT user_id, event_id, cents,
             count(*) OVER win AS n_hist,
             CAST(COALESCE(sum(cents) OVER win, 0) AS BIGINT) AS s1,
             CAST(COALESCE(sum(cents * cents) OVER win, 0) AS BIGINT)
               AS s2
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {ZSCORE_HISTORY} PRECEDING
                              AND 1 PRECEDING)
    ), z AS (
      SELECT user_id, event_id, CAST(n_hist AS BIGINT) AS n_hist,
             CASE WHEN n_hist * s2 - s1 * s1 > 0 THEN
               CAST(cents * n_hist - s1 AS DOUBLE)
               / sqrt(CAST(n_hist * s2 - s1 * s1 AS DOUBLE)
                      * n_hist / (n_hist - 1))
             END AS zraw
      FROM agg WHERE n_hist >= {ZSCORE_MIN_HIST}
    )
    SELECT user_id, event_id, n_hist,
           {half_up_sql('zraw')} AS z,
           CAST(CASE WHEN zraw > {ZSCORE_FLAG_AT}
                       OR zraw < -{ZSCORE_FLAG_AT}
                     THEN 1 ELSE 0 END AS INT) AS is_anomaly
    FROM z
    """,
)
def w11_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags — the metric-monitoring rung: each
    event judged against ITS OWN user's trailing {ZSCORE_HISTORY}
    observations (window excludes the current row so a spike can't
    dilute its own baseline; rows with under {ZSCORE_MIN_HIST} history
    are withheld rather than scored against noise).

    Bit-exact parity via the integer-moment trick: values quantize to
    int64 CENTS (floor(v*100+0.5) — the same arithmetic on the same
    doubles in both engines), the window carries only INTEGER sums
    (count, sum, sum of squares — association-free), and the z-score
    is assembled from those integers in one identical float expression
    per engine: z = (x*n - s1) / sqrt((n*s2 - s1^2) * n / (n-1)).
    Constant histories (variance 0) yield null z, not a divide crash.

    Scale: ONE partitioned window with three running integer
    accumulators over a bounded frame — no second pass, no Python, no
    global sort; the same plan shape as w10's smoother, and at 100 TB
    a single hash-shuffle on user_id."""
    ev = table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_HISTORY, -1)
    )
    agg = ev.select(
        "user_id",
        "event_id",
        cents.alias("cents"),
        F.count("*").over(w).alias("n_hist"),
        F.coalesce(F.sum(cents).over(w), F.lit(0))
        .cast("long")
        .alias("s1"),
        F.coalesce(F.sum(cents * cents).over(w), F.lit(0))
        .cast("long")
        .alias("s2"),
    ).filter(F.col("n_hist") >= ZSCORE_MIN_HIST)
    var_num = F.col("n_hist") * F.col("s2") - F.col("s1") * F.col("s1")
    zraw = F.when(
        var_num > 0,
        (F.col("cents") * F.col("n_hist") - F.col("s1")).cast("double")
        / F.sqrt(
            var_num.cast("double")
            * F.col("n_hist")
            / (F.col("n_hist") - 1)
        ),
    )
    return agg.select(
        "user_id",
        "event_id",
        F.col("n_hist").cast("long").alias("n_hist"),
        half_up(zraw).alias("z"),
        F.when(
            (zraw > ZSCORE_FLAG_AT) | (zraw < -ZSCORE_FLAG_AT),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# j12: interval-overlap self-join (bucketized — the op Spark lacks)
# ---------------------------------------------------------------------------

#: Interval duration derived from the event's value column in exact
#: integer seconds: floor(value) % OVL_DUR_MOD + OVL_DUR_MIN — bounded
#: by construction so every interval spans at most 2 grid buckets.
OVL_DUR_MOD = 600
OVL_DUR_MIN = 60
#: Grid coarseness. MUST stay >= OVL_DUR_MOD + OVL_DUR_MIN so an
#: interval touches at most ceil(dur/G)+1 = 2 buckets.
OVL_GRID_SECS = 900


@query(
    "j12_interval_overlap_join",
    oracle=f"""
    WITH e AS (
      SELECT event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(floor(value) AS BIGINT) % {OVL_DUR_MOD}
               + {OVL_DUR_MIN} AS e
      FROM events WHERE event_type = 'error'
    )
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT)
             AS overlap_s
    FROM e a JOIN e b
      ON a.event_id < b.event_id
     AND a.s < b.e AND b.s < a.e
    """,
)
def j12_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: every pair of 'error' events whose
    derived incident windows [ts, ts + dur) intersect, with the
    overlap length in whole seconds — the correlated-incident shape
    (and the op Spark's join syntax cannot express without a cross
    product: both sides' predicates are inequalities).

    Bucketized like j9: durations are bounded (< {OVL_DUR_MOD} +
    {OVL_DUR_MIN} s) so each interval lands in at most 2 buckets of
    the {OVL_GRID_SECS}-second grid; the join is an EQUI-join on
    bucket + exact inequality filter, so shuffled rows are
    O(2|intervals|) and per-bucket work is occupancy^2 over a grid
    cell, never corpus^2. The oracle re-derives the pair set with the
    honest quadratic self-join. distinct() collapses pairs that
    co-occur in both their buckets. All arithmetic is integer epoch
    seconds (tscompat.epoch_seconds = DuckDB floor(epoch(ts)))."""
    from a3_fp_bigdata_spark.tscompat import epoch_seconds

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    s = epoch_seconds(F.col("ts"))
    dur = (
        F.floor(F.col("value")).cast("long") % OVL_DUR_MOD + OVL_DUR_MIN
    )
    iv = ev.select(
        "event_id",
        s.alias("s"),
        (s + dur).alias("e"),
    )
    with_buckets = iv.select(
        "event_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {OVL_GRID_SECS}"),
                F.expr(f"e DIV {OVL_GRID_SECS}"),
            )
        ).alias("bucket"),
    )
    a = with_buckets.alias("a")
    b = with_buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .select(
            F.col("a.event_id").alias("a_id"),
            F.col("b.event_id").alias("b_id"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).cast("long").alias("overlap_s"),
        )
        .distinct()
    )
