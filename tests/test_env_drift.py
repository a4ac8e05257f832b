"""Environment-drift smoke tests.

Round 3 shipped broken because the driver testdata's physical timestamp
type drifted (TIMESTAMP(NANOS) -> timestamp[us]) underneath code that
assumed the old type: the batch loader happened to no-op safely, but
windows (cast-to-long crash), streaming (silent 1000x time compression)
and the JSON codec (precision loss) all failed — and nothing caught it
before commit. These tests pin the environment facts the engine depends
on and run one cheap representative of every ts-consuming family, so the
NEXT drift fails here first, loudly, at sf0.001.
"""

from __future__ import annotations

import datetime

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.schemas import TESTDATA
from a3_fp_bigdata_spark.tscompat import epoch_micros, epoch_seconds
from tests.conftest import SF0001

#: The timestamp types the engine's operators are written against.
#: LongType is accepted on disk (legacy nanos) but must be WIDENED by
#: data.table before operators see it, so it is not in this set.
_HANDLED_TS = (T.TimestampType, T.TimestampNTZType)


def test_events_ts_loads_as_handled_type(spark):
    """The loaded events.ts dtype is one the operator surface handles.
    If the driver regenerates testdata with a different physical type,
    this is the first test to fail — by name."""
    dt = table(spark, SF0001, "events").schema["ts"].dataType
    assert isinstance(dt, _HANDLED_TS), (
        f"events.ts loaded as {dt}: the testdata's physical timestamp "
        "type drifted; audit tscompat/windows/streaming before trusting "
        "any ts-consuming query"
    )


def test_declared_schema_matches_parquet_footer(spark):
    """schemas.TESTDATA's ts declarations track the actual footers.
    pyarrow reads the footer directly — independent of Spark's loader."""
    for tbl, col in (("events", "ts"), ("orders", "o_orderdate"),
                     ("lineitem", "l_shipdate")):
        phys = pq.read_schema(f"{SF0001}/{tbl}.parquet").field(col).type
        declared = TESTDATA[tbl][col].dataType
        # physical timestamp[us] without tz <-> declared TIMESTAMP_NTZ
        assert str(phys) == "timestamp[us]", (tbl, col, str(phys))
        assert isinstance(declared, T.TimestampNTZType), (tbl, col, declared)


def test_epoch_helpers_are_exact(spark):
    """tscompat epoch math is micro-exact and second-truncating on the
    loaded type, whatever it is (the contract windows.py builds on)."""
    row = (
        table(spark, SF0001, "events")
        .select(
            "ts",
            epoch_micros("ts").alias("us"),
            epoch_seconds("ts").alias("s"),
        )
        .first()
    )
    want_us = int(
        row.ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    ) if row.ts.tzinfo is None else int(row.ts.timestamp() * 1_000_000)
    # float round-trip of .timestamp() can be off by <1us; compare coarsely
    assert abs(row.us - want_us) <= 1
    assert row.s == row.us // 1_000_000


def test_ts_family_representatives_run(spark):
    """One cheap member of each ts-consuming family executes and returns
    sane results at sf0.001: window function (w5 family), streaming
    (st5 family), JSON codec (src2 family). Catches a drift that crashes
    or silently corrupts any family even if its full oracle tests are
    skipped or curated out."""
    from a3_fp_bigdata_spark.operators.windows import w5_sessionize
    from a3_fp_bigdata_spark.sources import kafka_io
    from a3_fp_bigdata_spark.streaming import ingest

    # window family: must run and produce plausible session counts
    sessions = w5_sessionize(spark, SF0001)
    n_sessions = sessions.count()
    n_events = table(spark, SF0001, "events").count()
    assert 0 < n_sessions <= n_events

    # streaming family: event time must NOT be unit-compressed — the
    # stream's hourly window count must equal the batch count (round 3's
    # div-1000 bug collapsed thousands of windows into ten)
    streamed = ingest.run_available_now(
        ingest.windowed_counts(ingest.stream_events(spark, SF0001))
    )
    batch = (
        table(spark, SF0001, "events")
        .groupBy(F.date_trunc("hour", "ts"), "event_type")
        .count()
    )
    assert streamed.count() == batch.count()

    # codec family: timestamps survive to_json/from_json micro-exactly
    ev = table(spark, SF0001, "events").limit(50)
    back = kafka_io.parse_payload(
        kafka_io.to_payload(ev), ev.schema
    )
    assert sorted(r.ts for r in back.select("ts").collect()) == sorted(
        r.ts for r in ev.select("ts").collect()
    )
