"""Timestamp-type-agnostic epoch math.

The driver testdata's timestamp columns load as TIMESTAMP_NTZ under
PySpark 4.x (physical ``timestamp[us]``, isAdjustedToUTC=false); legacy
generations widened to TimestampType (LTZ). Operators must not care
which: these helpers accept either (and anything castable to timestamp)
and return exact integer epoch values.

Casting NTZ -> TIMESTAMP interprets the naive value in the session
timezone; the engine pins the session to UTC (data.table /
session.build_session), so the cast is the identity on the stored
micros. DuckDB's ``epoch(ts)`` on the same naive micros agrees, which is
what makes these usable inside oracle-checked queries.

A TIMESTAMP_NTZ column can NOT be cast straight to BIGINT in Spark 4
(DATATYPE_MISMATCH) — that cast is what broke w5/w7 in round 3; always
go through these helpers instead of ``col.cast("long")``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column | str) -> Column:
    """Exact microseconds since the epoch as BIGINT, for TimestampType,
    TIMESTAMP_NTZ (UTC session) or castable inputs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_seconds(col: Column | str) -> Column:
    """Whole seconds since the epoch as BIGINT (fraction truncated —
    equals ``floor(epoch(ts))`` for post-1970 data, matching DuckDB's
    ``CAST(floor(epoch(ts)) AS BIGINT)``). Computed in integer space
    (subtract the micro remainder, then divide the exact multiple) so no
    double-rounding can move a value across a second boundary."""
    us = epoch_micros(col)
    return ((us - F.pmod(us, F.lit(1_000_000))) / F.lit(1_000_000)).cast(
        "long"
    )
