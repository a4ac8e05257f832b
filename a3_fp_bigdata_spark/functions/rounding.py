"""Cross-engine-stable decimal rounding — ONE definition rendered for
both Spark and DuckDB.

Native ``round(x, s)`` is a parity hazard in oracle-checked queries:
Spark rounds the shortest decimal representation HALF_UP through
BigDecimal while DuckDB multiply-shifts the double, so values landing
on exact decimal halves (common when the inputs are terminating
decimals — 2-decimal prices, percentages, interpolants) tip in
different directions and the value-hash compare reds on correct
results. w9_linear_interp hit this in round 5; its fix —
``floor(x * 10^s + 0.5) / 10^s`` spelled identically on both sides —
is factored here so every new rounded-aggregate oracle renders from
one source instead of re-introducing native round().

Semantics: "half toward +infinity" (for non-negative x this is plain
half-up). That differs from Spark's HALF_UP away-from-zero on
NEGATIVE halves (-3.25 -> -3.2 here, -3.3 in Spark round) — which is
exactly the point: the definition is engine-free, the same f64
arithmetic on the same doubles on both sides, so it CANNOT disagree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def half_up(col: Column, scale: int = 4) -> Column:
    """floor(x * 10^scale + 0.5) / 10^scale as a Spark Column.

    scale=0 yields a whole double (use ``.cast(...)`` for an int)."""
    p = 10 ** scale
    if scale == 0:
        return F.floor(col + F.lit(0.5)).cast("double")
    return F.floor(col * p + F.lit(0.5)) / F.lit(float(p))


def half_up_sql(expr: str, scale: int = 4) -> str:
    """The same arithmetic rendered as ANSI SQL — valid on BOTH
    engines, so shared Spark-SQL strings (sql1, a18) and DuckDB
    oracles render from the one definition. The divisor is
    ``CAST(P AS DOUBLE)``, never a ``P.0`` literal: Spark SQL parses
    ``100.0`` as DECIMAL(4,1) and BIGINT/DECIMAL silently widens the
    result to decimal (caught by the dtype-class parity checker);
    DuckDB treats both spellings identically."""
    p = 10 ** scale
    if scale == 0:
        return f"CAST(floor(({expr}) + 0.5) AS DOUBLE)"
    return f"floor(({expr}) * {p} + 0.5) / CAST({p} AS DOUBLE)"
