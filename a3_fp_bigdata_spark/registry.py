"""Query/oracle registry — the contract surface behind ``__spark_entry__``.

Operator modules register named queries with::

    @query("t1_topk_multikey", oracle="SELECT ... ")
    def _(spark, sf_dir):
        return ...

- The Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame.
- ``oracle`` is ANSI SQL DuckDB runs over the same parquet tables; omit it
  (``oracle=None``) for non-SQL-expressible ops — the driver then records a
  weaker rows-only check.
- Column names/aliases MUST match between the two sides (the driver's
  compare sorts columns by name before hashing values).

Determinism rules every registered query follows (so an order-insensitive
value-hash compare is stable):
- any LIMIT is preceded by a total order (unique tie-break key on both sides);
- floating aggregates are rounded to a fixed scale on both sides;
- timestamps compare under a UTC session (session.py pins it).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Frames persisted by query bodies (multi-referenced subtrees). Sweep
#: tools (bench.py, tools/check_parity.py, tests) call release_pinned()
#: after materializing each query so a 97-query session doesn't
#: accumulate cached RDDs. A driver that never calls it only risks disk
#: spill, not OOM: pin() uses MEMORY_AND_DISK.
_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist(MEMORY_AND_DISK) + track for later release_pinned()."""
    _PINNED.append(df.persist(StorageLevel.MEMORY_AND_DISK))
    return df


def release_pinned() -> None:
    """Unpersist every pin()ed frame (safe to call anytime; lazy frames
    simply drop their storage flag)."""
    while _PINNED:
        try:
            _PINNED.pop().unpersist()
        except Exception:
            pass


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a named query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from a3_fp_bigdata_spark.operators import (  # noqa: F401
        aggregates,
        dedup,
        filters,
        grouped_map,
        joins,
        scalars,
        semistructured,
        setops,
        temporal,
        upsert,
        similarity,
        text_analysis,
        topk,
        windows,
    )
    from a3_fp_bigdata_spark import serving  # noqa: F401
    from a3_fp_bigdata_spark.ml import pipelines  # noqa: F401
    from a3_fp_bigdata_spark.multimodal import images  # noqa: F401
    from a3_fp_bigdata_spark.sources import queries as source_queries  # noqa: F401
    from a3_fp_bigdata_spark.streaming import batch_windows, ingest  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {name: rq.fn for name, rq in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all_modules()
    return {
        name: rq.oracle for name, rq in sorted(_REGISTRY.items()) if rq.oracle
    }


def get(name: str) -> RegisteredQuery:
    _load_all_modules()
    return _REGISTRY[name]
