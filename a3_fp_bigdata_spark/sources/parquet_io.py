"""Parquet scan/sink + versioned-path discovery (S2-S5, S12).

Reference behavior re-expressed:
- S2/S3: ``spark.read.parquet(...)`` (+ ``.cache()`` for the serving
  table, reference app.py:114).
- S4: ``find_latest_data_path`` — pick the most recent timestamped
  ``api_app_info_*`` output dir (app.py:98-108). Kept as a tiny driver
  util; on a real lake this is a catalog/Delta-version lookup, so the
  scan stays O(#versions), never O(data).
- S5: overwrite-mode parquet sink (spark_script.py:153), snappy default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S2: plain parquet scan — vectorized reader, pushdown-capable."""
    return spark.read.parquet(path)


def read_serving_table(spark: SparkSession, path: str) -> DataFrame:
    """S3: serving-table load pinned in memory (app.py:114). The eager
    count materializes the cache so first-query latency is paid once at
    startup, exactly like the reference's warm-up."""
    df = spark.read.parquet(path).cache()
    df.count()
    return df


def find_latest_data_path(base_dir: str, prefix: str) -> str | None:
    """S4: newest ``{prefix}*`` subdirectory (app.py:98-108).
    Driver-side listing of version dirs only — never lists data files.

    For ``version=`` prefixes with all-numeric suffixes (the versioned
    snapshot chain, src9), newest is max by int(suffix) — mtime ties on
    coarse-granularity filesystems or clock skew between writes must
    not select a stale version (ADVICE r11). Every OTHER prefix keeps
    the reference's pure-mtime rule (app.py:103), including all-digit
    timestamped dump names: there a regenerated/backfilled
    lower-numbered directory is the newest WRITE and must win
    (rewrite-wins semantics — ADVICE r12 gated the numeric rule to
    ``version=`` for exactly this reason; version numbers are
    identity, timestamps in free-form names are just names)."""
    try:
        candidates = [
            os.path.join(base_dir, d)
            for d in os.listdir(base_dir)
            if d.startswith(prefix)
            and os.path.isdir(os.path.join(base_dir, d))
        ]
    except FileNotFoundError:
        return None
    if not candidates:
        return None
    suffixes = [os.path.basename(p)[len(prefix):] for p in candidates]
    if prefix.endswith("version=") and all(s.isdigit() for s in suffixes):
        return max(candidates, key=lambda p: int(os.path.basename(p)[len(prefix):]))
    return max(candidates, key=os.path.getmtime)


def write_parquet_overwrite(
    df: DataFrame, path: str, *, partition_by: tuple[str, ...] = ()
) -> None:
    """S5: overwrite parquet sink. ``partition_by`` is the scale lever the
    reference lacked: partitioned layout gives downstream readers
    partition pruning (a date/category predicate skips whole directories
    at 100 TB)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    bucket_col: str,
    n_buckets: int,
    *,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table (saveAsTable — bucketing metadata lives in
    the catalog). Two tables bucketed identically on their join key
    co-locate: the join planner skips BOTH exchanges, which at 100 TB
    turns the recurring fact-fact join into a map-side zip. Worth one
    up-front shuffled write whenever a join key is hit repeatedly."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(name)


def zorder_key(cols: list[str], bits: int = 16):
    """Z-order (Morton) key over integer columns as pure Column bit
    algebra — interleave the low ``bits`` bits of each column so rows
    close in EVERY dimension land close on the 1-D sort key. All
    JVM-side (shift/and/or fold, whole-stage codegen); no UDF.

    Callers must pre-quantize values into [0, 2^bits): at the shipped
    scale factors the join keys already fit 16 bits; a 100 TB deploy
    maps each column through a rank/range quantizer first (the layout
    is a clustering hint — quantization never affects query RESULTS,
    only pruning quality)."""
    from pyspark.sql import functions as F

    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(
                F.lit(1)
            )
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    *,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Multi-dimensional clustering sink (Delta's OPTIMIZE ZORDER shape,
    declaratively): range-partition + sort by the Morton key, so
    parquet footer min/max stats become selective in EVERY z-ed
    dimension at once. A 1-D ``sortBy(col)`` layout prunes box queries
    on that column only; the z-layout prunes boxes on any combination
    — at 100 TB that is the difference between scanning ~sqrt of the
    files and scanning all of them whenever the filter misses the sort
    column.

    Each dimension is first quantized to ``bits`` bits across its own
    min/max (one tiny agg job): interleaving RAW values hands the
    wider-ranged column's high bits the whole sort order and the
    narrow column gets no locality at all (measured: suppkey pruning
    was zero against raw 16-bit interleave). Equal-width quantization
    is what OPTIMIZE ZORDER's range-id pass does too. The helper key
    column is dropped before write (a projection — intra-partition
    order survives, no exchange)."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[
            f
            for c in zcols
            for f in (
                F.min(c).cast("long").alias(f"_min_{c}"),
                F.max(c).cast("long").alias(f"_max_{c}"),
            )
        ]
    ).collect()[0]
    scale = 1 << bits
    qcols = []
    for c in zcols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        span = max(hi - lo + 1, 1)
        qcols.append(
            F.least(
                ((F.col(c).cast("long") - lo) * scale / span).cast("long"),
                F.lit(scale - 1),
            ).alias(f"_q_{c}")
        )
    (
        df.select("*", *qcols)
        .withColumn(
            "_zkey", zorder_key([f"_q_{c}" for c in zcols], bits)
        )
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_q_{c}" for c in zcols])
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction — the lakehouse maintenance operator every
    streaming sink eventually needs (micro-batches leave one-file-per-
    trigger litter; a 100 TB table accumulates millions of tiny files
    and scan planning drowns in footer reads). Rewrites ``path`` into
    ceil(bytes / target_file_bytes) files, optionally sorted so
    parquet min/max row-group stats become selective for later
    predicate pushdown. Returns the new file count.

    Stage-and-swap: the rewrite lands in a sibling dir and swaps in via
    two renames. The swap is NOT atomic — there is a brief window with
    no directory at ``path`` (a concurrent reader would error and
    retry), and a crash inside it strands the table at
    ``path.precompact``; this function RECOVERS that state on entry
    (restores the precompact dir, clears staging litter). The
    transactional form of this op on Delta/Iceberg is OPTIMIZE."""
    import math
    import shutil

    staged = f"{path}.compacting"
    old = f"{path}.precompact"
    # crash recovery from a previous interrupted swap
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
    shutil.rmtree(staged, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    compacted = (
        df.repartitionByRange(n_files, sort_col).sortWithinPartitions(sort_col)
        if sort_col
        else df.coalesce(n_files)
    )
    compacted.write.mode("overwrite").parquet(staged)
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old, ignore_errors=True)
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
