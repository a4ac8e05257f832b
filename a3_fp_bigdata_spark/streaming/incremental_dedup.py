"""Streaming corpus ingestion with incremental exact-dedup state (st10).

d10's nightly new-batch-vs-corpus shape, run continuously: each
micro-batch of documents is fingerprinted, combined with the corpus
fingerprint table so far (min keeper id, summed copy count), and merged
back via the bucketed materialized-view writer — so after the stream
drains, the fingerprint table equals what d1_exact_dedup computes over
the whole corpus in one batch. That equality is this operator's oracle:
a REAL streaming run checked against plain ANSI SQL.

Scale: the fingerprint table is the merge-key-bucketed layout
materialized.merge_batch_into maintains — a micro-batch rewrites only
the bucket partitions its fingerprints land in, and the combine step's
base read prunes to those same buckets' keys (here via a semi-join on
the batch's fingerprints; at 100 TB the bucket partition filter does
it). Per-batch cost tracks batch size, never corpus size. The
reference has no streaming dedup at all (its consumer appends blindly,
consumer.py:87-114); this is the engine extension a training-data
pipeline actually runs.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query
from a3_fp_bigdata_spark.schemas import TESTDATA
from a3_fp_bigdata_spark.streaming.ingest import streaming_shuffle
from a3_fp_bigdata_spark.streaming.materialized import (
    _has_parquet_data,
    merge_batch_into,
)

#: micro-batch granularity for the staged stream (files per trigger = 1)
STAGE_FILES = 4

#: scratch dirs created by st10 runs, removed at interpreter exit so
#: repeated sweeps/bench rounds don't leak a corpus copy per invocation
_SCRATCH_DIRS: list[str] = []


def _scratch_dir(prefix: str) -> str:
    path = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(path)
    return path


def _cleanup_scratch() -> None:
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup_scratch)


def fingerprint_frame(docs: DataFrame) -> DataFrame:
    """(fp, keeper_id, n_copies) — d1's aggregate, reusable per batch."""
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies")
    ).select(
        F.md5(F.col("text").cast("binary")).alias("fp"),
        "keeper_id",
        "n_copies",
    )


_WATERMARK_FILE = "_last_batch"  # underscore-prefixed: ignored by readers


def _read_watermark(out_dir: str) -> int:
    path = os.path.join(out_dir, _WATERMARK_FILE)
    if os.path.isfile(path):
        with open(path) as fh:
            return int(fh.read().strip())
    return -1


def _write_watermark(out_dir: str, batch_id: int) -> None:
    path = os.path.join(out_dir, _WATERMARK_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, path)  # atomic on POSIX


def incremental_dedup_sink(
    doc_stream: DataFrame,
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Maintain ``out_dir`` as the corpus fingerprint table while
    documents stream in. Combine semantics are associative+commutative
    (min keeper, sum copies), so batch boundaries and arrival order
    cannot change the drained result.

    Replay: foreachBatch is at-least-once, and the copy-count combine
    is a DELTA (summing), so a re-delivered batch must not re-merge. A
    batch-id watermark written atomically AFTER each data commit makes
    replays of committed batches no-ops. Residual window: a crash
    BETWEEN the data commit and the watermark write replays one batch
    into an already-merged base and double-counts its copies — the
    same plain-parquet residue materialized.py documents; closing it
    needs a transactional table format (Delta/Iceberg MERGE)."""
    cp = checkpoint_dir or _scratch_dir("a3_incdedup_cp_")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if batch_id <= _read_watermark(out_dir):
            return  # replay of a committed batch: already merged
        batch_fp = fingerprint_frame(batch_df)
        if _has_parquet_data(out_dir):
            # combine with existing rows for the touched fingerprints
            # only: the semi-join prunes the base read to the batch's
            # keys (the bucket layout prunes it to their partitions)
            base = spark.read.parquet(out_dir).join(
                F.broadcast(batch_fp.select("fp")), "fp", "left_semi"
            ).select("fp", "keeper_id", "n_copies")
            batch_fp = (
                base.unionByName(batch_fp)
                .groupBy("fp")
                .agg(
                    F.min("keeper_id").alias("keeper_id"),
                    F.sum("n_copies").cast("long").alias("n_copies"),
                )
            )
        merge_batch_into(spark, batch_fp, "fp", out_dir)
        _write_watermark(out_dir, batch_id)

    return (
        doc_stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )


@query(
    "st10_incremental_dedup_stream",
    oracle="""
    SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def st10_incremental_dedup_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL streaming run: stage documents as {STAGE_FILES} parquet
    files, stream them one file per micro-batch through
    incremental_dedup_sink, then read the drained fingerprint table.
    The oracle is d1's one-shot SQL over the full corpus — streaming
    accumulation must converge to exactly the batch answer."""
    stage = _scratch_dir("a3_incdedup_stage_")
    out = _scratch_dir("a3_incdedup_out_")
    docs = table(spark, sf_dir, "documents")
    docs.repartition(STAGE_FILES, "doc_id").write.mode("overwrite").parquet(
        stage
    )
    stream = (
        spark.readStream.schema(TESTDATA["documents"])
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    with streaming_shuffle(spark, 8):
        q = incremental_dedup_sink(stream, spark, out)
        q.awaitTermination()
    return spark.read.parquet(out).select("fp", "keeper_id", "n_copies")
