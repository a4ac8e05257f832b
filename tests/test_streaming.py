"""Structured Streaming tests (SURVEY §2.9) — all Trigger.AvailableNow
over the finite driver parquet, so results are deterministic and equal
their batch twins (SURVEY §7: never wall clock in tests)."""

from __future__ import annotations

import glob
import os

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.schemas import TESTDATA
from a3_fp_bigdata_spark.sources import csv_io
from a3_fp_bigdata_spark.streaming import batch_windows, ingest
from tests.conftest import SF0001


def test_stream_tumbling_equals_batch_twin(spark):
    streamed = ingest.run_available_now(
        ingest.windowed_counts(ingest.stream_events(spark, SF0001))
    )
    batch = batch_windows.tumbling_counts(table(spark, SF0001, "events"))
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_dedup_keys_equal_distinct(spark):
    streamed = ingest.run_available_now(
        ingest.dedup_keys(ingest.stream_events(spark, SF0001)),
        output_mode="append",
    )
    batch = table(spark, SF0001, "events").select("user_id", "event_type").distinct()
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_micro_batch_csv_sink_roundtrip(spark, tmp_path):
    """The consumer loop analog (ST2-ST5): stream -> foreachBatch CSV
    batches -> scan back; no row lost or duplicated (exactly-once via
    checkpoint)."""
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    ev = ingest.stream_events(spark, SF0001)
    q = ingest.micro_batch_csv_sink(ev, out, cp)
    q.awaitTermination()
    assert not q.isActive  # ST4: drained and stopped

    batch_dirs = glob.glob(os.path.join(out, "batch=*"))
    assert batch_dirs  # at least one non-empty micro-batch written
    back = csv_io.read_csv_dir(spark, os.path.join(out, "batch=*"), TESTDATA["events"])
    n_src = table(spark, SF0001, "events").count()
    assert back.count() == n_src
    # restart with the same checkpoint: no new input -> no new batches
    q2 = ingest.micro_batch_csv_sink(ingest.stream_events(spark, SF0001), out, cp)
    q2.awaitTermination()
    back2 = csv_io.read_csv_dir(
        spark, os.path.join(out, "batch=*"), TESTDATA["events"]
    )
    assert back2.count() == n_src


def test_stream_enrichment_equals_batch(spark):
    """ST6: the same enrichment expression on stream and batch frames
    yields identical rows."""
    streamed = ingest.run_available_now(
        ingest.enrich_events(ingest.stream_events(spark, SF0001)).select(
            "event_id", "weight"
        ),
        output_mode="append",
    )
    batch = ingest.enrich_events(table(spark, SF0001, "events")).select(
        "event_id", "weight"
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_rate_source_is_streaming(spark):
    """ST1: the rate source builds a streaming frame with the documented
    (timestamp, value) schema — no broker needed."""
    src = ingest.rate_source(spark, rows_per_second=10)
    assert src.isStreaming
    assert [f.name for f in src.schema.fields] == ["timestamp", "value"]


def test_materialized_view_incremental_merge(spark, tmp_path):
    """Streaming materialized view: the parquet table equals the batch
    aggregate after the stream drains, and a restart with the same
    checkpoint leaves it unchanged (idempotent merge)."""
    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark.streaming import materialized as MV

    out = str(tmp_path / "mv")
    cp = str(tmp_path / "cp")
    agg = MV.event_type_counts_stream(ingest.stream_events(spark, SF0001))
    q = MV.materialized_view_sink(agg, spark, "event_type", out, cp)
    q.awaitTermination()

    got = {
        r.event_type: (r.cnt, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r.event_type: (r.cnt, r.sum_value)
        for r in table(spark, SF0001, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    }
    assert got == want

    q2 = MV.materialized_view_sink(
        MV.event_type_counts_stream(ingest.stream_events(spark, SF0001)),
        spark, "event_type", out, cp,
    )
    q2.awaitTermination()
    got2 = {
        r.event_type: (r.cnt, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == want


def _parquet_files(d):
    """{path: mtime_ns} for every parquet data file under d."""
    state = {}
    for root, _, fs in os.walk(d):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                state[p] = os.stat(p).st_mtime_ns
    return state


def test_materialized_view_rewrites_only_touched_buckets(spark, tmp_path):
    """The bucketed view's merge is partition-scoped: a batch touching
    one key rewrites only that key's bucket partition — every other
    partition's files survive byte-identical (same paths, same mtimes),
    unlike a full overwrite which would replace them all."""
    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark.streaming import materialized as MV

    out = str(tmp_path / "mv")
    b1 = spark.createDataFrame(
        [(f"k{i}", i) for i in range(40)], "k string, v long"
    )
    MV.merge_batch_into(spark, b1, "k", out, num_buckets=8)
    part_dirs = [
        d for d in os.listdir(out) if d.startswith(MV._BUCKET_COL + "=")
    ]
    assert len(part_dirs) > 2  # 40 keys spread over several buckets
    before = _parquet_files(out)

    b2 = spark.createDataFrame([("k3", 999)], "k string, v long")
    MV.merge_batch_into(spark, b2, "k", out, num_buckets=8)
    after = _parquet_files(out)

    touched_bucket = (
        b2.select(
            F.pmod(F.xxhash64(F.col("k")), F.lit(8)).cast("int").alias("b")
        ).first().b
    )
    touched_prefix = os.path.join(out, f"{MV._BUCKET_COL}={touched_bucket}")
    for p, mtime in before.items():
        if not p.startswith(touched_prefix):
            # untouched partitions: identical file set, never rewritten
            assert after.get(p) == mtime
    # the touched bucket WAS rewritten
    assert not any(
        p.startswith(touched_prefix) and after.get(p) == m
        for p, m in before.items()
    )

    got = {
        (r.k, r.v) for r in MV.read_view(spark, out).collect()
    }
    want = {(f"k{i}", i) for i in range(40) if i != 3} | {("k3", 999)}
    assert got == want


def test_materialized_view_refuses_foreign_dir(spark, tmp_path):
    """A directory with parquet but no bucket manifest is NOT a view
    this sink created — merging under a guessed bucket count would put
    keys in wrong partitions, so it must refuse loudly. (Also pins the
    meta-first crash ordering: data-without-meta can only be foreign.)"""
    import pytest

    from a3_fp_bigdata_spark.streaming import materialized as MV

    foreign = str(tmp_path / "foreign")
    spark.createDataFrame([("a", 1)], "k string, v long").write.parquet(
        foreign
    )
    batch = spark.createDataFrame([("b", 2)], "k string, v long")
    with pytest.raises(ValueError, match="manifest"):
        MV.merge_batch_into(spark, batch, "k", foreign, num_buckets=4)


def test_incremental_dedup_stream_combines_across_batches(spark, tmp_path):
    """st10's machinery on crafted input: duplicates that SPAN
    micro-batches must combine (min keeper id, summed copies) exactly
    as if the whole corpus arrived at once — batch boundaries must be
    invisible in the drained fingerprint table."""
    from a3_fp_bigdata_spark.streaming import incremental_dedup as ID

    stage = str(tmp_path / "stage")
    out = str(tmp_path / "out")
    # batch 1: docs 1,2 ("aa" twice); batch 2: docs 3 ("aa" again), 4
    b1 = spark.createDataFrame([(1, "aa"), (2, "aa")], "doc_id long, text string")
    b2 = spark.createDataFrame([(3, "aa"), (4, "bb")], "doc_id long, text string")
    b1.coalesce(1).write.parquet(stage + "/f1")
    b2.coalesce(1).write.parquet(stage + "/f2")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )
    q = ID.incremental_dedup_sink(stream, spark, out)
    q.awaitTermination()
    got = {
        r.fp: (r.keeper_id, r.n_copies)
        for r in spark.read.parquet(out).collect()
    }
    aa = {v for k, v in got.items()}
    assert (1, 3) in aa  # "aa": keeper 1, three copies across batches
    assert (4, 1) in aa  # "bb": unique
    assert len(got) == 2


def test_materialized_view_meta_only_dir_reinitializes(spark, tmp_path):
    """Crash window: meta is written BEFORE the first data commit, so a
    crash in between leaves a meta-only directory. Replay must treat
    that as the initial load (merge path would read a parquet-less dir
    and error permanently) — and must honour the recorded bucket count,
    not the caller's."""
    from a3_fp_bigdata_spark.streaming import materialized as MV

    out = str(tmp_path / "mv")
    os.makedirs(out)
    MV._write_meta(out, 8)  # simulate: meta committed, data commit lost

    batch = spark.createDataFrame(
        [(f"k{i}", i) for i in range(10)], "k string, v long"
    )
    MV.merge_batch_into(spark, batch, "k", out, num_buckets=4)  # replay
    got = {(r.k, r.v) for r in MV.read_view(spark, out).collect()}
    assert got == {(f"k{i}", i) for i in range(10)}
    # layout used the manifest's count (8), not the caller's 4
    assert MV._bucket_count(out, 4) == 8
    # and a follow-up merge converges normally
    MV.merge_batch_into(
        spark,
        spark.createDataFrame([("k3", 999)], "k string, v long"),
        "k",
        out,
        num_buckets=4,
    )
    got = {(r.k, r.v) for r in MV.read_view(spark, out).collect()}
    assert got == {(f"k{i}", i) for i in range(10) if i != 3} | {("k3", 999)}


def test_delta_merge_sink_replay_is_noop(spark, tmp_path):
    """The shared additive-sink replay guard (materialized.
    delta_merge_sink): re-delivering already-committed batch ids must
    not re-merge their deltas. A second stream over the SAME staged
    files into the SAME view (fresh checkpoint, so batch ids restart
    at 0 <= the recorded watermark) leaves the view bit-identical —
    without the watermark, every count would exactly double."""
    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark.streaming import materialized as MV
    from a3_fp_bigdata_spark.streaming.chunk_index import chunk_index_sink
    from a3_fp_bigdata_spark.streaming.ingest import streaming_shuffle

    stage = str(tmp_path / "stage")
    out = str(tmp_path / "view")
    docs = table(spark, SF0001, "documents").limit(60)
    docs.repartition(2, "doc_id").write.mode("overwrite").parquet(stage)

    def run_once(cp: str):
        stream = (
            spark.readStream.schema(TESTDATA["documents"])
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        with streaming_shuffle(spark, 4):
            q = chunk_index_sink(stream, spark, out, checkpoint_dir=cp)
            q.awaitTermination()

    run_once(str(tmp_path / "cp1"))
    first = sorted(
        map(tuple, spark.read.parquet(out).select(
            "bucket", "n_chunks", "n_docs").collect())
    )
    assert first and MV.read_watermark(out) >= 0
    run_once(str(tmp_path / "cp2"))  # full replay: all ids <= watermark
    second = sorted(
        map(tuple, spark.read.parquet(out).select(
            "bucket", "n_chunks", "n_docs").collect())
    )
    assert second == first
