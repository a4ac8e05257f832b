"""Job-level observability — shuffle volume and peak memory per block.

Production pipelines gate on resource FACTS, not vibes: "this nightly
dedup moved 40 GiB through the shuffle yesterday and 400 GiB today" is
the page-worthy signal. Spark exposes those facts on its REST status
API (the same JSON the Web UI renders — stable, public, no JVM
internals); this module wraps them as a `stage_metrics()` context
manager reporting the DELTA a code block caused:

    with stage_metrics(spark) as m:
        run_expensive_pipeline()
    print(m.shuffle_write_bytes, m.shuffle_read_bytes, m.peak_jvm_bytes)

tools/scale_stress.py consumes this for every SCALE.md rung; a real
deployment logs the same numbers per pipeline stage and alerts on
drift (dq2's pattern, applied to resources instead of values).

Caveats, stated rather than hidden: totals come from COMPLETED stages
(an in-flight stage's bytes land after it finishes), and peak memory
is a high-water mark per executor process — it never goes down, so
the block-level value is "peak observed so far", meaningful for gating
a job's first heavy stage or a dedicated run, coarse inside a long
shared session. Peak memory also arrives with the executor HEARTBEAT
(default ~10 s period), so a block measured moments after session
start can read 0 until the first heartbeat posts.
"""

from __future__ import annotations

import json
import urllib.request
from dataclasses import dataclass

from pyspark.sql import SparkSession


def _rest(spark: SparkSession, path: str):
    ui = spark.sparkContext.uiWebUrl
    if ui is None:
        raise RuntimeError(
            "Spark status REST API unavailable: the UI is disabled "
            "(spark.ui.enabled=false). Enable it (SPARK_GRAFT_UI=true "
            "for the engine's session builder) to collect stage metrics."
        )
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/{path}"
    ) as r:
        return json.load(r)


def shuffle_totals(spark: SparkSession) -> tuple[int, int]:
    """(write_bytes, read_bytes) summed over completed stages."""
    stages = _rest(spark, "stages?status=complete")
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r


def peak_jvm_memory(spark: SparkSession) -> int:
    """Max over executors of (heap + off-heap) peak bytes."""
    execs = _rest(spark, "executors")
    peak = 0
    for e in execs:
        pm = e.get("peakMemoryMetrics") or {}
        peak = max(
            peak,
            pm.get("JVMHeapMemory", 0) + pm.get("JVMOffHeapMemory", 0),
        )
    return peak


@dataclass
class StageMetrics:
    shuffle_write_bytes: int = 0
    shuffle_read_bytes: int = 0
    peak_jvm_bytes: int = 0


class stage_metrics:
    """Context manager capturing the shuffle delta (and memory high-
    water mark) across a block of Spark actions."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self.result = StageMetrics()

    def __enter__(self) -> StageMetrics:
        self._w0, self._r0 = shuffle_totals(self._spark)
        return self.result

    def __exit__(self, *exc) -> None:
        w1, r1 = shuffle_totals(self._spark)
        self.result.shuffle_write_bytes = w1 - self._w0
        self.result.shuffle_read_bytes = r1 - self._r0
        self.result.peak_jvm_bytes = peak_jvm_memory(self._spark)


def completed_stage_ids(spark: SparkSession) -> set[int]:
    """IDs of all completed stages so far — snapshot before a block to
    scope a skew probe to just the stages that block ran."""
    return {
        s["stageId"] for s in _rest(spark, "stages?status=complete")
    }


def join_stage_task_skew(
    spark: SparkSession, prior_ids: set[int], name_filter: str | None = None
) -> dict | None:
    """Per-TASK skew facts for the heaviest new shuffle-reading stage
    (the join stage, in a join block): min/median/max task shuffle
    read and max task runtime, from the stage's taskSummary quantiles.

    This is the metric that exposes a hot key: stage-level totals are
    identical however the key is distributed — only the per-task
    distribution shows one reducer melting (max/median >> 1) vs the
    load spread flat (max/median ~ 1). Returns None if no new stage
    read shuffle data (e.g. the join broadcast instead).

    ATTRIBUTION CAVEAT: "heaviest new shuffle-reading stage" assumes
    the join dominates the block's shuffle reads (true for the salted
    rung this serves). In a block whose downstream aggregation
    exchange reads MORE shuffle bytes than the join, the quantiles
    would attribute to the wrong stage — pass ``name_filter`` (a
    substring matched case-insensitively against the stage's name,
    e.g. the call site shown in it) to scope candidates when reusing
    this more broadly."""
    best = None
    for s in _rest(spark, "stages?status=complete"):
        if s["stageId"] in prior_ids:
            continue
        if name_filter is not None and name_filter.lower() not in (
            s.get("name") or ""
        ).lower():
            continue
        rb = s.get("shuffleReadBytes", 0)
        if rb > 0 and (best is None or rb > best[2]):
            best = (s["stageId"], s.get("attemptId", 0), rb, s)
    if best is None:
        return None
    sid, att, _, stage = best
    ts = _rest(
        spark,
        f"stages/{sid}/{att}/taskSummary?quantiles=0.0,0.5,1.0",
    )
    reads = (ts.get("shuffleReadMetrics") or {}).get("readBytes") or [
        0.0,
        0.0,
        0.0,
    ]
    run_ms = ts.get("executorRunTime") or [0.0, 0.0, 0.0]
    return {
        "stage_id": sid,
        "n_tasks": stage.get("numCompleteTasks", 0),
        "read_min": int(reads[0]),
        "read_med": int(reads[1]),
        "read_max": int(reads[2]),
        "run_max_ms": int(run_ms[2]),
    }
