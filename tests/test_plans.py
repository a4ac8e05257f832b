"""Physical-plan regression tests — the scale contract (SURVEY §4).

Correctness tests prove the numbers; these prove the PLAN: broadcasts
stay broadcasts, filters reach the parquet scan, projections prune the
read schema, top-k never becomes a full sort. A failure here is a 100 TB
incident caught at sf0.001."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from a3_fp_bigdata_spark import registry
from a3_fp_bigdata_spark.plans import inspect as PI
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def qs():
    return registry.all_queries()


def test_small_dim_join_broadcasts_no_shuffle(spark, qs):
    """J1: the 25-row nation dim must broadcast; the big side must not
    shuffle (reference's only join, spark_script.py:24)."""
    df = qs["j1_left_outer_broadcast"](spark, SF0001)
    assert PI.uses_broadcast_join(df)
    assert PI.shuffle_count(df) == 0


def test_multiway_join_broadcasts_all_dims(spark, qs):
    """J5: star-schema multiway join — every dim side broadcast, never a
    shuffled sort-merge join against a tiny table."""
    df = qs["j5_multiway_join"](spark, SF0001)
    assert PI.uses_broadcast_join(df)
    assert "SortMergeJoin" not in PI.physical_plan(df)


def test_topk_compiles_to_take_ordered(spark, qs):
    """T1-T5: orderBy+limit must be TakeOrderedAndProject (distributed
    top-k), not a global sort (SURVEY §2.6)."""
    for name in ("t1_topk_multikey", "t3_topk_dynamic_key", "srv_top_apps"):
        df = qs[name](spark, SF0001)
        assert PI.has_take_ordered(df), name
        assert "Sort [" not in PI.physical_plan(df).replace(
            "TakeOrderedAndProject", ""
        ), name


def test_point_filter_pushed_into_scan(spark, qs):
    """P4: equality predicate reaches the parquet reader as a pushed
    filter — row-group/page skipping at scale."""
    pushed = PI.pushed_filters(qs["p4_eq_predicate"](spark, SF0001))
    assert pushed and "EqualTo(c_custkey" in pushed[0]


def test_projection_prunes_read_schema(spark, qs):
    """P1: a narrow projection must narrow the scan itself."""
    schemas = PI.scan_read_schemas(qs["p1_projection"](spark, SF0001))
    assert schemas
    # lineitem has 11 columns; the projection reads far fewer
    assert all(s.count(",") + 1 <= 4 for s in schemas), schemas


def test_groupby_is_single_shuffle_partial_agg(spark, qs):
    """A1: groupBy count = partial (map-side) agg + ONE shuffle + final
    agg. Two shuffles would mean a planning regression."""
    df = qs["a1_groupby_count"](spark, SF0001)
    assert PI.shuffle_count(df) == 1
    assert "partial_count" in PI.physical_plan(df)


def test_window_topk_single_shuffle(spark, qs):
    """W1: per-group top-k = one hash-partition exchange on the group
    key, and Spark's WindowGroupLimit pushes the rank filter below the
    sort so no full per-group materialization."""
    df = qs["w1_topk_per_group"](spark, SF0001)
    assert PI.shuffle_count(df) == 1


def test_exact_dedup_partial_agg(spark, qs):
    """D1: exact dedup is hash-aggregate shaped (map-side partial, one
    shuffle) — never a global distinct-sort."""
    df = qs["d1_exact_dedup"](spark, SF0001)
    assert PI.shuffle_count(df) <= 2  # agg + optional AQE reshuffle
    plan = PI.physical_plan(df)
    assert "HashAggregate" in plan


def test_jvm_only_hot_paths(spark, qs):
    """Text analysis and similarity stay JVM-side: no Python eval nodes
    (BatchEvalPython / ArrowEvalPython) outside the multimodal module."""
    for name in (
        "f1_extract_keywords", "tx1_lang_id", "tx2_quality_score",
        "sim1_cosine_topk", "d3_ngram_jaccard", "d4_minhash_lsh",
    ):
        plan = PI.physical_plan(qs[name](spark, SF0001))
        assert "EvalPython" not in plan, name


def test_exchange_counts_dedupes_cached_subtrees(spark):
    """exchange_counts: a cached frame referenced twice contributes its
    internal exchange ONCE to `staged` (one materialization), and
    exchanges outside the cache land in `per_run`. The formatted-text
    regex this replaces counted the cached exchange at every reference
    site — the methodology bug that inflated d4's round-4 number."""
    base = (
        spark.range(100_000)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count("*").alias("n"))
        .persist()
    )
    try:
        j = (
            base.alias("a")
            .join(base.alias("b"), "k")
            .groupBy((F.col("k") % 2).alias("b2"))
            .agg(F.sum("a.n").alias("s"))
        )
        run, staged = PI.exchange_counts(j)
        assert staged == 1, (run, staged)  # base's agg exchange, once
        assert run >= 1  # the outer re-keyed aggregation still shuffles
    finally:
        base.unpersist()


def test_minhash_signature_stage_shared_and_bounded(spark, qs):
    """D4/D11: the 32-hash signature/bucket table is staged ONCE per
    (session, sf_dir) and shared between the full pair mine (d4) and
    the nightly incremental probe (d11); d4's own plan then runs at
    most 5 exchanges per execution — stage-materialization shuffles
    are amortized across the ladder (per corpus snapshot at scale)."""
    from a3_fp_bigdata_spark.operators import dedup as D

    d4 = qs["d4_minhash_lsh"](spark, SF0001)
    run, staged = PI.exchange_counts(d4)
    assert run <= 5, (run, staged)
    # the memo hands back the same staged frame — shared, not rebuilt
    # (the stage holds RAW pre-cap rows since r15; the cap is a cheap
    # window applied on read, so identity lives on the raw memo)
    b = D.staged_raw_buckets(spark, SF0001)
    assert D.staged_raw_buckets(spark, SF0001) is b
    d11 = qs["d11_incremental_lsh"](spark, SF0001)
    run11, _ = PI.exchange_counts(d11)
    assert run11 <= 6, run11
    registry.release_pinned()


def test_streaming_batch_twins_are_single_shuffle(spark, qs):
    for name in ("st1_tumbling_window", "st4_stream_dedup"):
        assert PI.shuffle_count(qs[name](spark, SF0001)) == 1, name


def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    """S5 partition_by: a predicate on the partition column must prune
    directories at planning time (PartitionFilters), reading only the
    matching partition — the 100 TB date-filter path."""
    from a3_fp_bigdata_spark.data import table
    from a3_fp_bigdata_spark.sources import parquet_io

    path = str(tmp_path / "pq")
    ev = table(spark, SF0001, "events")
    parquet_io.write_parquet_overwrite(ev, path, partition_by=("event_type",))
    back = parquet_io.read_parquet(spark, path).filter("event_type = 'click'")
    fp = PI.formatted_plan(back)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", fp)
    assert m and "event_type" in m.group(1), fp[:500]
    n_click = ev.filter("event_type = 'click'").count()
    assert back.count() == n_click


def test_salted_join_spreads_shuffle_keys(spark, qs):
    """J7: the salted join's exchange partitions on (key, salt), so a
    hot key occupies SALT_BUCKETS reducers."""
    df = qs["j7_salted_skew_join"](spark, SF0001)
    plan = PI.physical_plan(df)
    assert "_salt" in plan
    assert PI.shuffle_count(df) >= 2  # both sides repartition on (key,salt)


def test_bucketed_join_skips_both_exchanges(spark, tmp_path):
    """Co-located bucketed join: orders and lineitem bucketed on the
    same key join with ZERO exchanges — the recurring-fact-join answer
    at 100 TB (one up-front bucketed write, then every join is local)."""
    from a3_fp_bigdata_spark.data import table
    from a3_fp_bigdata_spark.sources import parquet_io

    orders = table(spark, SF0001, "orders")
    li = table(spark, SF0001, "lineitem")
    parquet_io.write_bucketed_table(
        orders.select("o_orderkey", "o_totalprice"), spark,
        "b_orders", "o_orderkey", 4,
    )
    parquet_io.write_bucketed_table(
        li.select("l_orderkey", "l_quantity"), spark,
        "b_lineitem", "l_orderkey", 4,
    )
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert PI.shuffle_count(j) == 0, PI.physical_plan(j)[:800]
        # and the result is still correct
        expect = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert j.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_decontaminate_broadcasts_benchmark_grams(spark, qs):
    """tx9: the benchmark n-gram set must broadcast — the corpus side
    of the contamination check may never shuffle on the join key (at
    100 TB the eval suite is MBs; a sort-merge join there would shuffle
    the whole corpus's n-grams)."""
    df = qs["tx9_decontaminate"](spark, SF0001)
    assert PI.uses_broadcast_join(df)
    assert "SortMergeJoin" not in PI.physical_plan(df)


def test_incremental_dedup_exact_stays_jvm(spark, qs):
    """d10: the nightly exact rung is pure Column algebra — no Python
    crossings, and the corpus side reduces to one aggregation before
    the join (no quadratic or UDF stage anywhere)."""
    df = qs["d10_incremental_dedup"](spark, SF0001)
    plan = PI.physical_plan(df)
    for marker in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert marker not in plan
    # exactly the join+window+agg shuffles, bounded small
    assert PI.shuffle_count(df) <= 4, PI.shuffle_count(df)


def test_bucketed_ann_probe_is_partition_pruned(spark, tmp_path, qs):
    """sim4: the materialized ANN index is partitioned on the LSH bucket
    id, and a probe's candidate scan must carry a PartitionFilter on the
    bucket literal — reading ONE bucket directory, not the corpus. The
    probe's answer equals sim2's on-the-fly ranking exactly."""
    from a3_fp_bigdata_spark.operators import similarity as S

    idx = str(tmp_path / "ann_idx")
    S.build_bucketed_ann_index(spark, SF0001, idx)
    # production path: query bucket computed from the planes over the
    # embeddings table — the index is only touched partition-pruned
    probe = S.probe_bucketed_ann(spark, idx, sf_dir=SF0001)
    pfs = PI.partition_filters(probe)
    assert any("bucket" in f for f in pfs), pfs
    got = [(r.vec_id, r.cosine) for r in probe.collect()]
    want = [
        (r.vec_id, r.cosine)
        for r in qs["sim2_lsh_ann"](spark, SF0001).collect()
    ]
    assert got == want
    # self-contained fallback (no sf_dir) answers identically
    fallback = S.probe_bucketed_ann(spark, idx)
    assert [(r.vec_id, r.cosine) for r in fallback.collect()] == want


def test_epoch_plan_is_zero_shuffle_narrow_explode(spark, qs):
    """pk6: the repetition plan must amplify rows IN PLACE — a literal
    CASE schedule, row-local arithmetic, explode — with no exchange
    anywhere and no Python eval."""
    df = qs["pk6_epoch_plan"](spark, SF0001)
    assert PI.shuffle_count(df) == 0
    plan = PI.physical_plan(df)
    assert "Generate explode" in plan
    assert "EvalPython" not in plan


def test_domain_mixture_shuffles_counts_not_docs(spark, qs):
    """pk5: the corpus side must never move — every exchange in the
    plan belongs to the |langs|-row rate derivation (count + min),
    and the rates come back to the corpus via broadcast joins."""
    df = qs["pk5_domain_mixture"](spark, SF0001)
    assert PI.uses_broadcast_join(df)
    plan = PI.physical_plan(df)
    # doc-side scan feeds a broadcast join directly: any exchange in
    # the plan sits under the (tiny) aggregate subtrees, and none of
    # them partitions by doc_id
    assert "hashpartitioning(doc_id" not in plan
    assert "EvalPython" not in plan


def test_collapse_repeats_is_scan_only(spark, qs):
    """tx12: the rewrite is per-row array algebra — zero exchanges,
    zero Python eval; at 100 TB it runs at parquet scan speed."""
    df = qs["tx12_collapse_repeats"](spark, SF0001)
    assert PI.shuffle_count(df) == 0
    assert "EvalPython" not in PI.physical_plan(df)


def test_unigram_scoring_joins_by_broadcast(spark, qs):
    """tx13: the corpus-side scoring join must be a broadcast hash
    join (the capped vocab is the build side); the corpus never
    shuffles by token — its only hashpartitioning is the per-doc
    re-aggregation."""
    df = qs["tx13_unigram_logprob"](spark, SF0001)
    assert PI.uses_broadcast_join(df)
    plan = PI.physical_plan(df)
    # the (tok) exchanges belong to the tiny sample-side vocab fit;
    # the full corpus only ever partitions by doc_id
    assert plan.count("hashpartitioning(doc_id") == 1
    assert "EvalPython" not in plan


def test_quantized_rerank_is_two_take_ordereds(spark, qs):
    """sim9: both stages must stay distributed partial top-k — a
    TakeOrderedAndProject for the int8 coarse cut and one for the
    exact rerank; the query vector is the only broadcast, and there
    is no global sort."""
    df = qs["sim9_quantized_rerank"](spark, SF0001)
    plan = PI.physical_plan(df)
    assert plan.count("TakeOrderedAndProject") == 2
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")
    assert PI.shuffle_count(df) == 0


def test_sliding_chunks_is_scan_only(spark, qs):
    """pk8: chunk fan-out must be a narrow Generate in the scan stage —
    zero exchanges, zero Python."""
    df = qs["pk8_sliding_chunks"](spark, SF0001)
    assert PI.shuffle_count(df) == 0
    plan = PI.physical_plan(df)
    assert "Generate explode" in plan
    assert "EvalPython" not in plan


def test_bigram_pmi_ends_in_take_ordered(spark, qs):
    """tx14: the top-k cut must stay a distributed TakeOrdered, the
    count joins must broadcast, and nothing runs in Python."""
    df = qs["tx14_bigram_pmi"](spark, SF0001)
    assert PI.has_take_ordered(df)
    assert PI.uses_broadcast_join(df)
    assert "EvalPython" not in PI.physical_plan(df)


def test_chunk_index_stats_single_agg_pipeline(spark, qs):
    """pl2: chunking + featurization + bucketing all fuse into the
    scan stage (one Generate, no Python); the only exchanges are the
    two-phase distinct-doc aggregation keyed on the small bucket id."""
    df = qs["pl2_chunk_index_stats"](spark, SF0001)
    plan = PI.physical_plan(df)
    assert PI.shuffle_count(df) <= 2
    assert "Generate explode" in plan
    assert "EvalPython" not in plan
    assert "hashpartitioning(bucket" in plan


def test_gapfill_windows_stay_linear(spark, qs):
    """w8/w9: the grid fan-out is a narrow Generate and every window
    frame is an O(n) running accumulator — w8 fills in one per-key
    sort; w9 pays exactly two directional sorts (ASC for the
    backward-looking pair, DESC for the forward-looking pair — the
    linear reversal of Spark's O(n^2) UnboundedFollowing frame). No
    global sort, no Python."""
    for name, sorts in (("w8_gapfill_locf", 1), ("w9_linear_interp", 2)):
        df = qs[name](spark, SF0001)
        plan = PI.physical_plan(df)
        assert plan.count("Sort [") == sorts, name
        assert "UnboundedFollowing" not in plan, name
        assert "Generate explode" in plan, name
        assert "EvalPython" not in plan, name


def test_bpe_token_stats_segments_vocab_jvm_side(spark, qs):
    """tk2: segmentation must run over the DISTINCT vocabulary and
    join back (2 shuffles: the distinct + the per-doc agg; the vocab
    join itself broadcasts at this scale), with zero Python crossings
    — the chained merge folds are native expressions."""
    df = qs["tk2_bpe_token_stats"](spark, SF0001)
    assert PI.shuffle_count(df) <= 3
    assert PI.uses_broadcast_join(df)
    plan = PI.physical_plan(df)
    assert "InPandas" not in plan and "ArrowEval" not in plan


def test_bloom_prefilter_sits_below_the_exchange(spark, qs):
    """j11: the bloom membership filter must run at the probe scan,
    BEFORE the join's exchange — the whole point of semi-join
    reduction — and the join itself is the shuffled (non-broadcast)
    form the technique exists for."""
    df = qs["j11_bloom_prefilter_join"](spark, SF0001)
    plan = PI.physical_plan(df)
    # the bloom test compiles to xxhash64 probes in a Filter node on
    # the orders scan side; find a Filter containing xxhash64 and an
    # Exchange after it in the tree rendering (children print below
    # their parents, so scan-side filters appear AFTER the exchange
    # text — assert both exist and the join is not broadcast)
    assert "xxhash64" in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    import re

    filt = re.search(r"Filter .*xxhash64", plan)
    assert filt, plan[:800]


def test_dq1_scans_each_table_once_per_pass(spark, qs):
    """dq1: every check over a table must ride ONE aggregate over ONE
    scan (the r8 explode-of-structs rewrite) — the per-check
    select+union shape re-executed the fact scan per report row
    (measured: 3 lineitem scans for 3 checks). lineitem: exactly one
    scan for its three checks; orders: two (one for its own checks,
    one inherent to the FK join pass); at 100 TB the fact-table scan
    count IS the cost of this query."""
    df = qs["dq1_expectations"](spark, SF0001)
    plan = PI.formatted_plan(df)
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("orders.parquet") == 2, plan
    assert plan.count("customer.parquet") == 1, plan


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """src8's layout claim, pinned at the parquet-footer level: a
    single Morton-clustered layout (write_zordered) gives file-level
    min/max pruning in BOTH box dimensions, while each 1-D sorted
    layout is completely blind to boxes on the other column (every
    file hit). On the 2-D box the z-layout matches the best 1-D sort.
    Measured at 64 files / sf0.01: z hits 21/64 (partkey box), 37/64
    (suppkey box), 14/64 (both); the 1-D layouts hit 64/64 off-axis."""
    import glob

    import pyarrow.parquet as pq

    from a3_fp_bigdata_spark.data import table
    from a3_fp_bigdata_spark.sources.parquet_io import write_zordered
    from a3_fp_bigdata_spark.sources.queries import ZBOX_PK, ZBOX_SK
    from tests.conftest import SF001

    li = table(spark, SF001, "lineitem")
    layouts = {}
    z_dir = str(tmp_path / "z")
    write_zordered(li, z_dir, ["l_partkey", "l_suppkey"], n_files=64)
    layouts["z"] = z_dir
    for col, tag in (("l_partkey", "pk"), ("l_suppkey", "sk")):
        d = str(tmp_path / f"lin_{tag}")
        (
            li.repartitionByRange(64, col)
            .sortWithinPartitions(col)
            .write.mode("overwrite")
            .parquet(d)
        )
        layouts[tag] = d

    def file_stats(d):
        out = []
        for f in glob.glob(os.path.join(d, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.num_columns)
            }
            mins, maxs = {}, {}
            for rg in range(md.num_row_groups):
                for c in ("l_partkey", "l_suppkey"):
                    st = md.row_group(rg).column(names[c]).statistics
                    mins[c] = min(mins.get(c, st.min), st.min)
                    maxs[c] = max(maxs.get(c, st.max), st.max)
            out.append((mins, maxs))
        return out

    def files_hit(stats, pk=None, sk=None):
        n = 0
        for mins, maxs in stats:
            ok = True
            if pk:
                ok &= not (
                    maxs["l_partkey"] < pk[0] or mins["l_partkey"] > pk[1]
                )
            if sk:
                ok &= not (
                    maxs["l_suppkey"] < sk[0] or mins["l_suppkey"] > sk[1]
                )
            n += ok
        return n

    st = {k: file_stats(d) for k, d in layouts.items()}
    n = len(st["z"])
    assert n == 64
    # 1-D layouts: perfect on their own column, BLIND off-axis
    assert files_hit(st["pk"], sk=ZBOX_SK) == n
    assert files_hit(st["sk"], pk=ZBOX_PK) == n
    # z layout: real pruning in BOTH dimensions from ONE layout
    z_p = files_hit(st["z"], pk=ZBOX_PK)
    z_s = files_hit(st["z"], sk=ZBOX_SK)
    assert z_p <= n // 2, z_p
    assert z_s <= (n * 2) // 3, z_s
    # and on the 2-D box it is as good as the best 1-D sort (+ slack
    # for range-partitioner sampling jitter)
    z_ps = files_hit(st["z"], pk=ZBOX_PK, sk=ZBOX_SK)
    best_1d = min(
        files_hit(st["pk"], pk=ZBOX_PK, sk=ZBOX_SK),
        files_hit(st["sk"], pk=ZBOX_PK, sk=ZBOX_SK),
    )
    assert z_ps <= best_1d + 2, (z_ps, best_1d)

    # correctness of the layout rewrite: same rows back
    assert spark.read.parquet(z_dir).count() == li.count()


def test_zorder_key_matches_independent_morton(spark):
    """The 32-term Column bit fold in zorder_key equals a straight
    Python Morton interleave on a grid + random sample of 2-D points
    (bit index convention: column j contributes bit i at position
    i*n + j), and is injective over the sampled domain."""
    import numpy as np

    from a3_fp_bigdata_spark.sources.parquet_io import zorder_key

    rng = np.random.default_rng(3)
    pts = [(int(a), int(b)) for a in range(0, 256, 17) for b in range(0, 256, 23)]
    pts += [
        (int(a), int(b))
        for a, b in zip(
            rng.integers(0, 256, 200), rng.integers(0, 256, 200)
        )
    ]
    df = spark.createDataFrame(pts, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zorder_key(["a", "b"], bits=8).alias("z")
        ).collect()
    }

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): morton(a, b) for a, b in set(pts)}
    assert len(set(got.values())) == len(got)  # injective


def test_ewma_is_one_exchange_one_window(spark, qs):
    """w10: the whole smoother must be ONE hash exchange on user_id and
    ONE Window node of running-frame lags — no UnboundedFollowing
    rescans, no Python, and the lag columns materialized once (7 _weN
    slots, not 14 — the num/den fold must not duplicate them)."""
    df = qs["w10_ewma_smooth"](spark, SF0001)
    plan = PI.physical_plan(df)
    assert PI.shuffle_count(df) == 1
    assert plan.count("Window [") == 1
    assert "Python" not in plan and "InPandas" not in plan
    # the lag columns are materialized ONCE as named v1..v7 (the
    # num/den fold reuses them), so the Window node carries exactly 7
    # lag expressions — the duplicated-fold regression would show 14
    window_node = plan.split("Window [")[1].split("\n")[0]
    assert window_node.count("lag(value") == 7, window_node


def test_pack_efficiency_shuffles_only_pack_keys(spark, qs):
    """pk14: beyond pk2's own shard exchange, the audit adds only the
    (shard, seq_id) and shard aggregations — every exchange keyed on
    the packing keys, partial aggregation before each."""
    df = qs["pk14_pack_efficiency"](spark, SF0001)
    plan = PI.physical_plan(df)
    assert PI.shuffle_count(df) <= 3
    assert plan.count("FlatMapGroupsInPandas") == 1  # pk2's packer only
    assert "partial_count" in plan or "partial_sum" in plan


def test_gopher_rules_aggregate_collapses_map_side(spark, qs):
    """tx17: the repetition rule's token-frequency mode must partial-
    aggregate (doc, tok) counts BEFORE its exchange — wire bytes stay
    bounded by per-doc vocabulary, the tx16 contract."""
    df = qs["tx17_gopher_rules"](spark, SF0001)
    plan = PI.physical_plan(df)
    assert "partial_count" in plan
    assert "Python" not in plan and "InPandas" not in plan


def test_heavy_hitters_summary_stays_k_scale(spark, qs):
    """a21: the merge stage must operate on the truncated summaries
    (<= HH_SHARDS*K rows), with the (shard, tok) count collapsing
    map-side before its exchange; rank windows partition by shard
    (parallel), and only the final K-row ranking is single-partition."""
    df = qs["a21_heavy_hitters_audit"](spark, SF0001)
    plan = PI.physical_plan(df)
    assert "partial_count" in plan
    assert "Python" not in plan and "InPandas" not in plan
    # the global (K-row) ranking is the ONLY single-partition exchange
    assert plan.count("Exchange SinglePartition") <= 2


def test_broadcast_join_counts_dedupes_cached_subtrees(spark):
    """broadcast_join_counts (r12): broadcast joins inside a cached
    frame referenced twice count ONCE as staged; joins outside the
    cache land in per_run. The text count this replaces re-expanded
    the cached subtree at every reference site (pl8's 64-broadcast
    PLANS row was mostly that)."""
    small = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    base = (
        spark.range(50_000)
        .select((F.col("id") % 5).alias("k"))
        .join(F.broadcast(small), "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    try:
        j = base.alias("a").join(base.alias("b"), "k").join(
            F.broadcast(small), "k"
        )
        run, staged = PI.broadcast_join_counts(j)
        assert staged == 1, (run, staged)  # base's bcast join, once
        assert run >= 1  # the outer broadcast join runs every time
    finally:
        base.unpersist()
