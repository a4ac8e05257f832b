"""ANN quality tests: the approximate paths must actually approximate
the exact one (seeds pinned, so these are deterministic)."""

from __future__ import annotations

from a3_fp_bigdata_spark import registry
from tests.conftest import SF001


def _topk(df, k):
    return [r.vec_id for r in df.limit(k).collect()]


def test_ivf_recall_vs_bruteforce(spark):
    qs = registry.all_queries()
    exact = set(_topk(qs["sim1_cosine_topk"](spark, SF001), 5))
    ivf = set(_topk(qs["sim3_ivf_ann"](spark, SF001), 5))
    # nprobe=4 of 16 cells: at least 3 of the exact top-5 must survive
    assert len(exact & ivf) >= 3, (exact, ivf)


def test_lsh_results_subset_of_corpus_scores(spark):
    """Every LSH-bucket hit's cosine matches the exact cosine sim1 would
    compute (the approximation prunes candidates, never alters scores)."""
    qs = registry.all_queries()
    exact_all = {
        r.vec_id: r.cosine
        for r in qs["sim1_cosine_topk"](spark, SF001).collect()
    }
    for r in qs["sim2_lsh_ann"](spark, SF001).collect():
        if r.vec_id in exact_all:
            assert abs(r.cosine - exact_all[r.vec_id]) < 1e-9


def test_ml_minhash_matches_exact_pairs(spark):
    """d7 (spark.ml MinHashLSH over shingle vectors) recovers d3's exact
    pairs — same feature space, library-native path."""
    qs = registry.all_queries()
    d3 = {(r.doc_a, r.doc_b) for r in qs["d3_ngram_jaccard"](spark, SF001).collect()}
    d7 = {(r.doc_a, r.doc_b) for r in qs["d7_ml_minhash_lsh"](spark, SF001).collect()}
    assert d7 <= d3  # approx candidates, exactly verified -> subset
    assert len(d7) >= len(d3) * 0.8  # 8 OR-ed hash tables: high recall


def test_incremental_index_append_touches_only_new_buckets(spark, tmp_path):
    """sim10's append contract at file level: appending tonight's batch
    leaves every pre-existing index file untouched (same path, same
    mtime — nothing rewritten), adds files only under the buckets the
    batch hashes into, and the probe over the appended index equals a
    probe over a from-scratch full index."""
    import os

    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark.data import table
    from a3_fp_bigdata_spark.operators import similarity as S

    emb = table(spark, SF001, "embeddings")
    is_delta = (
        F.col("vec_id") % S.INCR_IDX_MOD == S.INCR_IDX_RESIDUE
    )
    base, delta = emb.filter(~is_delta), emb.filter(is_delta)
    planes = S._planes(emb)

    idx = str(tmp_path / "idx")
    (
        base.join(S._buckets(base, planes), "vec_id")
        .repartition("bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(idx)
    )

    def files(d):
        out = {}
        for root, _, fs in os.walk(d):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.stat(p).st_mtime_ns
        return out

    before = files(idx)
    S.append_to_bucketed_index(spark, delta, SF001, idx)
    after = files(idx)
    for p, m in before.items():
        assert after.get(p) == m, p  # nothing pre-existing rewritten
    new_files = set(after) - set(before)
    assert new_files
    delta_buckets = {
        f"bucket={r.bucket}"
        for r in S._buckets(delta, planes).select("bucket").collect()
    }
    for p in new_files:
        # exact path-component match: substring matching would let
        # bucket=2 spuriously cover a file misplaced under bucket=25
        assert os.path.basename(os.path.dirname(p)) in delta_buckets, p

    full = str(tmp_path / "full")
    S.build_bucketed_ann_index(spark, SF001, full)
    got = [
        tuple(r)
        for r in S.probe_bucketed_ann(spark, idx, sf_dir=SF001).collect()
    ]
    want = [
        tuple(r)
        for r in S.probe_bucketed_ann(spark, full, sf_dir=SF001).collect()
    ]
    assert got == want and got
