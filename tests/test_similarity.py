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
