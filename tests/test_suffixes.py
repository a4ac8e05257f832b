"""Suffix-array rung (d21/d22): ground-truth equality against python's
own suffix sort, planted cross-document duplicates, and the
separator-stitching guard (SURVEY §5 style: exact pins, no tolerance).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from a3_fp_bigdata_spark import registry
from a3_fp_bigdata_spark.operators import suffixes as SX
from tests.conftest import SF0001


def _python_suffix_array(s: str) -> list[tuple[int, int]]:
    """(sa_rank, pos) by brute force — the third independent
    implementation (after Spark prefix doubling and DuckDB's sort)."""
    poss = [p for p in range(len(s)) if s[p] != SX.SA_SEP]
    order = sorted(poss, key=lambda p: s[p:])
    return [(i + 1, p) for i, p in enumerate(order)]


def test_d21_matches_python_ground_truth(spark):
    s = SX.corpus_slice(spark, SF0001).first()["s"]
    want = _python_suffix_array(s)
    got = [
        (r["sa_rank"], r["pos"])
        for r in registry.all_queries()["d21_suffix_array"](
            spark, SF0001
        ).orderBy("sa_rank").collect()
    ]
    assert got == want


def _planted_corpus(spark, tmp_path):
    """documents table whose mod-SA_DOC_MOD sample carries a planted
    30-char exact cross-document repeat plus a decoy pair whose only
    'repeat' straddles the document boundary."""
    span = "the quick brown fox jumps over"  # 30 chars
    assert len(span) == 30
    mod = SX.SA_DOC_MOD
    rows = [
        (0 * mod, f"alpha {span} omega one"),
        (1 * mod, f"beta {span} gamma two"),
        # decoy: doc ends with a prefix the NEXT doc starts with — any
        # stitched window would cross the separator and must be excluded
        (2 * mod, "zebra stripes conclude with shared boundary tail"),
        (3 * mod, "shared boundary tail starts this other document"),
        # non-sampled doc with the same span must NOT appear (not in
        # the mod sample)
        (1, f"hidden {span} hidden"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "test", 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, ts long",
    )
    out = str(tmp_path / "planted")
    df.select("doc_id", "text", "lang", "source").write.mode(
        "overwrite"
    ).parquet(out + "/documents.parquet")
    return out


def test_d22_finds_planted_cross_doc_span(spark, tmp_path):
    sf_dir = _planted_corpus(spark, tmp_path)
    SX._SA_CACHE.clear()  # keyed by sf_dir, but keep the test hermetic
    rows = registry.all_queries()["d22_exact_substring_spans"](
        spark, sf_dir
    ).collect()
    SX._SA_CACHE.clear()
    spans = {r["span"] for r in rows}
    # every reported span really is SPAN_L chars of the planted repeat
    s = SX.corpus_slice(spark, sf_dir).first()["s"]
    for r in rows:
        assert (
            s[r["pos_a"] : r["pos_a"] + SX.SPAN_L]
            == s[r["pos_b"] : r["pos_b"] + SX.SPAN_L]
            == r["span"]
        )
        assert SX.SA_SEP not in r["span"]
    # the planted repeat surfaces (some window of it)
    assert any(sp in f" {('the quick brown fox jumps over')} " or
               sp in "the quick brown fox jumps over"
               for sp in spans), spans
    # no span crosses a document boundary
    assert all(SX.SA_SEP not in sp for sp in spans)


def test_d22_zero_false_negatives_on_planted(spark, tmp_path):
    """Exhaustive cross-check on the planted corpus: EVERY repeated
    SPAN_L-window (python brute force over the slice) must be
    recoverable from d22's adjacent-pair output via span equality —
    the Lee et al. completeness property at test scale."""
    sf_dir = _planted_corpus(spark, tmp_path)
    SX._SA_CACHE.clear()
    s = SX.corpus_slice(spark, sf_dir).first()["s"]
    windows: dict[str, list[int]] = {}
    for p in range(len(s) - SX.SPAN_L + 1):
        w = s[p : p + SX.SPAN_L]
        if SX.SA_SEP in w:
            continue
        windows.setdefault(w, []).append(p)
    dup_spans = {w for w, ps in windows.items() if len(ps) > 1}
    rows = registry.all_queries()["d22_exact_substring_spans"](
        spark, sf_dir
    ).collect()
    SX._SA_CACHE.clear()
    got_spans = {r["span"] for r in rows}
    assert dup_spans == got_spans, (
        dup_spans - got_spans,
        got_spans - dup_spans,
    )


def test_sa_cache_shared_between_queries(spark):
    SX._SA_CACHE.clear()
    registry.all_queries()["d21_suffix_array"](spark, SF0001).count()
    assert len(SX._SA_CACHE) == 1
    registry.all_queries()["d22_exact_substring_spans"](
        spark, SF0001
    ).count()
    assert len(SX._SA_CACHE) == 1  # reused, not rebuilt


def test_d23_lcp_matches_python_ground_truth(spark):
    """Capped LCP of every SA-adjacent pair equals a direct python
    common-prefix count over the same slice."""
    s = SX.corpus_slice(spark, SF0001).first()["s"]
    rows = registry.all_queries()["d23_lcp_array"](
        spark, SF0001
    ).orderBy("sa_rank").collect()
    sa = _python_suffix_array(s)
    assert len(rows) == len(sa) - 1
    for r in rows:
        a, b = r["pos_a"], r["pos_b"]
        k = 0
        while (
            k < SX.LCP_CAP
            and a + k < len(s)
            and b + k < len(s)
            and s[a + k] == s[b + k]
        ):
            k += 1
        assert r["lcp"] == k, (a, b, k, r["lcp"])
        # adjacency really is the SA's
        assert (r["sa_rank"], a) in sa
