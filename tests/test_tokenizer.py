"""tk1 BPE induction — full plain-Python replay of the fit, pinned
row-for-row against the Spark loop (SURVEY §5's oracle-style evidence
for an op no SQL engine can express)."""

from __future__ import annotations

import re
from collections import Counter

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.operators import tokenizer as TK
from a3_fp_bigdata_spark.operators.text_analysis import (
    SAMPLE_MULT,
    SAMPLE_PREMOD,
)
from tests.conftest import SF0001


def _py_tokens(text: str) -> list[str]:
    return [
        t for t in re.sub(r"[^a-z0-9\s]", " ", text.lower()).split() if t
    ]


def _py_fit(rows, n_merges: int):
    hist = Counter()
    for r in rows:
        if ((r.doc_id % SAMPLE_PREMOD) * SAMPLE_MULT) % 100 < TK.BPE_SAMPLE_PCT:
            hist.update(_py_tokens(r.text))
    syms = {w: tuple(list(w) + [TK.END_MARK]) for w in hist}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for w, s in syms.items():
            cnt = hist[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        # count desc, then pair asc — the Spark loop's exact tie-break
        (a, b), best = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, best))
        for w, s in syms.items():
            out, prev = [], None
            for sym in s:
                if prev == a and sym == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = sym
            if prev is not None:
                out.append(prev)
            syms[w] = tuple(out)
    return merges


def test_bpe_merge_table_matches_python_replay(spark):
    rows = table(spark, SF0001, "documents").select(
        "doc_id", "text"
    ).collect()
    expected = _py_fit(rows, TK.N_MERGES)
    got = [
        tuple(r)
        for r in TK.tk1_bpe_merges(spark, SF0001).orderBy("step").collect()
    ]
    assert expected, "fixture premise: sample produces mergeable pairs"
    assert got == expected


def test_merge_pair_fold_handles_overlaps(spark):
    """'aaa' under ('a','a') must merge greedily left-to-right:
    ['aa','a'] — the exact semantics reference BPE implementations
    use; also covers pair-at-end and no-hit words."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["b", "a", "a"],), (["a", "b"],), ([],)],
        "syms array<string>",
    )
    got = [
        r.m for r in df.select(
            TK._merge_pair(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert got == [["aa", "a"], ["b", "aa"], ["a", "b"], []]


def test_fit_is_deterministic_across_runs(spark):
    a = TK.fit_bpe(spark, SF0001, n_merges=4)
    b = TK.fit_bpe(spark, SF0001, n_merges=4)
    assert a == b and len(a) == 4


def test_apply_bpe_segments_with_learned_merges(spark):
    """Inference: applying the learned merge list reproduces the exact
    symbol sequences the fit's final histogram holds — replayed in
    Python for a handful of sample words."""
    from pyspark.sql import functions as F

    rows = table(spark, SF0001, "documents").select(
        "doc_id", "text"
    ).collect()
    merges = _py_fit(rows, TK.N_MERGES)

    words = ["lower", "spark", "the", "throw"]

    def seg(w):
        s = list(w) + [TK.END_MARK]
        for _st, a, b, _m, _pc in merges:
            out, prev = [], None
            for sym in s:
                if prev == a and sym == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = sym
            if prev is not None:
                out.append(prev)
            s = out
        return s

    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r.word: list(r.toks)
        for r in df.select(
            "word", TK.apply_bpe(F.col("word"), merges).alias("toks")
        ).collect()
    }
    assert got == {w: seg(w) for w in words}
    # merges actually fired: at least one word is shorter than chars+1
    assert any(len(got[w]) < len(w) + 1 for w in words)


def test_tk2_token_stats_invariants_and_replay(spark):
    """tk2 under the frozen merges: n_words matches a Python
    re-tokenization per doc, n_bpe_tokens equals the Python fold
    replay summed over the doc's words, and every word contributes at
    least one and at most len(word)+1 subwords."""
    rows = table(spark, SF0001, "documents").select(
        "doc_id", "text"
    ).collect()

    def seg_len(w):
        s = list(w) + [TK.END_MARK]
        for a, b in TK.FROZEN_MERGES:
            out, prev = [], None
            for sym in s:
                if prev == a and sym == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = sym
            if prev is not None:
                out.append(prev)
            s = out
        return len(s)

    expected = {}
    for r in rows:
        toks = _py_tokens(r.text)
        if toks:
            expected[r.doc_id] = (len(toks), sum(seg_len(w) for w in toks))
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in TK.tk2_bpe_token_stats(spark, SF0001).collect()
    }
    assert got == expected
    for doc_id, (nw, nb) in got.items():
        assert nw <= nb  # every word is at least one subword
