"""Sequence-packing operator invariants (operators/packing.py).

The DuckDB oracles (run by test_oracle_parity + the driver) pin exact
values; these tests pin the ALGEBRAIC invariants a training pipeline
actually relies on, independent of any oracle."""

from __future__ import annotations

import math

from a3_fp_bigdata_spark import registry
from a3_fp_bigdata_spark.operators.packing import (
    NSHARDS,
    PACK_BUDGET,
    SAMPLE_MULT,
    SAMPLE_PREMOD,
    STRATA_DEFAULT_PCT,
    STRATA_PCT,
)
from tests.conftest import SF0001


def test_concat_chunks_is_a_gapless_token_stream(spark):
    """pk1 models one contiguous token stream: walking docs in the
    declared global order (shard, doc_id), each doc starts exactly where
    the previous ended, offsets stay inside the budget, and the chunk
    count is ceil(total/budget)."""
    rows = registry.all_queries()["pk1_concat_chunks"](
        spark, SF0001
    ).collect()
    by_doc = {r.doc_id: r for r in rows}
    order = sorted(by_doc, key=lambda d: (d % NSHARDS, d))
    cum = 0
    for d in order:
        r = by_doc[d]
        assert 0 <= r.chunk_offset < PACK_BUDGET
        assert r.chunk_id == cum // PACK_BUDGET
        assert r.chunk_offset == cum % PACK_BUDGET
        span = (cum + max(r.n_tokens, 1) - 1) // PACK_BUDGET - r.chunk_id + 1
        assert r.n_chunks_spanned == span
        cum += r.n_tokens
    total_chunks = max(r.chunk_id + r.n_chunks_spanned for r in rows)
    assert total_chunks == math.ceil(cum / PACK_BUDGET)


def test_greedy_pack_respects_budget_and_never_splits(spark):
    """pk2: every sequence fits the budget (unless it is a single
    oversize doc), docs are whole (one row each), sequence ids are
    dense per shard, and the assignment equals the greedy walk."""
    rows = registry.all_queries()["pk2_greedy_pack"](spark, SF0001).collect()
    assert len({r.doc_id for r in rows}) == len(rows)  # never split
    seqs: dict[tuple, list] = {}
    for r in rows:
        seqs.setdefault((r.shard, r.seq_id), []).append(r.n_tokens)
    for (shard, seq_id), toks in seqs.items():
        assert sum(toks) <= PACK_BUDGET or len(toks) == 1  # oversize solo
    # dense ids + greedy replay per shard
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        seq, fill = 0, rs[0].n_tokens
        for r, prev in zip(rs[1:], rs):
            if fill + r.n_tokens > PACK_BUDGET:
                seq, fill = seq + 1, r.n_tokens
            else:
                fill += r.n_tokens
            assert r.seq_id == seq, (shard, r.doc_id)
        assert {r.seq_id for r in rs} == set(range(seq + 1))  # dense


def test_stratified_sample_matches_predicate_and_strata(spark):
    """pk3 equals the deterministic per-stratum predicate recomputed in
    plain Python, and the per-language rates genuinely differ."""
    from a3_fp_bigdata_spark.data import table

    docs = {
        r.doc_id: r.lang
        for r in table(spark, SF0001, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    got = {
        r.doc_id
        for r in registry.all_queries()["pk3_stratified_sample"](
            spark, SF0001
        ).collect()
    }
    want = {
        d
        for d, lang in docs.items()
        if ((d % SAMPLE_PREMOD) * SAMPLE_MULT) % 100
        < STRATA_PCT.get(lang, STRATA_DEFAULT_PCT)
    }
    assert got == want
    # rates differ by stratum: en kept at ~50%, tail at ~10%
    n_en = sum(1 for d in docs if docs[d] == "en")
    if n_en >= 40:  # enough mass for a crude rate check
        en_rate = sum(1 for d in got if docs[d] == "en") / n_en
        assert 0.3 < en_rate < 0.7
