"""Sequence packing + stratified sampling — training-batch assembly.

The last mile of an LLM data pipeline: after dedup/quality filtering
(dedup.py, text_analysis.py), documents are packed into fixed-token-
budget training sequences and sampled per-stratum into the final mix.
The reference has nothing like this (its pipeline ends at a serving
table); these operators are the north-star extension surface, built
SQL-first so every one is DuckDB-oracle-checkable.

Two packing disciplines, both real in production:

- ``pk1_concat_chunks`` — GPT-style concat-and-chunk: documents are laid
  end-to-end in a deterministic global order and the token stream is cut
  every BUDGET tokens; documents may span a cut. Pure native SQL.
- ``pk2_greedy_pack`` — no-split packing: each document lands wholly in
  one sequence; a sequence closes when the next document would overflow
  the budget. The running-fill state machine is not a window function,
  so it runs as an Arrow ``applyInPandas`` per shard — the oracle
  reproduces it with a recursive CTE.

Scale design: both are SHARDED. A naive global cumsum would be an
unpartitioned window (single task at 100 TB). Instead docs hash into
NSHARDS independent shards (deterministic ``doc_id % NSHARDS`` so the
oracle can mirror it); pk1 restores an exact GLOBAL stream order with
the classic two-pass prefix sum — per-shard cumsum (parallel window) +
a broadcast join of the 32-row shard-prefix table; pk2 packs each shard
independently (sequences never cross shards — at training time shards
are just more files). Nothing funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import (
    read_stamped_scratch,
    run_scratch,
    table_fingerprint,
    table,
)
from a3_fp_bigdata_spark.functions import text as TX
from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql
from a3_fp_bigdata_spark.operators.text_analysis import (
    SAMPLE_MULT,
    SAMPLE_PREMOD,
    _SQL_TOKS as _SQL_TOKS_REF,  # DuckDB twin of TX.tokens — keep in sync
    sample_predicate,
    sample_predicate_sql,
)
from a3_fp_bigdata_spark.pickling import ship_by_value
from a3_fp_bigdata_spark.registry import query

ship_by_value(__name__)  # Arrow closures must not need repo on sys.path

#: Token budget per training sequence. Small relative to real 2k-8k
#: contexts because the synthetic docs are 10-99 tokens; the algebra is
#: budget-independent.
PACK_BUDGET = 256
#: Shard count — the parallelism AND memory granularity of the packing
#: stage. pk2's applyInPandas hands each shard to Python as ONE pandas
#: frame of (doc_id, shard, cost) rows (~24 B/doc — never the text), so
#: size shards for executor memory, not just cores: at 2e10 docs keep
#: shards under ~1e7 docs each -> NSHARDS ~2000, still trivially
#: parallel. 32 matches the local test harness; doc_id % N keeps the
#: assignment engine-portable for the oracle.
NSHARDS = 32

#: DuckDB rendering of TX.bpe_ish_token_count — keep in sync with
#: functions/text.py:104 (tx3's oracle uses the same snippet).
def _sql_cost(expr: str) -> str:
    return rf"len(regexp_extract_all(lower({expr}), '[a-z]+|[0-9]+|[^a-z0-9\s]'))"


_SQL_COST = _sql_cost("text")


def _sharded_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, cost) — the packing input. cost is the BPE-ish
    token count (tx3's cost model), computed scan-side (native regexp,
    no Python)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        (F.col("doc_id") % NSHARDS).alias("shard"),
        TX.bpe_ish_token_count(F.col("text")).cast("long").alias("cost"),
    )


@query(
    "pk1_concat_chunks",
    oracle=f"""
    WITH costs AS (
      SELECT doc_id, doc_id % {NSHARDS} AS shard,
             CAST({_SQL_COST} AS BIGINT) AS cost
      FROM documents
    ), cum AS (
      SELECT doc_id, cost,
             COALESCE(SUM(cost) OVER (ORDER BY shard, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before
      FROM costs
    )
    SELECT doc_id, cost AS n_tokens,
           -- `//` (floor div), NEVER `/` + CAST: DuckDB integer `/` is
           -- float division and CAST(double AS BIGINT) ROUNDS half-up,
           -- which shifted every chunk_id with fraction >= .5 by one
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS chunk_id,
           CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS chunk_offset,
           CAST((cum_before + GREATEST(cost, 1) - 1) // {PACK_BUDGET}
                - cum_before // {PACK_BUDGET} + 1 AS BIGINT)
             AS n_chunks_spanned
    FROM cum
    """,
)
def pk1_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing map: where each document's tokens land
    when the corpus token stream (global order: shard, then doc_id) is
    cut every PACK_BUDGET tokens.

    The global cumulative sum is computed WITHOUT a global window:
    per-shard cumsum (one parallel window over the shard hash-shuffle)
    plus each shard's total-prefix offset, a 32-row aggregate joined
    back by broadcast. Two shuffles total, both on the shard key; at
    1000 executors every shard packs independently."""
    costs = _sharded_costs(spark, sf_dir)
    w_local = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = costs.withColumn(
        "local_before", F.sum("cost").over(w_local) - F.col("cost")
    )
    # 32-row shard totals -> exclusive prefix. The global window here is
    # fine: it runs on the AGGREGATED frame (NSHARDS rows), the same
    # shape as a6's rank-over-aggregate.
    w_prefix = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = (
        costs.groupBy("shard")
        .agg(F.sum("cost").alias("shard_total"))
        .select(
            "shard",
            F.coalesce(F.sum("shard_total").over(w_prefix), F.lit(0)).alias(
                "shard_prefix"
            ),
        )
    )
    g = local.join(F.broadcast(prefixes), "shard").withColumn(
        "cum_before", F.col("shard_prefix") + F.col("local_before")
    )
    b = F.lit(PACK_BUDGET)
    # `div`, not `/`+cast: float division is exact only while cum_before
    # < 2^53 — a 100 TB corpus's global token cumsum approaches that.
    # `div` keeps the math in int64 end to end (the oracle's `//` twin).
    first_chunk = F.expr(f"cum_before div {PACK_BUDGET}")
    last_chunk = F.expr(
        f"(cum_before + greatest(cost, 1L) - 1L) div {PACK_BUDGET}"
    )
    return g.select(
        "doc_id",
        F.col("cost").alias("n_tokens"),
        first_chunk.alias("chunk_id"),
        (F.col("cum_before") % b).alias("chunk_offset"),
        (last_chunk - first_chunk + 1).alias("n_chunks_spanned"),
    )


#: pk2's recursive replay of the greedy fill walk, shared verbatim by
#: pk2's oracle and pk14's (so the two can never drift apart).
_PK2_STEP_CTES = f"""costs AS (
      SELECT doc_id, doc_id % {NSHARDS} AS shard,
             CAST({_SQL_COST} AS BIGINT) AS cost,
             row_number() OVER (PARTITION BY doc_id % {NSHARDS}
                                ORDER BY doc_id) AS rn
      FROM documents
    ), step AS (
      SELECT shard, rn, doc_id, cost,
             CAST(0 AS BIGINT) AS seq_id, cost AS fill
      FROM costs WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.doc_id, d.cost,
             CASE WHEN s.fill + d.cost > {PACK_BUDGET}
                  THEN s.seq_id + 1 ELSE s.seq_id END,
             CASE WHEN s.fill + d.cost > {PACK_BUDGET}
                  THEN d.cost ELSE s.fill + d.cost END
      FROM step s JOIN costs d ON d.shard = s.shard AND d.rn = s.rn + 1
    )"""


@query(
    "pk2_greedy_pack",
    oracle=f"""
    WITH RECURSIVE {_PK2_STEP_CTES}
    SELECT doc_id, CAST(shard AS BIGINT) AS shard, seq_id,
           cost AS n_tokens
    FROM step
    """,
)
def pk2_greedy_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split greedy packing: walk each shard's docs in doc_id order,
    close the current sequence when the next doc would overflow
    PACK_BUDGET (an oversize doc gets a sequence of its own). Sequence
    keys are (shard, seq_id) — globally unique without coordination.

    The fill state machine needs sequential state per shard, which no
    window frame expresses, so it runs as ONE Arrow batch per shard
    group (`applyInPandas`) — the canonical custom-operator escape
    hatch. Python touches (doc_id, cost) pairs only, never text: the
    crossing is O(docs), not O(bytes). The oracle replays the identical
    walk with a recursive CTE."""
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, fill = 0, 0
        first = True
        for cost in pdf["cost"]:
            if first:
                fill = cost
                first = False
            elif fill + cost > PACK_BUDGET:
                seq += 1
                fill = cost
            else:
                fill += cost
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[["doc_id", "shard", "seq_id", "cost"]]

    out = (
        _sharded_costs(spark, sf_dir)
        .groupBy("shard")
        .applyInPandas(
            pack, schema="doc_id long, shard long, seq_id long, cost long"
        )
    )
    return out.select(
        "doc_id", "shard", "seq_id", F.col("cost").alias("n_tokens")
    )


@query(
    "pk14_pack_efficiency",
    oracle=f"""
    WITH RECURSIVE {_PK2_STEP_CTES}, seqs AS (
      SELECT shard, seq_id, count(*) AS n_docs, sum(cost) AS fill
      FROM step GROUP BY 1, 2
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           count(*) AS n_seqs,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(fill) AS BIGINT) AS total_tokens,
           CAST(min(fill) AS BIGINT) AS min_fill,
           CAST(max(fill) AS BIGINT) AS max_fill,
           count(*) FILTER (WHERE fill > {PACK_BUDGET}) AS n_oversize,
           {half_up_sql(
               f'CAST(sum(fill) AS DOUBLE)'
               f' / (count(*) * {PACK_BUDGET})'
           )} AS utilization
    FROM seqs GROUP BY shard
    """,
)
def pk14_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-efficiency audit of pk2's greedy fill — the dashboard a
    training-data team watches before paying for a run: per shard, how
    many sequences the packer produced, min/max fill, how many
    OVERSIZE singleton sequences (doc alone > PACK_BUDGET, which the
    trainer must truncate), and the utilization ratio (tokens packed /
    capacity bought). A packer regression (fill state leaking across
    shards, off-by-one on the overflow test) moves these numbers
    before anyone reads loss curves.

    Oracle replays pk2's walk via the SHARED recursive CTE
    (_PK2_STEP_CTES — string-identical to pk2's oracle, so the audit
    and the operator can't drift) and aggregates independently. All
    integer math until the final utilization divide, whose operands
    are exact int64s on both engines — bit-identical before rounding.

    Scale: two map-side-combinable aggregations over pk2's output,
    both keyed by shard (the SAME key pk2's applyInPandas grouped
    by, so AQE coalesces the second exchange to a near-no-op); output
    is NSHARDS rows."""
    packed = pk2_greedy_pack(spark, sf_dir)
    seqs = packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("fill"),
    )
    return seqs.groupBy("shard").agg(
        F.count("*").alias("n_seqs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("fill").alias("total_tokens"),
        F.min("fill").alias("min_fill"),
        F.max("fill").alias("max_fill"),
        F.count(
            F.when(F.col("fill") > PACK_BUDGET, F.lit(1))
        ).alias("n_oversize"),
        half_up(
            F.sum("fill").cast("double")
            / (F.count("*") * F.lit(PACK_BUDGET))
        ).alias("utilization"),
    )


def _lang_case_sql(mapping: dict[str, int], default: int) -> str:
    """A per-lang integer schedule as a DuckDB CASE snippet — the SQL
    twin of _lang_case_col over the SAME dict, so a config change can
    never drift between the Spark plan and its oracle."""
    return (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in mapping.items())
        + f" ELSE {default} END"
    )


def _lang_case_col(mapping: dict[str, int], default: int) -> Column:
    """The Spark CASE column twin of _lang_case_sql."""
    col = F.lit(default)
    for lang, val in mapping.items():
        col = F.when(F.col("lang") == lang, F.lit(val)).otherwise(col)
    return col


#: Per-language sampling rates (percent) for the training mix — the
#: deterministic stand-in for a curation config.
STRATA_PCT = {"en": 50, "de": 20}
STRATA_DEFAULT_PCT = 10


@query(
    "pk3_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE ((doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT}) % 100 <
          {_lang_case_sql(STRATA_PCT, STRATA_DEFAULT_PCT)}
    """,
)
def pk3_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling: tx6's deterministic multiplicative-
    hash sample with a per-language rate (upsample en, downsample the
    tail) — how a training mix reweights sources without a shuffle: the
    predicate is scan-pushable and rows never move."""
    docs = table(spark, sf_dir, "documents")
    rate = _lang_case_col(STRATA_PCT, STRATA_DEFAULT_PCT)
    return docs.filter(sample_predicate(F.col("doc_id"), rate)).select(
        "doc_id", "lang", "source"
    )


#: Validation holdout percent for the deterministic split.
VAL_PCT = 5


@query(
    "pk4_train_val_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN ((doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT}) % 100
                     < {VAL_PCT}
                THEN 'val' ELSE 'train' END AS split
    FROM documents
    """,
)
def pk4_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation split: the multiplicative-hash
    percentile assigns each doc to exactly one side — disjoint and
    exhaustive by construction, stable across runs/machines/engines
    (no RNG, no state), and computable at scan time so downstream
    filters (`split = 'train'`) push down to the parquet scan. The
    same idiom extends to k-fold (bucket = hash % k)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(
            sample_predicate(F.col("doc_id"), VAL_PCT), F.lit("val")
        ).otherwise(F.lit("train")).alias("split"),
    )


#: Target mixture shares (percent, summing to 100 over the known langs)
#: for pk5 — the curation config a mixing run is handed. Langs absent
#: from the map fall back to MIX_DEFAULT_PCT.
MIX_PCT = {"en": 40, "zh": 15, "es": 15, "de": 15, "fr": 15}
MIX_DEFAULT_PCT = 5


@query(
    "pk5_domain_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ), t AS (
      SELECT lang, n_docs,
             {_lang_case_sql(MIX_PCT, MIX_DEFAULT_PCT)} AS target_pct
      FROM counts
    ), s AS (
      SELECT MIN(n_docs * 100 // target_pct) AS mix_size FROM t
    ), rates AS (
      SELECT lang,
             LEAST(target_pct * (SELECT mix_size FROM s) // n_docs, 100)
               AS keep_pct
      FROM t
    )
    SELECT d.doc_id, d.lang, r.keep_pct
    FROM documents d JOIN rates r USING (lang)
    WHERE ((d.doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT}) % 100
          < r.keep_pct
    """,
)
def pk5_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-derived mixture reweighting: hit TARGET domain shares
    (MIX_PCT) by downsampling every domain against the scarcest one —
    unlike pk3, the per-domain keep rates are computed FROM the corpus,
    not hard-coded. The scarcest domain (the one whose count supports
    the smallest mixture) caps the total sampled size S = min_l(n_l *
    100 / T_l); each domain then keeps T_l * S / n_l percent of its
    docs via the deterministic multiplicative-hash predicate.

    When langs OUTSIDE the config appear, their MIX_DEFAULT_PCT shares
    stack on top of the configured 100, and every realized share
    implicitly renormalizes to T_l / sum(T): e.g. with 4 unknown langs
    the 'en' slice lands at 40/120 = 33% of the sample, not 40% —
    deliberate (new domains dilute proportionally rather than silently
    eating a configured domain's budget).

    All the mixture math stays in int64 floor division in BOTH engines
    (`div` / `//`) so the rates — and therefore membership — are
    bit-identical across Spark and the oracle; at web scale (n_l ~ 1e10,
    T_l <= 100) the products stay far below 2^63.

    Scale shape: the ONLY shuffle is the per-lang count (map-side
    combined, |langs| rows); the rate table is a broadcast join back
    onto the corpus and the final predicate evaluates scan-side — doc
    rows never move. Upsampling (epochs > 1) is deliberately pk6's job.
    """
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    targets = counts.withColumn(
        "target_pct", _lang_case_col(MIX_PCT, MIX_DEFAULT_PCT)
    )
    mix_size = targets.agg(
        F.min(F.expr("n_docs * 100 div target_pct")).alias("mix_size")
    )
    rates = targets.crossJoin(F.broadcast(mix_size)).select(
        "lang",
        F.least(
            F.expr("target_pct * mix_size div n_docs"), F.lit(100).cast("long")
        ).alias("keep_pct"),
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(sample_predicate(F.col("doc_id"), F.col("keep_pct")))
        .select("doc_id", "lang", "keep_pct")
    )


#: Per-language repetition schedule for pk6, in CENTI-epochs (250 =
#: 2.5 epochs: every doc twice, half the docs a third time). Scarce
#: langs repeat; the dominant web slice takes a fractional epoch.
EPOCHS_CPCT = {"en": 50, "zh": 200, "es": 150, "de": 125, "fr": 300}
EPOCHS_DEFAULT_CPCT = 100


@query(
    "pk6_epoch_plan",
    oracle=f"""
    WITH e AS (
      SELECT doc_id, lang,
             {_lang_case_sql(EPOCHS_CPCT, EPOCHS_DEFAULT_CPCT)}
               AS epochs_cpct
      FROM documents
    ), n AS (
      SELECT doc_id, lang,
             epochs_cpct // 100
             + CASE WHEN ((doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT})
                         % 100 < epochs_cpct % 100
                    THEN 1 ELSE 0 END AS n_epochs
      FROM e
    )
    SELECT doc_id, lang, CAST(u.epoch AS BIGINT) AS epoch
    FROM n, UNNEST(generate_series(1, n_epochs)) AS u(epoch)
    WHERE n_epochs >= 1
    """,
)
def pk6_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch repetition plan: materialize (doc_id, epoch) rows
    from a per-domain epoch schedule (EPOCHS_CPCT, in centi-epochs) —
    how a training run upsamples scarce high-value domains (fr x3)
    while taking only a fraction of the dominant one (en x0.5).
    Fractional epochs use the same deterministic hash predicate as
    pk3/pk4, so WHICH docs join the extra epoch is stable across
    runs and engines, and the fractional-epoch subset of epoch k+1 is
    always a prefix-free subset of epoch k's docs (same membership
    test, no reshuffling between engines).

    Scale shape: zero shuffles — the schedule lookup is a literal CASE,
    the epoch count is row-local arithmetic, and the repetition is a
    narrow `explode(sequence(...))` (rows amplify in place, no
    exchange). Spark's `sequence(1, 0)` would generate a DESCENDING
    [1, 0] rather than an empty array, so docs with n_epochs = 0 (a
    fractional-only schedule missing the cut) are filtered out BEFORE
    the explode."""
    docs = table(spark, sf_dir, "documents")
    epochs_cpct = _lang_case_col(EPOCHS_CPCT, EPOCHS_DEFAULT_CPCT)
    n_epochs = (
        F.expr("epochs_cpct div 100")
        + F.when(
            sample_predicate(F.col("doc_id"), F.col("epochs_cpct") % 100),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("long")
    return (
        docs.select("doc_id", "lang", epochs_cpct.alias("epochs_cpct"))
        .withColumn("n_epochs", n_epochs)
        .filter(F.col("n_epochs") >= 1)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_epochs"))
            ).alias("epoch"),
        )
    )


#: Sliding-window chunking: CHUNK_SIZE tokens per chunk, CHUNK_STRIDE
#: tokens between chunk starts (overlap = SIZE - STRIDE). Production
#: RAG/context-window prep runs ~512/384; these are scaled to the
#: synthetic corpus' ~55-token docs so multi-chunk docs actually occur.
CHUNK_SIZE = 32
CHUNK_STRIDE = 24


# pk8's chunk derivation as a reusable oracle fragment — pl2's index
# pipeline builds on the same chunks, so both oracles share ONE
# definition of the chunk boundaries.
_PK8_CTES = f"""t AS (
      SELECT doc_id, {_SQL_TOKS_REF} AS w FROM documents
    ), c AS (
      SELECT doc_id, w,
             unnest(range(0, CASE WHEN len(w) = 0 THEN 0
                  ELSE 1 + (greatest(len(w) - {CHUNK_SIZE}, 0)
                            + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}
                  END)) AS chunk_idx
      FROM t
    ), chunks AS (
      SELECT doc_id, chunk_idx,
             CAST(len(list_slice(w, chunk_idx * {CHUNK_STRIDE} + 1,
                  least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, len(w))))
                  AS INT) AS n_tokens,
             array_to_string(
               list_slice(w, chunk_idx * {CHUNK_STRIDE} + 1,
                  least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, len(w))),
               ' ') AS chunk_text
      FROM c
    )"""


@query(
    "pk8_sliding_chunks",
    oracle=f"""
    WITH {_PK8_CTES}
    SELECT doc_id, chunk_idx, n_tokens, chunk_text FROM chunks
    """,
)
def pk8_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the RAG-indexing / context-
    window prep op: each doc becomes overlapping {CHUNK_SIZE}-token
    chunks whose starts advance by {CHUNK_STRIDE} (chunk count =
    1 + ceil(max(n - size, 0) / stride), so the final chunk always
    reaches the document end and no chunk is wholly contained in its
    predecessor). Output keys (doc_id, chunk_idx) are the downstream
    embedding/indexing keys.

    Scale: pure per-row algebra — tokenize, integer chunk-count,
    explode(sequence), slice — zero shuffles, zero Python; the row
    amplification (~n/stride per doc) happens in a narrow Generate
    inside the scan stage, exactly how a 100 TB corpus wants to fan
    out to its embedding pass. Chunk boundaries are deterministic
    integer arithmetic, so re-runs (and engines) agree."""
    return sliding_chunk_frame(table(spark, sf_dir, "documents"))


def sliding_chunk_frame(docs: DataFrame) -> DataFrame:
    """pk8's chunk derivation from an arbitrary documents frame — the
    streaming chunk-index sink (streaming/chunk_index.py) runs the
    same derivation per micro-batch."""
    nw = F.size(F.col("_w"))
    last_idx = F.expr(
        f"(greatest(size(_w) - {CHUNK_SIZE}, 0) + {CHUNK_STRIDE - 1})"
        f" div {CHUNK_STRIDE}"
    )
    # empty token list -> null sequence -> explode drops the doc
    # (a bare sequence(0, -1) would DESCEND and emit phantom chunks)
    idx_seq = F.when(
        nw > 0,
        F.sequence(F.lit(0).cast("long"), last_idx.cast("long")),
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE
    length = F.least(start + F.lit(CHUNK_SIZE), nw) - start
    chunk = F.slice(F.col("_w"), start + 1, length)
    return (
        docs.select("doc_id", TX.tokens(F.col("text")).alias("_w"))
        .select("doc_id", "_w", F.explode(idx_seq).alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@query("pk9_weighted_sample", oracle=None)  # attached below (quality CTEs)
def pk9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling: keep each document with
    probability proportional to its tx2 quality score (keep_rate =
    nearest-percent of quality, floored at 1, decided by the
    deterministic multiplicative-hash percentile — auditable,
    re-runnable, engine-stable), and emit the inverse-probability
    weight 100/keep_rate so downstream statistics over the sample stay
    UNBIASED (Horvitz-Thompson — sound because the rate FLOOR of 1
    gives every document, however low its quality, a nonzero inclusion
    probability; a zero-rate class would make full-corpus estimates
    biased no matter the weights). The data-selection rung between
    pk3's fixed strata rates and a learned selection model: better
    text is kept more often, and the weight column undoes the tilt
    where unbiased aggregates are needed.

    Determinism across engines: every rounding step is the shared
    half-up form (functions.rounding — identical f64 arithmetic
    rendered for both engines): quality stabilizes through
    half_up(q, 4), then the percent is floor(x*100 + 0.5) — avoiding
    BOTH Spark-vs-DuckDB native-round divergence AND the double-
    representation cliff where floor(0.57*100) lands on 56 because
    0.57*100 is 56.999…997 as a double. Kept rows always have
    keep_rate >= 1, so the weight never divides by zero.

    Scale: quality is scan-side column algebra (tx2), the predicate is
    scan-time integer arithmetic — ZERO shuffles, rows never move;
    the same form extends to any per-doc score (perplexity, tx13's
    logprob) by swapping the rate expression."""
    docs = table(spark, sf_dir, "documents")
    rate = F.greatest(
        F.lit(1),
        F.floor(
            half_up(TX.quality_score(F.col("text"))) * 100 + F.lit(0.5)
        ).cast("int"),
    )
    d = docs.select("doc_id", rate.alias("keep_rate"))
    kept = d.filter(sample_predicate(F.col("doc_id"), F.col("keep_rate")))
    return kept.select(
        "doc_id",
        "keep_rate",
        half_up(F.lit(100.0) / F.col("keep_rate")).alias("inv_weight"),
    )


def _pk9_oracle() -> str:
    from a3_fp_bigdata_spark.operators.text_analysis import (
        _SQL_QUALITY_CTES,
    )

    return f"""
    WITH {_SQL_QUALITY_CTES}, rated AS (
      SELECT doc_id,
             greatest(1, CAST(floor({half_up_sql('quality')} * 100 + 0.5)
                              AS INT)) AS keep_rate
      FROM quality
    )
    SELECT doc_id, keep_rate,
           {half_up_sql('100.0 / keep_rate')} AS inv_weight
    FROM rated
    WHERE ((doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT}) % 100 < keep_rate
    """


#: pl2's portable chunk featurization: dim d counts the chunk tokens
#: whose first character falls in group d (7 letter bands + a
#: digits-and-tail band) — a crude but fully engine-portable
#: bag-of-prefix projection standing in for a learned embedding (the
#: production swap is a Pandas-UDF encoder; the pipeline shape, and
#: everything downstream of the vector, is identical).
_FEAT_GROUPS = [
    ("a", "c"), ("d", "f"), ("g", "i"), ("j", "l"),
    ("m", "o"), ("p", "r"), ("s", "u"),
]  # + the v-z/digit tail handled specially as dim 7

#: Zero-sum integer hyperplanes over the 8 feature dims: the LSH bit
#: is sign(P[b] . v). Zero-sum rows keep all-positive count vectors
#: from collapsing into one bucket; integer dots are exact in both
#: engines, so bucket ids match bit-for-bit.
_PLANES = [
    [1, -1, 1, -1, 1, -1, 1, -1],
    [1, 1, -1, -1, 1, 1, -1, -1],
    [1, 1, 1, 1, -1, -1, -1, -1],
    [2, -1, -1, 2, -1, -1, 1, -1],
]


def _pl2_oracle() -> str:
    feats = [
        f"CAST(len(list_filter(toks, x -> x[1] BETWEEN '{lo}' AND '{hi}'))"
        " AS BIGINT)"
        for lo, hi in _FEAT_GROUPS
    ]
    feats.append(
        "CAST(len(list_filter(toks, x -> x[1] >= 'v'"
        " OR x[1] BETWEEN '0' AND '9')) AS BIGINT)"
    )
    dots = [
        " + ".join(f"({c}) * v[{d + 1}]" for d, c in enumerate(row) if c)
        for row in _PLANES
    ]
    bucket = " + ".join(
        f"(CASE WHEN {dot} > 0 THEN {1 << b} ELSE 0 END)"
        for b, dot in enumerate(dots)
    )
    return f"""
    WITH {_PK8_CTES}, w2 AS (
      SELECT doc_id, string_split(chunk_text, ' ') AS toks FROM chunks
    ), feat AS (
      SELECT doc_id, [{', '.join(feats)}] AS v FROM w2
    ), bucketed AS (
      SELECT doc_id, CAST({bucket} AS BIGINT) AS bucket FROM feat
    )
    SELECT bucket, count(*) AS n_chunks,
           count(DISTINCT doc_id) AS n_docs
    FROM bucketed GROUP BY bucket
    """


@query("pl2_chunk_index_stats", oracle=None)  # attached below (pk8 CTEs)
def pl2_chunk_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG ingest pipeline composed end-to-end: pk8's sliding chunks ->
    per-chunk feature vector (bag-of-prefix counts — the portable
    stand-in for an embedding encoder; production swaps an Arrow
    Pandas-UDF model here and NOTHING else changes) -> random-
    hyperplane LSH bucket (integer zero-sum planes, exact in any
    engine) -> per-bucket occupancy (chunks, distinct docs). The
    occupancy table is what an index build publishes: hot buckets
    predict probe fan-in (sim4's partition-pruned serving path) and
    feed the super-bucket capping decision the dedup ladder already
    applies.

    Scale: chunking and featurization are zero-shuffle scan algebra
    (pk8's Generate + fixed-width integer dots); the ONLY corpus
    shuffle is the final bucket aggregation, keyed on a {1 << len(_PLANES)}-value
    int — partial aggregation collapses it map-side, so the exchange
    carries at most buckets x partitions rows. The distinct-doc count
    is exact per bucket; at extreme cardinality swap
    approx_count_distinct and drop the oracle to tolerance."""
    bucketed = chunk_bucket_frame(
        sliding_chunk_frame(table(spark, sf_dir, "documents"))
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_chunks"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def chunk_bucket_frame(chunks: DataFrame) -> DataFrame:
    """(doc_id, bucket) per chunk: pl2's featurize + LSH-bucket stage
    from an arbitrary chunk frame — shared with the streaming index
    sink (streaming/chunk_index.py), so batch and stream can never
    disagree on the bucketing."""
    toks = F.split(F.col("chunk_text"), " ")

    def first_char(x: Column) -> Column:
        return x.substr(1, 1)

    def band(lo: str, hi: str):
        # Spark derives lambda arity from the Python signature, so the
        # band bounds close over a factory instead of default args
        return lambda x: (first_char(x) >= lo) & (first_char(x) <= hi)

    feat_cols = [
        F.size(F.filter(toks, band(lo, hi))).cast("long")
        for lo, hi in _FEAT_GROUPS
    ]
    feat_cols.append(
        F.size(
            F.filter(
                toks,
                lambda x: (first_char(x) >= "v")
                | ((first_char(x) >= "0") & (first_char(x) <= "9")),
            )
        ).cast("long")
    )
    v = F.array(*feat_cols)
    dots = [
        sum(
            (F.element_at(F.col("v"), d + 1) * F.lit(c))
            for d, c in enumerate(row)
            if c
        )
        for row in _PLANES
    ]
    bucket = sum(
        F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b, dot in enumerate(dots)
    ).cast("long")
    return chunks.select("doc_id", v.alias("v")).select(
        "doc_id", bucket.alias("bucket")
    )


def _pk7_oracle() -> str:
    from a3_fp_bigdata_spark.operators.dedup import _D3_CTES, _D3_SELECT

    is_val_a = f"(({sample_predicate_sql('doc_a', VAL_PCT)}))"
    is_val_b = f"(({sample_predicate_sql('doc_b', VAL_PCT)}))"
    return f"""
    WITH {_D3_CTES},
    pairs AS ({_D3_SELECT})
    SELECT CASE WHEN {is_val_a} THEN doc_b ELSE doc_a END AS train_doc,
           CASE WHEN {is_val_a} THEN doc_a ELSE doc_b END AS val_doc,
           jaccard
    FROM pairs
    WHERE {is_val_a} <> {is_val_b}
    """


@query("pk7_split_leakage", oracle=None)  # oracle attached below (d3 CTEs)
def pk7_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: near-duplicate document pairs
    (d3's exact n-gram Jaccard ground truth) that land on OPPOSITE
    sides of pk4's train/validation split — each pair leaks training
    text into the eval set and silently inflates validation scores.
    Output: (train_doc, val_doc, jaccard); the downstream fix
    anti-joins the val side on val_doc. The split predicate is pk4's
    hash verbatim (imported constants, not a re-derivation), so the
    audit can never disagree with the split it audits; exact-duplicate
    leakage is the degenerate jaccard=1.0 row of the same table.

    Scale: the pair table is the expensive part and it is d3's —
    production swaps in d4's MinHash candidates (same pair schema, no
    quadratic term) while this registered form keeps the exact rung so
    the oracle stays closed-form. The split test itself adds zero
    shuffle: both predicates are scan-time arithmetic on the pair's
    ids. Run nightly AFTER dedup-then-split pipelines too: d13 dedups
    within a snapshot, but near-dups re-enter via incremental appends
    (d10), so the audit re-runs per snapshot."""
    from a3_fp_bigdata_spark.operators.dedup import d3_ngram_jaccard

    pairs = d3_ngram_jaccard(spark, sf_dir)
    val_a = sample_predicate(F.col("doc_a"), VAL_PCT)
    val_b = sample_predicate(F.col("doc_b"), VAL_PCT)
    return pairs.filter(val_a != val_b).select(
        F.when(val_a, F.col("doc_b")).otherwise(F.col("doc_a"))
        .alias("train_doc"),
        F.when(val_a, F.col("doc_a")).otherwise(F.col("doc_b"))
        .alias("val_doc"),
        "jaccard",
    )


#: Quality floor for the end-to-end manifest (matches tx5's curation
#: threshold); compared on round(quality, 4) in BOTH engines so the cut
#: never depends on sub-ulp double agreement.
MANIFEST_MIN_QUALITY = 0.5


@query(
    "pl1_training_manifest",
    oracle=None,  # assembled below from dedup + text_analysis CTEs
)
def pl1_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one declarative query — the
    engine's end-to-end flagship for training-data assembly:

        documents
          -> quality floor (tx2 score >= 0.5)
          -> drop near-dup losers (d12 clusters, d14 argmax-quality
             keeper policy)
          -> greedy no-split packing (pk2 state machine per shard)
          -> per-sequence manifest (n_docs, seq_tokens)

    Every stage is the already-oracled operator, composed; the oracle
    replays the identical chain in DuckDB (recursive-CTE components +
    quality CTEs + recursive greedy walk). Scale: the only Python
    crossing is pk2's (doc_id, cost) packer; everything upstream is
    scans, hash joins and one tiny cluster window. The drop-set
    broadcast is size-guarded (dedup._maybe_broadcast_drop): forced
    only while the cluster table is provably small, shuffled anti-join
    otherwise — web-corpus dup rates make the drop set unbroadcastable."""
    import pandas as pd

    from a3_fp_bigdata_spark.functions import text as TXF
    from a3_fp_bigdata_spark.operators.dedup import (
        _cluster_member_count,
        _maybe_broadcast_drop,
        d12_dedup_clusters,
    )

    docs = table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", half_up(TXF.quality_score(F.col("text"))).alias("q")
    )
    clusters = d12_dedup_clusters(spark, sf_dir)
    ranked = clusters.join(q, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.desc("q"), F.asc("doc_id")
            )
        ),
    )
    dropped = ranked.filter(F.col("rn") > 1).select("doc_id")
    kept = (
        _sharded_costs(spark, sf_dir)
        .join(q, "doc_id")
        .filter(F.col("q") >= MANIFEST_MIN_QUALITY)
        .join(
            _maybe_broadcast_drop(
                dropped, _cluster_member_count(spark, sf_dir)
            ),
            "doc_id",
            "left_anti",
        )
        .select("doc_id", "shard", "cost")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, fill, first = 0, 0, True
        for cost in pdf["cost"]:
            if first:
                fill, first = cost, False
            elif fill + cost > PACK_BUDGET:
                seq, fill = seq + 1, cost
            else:
                fill += cost
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[["doc_id", "shard", "seq_id", "cost"]]

    packed = kept.groupBy("shard").applyInPandas(
        pack, schema="doc_id long, shard long, seq_id long, cost long"
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("cost").cast("bigint").alias("seq_tokens"),
    )


def _pl1_oracle() -> str:
    from a3_fp_bigdata_spark.operators.dedup import _D3_CTES, _D3_SELECT
    from a3_fp_bigdata_spark.operators.text_analysis import _SQL_QUALITY_CTES

    return f"""
    WITH RECURSIVE {_D3_CTES}, pairs AS (
      {_D3_SELECT}
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), reach(doc, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc = e.dst
    ), clusters AS (
      SELECT doc, min(lab) AS cluster_id FROM reach GROUP BY doc
    ), {_SQL_QUALITY_CTES}, ranked AS (
      SELECT c.doc,
             row_number() OVER (PARTITION BY c.cluster_id
                                -- division-free: ordering by the
                                -- floor numerator equals ordering by
                                -- half_up (positive constant divisor)
                                ORDER BY floor(q.quality * 10000 + 0.5)
                                         DESC, c.doc)
               AS rn
      FROM clusters c JOIN quality q ON q.doc_id = c.doc
    ), dropped AS (
      SELECT doc FROM ranked WHERE rn > 1
    ), kept AS (
      SELECT d.doc_id, d.doc_id % {NSHARDS} AS shard,
             CAST({_SQL_COST} AS BIGINT) AS cost,
             row_number() OVER (PARTITION BY d.doc_id % {NSHARDS}
                                ORDER BY d.doc_id) AS rn
      FROM documents d JOIN quality q ON q.doc_id = d.doc_id
      WHERE {half_up_sql('q.quality')} >= {MANIFEST_MIN_QUALITY}
        AND d.doc_id NOT IN (SELECT doc FROM dropped)
    ), step AS (
      SELECT shard, rn, doc_id, cost,
             CAST(0 AS BIGINT) AS seq_id, cost AS fill
      FROM kept WHERE rn = 1
      UNION ALL
      SELECT k.shard, k.rn, k.doc_id, k.cost,
             CASE WHEN s.fill + k.cost > {PACK_BUDGET}
                  THEN s.seq_id + 1 ELSE s.seq_id END,
             CASE WHEN s.fill + k.cost > {PACK_BUDGET}
                  THEN k.cost ELSE s.fill + k.cost END
      FROM step s JOIN kept k ON k.shard = s.shard AND k.rn = s.rn + 1
    )
    SELECT CAST(shard AS BIGINT) AS shard, seq_id,
           count(*) AS n_docs, CAST(sum(cost) AS BIGINT) AS seq_tokens
    FROM step GROUP BY shard, seq_id
    """


@query(
    "pk10_interleave_schedule",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rank_in_source
      FROM documents
    )
    SELECT doc_id, source, CAST(rank_in_source AS BIGINT) AS rank_in_source,
           CAST(row_number() OVER (
             ORDER BY rank_in_source, source, doc_id) AS BIGINT)
             AS global_pos
    FROM ranked
    """,
)
def pk10_interleave_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-interleaved training order (anti-clustering): rank docs
    within each source, then order globally by (rank, source) — a
    round-robin over domains, so consecutive training positions cycle
    through sources instead of streaming one domain's docs back to
    back (the batch-composition failure mode that makes gradient
    noise domain-correlated). Deterministic total order both engines
    share; downstream, pk1/pk2 consume this order instead of raw
    doc_id.

    Scale: one window per source partition (hash-partitioned by
    source) + the global position via the suffix family's two-pass
    rank (r15 — guide §2.5: this was the engine's last corpus-sized
    single-partition window; range shards + per-partition row_number
    + a broadcast <= SA_RERANK_PARTS-row offset prefix replace the
    one-task global sort, values identical because the key triple is
    a total order). At 100 TB a pipeline can also keep
    (rank_in_source, source) as a SORT KEY and let the writer
    range-partition on it — global_pos stays derivable from the key
    alone."""
    from a3_fp_bigdata_spark.operators.suffixes import _two_pass_rank

    docs = table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w_src).cast("long").alias("rank_in_source"),
    )
    return _two_pass_rank(
        ranked, ["rank_in_source", "source", "doc_id"], dense=False
    ).select(
        "doc_id",
        "source",
        "rank_in_source",
        F.col("rnk").cast("long").alias("global_pos"),
    )


#: pl3's canonical row rendering must be INJECTIVE for ARBITRARY cell
#: content (document text is raw, so no byte is "reserved"): each field
#: renders as a netstring-style tagged token — 'N' for NULL, else
#: 'V' || char_length(s) || ':' || s — so a value containing the join
#: separator (or any sentinel) cannot re-parse as a different row. A
#: left-to-right parser recovers the fields unambiguously: read the
#: tag; on 'V' read digits to ':', consume exactly that many chars,
#: expect the separator. The \x1f join stays purely for readability.
_CK_SEP = "\x1f"


def _row_digest(cols: list[str], salt: str) -> Column:
    def field(c: str) -> Column:
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
        )

    rendered = F.concat_ws(_CK_SEP, *[field(c) for c in cols])
    # 15 hex chars = 60 bits: fits a positive BIGINT in both engines
    # (Spark conv(...,16,10); DuckDB CAST('0x...' AS BIGINT))
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), rendered)), 1, 15), 16, 10
    ).cast("long")


def _ck_sql(cols: list[str], salt: str) -> str:
    # chr() renders the separator — a raw control byte inside a SQL
    # literal trips DuckDB's parser. DuckDB length(VARCHAR) counts
    # characters, matching Spark's F.length on strings.
    def field(c: str) -> str:
        s = f"CAST({c} AS VARCHAR)"
        return (
            f"CASE WHEN {c} IS NULL THEN 'N' "
            f"ELSE 'V' || CAST(length({s}) AS VARCHAR) || ':' || {s} END"
        )

    rendered = f" || chr({ord(_CK_SEP)}) || ".join(field(c) for c in cols)
    return (
        f"CAST(('0x' || substr(md5('{salt}' || {rendered}), 1, 15))"
        " AS BIGINT)"
    )


_CK_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@query(
    "pl3_corpus_checksum",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(bit_xor({_ck_sql(_CK_COLS, 's1')}), 0)
                AS BIGINT) AS xor1,
           CAST(COALESCE(bit_xor({_ck_sql(_CK_COLS, 's2')}), 0)
                AS BIGINT) AS xor2
    FROM documents
    """,
)
def pl3_corpus_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant corpus content checksum — the reproducibility
    manifest entry a training-data pipeline records per published
    snapshot ("did this rerun produce the identical corpus?" answered
    in one scan, without sorting or diffing). Each row renders
    canonically (unit-separator join, explicit null token), digests to
    a 60-bit md5 prefix, and the table folds to TWO independently
    salted bit_xor accumulators plus the row count. bit_xor is
    commutative/associative -> partition- and order-invariant, fully
    map-side combinable, ZERO shuffle beyond the 1-row final combine.

    Stated limitation (why two salts + count): an EVEN number of
    extra copies of a row cancels out of the xors (a single extra
    copy still flips them) — count catches cardinality changes, and
    a different-rows collision would have to fool BOTH salted digests
    simultaneously (~2^-120). The same rendering runs in DuckDB (hex
    literal cast instead of conv), so the checksum is engine-portable
    — a rerun on EITHER engine must reproduce all three numbers."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        _row_digest(_CK_COLS, "s1").alias("_d1"),
        _row_digest(_CK_COLS, "s2").alias("_d2"),
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.coalesce(F.expr("bit_xor(_d1)"), F.lit(0))
        .cast("long")
        .alias("xor1"),
        F.coalesce(F.expr("bit_xor(_d2)"), F.lit(0))
        .cast("long")
        .alias("xor2"),
    )


@query(
    "pl4_span_clean_manifest",
    oracle=None,  # assembled below: composes dedup + text_analysis CTEs
)
def pl4_span_clean_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SPAN-level curation pipeline end-to-end — pl1's doc-level
    chain upgraded with substring dedup, the composition a real
    curation run ships (VERDICT r8 ask #6):

        documents
          -> tx2 quality floor (score >= 0.5, scored on the RAW text
             — quality gates on what was crawled, before surgery)
          -> d15/d16 span cut (corpus-wide duplicated K-gram spans,
             K = dedup.DUPSPAN_K, removed IN PLACE; docs that are
             entirely boilerplate come out empty and are dropped here)
          -> d14 keeper (near-dup clusters from d12, keep the
             highest-quality member, drop the rest)
          -> pk2 greedy no-split packing over the CLEANED token costs
          -> per-sequence manifest (shard, seq_id, n_docs, seq_tokens)

    The decisive difference from pl1: packing costs are computed on
    clean_text, so sequences budget for the tokens that will actually
    train, not the boilerplate d16 already cut. Every stage is the
    already-oracled operator composed; the oracle replays the chain in
    DuckDB (recursive-CTE components + d15's gaps-and-islands spans +
    the token-cut anti-join + the recursive greedy walk).

    Scale shape: span detection is d15's three bounded shuffles; the
    cut is d16's scan-side positional filter (no corpus explode); the
    keeper drop-set anti-join is size-guarded (_maybe_broadcast_drop);
    the only Python crossing is pk2's (doc_id, cost) packer — O(docs),
    never O(bytes). At 100 TB, d15's spans and d12's clusters are
    materialized once per snapshot and this query reads them back."""
    return _pack_manifest(_span_clean_costs(spark, sf_dir))


def _span_clean_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pl4's curation chain up to (doc_id, shard, cost): quality floor
    -> d16 span cut -> d14-style keeper. Shared with pl5, which inserts
    the decontamination filters before packing."""
    return _span_clean_docs(spark, sf_dir).select("doc_id", "shard", "cost")


def _span_clean_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same chain keeping clean_text alongside the cost — pl8's
    release digest attests the actual released bytes, so the content
    column must survive to the end of the chain."""
    from a3_fp_bigdata_spark.functions import text as TXF
    from a3_fp_bigdata_spark.operators.dedup import (
        _cluster_member_count,
        _maybe_broadcast_drop,
        d12_dedup_clusters,
        d16_span_cut,
    )

    docs = table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id", half_up(TXF.quality_score(F.col("text"))).alias("q")
    )
    clusters = d12_dedup_clusters(spark, sf_dir)
    ranked = clusters.join(q, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.desc("q"), F.asc("doc_id")
            )
        ),
    )
    dropped = ranked.filter(F.col("rn") > 1).select("doc_id")
    cleaned = d16_span_cut(spark, sf_dir)
    kept = (
        cleaned.join(q, "doc_id")
        .filter(
            (F.col("q") >= MANIFEST_MIN_QUALITY) & (F.col("n_kept") > 0)
        )
        .join(
            _maybe_broadcast_drop(
                dropped, _cluster_member_count(spark, sf_dir)
            ),
            "doc_id",
            "left_anti",
        )
        .select(
            "doc_id",
            (F.col("doc_id") % NSHARDS).alias("shard"),
            TX.bpe_ish_token_count(F.col("clean_text"))
            .cast("long")
            .alias("cost"),
            "clean_text",
        )
    )
    return kept


def _pack_manifest(kept: DataFrame) -> DataFrame:
    """(doc_id, shard, cost) -> per-sequence manifest via pk2's greedy
    no-split packer (one Arrow group per shard, O(docs) Python)."""
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, fill, first = 0, 0, True
        for cost in pdf["cost"]:
            if first:
                fill, first = cost, False
            elif fill + cost > PACK_BUDGET:
                seq, fill = seq + 1, cost
            else:
                fill += cost
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[["doc_id", "shard", "seq_id", "cost"]]

    packed = kept.groupBy("shard").applyInPandas(
        pack, schema="doc_id long, shard long, seq_id long, cost long"
    )
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("cost").cast("bigint").alias("seq_tokens"),
    )


def _pl4_oracle() -> str:
    return _manifest_oracle(decontaminate=False)


def _manifest_oracle(decontaminate: bool) -> str:
    from a3_fp_bigdata_spark.operators.dedup import (
        _D3_CTES,
        _D3_SELECT,
        _D15_SPAN_CTES,
    )
    from a3_fp_bigdata_spark.operators.text_analysis import _SQL_QUALITY_CTES

    # CTE roster check (names must stay disjoint across the composed
    # fragments): d3 = words/sh/ex/common/cnt; quality = qbase/qcomps/
    # quality; d15 = toks/grams/dup/hits/brk/isl/spans; local additions
    # renamed where pl1/d16 would collide (keptoks, survivors);
    # decontamination fragment (pl5 only) = dge/dbench_e/dexact/dgf/
    # dbench_f/dbcnt/dfuzzy, all reading d3's `words`.
    decon_ctes, decon_where = "", ""
    if decontaminate:
        from a3_fp_bigdata_spark.operators.dedup import (
            D18_CONTAIN_TAU,
            D18_NGRAM,
        )
        from a3_fp_bigdata_spark.operators.text_analysis import (
            DECON_BENCH_PCT,
            DECON_NGRAM,
            _sql_ngrams,
            sample_predicate_sql,
        )

        bench_pred = sample_predicate_sql("doc_id", DECON_BENCH_PCT)
        bench_pred_k = sample_predicate_sql("k.doc_id", DECON_BENCH_PCT)
        decon_ctes = f""", dge AS (
      SELECT DISTINCT doc_id, unnest({_sql_ngrams(DECON_NGRAM)}) AS g
      FROM words WHERE len(w) >= {DECON_NGRAM}
    ), dbench_e AS (
      SELECT DISTINCT g FROM dge WHERE {bench_pred}
    ), dexact AS (
      SELECT DISTINCT doc_id FROM dge
      WHERE NOT ({bench_pred}) AND g IN (SELECT g FROM dbench_e)
    ), dgf AS (
      SELECT DISTINCT doc_id, unnest({_sql_ngrams(D18_NGRAM)}) AS g
      FROM words WHERE len(w) >= {D18_NGRAM}
    ), dbench_f AS (
      SELECT doc_id AS bench_id, g FROM dgf WHERE {bench_pred}
    ), dbcnt AS (
      SELECT bench_id, count(*) AS nb FROM dbench_f GROUP BY 1
    ), dfuzzy AS (
      SELECT DISTINCT doc_id FROM (
        SELECT t.doc_id, b.bench_id, count(*) AS c
        FROM dgf t JOIN dbench_f b USING (g)
        WHERE NOT ({bench_pred})
        GROUP BY 1, 2
      ) p JOIN dbcnt USING (bench_id)
      WHERE CAST(p.c AS DOUBLE) / dbcnt.nb >= {D18_CONTAIN_TAU}
    )"""
        decon_where = f"""
        AND NOT ({bench_pred_k})
        AND k.doc_id NOT IN (SELECT doc_id FROM dexact)
        AND k.doc_id NOT IN (SELECT doc_id FROM dfuzzy)"""
    return f"""
    WITH RECURSIVE {_D3_CTES}, pairs AS (
      {_D3_SELECT}
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), reach(doc, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc = e.dst
    ), clusters AS (
      SELECT doc, min(lab) AS cluster_id FROM reach GROUP BY doc
    ), {_SQL_QUALITY_CTES}, ranked AS (
      SELECT c.doc,
             row_number() OVER (PARTITION BY c.cluster_id
                                -- division-free: ordering by the
                                -- floor numerator equals ordering by
                                -- half_up (positive constant divisor)
                                ORDER BY floor(q.quality * 10000 + 0.5)
                                         DESC, c.doc)
               AS rn
      FROM clusters c JOIN quality q ON q.doc_id = c.doc
    ), dropped AS (
      SELECT doc FROM ranked WHERE rn > 1
    ), {_D15_SPAN_CTES}, tokrows AS (
      SELECT doc_id, unnest(t) AS tok, unnest(range(0, len(t))) AS pos
      FROM toks
    ), keptoks AS (
      SELECT g.doc_id, g.pos, g.tok FROM tokrows g
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = g.doc_id
                          AND g.pos >= s.span_start AND g.pos < s.span_end)
    ), kagg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM keptoks GROUP BY doc_id
    ){decon_ctes}, survivors AS (
      SELECT k.doc_id, k.doc_id % {NSHARDS} AS shard,
             CAST({_sql_cost('k.clean_text')} AS BIGINT) AS cost,
             row_number() OVER (PARTITION BY k.doc_id % {NSHARDS}
                                ORDER BY k.doc_id) AS rn
      FROM kagg k JOIN quality q ON q.doc_id = k.doc_id
      WHERE {half_up_sql('q.quality')} >= {MANIFEST_MIN_QUALITY}
        AND k.doc_id NOT IN (SELECT doc FROM dropped){decon_where}
    ), step AS (
      SELECT shard, rn, doc_id, cost,
             CAST(0 AS BIGINT) AS seq_id, cost AS fill
      FROM survivors WHERE rn = 1
      UNION ALL
      SELECT k.shard, k.rn, k.doc_id, k.cost,
             CASE WHEN s.fill + k.cost > {PACK_BUDGET}
                  THEN s.seq_id + 1 ELSE s.seq_id END,
             CASE WHEN s.fill + k.cost > {PACK_BUDGET}
                  THEN k.cost ELSE s.fill + k.cost END
      FROM step s JOIN survivors k ON k.shard = s.shard AND k.rn = s.rn + 1
    )
    SELECT CAST(shard AS BIGINT) AS shard, seq_id,
           count(*) AS n_docs, CAST(sum(cost) AS BIGINT) AS seq_tokens
    FROM step GROUP BY shard, seq_id
    """


@query(
    "pl5_decontaminated_manifest",
    oracle=None,  # assembled below: pl4's chain + the decon fragment
)
def pl5_decontaminated_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline a production pretraining run actually
    ships, end to end: pl4's span-level chain (tx2 quality floor ->
    d15/d16 span cut -> d14 keeper) with the DECONTAMINATION stage
    composed in before packing — the benchmark split excluded outright
    (eval documents never train) and every doc flagged by tx9's exact
    rung OR d18's containment rung anti-joined away, then pk2's greedy
    packer over the cleaned token costs. This is Lee et al. span dedup
    + Brown et al. appendix-C decontamination in ONE oracle-checked
    plan.

    Scale shape: identical to pl4 plus one scan-pushable bench-split
    predicate and one anti-join against a contamination-sized flag set
    (AQE broadcasts it from runtime stats); the flag union is the
    d19 rule, so at 100 TB you materialize d19's verdict once per
    snapshot and this manifest reads it back."""
    from a3_fp_bigdata_spark.operators.dedup import (
        d18_fuzzy_decontaminate,
    )
    from a3_fp_bigdata_spark.operators.text_analysis import (
        DECON_BENCH_PCT,
        sample_predicate,
        tx9_decontaminate,
    )

    kept = _span_clean_costs(spark, sf_dir)
    flagged = (
        tx9_decontaminate(spark, sf_dir)
        .select("doc_id")
        .union(d18_fuzzy_decontaminate(spark, sf_dir).select("doc_id"))
        .distinct()
    )
    clean = kept.filter(
        ~sample_predicate(F.col("doc_id"), DECON_BENCH_PCT)
    ).join(flagged, "doc_id", "left_anti")
    return _pack_manifest(clean)


def _pl5_oracle() -> str:
    return _manifest_oracle(decontaminate=True)


def _attach_deferred_oracles() -> None:
    """Oracles composed from other modules' CTE fragments are attached
    post-registration (the fragments import cleanly only after the
    whole operator package is loadable)."""
    import dataclasses

    from a3_fp_bigdata_spark import registry as _R

    for name, build in (
        ("pl1_training_manifest", _pl1_oracle),
        ("pl4_span_clean_manifest", _pl4_oracle),
        ("pl5_decontaminated_manifest", _pl5_oracle),
        ("pk7_split_leakage", _pk7_oracle),
        ("pk9_weighted_sample", _pk9_oracle),
        ("pl2_chunk_index_stats", _pl2_oracle),
    ):
        rq = _R._REGISTRY[name]
        if rq.oracle is None:
            _R._REGISTRY[name] = dataclasses.replace(rq, oracle=build())


_attach_deferred_oracles()


#: pk11 length-bucketed batching: docs per training batch, and the
#: power-of-2 length buckets that keep same-batch lengths within 2x of
#: each other (so padding waste is bounded at 50% worst-case and far
#: less in practice).
PK11_BATCH_DOCS = 32


def _length_batched_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pk11's doc-level frame: (doc_id, shard, cost, bucket, batch_id)
    — the batch membership pk13's curriculum schedule joins bands
    onto. Kept separate from the per-batch rollup so both consumers
    share one derivation."""
    costs = _sharded_costs(spark, sf_dir).filter(F.col("cost") >= 1)
    bucketed = costs.withColumn(
        "bucket", (F.length(F.expr("bin(cost)")) - 1).cast("int")
    )
    w = Window.partitionBy("shard", "bucket").orderBy(
        F.desc("cost"), F.asc("doc_id")
    )
    numbered = bucketed.withColumn("rn", F.row_number().over(w))
    return numbered.withColumn(
        "batch_id",
        F.floor((F.col("rn") - 1) / PK11_BATCH_DOCS).cast("long"),
    )


@query(
    "pk11_length_bucket_batches",
    oracle=f"""
    WITH costs AS (
      SELECT doc_id, doc_id % {NSHARDS} AS shard,
             CAST({_SQL_COST} AS BIGINT) AS cost
      FROM documents
      WHERE CAST({_SQL_COST} AS BIGINT) >= 1
    ), bucketed AS (
      SELECT doc_id, shard, cost,
             CAST(length(bin(cost)) - 1 AS INT) AS bucket
      FROM costs
    ), numbered AS (
      SELECT shard, bucket, cost,
             row_number() OVER (PARTITION BY shard, bucket
                                ORDER BY cost DESC, doc_id) AS rn
      FROM bucketed
    )
    SELECT shard, bucket,
           CAST((rn - 1) // {PK11_BATCH_DOCS} AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(cost) AS BIGINT) AS max_cost,
           CAST(sum(cost) AS BIGINT) AS sum_cost,
           {half_up_sql(f'''1.0 - CAST(sum(cost) AS DOUBLE)
                         / (count(*) * max(cost))''')} + 0.0 AS pad_frac
    FROM numbered
    GROUP BY shard, bucket, (rn - 1) // {PK11_BATCH_DOCS}
    """,
)
def pk11_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly — the padding-efficiency rung
    every fixed-shape training loop needs: documents land in
    power-of-2 token-length buckets (bucket = floor(log2(cost)),
    computed as length(bin(cost))-1 so both engines bucket by EXACT
    integer bit-length, no float-log edge cases at powers of two),
    then batches of {PK11_BATCH_DOCS} are cut inside each
    (shard, bucket) in (cost desc, doc_id) order. Same-batch lengths
    are within 2x by construction, so padding to the batch max wastes
    < 50% worst-case; the emitted pad_frac measures the actual waste
    per batch — the number a curation run tracks when it tunes bucket
    granularity.

    Scale: the only shuffle keys on (shard, bucket) — {NSHARDS} x
    ~log2(max_len) independent partitions, the same sharding contract
    as pk1/pk2 (a batch never crosses shards; shards are just more
    files at training time). The within-partition row_number is a
    parallel window, not a global sort; the final per-batch rollup
    re-uses the same partitioning (no second exchange). Nothing
    funnels through the driver; no Python crossings at all."""
    return (
        _length_batched_docs(spark, sf_dir)
        .groupBy("shard", "bucket", "batch_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("cost").cast("long").alias("max_cost"),
            F.sum("cost").cast("long").alias("sum_cost"),
            (
                half_up(
                    F.lit(1.0)
                    - F.sum("cost").cast("double")
                    / (F.count("*") * F.max("cost"))
                )
                + F.lit(0.0)
            ).alias("pad_frac"),
        )
    )


# ---------------------------------------------------------------------------
# pl6/pl7: right-to-be-forgotten — purge ledger + post-purge attestation
# ---------------------------------------------------------------------------

#: Deletion-request band: the TOP FORGET_PCT% of the multiplicative-
#: hash range (>= 100 - FORGET_PCT), deterministically disjoint from
#: tx6's fit/sample band (< SAMPLE_PCT) — the stand-in for the
#: user-submitted deletion-request table a real pipeline receives.
FORGET_PCT = 3


def _forget_predicate(key: Column) -> Column:
    return ((key % SAMPLE_PREMOD) * SAMPLE_MULT) % 100 >= 100 - FORGET_PCT


_FORGET_SQL = (
    f"(((doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT}) % 100)"
    f" >= {100 - FORGET_PCT}"
)


@query(
    "pl6_forget_ledger",
    oracle=None,  # assembled below: needs dedup's recursive-CTE clusters
)
def pl6_forget_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten purge ledger WITH near-dup cluster
    expansion — the deletion artifact a GDPR/CCPA-compliant corpus
    pipeline must produce: deleting only the requested documents is
    not enough when the corpus still holds near-verbatim copies of the
    same content, so every member of a d12 near-dup cluster containing
    a requested doc is purged too. Output: one row per purged doc —
    (doc_id, reason 'requested' | 'cluster_expansion', cluster_id;
    -1 for requested docs in no near-dup cluster) — the auditable
    ledger the deletion report ships, and the purge set pl7 attests.

    Scale: the request set is tiny by nature (user-submitted deletion
    requests), so the affected-cluster list is at most request-sized
    and broadcasts unconditionally; the expansion join touches only
    the memoized d12 cluster table (near-dup members, a small fraction
    of the corpus), never the corpus itself. At 100 TB: requests
    broadcast against the materialized cluster snapshot — one
    broadcast-hash join plus one corpus-scan filter for the request
    rows; no new shuffle over document text anywhere."""
    from a3_fp_bigdata_spark.operators.dedup import d12_dedup_clusters

    docs = table(spark, sf_dir, "documents").select("doc_id")
    req = docs.filter(_forget_predicate(F.col("doc_id")))
    clusters = d12_dedup_clusters(spark, sf_dir)
    req_clusters = (
        clusters.filter(_forget_predicate(F.col("doc_id")))
        .select("cluster_id")
        .distinct()
    )
    requested = (
        req.join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.lit("requested").alias("reason"),
            F.coalesce(F.col("cluster_id"), F.lit(-1))
            .cast("long")
            .alias("cluster_id"),
        )
    )
    expansion = (
        clusters.join(F.broadcast(req_clusters), "cluster_id")
        .filter(~_forget_predicate(F.col("doc_id")))
        .select(
            "doc_id",
            F.lit("cluster_expansion").alias("reason"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
        )
    )
    return requested.unionByName(expansion)


@query(
    "pl7_forget_attestation",
    oracle=None,  # assembled below: pl3's digest over the purged corpus
)
def pl7_forget_attestation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-purge attestation: pl3's order-invariant corpus checksum
    recomputed over the corpus MINUS pl6's purge set — (n_rows, xor1,
    xor2), the exact shape pl3 publishes for the pre-purge snapshot,
    so 'the deletion actually happened and nothing else changed' is a
    three-number comparison between two manifest entries (and any
    independent rerun of either engine must reproduce both rows).

    Scale: one corpus scan + an anti-join against the purge set
    (request-sized — AQE broadcasts it from runtime stats; we do not
    force it because a mass-deletion event can exceed the broadcast
    ceiling) folding into the two salted map-side bit_xor accumulators
    — ZERO shuffle beyond the 1-row final combine, identical to pl3."""
    docs = table(spark, sf_dir, "documents")
    purged = pl6_forget_ledger(spark, sf_dir).select("doc_id")
    remaining = docs.join(purged, "doc_id", "left_anti")
    return remaining.select(
        _row_digest(_CK_COLS, "s1").alias("_d1"),
        _row_digest(_CK_COLS, "s2").alias("_d2"),
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.coalesce(F.expr("bit_xor(_d1)"), F.lit(0))
        .cast("long")
        .alias("xor1"),
        F.coalesce(F.expr("bit_xor(_d2)"), F.lit(0))
        .cast("long")
        .alias("xor2"),
    )


_FORGET_CLUSTER_CTES = """edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), reach(doc_id, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst
    ), clusters AS (
      SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY doc_id
    ), req AS (
      SELECT doc_id FROM documents WHERE {forget}
    ), reqc AS (
      SELECT DISTINCT c.cluster_id
      FROM clusters c JOIN req r ON r.doc_id = c.doc_id
    ), ledger AS (
      SELECT r.doc_id, 'requested' AS reason,
             CAST(COALESCE(c.cluster_id, -1) AS BIGINT) AS cluster_id
      FROM req r LEFT JOIN clusters c ON c.doc_id = r.doc_id
      UNION ALL
      SELECT c.doc_id, 'cluster_expansion' AS reason,
             CAST(c.cluster_id AS BIGINT) AS cluster_id
      FROM clusters c JOIN reqc ON reqc.cluster_id = c.cluster_id
      WHERE c.doc_id NOT IN (SELECT doc_id FROM req)
    )"""


def _forget_ctes() -> str:
    from a3_fp_bigdata_spark.operators.dedup import _D3_CTES, _D3_SELECT

    return (
        f"WITH RECURSIVE {_D3_CTES}, pairs AS (\n      {_D3_SELECT}\n"
        f"    ), {_FORGET_CLUSTER_CTES.format(forget=_FORGET_SQL)}"
    )


def _pl6_oracle() -> str:
    return f"""
    {_forget_ctes()}
    SELECT doc_id, reason, cluster_id FROM ledger
    """


def _pl7_oracle() -> str:
    return f"""
    {_forget_ctes()}
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(bit_xor({_ck_sql(_CK_COLS, 's1')}), 0)
                AS BIGINT) AS xor1,
           CAST(COALESCE(bit_xor({_ck_sql(_CK_COLS, 's2')}), 0)
                AS BIGINT) AS xor2
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM ledger)
    """


def _attach_forget_oracles() -> None:
    import dataclasses

    from a3_fp_bigdata_spark import registry as _R

    for name, build in (
        ("pl6_forget_ledger", _pl6_oracle),
        ("pl7_forget_attestation", _pl7_oracle),
    ):
        rq = _R._REGISTRY[name]
        if rq.oracle is None:
            _R._REGISTRY[name] = dataclasses.replace(rq, oracle=build())


_attach_forget_oracles()


# ---------------------------------------------------------------------------
# pk12: quality-stratified mixture (CCNet head/middle/tail)
# ---------------------------------------------------------------------------

#: Target mixture shares per quality band — CCNet's convention (Wenzek
#: et al. 2020 cut Common Crawl into head/middle/tail perplexity
#: terciles and train mostly on the head): band 0 = best LM scores.
QMIX_PCT = {0: 60, 1: 30, 2: 10}
QMIX_BANDS = len(QMIX_PCT)


def _pk12_oracle() -> str:
    from a3_fp_bigdata_spark.operators.text_analysis import LM_VOCAB_K

    band_case = (
        "CASE band WHEN 0 THEN 60 WHEN 1 THEN 30 ELSE 10 END"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS_REF}) AS tok FROM documents
    ), counts AS (
      SELECT tok, count(*) AS c FROM toks
      WHERE {sample_predicate_sql('doc_id')}
      GROUP BY tok
      ORDER BY c DESC, tok
      LIMIT {LM_VOCAB_K}
    ), stats AS (
      SELECT CAST(sum(c) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS v
      FROM counts
    ), scored AS (
      SELECT t.doc_id,
             CAST(floor(
               ({half_up_sql('avg(ln((COALESCE(c.c, 0) + 1.0) / (s.total + s.v)))')})
               * 10000 + 0.5) AS BIGINT) AS score4
      FROM toks t LEFT JOIN counts c USING (tok) CROSS JOIN stats s
      GROUP BY t.doc_id
    ), grid AS (
      SELECT score4, CAST(count(*) AS BIGINT) AS n FROM scored GROUP BY score4
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_total FROM grid
    ), banded AS (
      SELECT score4,
             CAST(COALESCE(SUM(n) OVER (ORDER BY score4 DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  * {QMIX_BANDS} // t.n_total AS BIGINT) AS band
      FROM grid, tot t
    ), bcnt AS (
      SELECT b.band, CAST(count(*) AS BIGINT) AS n_docs
      FROM scored s JOIN banded b USING (score4)
      GROUP BY b.band
    ), bt AS (
      SELECT band, n_docs, CAST({band_case} AS BIGINT) AS target_pct
      FROM bcnt
    ), bs AS (
      SELECT MIN(n_docs * 100 // target_pct) AS mix_size FROM bt
    ), brates AS (
      SELECT band,
             LEAST(target_pct * (SELECT mix_size FROM bs) // n_docs, 100)
               AS keep_pct
      FROM bt
    )
    SELECT s.doc_id, b.band, r.keep_pct
    FROM scored s JOIN banded b USING (score4) JOIN brates r USING (band)
    WHERE ((s.doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT}) % 100 < r.keep_pct
    """


def _quality_bands(spark: SparkSession, sf_dir: str):
    """tx13's LM score quantized to the integer 1e-4 grid plus the
    score-group-atomic tercile band map — shared by pk12's mixture and
    pk13's curriculum schedule. Returns (scored, banded), both pinned:
    scored feeds the grid, the band counts, and each consumer's final
    join (unpinned, the whole tx13 scoring subtree — explode + vocab
    top-k + broadcast joins — replays once per consumer; the plan
    audit read 42 exchanges before the pin, 3 live + staged after);
    banded is score-grid-sized and read repeatedly."""
    from a3_fp_bigdata_spark.operators.text_analysis import (
        tx13_unigram_logprob,
    )
    from a3_fp_bigdata_spark.registry import pin

    scored = pin(
        tx13_unigram_logprob(spark, sf_dir).select(
            "doc_id",
            F.floor(F.col("avg_logprob") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("score4"),
        )
    )
    grid = scored.groupBy("score4").agg(F.count("*").cast("long").alias("n"))
    tot = grid.agg(F.sum("n").cast("long").alias("n_total"))
    w = Window.orderBy(F.desc("score4")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    banded = pin(
        grid.withColumn(
            "cum_before",
            F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "score4",
            F.expr(f"(cum_before * {QMIX_BANDS}) div n_total")
            .cast("long")
            .alias("band"),
        )
    )
    return scored, banded


@query("pk12_quality_mixture", oracle=None)  # attached below (tx13 CTEs)
def pk12_quality_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified mixture — pk5's data-derived downsampling
    keyed on LM-quality BANDS instead of language: CCNet buckets the
    corpus into head/middle/tail by LM score and production mixes
    mostly from the head (QMIX_PCT = 60/30/10). Composes tx13's
    unigram-LM score with pk5's all-int64 floor math so membership is
    bit-identical across engines end to end.

    Band assignment is SCORE-GROUP-ATOMIC and integer-exact: scores
    quantize to the 1e-4 grid (score4 = the half-up numerator on
    tx13's already-rounded avg_logprob — both engines hold the
    identical double, so the BIGINT cast cannot diverge), the grid
    groups by score4 with a cumulative count best-first, and a group's
    band is cum_before * {QMIX_BANDS} div n_total — docs with equal
    scores never straddle a band boundary (ties are band-atomic, the
    deterministic analogue of NTILE's row-split). The mixture is then
    pk5's algebra verbatim over the band key: the scarcest band caps
    mix size, per-band keep rates realize QMIX_PCT via the
    multiplicative-hash predicate.

    Scale: tx13's scoring is scan -> explode -> bounded broadcast join
    -> per-doc avg; the band table is the SCORE GRID, not the corpus —
    avg log-probs live in a few-hundred-wide range so the 1e-4 grid is
    <= ~2e5 rows at ANY corpus size, making the unpartitioned
    cumulative window a bounded-input single task by construction
    (same argument as tx15's capped model tables), and the band map
    broadcasts back onto the corpus. Rates are a {QMIX_BANDS}-row
    broadcast; final membership evaluates scan-side. Only the per-doc
    score agg shuffles corpus-sized data."""
    scored, banded = _quality_bands(spark, sf_dir)
    bcnt = (
        scored.join(F.broadcast(banded), "score4")
        .groupBy("band")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    target = F.lit(10).cast("long")
    for b, pct in QMIX_PCT.items():
        target = (
            F.when(F.col("band") == b, F.lit(pct).cast("long"))
            .otherwise(target)
        )
    bt = bcnt.withColumn("target_pct", target)
    bs = bt.agg(F.min(F.expr("n_docs * 100 div target_pct")).alias("mix_size"))
    brates = bt.crossJoin(F.broadcast(bs)).select(
        "band",
        F.least(
            F.expr("target_pct * mix_size div n_docs"),
            F.lit(100).cast("long"),
        ).alias("keep_pct"),
    )
    return (
        scored.join(F.broadcast(banded), "score4")
        .join(F.broadcast(brates), "band")
        .filter(sample_predicate(F.col("doc_id"), F.col("keep_pct")))
        .select("doc_id", "band", "keep_pct")
    )


def _attach_pk12_oracle() -> None:
    import dataclasses

    from a3_fp_bigdata_spark import registry as _R

    rq = _R._REGISTRY["pk12_quality_mixture"]
    if rq.oracle is None:
        _R._REGISTRY["pk12_quality_mixture"] = dataclasses.replace(
            rq, oracle=_pk12_oracle()
        )


_attach_pk12_oracle()


# ---------------------------------------------------------------------------
# pl8: corpus-release flagship — the full production chain in one artifact
# ---------------------------------------------------------------------------


def _pl8_oracle() -> str:
    from a3_fp_bigdata_spark.data import fingerprint_where
    from a3_fp_bigdata_spark.operators.dedup import (
        _D3_CTES,
        _D3_SELECT,
        _D15_SPAN_CTES,
        D18_CONTAIN_TAU,
        D18_NGRAM,
    )
    from a3_fp_bigdata_spark.operators.similarity import (
        _D17_SCRATCH,
        _SQL_D,
        _sql_cos,
        SEMDEDUP_EPS,
    )
    from a3_fp_bigdata_spark.operators.text_analysis import (
        _SQL_QUALITY_CTES,
        DECON_BENCH_PCT,
        DECON_NGRAM,
        _sql_ngrams,
        sample_predicate_sql,
    )

    bench_pred = sample_predicate_sql("doc_id", DECON_BENCH_PCT)
    bench_pred_k = sample_predicate_sql("k.doc_id", DECON_BENCH_PCT)
    return f"""
    WITH RECURSIVE {_D3_CTES}, pairs AS (
      {_D3_SELECT}
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ), reach(doc, lab) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc = e.dst
    ), clusters AS (
      SELECT doc, min(lab) AS cluster_id FROM reach GROUP BY doc
    ), {_SQL_QUALITY_CTES}, ranked AS (
      SELECT c.doc,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY floor(q.quality * 10000 + 0.5)
                                         DESC, c.doc)
               AS rn
      FROM clusters c JOIN quality q ON q.doc_id = c.doc
    ), dropped AS (
      SELECT doc FROM ranked WHERE rn > 1
    ), {_D15_SPAN_CTES}, tokrows AS (
      SELECT doc_id, unnest(t) AS tok, unnest(range(0, len(t))) AS pos
      FROM toks
    ), keptoks AS (
      SELECT g.doc_id, g.pos, g.tok FROM tokrows g
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = g.doc_id
                          AND g.pos >= s.span_start AND g.pos < s.span_end)
    ), kagg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
      FROM keptoks GROUP BY doc_id
    ), dge AS (
      SELECT DISTINCT doc_id, unnest({_sql_ngrams(DECON_NGRAM)}) AS g
      FROM words WHERE len(w) >= {DECON_NGRAM}
    ), dbench_e AS (
      SELECT DISTINCT g FROM dge WHERE {bench_pred}
    ), dexact AS (
      SELECT DISTINCT doc_id FROM dge
      WHERE NOT ({bench_pred}) AND g IN (SELECT g FROM dbench_e)
    ), dgf AS (
      SELECT DISTINCT doc_id, unnest({_sql_ngrams(D18_NGRAM)}) AS g
      FROM words WHERE len(w) >= {D18_NGRAM}
    ), dbench_f AS (
      SELECT doc_id AS bench_id, g FROM dgf WHERE {bench_pred}
    ), dbcnt AS (
      SELECT bench_id, count(*) AS nb FROM dbench_f GROUP BY 1
    ), dfuzzy AS (
      SELECT DISTINCT doc_id FROM (
        SELECT t.doc_id, b.bench_id, count(*) AS c
        FROM dgf t JOIN dbench_f b USING (g)
        WHERE NOT ({bench_pred})
        GROUP BY 1, 2
      ) p JOIN dbcnt USING (bench_id)
      WHERE CAST(p.c AS DOUBLE) / dbcnt.nb >= {D18_CONTAIN_TAU}
    ), d17vec AS (
      SELECT vec_id, {_SQL_D.format(col='embedding')} AS e
      FROM embeddings
    ), d17mat AS (
      SELECT vec_id, cell
      FROM read_parquet('{_D17_SCRATCH}/*.parquet')
      WHERE {fingerprint_where('embeddings', 'vec_id')}
    ), d17drop AS (
      SELECT DISTINCT b.vec_id
      FROM d17mat a JOIN d17mat b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN d17vec ea ON ea.vec_id = a.vec_id
      JOIN d17vec eb ON eb.vec_id = b.vec_id
      WHERE {_sql_cos('ea.e', 'eb.e')} >= {SEMDEDUP_EPS}
    ), freq AS (
      SELECT doc_id FROM documents WHERE {_FORGET_SQL}
    ), freqc AS (
      SELECT DISTINCT c.cluster_id
      FROM clusters c JOIN freq r ON r.doc_id = c.doc
    ), fpurged AS (
      SELECT doc_id FROM freq
      UNION
      SELECT c.doc AS doc_id
      FROM clusters c JOIN freqc ON freqc.cluster_id = c.cluster_id
    ), relbase AS (
      SELECT k.doc_id, k.doc_id % {NSHARDS} AS shard, k.clean_text,
             CAST({_sql_cost('k.clean_text')} AS BIGINT) AS cost
      FROM kagg k JOIN quality q ON q.doc_id = k.doc_id
      WHERE {half_up_sql('q.quality')} >= {MANIFEST_MIN_QUALITY}
        AND k.doc_id NOT IN (SELECT doc FROM dropped)
        AND NOT ({bench_pred_k})
        AND k.doc_id NOT IN (SELECT doc_id FROM dexact)
        AND k.doc_id NOT IN (SELECT doc_id FROM dfuzzy)
        AND k.doc_id NOT IN (SELECT vec_id FROM d17drop)
        AND k.doc_id NOT IN (SELECT doc_id FROM fpurged)
    ), mixcnt AS (
      SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM relbase b JOIN documents d ON d.doc_id = b.doc_id
      GROUP BY d.lang
    ), mixt AS (
      SELECT lang, n_docs,
             CAST({_lang_case_sql(MIX_PCT, MIX_DEFAULT_PCT)} AS BIGINT)
               AS target_pct
      FROM mixcnt
    ), mixs AS (
      SELECT MIN(n_docs * 100 // target_pct) AS mix_size FROM mixt
    ), mixrates AS (
      SELECT lang,
             LEAST(target_pct * (SELECT mix_size FROM mixs) // n_docs, 100)
               AS keep_pct
      FROM mixt
    ), mixed AS (
      SELECT b.doc_id, b.shard, b.clean_text, b.cost
      FROM relbase b
      JOIN documents d ON d.doc_id = b.doc_id
      JOIN mixrates r ON r.lang = d.lang
      WHERE ((b.doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT}) % 100
            < r.keep_pct
    ), relsurv AS (
      SELECT doc_id, shard, cost,
             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
      FROM mixed
    ), relstep AS (
      SELECT shard, rn, doc_id, cost,
             CAST(0 AS BIGINT) AS seq_id, cost AS fill
      FROM relsurv WHERE rn = 1
      UNION ALL
      SELECT k.shard, k.rn, k.doc_id, k.cost,
             CASE WHEN s.fill + k.cost > {PACK_BUDGET}
                  THEN s.seq_id + 1 ELSE s.seq_id END,
             CASE WHEN s.fill + k.cost > {PACK_BUDGET}
                  THEN k.cost ELSE s.fill + k.cost END
      FROM relstep s JOIN relsurv k ON k.shard = s.shard AND k.rn = s.rn + 1
    ), relseqs AS (
      SELECT shard, seq_id, count(*) AS n_docs,
             CAST(sum(cost) AS BIGINT) AS seq_tokens
      FROM relstep GROUP BY shard, seq_id
    ), relroll AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_seqs,
             CAST(sum(n_docs) AS BIGINT) AS n_docs,
             CAST(sum(seq_tokens) AS BIGINT) AS n_tokens
      FROM relseqs GROUP BY shard
    ), reldig AS (
      SELECT shard,
             CAST(COALESCE(bit_xor({_ck_sql(['doc_id', 'clean_text'], 'r1')}),
                           0) AS BIGINT) AS xor1,
             CAST(COALESCE(bit_xor({_ck_sql(['doc_id', 'clean_text'], 'r2')}),
                           0) AS BIGINT) AS xor2
      FROM mixed GROUP BY shard
    )
    SELECT CAST(r.shard AS BIGINT) AS shard, r.n_seqs, r.n_docs,
           r.n_tokens, g.xor1, g.xor2
    FROM relroll r JOIN reldig g ON g.shard = r.shard
    """


@query("pl8_release_manifest", oracle=None)  # attached below (composed CTEs)
def pl8_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE corpus-release artifact — the full production sequence a
    real pretraining run ships, composed end to end and attested in
    one oracle-replayed table:

        documents
          -> tx2 quality floor             (score >= 0.5 on raw text)
          -> d15/d16 span cut              (corpus-wide dup spans out)
          -> d12/d14 keeper                (near-dup clusters -> best)
          -> d17 SemDeDup keeper           (semantic twins out; docs
                                            without an embedding pass)
          -> tx9/d18/d19 decontamination   (bench split excluded,
                                            exact + fuzzy hits cut)
          -> pl6 right-to-be-forgotten     (requests + cluster
                                            expansion purged)
          -> pk5 domain mixture            (realized over SURVIVORS —
                                            rates derive from what is
                                            left, not the raw corpus)
          -> pk2 greedy pack               (per-shard sequences)
          -> per-shard release row: (shard, n_seqs, n_docs, n_tokens,
             xor1, xor2) — counts from the packed manifest plus pl3's
             order-invariant content digest over the RELEASED
             (doc_id, clean_text) pairs, so 'this exact corpus, these
             exact bytes' is a 32-row comparison for any rerun.

    Oracle: DuckDB replays every stage — recursive-CTE clusters,
    gaps-and-islands spans, containment decontamination, ledger
    expansion, all-int64 mixture floors, the recursive greedy walk —
    except d17's seeded cells, which it takes AS GIVEN from the
    fingerprinted scratch and re-derives the keep RULE independently
    (the d17-audit protocol; a rule bug still reds this row).

    Scale: strictly pl5's shape plus a broadcast purge anti-join, a
    broadcast |langs|-row rate join, and two map-side xor digests —
    no new corpus-sized shuffle beyond the stages already costed; at
    100 TB each stage's verdict is materialized per snapshot and this
    manifest composes the read-backs.

    Plan audit (r12, VERDICT r11 ask #4): the r11 PLANS row's
    64-broadcast count was the text dump re-expanding cached subtrees
    at every reference site (fixed: plans.inspect.broadcast_join_counts
    walks cache-aware) PLUS one genuine duplication — the survivor
    chain ran twice, once per rate/mixture branch, until surv was
    pinned. After both: 0 per-run broadcast joins (+12 inside staged
    relations materialized once), planner time 0.14 s for the whole
    composition at sf0.1, wall 11.3 -> 9.9 s warm."""
    from a3_fp_bigdata_spark.operators.dedup import (
        d18_fuzzy_decontaminate,
    )
    from a3_fp_bigdata_spark.operators.similarity import (
        materialize_d17_verdict,
    )
    from a3_fp_bigdata_spark.operators.text_analysis import (
        DECON_BENCH_PCT,
        sample_predicate,
        tx9_decontaminate,
    )
    from a3_fp_bigdata_spark.registry import pin

    kept = _span_clean_docs(spark, sf_dir)
    flagged = (
        tx9_decontaminate(spark, sf_dir)
        .select("doc_id")
        .union(d18_fuzzy_decontaminate(spark, sf_dir).select("doc_id"))
        .distinct()
    )
    clean = kept.filter(
        ~sample_predicate(F.col("doc_id"), DECON_BENCH_PCT)
    ).join(flagged, "doc_id", "left_anti")
    sem_drop = (
        materialize_d17_verdict(spark, sf_dir)
        .filter(~F.col("is_kept"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    clean = clean.join(sem_drop, "doc_id", "left_anti")
    purged = pl6_forget_ledger(spark, sf_dir).select("doc_id")
    clean = clean.join(purged, "doc_id", "left_anti")

    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    # pin: the whole survivor chain (span cut -> decon -> semantic ->
    # purge -> lang join) feeds BOTH the rate derivation and the final
    # mixture filter; without the pin each branch re-executes the
    # chain (r12 measurement: 2x the per-run broadcast probes and
    # duplicate documents scans — VERDICT r11 ask #4)
    surv = pin(clean.join(langs, "doc_id"))
    counts = surv.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    targets = counts.withColumn(
        "target_pct", _lang_case_col(MIX_PCT, MIX_DEFAULT_PCT).cast("long")
    )
    mix_size = targets.agg(
        F.min(F.expr("n_docs * 100 div target_pct")).alias("mix_size")
    )
    rates = targets.crossJoin(F.broadcast(mix_size)).select(
        "lang",
        F.least(
            F.expr("target_pct * mix_size div n_docs"),
            F.lit(100).cast("long"),
        ).alias("keep_pct"),
    )
    # NOT pinned (r12): both readers (manifest roll-up + digest) now
    # derive from the pinned surv through a cheap broadcast join +
    # filter; caching mixed too would store the wide text twice and
    # measured SLOWER (sf0.1: warm 12.6s vs 9.9s with surv-only pin)
    mixed = (
        surv.join(F.broadcast(rates), "lang")
        .filter(sample_predicate(F.col("doc_id"), F.col("keep_pct")))
        .select("doc_id", "shard", "cost", "clean_text")
    )
    manifest = _pack_manifest(mixed.select("doc_id", "shard", "cost"))
    roll = manifest.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_seqs"),
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("seq_tokens").cast("long").alias("n_tokens"),
    )
    dig = (
        mixed.select(
            "shard",
            _row_digest(["doc_id", "clean_text"], "r1").alias("_d1"),
            _row_digest(["doc_id", "clean_text"], "r2").alias("_d2"),
        )
        .groupBy("shard")
        .agg(
            F.coalesce(F.expr("bit_xor(_d1)"), F.lit(0))
            .cast("long")
            .alias("xor1"),
            F.coalesce(F.expr("bit_xor(_d2)"), F.lit(0))
            .cast("long")
            .alias("xor2"),
        )
    )
    return roll.join(dig, "shard").select(
        F.col("shard").cast("long").alias("shard"),
        "n_seqs",
        "n_docs",
        "n_tokens",
        "xor1",
        "xor2",
    )


def _attach_pl8_oracle() -> None:
    import dataclasses

    from a3_fp_bigdata_spark import registry as _R

    rq = _R._REGISTRY["pl8_release_manifest"]
    if rq.oracle is None:
        _R._REGISTRY["pl8_release_manifest"] = dataclasses.replace(
            rq, oracle=_pl8_oracle()
        )


_attach_pl8_oracle()


# ---------------------------------------------------------------------------
# pk13: quality-curriculum schedule (global order without a global sort)
# ---------------------------------------------------------------------------


def _pk13_oracle() -> str:
    from a3_fp_bigdata_spark.operators.text_analysis import LM_VOCAB_K

    return f"""
    WITH costs AS (
      SELECT doc_id, doc_id % {NSHARDS} AS shard,
             CAST({_SQL_COST} AS BIGINT) AS cost
      FROM documents
      WHERE CAST({_SQL_COST} AS BIGINT) >= 1
    ), bucketed AS (
      SELECT doc_id, shard, cost,
             CAST(length(bin(cost)) - 1 AS INT) AS bucket
      FROM costs
    ), batched AS (
      SELECT doc_id, shard, bucket,
             CAST((row_number() OVER (PARTITION BY shard, bucket
                                      ORDER BY cost DESC, doc_id) - 1)
                  // {PK11_BATCH_DOCS} AS BIGINT) AS batch_id
      FROM bucketed
    ), toks AS (
      SELECT doc_id, unnest({_SQL_TOKS_REF}) AS tok FROM documents
    ), counts AS (
      SELECT tok, count(*) AS c FROM toks
      WHERE {sample_predicate_sql('doc_id')}
      GROUP BY tok
      ORDER BY c DESC, tok
      LIMIT {LM_VOCAB_K}
    ), stats AS (
      SELECT CAST(sum(c) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS v
      FROM counts
    ), scored AS (
      SELECT t.doc_id,
             CAST(floor(
               ({half_up_sql('avg(ln((COALESCE(c.c, 0) + 1.0) / (s.total + s.v)))')})
               * 10000 + 0.5) AS BIGINT) AS score4
      FROM toks t LEFT JOIN counts c USING (tok) CROSS JOIN stats s
      GROUP BY t.doc_id
    ), grid AS (
      SELECT score4, CAST(count(*) AS BIGINT) AS n FROM scored GROUP BY score4
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n_total FROM grid
    ), banded AS (
      SELECT score4,
             CAST(COALESCE(SUM(n) OVER (ORDER BY score4 DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  * {QMIX_BANDS} // t.n_total AS BIGINT) AS band
      FROM grid, tot t
    ), docband AS (
      SELECT s.doc_id, b.band FROM scored s JOIN banded b USING (score4)
    ), bb AS (
      SELECT t.shard, t.bucket, t.batch_id,
             CAST(max(d.band) AS BIGINT) AS band,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM batched t JOIN docband d USING (doc_id)
      GROUP BY 1, 2, 3
    )
    SELECT shard, bucket, batch_id, band, n_docs,
           CAST(row_number() OVER (ORDER BY band, shard, bucket, batch_id)
                - 1 AS BIGINT) AS curriculum_pos
    FROM bb
    """


@query("pk13_curriculum_schedule", oracle=None)  # attached below
def pk13_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum training order — consume pk11's length-
    bucketed batches band by band (cleanest LM-quality tercile first,
    the data-curriculum / midtraining-anneal shape): a batch's band is
    the MAX band over its member docs (the worst member governs — a
    batch trains as late as its dirtiest doc), and curriculum_pos is a
    GLOBAL 0-based position over all batches ordered by (band, shard,
    bucket, batch_id).

    The scale point is HOW the global position is computed: a naive
    row_number over everything is a single-partition window (the
    classic global-sort funnel). Instead, pk1's two-pass prefix-sum
    pattern: batches-per-(band, shard, bucket) aggregate (the GROUP
    table — at most {QMIX_BANDS} x NSHARDS x ~log2(max_len) rows at
    ANY corpus size, so its ordered prefix window is bounded-input by
    construction), broadcast the offsets back, and add a parallel
    within-group row_number partitioned by (band, shard, bucket). The
    DuckDB oracle computes the SAME schedule with the naive global
    ROW_NUMBER — equality proves the two-pass math realizes a true
    total order without ever funneling batch rows into one task."""
    from a3_fp_bigdata_spark.registry import pin

    batched = _length_batched_docs(spark, sf_dir)
    scored, banded = _quality_bands(spark, sf_dir)
    docband = scored.join(F.broadcast(banded), "score4").select(
        "doc_id", "band"
    )
    # bb feeds both the group-offset aggregate and the final join
    bb = pin(
        batched.join(docband, "doc_id")
        .groupBy("shard", "bucket", "batch_id")
        .agg(
            F.max("band").cast("long").alias("band"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )
    groups = bb.groupBy("band", "shard", "bucket").agg(
        F.count("*").cast("long").alias("n_batches")
    )
    wg = Window.orderBy("band", "shard", "bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = groups.withColumn(
        "offset",
        F.coalesce(F.sum("n_batches").over(wg), F.lit(0)).cast("long"),
    ).select("band", "shard", "bucket", "offset")
    win = Window.partitionBy("band", "shard", "bucket").orderBy("batch_id")
    return (
        bb.withColumn("within", F.row_number().over(win).cast("long"))
        .join(F.broadcast(offsets), ["band", "shard", "bucket"])
        .select(
            "shard",
            "bucket",
            "batch_id",
            "band",
            "n_docs",
            (F.col("offset") + F.col("within") - 1).alias("curriculum_pos"),
        )
    )


def _attach_pk13_oracle() -> None:
    import dataclasses

    from a3_fp_bigdata_spark import registry as _R

    rq = _R._REGISTRY["pk13_curriculum_schedule"]
    if rq.oracle is None:
        _R._REGISTRY["pk13_curriculum_schedule"] = dataclasses.replace(
            rq, oracle=_pk13_oracle()
        )


_attach_pk13_oracle()


#: pk15 — temperature (alpha) smoothing exponent, expressed as the
#: exact operation alpha=0.5 induces: integer sqrt of the per-lang
#: count. floor(sqrt(int64)) is bit-identical on both engines for any
#: realistic count (IEEE sqrt is correctly rounded; the rounding can
#: only cross an integer boundary when 1/(2*sqrt(n)) < half-ulp, i.e.
#: n beyond ~2^52 — far past any per-language doc count).
TEMP_RESOLUTION_BP = 10_000  # basis-point share grid


@query(
    "pk15_temperature_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ), w AS (
      SELECT lang, n_docs,
             CAST(floor(sqrt(n_docs)) AS BIGINT) AS wgt
      FROM counts
    ), tot AS (
      SELECT CAST(sum(wgt) AS BIGINT) AS wsum FROM w
    ), t AS (
      SELECT lang, n_docs,
             wgt * {TEMP_RESOLUTION_BP} // (SELECT wsum FROM tot)
               AS target_bp
      FROM w
    ), s AS (
      SELECT MIN(n_docs * {TEMP_RESOLUTION_BP} // target_bp) AS mix_size
      FROM t WHERE target_bp > 0
    ), rates AS (
      SELECT lang,
             LEAST(target_bp * (SELECT mix_size FROM s) // n_docs,
                   {TEMP_RESOLUTION_BP}) AS keep_bp
      FROM t
    )
    SELECT d.doc_id, d.lang, r.keep_bp
    FROM documents d JOIN rates r USING (lang)
    WHERE ((d.doc_id % {SAMPLE_PREMOD}) * {SAMPLE_MULT})
          % {TEMP_RESOLUTION_BP} < r.keep_bp
    """,
)
def pk15_temperature_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-smoothed mixture (the multilingual-LM alpha-sampling
    knob, XLM/mBERT style): target shares are DERIVED from the corpus
    as q_l ∝ n_l^alpha with alpha = 0.5 — scarce languages are
    upweighted relative to their empirical share, dominant ones
    damped — unlike pk5, whose targets arrive as config. The smoothed
    weights are integer sqrt(n_l) (exactly what alpha = 0.5 means on
    the count grid; see TEMP_RESOLUTION_BP note), so every stage —
    weights, basis-point targets, the scarcest-language mix size, the
    per-lang keep rates, and membership itself — is int64 floor math,
    bit-identical across engines, reusing pk5's algebra at 100x finer
    resolution (basis points, because smoothed tail shares land well
    under 1%).

    Scale shape: identical to pk5 — one map-side-combinable per-lang
    count, a broadcast rate table, and a scan-side membership
    predicate; doc rows never shuffle."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w = counts.select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs"))).cast("long").alias("wgt"),
    )
    tot = w.agg(F.sum("wgt").cast("long").alias("wsum"))
    t = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr(f"wgt * {TEMP_RESOLUTION_BP} div wsum").alias("target_bp"),
    )
    mix_size = t.filter(F.col("target_bp") > 0).agg(
        F.min(
            F.expr(f"n_docs * {TEMP_RESOLUTION_BP} div target_bp")
        ).alias("mix_size")
    )
    rates = t.crossJoin(F.broadcast(mix_size)).select(
        "lang",
        F.least(
            F.expr("target_bp * mix_size div n_docs"),
            F.lit(TEMP_RESOLUTION_BP).cast("long"),
        ).alias("keep_bp"),
    )
    member = (
        (F.col("doc_id") % SAMPLE_PREMOD) * SAMPLE_MULT
    ) % TEMP_RESOLUTION_BP < F.col("keep_bp")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(member)
        .select("doc_id", "lang", "keep_bp")
    )


# ---------------------------------------------------------------------------
# pk16: best-fit-decreasing packing + its 2-approximation certificate
# ---------------------------------------------------------------------------

#: pk16 audit scratch — the ml5/mm11 protocol (per-process run_scratch
#: path, (n_src, src_ck) staleness fingerprint).
_PK16_SCRATCH = run_scratch("pk16_bfd")


def _bfd_assign(pdf):
    """Best-fit-decreasing over one shard: place docs in cost-desc
    order (doc_id tie-break) into the FULLEST bin that still fits;
    open a new bin otherwise; an oversize doc gets a bin of its own.
    Pure (doc_id, cost) pairs — Python never touches text."""
    pdf = pdf.sort_values(
        ["cost", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    fills: list[int] = []
    bin_ids = []
    for cost in pdf["cost"]:
        best = -1
        for i, fill in enumerate(fills):
            if fill + cost <= PACK_BUDGET and (
                best < 0 or fill > fills[best]
            ):
                best = i
        if cost > PACK_BUDGET or best < 0:
            fills.append(cost)
            best = len(fills) - 1
        else:
            fills[best] += cost
        bin_ids.append(best)
    pdf["bin_id"] = bin_ids
    return pdf[["doc_id", "shard", "bin_id", "cost"]]


@query(
    "pk16_bestfit_pack_audit",
    oracle=None,  # attached below (needs the cost SQL + fingerprint)
)
def pk16_bestfit_pack_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Best-fit-decreasing packing (the utilization upgrade over pk2's
    arrival-order greedy) with its classic CERTIFICATE oracle-attested:
    any best-fit/first-fit packing leaves AT MOST ONE bin at most half
    full per shard (two light bins would have been merged — the
    textbook 2-approximation argument), every non-oversize bin
    respects the budget, and every oversize bin is a singleton. The
    assignment is materialized to stamped scratch; DuckDB re-derives
    every per-shard statistic from the materialized rows AND re-checks
    each doc's cost against its own rendering of the token-cost model,
    so a placement bug, a budget overflow, or a drifted cost column is
    a red hash mismatch.

    Scale: pk2's contract — one Arrow batch per shard over (doc_id,
    cost) pairs (the in-batch best-fit scan is O(docs x bins/shard),
    bins bounded by shard token mass / budget); the audit adds one
    tiny write + grid-sized aggregation. Output one row per shard."""
    assignment = (
        _sharded_costs(spark, sf_dir)
        .groupBy("shard")
        .applyInPandas(
            _bfd_assign,
            schema="doc_id long, shard long, bin_id long, cost long",
        )
    )
    fp = table_fingerprint(spark, sf_dir, "documents", "doc_id", table_fn=table)
    assignment.crossJoin(F.broadcast(fp)).repartition(1).write.mode(
        "overwrite"
    ).parquet(_PK16_SCRATCH)
    back = read_stamped_scratch(spark, _PK16_SCRATCH).drop("src_ck")
    bins = back.groupBy("shard", "bin_id").agg(
        F.sum("cost").cast("long").alias("fill"),
        F.count("*").cast("long").alias("n_docs_bin"),
    )
    oversize = F.col("fill") > PACK_BUDGET
    light = 2 * F.col("fill") <= PACK_BUDGET
    return (
        bins.groupBy("shard")
        .agg(
            F.sum("n_docs_bin").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_bins"),
            F.sum(F.when(oversize, 1).otherwise(0))
            .cast("long")
            .alias("n_oversize"),
            F.coalesce(
                F.max(F.when(~oversize, F.col("fill"))), F.lit(0)
            )
            .cast("long")
            .alias("max_regular_fill"),
            F.sum(F.when(light, 1).otherwise(0))
            .cast("long")
            .alias("n_light_bins"),
            F.min(
                F.when(oversize, F.col("n_docs_bin") == 1).otherwise(
                    True
                ).cast("int")
            )
            .cast("int")
            .alias("oversize_singletons_ok"),
        )
        .select(
            "*",
            (F.col("max_regular_fill") <= PACK_BUDGET)
            .cast("int")
            .alias("budget_ok"),
            (F.col("n_light_bins") <= 1).cast("int").alias("cert_ok"),
        )
    )


def _attach_pk16_oracle() -> None:
    import dataclasses

    from a3_fp_bigdata_spark import registry as _R
    from a3_fp_bigdata_spark.data import fingerprint_where

    sql = f"""
    WITH scratch AS (
      SELECT doc_id, shard, bin_id, cost
      FROM read_parquet('{_PK16_SCRATCH}/*.parquet')
      WHERE {fingerprint_where('documents', 'doc_id')}
    ), costs AS (
      SELECT doc_id, CAST({_SQL_COST} AS BIGINT) AS want_cost
      FROM documents
    ), bins AS (
      SELECT s.shard, s.bin_id,
             CAST(sum(s.cost) AS BIGINT) AS fill,
             CAST(count(*) AS BIGINT) AS n_docs_bin,
             CAST(sum(CASE WHEN s.cost <> c.want_cost THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cost_mismatch
      FROM scratch s JOIN costs c USING (doc_id)
      GROUP BY 1, 2
    )
    SELECT shard,
           CAST(sum(n_docs_bin) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(CASE WHEN fill > {PACK_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oversize,
           CAST(COALESCE(max(CASE WHEN fill <= {PACK_BUDGET}
                                  THEN fill END), 0)
                AS BIGINT) AS max_regular_fill,
           CAST(sum(CASE WHEN 2 * fill <= {PACK_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_light_bins,
           CAST(min(CASE WHEN fill > {PACK_BUDGET}
                         THEN CAST(n_docs_bin = 1 AS INT)
                         ELSE 1 END) AS INT) AS oversize_singletons_ok,
           CAST(COALESCE(max(CASE WHEN fill <= {PACK_BUDGET}
                                  THEN fill END), 0) <= {PACK_BUDGET}
                AS INT) AS budget_ok,
           CAST(sum(CASE WHEN 2 * fill <= {PACK_BUDGET} THEN 1 ELSE 0 END)
                <= 1 AS INT) AS cert_ok
    FROM bins
    WHERE (SELECT sum(n_cost_mismatch) FROM bins) = 0
    GROUP BY shard
    """
    rq = _R._REGISTRY["pk16_bestfit_pack_audit"]
    if rq.oracle is None:
        _R._REGISTRY["pk16_bestfit_pack_audit"] = dataclasses.replace(
            rq, oracle=sql
        )


_attach_pk16_oracle()
