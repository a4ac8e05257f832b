"""Suffix-array construction + exact-substring duplicate spans — the
Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") exact-substring method, re-expressed as distributed prefix
doubling in pure DataFrame ops.

The gram/winnowing rungs (d15/d16, d8) FIND likely duplicated spans
probabilistically; the suffix-array rung finds EVERY exact repeat of
length >= SPAN_L with zero false negatives — the method the
exact-substring dedup literature actually uses. Construction is
Manber-Myers prefix doubling: rank suffixes by their first 2^k
characters, then re-rank by the pair (rank[pos], rank[pos + 2^k])
until all ranks are distinct — O(log n) rounds, each round one
self-join + one re-rank, all DataFrame ops.

ORACLE (first-principles, the strongest class in this repo — no
scratch, no materialization): DuckDB re-derives the ENTIRE suffix
array independently by brute-force sorting the suffixes themselves
(`row_number() OVER (ORDER BY substring(s, pos+1))`) from its own
string_agg of the same documents. The two derivations share NOTHING
but the corpus and the definition of lexicographic order — a
doubling-step bug, a rank-tie slip, or an off-by-one in the pair
offset is a red hash mismatch on every row after the first divergence.
Both engines pre-normalize to printable ASCII with the same regex so
Java's UTF-16 comparison and DuckDB's UTF-8 byte order provably
coincide.

AUDIT-SCALE rung, like the quadratic d6/d9 audits: the slice is a
deterministic doc sample (doc_id % SA_DOC_MOD == 0 — ~1/97 of the
corpus, ~14 kB at sf0.1) because the ORACLE side is a brute-force
suffix sort. The Spark construction itself scales far beyond the
slice: at 100 TB the global dense_rank window below becomes a
range-partitioned re-rank (repartitionByRange on the rank pair +
sortWithinPartitions + per-partition count offsets), the per-round
localCheckpoint stays (it cuts the exponential lineage exactly like
d12's connected components), and the corpus shards by segment with
>= SPAN_L character overlap at the boundaries so no cross-shard span
is missed. Rounds are O(log n) whatever the corpus.

Reference surface: none (the reference has no dedup at all); this is
part of the engine's LLM-training-data extension alongside d1-d20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query
from a3_fp_bigdata_spark.session import session_token

#: deterministic doc sample for the audit slice (~1/47 of the corpus —
#: sized so even sf0.01's slice carries real >= SPAN_L repeats and the
#: d22 parity row verifies actual spans, not an empty set)
SA_DOC_MOD = 47
#: document separator — sorts below every printable char, can never
#: appear inside a normalized document, and span windows containing it
#: are excluded so no span stitches across documents
SA_SEP = "\x01"
#: exact-repeat threshold for d22 (Lee et al. use 50 BPE tokens; 20
#: chars is the same order on this corpus's short synthetic docs)
SPAN_L = 20

#: the slice normalization BOTH engines apply before concatenation:
#: printable ASCII only, so Spark's UTF-16 and DuckDB's UTF-8 orders
#: provably agree (the corpus is ASCII already — this is the guard)
_NORM_RE = "[^ -~]"


def _slice_sql() -> str:
    """DuckDB CTEs producing the SAME slice string + suffix positions
    the Spark builder produces (shared by both oracles below)."""
    return f"""
    WITH sl AS (
      SELECT string_agg(regexp_replace(text, '{_NORM_RE}', '', 'g'),
                        chr(1) ORDER BY doc_id) AS s
      FROM documents WHERE doc_id % {SA_DOC_MOD} = 0
    ), pos AS (
      SELECT CAST(unnest(range(length(s))) AS INT) AS p, s FROM sl
    ), keep AS (
      SELECT p, s FROM pos WHERE substring(s, p + 1, 1) != chr(1)
    )
    """


def corpus_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row frame (s string): the normalized, separator-joined doc
    sample, ordered by doc_id — byte-identical to _slice_sql's `sl`."""
    docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % SA_DOC_MOD == 0
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("doc_id").alias("doc_id"),
                    F.regexp_replace("text", _NORM_RE, "").alias("t"),
                )
            )
        ),
        lambda st: st.t,
    )
    return docs.agg(F.array_join(ordered, SA_SEP).alias("s"))


#: One construction per (session, sf_dir): d21 and d22 consume the
#: same array; the checkpointed rank blocks live for the session (the
#: ml _FIT_CACHE protocol — release_pinned doesn't touch them).
_SA_CACHE: dict[tuple[str, str], DataFrame] = {}


def build_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sa_rank, pos) — the suffix array of the slice by prefix
    doubling. Driver loop holds only a 1-row max-rank probe per round
    (a bounded collect, like d12's convergence check); each round
    localCheckpoints to cut the exponential lineage. The corpus string
    itself never rides per-row through a shuffle: every frame here
    carries only (pos, rank) ints; consumers needing characters attach
    the 1-row slice via broadcast at projection time (d22)."""
    key = (session_token(spark), sf_dir)
    if key in _SA_CACHE:
        return _SA_CACHE[key]
    sl = corpus_slice(spark, sf_dir)
    # the (?!^) lookahead also matches at end-of-string, and Spark's
    # split keeps trailing empties (Java limit -1) — drop the final
    # zero-length token or a phantom empty suffix takes rank 1
    base = sl.select(
        F.posexplode(F.split(F.col("s"), "(?!^)")).alias("pos", "ch")
    ).filter(F.length("ch") == 1)
    # initial rank: the character code (pure ASCII after normalization)
    ranks = base.select(
        "pos", F.ascii("ch").cast("long").alias("rnk")
    ).localCheckpoint(eager=True)
    n = ranks.count()
    step = 1
    w = Window.orderBy("r1", "r2")
    while step < n:
        nxt = ranks.select(
            (F.col("pos") - step).alias("pos"),
            F.col("rnk").alias("r2"),
        )
        paired = (
            ranks.withColumnRenamed("rnk", "r1")
            .join(nxt, "pos", "left")
            .na.fill({"r2": -1})
        )
        ranks = paired.select(
            "pos", F.dense_rank().over(w).cast("long").alias("rnk")
        ).localCheckpoint(eager=True)
        # convergence probe: all ranks distinct -> done (1-row agg,
        # bounded collect)
        if ranks.agg(F.max("rnk")).first()[0] >= n:
            break
        step *= 2
    keep = base.filter(F.col("ch") != SA_SEP).select("pos")
    out_w = Window.orderBy("rnk")
    sa = (
        ranks.join(keep, "pos")
        .select(
            F.row_number().over(out_w).cast("int").alias("sa_rank"),
            F.col("pos").cast("int").alias("pos"),
        )
        .localCheckpoint(eager=True)
    )
    _SA_CACHE[key] = sa
    return sa


@query(
    "d21_suffix_array",
    oracle=_slice_sql()
    + """
    SELECT CAST(row_number() OVER (ORDER BY substring(s, p + 1))
                AS INT) AS sa_rank,
           p AS pos
    FROM keep
    """,
)
def d21_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The suffix array itself (sa_rank, pos) over the audit slice —
    Spark builds it by distributed prefix doubling, DuckDB by an
    independent brute-force suffix sort (see module docstring)."""
    return build_suffix_array(spark, sf_dir)


@query(
    "d22_exact_substring_spans",
    oracle=_slice_sql()
    + f"""
    , sa AS (
      SELECT p, s,
             row_number() OVER (ORDER BY substring(s, p + 1)) AS r
      FROM keep
    ), adj AS (
      SELECT a.p AS pos_a, b.p AS pos_b,
             substring(a.s, a.p + 1, {SPAN_L}) AS span, a.s AS s
      FROM sa a JOIN sa b ON b.r = a.r + 1
    )
    SELECT pos_a, pos_b, span
    FROM adj
    WHERE length(span) = {SPAN_L}
      AND span = substring(s, pos_b + 1, {SPAN_L})
      AND position(chr(1) IN span) = 0
      AND position(chr(1) IN substring(s, pos_b + 1, {SPAN_L})) = 0
    """,
)
def d22_exact_substring_spans(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every exact repeated substring of length >= {SPAN_L} in the
    slice, with ZERO false negatives: any repeat makes its occurrences
    lexicographic NEIGHBORS in the suffix array, so comparing each
    adjacent pair's {SPAN_L}-char prefixes finds them all (Lee et al.
    2022 §3; the gram rungs d15/d18 are the probabilistic
    complement). Windows containing the document separator are
    excluded so spans never stitch across documents. Output is the
    adjacent pair list (pos_a, pos_b, span); production joins
    positions back to (doc_id, offset) via the slice offset table and
    cuts the spans exactly like d16."""
    sa = build_suffix_array(spark, sf_dir)
    nxt = sa.select(
        (F.col("sa_rank") - 1).alias("sa_rank"),
        F.col("pos").alias("pos_b"),
    )
    # attach the 1-row slice by broadcast ONLY here, at projection
    # time — the spans are cut and the corpus bytes dropped inside one
    # stage, so the string never materializes per row. The slice is
    # attached as BINARY: Spark's string substring walks UTF-8 from
    # byte 0 to find a char offset (O(position) per call, and the
    # filter re-evaluates each span per predicate — measured ~10 s at
    # sf0.1), while binary substring is an O(1) slice; the slice is
    # printable-ASCII by construction, so bytes == chars exactly.
    sl_bin = corpus_slice(spark, sf_dir).select(
        F.encode("s", "UTF-8").alias("s_bin")
    )
    adj = (
        sa.join(nxt, "sa_rank")
        .select(F.col("pos").alias("pos_a"), "pos_b")
        .crossJoin(F.broadcast(sl_bin))
    )
    span_a = F.substring(F.col("s_bin"), F.col("pos_a") + 1, SPAN_L)
    span_b = F.substring(F.col("s_bin"), F.col("pos_b") + 1, SPAN_L)
    return adj.filter(
        (F.length(span_a) == SPAN_L)
        & (span_a == span_b)
        & (F.instr(F.decode(span_a, "UTF-8"), SA_SEP) == 0)
        & (F.instr(F.decode(span_b, "UTF-8"), SA_SEP) == 0)
    ).select(
        "pos_a", "pos_b", F.decode(span_a, "UTF-8").alias("span")
    )

#: LCP cap: repeats are interesting from SPAN_L up; 64 bounds the
#: per-pair work (64 O(1) binary slices) whatever the true overlap.
LCP_CAP = 64


def _lcp_terms_sql() -> str:
    """Sum of monotone prefix-equality indicators == the capped LCP
    (equality at L implies equality at every l < L, so the indicator
    staircase sums to max L). Rendered from ONE generator for both
    engines."""
    return " + ".join(
        f"(CASE WHEN substring(a.s, a.p + 1, {L}) ="
        f" substring(a.s, b.p + 1, {L}) THEN 1 ELSE 0 END)"
        for L in range(1, LCP_CAP + 1)
    )


@query(
    "d23_lcp_array",
    oracle=_slice_sql()
    + f"""
    , sa AS (
      SELECT p, s,
             row_number() OVER (ORDER BY substring(s, p + 1)) AS r
      FROM keep
    )
    SELECT CAST(a.r AS INT) AS sa_rank,
           a.p AS pos_a, b.p AS pos_b,
           CAST({_lcp_terms_sql()} AS INT) AS lcp
    FROM sa a JOIN sa b ON b.r = a.r + 1
    """,
)
def d23_lcp_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (capped) LCP array over the audit slice — with d21 this is
    the standard exact-dedup toolkit: lcp[i] = length of the common
    prefix of SA-adjacent suffixes, the structure every repeated-
    substring statistic (longest repeat, repeat histograms, d22's
    span threshold) reads off directly. Computed WITHOUT per-char
    loops on either engine: by the prefix property, equality at
    length L implies equality at every shorter length, so the sum of
    {LCP_CAP} monotone equality indicators IS max(L) — each indicator
    one O(1) binary slice compare (see d22's binary-lane note). The
    oracle re-derives the same pairs and the same staircase from its
    own independent suffix sort. Separators need no special case: a
    separator byte only ever equals another separator, and SA-adjacent
    suffixes from different documents mismatch at or before it."""
    sa = build_suffix_array(spark, sf_dir)
    nxt = sa.select(
        (F.col("sa_rank") - 1).alias("sa_rank"),
        F.col("pos").alias("pos_b"),
    )
    sl_bin = corpus_slice(spark, sf_dir).select(
        F.encode("s", "UTF-8").alias("s_bin")
    )
    adj = (
        sa.join(nxt, "sa_rank")
        .select("sa_rank", F.col("pos").alias("pos_a"), "pos_b")
        .crossJoin(F.broadcast(sl_bin))
    )
    lcp = sum(
        (
            F.substring(F.col("s_bin"), F.col("pos_a") + 1, L)
            == F.substring(F.col("s_bin"), F.col("pos_b") + 1, L)
        ).cast("int")
        for L in range(1, LCP_CAP + 1)
    )
    return adj.select(
        "sa_rank", "pos_a", "pos_b", lcp.cast("int").alias("lcp")
    )
