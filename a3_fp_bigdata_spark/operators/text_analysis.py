"""Text-analysis operators over the documents table.

Covers the reference's text logic (F1 keyword extraction app.py:81-96,
F2 token-overlap matching app_scraper.py:13-39) and the training-data
pipeline primitives: language id, quality scoring, token counting,
fingerprinting. All pure Column expressions (functions/text.py) — no
Python UDFs, so at 100 TB these run at parquet scan speed inside
whole-stage codegen with zero shuffle (except the explode in F1, which
is a narrow transformation anyway).

Oracle parity: the DuckDB SQL embeds the exact same normalization
pipeline (lower -> punct->space -> squeeze -> trim -> split) and the same
vocabulary literals, so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.functions import text as TX
from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql
from a3_fp_bigdata_spark.registry import query

# DuckDB rendering of functions.text.normalize / tokens — keep in sync.
_SQL_NORM = (
    r"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),"
    r" '\s+', ' ', 'g'))"
)
_SQL_TOKS = f"list_filter(string_split({_SQL_NORM}, ' '), t -> length(t) > 0)"

_QUERY_TOKENS = ("spark", "shuffle", "merge", "sort", "hash")


@query(
    "f1_extract_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    )
    SELECT doc_id, tok AS keyword
    FROM toks
    WHERE length(tok) >= 3 AND tok NOT IN ({TX.sql_quoted_list(TX.STOPWORDS)})
    """,
)
def f1_extract_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: per-document keyword stream (normalize -> tokenize -> drop
    stopwords/short tokens -> explode). Reference app.py:93-96 did this
    row-at-a-time in Python; here it's one codegen'd expression."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(TX.keywords(F.col("text"))).alias("keyword")
    )


@query(
    "f2_token_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_SQL_TOKS}) AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(list_intersect(t, [{TX.sql_quoted_list(_QUERY_TOKENS)}]))
                AS INT) AS common_cnt
    FROM toks
    WHERE len(list_intersect(t, [{TX.sql_quoted_list(_QUERY_TOKENS)}])) >= 3
    """,
)
def f2_token_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: token-set overlap matching (reference compare_titles,
    app_scraper.py:13-39: >= 3 common tokens). The probe token set is a
    literal array, so the predicate is a broadcast-free scan filter."""
    docs = table(spark, sf_dir, "documents")
    probe = F.array(*[F.lit(t) for t in _QUERY_TOKENS])
    common = TX.token_overlap_count(TX.tokens(F.col("text")), probe)
    return (
        docs.select("doc_id", common.alias("common_cnt"))
        .filter(F.col("common_cnt") >= 3)
    )


@query(
    "tx1_lang_id",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), scored AS (
      SELECT doc_id,
             CAST(len(list_filter(t, w -> w IN
                  ({TX.sql_quoted_list(TX.EN_FUNCTION_WORDS)}))) AS DOUBLE)
             / greatest(len(t), 1) AS ratio
      FROM toks
    )
    SELECT doc_id, {half_up_sql('ratio')} AS en_ratio,
           CASE WHEN ratio >= 0.12 THEN 'en' ELSE 'other' END AS lang_guess
    FROM scored
    """,
)
def tx1_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language id via function-word ratio (n-gram heuristic). Exact
    rational arithmetic -> reproducible on any engine."""
    docs = table(spark, sf_dir, "documents")
    ratio = TX.stopword_ratio(F.col("text"))
    return docs.select(
        "doc_id",
        half_up(ratio, 4).alias("en_ratio"),
        TX.lang_guess(F.col("text")).alias("lang_guess"),
    )


#: DuckDB rendering of TX.quality_score as chainable CTEs ending in
#: ``quality(doc_id, quality)`` — shared by tx2's oracle and d14's
#: (dedup.py) quality-aware keeper policy. Expression order matches
#: functions/text.py:83 op-for-op so the doubles are bit-identical.
def _build_quality_ctes() -> str:
    return f"""qbase AS (
      SELECT doc_id, text, {_SQL_TOKS} AS t FROM documents
    ), qcomps AS (
      SELECT doc_id,
             least(len(t) / 50.0, 1.0) AS len_c,
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                  AS DOUBLE) / greatest(length(text), 1) AS alpha_c,
             least(4 * CAST(len(list_filter(t, w -> w IN
                  ({TX.sql_quoted_list(TX.EN_FUNCTION_WORDS)}))) AS DOUBLE)
                  / greatest(len(t), 1), 1.0) AS stop_c
      FROM qbase
    ), quality AS (
      SELECT doc_id, len_c / 3 + alpha_c / 3 + stop_c / 3 AS quality
      FROM qcomps
    )"""


_SQL_QUALITY_CTES = _build_quality_ctes()


@query(
    "tx2_quality_score",
    oracle=f"""
    WITH {_SQL_QUALITY_CTES}
    SELECT doc_id, {half_up_sql('quality')} AS quality FROM quality
    """,
)
def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length saturation + alphabetic purity + stopword
    presence (the filter stage of a pretraining data pipeline)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        half_up(TX.quality_score(F.col("text")), 4).alias("quality"),
    )


@query(
    "tx3_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT) AS n_bpe_tokens
    FROM documents
    """,
)
def tx3_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex count (letter
    runs / digit runs / lone symbols) — the cost model for tokenizer
    budgeting over a corpus."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.ws_token_count(F.col("text")).alias("n_ws_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


@query(
    "tx4_fingerprint",
    oracle=f"""
    SELECT doc_id, md5({_SQL_NORM}) AS fp
    FROM documents
    """,
)
def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text — the exact-dedup
    key (128-bit, collision-safe at 100 TB)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


@query(
    "tx5_curation_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, text, {_SQL_TOKS} AS t FROM documents
    ), feats AS (
      SELECT doc_id, source,
             CAST(len(list_filter(t, w -> w IN
                  ({TX.sql_quoted_list(TX.EN_FUNCTION_WORDS)}))) AS DOUBLE)
               / greatest(len(t), 1) AS en_ratio,
             least(len(t) / 50.0, 1.0) / 3
               + (CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                       AS DOUBLE) / greatest(length(text), 1)) / 3
               + least(4 * CAST(len(list_filter(t, w -> w IN
                  ({TX.sql_quoted_list(TX.EN_FUNCTION_WORDS)}))) AS DOUBLE)
                  / greatest(len(t), 1), 1.0) / 3 AS quality,
             md5(array_to_string(t, ' ')) AS fp
      FROM scored
    ), kept AS (
      SELECT * FROM feats
      WHERE en_ratio >= 0.12 AND quality >= 0.5
    ), deduped AS (
      SELECT source, fp, min(doc_id) AS keeper,
             count(*) AS n_copies
      FROM kept GROUP BY source, fp
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dropped_dups
    FROM deduped GROUP BY source
    """,
)
def tx5_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-curation shape every LLM data pipeline
    runs, composed from this engine's own operators: language gate
    (tx1's function-word ratio) -> quality gate (tx2's score) -> exact
    near-copy collapse (d1's content-fingerprint groupBy, keyed per
    source) -> per-source yield stats. One declarative plan: Catalyst
    fuses the gates into the scan filter and the dedup+stats into two
    aggregations; nothing materializes between stages."""
    docs = table(spark, sf_dir, "documents")
    kept = docs.select(
        "doc_id",
        "source",
        TX.stopword_ratio(F.col("text")).alias("en_ratio"),
        TX.quality_score(F.col("text")).alias("quality"),
        F.md5(F.concat_ws(" ", TX.tokens(F.col("text")))).alias("fp"),
    ).filter((F.col("en_ratio") >= 0.12) & (F.col("quality") >= 0.5))
    deduped = kept.groupBy("source", "fp").agg(
        F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies")
    )
    return deduped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_copies") - F.count("*"))
        .cast("long")
        .alias("n_dropped_dups"),
    )


SAMPLE_PCT = 10
SAMPLE_MULT = 2654435761  # Knuth multiplicative hash constant
SAMPLE_PREMOD = 1_000_003  # pre-reduce the key so the product fits int64


def sample_predicate(key: Column, pct: int = SAMPLE_PCT) -> Column:
    """tx6's deterministic multiplicative-hash sample as a reusable,
    scan-pushable predicate (engine-portable: plain int64 arithmetic)."""
    return ((key % SAMPLE_PREMOD) * SAMPLE_MULT) % 100 < pct


def sample_predicate_sql(key: str, pct: int = SAMPLE_PCT) -> str:
    """The same predicate in ANSI SQL for oracle mirroring."""
    return f"((({key}) % {SAMPLE_PREMOD}) * {SAMPLE_MULT}) % 100 < {pct}"


@query(
    "tx6_systematic_sample",
    oracle=f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE {sample_predicate_sql('doc_id')}
    """,
)
def tx6_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {SAMPLE_PCT}% corpus sample via multiplicative-hash
    arithmetic on the key — the reproducible subsampling every training
    run needs (df.sample() is seed+partitioning dependent; key
    arithmetic is stable across engines, partitionings, and reruns, so
    the sample is auditable and the oracle reproduces it exactly). The
    predicate is scan-pushable: sampling costs a filter, not a
    shuffle. The key is pre-reduced mod {SAMPLE_PREMOD} so the product
    can never overflow int64 (a raw doc_id * constant wraps negative
    past ~3.5e9 ids — exactly the scale this sampler targets)."""
    docs = table(spark, sf_dir, "documents")
    return docs.filter(sample_predicate(F.col("doc_id"))).select(
        "doc_id", "source", "lang"
    )


def _sql_ngrams(n: int) -> str:
    """DuckDB rendering of space-joined word n-grams over token list
    ``w`` (1-based; empty when len(w) < n) — the string twin of the
    hashed shingles dedup._shingle_rows emits."""
    terms = " || ' ' || ".join(f"w[i+{j}]" if j else "w[i]" for j in range(n))
    return f"list_transform(range(1, len(w) - {n - 2}), i -> {terms})"


REP_NGRAM = 3  # repetition measured over word trigrams (Gopher-style)


@query(
    "tx8_repetition_ngrams",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ), g AS (
      SELECT doc_id, unnest({_sql_ngrams(REP_NGRAM)}) AS g
      FROM words WHERE len(w) >= {REP_NGRAM}
    )
    SELECT doc_id,
           count(*) AS n_ngrams,
           count(DISTINCT g) AS n_distinct,
           {half_up_sql('1 - count(DISTINCT g) / CAST(count(*) AS DOUBLE)')} + 0.0
             AS rep_ratio
    FROM g GROUP BY doc_id
    """,
)
def tx8_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score — the Gopher-style quality
    filter: fraction of a doc's word {REP_NGRAM}-grams that are
    repeats (1 - distinct/total). Templated/spammy text scores high
    and gets dropped by a downstream threshold; the score itself stays
    a pure per-doc aggregate so the filter composes with any pipeline.

    Scale: one map-side-combinable aggregation over the gram rows the
    dedup ladder already derives — no new shuffle shape anywhere. A
    shuffle-free per-row variant (size / size∘array_distinct over the
    un-exploded gram array) was prototyped in r15 and REJECTED: the
    `size(g) > 0` row filter on an un-exploded array column is the
    documented Catalyst re-inlining trap (the gram transform and the
    tokenizer get duplicated across the pushed filter and every
    projection reference — measured 38.9 s vs ~1 s at sf0.1). The
    exploded-rows + groupBy form keeps every expression evaluated
    once."""
    from a3_fp_bigdata_spark.operators.dedup import _shingle_rows

    ex_all = _shingle_rows(spark, sf_dir, REP_NGRAM, distinct=False)
    ratio = F.lit(1.0) - F.count_distinct("shingle") / F.count("*")
    return ex_all.groupBy("doc_id").agg(
        F.count("*").alias("n_ngrams"),
        F.count_distinct("shingle").alias("n_distinct"),
        (half_up(ratio, 4) + F.lit(0.0)).alias("rep_ratio"),
    )


DECON_NGRAM = 8      # benchmark-overlap n-gram width (decontamination)
DECON_BENCH_PCT = 10  # the held-out "benchmark" = 10% of docs, by id hash


@query(
    "tx9_decontaminate",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ), g AS (
      SELECT DISTINCT doc_id, unnest({_sql_ngrams(DECON_NGRAM)}) AS g
      FROM words WHERE len(w) >= {DECON_NGRAM}
    ), bench AS (
      SELECT DISTINCT g FROM g
      WHERE {sample_predicate_sql('doc_id', DECON_BENCH_PCT)}
    ), train AS (
      SELECT doc_id, g FROM g
      WHERE NOT ({sample_predicate_sql('doc_id', DECON_BENCH_PCT)})
    )
    SELECT doc_id, count(*) AS n_hits
    FROM train JOIN bench USING (g)
    GROUP BY doc_id
    """,
)
def tx9_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag training documents sharing at
    least one word {DECON_NGRAM}-gram with the held-out benchmark set
    (tx6's deterministic {DECON_BENCH_PCT}% split stands in for a real
    eval suite). Output: contaminated doc -> number of distinct shared
    {DECON_NGRAM}-grams; a downstream filter anti-joins this.

    Scale: the benchmark n-gram set is tiny relative to the corpus
    (eval suites are MBs against TBs), so it BROADCASTS — the corpus
    side is one scan + broadcast-hash join + per-doc count, no corpus
    shuffle at all. Long n-grams keep false positives out (a shared
    {DECON_NGRAM}-gram is quotation, not coincidence)."""
    from a3_fp_bigdata_spark.operators.dedup import _shingle_rows

    ex = _shingle_rows(spark, sf_dir, DECON_NGRAM)  # distinct rows
    is_bench = sample_predicate(F.col("doc_id"), DECON_BENCH_PCT)
    bench_grams = ex.filter(is_bench).select("shingle").distinct()
    train = ex.filter(~is_bench)
    return (
        train.join(F.broadcast(bench_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


PROFILE_K = 20  # trigrams per language profile
#: Profiles are FIT on a deterministic sample (tx6's predicate), not the
#: full corpus: trigram frequency ranks converge long before full-corpus
#: counts, so at 100 TB the fit stage reads ~1/4 of the data while the
#: classify stage still scores every document. 25% here keeps per-lang
#: sample sizes honest at test scale; at production scale drop it to ~1%
#: — the constant is the only knob, both engines share it.
PROFILE_SAMPLE_PCT = 25


@query(
    "tx7_ngram_lang_confusion",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, lang, {_SQL_NORM} AS t FROM documents
    ), tri AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, length(t) - 1),
                    i -> substr(t, CAST(i AS INT), 3))) AS tri
      FROM norm WHERE length(t) >= 3
    ), prof AS (
      SELECT lang, tri FROM (
        SELECT lang, tri, row_number() OVER (
                 PARTITION BY lang
                 ORDER BY count(*) DESC, tri) AS rn
        FROM tri
        WHERE {sample_predicate_sql('doc_id', PROFILE_SAMPLE_PCT)}
        GROUP BY lang, tri
      ) WHERE rn <= {PROFILE_K}
    ), doc_tri AS (
      SELECT DISTINCT doc_id, lang, tri FROM tri
    ), overlap AS (
      SELECT d.doc_id, d.lang, p.lang AS cand,
             count(*) AS n_common
      FROM doc_tri d JOIN prof p USING (tri)
      GROUP BY 1, 2, 3
    ), pred AS (
      SELECT doc_id, lang, cand AS predicted FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY doc_id
                 ORDER BY n_common DESC, cand) AS rn
        FROM overlap
      ) WHERE rn = 1
    )
    SELECT lang, predicted, count(*) AS n
    FROM pred GROUP BY lang, predicted
    """,
)
def tx7_ngram_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-n-gram language ID, trained and applied in ONE relational
    plan: per-language trigram profiles (top {PROFILE_K} by frequency,
    deterministic ties) built from the corpus, every document scored by
    profile overlap, argmax prediction, confusion matrix out. The whole
    thing is three aggregations and a broadcast-sized profile join — a
    'fit + transform' expressed as a plan, no ML library, fully
    oracle-checkable because every step is count/rank arithmetic on
    ASCII-normalized text. The fit stage reads only tx6's deterministic
    {PROFILE_SAMPLE_PCT}% sample (see PROFILE_SAMPLE_PCT) — the scan-
    pushable predicate keeps profile building sublinear in the corpus
    while classification stays full-coverage.

    Scale shape (one doc-grain exchange fewer than the naive plan,
    and no per-doc sort): the per-doc trigram DEDUP happens scan-side
    (explode of array_distinct — within-doc uniqueness needs no
    exchange), so the full-corpus `distinct` shuffle the naive form
    pays is gone; and the per-doc argmax is a hash AGGREGATE of
    min(struct(-n_common, cand)) (score desc, cand asc — the oracle's
    exact tie order) instead of a row_number window — that still pays
    its (doc_id, lang) exchange, but sorts nothing. Remaining
    exchanges: the sampled profile aggregation + its |langs|-partition
    rank (model-sized), ONE doc-grain overlap aggregate over profile-
    matching trigrams, the doc x |langs|-bounded argmax, and the
    |langs|^2-row confusion matrix."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    t = TX.normalize(F.col("text"))
    norm = docs.select("doc_id", "lang", t.alias("t")).filter(
        F.char_length("t") >= 3
    )
    tri = norm.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(t) - 2), "
                "i -> substring(t, CAST(i AS INT), 3))"
            )
        ).alias("tri"),
    )
    wp = Window.partitionBy("lang").orderBy(
        F.desc("cnt"), F.asc("tri")
    )
    prof = (
        tri.filter(sample_predicate(F.col("doc_id"), PROFILE_SAMPLE_PCT))
        .groupBy("lang", "tri")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= PROFILE_K)
        .select(F.col("lang").alias("cand"), "tri")
    )
    doc_tri = norm.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, char_length(t) - 2), "
                    "i -> substring(t, CAST(i AS INT), 3))"
                )
            )
        ).alias("tri"),
    )
    overlap = (
        doc_tri.join(F.broadcast(prof), "tri")
        .groupBy("doc_id", "lang", "cand")
        .agg(F.count("*").alias("n_common"))
    )
    pred = (
        overlap.groupBy("doc_id", "lang")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n_common")).alias("neg"),
                    F.col("cand").alias("cand"),
                )
            ).alias("best")
        )
        .select("lang", F.col("best.cand").alias("predicted"))
    )
    return pred.groupBy("lang", "predicted").agg(
        F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# tx10: PII redaction
# --------------------------------------------------------------------------

#: Redaction patterns, applied IN ORDER (email first: it embeds chars the
#: later patterns could partially claim). Kept to the regex subset with
#: identical semantics in Java (Spark) and RE2 (DuckDB): no lookarounds,
#: no backrefs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    (r"\b\d{3}-\d{4}\b", "<PHONE>"),
)

#: The synthetic docs carry no natural PII (pure word streams), so the
#: query STAGES a deterministic contact blob per doc — identically in
#: both engines — and redacts it; redaction correctness is then checked
#: on realistic shapes without shipping real PII in testdata.
_SQL_WITH_PII = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST(doc_id % 100 AS VARCHAR)"
    " || ' call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)"
)


def redact_pii(text: Column) -> Column:
    """Chained native regexp_replace — scan-side, no Python, no shuffle.
    At 100 TB this is the cheapest possible curation pass: pure
    map-stage expression fused into whole-stage codegen."""
    out = text
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


@query(
    "tx10_redact_pii",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, {_SQL_WITH_PII} AS t FROM documents
    )
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{PII_PATTERNS[0][0]}', '<EMAIL>', 'g'),
               '{PII_PATTERNS[1][0]}', '<IP>', 'g'),
               '{PII_PATTERNS[2][0]}', '<PHONE>', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(t, '{PII_PATTERNS[0][0]}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{PII_PATTERNS[1][0]}')) AS INT)
             AS n_ips,
           CAST(len(regexp_extract_all(t, '{PII_PATTERNS[2][0]}')) AS INT)
             AS n_phones
    FROM staged
    """,
)
def tx10_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the staged corpus: emails, IPv4s and phone
    numbers replaced by typed placeholders, with per-category hit
    counts. DuckDB's regexp_replace needs the explicit 'g' flag to match
    Spark's replace-all semantics — the oracle carries it."""
    docs = table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(" call 555-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        ).alias("t"),
    )
    return staged.select(
        "doc_id",
        F.md5(redact_pii(F.col("t")).cast("binary")).alias("redacted_md5"),
        F.regexp_count(F.col("t"), F.lit(PII_PATTERNS[0][0])).alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(PII_PATTERNS[1][0])).alias("n_ips"),
        F.regexp_count(F.col("t"), F.lit(PII_PATTERNS[2][0])).alias("n_phones"),
    )


@query(
    "tx11_corpus_stats",
    oracle=rf"""
    WITH c AS (
      SELECT lang, source,
             CAST(len(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS cost
      FROM documents
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(cost) AS BIGINT) AS total_tokens,
           {half_up_sql('avg(cost)')} AS mean_tokens,
           {half_up_sql('quantile_cont(cost, 0.5)')} AS p50_tokens,
           {half_up_sql('quantile_cont(cost, 0.95)')} AS p95_tokens,
           {half_up_sql('stddev_samp(cost)')} AS sd_tokens
    FROM c GROUP BY lang, source
    """,
)
def tx11_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: per-(lang, source) token-count distribution —
    the dataset card every pipeline publishes (counts, mean, exact
    interpolated p50/p95, stddev). Spark's `percentile` and DuckDB's
    `quantile_cont` share linear-interpolation semantics, so the oracle
    is value-exact.

    Scale: one hash aggregate; `percentile` (exact) buffers each
    group's values — per-group cardinality here is corpus/groups. For
    billions of docs per group swap `percentile_approx` (t-digest,
    bounded memory) and drop the oracle to tolerance-compare; the
    profile shape is otherwise identical."""
    docs = table(spark, sf_dir, "documents")
    c = docs.select(
        "lang", "source",
        TX.bpe_ish_token_count(F.col("text")).cast("long").alias("cost"),
    )
    return c.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("cost").cast("bigint").alias("total_tokens"),
        half_up(F.avg("cost"), 4).alias("mean_tokens"),
        half_up(F.expr("percentile(cost, 0.5)"), 4).alias("p50_tokens"),
        half_up(F.expr("percentile(cost, 0.95)"), 4).alias("p95_tokens"),
        half_up(F.stddev_samp("cost"), 4).alias("sd_tokens"),
    )


#: DuckDB rendering of the tx4 fingerprint (md5 over normalized text) —
#: public so split/leakage oracles (packing.pk7) stay in sync with tx4.
SQL_FINGERPRINT = f"md5({_SQL_NORM})"


def collapse_runs(segments: Column) -> Column:
    """Drop each segment equal to its immediate predecessor (run-length
    collapse) — tx12's kept-segments expression, shared with the
    property test so the test can never drift from production. Spark
    filter lambdas index from 0; element_at is 1-based, so
    element_at(segments, i) IS the predecessor of 0-based position i."""
    return F.filter(
        segments,
        lambda x, i: (i == F.lit(0)) | (x != F.element_at(segments, i)),
    )


@query(
    "tx12_collapse_repeats",
    oracle="""
    WITH l AS (
      SELECT doc_id, string_split(text, ' ') AS ls FROM documents
    ), kept AS (
      SELECT doc_id, ls,
             list_filter(ls, (x, i) -> i = 1 OR x <> ls[i - 1]) AS ks
      FROM l
    )
    SELECT doc_id,
           CAST(len(ls) AS INT) AS n_segments,
           CAST(len(ks) AS INT) AS n_after,
           array_to_string(ks, ' ') AS clean_text
    FROM kept
    """,
)
def tx12_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition REMOVAL (tx8 scores repetition; this
    rewrites the text): split into segments, drop each segment equal to
    its immediate predecessor (run-length collapse), reassemble. The
    Gopher/C4 cleanup rung for stuttered generations and template spam
    — on real corpora the segment delimiter is the newline (duplicate
    *lines* collapse); this corpus is single-line so the registered
    form runs at word granularity, same algebra.

    Scale: pure per-row array lambdas (split -> indexed filter ->
    array_join) — whole-stage codegen, zero shuffle, zero Python; the
    rewrite rides the same parquet scan as any other per-doc map. The
    indexed lambda compares element i to element i-1 positionally, so
    no sort, no window, no self-join; both engines walk the list in
    index order and emit identical text."""
    docs = table(spark, sf_dir, "documents")
    ls = F.split(F.col("text"), " ")
    kept = collapse_runs(ls)
    return docs.select(
        "doc_id",
        F.size(ls).alias("n_segments"),
        F.size(kept).alias("n_after"),
        F.array_join(kept, " ").alias("clean_text"),
    )


#: Unigram-LM vocabulary cap: keep the LM_VOCAB_K most frequent sample
#: tokens (count desc, token asc — a deterministic total order). Real
#: LMs run a fixed vocabulary for the same reason this one does: the
#: scoring join's build side is then PROVABLY <= K rows at any corpus
#: size, so the broadcast can never outgrow executor memory (no Heaps'
#:-law growth, no runtime size guard needed). Everything below the cap
#: scores as OOV through the same add-one floor.
LM_VOCAB_K = 65_536


@query(
    "tx13_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ), counts AS (
      SELECT tok, count(*) AS c FROM toks
      WHERE {sample_predicate_sql('doc_id')}
      GROUP BY tok
      ORDER BY c DESC, tok
      LIMIT {LM_VOCAB_K}
    ), stats AS (
      SELECT CAST(sum(c) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS v
      FROM counts
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           {half_up_sql('avg(ln((COALESCE(c.c, 0) + 1.0) / (s.total + s.v)))')}
             + 0.0 AS avg_logprob
    FROM toks t LEFT JOIN counts c USING (tok) CROSS JOIN stats s
    GROUP BY t.doc_id
    """,
)
def tx13_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality proxy (the CCNet-style filter):
    fit add-one-smoothed unigram log-probabilities on the deterministic
    {SAMPLE_PCT}% sample (tx6's predicate — auditable, engine-stable),
    then score every document by its mean token log-probability.
    Gibberish and OOV-heavy docs score low and get dropped by a
    downstream threshold; the score is the standard cheap stand-in for
    a perplexity filter when no trained LM is at hand.

    Scale: the model IS a (token, count) table fit on the sample and
    capped at the LM_VOCAB_K most frequent entries (TakeOrdered — a
    distributed partial top-k, no global sort), so the scoring join's
    build side is bounded <= K rows at ANY corpus size and the
    broadcast hint is unconditionally safe; corpus scoring is scan ->
    explode -> broadcast-hash join -> per-doc avg; the only shuffle is
    the map-side-combinable (doc_id) re-aggregation. The fit itself
    shuffles only sample tokens. Both engines share exact integer
    counts; f64 ln/avg differ at ulp level at most, absorbed by
    round(4)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    counts = (
        toks.filter(sample_predicate(F.col("doc_id")))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(LM_VOCAB_K)
    )
    stats = counts.agg(
        F.sum("c").cast("double").alias("total"),
        F.count("*").cast("double").alias("v"),
    )
    lp = F.log(
        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
        / (F.col("total") + F.col("v"))
    )
    return (
        toks.join(F.broadcast(counts), "tok", "left")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            (half_up(F.avg("lp")) + F.lit(0.0)).alias("avg_logprob"),
        )
    )


#: Collocation mining floor/size: bigrams seen fewer than
#: BIGRAM_MIN_COUNT times carry no stable PMI signal (a count-1 bigram
#: of two rare words maxes the score); PMI_TOP_K bounds the result (and
#: the TakeOrdered) regardless of corpus size.
BIGRAM_MIN_COUNT = 5
PMI_TOP_K = 50


@query(
    "tx14_bigram_pmi",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ), uni AS (
      SELECT unnest(w) AS tok FROM words
    ), ucnt AS (
      SELECT tok, count(*) AS c FROM uni GROUP BY tok
    ), n AS (
      SELECT CAST(sum(c) AS DOUBLE) AS total FROM ucnt
    ), bg AS (
      SELECT unnest(list_transform(range(1, len(w)),
                    i -> [w[i], w[i+1]])) AS p
      FROM words WHERE len(w) >= 2
    ), bcnt AS (
      SELECT p[1] AS w1, p[2] AS w2, count(*) AS c
      FROM bg GROUP BY 1, 2
      HAVING count(*) >= {BIGRAM_MIN_COUNT}
    ), b AS (
      SELECT CAST(sum(c) AS DOUBLE) AS total
      FROM (SELECT count(*) AS c FROM bg)
    )
    SELECT w1, w2, CAST(bcnt.c AS BIGINT) AS n_pair,
           {half_up_sql('''ln((bcnt.c / b.total)
                    / ((u1.c / n.total) * (u2.c / n.total)))''')} + 0.0
             AS pmi
    FROM bcnt
    JOIN ucnt u1 ON u1.tok = w1
    JOIN ucnt u2 ON u2.tok = w2
    CROSS JOIN n CROSS JOIN b
    ORDER BY pmi DESC, w1, w2
    LIMIT {PMI_TOP_K}
    """,
)
def tx14_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent
    token pairs, ln(P(ab) / (P(a)P(b))) — the corpus-analysis rung
    that surfaces multi-word terms ("new york") for tokenizer vocab
    decisions and boilerplate detection (top-PMI pairs repeated across
    a crawl are navigation chrome). Floor {BIGRAM_MIN_COUNT} kills
    unstable rare-pair scores; output is the top {PMI_TOP_K} by
    (rounded PMI, w1, w2) — a deterministic total order both engines
    share.

    Scale: two map-side-combinable counting shuffles (unigrams,
    bigrams — both key on tokens, not documents), two broadcast-able
    count joins (the bigram side is already floored, the unigram side
    is vocab-sized; AQE picks broadcast when they fit, same argument
    as tx13's capped vocab), scalar totals via single-row cross joins,
    and a TakeOrdered final cut — no global sort, nothing driver-side."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(TX.tokens(F.col("text")).alias("w"))
    uni = words.select(F.explode(F.col("w")).alias("tok"))
    ucnt = uni.groupBy("tok").agg(F.count("*").alias("c"))
    n_total = ucnt.agg(F.sum("c").cast("double").alias("n_total"))
    bg = words.filter(F.size("w") >= 2).select(
        F.explode(
            F.transform(
                F.slice(F.col("w"), 1, F.size("w") - 1),
                lambda x, i: F.struct(
                    x.alias("w1"),
                    F.element_at(F.col("w"), i + 2).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    b_total = bg.agg(F.count("*").cast("double").alias("b_total"))
    bcnt = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= BIGRAM_MIN_COUNT)
    )
    u1 = ucnt.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = ucnt.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    # shared half-up rounding (functions.rounding): log-ratio scores
    # can land on exact decimal halves; native round() tips them
    # differently across engines
    pmi = half_up(
        F.log(
            (F.col("n_pair") / F.col("b_total"))
            / ((F.col("c1") / F.col("n_total"))
               * (F.col("c2") / F.col("n_total")))
        )
    ) + F.lit(0.0)
    return (
        bcnt.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(b_total))
        .select("w1", "w2", F.col("n_pair").cast("long").alias("n_pair"),
                pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOP_K)
    )


#: Bigram-LM caps (tx15): like tx13's LM_VOCAB_K, both model tables
#: are TakeOrdered-capped so the scoring joins' build sides are
#: PROVABLY bounded at any corpus size — contexts at the same 64 Ki
#: cap as the unigram vocabulary, bigrams at 256 Ki (a real bigram LM
#: keeps more pairs than contexts). Everything below a cap scores
#: through the same add-one floor as unseen pairs.
BIGRAM_LM_K = 262_144


@query(
    "tx15_bigram_logprob",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, {_SQL_TOKS} AS w FROM documents
    ), pairs AS (
      SELECT doc_id, p[1] AS w1, p[2] AS w2
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(w)),
                          i -> [w[i], w[i+1]])) AS p
            FROM words WHERE len(w) >= 2)
    ), fit AS (
      SELECT w1, w2 FROM pairs WHERE {sample_predicate_sql('doc_id')}
    ), ctx AS (
      SELECT w1, count(*) AS c1 FROM fit
      GROUP BY w1 ORDER BY c1 DESC, w1 LIMIT {LM_VOCAB_K}
    ), bcnt AS (
      SELECT w1, w2, count(*) AS cb FROM fit
      GROUP BY w1, w2 ORDER BY cb DESC, w1, w2 LIMIT {BIGRAM_LM_K}
    ), vocab AS (
      SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT unnest(w) AS tok FROM words
            WHERE {sample_predicate_sql('doc_id')})
    )
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {half_up_sql('''avg(ln((COALESCE(b.cb, 0) + 1.0)
                        / (COALESCE(c.c1, 0) + vocab.v)))''')} + 0.0
             AS avg_logprob
    FROM pairs p
    LEFT JOIN bcnt b ON b.w1 = p.w1 AND b.w2 = p.w2
    LEFT JOIN ctx c ON c.w1 = p.w1
    CROSS JOIN vocab
    GROUP BY p.doc_id
    """,
)
def tx15_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality proxy — tx13's CCNet-style filter
    raised to order 2, the form the CCNet pipeline actually ships
    (Wenzek et al. 2020 score Common Crawl with a 5-gram KenLM and cut
    the corpus at perplexity terciles): fit add-one-smoothed bigram
    conditionals P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) on the deterministic
    {SAMPLE_PCT}% sample (tx6's predicate), then score every document
    with >= 2 tokens by its mean adjacent-pair log-probability.
    Gibberish with plausible unigrams but impossible transitions —
    shuffled text, keyword-stuffed spam — scores low where tx13 cannot
    see it. Tercile cut thresholds at corpus scale come from the
    audited percentile machinery (a16 exact / a20's bounded
    percentile_approx), not from a global sort here.

    Scale: BOTH model tables are TakeOrdered-capped (contexts at
    {LM_VOCAB_K}, pairs at {BIGRAM_LM_K} — count desc with full token
    tie-breaks, a deterministic total order), so the scoring joins'
    build sides are bounded at ANY corpus size and the broadcast hints
    are unconditionally safe — tx13's vocabulary-cap argument, applied
    twice. Scoring is scan -> adjacent-pair explode -> two
    broadcast-hash joins -> per-doc avg; the only shuffle is the
    map-side-combinable (doc_id) re-aggregation. The fit shuffles only
    sample pairs. Exact integer counts on both engines; f64 ln/avg
    differences are ulp-level, absorbed by round(4)."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select("doc_id", TX.tokens(F.col("text")).alias("w"))
    pairs = words.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("w"), 1, F.size("w") - 1),
                lambda x, i: F.struct(
                    x.alias("w1"),
                    F.element_at(F.col("w"), i + 2).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    fit = pairs.filter(sample_predicate(F.col("doc_id")))
    ctx = (
        fit.groupBy("w1")
        .agg(F.count("*").alias("c1"))
        .orderBy(F.desc("c1"), F.asc("w1"))
        .limit(LM_VOCAB_K)
    )
    bcnt = (
        fit.groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
        .orderBy(F.desc("cb"), F.asc("w1"), F.asc("w2"))
        .limit(BIGRAM_LM_K)
    )
    vocab = (
        words.filter(sample_predicate(F.col("doc_id")))
        .select(F.explode("w").alias("tok"))
        .agg(F.countDistinct("tok").cast("double").alias("v"))
    )
    lp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
    )
    return (
        pairs.join(F.broadcast(bcnt), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            (half_up(F.avg("lp")) + F.lit(0.0)).alias("avg_logprob"),
        )
    )


@query(
    "tx16_char_entropy",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) >= 1
    ), cnt AS (
      SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
      FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_chars,
           CAST(count(*) AS BIGINT) AS n_distinct,
           {half_up_sql('''log2(CAST(sum(c) AS DOUBLE))
                        - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                          / CAST(sum(c) AS DOUBLE)''')} + 0.0
             AS char_entropy
    FROM cnt GROUP BY doc_id
    """,
)
def tx16_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    zero-model gibberish detector every curation stack runs alongside
    the LM filters (tx13/tx15): natural language sits in a stable
    entropy band (~3.5-4.5 bits for English-like text); base64 blobs,
    minified code and hex dumps score high, single-character floods
    and whitespace padding score low — all without fitting anything.
    Output (doc_id, n_chars, n_distinct, char_entropy); band-cut
    thresholds at corpus scale come from the audited percentile
    machinery (a16 / a20), not from this query.

    Computed as H = log2(n) - (sum c*log2 c)/n — the entropy identity
    that avoids one division per distinct char and is mirrored
    TERM-FOR-TERM in the oracle so both engines run the same float
    ops; both split text to characters identically (verified:
    F.split(text, '') == DuckDB string_split(text, '')).

    Scale: explode-to-chars looks heavy but a document's characters
    are contiguous within its scan partition, so the (doc_id, ch)
    partial aggregation collapses to <= |alphabet| rows per doc
    map-side BEFORE the shuffle — bytes on the wire are ~alphabet
    counts per doc, not text length; the per-doc rollup then shuffles
    one small row per (doc, distinct char). Pure native expressions,
    zero Python crossings."""
    docs = table(spark, sf_dir, "documents").filter(
        F.length("text") >= 1
    )
    cnt = (
        docs.select(
            "doc_id", F.explode(F.split("text", "")).alias("ch")
        )
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").cast("double")
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("n_distinct"),
        (
            half_up(
                F.log2(n)
                - F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))) / n
            )
            + F.lit(0.0)
        ).alias("char_entropy"),
    )


#: tx17 — Gopher-style rule-cascade thresholds (Rae et al. 2021 §A1.1,
#: adapted to this corpus's scale). Every rule is an INTEGER
#: comparison (cross-multiplied ratios, no floats anywhere), so the
#: attribution table is bit-identical on any engine by construction.
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3   # mean token length lower bound
GOPHER_MAX_MEAN_WORD_LEN = 10  # ... and upper bound
GOPHER_MAX_SYMBOL_RATIO_PCT = 10   # non-alnum chars <= 10% of chars
GOPHER_MIN_STOPWORDS = 2           # >= 2 function words present
GOPHER_MIN_ALPHA_TOKEN_PCT = 80    # >= 80% of tokens contain a letter
GOPHER_MAX_TOP_TOKEN_PCT = 25      # top token <= 25% of all tokens


@query(
    "tx17_gopher_rules",
    oracle=f"""
    WITH base0 AS (
      -- NULL text would diverge between engines (Spark size(NULL)=-1 vs
      -- DuckDB len(NULL)=NULL): coalesce on BOTH sides before tokenizing
      SELECT doc_id, COALESCE(text, '') AS text FROM documents
    ), base AS (
      SELECT doc_id, text, {_SQL_TOKS} AS t FROM base0
    ), stats AS (
      SELECT doc_id,
             len(t) AS n_toks,
             COALESCE(list_sum(list_transform(t, x -> length(x))), 0)
               AS tok_chars,
             len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
               AS n_alpha,
             len(list_filter(t, w -> w IN
                 ({TX.sql_quoted_list(TX.EN_FUNCTION_WORDS)}))) AS n_stop,
             length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
               AS n_sym,
             greatest(length(text), 1) AS n_chars
      FROM base
    ), freq AS (
      SELECT doc_id, max(c) AS max_freq FROM (
        SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM base)
        GROUP BY doc_id, tok
      ) GROUP BY doc_id
    ), rules AS (
      SELECT s.doc_id,
        CAST(s.n_toks BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
             AS INT) AS word_count_ok,
        CAST(s.tok_chars >= {GOPHER_MIN_MEAN_WORD_LEN} * s.n_toks
             AND s.tok_chars <= {GOPHER_MAX_MEAN_WORD_LEN} * s.n_toks
             AS INT) AS mean_word_len_ok,
        CAST(100 * s.n_sym <= {GOPHER_MAX_SYMBOL_RATIO_PCT} * s.n_chars
             AS INT) AS symbol_ratio_ok,
        CAST(s.n_stop >= {GOPHER_MIN_STOPWORDS} AS INT)
          AS stopword_count_ok,
        CAST(100 * s.n_alpha >= {GOPHER_MIN_ALPHA_TOKEN_PCT} * s.n_toks
             AS INT) AS alpha_frac_ok,
        CAST(100 * COALESCE(f.max_freq, 0)
             <= {GOPHER_MAX_TOP_TOKEN_PCT} * s.n_toks AS INT)
          AS repetition_ok
      FROM stats s LEFT JOIN freq f USING (doc_id)
    )
    SELECT doc_id, word_count_ok, mean_word_len_ok, symbol_ratio_ok,
           stopword_count_ok, alpha_frac_ok, repetition_ok,
           CAST(6 - word_count_ok - mean_word_len_ok - symbol_ratio_ok
                - stopword_count_ok - alpha_frac_ok - repetition_ok
                AS INT) AS n_failed,
           CAST(word_count_ok + mean_word_len_ok + symbol_ratio_ok
                + stopword_count_ok + alpha_frac_ok + repetition_ok = 6
                AS INT) AS keep
    FROM rules
    """,
)
def tx17_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule CASCADE with per-rule attribution
    (Rae et al. 2021 §A1.1) — the production complement to tx2's
    blended score: curation teams ship the rule TABLE, not just the
    verdict, because "which rule killed this document" is how filter
    regressions get debugged and thresholds get tuned. Six rules:
    word count band, mean-word-length band, symbol ratio cap,
    stopword floor, alphabetic-token floor, top-token repetition cap.

    Every ratio threshold is evaluated by INTEGER cross-multiplication
    (100*n_sym <= 10*n_chars, never n_sym/n_chars <= 0.1), so there is
    no floating point anywhere — parity is exact by construction, and
    at 100 TB the rules stay inside whole-stage codegen as pure int64
    comparisons.

    Scale: stats are per-row expressions on the scan (no shuffle);
    the repetition rule's token-frequency mode is explode ->
    map-side-combinable (doc_id, tok) count -> per-doc max — bytes on
    the wire are one row per (doc, distinct token), bounded by the
    vocabulary actually present in each doc, then a doc-keyed join
    back. One shuffle key end to end (doc_id); zero Python."""
    # Coalesce NULL text to '' (mirrored in the oracle's base0 CTE):
    # Spark's size(NULL array) is -1 where DuckDB's len() is NULL, so a
    # NULL-text document would otherwise produce nonsensical verdicts.
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = TX.tokens(F.col("text"))
    en = F.array(*[F.lit(w) for w in TX.EN_FUNCTION_WORDS])
    stats = docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("tok_chars"),
        F.size(
            F.filter(toks, lambda x: x.rlike("[a-z]"))
        ).alias("n_alpha"),
        F.size(
            F.filter(toks, lambda x: F.array_contains(en, x))
        ).alias("n_stop"),
        F.length(
            F.regexp_replace(F.lower(F.col("text")), "[a-z0-9 ]", "")
        ).alias("n_sym"),
        F.greatest(F.length("text"), F.lit(1)).alias("n_chars"),
    )
    freq = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_freq"))
    )
    s = stats.join(freq, "doc_id", "left")
    rules = {
        "word_count_ok": F.col("n_toks").between(
            GOPHER_MIN_WORDS, GOPHER_MAX_WORDS
        ),
        "mean_word_len_ok": (
            F.col("tok_chars")
            >= GOPHER_MIN_MEAN_WORD_LEN * F.col("n_toks")
        )
        & (
            F.col("tok_chars")
            <= GOPHER_MAX_MEAN_WORD_LEN * F.col("n_toks")
        ),
        "symbol_ratio_ok": 100 * F.col("n_sym")
        <= GOPHER_MAX_SYMBOL_RATIO_PCT * F.col("n_chars"),
        "stopword_count_ok": F.col("n_stop") >= GOPHER_MIN_STOPWORDS,
        "alpha_frac_ok": 100 * F.col("n_alpha")
        >= GOPHER_MIN_ALPHA_TOKEN_PCT * F.col("n_toks"),
        "repetition_ok": 100 * F.coalesce(F.col("max_freq"), F.lit(0))
        <= GOPHER_MAX_TOP_TOKEN_PCT * F.col("n_toks"),
    }
    out = s.select(
        "doc_id",
        *[v.cast("int").alias(k) for k, v in rules.items()],
    )
    total = sum(F.col(k) for k in rules)  # int sum of 0/1 columns
    return out.select(
        "*",
        (F.lit(6) - total).cast("int").alias("n_failed"),
        (total == 6).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# tx18: duplicate-n-gram repetition rules (Gopher §A1.1's second family)
# ---------------------------------------------------------------------------

#: Thresholds from Rae et al. 2021 Table A1 (token-level form): a doc
#: whose duplicate-2-gram mass exceeds 20% (resp. 18% for 3-grams) of
#: all its n-grams is boilerplate/looping text. Integer percentages so
#: both engines evaluate the rule as pure int64 cross-multiplication.
DUPGRAM_MAX_2GRAM_PCT = 20
DUPGRAM_MAX_3GRAM_PCT = 18


@query(
    "tx18_dup_gram_fraction",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, COALESCE(text, '') AS text FROM documents
    ), toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM base
    ), g2 AS (
      SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                             for i in range(1, len(t))]) AS g
      FROM toks
    ), g3 AS (
      SELECT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                             for i in range(1, len(t) - 1)]) AS g
      FROM toks
    ), c2 AS (
      SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2
    ), c3 AS (
      SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2
    ), s2 AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2_grams,
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
               AS n2_dup
      FROM c2 GROUP BY 1
    ), s3 AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3_grams,
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
               AS n3_dup
      FROM c3 GROUP BY 1
    ), j AS (
      SELECT b.doc_id,
             COALESCE(s2.n2_grams, 0) AS n2_grams,
             COALESCE(s2.n2_dup, 0) AS n2_dup,
             COALESCE(s3.n3_grams, 0) AS n3_grams,
             COALESCE(s3.n3_dup, 0) AS n3_dup
      FROM base b
      LEFT JOIN s2 ON s2.doc_id = b.doc_id
      LEFT JOIN s3 ON s3.doc_id = b.doc_id
    )
    SELECT doc_id, n2_grams, n2_dup, n3_grams, n3_dup,
           CAST(100 * n2_dup <= {DUPGRAM_MAX_2GRAM_PCT} * n2_grams
                AS INT) AS dup2_ok,
           CAST(100 * n3_dup <= {DUPGRAM_MAX_3GRAM_PCT} * n3_grams
                AS INT) AS dup3_ok,
           CAST(100 * n2_dup <= {DUPGRAM_MAX_2GRAM_PCT} * n2_grams
                AND 100 * n3_dup <= {DUPGRAM_MAX_3GRAM_PCT} * n3_grams
                AS INT) AS keep
    FROM j
    """,
)
def tx18_dup_gram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-n-gram repetition rules — Gopher §A1.1's SECOND rule
    family (tx17 covers the first): a doc whose 2-gram (3-gram) stream
    is more than {DUPGRAM_MAX_2GRAM_PCT}% ({DUPGRAM_MAX_3GRAM_PCT}%)
    duplicate mass is looping/boilerplate text that inflates LM loss
    without adding signal. "Duplicate mass" counts every INSTANCE of a
    gram that occurs more than once in the doc (the token-level form
    of the paper's duplicate-char fraction). Thresholds evaluate by
    integer cross-multiplication — no floats anywhere, parity exact by
    construction (the tx17 contract).

    Scale: one explode per gram size -> map-side-combinable
    (doc_id, n, gram) count -> per-doc conditional re-agg -> one
    broadcast-sized join back to the doc spine. Wire bytes are one row
    per (doc, gram size, distinct gram), bounded by each doc's own
    vocabulary; doc_id is the only shuffle key end to end; zero
    Python. NULL text coalesces to '' on both engines (tx17's rule).

    Reference: the engine's text-curation surface (SURVEY §2 F-family
    extension); no reference-counterpart file."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = docs.select("doc_id", TX.tokens(F.col("text")).alias("t"))
    empty = F.expr("slice(t, 1, 0)")
    g2 = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(0, size(t) - 2),"
            " i -> concat_ws(' ', t[i], t[i+1]))"
        ),
    ).otherwise(empty)
    g3 = F.when(
        F.size("t") >= 3,
        F.expr(
            "transform(sequence(0, size(t) - 3),"
            " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
        ),
    ).otherwise(empty)
    grams = toks.select(
        "doc_id", F.lit(2).alias("n"), F.explode(g2).alias("g")
    ).unionByName(
        toks.select(
            "doc_id", F.lit(3).alias("n"), F.explode(g3).alias("g")
        )
    )
    counts = grams.groupBy("doc_id", "n", "g").agg(
        F.count("*").alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("n") == n, agg)), F.lit(0)
            ).cast("long").alias(name)
            for n, agg, name in (
                (2, F.col("c"), "n2_grams"),
                (2, F.when(F.col("c") > 1, F.col("c")).otherwise(0),
                 "n2_dup"),
                (3, F.col("c"), "n3_grams"),
                (3, F.when(F.col("c") > 1, F.col("c")).otherwise(0),
                 "n3_dup"),
            )
        ]
    )
    j = docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("n2_grams", "n2_dup", "n3_grams", "n3_dup")
        ],
    )
    dup2_ok = (
        100 * F.col("n2_dup") <= DUPGRAM_MAX_2GRAM_PCT * F.col("n2_grams")
    )
    dup3_ok = (
        100 * F.col("n3_dup") <= DUPGRAM_MAX_3GRAM_PCT * F.col("n3_grams")
    )
    return j.select(
        "*",
        dup2_ok.cast("int").alias("dup2_ok"),
        dup3_ok.cast("int").alias("dup3_ok"),
        (dup2_ok & dup3_ok).cast("int").alias("keep"),
    )
