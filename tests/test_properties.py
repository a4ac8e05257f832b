"""Property-based tests (hypothesis) for the expression library.

The Column functions in functions/text.py are pure; these tests check
them against straight Python reimplementations on arbitrary unicode
input — the SURVEY §5 upgrade the reference never had. One Spark job
per example is too slow, so each property collects a BATCH of examples
into one DataFrame and compares all rows at once.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.functions import text as TX

TEXTS = st.lists(
    st.text(max_size=80), min_size=1, max_size=24
)


def _py_normalize(s: str) -> str:
    cleaned = re.sub(r"[^a-z0-9\s]", " ", s.lower())
    return re.sub(r"\s+", " ", cleaned).strip()


def _py_tokens(s: str) -> list[str]:
    n = _py_normalize(s)
    return [t for t in n.split(" ") if t]


@settings(max_examples=10, deadline=None, derandomize=True)
@given(TEXTS)
def test_tokens_match_python(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r.i: list(r.toks)
        for r in df.select("i", TX.tokens(F.col("t")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_tokens(t), repr(t)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(TEXTS)
def test_keywords_subset_of_tokens_and_filtered(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r.i: list(r.kw)
        for r in df.select("i", TX.keywords(F.col("t")).alias("kw")).collect()
    }
    for i, t in enumerate(texts):
        toks = _py_tokens(t)
        expected = [
            w for w in toks if len(w) >= 3 and w not in TX.STOPWORDS
        ]
        assert got[i] == expected, repr(t)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.lists(st.tuples(st.integers(0, 10**9), st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32))), min_size=1, max_size=16, unique_by=lambda x: x[0]))
def test_json_codec_roundtrip_property(spark, rows):
    """to_payload/parse_payload round-trips arbitrary (id, value) rows,
    nulls included."""
    from pyspark.sql import types as T

    from a3_fp_bigdata_spark.sources import kafka_io

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    back = kafka_io.parse_payload(kafka_io.to_payload(df), schema)
    got = sorted(map(tuple, back.collect()))
    want = sorted((i, float(v) if v is not None else None) for i, v in rows)
    assert got == want


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**31 - 1),
)
def test_png_codec_roundtrip_property(h, w, seed):
    """decode(encode(a)) == a for arbitrary RGB arrays — the codec is
    lossless at every size, including 1x1."""
    import numpy as np

    from a3_fp_bigdata_spark.multimodal import png_codec as C

    arr = (
        np.random.default_rng(seed)
        .integers(0, 256, (h, w, 3))
        .astype(np.uint8)
    )
    assert np.array_equal(C.decode_png(C.encode_png(arr)), arr)


@settings(max_examples=15, deadline=None, derandomize=True)
@given(
    st.integers(1, 33),
    st.integers(1, 33),
    st.integers(0, 2**31 - 1),
    st.booleans(),
    st.integers(0, 3),
)
def test_jpeg_codec_roundtrip_property(h, w, seed, subsample, ri):
    """JPEG is lossy but BOUNDED: for arbitrary sizes (1x1 up, odd
    dims, any subsample/restart combination) decode(encode(a, q=95))
    stays within coarse quantization error of a, and shape/dtype are
    exact. Noise images are the worst case for DCT coding; the bound
    is loose on purpose (correctness here = no structural corruption,
    desync, or block misplacement — those show up as errors of 100+)."""
    import numpy as np

    from a3_fp_bigdata_spark.multimodal import jpeg_codec as J

    arr = (
        np.random.default_rng(seed)
        .integers(0, 256, (h, w, 3))
        .astype(np.uint8)
    )
    dec = J.decode_jpeg(
        J.encode_jpeg(arr, quality=95, subsample=subsample, restart_interval=ri)
    )
    assert dec.shape == arr.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - arr.astype(int))
    # luma is coded much more finely than chroma; project both sides
    # onto Y and bound the luma error (chroma-only error on noise can
    # legitimately reach ~60 under 4:2:0 averaging)
    wts = np.array([0.299, 0.587, 0.114])
    y_err = np.abs((dec.astype(float) - arr.astype(float)) @ wts)
    assert y_err.max() <= 35, y_err.max()
    # RGB mean folds in chroma, which 4:2:0 legitimately averages away
    # on noise (worst at tiny sizes: a 1x2 image's two chromas merge)
    assert err.mean() <= (60 if subsample else 25), err.mean()


@settings(max_examples=30, deadline=None, derandomize=True)
@given(st.text(alphabet="abc 01", min_size=0, max_size=120), st.integers(0, 50))
def test_winnow_fingerprint_properties(t, pad):
    """Winnowing invariants: deterministic; identical text -> identical
    fingerprint set; a shared run longer than K+W-1 chars guarantees at
    least one shared fingerprint (the winnowing coverage theorem)."""
    from a3_fp_bigdata_spark.operators import dedup as D

    a = D.winnow_fingerprints(t)
    assert a == D.winnow_fingerprints(t)
    assert a == sorted(set(a))
    if len(t) >= D.WINNOW_K + D.WINNOW_W - 1:
        assert a, "text long enough must yield at least one fingerprint"
        # embed t in unrelated context: the shared run keeps >=1 common
        # fingerprint because some window inside t is fully contained
        wrapped = "z" * pad + t + "z" * pad
        assert set(a) & set(D.winnow_fingerprints(wrapped))


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    st.dictionaries(st.integers(0, 30), st.integers(-5, 5), max_size=12),
    st.dictionaries(st.integers(0, 30), st.integers(-5, 5), max_size=12),
)
def test_merge_upsert_properties(spark, base_kv, upd_kv):
    """merge_upsert invariants for arbitrary key/value frames: result
    keys = base ∪ updates, updates win collisions, no duplicate keys."""
    from a3_fp_bigdata_spark.operators.upsert import merge_upsert

    schema = "k long, v long"
    base = spark.createDataFrame(list(base_kv.items()) or [(99, 0)], schema)
    upd = spark.createDataFrame(list(upd_kv.items()) or [(98, 0)], schema)
    base_kv = base_kv or {99: 0}
    upd_kv = upd_kv or {98: 0}
    got = {r.k: r.v for r in merge_upsert(base, upd, "k").collect()}
    want = {**base_kv, **upd_kv}
    assert got == want
    assert merge_upsert(base, upd, "k").count() == len(want)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    st.dictionaries(st.integers(0, 30), st.integers(-5, 5), max_size=12),
    st.lists(
        st.tuples(
            st.sampled_from("IUD"),
            st.integers(1, 5),
            st.integers(0, 30),
            st.integers(-5, 5),
        ),
        max_size=15,
    ),
)
def test_apply_changelog_properties(spark, base_kv, ops):
    """apply_changelog invariants for arbitrary changelogs: result =
    python fold of (latest op per key by (seq, op)); deletes remove,
    I/U upsert, untouched keys survive, no duplicate keys."""
    from a3_fp_bigdata_spark.operators.upsert import apply_changelog

    base_kv = base_kv or {99: 0}
    ops = ops or [("U", 1, 98, 7)]
    base = spark.createDataFrame(list(base_kv.items()), "k long, v long")
    log = spark.createDataFrame(
        [(op, seq, k, v) for op, seq, k, v in ops],
        "op string, seq long, k long, v long",
    )
    got = {r.k: r.v for r in apply_changelog(base, log, "k").collect()}
    latest = {}
    for op, seq, k, v in ops:
        # the operator keeps max (seq, op) per key — mirror exactly
        if k not in latest or (seq, op) > (latest[k][0], latest[k][1]):
            latest[k] = (seq, op, v)
    want = dict(base_kv)
    for k, (_seq, op, v) in latest.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    st.dictionaries(st.integers(0, 20), st.integers(0, 3), min_size=1, max_size=10),
    st.dictionaries(st.integers(0, 25), st.integers(0, 3), min_size=1, max_size=10),
)
def test_scd2_merge_properties(spark, base_kv, upd_kv):
    """SCD2 invariants for arbitrary dimensions: exactly one OPEN row
    per key; changed keys carry a closed old version; unchanged update
    rows add nothing; brand-new keys insert as open version batch 1."""
    from a3_fp_bigdata_spark.operators.upsert import SCD_OPEN, scd2_merge
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(k, v, 0, SCD_OPEN) for k, v in base_kv.items()],
        "k long, v long, valid_from int, valid_to int",
    )
    upd = spark.createDataFrame(list(upd_kv.items()), "k long, v long")
    out = scd2_merge(base, upd, "k", batch_id=1).collect()
    open_rows = {r.k: r.v for r in out if r.valid_to == SCD_OPEN}
    closed = [(r.k, r.v, r.valid_to) for r in out if r.valid_to != SCD_OPEN]
    want_current = {**base_kv, **upd_kv}
    assert open_rows == want_current  # one open row per key, updates win
    changed = {
        k for k, v in upd_kv.items() if k in base_kv and base_kv[k] != v
    }
    assert {k for k, _, _ in closed} == changed  # only real changes expire
    assert all(t == 1 and base_kv[k] == v for k, v, t in closed)


# ---------------------------------------------------------------------------
# Sequence packing (operators/packing.py)
# ---------------------------------------------------------------------------

COSTS = st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=60)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(COSTS)
def test_greedy_pack_state_machine_matches_python(spark, costs):
    """pk2's applyInPandas packer on arbitrary token costs == the plain
    Python greedy walk: budget respected (oversize docs solo), dense seq
    ids, identical assignment. Catches any drift between the pandas
    implementation and the documented state machine (and, transitively,
    the recursive-CTE oracle that replays the same walk)."""
    import pandas as pd

    from a3_fp_bigdata_spark.operators import packing as PK

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(costs)),
            "shard": [0] * len(costs),
            "cost": costs,
        }
    )
    sdf = spark.createDataFrame(pdf)

    # the registered query reads from disk; the distributed wiring is
    # pinned by test_packing.py — here we pin the WALK itself on
    # adversarial cost sequences through the same applyInPandas shape
    def walk(cs):
        out, seq, fill, first = [], 0, 0, True
        for c in cs:
            if first:
                fill, first = c, False
            elif fill + c > PK.PACK_BUDGET:
                seq, fill = seq + 1, c
            else:
                fill += c
            out.append(seq)
        return out

    expected = walk(costs)
    from pyspark.sql import functions as F

    packed = (
        sdf.groupBy("shard")
        .applyInPandas(
            _pack_fn(PK.PACK_BUDGET),
            schema="doc_id long, shard long, seq_id long, cost long",
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r.seq_id for r in packed] == expected
    # invariants on the packed result
    sums: dict[int, int] = {}
    counts: dict[int, int] = {}
    for r in packed:
        sums[r.seq_id] = sums.get(r.seq_id, 0) + r.cost
        counts[r.seq_id] = counts.get(r.seq_id, 0) + 1
    for s, tot in sums.items():
        assert tot <= PK.PACK_BUDGET or counts[s] == 1


def _pack_fn(budget):
    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, fill, first = 0, 0, True
        for cost in pdf["cost"]:
            if first:
                fill, first = cost, False
            elif fill + cost > budget:
                seq, fill = seq + 1, cost
            else:
                fill += cost
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[["doc_id", "shard", "seq_id", "cost"]]

    return pack


# ---------------------------------------------------------------------------
# Epoch math (tscompat.py)
# ---------------------------------------------------------------------------

EPOCH_US = st.lists(
    st.integers(min_value=0, max_value=4_102_444_800_000_000),  # 1970..2100
    min_size=1,
    max_size=32,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(EPOCH_US)
def test_epoch_helpers_match_python_on_arbitrary_instants(spark, micros):
    """tscompat.epoch_micros/epoch_seconds equal integer truth for
    arbitrary micro-precision instants fed through TIMESTAMP_NTZ —
    including second-boundary and fractional edge cases hypothesis
    likes to find."""
    from pyspark.sql import functions as F

    from a3_fp_bigdata_spark.tscompat import epoch_micros, epoch_seconds

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(micros)], "i int, us long"
    ).select(
        "i", "us", F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts")
    )
    rows = df.select(
        "i",
        "us",
        epoch_micros("ts").alias("em"),
        epoch_seconds("ts").alias("es"),
    ).collect()
    for r in rows:
        assert r.em == r.us
        assert r.es == r.us // 1_000_000


@given(
    counts=st.dictionaries(
        st.sampled_from(["en", "zh", "de", "fr", "es", "ru", "ja"]),
        st.integers(min_value=1, max_value=10**10),
        min_size=1,
        max_size=7,
    ),
)
@settings(max_examples=200, deadline=None)
def test_domain_mixture_int64_math_properties(counts):
    """pk5's rate algebra, replayed in plain Python over adversarial
    corpus counts (up to 1e10 docs/domain): every derived keep rate is
    a valid percent WITHOUT needing the LEAST cap, at least one domain
    (the limiting one) keeps >= its floor-rounded whole, and every
    intermediate product stays far inside int64."""
    from a3_fp_bigdata_spark.operators.packing import (
        MIX_DEFAULT_PCT,
        MIX_PCT,
    )

    target = {
        lang: MIX_PCT.get(lang, MIX_DEFAULT_PCT) for lang in counts
    }
    mix_size = min(n * 100 // target[lang] for lang, n in counts.items())
    for lang, n in counts.items():
        prod = target[lang] * mix_size
        assert prod < 2**62  # int64 headroom at web scale
        rate = prod // n
        # S <= n*100//T  =>  T*S <= 100*n  =>  rate <= 100: the Spark
        # plan's F.least(…, 100) is belt-and-braces, never load-bearing
        assert 0 <= rate <= 100
    limiting = min(counts, key=lambda l: counts[l] * 100 // target[l])
    lim_rate = target[limiting] * mix_size // counts[limiting]
    # the limiting domain is kept near-whole: its rate only loses the
    # floor-division remainder (< 1 doc-percent of slack per division)
    assert lim_rate >= 100 - 100 * target[limiting] // counts[limiting] - 1


@settings(max_examples=8, deadline=None, derandomize=True)
@given(TEXTS)
def test_collapse_repeats_matches_python(spark, texts):
    """tx12's run-length collapse (the PRODUCTION collapse_runs
    expression, imported — not a transcription) == the obvious Python
    walk, on arbitrary unicode (including texts whose segments are
    empty strings — split(' ') keeps them, and the collapse must treat
    consecutive empties as repeats too)."""
    from a3_fp_bigdata_spark.operators.text_analysis import collapse_runs

    def py_collapse(s: str) -> list[str]:
        segs = s.split(" ")
        return [x for i, x in enumerate(segs) if i == 0 or x != segs[i - 1]]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    kept = collapse_runs(F.split(F.col("text"), " "))
    got = {
        r.doc_id: (r.ks, r.n)
        for r in df.select(
            "doc_id", kept.alias("ks"), F.size(kept).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        want = py_collapse(t)
        assert got[i] == (want, len(want)), (t, got[i], want)


@settings(max_examples=6, deadline=None, derandomize=True)
@given(st.lists(st.integers(0, 90), min_size=1, max_size=10))
def test_sliding_chunks_match_python_walk(spark, n_tokens):
    """pk8's PRODUCTION sliding_chunk_frame on synthetic docs equals
    the naive Python walk at the real (CHUNK_SIZE, CHUNK_STRIDE):
    starts advance by stride until the previous chunk reaches the
    document end, each chunk is tokens[start : start+size], and empty
    docs emit nothing. (The registered constants keep stride < size;
    a stride > size would need a guard on the slice length first — the
    walk below encodes the coverage contract, not a free parameter.)"""
    from a3_fp_bigdata_spark.operators.packing import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        sliding_chunk_frame,
    )

    docs = [
        (i, " ".join(f"t{j}" for j in range(n)))
        for i, n in enumerate(n_tokens)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    by_doc: dict[int, list] = {}
    for r in sliding_chunk_frame(df).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(n_tokens):
        toks = [f"t{j}" for j in range(n)]
        if n == 0:
            assert i not in by_doc
            continue
        starts = [0]
        while starts[-1] + CHUNK_SIZE < n:
            starts.append(starts[-1] + CHUNK_STRIDE)
        rows = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(starts)))
        for r, start in zip(rows, starts):
            want = toks[start : start + CHUNK_SIZE]
            assert r.chunk_text == " ".join(want), (i, r.chunk_idx)
            assert r.n_tokens == len(want)


@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=32,
    )
)
def test_half_up_rounding_tri_engine_agreement(spark, xs):
    """functions.rounding: the ONE half-up definition must agree
    bit-for-bit across Spark, DuckDB (rendered via half_up_sql), and
    a plain-Python replay of the same f64 arithmetic — on arbitrary
    doubles including negative halves, where native round() rules
    diverge between engines."""
    import duckdb
    import math

    from a3_fp_bigdata_spark.functions.rounding import half_up, half_up_sql

    def py_half_up(x, scale):
        p = 10 ** scale
        if scale == 0:
            return float(math.floor(x + 0.5))
        return math.floor(x * p + 0.5) / p

    for scale in (0, 4, 6):
        df = spark.createDataFrame([(x,) for x in xs], "x double")
        got_spark = [
            r.y for r in df.select(half_up(F.col("x"), scale).alias("y"))
            .collect()
        ]
        con = duckdb.connect()
        got_duck = [
            con.execute(
                f"SELECT {half_up_sql('CAST(? AS DOUBLE)', scale)}", [x]
            ).fetchone()[0]
            for x in xs
        ]
        want = [py_half_up(x, scale) for x in xs]
        assert got_spark == want, scale
        assert got_duck == want, scale


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "c"]), max_size=12),
        min_size=1, max_size=8,
    ),
    st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("ab", "c")]),
)
def test_bpe_merge_fold_matches_python(spark, seqs, pair):
    """tokenizer._merge_pair: the native fold must equal the reference
    greedy left-to-right non-overlapping merge on arbitrary symbol
    sequences — including overlap runs and pair-at-boundary cases."""
    from a3_fp_bigdata_spark.operators.tokenizer import _merge_pair

    a, b = pair

    def py_merge(s):
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
        return out

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)],
        "i long, syms array<string>",
    )
    got = {
        r.i: list(r.m)
        for r in df.select(
            "i", _merge_pair(F.col("syms"), a, b).alias("m")
        ).collect()
    }
    assert got == {i: py_merge(s) for i, s in enumerate(seqs)}


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_bloom_no_false_negatives_and_bounded_fp(spark, seed):
    """j11's bloom geometry (4096 bits / 3 hashes): membership is
    EXACT for inserted keys (a bloom filter may only err toward
    keeping), and at the canonical ~300-key build the false-positive
    rate over disjoint probes stays well under the filter's working
    envelope (theory ~0.8%; assert < 2.5%, a ~10-sigma slack at 3000
    probes)."""
    import random

    from a3_fp_bigdata_spark.operators.joins import (
        bloom_might_contain,
        build_bloom,
    )

    rng = random.Random(seed)
    universe = rng.sample(range(1, 1_000_000_000), 3300)
    members, probes = universe[:300], universe[300:]

    keys_df = spark.createDataFrame([(k,) for k in members], "k long")
    words = build_bloom(keys_df)

    n_members_kept = keys_df.filter(
        bloom_might_contain(F.col("k"), words)
    ).count()
    assert n_members_kept == len(members), "bloom dropped a real key"

    probe_df = spark.createDataFrame([(k,) for k in probes], "k long")
    n_fp = probe_df.filter(
        bloom_might_contain(F.col("k"), words)
    ).count()
    assert n_fp / len(probes) < 0.025, f"fp rate {n_fp}/{len(probes)}"


def test_bloom_fp_rate_matches_claimed_geometry(spark):
    """Pin the ~0.8% figure asserted in joins.py's geometry comment:
    aggregate 9000 disjoint probes over three independent 300-key
    builds; the pooled rate must sit in [0.25%, 1.6%] (theory
    (1-e^(-kn/m))^k = 0.77% at k=3, n=300, m=4096; the band is
    ~±4 sigma of the pooled estimate)."""
    import math
    import random

    from a3_fp_bigdata_spark.operators.joins import (
        BLOOM_BITS,
        BLOOM_HASHES,
        bloom_might_contain,
        build_bloom,
    )

    theory = (1 - math.exp(-BLOOM_HASHES * 300 / BLOOM_BITS)) ** BLOOM_HASHES
    assert 0.005 < theory < 0.011  # the comment's "~0.8%"

    total_fp, total_probes = 0, 0
    for seed in (11, 22, 33):
        rng = random.Random(seed)
        universe = rng.sample(range(1, 1_000_000_000), 3300)
        members, probes = universe[:300], universe[300:]
        words = build_bloom(
            spark.createDataFrame([(k,) for k in members], "k long")
        )
        total_fp += (
            spark.createDataFrame([(k,) for k in probes], "k long")
            .filter(bloom_might_contain(F.col("k"), words))
            .count()
        )
        total_probes += len(probes)

    rate = total_fp / total_probes
    assert 0.0025 < rate < 0.016, f"pooled fp rate {rate:.4f}"


def test_d15_d16_tx3_reconcile_on_real_corpus(spark):
    """Cross-operator invariants of the substring-dedup pipeline on the
    real sf0.001 corpus: d15's spans are well-formed (length >= K,
    window count bounded by span room) and disjoint with a gap per doc
    (that is what maximal means); d16's n_cut equals the summed span
    lengths; and n_kept + n_cut equals tx3's whitespace token count —
    three independently-written operators agreeing on every document."""
    from pyspark.sql import Window as W

    from a3_fp_bigdata_spark.operators.dedup import (
        DUPSPAN_K,
        d15_duplicated_spans,
        d16_span_cut,
    )
    from a3_fp_bigdata_spark.operators.text_analysis import tx3_token_count
    from tests.conftest import SF0001

    spans = d15_duplicated_spans(spark, SF0001).persist()
    bad_shape = spans.filter(
        (F.col("span_end") - F.col("span_start") < DUPSPAN_K)
        | (F.col("n_windows") < 1)
        | (
            F.col("n_windows")
            > F.col("span_end") - F.col("span_start") - DUPSPAN_K + 1
        )
    ).count()
    assert bad_shape == 0
    # maximality: consecutive spans of a doc never touch or overlap
    prev_end = F.lag("span_end").over(
        W.partitionBy("doc_id").orderBy("span_start")
    )
    overlapping = spans.withColumn("prev_end", prev_end).filter(
        F.col("prev_end").isNotNull()
        & (F.col("span_start") <= F.col("prev_end"))
    ).count()
    assert overlapping == 0

    cut = d16_span_cut(spark, SF0001)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("span_len")
    )
    joined = (
        cut.join(per_doc, "doc_id", "left")
        .join(tx3_token_count(spark, SF0001), "doc_id")
        .select(
            "doc_id",
            "n_kept",
            "n_cut",
            F.coalesce("span_len", F.lit(0)).alias("span_len"),
            "n_ws_tokens",
        )
    )
    n_docs = joined.count()
    assert n_docs > 0
    mismatches = joined.filter(
        (F.col("n_cut") != F.col("span_len"))
        | (F.col("n_kept") + F.col("n_cut") != F.col("n_ws_tokens"))
    ).count()
    assert mismatches == 0
    spans.unpersist()


# ---------------------------------------------------------------------------
# GIF codec round trip (pure python, no Spark session needed)
# ---------------------------------------------------------------------------

_GIF_FRAME_SHAPES = st.tuples(
    st.integers(min_value=1, max_value=21),  # height
    st.integers(min_value=1, max_value=19),  # width
)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    shape=_GIF_FRAME_SHAPES,
    n_colors=st.integers(min_value=1, max_value=11),
    n_frames=st.integers(min_value=1, max_value=3),
    interlace=st.booleans(),
    transparent=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(
    shape, n_colors, n_frames, interlace, transparent, seed
):
    """encode_gif -> decode_gif_frames is the identity on arbitrary
    small palettized animations: any frame shape, palette size 1-11
    (crossing the 1/2/4-bit color-table size boundaries), 1-3 frames,
    interlaced or not, with or without a transparent background color.
    Each input frame is a full canvas, so equality pins BOTH the LZW
    layer and the compositing rules. Encoder contract honored when
    transparent: a transparent-colored pixel in frame N>0 means
    "unchanged from frame N-1", so those animations are generated
    monotone — frame 0 is all-background and later frames only PAINT
    non-background rectangles (a background pixel never reappears over
    a painted one), exactly the delta-animation shape the transparency
    feature exists for."""
    import numpy as np

    from a3_fp_bigdata_spark.multimodal import gif_codec as G

    h, w = shape
    rng = np.random.default_rng(seed)
    palette = np.unique(
        rng.integers(0, 256, (n_colors, 3)).astype(np.uint8), axis=0
    )
    if transparent and len(palette) > 1:
        t_color = tuple(int(c) for c in palette[0])
        fg = palette[1:]
        frames = [np.broadcast_to(palette[0], (h, w, 3)).copy()]
        for _ in range(n_frames - 1):
            f = frames[-1].copy()
            y0, x0 = rng.integers(0, h), rng.integers(0, w)
            y1, x1 = rng.integers(y0, h) + 1, rng.integers(x0, w) + 1
            f[y0:y1, x0:x1] = fg[rng.integers(0, len(fg), (y1 - y0, x1 - x0))]
            frames.append(f)
    else:
        t_color = None
        frames = [
            palette[rng.integers(0, len(palette), (h, w))]
            for _ in range(n_frames)
        ]
    payload = G.encode_gif(
        frames, interlace=interlace, transparent_color=t_color
    )
    decoded = G.decode_gif_frames(payload)
    assert len(decoded) == n_frames
    for got, want in zip(decoded, frames):
        assert got.shape == want.shape
        assert np.array_equal(got, want)
