"""Driver simulation: plain session, public import, oracle spot-check."""
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. entry()
df = E.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# 2. oracle spot-check
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, oracles = E.queries(), E.oracle_sql()
# Spot names are REGISTRY names; resolve the driver-facing exposure
# name at runtime so canonical-window rotations can't break the tool.
from a3_fp_bigdata_spark.registry import exposure_name

_SPOT_BASE = [
    "w5_sessionize", "w7_time_range_rolling", "st5_stream_tumbling",
    "st7_stream_stream_join", "src2_json_roundtrip", "a8_tpch_q1",
    "st1_tumbling_window", "d1_exact_dedup", "sim2_lsh_ann",
    "tx2_quality_score",
    "pk1_concat_chunks", "pk2_greedy_pack", "pk3_stratified_sample",
    "pk4_train_val_split", "tx10_redact_pii", "d14_quality_keeper",
    "tx11_corpus_stats", "pl1_training_manifest", "d12_dedup_clusters",
    "pk5_domain_mixture", "pk6_epoch_plan", "u3_snapshot_diff",
    "sim8_ann_recall",
    # round-5 late additions
    "tx12_collapse_repeats", "tx13_unigram_logprob", "pk7_split_leakage",
    "sim9_quantized_rerank", "pk8_sliding_chunks", "tx14_bigram_pmi",
    "pl2_chunk_index_stats", "st11_chunk_index_stream",
    "w8_gapfill_locf", "w9_linear_interp", "pk9_weighted_sample",
    "dq1_expectations",
    # round-8: the scratch-oracle audit tier (driver-window flagships)
    "a19_approx_distinct_audit", "d9_pigeonhole_audit",
    "d11_containment_audit", "sim11_ivf_recall_audit", "d6_gemm_audit",
    # round-9: span-cut composition + PQ/SemDeDup audits + image dedup
    "pl4_span_clean_manifest", "sim12_pq_recall_audit",
    "d17_semdedup_audit", "mm7_image_near_dup",
    # round-9 late additions: the decontamination tier (fuzzy detect,
    # corpus cut, manifest composition — all oracle-exact)
    "d18_fuzzy_decontaminate", "d19_decontaminated_corpus",
    "pl5_decontaminated_manifest", "mm8_image_dedup_clusters",
]
SPOT = [exposure_name(n) for n in _SPOT_BASE]


def norm(val):
    import datetime
    if isinstance(val, float):
        return round(val, 6)
    if isinstance(val, datetime.datetime):
        return val.replace(tzinfo=None).isoformat()
    return val


fails = []
for name in SPOT:
    if name not in qs:
        fails.append((name, "missing query")); continue
    if name not in oracles:
        print(f"{name}: rows-only (no oracle)"); continue
    sdf = qs[name](spark, SF)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(norm(r[c]) for c in cols) for r in sdf.collect())
    ores = con.execute(oracles[name]).fetch_arrow_table().to_pylist()
    ocols = sorted(ores[0].keys()) if ores else cols
    orows = sorted(tuple(norm(r[c]) for c in ocols) for r in ores)
    ok = cols == ocols and srows == orows
    print(f"{name}: cols={'OK' if cols == ocols else (cols, ocols)} "
          f"rows={len(srows)}/{len(orows)} values={'OK' if srows == orows else 'MISMATCH'}")
    if not ok:
        if srows != orows and len(srows) == len(orows):
            for a, b in zip(srows, orows):
                if a != b:
                    print("  first diff:", a, "vs", b); break
        fails.append((name, "mismatch"))

# 3. probes
for name in ("d4_minhash_lsh", exposure_name("d5_simhash")):
    n = qs[name](spark, SF).count()
    print(f"{name}: {n} rows (rows-only)")
    assert n >= 0

try:
    from a3_fp_bigdata_spark.serving import top_records
    top_records(spark.read.parquet(f"{SF}/part.parquet"), sort_by="nope", limit=5, tie_break="p_partkey", select_cols=["p_partkey"])
    fails.append(("top_records", "no ValueError"))
except ValueError:
    print("top_records(sort_by='nope'): ValueError OK")
except ImportError as e:
    print("top_records import skipped:", e)

d3 = {(r.doc_a, r.doc_b) for r in qs[exposure_name("d3_ngram_jaccard")](spark, SF).collect()}
d4 = {(r.doc_a, r.doc_b) for r in qs[exposure_name("d4_minhash_lsh")](spark, SF).collect()}
print(f"d4 pairs subset of d3: {d4 <= d3} ({len(d4)}/{len(d3)})")
assert d4 <= d3

print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
