"""ML pipeline invariants (SURVEY §2.11 M1-M9).

KMeans/RF outputs are seed/impl-specific, so these tests pin structural
invariants rather than exact floats (SURVEY §5): stage composition, full
row coverage on transform, k distinct clusters, a finite RMSE bound, and
PipelineModel save/load round-trip (reference spark_script.py:145-149).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.ml import pipelines as P
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def fitted(spark):
    return P.fit_transform(spark, SF0001)


def test_feature_frame_keeps_all_customers(spark):
    feats = P.customer_features(spark, SF0001)
    n_cust = table(spark, SF0001, "customer").count()
    assert feats.count() == n_cust  # left-outer keeps orderless customers


def test_transform_covers_all_rows(spark, fitted):
    final, _, _, _ = fitted
    n_cust = table(spark, SF0001, "customer").count()
    assert final.count() == n_cust  # fit on subset, transform on ALL rows


def test_kmeans_k_clusters(fitted):
    final, _, _, _ = fitted
    clusters = {r.cluster for r in final.select("cluster").distinct().collect()}
    assert clusters <= set(range(P.KMEANS_K))
    assert len(clusters) >= 2  # degenerate single-cluster fit would be a bug


def test_rmse_finite_and_bounded(spark, fitted):
    _, _, _, rmse = fitted
    assert math.isfinite(rmse) and rmse >= 0
    # RF must beat the trivial predict-the-mean model's RMSE (= stddev).
    train = P.customer_features(spark, SF0001).filter(
        F.col(P.RF_LABEL).isNotNull()
    )
    stddev = train.agg(F.stddev_pop(P.RF_LABEL)).first()[0]
    assert rmse < stddev


def test_pipeline_stage_composition():
    km = [type(s).__name__ for s in P.build_kmeans_pipeline().getStages()]
    rf = [type(s).__name__ for s in P.build_rf_pipeline().getStages()]
    assert km == [
        "Imputer", "StringIndexer", "VectorAssembler", "StandardScaler", "KMeans"
    ]
    assert rf == ["Imputer", "StringIndexer", "VectorAssembler",
                  "RandomForestRegressor"]


def test_model_save_load_roundtrip(spark, fitted, tmp_path):
    """S6: model sink/source (spark_script.py:145-149; app.py:7)."""
    from pyspark.ml import PipelineModel

    _, km_model, _, _ = fitted
    path = str(tmp_path / "km_model")
    km_model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    df = P.customer_features(spark, SF0001).limit(50)
    a = {r.c_custkey: r.cluster for r in km_model.transform(df).collect()}
    b = {r.c_custkey: r.cluster for r in reloaded.transform(df).collect()}
    assert a == b


def test_final_schema_shape(fitted):
    final, _, _, _ = fitted
    assert final.columns == [
        "c_custkey", "c_acctbal", "c_mktsegment", "order_cnt",
        "total_spent", "avg_order", "cluster", "PredictedRating",
    ]
    assert dict(final.dtypes)["cluster"] == "int"


def test_unseen_category_kept_not_dropped(spark, fitted):
    """The deliberate reference deviation (SURVEY §7 risk register):
    handleInvalid='keep' scores rows whose category was never seen in
    training, where the reference's 'skip' (spark_script.py:67) would
    silently drop them. An unseen segment must come back with a cluster
    for EVERY row, indexed to the extra 'unseen' bucket."""
    from pyspark.sql import functions as F

    _, km_model, _, _ = fitted
    df = P.customer_features(spark, SF0001).limit(20).withColumn(
        "c_mktsegment", F.lit("NEVER_SEEN_SEGMENT")
    )
    scored = km_model.transform(df)
    assert scored.count() == 20  # nothing silently dropped
    n_seen = (
        P.customer_features(spark, SF0001)
        .select("c_mktsegment").distinct().count()
    )
    # 'keep' indexes unknowns to the one-past-the-end bucket
    assert {r[0] for r in scored.select("cat_idx").distinct().collect()} == {
        float(n_seen)
    }


# --- ml4: model-based quality filter (heuristic-distillation rung) ---------


@pytest.fixture(scope="module")
def qf_scored(spark):
    from a3_fp_bigdata_spark.ml import quality_filter as QF

    scored, model = QF.fit_score(spark, SF0001)
    return scored.cache(), model


def test_quality_filter_covers_all_docs(spark, qf_scored):
    scored, _ = qf_scored
    n_docs = table(spark, SF0001, "documents").count()
    assert scored.count() == n_docs  # fit on split, score on ALL rows


def test_quality_filter_holdout_accuracy(qf_scored):
    # The weak label is a deterministic function of the text, so a
    # bag-of-words linear model must recover it on the HOLDOUT split
    # (in_fit=0) — this is generalization, not train-set memorization.
    scored, _ = qf_scored
    hold = scored.filter(F.col("in_fit") == 0)
    acc = hold.filter(
        F.col("keep") == F.col("label").cast("int")
    ).count() / hold.count()
    assert acc >= 0.8, acc


def test_quality_filter_probabilities_calibrated_ordering(qf_scored):
    # Kept docs must average a strictly higher P(keep) than dropped docs.
    scored, _ = qf_scored
    rows = {
        r["keep"]: r["p"]
        for r in scored.groupBy("keep")
        .agg(F.avg("p_keep").alias("p"))
        .collect()
    }
    assert rows[1] > rows[0] + 0.3


def test_quality_filter_pipeline_stages():
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF

    from a3_fp_bigdata_spark.ml import quality_filter as QF

    stages = QF.build_quality_pipeline().getStages()
    assert [type(s) for s in stages] == [HashingTF, IDF, LogisticRegression]
    assert stages[0].getNumFeatures() == QF.HASH_DIM


def test_quality_filter_report_shape(spark):
    from a3_fp_bigdata_spark.ml.quality_filter import ml4_quality_filter

    rep = ml4_quality_filter(spark, SF0001)
    assert rep.columns == ["in_fit", "label", "keep", "n", "mean_p"]
    total = rep.agg(F.sum("n")).collect()[0][0]
    assert total == table(spark, SF0001, "documents").count()


def test_quality_filter_model_save_load_roundtrip(spark, qf_scored, tmp_path):
    """S6 for the quality filter: the fitted HashingTF->IDF->LR model
    persists and reloads with identical keep decisions (production
    ships the trained filter to the scoring cluster as an artifact)."""
    from pyspark.ml import PipelineModel
    from pyspark.ml.functions import vector_to_array

    from a3_fp_bigdata_spark.ml import quality_filter as QF

    _, model = qf_scored
    path = str(tmp_path / "qf_model")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    feats = QF._featurized(spark, SF0001).limit(50)
    p1 = vector_to_array(F.col("probability")).getItem(1)
    keep = (p1 >= QF.KEEP_PROB).cast("int").alias("keep")
    a = {r.doc_id: r.keep for r in model.transform(feats).select("doc_id", keep).collect()}
    b = {r.doc_id: r.keep for r in reloaded.transform(feats).select("doc_id", keep).collect()}
    assert a == b and len(a) == 50


def test_ml5_calibration_bins_partition_the_holdout(spark, qf_scored):
    """ml5's reliability table: bins cover exactly the holdout rows,
    bin means sit inside their bin edges, and abs_gap reconciles with
    the reported columns."""
    from a3_fp_bigdata_spark.ml import quality_filter as QF

    rows = QF.ml5_calibration_audit(spark, SF0001).collect()
    scored, _ = qf_scored
    n_holdout = scored.filter(F.col("in_fit") == 0).count()
    assert sum(r["n"] for r in rows) == n_holdout
    for r in rows:
        assert 0 <= r["bin"] <= QF._ML5_NBINS - 1
        lo = r["bin"] / QF._ML5_NBINS
        hi = (r["bin"] + 1) / QF._ML5_NBINS
        # rounding slack: scores are micro-unit quantized then the bin
        # mean rounds to 4 decimals
        assert lo - 1e-4 <= r["mean_p"] <= hi + 1e-4 or r["bin"] == 9
        assert abs(r["abs_gap"] - abs(r["mean_p"] - r["emp_rate"])) <= 2e-4
        assert 0.0 <= r["emp_rate"] <= 1.0


def test_ml3_scratch_rmse_matches_evaluator(spark, fitted):
    """r13 flip: ml3's quantized scratch construction (int64 micro
    pairs, exact centi-unit SSE) must reproduce RegressionEvaluator's
    RMSE to ~1e-6 relative — the quantization is an attestation
    device, not a different metric."""
    _, _, _, rmse_eval = fitted
    from a3_fp_bigdata_spark import registry

    row = registry.all_queries()["ml3_training_rmse"](
        spark, SF0001
    ).collect()[0]
    assert row["n_train"] > 0 and row["sse_centi"] >= 0
    assert abs(row["rmse"] - rmse_eval) <= 1e-6 * max(rmse_eval, 1.0), (
        row["rmse"],
        rmse_eval,
    )


def test_ml2_scratch_table_is_top20_of_final(spark, fitted):
    """r13 flip: ml2's read-back ranking must equal the direct top-20
    of the scored frame (same total order, unique tie-break)."""
    final, _, _, _ = fitted
    from a3_fp_bigdata_spark import registry

    want = [
        (r["c_custkey"], r["cluster"])
        for r in final.orderBy(
            F.desc("c_acctbal"), "c_custkey"
        ).limit(20).collect()
    ]
    got = [
        (r["c_custkey"], r["cluster"])
        for r in registry.all_queries()["ml2_rf_score_table"](
            spark, SF0001
        ).collect()
    ]
    assert got == want
