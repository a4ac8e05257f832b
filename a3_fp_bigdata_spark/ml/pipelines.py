"""spark.ml pipelines — the reference's ML capability surface (SURVEY §2.11).

The reference fits two PipelineModels over its app table
(reference spark_script.py:56-121):

- KMeans branch: Imputer(mean) -> StringIndexer(genre) -> VectorAssembler
  -> StandardScaler(withStd, no mean) -> KMeans(k=5, seed=1, pred 'cluster')
  (spark_script.py:64-77)
- RF branch: Imputer(mean) -> StringIndexer -> VectorAssembler
  -> RandomForestRegressor(seed=42, maxBins=64, pred 'PredictedRating')
  (spark_script.py:97-113)

fit on the non-null training subset, transform over ALL rows, evaluate RMSE
(spark_script.py:117-121), persist models (spark_script.py:145-149), and
write a final 12-col parquet (spark_script.py:136-153).

We re-express the same stages over the driver's star schema: the "apps"
analog is customers enriched with per-customer order aggregates (a real
map-side-combinable groupBy, not a crutch), `c_mktsegment` standing in for
`genre`, `avg_order` for `score`. All seeds pinned as in the reference
(KMeans seed=1, RF seed=42). spark.ml runs JVM-side over DataFrames, so the
same code path scales to the cluster: fits are a handful of aggregation /
iteration jobs, transforms are narrow projections.

Scale notes (100 TB): the feature build is one shuffle (groupBy o_custkey,
partial aggregation map-side) + one shuffle-free broadcastable join when the
dim is small; KMeans is iterative but each iteration is a single
mapPartitions + reduce; RF trains on a sampled/cached frame. Nothing here
collects to the driver except the tiny k-row histogram.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import Imputer, StandardScaler, StringIndexer, VectorAssembler
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.registry import query
from a3_fp_bigdata_spark.session import session_token

#: Numeric feature columns of the customer-features frame (analog of the
#: reference's 8-col numeric map, spark_script.py:32-36).
NUMERIC_FEATURES = ("c_acctbal", "order_cnt", "total_spent", "avg_order")
CATEGORICAL = "c_mktsegment"  # genre analog
RF_LABEL = "avg_order"  # score analog

KMEANS_K = 5
KMEANS_SEED = 1  # reference spark_script.py:71
RF_SEED = 42  # reference spark_script.py:106
RF_MAX_BINS = 64


def customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-customer frame: customer dims + order aggregates.

    Mirrors the reference's apps ⋈ image-features join shape
    (spark_script.py:24): big fact aggregated once (map-side combine),
    left-outer joined back so customers with no orders keep NULL features
    — exactly the nulls the Imputer stage exists to fill.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("order_cnt"),
        F.sum("o_totalprice").alias("total_spent"),
        F.avg("o_totalprice").alias("avg_order"),
    )
    return cust.select("c_custkey", "c_acctbal", CATEGORICAL).join(
        per_cust,
        cust["c_custkey"] == per_cust["o_custkey"],
        "left_outer",
    ).drop("o_custkey")


def _common_stages(features: tuple[str, ...]) -> list:
    """Imputer -> StringIndexer -> VectorAssembler (M1-M3)."""
    imputed = [f"{c}_imp" for c in features]
    return [
        Imputer(strategy="mean", inputCols=list(features), outputCols=imputed),
        # frequencyDesc ordering is the default, matching the fitted
        # reference metadata; handleInvalid="keep" deviates deliberately
        # from the reference's "skip" (which silently drops rows,
        # spark_script.py:67 — see SURVEY §7 risk register).
        StringIndexer(
            inputCol=CATEGORICAL,
            outputCol="cat_idx",
            handleInvalid="keep",
        ),
        VectorAssembler(
            inputCols=imputed + ["cat_idx"], outputCol="unscaled_features"
        ),
    ]


def build_kmeans_pipeline() -> Pipeline:
    """M1-M5: impute -> index -> assemble -> scale -> KMeans(k=5, seed=1)."""
    return Pipeline(
        stages=_common_stages(NUMERIC_FEATURES)
        + [
            StandardScaler(
                inputCol="unscaled_features",
                outputCol="features",
                withStd=True,
                withMean=False,  # reference spark_script.py:70
            ),
            KMeans(
                k=KMEANS_K,
                seed=KMEANS_SEED,
                featuresCol="features",
                predictionCol="cluster",
            ),
        ]
    )


def build_rf_pipeline() -> Pipeline:
    """M1-M3 + M6: impute -> index -> assemble -> RF regression.

    Label excluded from its own feature set (the reference's RF branch
    drops `score` from features, spark_script.py:99-103).
    """
    feats = tuple(c for c in NUMERIC_FEATURES if c != RF_LABEL)
    return Pipeline(
        stages=_common_stages(feats)
        + [
            RandomForestRegressor(
                featuresCol="unscaled_features",
                labelCol=RF_LABEL,
                predictionCol="PredictedRating",
                seed=RF_SEED,
                maxBins=RF_MAX_BINS,
            )
        ]
    )


#: One fit per (session, sf_dir): the three registered queries below all
#: consume the same trained artifacts; refitting per query would triple
#: the driver's correctness-pass cost for identical results (seeds pinned).
_FIT_CACHE: dict[tuple[str, str], tuple] = {}


def fit_transform(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, PipelineModel, PipelineModel, float]:
    """The reference's full training flow (spark_script.py:56-123):

    fit both pipelines on the non-null subset (cached across the two fits,
    M9), transform KMeans over ALL rows, chain RF transform on the
    clustered frame, evaluate training RMSE (M8).
    Returns (scored_frame, kmeans_model, rf_model, rmse).
    """
    key = (session_token(spark), sf_dir)
    if key in _FIT_CACHE:
        return _FIT_CACHE[key]

    df = customer_features(spark, sf_dir)
    train = df.filter(
        F.col(RF_LABEL).isNotNull() & F.col("c_acctbal").isNotNull()
    ).cache()
    if train.count() < 10:  # min-rows guard, spark_script.py:49-52
        raise ValueError("not enough valid training rows")

    km_model = build_kmeans_pipeline().fit(train)
    rf_model = build_rf_pipeline().fit(train)
    train.unpersist()

    clustered = km_model.transform(df)
    scored = rf_model.transform(
        clustered.drop(
            "cat_idx", "unscaled_features", "features",
            *[f"{c}_imp" for c in NUMERIC_FEATURES],
        )
    )
    rmse = RegressionEvaluator(
        labelCol=RF_LABEL, predictionCol="PredictedRating", metricName="rmse"
    ).evaluate(scored.filter(F.col(RF_LABEL).isNotNull()))

    final = scored.select(
        "c_custkey",
        "c_acctbal",
        CATEGORICAL,
        "order_cnt",
        "total_spent",
        "avg_order",
        F.col("cluster").cast("int").alias("cluster"),
        F.round("PredictedRating", 6).alias("PredictedRating"),
    )
    _FIT_CACHE[key] = (final, km_model, rf_model, rmse)
    return _FIT_CACHE[key]


# ---------------------------------------------------------------------------
# Registered queries (rows-only: KMeans/RF outputs are seed/impl-specific,
# not SQL-expressible — the driver records the weaker check; pytest pins
# the invariants: k distinct clusters, full row coverage, RMSE bound).
# ---------------------------------------------------------------------------


@query("ml1_cluster_sizes")
def ml1_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster histogram of the fitted KMeans pipeline — the reference's
    diagnostic `groupBy('cluster').count().orderBy('cluster')`
    (spark_script.py:80). Rows-only: centroid assignment is impl-specific."""
    final, _, _, _ = fit_transform(spark, sf_dir)
    return final.groupBy("cluster").agg(F.count("*").alias("n")).orderBy("cluster")


@query("ml2_rf_score_table")
def ml2_rf_score_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 12-col final API-table shape (spark_script.py:136-142): every
    customer with cluster + PredictedRating, top 20 by account balance
    (total order with unique key so the sample is stable). Rows-only."""
    final, _, _, _ = fit_transform(spark, sf_dir)
    return final.orderBy(F.desc("c_acctbal"), "c_custkey").limit(20)


@query("ml3_training_rmse")
def ml3_training_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set RMSE of the RF branch (spark_script.py:117-121) as a
    one-row frame. Rows-only: exact value is impl/seed-specific; pytest
    asserts a finite upper bound."""
    _, _, _, rmse = fit_transform(spark, sf_dir)
    return spark.createDataFrame([(float(rmse),)], "rmse double")
