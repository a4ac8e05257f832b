"""a3_fp_bigdata_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capability surface of
the reference repo FikriAuliaa/A3-FP-Bigdata (a Play-Store app-recommendation
lakehouse: Kafka JSON ingest -> micro-batch files -> feature join -> ML
pipelines -> a Parquet serving table behind seven top-k/filter query shapes),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for the ingest loop, spark.ml for the pipelines, and
Arrow-batched pandas UDFs only where built-ins cannot express the semantics.

Layout
------
- ``session``     SparkSession builders (scale-tuned defaults, AQE on).
- ``schemas``     explicit StructType registry for every source.
- ``sources``     readers/writers (CSV dir scan, Parquet, Kafka, binary files).
- ``operators``   relational core + scale extensions (dedup, similarity).
- ``functions``   scalar/text expression library (pure Column functions).
- ``plans``       drift-tolerant projection / cast-map plan helpers.
- ``serving``     the seven reference API query shapes as DataFrame functions.
- ``streaming``   Structured Streaming replacement of producer/consumer.
- ``ml``          KMeans + RandomForest pipelines with pinned seeds.
- ``multimodal``  binary-column (image/audio) plumbing with stubbed decoders.
- ``registry``    the query/oracle registry consumed by ``__spark_entry__``.
"""

__version__ = "0.1.0"
