"""spark_sql_perf_spark — a PySpark-native analytics/benchmarking engine.

A from-scratch rebuild of the capabilities of ``summerDG/spark-sql-perf``
(reference surveyed in SURVEY.md), expressed Spark-first: DataFrame/SQL
declarative plans optimized by Catalyst, AQE-friendly physical execution,
and extensions for LLM-data-pipeline workloads (dedup, similarity search,
text analysis, event-time windows) designed for 100 TB scale.

Layout:
    session     SparkSession builder with the engine's tuned conf set
    catalog     testdata table loading / temp-view registration
    query       Query + Variation + Benchmark dataclasses (harness core)
    modes       ExecutionMode semantics (collect/foreach/count/hash/parquet)
    runner      experiment runner: iterations x cartesian(variations),
                per-phase timing, timeout, results JSON
    operators/  the relational operator corpus (SURVEY.md §2) as named
                queries with DuckDB oracles
    sources/    pure-Spark deterministic data generators + file readers
    functions/  text / vector column-expression libraries
    plans/      statistics-driven multi-join strategy chooser
    streaming/  event-time windowing (batch-equivalent + readStream)
    pipeline/   dedup, similarity search, multimodal, text-quality ops
    ml/         pyspark.ml benchmark battery
"""

__version__ = "0.1.0"
