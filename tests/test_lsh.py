"""Sign-LSH signature equivalence: the plan-time literal-plane form must
produce BIT-IDENTICAL signatures to the md5-in-expression derivation
(same component values, same left-to-right summation) — that identity is
what lets sim2/d5 use the ~100x-cheaper literal form while their DuckDB
oracles keep running the in-expression SQL twin."""

from __future__ import annotations

from tests.conftest import SF_DIR_TINY


def test_literal_planes_match_md5_expression(spark):
    from pyspark.sql import functions as F

    from spark_sql_perf_spark.functions.lsh import sign_lsh_sig_spark
    from spark_sql_perf_spark.pipeline.similarity import embedding_dim

    vecs = spark.read.parquet(f"{SF_DIR_TINY}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dim = embedding_dim(vecs)
    assert dim and dim > 0
    both = vecs.select(
        "vec_id",
        sign_lsh_sig_spark().alias("sig_expr"),
        sign_lsh_sig_spark(dim=dim).alias("sig_lit"),
    )
    n_total = both.count()
    n_equal = both.where(F.col("sig_expr") == F.col("sig_lit")).count()
    assert n_total > 0
    assert n_equal == n_total


def test_plane_value_matches_engine_derivation(spark):
    """The Python plane constant equals the engine's DOUBLE-typed
    derivation for the same (bit, i).

    Typing subtlety this test pins down: in Spark SQL, BIGINT /
    2147483648.0 is DECIMAL division (the literal parses as
    DECIMAL(11,1)), scale-rounded ~1e-12 off the exact double — which is
    why BOTH in-repo forms pin the divisor with ``cast(... as double)``:
    the in-expression form (``_plane_sign_spark``) and the literal-plane
    form each compute exactly the doubles the DuckDB oracle computes
    (DuckDB float literals are DOUBLE natively)."""
    from spark_sql_perf_spark.functions.lsh import _plane_value

    for bit, i in [(0, 1), (3, 17), (7, 64)]:
        got = spark.sql(
            f"SELECT cast(conv(substring(md5(concat('lsh|p{bit}-', cast({i} as string))), 1, 8), 16, 10) AS BIGINT)"
            f" / cast(2147483648.0 AS double) - 1.0 AS p"
        ).first()["p"]
        assert got == _plane_value(bit, i)


def test_sim6_knn_graph_properties(spark):
    """kNN-graph invariants the oracle only checks statistically: no self
    edges, at most K neighbors per vector with contiguous ranks, every
    edge stays within one LSH bucket, and edges at equal (rounded) cosine
    rank by neighbor_id."""
    from pyspark.sql import functions as F

    from spark_sql_perf_spark.functions.lsh import sign_lsh_sig_spark
    from spark_sql_perf_spark.operators import QUERIES
    from spark_sql_perf_spark.pipeline.similarity import _KNN_K, embedding_dim

    out = QUERIES["sim6_knn_graph"](spark, SF_DIR_TINY).cache()
    assert out.where(F.col("vec_id") == F.col("neighbor_id")).count() == 0
    ranks = (
        out.groupBy("vec_id")
        .agg(F.max("rn").alias("mx"), F.count("*").alias("n"))
        .where((F.col("mx") > _KNN_K) | (F.col("mx") != F.col("n")))
        .count()
    )
    assert ranks == 0  # ranks are 1..n with n <= K, no holes

    vecs = spark.read.parquet(f"{SF_DIR_TINY}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sig = vecs.select(
        "vec_id", sign_lsh_sig_spark(dim=embedding_dim(vecs)).alias("sig")
    )
    cross_bucket = (
        out.join(sig.withColumnRenamed("vec_id", "a"), out.vec_id == F.col("a"))
        .withColumnRenamed("sig", "sig_a")
        .join(sig.withColumnRenamed("vec_id", "b"), out.neighbor_id == F.col("b"))
        .where(F.col("sig_a") != F.col("sig"))
        .count()
    )
    assert cross_bucket == 0
    out.unpersist()
