"""Similarity search over the `embeddings` table (array<float> column).

sim1: brute-force cosine top-k — the exact baseline every ANN variant is
      measured against. All-JVM column expressions (zip_with/aggregate).
sim2: sign-LSH (random-hyperplane) bucketed ANN — the scale path: hash
      every vector to a B-bit signature with md5-derived pseudo-random
      hyperplanes, search only within the query's bucket, exact-rank the
      survivors. Recall < 1 by construction, so its oracle checks the
      *same* bucketed algorithm, not brute force.

At 100 TB: brute force is a full-scan cross join per query batch —
feasible only for small query sets broadcast against the corpus; the LSH
variant prunes the corpus to matching buckets first (shuffle on signature),
which is the standard sub-linear ANN layout on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.lsh import (
    LSH_BITS as _LSH_BITS,
    sign_lsh_sig_spark,
    sign_lsh_sig_sql,
)
from ..operators.registry import query

_TOP_K = 3
_N_QUERIES = 5  # vectors with vec_id < 5 act as the query set

_COS_SQL = (
    "list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))"
    " / (SQRT(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * q.v[i])))"
    "    * SQRT(list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * c.v[i]))))"
)


def _dot(x: str, y: str) -> F.Column:
    return F.aggregate(
        F.zip_with(F.col(x), F.col(y), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _cosine(x: str, y: str) -> F.Column:
    return _dot(x, y) / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))


@query(
    "sim1_cosine_topk",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT * FROM vecs WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT * FROM vecs WHERE vec_id >= {_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_COS_SQL}, 6) AS cosine
      FROM q, c),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {_TOP_K}
    """,
)
def sim1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against the corpus,
    rank per query. Ranking uses the 6-decimal-rounded cosine (raw float
    ordering is not reproducible across engines at ~1e-16 tie distance).
    """
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = vecs.where(F.col("vec_id") < _N_QUERIES).alias("q")
    c = vecs.where(F.col("vec_id") >= _N_QUERIES).alias("c")
    scored = F.broadcast(q).crossJoin(c).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(_cosine("q.v", "c.v"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _TOP_K)
    )


# md5-derived hyperplane signatures shared with d5's dedup blocking —
# see functions/lsh.py (leaf module, importable from either side first)
_SIG_SQL = sign_lsh_sig_sql()


def embedding_dim(vecs: DataFrame) -> int | None:
    """Fixed vector length of an array column ``v`` (one tiny peek job at
    plan time), so the LSH planes embed as literals instead of being
    md5-recomputed per row element. None on an empty relation — callers
    fall back to the in-expression derivation, which needs no dim."""
    row = vecs.select(F.size("v").alias("d")).first()
    return int(row["d"]) if row is not None else None


@query(
    "sim2_lsh_bucketed_ann",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    signed AS (SELECT vec_id, v, {_SIG_SQL} AS sig FROM vecs),
    q AS (SELECT * FROM signed WHERE vec_id < {_N_QUERIES}),
    c AS (SELECT * FROM signed WHERE vec_id >= {_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_COS_SQL}, 6) AS cosine
      FROM q JOIN c ON q.sig = c.sig),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {_TOP_K}
    """,
)
def sim2_lsh_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN: {_LSH_BITS}-bit random-hyperplane signature,
    candidates = same-bucket vectors only, then exact cosine rank.

    The hyperplanes are md5-derived so Spark and DuckDB build bit-identical
    signatures — the oracle checks the bucketed algorithm end-to-end.
    """
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    signed = vecs.select(
        "vec_id", "v", sign_lsh_sig_spark(dim=embedding_dim(vecs)).alias("sig")
    )
    q = signed.where(F.col("vec_id") < _N_QUERIES).alias("q")
    c = signed.where(F.col("vec_id") >= _N_QUERIES).alias("c")
    scored = (
        F.broadcast(q)
        .join(c, F.col("q.sig") == F.col("c.sig"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(_cosine("q.v", "c.v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _TOP_K)
    )

_KNN_K = 2  # neighbors per vector in the kNN graph


@query(
    "sim6_knn_graph",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    signed AS (SELECT vec_id, v, {_SIG_SQL} AS sig FROM vecs),
    scored AS (
      SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
             ROUND({_COS_SQL}, 6) AS cosine
      FROM signed q JOIN signed c
        ON q.sig = c.sig AND q.vec_id <> c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT vec_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {_KNN_K}
    """,
)
def sim6_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN graph over the WHOLE corpus (semantic-dedup / clustering prep):
    every vector's top-k neighbors among its sign-LSH bucket peers.

    Unlike sim1/sim2 (small broadcast query set vs corpus), this is
    corpus-vs-corpus: a SELF-join on the signature — a plain shuffle
    equi-join where each LSH bucket is the unit of co-location, never an
    all-pairs product. At 100 TB this is the standard kNN-graph build:
    shuffle on sig, score within buckets, per-vector window top-k.
    Vectors alone in their bucket have no neighbors and drop out —
    deterministic on both engines because the md5-derived planes are
    shared (functions/lsh.py).
    """
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    signed = vecs.select(
        "vec_id", "v", sign_lsh_sig_spark(dim=embedding_dim(vecs)).alias("sig")
    )
    q, c = signed.alias("q"), signed.alias("c")
    scored = q.join(
        c,
        (F.col("q.sig") == F.col("c.sig")) & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(_cosine("q.v", "c.v"), 6).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _KNN_K)
    )
