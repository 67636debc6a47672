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
from ..functions.text import md5_hash32_sql
from ..operators.registry import query

_TOP_K = 3
_N_QUERIES = 5  # vectors with vec_id < 5 act as the query set
_LSH_BITS = 8

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


def _plane_sign_sql(bit: int) -> str:
    """DuckDB: sign bit `bit` = sign of dot(v, plane_bit) where
    plane_bit[i] = md5_hash32(bit|i) / 2^31 - 1  (deterministic in [-1, 1))."""
    hash_arg = f"'p{bit}-' || CAST(i AS VARCHAR)"
    plane_i = f"({md5_hash32_sql(hash_arg, 'lsh')} / 2147483648.0 - 1.0)"
    return (
        f"CASE WHEN list_sum(list_transform(range(1, len(v) + 1),"
        f" i -> v[i] * {plane_i})) > 0 THEN {1 << bit} ELSE 0 END"
    )


def _plane_sign_spark(bit: int) -> F.Column:
    plane_i = (
        f"(cast(conv(substring(md5(concat('lsh|p{bit}-', cast(i as string))), 1, 8), 16, 10) AS BIGINT)"
        f" / 2147483648.0 - 1.0)"
    )
    proj = F.expr(
        f"aggregate(transform(sequence(1, size(v)), i -> element_at(v, i) * {plane_i}),"
        f" cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return F.when(proj > 0, F.lit(1 << bit)).otherwise(F.lit(0))


def sign_lsh_sig_sql(nbits: int = _LSH_BITS) -> str:
    """DuckDB expression for the nbits-bit hyperplane-sign signature of
    a DOUBLE[] column named ``v`` (bit-identical to the Spark twin)."""
    return " + ".join(_plane_sign_sql(b) for b in range(nbits))


def sign_lsh_sig_spark(nbits: int = _LSH_BITS) -> F.Column:
    """Spark twin of ``sign_lsh_sig_sql`` over an array<double> column
    ``v`` — shared by sim2's ANN bucketing and d5's dedup blocking."""
    sig = None
    for b in range(nbits):
        term = _plane_sign_spark(b)
        sig = term if sig is None else sig + term
    return sig


_SIG_SQL = sign_lsh_sig_sql()


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
    signed = vecs.select("vec_id", "v", sign_lsh_sig_spark().alias("sig"))
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
