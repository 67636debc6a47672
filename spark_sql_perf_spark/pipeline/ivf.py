"""IVF-style ANN: coarse quantization -> cluster-pruned exact search.

The scale path for similarity search beyond sign-LSH (similarity.py):
partition the corpus into Voronoi cells around coarse centroids, search
only the query's cell. At 100 TB the corpus is written PARTITIONED BY
cell id, so a query reads 1/n_cells of the data (partition pruning) —
this module expresses the same structure on the flat testdata table.

Centroids here are a deterministic subset of the vectors themselves
(vec_id < n_centroids) rather than k-means output, so the whole pipeline —
assignment, pruning, ranking — is oracle-checkable in DuckDB. Swapping in
`pyspark.ml.clustering.KMeans` centroids changes recall, not the plan
shape (see ml/benchmarks.py for the trained variant's building block).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.registry import query

_N_CENTROIDS = 16
_N_QUERIES = 5
_TOP_K = 3

_DIST_SQL = (
    "list_sum(list_transform(range(1, len(v.v) + 1),"
    " i -> (v.v[i] - c.v[i]) * (v.v[i] - c.v[i])))"
)
_COS_SQL = (
    "list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * n.v[i]))"
    " / (SQRT(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * q.v[i])))"
    "    * SQRT(list_sum(list_transform(range(1, len(n.v) + 1), i -> n.v[i] * n.v[i]))))"
)


@query(
    "sim3_ivf_ann",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v FROM vecs WHERE vec_id < {_N_CENTROIDS}),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY ROUND({_DIST_SQL}, 9), c.cid) AS rn
        FROM vecs v, cents c) t
      WHERE rn = 1),
    q AS (SELECT vecs.vec_id, v, a.cid FROM vecs JOIN assigned a USING (vec_id)
          WHERE vecs.vec_id < {_N_QUERIES}),
    cand AS (SELECT vecs.vec_id, v, a.cid FROM vecs JOIN assigned a USING (vec_id)
             WHERE vecs.vec_id >= {_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             ROUND({_COS_SQL}, 6) AS cosine
      FROM q JOIN cand n ON q.cid = n.cid),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {_TOP_K}
    """,
)
def sim3_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign every vector to its nearest coarse centroid
    (argmin over {_N_CENTROIDS} via window rank), then search only the
    query's cell. Assignment distance is rounded to 9 decimals before the
    argmin so the cell boundaries are engine-identical."""
    vecs = _vecs(spark, sf_dir)
    cents = vecs.where(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    return _ivf_search(vecs, cents)


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _dot(x: str, y: str) -> F.Column:
    return F.aggregate(
        F.zip_with(F.col(x), F.col(y), lambda p, r: p * r),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _ivf_search(
    vecs: DataFrame, cents: DataFrame,
    n_queries: int = _N_QUERIES, top_k: int = _TOP_K, nprobe: int = 1,
) -> DataFrame:
    """Shared IVF machinery: Voronoi assignment against ``cents``
    (cid, cv), then exact cosine top-k over the query's ``nprobe``
    nearest cells (candidates always live in exactly one cell, so
    multi-probe trades scanned-candidate count for recall — the standard
    IVF knob; well-balanced trained centroids need nprobe > 1)."""
    dist = F.aggregate(
        F.zip_with(F.col("v"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.round(dist, 9).asc(), F.col("cid"))
    ranked_cells = (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "cid", F.row_number().over(w_assign).alias("rn"))
    )
    assigned = ranked_cells.where(F.col("rn") == 1).select("vec_id", "v", "cid")

    q = (
        ranked_cells.where(
            (F.col("vec_id") < n_queries) & (F.col("rn") <= nprobe)
        )
        .select("vec_id", "v", "cid")
        .alias("q")
    )
    cand = assigned.where(F.col("vec_id") >= n_queries).alias("n")

    cos = _dot("q.v", "n.v") / (F.sqrt(_dot("q.v", "q.v")) * F.sqrt(_dot("n.v", "n.v")))
    scored = (
        F.broadcast(q)
        .join(cand, F.col("q.cid") == F.col("n.cid"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("n.vec_id").alias("neighbor_id"),
            F.round(cos, 6).alias("cosine"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.select("*", F.row_number().over(w_rank).alias("rn")).where(
        F.col("rn") <= top_k
    )


def _normalized(vecs: DataFrame) -> DataFrame:
    """L2-normalize so euclidean cell assignment agrees with the cosine
    ranking metric (spherical IVF): argmin ||q-c|| == argmax cos(q,c) on
    the unit sphere. Cosine scores are scale-invariant, so ranking over
    normalized vectors equals ranking over the raw ones."""
    norm = F.sqrt(F.aggregate(
        F.transform(F.col("v"), lambda x: x * x), F.lit(0.0),
        lambda acc, x: acc + x,
    ))
    return vecs.select(
        "vec_id", F.transform(F.col("v"), lambda x: x / norm).alias("v")
    )


def kmeans_centroids(
    spark: SparkSession, sf_dir: str, k: int = _N_CENTROIDS, seed: int = 100,
) -> DataFrame:
    """Coarse centroids trained with pyspark.ml KMeans over L2-normalized
    vectors (spherical k-means, the production IVF path for a cosine
    metric). Iterative, so rows-only for the driver; recall vs the subset
    variant is asserted in tests."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = _normalized(_vecs(spark, sf_dir))
    train = vecs.select(array_to_vector(F.col("v")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=10).fit(train)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(centers, "cid long, cv array<double>")


@query("sim4_ivf_kmeans_ann")  # iterative training -> rows-only check
def sim4_ivf_kmeans_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with trained spherical-k-means coarse centroids: same
    assignment / cell-pruned search plan as sim3, centroids from
    pyspark.ml KMeans over unit vectors, nprobe=4."""
    vecs = _normalized(_vecs(spark, sf_dir))
    cents = kmeans_centroids(spark, sf_dir)
    return _ivf_search(vecs, cents, nprobe=4)
