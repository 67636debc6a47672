"""Text-quality filtering + standalone blocked n-gram Jaccard.

d4: pairwise n-gram Jaccard WITHOUT LSH — candidate pairs come from a
blocking key (same source + same length bucket) instead of minhash bands.
The block bound is what keeps it sub-quadratic: pairs ~ sum(block^2),
never |docs|^2. Complements d2 (which verifies candidates from LSH bands).

q6: the composite quality classifier a training-data pipeline runs before
ingestion: length bounds, repetition ratio, stopword coverage -> keep/drop
with a reason code. Pure column expressions, oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.registry import query

_JACCARD_MIN = 0.35


@query(
    "d4_ngram_jaccard_blocked",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, n_chars // 100 AS len_bucket,
             list_distinct(string_split_regex(lower(text), '\\s+')) AS ws
      FROM documents),
    grams AS (
      SELECT doc_id, source, len_bucket, unnest(ws) AS w FROM toks),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.source AS source, a.len_bucket AS len_bucket
      FROM toks a JOIN toks b
        ON a.source = b.source AND a.len_bucket = b.len_bucket
       AND a.doc_id < b.doc_id),
    common AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_common
      FROM cand c
        JOIN grams ga ON ga.doc_id = c.id_a
        JOIN grams gb ON gb.doc_id = c.id_b AND gb.w = ga.w
      GROUP BY c.id_a, c.id_b),
    sizes AS (SELECT doc_id, LEN(ws) AS n FROM toks)
    SELECT id_a, id_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM common
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= {_JACCARD_MIN}
    """,
)
def d4_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d4: word-set Jaccard over blocked candidate pairs (same source +
    length bucket). Word-level (not shingle) similarity on this corpus is
    informative because the vocab is small — near-identical word sets
    signal template duplication."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        (F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        F.array_distinct(F.split(F.lower(F.col("text")), r"\s+")).alias("ws"),
    )
    grams = toks.select("doc_id", F.explode("ws").alias("w"))
    a = toks.alias("a")
    b = toks.alias("b")
    cand = a.join(
        b,
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    ga = grams.alias("ga")
    gb = grams.alias("gb")
    common = (
        cand.join(ga, F.col("ga.doc_id") == F.col("id_a"))
        .join(gb, (F.col("gb.doc_id") == F.col("id_b")) & (F.col("gb.w") == F.col("ga.w")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = toks.select("doc_id", F.size("ws").alias("n"))
    jac = F.col("n_common").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        common.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("id_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("id_b"))
        .where(jac >= _JACCARD_MIN)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "q6_quality_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, n_chars,
             LEN(string_split_regex(text, '\\s+')) AS n_words,
             LEN(list_distinct(string_split_regex(lower(text), '\\s+'))) AS n_distinct,
             LEN(list_filter(string_split_regex(lower(text), '\\s+'),
                             w -> w IN ('the', 'a', 'of', 'and', 'is'))) AS n_stop
      FROM documents)
    SELECT doc_id, n_chars, n_words,
           ROUND(n_distinct * 1.0 / n_words, 6) AS distinct_ratio,
           ROUND(n_stop * 1.0 / n_words, 6) AS stopword_ratio,
           CASE WHEN n_chars < 100 THEN 'too_short'
                WHEN n_chars > 20000 THEN 'too_long'
                WHEN n_distinct * 1.0 / n_words < 0.3 THEN 'repetitive'
                WHEN n_stop = 0 THEN 'no_stopwords'
                ELSE 'keep' END AS verdict
    FROM scored
    """,
)
def q6_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality filter: length bounds, repetition (distinct-word
    ratio), stopword coverage -> keep/drop verdict with reason."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split("text", r"\s+")
    lws = F.split(F.lower(F.col("text")), r"\s+")
    scored = docs.select(
        "doc_id",
        "n_chars",
        F.size(ws).alias("n_words"),
        F.size(F.array_distinct(lws)).alias("n_distinct"),
        F.size(
            F.expr("filter(split(lower(text), '\\\\s+'), w -> w IN ('the','a','of','and','is'))")
        ).alias("n_stop"),
    )
    return scored.select(
        "doc_id",
        "n_chars",
        "n_words",
        F.round(F.col("n_distinct") * 1.0 / F.col("n_words"), 6).alias("distinct_ratio"),
        F.round(F.col("n_stop") * 1.0 / F.col("n_words"), 6).alias("stopword_ratio"),
        F.when(F.col("n_chars") < 100, "too_short")
        .when(F.col("n_chars") > 20000, "too_long")
        .when(F.col("n_distinct") * 1.0 / F.col("n_words") < 0.3, "repetitive")
        .when(F.col("n_stop") == 0, "no_stopwords")
        .otherwise("keep")
        .alias("verdict"),
    )
