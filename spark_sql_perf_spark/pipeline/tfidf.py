"""TF-IDF over the documents table — the canonical text-featurization
aggregate, fully SQL-expressible so the whole pipeline (tokenize, term
frequencies, document frequencies, idf weighting, per-doc top term) is
oracle-checked.

Scale shape: two aggregations over the exploded (doc, word) relation —
shuffle keys are words (bounded vocab) and doc ids; no pairwise work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.registry import query


@query(
    "t5_tfidf_top_term",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
      FROM documents),
    tf AS (
      SELECT doc_id, w, COUNT(*) AS n,
             COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS tf
      FROM words GROUP BY doc_id, w),
    df AS (
      SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w),
    n_docs AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w,
             ROUND(tf.tf * LN(n_docs.n * 1.0 / df.df), 6) AS tfidf
      FROM tf, df, n_docs WHERE tf.w = df.w),
    ranked AS (
      SELECT doc_id, w, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, w) AS rn
      FROM scored)
    SELECT doc_id, w AS top_term, tfidf FROM ranked WHERE rn = 1
    """,
)
def t5_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: per-doc term frequency x inverse document frequency, top
    term per document. tfidf rounded to 6 decimals (LN is the one
    non-exact step; tf is a ratio of ints, identical in both engines)."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
    )
    w_doc = Window.partitionBy("doc_id")
    tf = (
        words.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "doc_id", "w",
            (F.col("n") * 1.0 / F.sum("n").over(w_doc)).alias("tf"),
        )
    )
    df_ = words.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df_, "w")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "w",
            F.round(F.col("tf") * F.log(F.col("n") * 1.0 / F.col("df")), 6).alias("tfidf"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "w")
    return (
        scored.select("doc_id", "w", "tfidf", F.row_number().over(w_rank).alias("rn"))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("w").alias("top_term"), "tfidf")
    )
