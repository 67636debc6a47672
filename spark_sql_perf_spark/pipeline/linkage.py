"""Record linkage: blocked fuzzy (edit-distance) self-join.

The classic entity-resolution shape a training-data pipeline needs when
merging catalogs / author lists / near-identical metadata rows: generate
candidate pairs inside equality blocks, verify with an edit-distance
predicate, and emit the matched pairs. Extension surface beyond the
reference's equi/theta joins (joins.py cites the reference's join
corpus); the fuzzy-VERIFY step here is what c7's Jaccard decontamination
is to d2 — a different similarity family (character-level edits vs
token-set overlap) for a different failure mode (typos and small edits,
not paraphrase).

100 TB design: the blocking key is an EQUALITY column (`p_brand`), so
candidate generation is a plain shuffled equi-join — no all-pairs
anything; pairwise levenshtein work is confined to within-block pairs
exactly like d2's LSH buckets and d4's n-gram blocks. `levenshtein` is a
JVM builtin (whole-stage codegen, no Python); the id-order predicate
halves the work and canonicalizes pair identity. A skewed block (one
giant brand) is the same failure mode as a skewed join key — AQE skew
handling applies because the candidate step IS a join. Spark's
3-argument ``levenshtein(l, r, threshold)`` short-circuits the DP once
the running distance exceeds the bound — O(k*n) per pair instead of
O(n^2) — but returns -1 sentinels; we keep the 2-arg exact form because
the result column is part of the output contract (and the names here
are ~11 chars; at long-string scale, swap in the bounded form and map
-1 to NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..operators.registry import query

_FZ1_MAX_DIST = 3


@query(
    "fz1_fuzzy_join_levenshtein",
    oracle=f"""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_brand AS brand,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {_FZ1_MAX_DIST}
    """,
)
def fz1_fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: part names within the same brand block
    whose edit distance is <= 3, as canonical (key_a < key_b) pairs."""
    part = table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "brand")
        .where(F.col("key_a") < F.col("key_b"))
        .where(dist <= _FZ1_MAX_DIST)
        .select("key_a", "key_b", "brand", "name_a", "name_b", dist.alias("edit_dist"))
    )
