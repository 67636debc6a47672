"""Vector (embedding) column expressions — JVM-side, no Python UDFs.

Embeddings are array<float>; all arithmetic is done in double via
higher-order functions (`zip_with` + `aggregate`), which Catalyst keeps
inside codegen. Cosine values are rounded to 6 decimals wherever they are
compared across engines: a 64-term float reduction is reproducible only to
~1e-15 relative error between Spark and DuckDB.

At 100 TB scale this brute-force kernel is the *verifier*; the scale path
is the LSH-bucketed variant in pipeline/similarity.py which prunes the
candidate set before this kernel runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# DuckDB mirrors. list_dot_product/list_cosine_similarity exist but their
# reduction order is unspecified; an explicit left-fold matches Spark's
# `aggregate` semantics exactly (both still rounded when compared).
def dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(range(1, len({a}) + 1), i -> ({a})[i] * ({b})[i]))"


def cosine_sql(a: str, b: str) -> str:
    return f"{dot_sql(a, b)} / (SQRT({dot_sql(a, a)}) * SQRT({dot_sql(b, b)}))"
