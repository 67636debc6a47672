"""Set-operation corpus (SURVEY.md §2.7).

UNION ALL (34 uses in the reference, q2/q5/q14...), bare UNION (q54),
INTERSECT (q14/q38), EXCEPT (q87), and the n-fold self-union
match-multiplicity scaler (JoinPerformance.scala:64-70).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import query


@query(
    "set_union_all",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    b = orders.where(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionAll(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare UNION = union + distinct (TPC-DS q54 shape)."""
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (q14a/q38 shape)."""
    cust = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@query(
    "set_except",
    oracle="""
    SELECT l_suppkey AS suppkey FROM lineitem
    EXCEPT
    SELECT s_suppkey AS suppkey FROM supplier WHERE s_acctbal > 0
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (q87 shape): suppliers seen in lineitem minus those in good
    standing — non-empty at every sf (some suppliers have negative balance)."""
    li = table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("suppkey"))
    supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 0)
        .select(F.col("s_suppkey").alias("suppkey"))
    )
    return li.subtract(supp)  # EXCEPT (distinct semantics), not EXCEPT ALL


@query(
    "set_nfold_union_multiplicity",
    oracle="""
    WITH u AS (
      SELECT l_orderkey FROM lineitem UNION ALL
      SELECT l_orderkey FROM lineitem UNION ALL
      SELECT l_orderkey FROM lineitem UNION ALL
      SELECT l_orderkey FROM lineitem)
    SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS n_distinct FROM u
    """,
)
def set_nfold_union_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-fold self-union (match-multiplicity scaling of
    JoinPerformance.scala:64-70, `Seq.fill(n)(df).reduce(union)`)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey")
    u = reduce(DataFrame.unionAll, [li] * 4)
    return u.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_distinct"),
    )


@query(
    "set_multiset_ops",
    oracle="""
    WITH a AS (SELECT user_id FROM events WHERE event_type = 'click'),
         b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
         ia AS (SELECT user_id FROM a INTERSECT ALL SELECT user_id FROM b),
         ea AS (SELECT user_id FROM a EXCEPT ALL SELECT user_id FROM b)
    SELECT (SELECT COUNT(*) FROM ia) AS n_intersect_all,
           (SELECT COUNT(DISTINCT user_id) FROM ia) AS d_intersect_all,
           (SELECT COUNT(*) FROM ea) AS n_except_all,
           (SELECT COUNT(DISTINCT user_id) FROM ea) AS d_except_all
    """,
)
def set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL (multiset semantics: per key,
    min(m_a, m_b) resp. m_a - m_b occurrences survive). The row counts
    differ from the distinct counts precisely because users click and
    purchase many times — so the oracle hash-checks the multiplicity
    arithmetic, not just membership. Both compile to a single
    count-and-replicate aggregation per side, shuffling only keys."""
    ev = table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    ia, ea = a.intersectAll(b), a.exceptAll(b)

    def counts(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.countDistinct("user_id").alias(f"d_{tag}"),
        )

    return (
        counts(ia, "intersect_all")
        .crossJoin(F.broadcast(counts(ea, "except_all")))
        .select("n_intersect_all", "d_intersect_all", "n_except_all", "d_except_all")
    )
