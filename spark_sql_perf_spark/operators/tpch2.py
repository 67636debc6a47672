"""TPC-H pattern-completion corpus: the classic Q4/Q7/Q8/Q10/Q13/Q14/
Q15/Q19/Q21/Q22 shapes adapted to the driver's reduced TPC-H schema.

The testdata lacks ``partsupp`` and several TPC-H columns (l_shipmode,
l_commitdate/l_receiptdate, c_phone, p_container), so each query keeps the
*optimizer pattern* of its TPC-H namesake — join topology, subquery
correlation, aggregate shape, disjunctive-predicate structure — while
re-anchoring predicates on columns that exist. (Reference analogue: the
query-battery role of tpcds/TPCDS_1_4_Queries.scala — named optimizer
patterns over a star schema; the reference carries no TPC-H kit, so these
complete the corpus the testdata schema implies.)

Shapes deliberately NOT duplicated here because the registry already has
them: Q17's correlated-avg scalar (``sub2_correlated_scalar``) and Q18's
IN-(grouped HAVING) (``sub3_in_subquery_agg``).

Scale rules shared by every query below:
- dims broadcast explicitly; fact-fact joins shuffle on their keys;
- EXISTS / NOT EXISTS become one left-semi / left-anti join each (single
  shuffle, no per-row re-execution — the decorrelated plan we'd want at
  100 TB);
- money aggregates run in DECIMAL (order-independent, identical in both
  engines) and cast to double once at the end;
- scalar subqueries are broadcast 1-row aggregates (no second pass over
  the fact table on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import dec, money_sum, money_sum_sql, query
from .tpch import _REV_SQL, _rev


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a *cross-table* predicate
    (l_shipdate vs o_orderdate + interval), counted per priority.

    The EXISTS is one left-semi join carrying the non-equi residual on the
    equi-join key — a single shuffle; Catalyst keeps the orderdate window
    pushed to the orders scan.
    """
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 45 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {money_sum_sql(_REV_SQL, 'revenue', prec=38, scale=4)}
    FROM lineitem, supplier, orders, customer, nation n1, nation n2
    WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_15')
        OR (n1.n_name = 'NATION_15' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume — the same
    dim joined twice under different roles, with a disjunctive pair filter
    that Catalyst pushes into both broadcast joins.

    NATION_3 / NATION_15 both carry suppliers at every shipped SF (the
    tiny SF has suppliers in only 10 of 25 nations), so the query is
    non-degenerate at sf0.001 through sf0.1.
    """
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_15")
    ) | ((F.col("supp_nation") == "NATION_15") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev().cast("decimal(38,4)")).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT year(o_orderdate) AS o_year,
           (CAST(SUM(CAST(CASE WHEN rs.r_name = 'ASIA' THEN {_REV_SQL} ELSE 0 END
                          AS DECIMAL(38,4))) AS DOUBLE))
           / (CAST(SUM(CAST({_REV_SQL} AS DECIMAL(38,4))) AS DOUBLE)) AS mkt_share
    FROM lineitem, part, supplier, orders, customer,
         nation nc, region rc, nation ns, region rs
    WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND c_nationkey = nc.n_nationkey AND nc.n_regionkey = rc.r_regionkey
      AND s_nationkey = ns.n_nationkey AND ns.n_regionkey = rs.r_regionkey
      AND rc.r_name = 'ASIA' AND p_type = 'ECONOMY'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join with a CASE-weighted share per year.

    Adaptation: share of ASIA customers' ECONOMY spend that is ALSO
    supplied from ASIA (the schema has no p_mfgr/nation-of-interest
    column; supplier-region share keeps the two-role nation/region join
    and the conditional-numerator ÷ total denominator structure). Both
    sums run in DECIMAL so the final double division is bit-identical
    cross-engine.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    nc = nation.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_reg"))
    rc = region.where(F.col("r_name") == "ASIA").select(F.col("r_regionkey").alias("rc_key"))
    ns = nation.select(F.col("n_nationkey").alias("ns_key"), F.col("n_regionkey").alias("ns_reg"))
    rs = region.select(F.col("r_regionkey").alias("rs_key"), F.col("r_name").alias("supp_region"))
    asia_rev = F.when(F.col("supp_region") == "ASIA", _rev()).otherwise(
        F.lit(0).cast("decimal(3,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(rc), F.col("nc_reg") == F.col("rc_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(rs), F.col("ns_reg") == F.col("rs_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(asia_rev.cast("decimal(38,4)")).cast("double")
                / F.sum(_rev().cast("decimal(38,4)")).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {money_sum_sql(_REV_SQL, 'revenue', prec=38, scale=4)},
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.

    Fact-fact join shuffles on the order key; customer is the post-agg
    join side; nation broadcast. The LIMIT rides a total order
    (revenue DESC, c_custkey) so ties are deterministic cross-engine.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev().cast("decimal(38,4)")).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderstatus <> 'P'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation over a *filtered* left outer
    join (the filter must live in the join condition, not a WHERE, to keep
    zero-order customers). COUNT(col) counts only matched rows — the
    outer-join null contributes c_count=0, not 1.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus != "P"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT (100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END
                                   AS DECIMAL(38,4))) AS DOUBLE))
           / CAST(SUM(CAST({_REV_SQL} AS DECIMAL(38,4))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-numerator percentage in one aggregation
    pass (no second scan for the denominator). The 100.0 multiply happens
    before the divide in both engines — identical IEEE op order.
    """
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-03-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    part = table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast("decimal(3,2)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                (F.lit(100.0) * F.sum(promo.cast("decimal(38,4)")).cast("double"))
                / F.sum(_rev().cast("decimal(38,4)")).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {money_sum_sql(_REV_SQL, 'total_revenue', prec=38, scale=4)}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: view reuse + scalar MAX subquery over the view.

    The per-supplier revenue frame (≤ |supplier| rows) is aggregated once;
    its 1-row MAX is broadcast back — both engines compare the *identical*
    double (same decimal sum, same cast), so the equality filter is exact.
    """
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1998-01-01")) & (F.col("l_shipdate") < _ts("1998-04-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev().cast("decimal(38,4)")).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {money_sum_sql(_REV_SQL, 'revenue', prec=38, scale=4)}
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
            AND l_quantity BETWEEN 1 AND 15)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
            AND l_quantity BETWEEN 10 AND 25)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
            AND l_quantity BETWEEN 20 AND 35))
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive (part-attr × lineitem-
    attr) branches across an equi join. Catalyst derives the pushable
    common factors (brand/size union on the part scan) from the OR; the
    cross-table residual evaluates post-join inside codegen.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")

    def branch(brand: str, size_lo: int, size_hi: int, q_lo: int, q_hi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = branch("Brand#1", 1, 10, 1, 15) | branch("Brand#2", 11, 25, 10, 25) | branch(
        "Brand#3", 26, 50, 20, 35
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(F.sum(_rev().cast("decimal(38,4)")).cast("double").alias("revenue"))
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH mx AS (SELECT l_orderkey AS k, MAX(l_shipdate) AS max_ship,
                       COUNT(DISTINCT l_suppkey) AS n_supp
                FROM lineitem GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1, mx, orders, supplier
    WHERE l1.l_orderkey = mx.k AND mx.n_supp > 1
      AND l1.l_shipdate = mx.max_ship
      AND o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      AND s_suppkey = l1.l_suppkey
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate = mx.max_ship)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS over the same fact table with a
    per-order derived bound. Adaptation: "supplier kept the order waiting"
    = it alone shipped on the order's latest ship date in a multi-supplier
    finalized order (the schema has no commit/receipt dates, so lateness
    anchors on the per-order MAX instead).

    One grouped pass derives (max_ship, n_supp); the NOT EXISTS is a
    single left-anti join on (orderkey, other-supplier, ties-max) — three
    shuffles total on l_orderkey, reusable by AQE, never per-row.
    """
    li = table(spark, sf_dir, "lineitem")
    stats = (
        li.groupBy(F.col("l_orderkey").alias("k"))
        .agg(
            F.max("l_shipdate").alias("max_ship"),
            F.countDistinct("l_suppkey").alias("n_supp"),
        )
        .where(F.col("n_supp") > 1)
    )
    orders_f = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    cand = (
        li.join(stats, (li.l_orderkey == stats.k) & (li.l_shipdate == stats.max_ship))
        .join(orders_f, F.col("l_orderkey") == orders_f.o_orderkey, "left_semi")
    )
    others = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_suppkey").alias("osk"),
        F.col("l_shipdate").alias("osd"),
    )
    lone = cand.join(
        others,
        (cand.l_orderkey == others.ok)
        & (cand.l_suppkey != others.osk)
        & (others.osd == cand.max_ship),
        "left_anti",
    )
    return (
        lone.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@query(
    "q22_inactive_customers",
    oracle="""
    SELECT substr(c_name, 16, 2) AS cust_code, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                              / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cust_code
    ORDER BY cust_code
    """,
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: anti join + uncorrelated scalar-avg subquery,
    grouped by a derived code. Adaptation: "country code" is the last two
    digits of c_name (no c_phone column); "no orders" means none since
    2000-01-01 (every customer has lifetime orders in this testdata).

    The positive-balance average is an exact-decimal 1-row broadcast; the
    recent-orders anti join shuffles the (filtered, single-column)
    o_custkey projection only.
    """
    cust = table(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 16, 2).alias("cust_code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("cust_code")
    )
