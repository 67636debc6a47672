"""TPC-DS query suite over the GENERATED 24-table schema.

These run against `sources.datagen.gen_tpcds` tables (the dsdgen
replacement), not the driver testdata — so they are not in the DuckDB
oracle gate. Correctness is the reference's own model for this corpus:
the crc32 result fingerprint (ExecutionMode.HashResults) must be stable
run-to-run and across config variations (tests/test_tpcds_suite.py).

Queries are the classic patterns on the real TPC-DS schema: q3/q42/q52
(date x item star aggregates), q7 (multi-dim star), q19 (brand revenue),
q73 (having + count window over store/household).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..query import Query
from ..sources.datagen import gen_tpcds

TPCDS_TABLES = (
    "store_sales", "store_returns", "date_dim", "item", "customer", "store",
    "promotion", "customer_demographics", "household_demographics",
    "customer_address",
)


def register_tpcds(spark: SparkSession, scale: float = 0.01, seed: str = "100") -> None:
    for name in TPCDS_TABLES:
        gen_tpcds(spark, name, scale, seed).createOrReplaceTempView(name)


_QUERIES: dict[str, str] = {
    "tpcds_q3": """
        SELECT d_year, i_brand, SUM(CAST(ss_ext_sales_price AS DECIMAL(18,2))) AS sum_agg
        FROM store_sales
          JOIN date_dim ON ss_sold_date_sk = d_date_sk
          JOIN item ON ss_item_sk = i_item_sk
        WHERE i_manufact_id BETWEEN 1 AND 100 AND d_moy = 11
        GROUP BY d_year, i_brand
        ORDER BY d_year, sum_agg DESC, i_brand
        LIMIT 100
    """,
    "tpcds_q7": """
        SELECT i_brand,
               AVG(CAST(ss_quantity AS DECIMAL(18,2))) AS agg1,
               AVG(CAST(ss_list_price AS DECIMAL(18,2))) AS agg2,
               AVG(CAST(ss_coupon_amt AS DECIMAL(18,2))) AS agg3,
               AVG(CAST(ss_sales_price AS DECIMAL(18,2))) AS agg4
        FROM store_sales
          JOIN customer_demographics ON ss_cdemo_sk = cd_demo_sk
          JOIN date_dim ON ss_sold_date_sk = d_date_sk
          JOIN item ON ss_item_sk = i_item_sk
          JOIN promotion ON ss_promo_sk = p_promo_sk
        WHERE cd_gender = 'M' AND cd_marital_status = 'S'
          AND cd_education_status = 'College'
          AND (p_channel_email = 'N' OR p_channel_tv = 'N')
        GROUP BY i_brand
        ORDER BY i_brand
        LIMIT 100
    """,
    "tpcds_q19": """
        SELECT i_brand, i_manufact_id,
               SUM(CAST(ss_ext_sales_price AS DECIMAL(18,2))) AS ext_price
        FROM store_sales
          JOIN date_dim ON ss_sold_date_sk = d_date_sk
          JOIN item ON ss_item_sk = i_item_sk
          JOIN customer ON ss_customer_sk = c_customer_sk
        WHERE i_manufact_id BETWEEN 50 AND 200 AND d_moy = 12
        GROUP BY i_brand, i_manufact_id
        ORDER BY ext_price DESC, i_brand, i_manufact_id
        LIMIT 100
    """,
    "tpcds_q42": """
        SELECT d_year, i_category, SUM(CAST(ss_ext_sales_price AS DECIMAL(18,2))) AS total
        FROM store_sales
          JOIN date_dim ON ss_sold_date_sk = d_date_sk
          JOIN item ON ss_item_sk = i_item_sk
        WHERE d_moy = 11 AND d_year BETWEEN 1999 AND 2002
        GROUP BY d_year, i_category
        ORDER BY total DESC, d_year, i_category
        LIMIT 100
    """,
    "tpcds_q52": """
        SELECT d_year, i_brand, SUM(CAST(ss_ext_sales_price AS DECIMAL(18,2))) AS ext_price
        FROM store_sales
          JOIN date_dim ON ss_sold_date_sk = d_date_sk
          JOIN item ON ss_item_sk = i_item_sk
        WHERE d_moy = 12
        GROUP BY d_year, i_brand
        ORDER BY d_year, ext_price DESC, i_brand
        LIMIT 100
    """,
    "tpcds_q1": """
        WITH customer_total_return AS (
          SELECT sr_customer_sk AS ctr_customer_sk,
                 sr_store_sk AS ctr_store_sk,
                 SUM(CAST(sr_return_amt AS DECIMAL(18,2))) AS ctr_total_return
          FROM store_returns JOIN date_dim ON sr_returned_date_sk = d_date_sk
          WHERE d_year = 2000
          GROUP BY sr_customer_sk, sr_store_sk)
        SELECT c_customer_id
        FROM customer_total_return ctr1
          JOIN customer ON ctr1.ctr_customer_sk = c_customer_sk
        WHERE ctr1.ctr_total_return > (
          SELECT AVG(ctr_total_return) * 1.2
          FROM customer_total_return ctr2
          WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
        ORDER BY c_customer_id
        LIMIT 100
    """,
    "tpcds_q98": """
        SELECT i_item_id, i_category,
               SUM(CAST(ss_ext_sales_price AS DECIMAL(18,2))) AS itemrevenue,
               SUM(CAST(ss_ext_sales_price AS DECIMAL(18,2))) * 100.0
                 / SUM(SUM(CAST(ss_ext_sales_price AS DECIMAL(18,2))))
                     OVER (PARTITION BY i_category) AS revenueratio
        FROM store_sales
          JOIN item ON ss_item_sk = i_item_sk
          JOIN date_dim ON ss_sold_date_sk = d_date_sk
        WHERE d_moy = 5
        GROUP BY i_item_id, i_category
        ORDER BY i_category, revenueratio DESC, i_item_id
        LIMIT 100
    """,
    "tpcds_q73": """
        SELECT c_customer_sk, cnt
        FROM (
          SELECT ss_customer_sk, COUNT(*) AS cnt
          FROM store_sales
            JOIN date_dim ON ss_sold_date_sk = d_date_sk
            JOIN store ON ss_store_sk = s_store_sk
            JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
          WHERE hd_buy_potential IN ('>10000', 'Unknown') AND hd_vehicle_count > 0
          GROUP BY ss_customer_sk
          HAVING COUNT(*) BETWEEN 2 AND 100
        ) dj JOIN customer ON ss_customer_sk = c_customer_sk
        ORDER BY cnt DESC, c_customer_sk
        LIMIT 100
    """,
}


def tpcds_queries() -> list[Query]:
    return [Query.from_sql(name, sql) for name, sql in _QUERIES.items()]
