"""Cogrouped applyInPandas (the last pandas-API variant) and approximate
sketch accuracy bounds."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_TINY


def test_cogroup_asof_equals_window_asof(spark):
    """Cogrouped applyInPandas merge_asof == the window-based as-of join:
    two independent implementations of the same operator agreeing."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from spark_sql_perf_spark.operators import QUERIES
    from spark_sql_perf_spark.operators.asof import _clicks_purchases

    clicks, purchases = _clicks_purchases(spark, SF_DIR_TINY)

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
            StructField("click_ts", TimestampType()),
            StructField("click_value", DoubleType()),
        ]
    )

    def merge(purchase_pdf: pd.DataFrame, click_pdf: pd.DataFrame) -> pd.DataFrame:
        p = purchase_pdf.sort_values("ts")
        c = click_pdf.sort_values("ts")[["ts", "click_value"]].rename(
            columns={"ts": "click_ts"}
        )
        if len(c) == 0:
            out = p.copy()
            out["click_ts"] = pd.NaT
            out["click_value"] = float("nan")
        else:
            out = pd.merge_asof(
                p, c, left_on="ts", right_on="click_ts", direction="backward"
            )
        return out[["event_id", "user_id", "ts", "value", "click_ts", "click_value"]]

    cogrouped = (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(lambda p, c: merge(p, c), schema=schema)
    )
    via_window = QUERIES["asof1_last_click_before_purchase"](spark, SF_DIR_TINY)

    def key(rows):
        return {
            r.event_id: (r.ts, r.click_ts, r.click_value) for r in rows
        }

    assert key(cogrouped.collect()) == key(via_window.collect())


def test_approx_sketches_within_bounds(spark):
    """approx_count_distinct and percentile_approx track exact values —
    the sketch surface (hypercube sampleCardinality analog) is usable for
    planning decisions."""
    from spark_sql_perf_spark.catalog import table

    li = table(spark, SF_DIR_TINY, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_nd"),
        F.countDistinct("l_partkey").alias("exact_nd"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("approx_p50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
    ).collect()[0]
    assert abs(row.approx_nd - row.exact_nd) / row.exact_nd < 0.05
    assert abs(row.approx_p50 - row.exact_p50) / row.exact_p50 < 0.02
