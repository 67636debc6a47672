"""Mergeable-sketch library: bounded error vs exact, estimate
determinism under repartitioning (union algebra is order-insensitive),
and the rollup-without-rescan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_TINY


def _events(spark):
    from spark_sql_perf_spark.catalog import table

    return table(spark, SF_DIR_TINY, "events")


def test_grouped_hll_estimate_within_error(spark):
    from spark_sql_perf_spark.functions.sketches import grouped_distinct_estimate

    ev = _events(spark)
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in grouped_distinct_estimate(ev, "event_type", "user_id").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        rel = abs(approx[k] - exact[k]) / exact[k]
        assert rel < 0.05, f"{k}: approx={approx[k]} exact={exact[k]} rel={rel:.3f}"


def test_hll_estimate_is_partitioning_invariant(spark):
    """HLL registers are maxima over item hashes — fully order- and
    partitioning-insensitive, so the estimate is bit-stable however the
    cluster happens to split the data."""
    from spark_sql_perf_spark.functions.sketches import (
        distinct_sketch,
        sketch_estimate,
    )

    ev = _events(spark)
    est = lambda df: df.agg(
        sketch_estimate(distinct_sketch("user_id")).alias("e")
    ).collect()[0]["e"]
    assert est(ev) == est(ev.repartition(17, "event_id")) == est(ev.coalesce(1))


def test_rollup_union_matches_direct_sketch(spark):
    """Per-day sketches unioned to a single estimate must equal sketching
    the whole column directly — the property that lets stored daily
    sketches answer month/all-time questions without rescanning rows."""
    from spark_sql_perf_spark.functions.sketches import (
        distinct_sketch,
        rollup_distinct_estimate,
        sketch_estimate,
    )

    ev = _events(spark).withColumn("day", F.to_date("ts"))
    rolled = rollup_distinct_estimate(
        ev, fine="day", coarse=F.lit("all"), col="user_id"
    ).collect()
    assert len(rolled) == 1
    direct = ev.agg(
        sketch_estimate(distinct_sketch("user_id")).alias("e")
    ).collect()[0]["e"]
    assert rolled[0]["approx_distinct"] == direct


def test_approx_quantiles_bracket_exact(spark):
    from spark_sql_perf_spark.functions.sketches import approx_quantiles

    ev = _events(spark)
    (qs,) = approx_quantiles(ev, "value", [0.25, 0.5, 0.75]).collect()
    lo, med, hi = qs["quantiles"]
    exact_med = ev.agg(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    assert lo <= med <= hi
    # accuracy=10k on tiny data: approx median within 2% of exact
    assert abs(med - exact_med) / max(abs(exact_med), 1e-9) < 0.02


def test_count_min_blob_is_partitioning_invariant(spark):
    """CMS counters are sums — addition commutes, so the serialized
    sketch is byte-identical under any partitioning."""
    from spark_sql_perf_spark.functions.sketches import frequency_sketch

    ev = _events(spark)
    a = frequency_sketch(ev, "event_type").collect()[0]["cms"]
    b = frequency_sketch(ev.repartition(13, "user_id"), "event_type").collect()[0]["cms"]
    assert a is not None and len(a) > 0
    assert bytes(a) == bytes(b)
