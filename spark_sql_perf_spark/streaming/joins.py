"""Stream-stream interval join: watermarked view -> purchase attribution.

The canonical streaming-join shape for an event pipeline: two live
streams (here two filters of one source — a supported stream self-join)
joined per user within an event-time interval. Spark requires exactly
what a 100 TB deployment needs anyway: watermarks on BOTH sides plus a
time-range join condition, which together bound the join state — a view
can only match purchases up to the attribution window later, so state
for older views is dropped as the watermark advances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import stream_events

ATTRIBUTION_WINDOW = "1 hour"
LATE_BOUND = "2 hours"


def _attribution_join(
    views: DataFrame, purchases: DataFrame, how: str = "inner"
) -> DataFrame:
    """The shared join condition: same user, purchase inside
    (view_ts, view_ts + ATTRIBUTION_WINDOW]. Used identically by the
    streaming pair and the batch twin so the test compares semantics,
    not two implementations."""
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
        how,
    ).select(
        F.col("v_user").alias("user_id"),
        F.col("v_ts").alias("view_ts"),
        F.col("p_ts").alias("purchase_ts"),
        F.col("p_value").alias("purchase_value"),
    )


def _views(ev: DataFrame) -> DataFrame:
    return ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )


def _purchases(ev: DataFrame) -> DataFrame:
    return ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )


def streaming_attribution(
    spark: SparkSession, sf_dir: str, stream_dir: str
) -> DataFrame:
    """views |><| purchases as a stream-stream interval join with
    watermarks on both sides (state bounded by LATE_BOUND plus the
    attribution window)."""
    ev = stream_events(spark, sf_dir, stream_dir)
    views = _views(ev).withWatermark("v_ts", LATE_BOUND)
    purchases = _purchases(ev).withWatermark("p_ts", LATE_BOUND)
    return _attribution_join(views, purchases)


def batch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin over the same table — identical join condition,
    no watermarks needed."""
    from ..catalog import table

    ev = table(spark, sf_dir, "events")
    return _attribution_join(_views(ev), _purchases(ev))


def streaming_attribution_outer(
    spark: SparkSession, sf_dir: str, stream_dir: str
) -> DataFrame:
    """LEFT-OUTER stream-stream attribution — the semantics a real
    attribution pipeline needs: every view row emits exactly once,
    either matched to a purchase inside the window or, once the
    watermark passes ``view_ts + ATTRIBUTION_WINDOW``, with NULL
    purchase columns (an unconverted impression).

    Null emission is watermark-DRIVEN: a view's outer row can only be
    produced after the engine knows no matching purchase can still
    arrive, i.e. in a micro-batch whose input watermark has passed the
    view's join-window end. State stays bounded exactly as in the inner
    variant — expired view state is emitted-with-nulls instead of
    silently dropped.
    """
    ev = stream_events(spark, sf_dir, stream_dir)
    views = _views(ev).withWatermark("v_ts", LATE_BOUND)
    purchases = _purchases(ev).withWatermark("p_ts", LATE_BOUND)
    return _attribution_join(views, purchases, "leftOuter")


def batch_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the left-outer attribution join."""
    from ..catalog import table

    ev = table(spark, sf_dir, "events")
    return _attribution_join(_views(ev), _purchases(ev), "leftOuter")


# ---------------------------------------------------------------------------
# stream-static enrichment join
# ---------------------------------------------------------------------------

def _enrich(ev: DataFrame, cust: DataFrame) -> DataFrame:
    """Shared projection for the streaming query and its batch twin:
    left join so enrichment never drops an event (an unmatched user
    arrives with NULL attributes, to be backfilled downstream)."""
    return ev.join(
        F.broadcast(cust), ev["user_id"] == cust["c_custkey"], "left"
    ).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        "value",
    )


def streaming_enrichment(
    spark: SparkSession, sf_dir: str, stream_dir: str
) -> DataFrame:
    """Stream-static join: live events enriched with the customer
    dimension — the canonical enrich-on-ingest shape.

    Stateless (no watermark needed): Spark re-plans the static side per
    micro-batch, so at cluster scale the dimension must be broadcast —
    a shuffled join would re-shuffle every micro-batch of the stream.
    The broadcast hint pins exactly that. A slowly-changing dimension
    swaps in by re-reading the static table per batch (foreachBatch);
    the join shape is unchanged.
    """
    from ..catalog import table

    ev = stream_events(spark, sf_dir, stream_dir)
    return _enrich(ev, table(spark, sf_dir, "customer"))


def batch_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table

    ev = table(spark, sf_dir, "events")
    return _enrich(ev, table(spark, sf_dir, "customer"))
