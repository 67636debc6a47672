"""CDC-to-SCD2 apply: maintain a slowly-changing-dimension table from a
change stream, converging to exactly the batch operator's answer.

The batch twin is ``cdc1_scd2_compress`` (operators/timeseries.py):
collapse each user's consecutive runs of the same event_type into
[valid_from, valid_to) validity intervals. The streaming form cannot
just append per-batch intervals — a run that spans a micro-batch
boundary arrives as two fragments, and a naive stored merge would make
batch REPLAY (foreachBatch re-delivers the last uncommitted batch)
double-count the replayed fragment's n_events.

Construction (the lakehouse append-dedupe pattern):

- each micro-batch reduces to PER-RUN rows (user_id, event_type,
  valid_from, n_events, ord_id) where ord_id = the run's first event_id
  — a stable identity no other batch can produce;
- runs are MERGEd into a bucket-partitioned parquet target exactly like
  the upsert sink (streaming/sink.py): only touched buckets are read or
  rewritten, deduped on (user_id, ord_id), so a replayed batch rewrites
  byte-identical bucket contents — at-least-once delivery converges to
  exactly-once table state;
- the SCD2 dimension is a COLLAPSE-ON-READ view: the same
  gaps-and-islands window chain as the batch operator, run over the
  stored run fragments, merges boundary-split runs and chains valid_to
  with LEAD. Per-user history lives in one bucket, so the view is one
  user-partitioned window pass.

Requires per-user in-order delivery across batches (the CDC contract:
a change-log topic partitioned by key). Late out-of-order changes would
need the watermarked stateful form instead — see streaming/timeseries
for that trade-off on the gap-fill operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sink import _BUCKET, merge_into_buckets
from .windows import stream_events


def _batch_runs(batch_df: DataFrame) -> DataFrame:
    """One row per consecutive same-type run WITHIN the batch:
    (user_id, event_type, valid_from, n_events, ord_id)."""
    from ..operators.timeseries import change_runs

    runs = change_runs(
        batch_df.select("user_id", "event_type", "ts", "event_id"),
        ["ts", "event_id"],
    )
    return runs.groupBy("user_id", "event_type", "_run").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
        F.min("event_id").alias("ord_id"),
    ).drop("_run")


def scd2_apply_batch(
    batch_df: DataFrame, target_dir: str, n_buckets: int = 16
) -> None:
    """MERGE one micro-batch's runs into the bucketed run store via the
    upsert sink's shared touched-buckets machinery. Rows dedupe on
    (user_id, ord_id) — the run's first event_id, an identity no other
    batch can produce — so checkpointed batch REPLAY (same slicing) is a
    byte-identical no-op. If a target is instead re-drained under a
    DIFFERENT slicing (fresh checkpoint), colliding fragments are
    reconciled deterministically — the fragment covering more events
    wins, incoming on ties — but mixed-slicing stores are not
    event-exact; the CDC contract here is replay-with-checkpoint, same
    as the upsert sink."""

    def first_fragment_wins(merged: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id", "ord_id").orderBy(
            F.col("n_events").desc(), F.col("_is_new").desc()
        )
        return (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    merge_into_buckets(
        _batch_runs(batch_df), target_dir, "user_id", first_fragment_wins,
        n_buckets,
    )


def read_scd2_dimension(spark: SparkSession, target_dir: str) -> DataFrame:
    """The SCD2 dimension view over the stored run fragments: collapse
    adjacent same-type fragments (a run split by a batch boundary merges
    back), then chain [valid_from, valid_to) with LEAD — identical
    column contract to the batch cdc1 operator."""
    from ..operators.timeseries import change_runs

    iv = spark.read.parquet(target_dir).drop(_BUCKET)
    runs = change_runs(iv, ["valid_from", "ord_id"])
    merged = runs.groupBy("user_id", "event_type", "_run").agg(
        F.min("valid_from").alias("valid_from"),
        F.sum("n_events").alias("n_events"),
        F.min("ord_id").alias("_ord"),
    )
    chain = Window.partitionBy("user_id").orderBy("valid_from", "_ord")
    return merged.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(chain).alias("valid_to"),
        "n_events",
    )


def streaming_scd2_apply(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    target_dir: str,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain the change stream into the SCD2 run store via foreachBatch;
    afterwards ``read_scd2_dimension`` equals the batch cdc1 operator on
    the same events (tested across maxFilesPerTrigger micro-batches)."""
    ev = stream_events(spark, sf_dir, stream_dir, max_files_per_trigger)

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        scd2_apply_batch(
            batch_df.select("user_id", "event_type", "ts", "event_id"),
            target_dir,
            n_buckets,
        )

    q = (
        ev.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{target_dir}_ckpt")
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(
            "streaming_scd2_apply: availableNow drain exceeded 120s — "
            "stopped instead of returning over a partially-applied table"
        )
