"""Streaming time-series: watermarked OHLC bars and a custom stateful
gap-fill/LOCF operator.

The batch twins live in `operators/timeseries.py` (ts1/ts3). OHLC
streams through the native windowed-aggregation path because first/last
by (ts, value) re-express as MERGEABLE min/max over a (t, v) struct —
partial aggregates combine across micro-batches exactly like sum/count,
so no custom state is needed. Gap-fill cannot: emitting buckets that had
NO input rows is outside foldable aggregation, so it is the canonical
custom stateful operator — `applyInPandasWithState` with one tiny state
row per series (last emitted hour + carried value), Arrow-batched per
group, bounded memory regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.registry import dec
from .windows import stream_events


def streaming_ohlc(spark: SparkSession, sf_dir: str, stream_dir: str) -> DataFrame:
    """ts3's daily OHLC bars as a genuine streaming query.

    open/close = min/max over a (t, v) struct — lexicographic struct
    ordering reproduces ts3's deterministic (ts, value) tiebreak, and
    struct min/max are mergeable, so bars combine correctly across
    micro-batches and partial aggregation stays map-side. Watermark
    bounds state: a day's bar finalizes one day after the day ends.
    """
    ev = stream_events(spark, sf_dir, stream_dir).withWatermark("ts", "1 day")
    tick = F.struct(F.col("ts").alias("t"), dec("value").alias("v"))
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(
            F.min(tick).alias("o"),
            F.max(tick).alias("c"),
            F.max(dec("value")).alias("hi"),
            F.min(dec("value")).alias("lo"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "user_id",
            F.col("o.v").cast("double").alias("open"),
            F.col("hi").cast("double").alias("high"),
            F.col("lo").cast("double").alias("low"),
            F.col("c.v").cast("double").alias("close"),
            "n_ticks",
        )
    )


GAPFILL_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("bucket_hour", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("locf_value", DoubleType()),
    ]
)

# last emitted bucket (epoch microseconds) + the carried-forward value
GAPFILL_STATE = StructType(
    [
        StructField("last_hour_us", LongType()),
        StructField("carried", DoubleType()),
    ]
)

_HOUR_US = 3_600_000_000


def _gapfill_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    pdf = pd.concat(list(pdfs), ignore_index=True)
    hours = (
        pdf["ts"].astype("datetime64[us]").astype("int64") // _HOUR_US * _HOUR_US
    )
    agg = (
        pdf.assign(h=hours)
        .groupby("h")["value"]
        .agg(n="size", s="sum")
        .sort_index()
    )
    if state.exists:
        last_us, carried = state.get
        # buckets at or before the last emitted hour are late arrivals;
        # emitted buckets are final (append mode), so they are dropped —
        # the caller's watermark is the contract for how late is too late
        agg = agg[agg.index > last_us]
        if agg.empty:
            return
        start_us = last_us + _HOUR_US
    else:
        if agg.empty:
            return
        carried = None
        start_us = int(agg.index[0])
    end_us = int(agg.index[-1])
    bucket = agg.to_dict("index")
    out_t, out_n, out_s, out_l = [], [], [], []
    for t in range(start_us, end_us + _HOUR_US, _HOUR_US):
        b = bucket.get(t)
        if b is not None:
            n, s = int(b["n"]), float(b["s"])
            carried = s
        else:
            n, s = 0, None
        out_t.append(t)
        out_n.append(n)
        out_s.append(s)
        out_l.append(carried)
    state.update((end_us, carried))
    yield pd.DataFrame(
        {
            "user_id": user_id,
            "bucket_hour": pd.to_datetime(pd.Series(out_t), unit="us"),
            "n_events": out_n,
            "sum_value": pd.array(out_s, dtype="float64"),
            "locf_value": pd.array(out_l, dtype="float64"),
        }
    )


def streaming_gapfill_locf(events: DataFrame) -> DataFrame:
    """ts1's resample + LOCF as a streaming operator with explicit state.

    `events` must be a streaming DataFrame with (user_id, ts, value).
    Each micro-batch extends every touched series' regular hourly grid
    from the last emitted bucket through the batch's newest bucket,
    filling gaps with the carried value — emitted buckets are final
    (append mode). State per series is one (hour, value) row: bounded
    memory, and grid emission is bounded by per-series span exactly like
    the batch operator's `sequence` grid.

    Events at or before a series' last emitted bucket are dropped as
    late; compose with `withWatermark` upstream to make the lateness
    contract explicit.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _gapfill_user,
        outputStructType=GAPFILL_OUTPUT,
        stateStructType=GAPFILL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
