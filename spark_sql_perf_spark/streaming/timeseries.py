"""Streaming time-series: watermarked OHLC bars and a custom stateful
gap-fill/LOCF operator.

The batch twins live in `operators/timeseries.py` (ts1/ts3). OHLC
streams through the native windowed-aggregation path because first/last
by (ts, value) re-express as MERGEABLE min/max over a (t, v) struct —
partial aggregates combine across micro-batches exactly like sum/count,
so no custom state is needed. Gap-fill cannot: emitting buckets that had
NO input rows is outside foldable aggregation, so it is the canonical
custom stateful operator — `applyInPandasWithState` with one tiny state
row per series, Arrow-batched per group.

State bounds: PER SERIES the state is O(open hours), bounded by the
watermark delay. ACROSS series the frontier + carried-value row is
retained after the open hours drain — intentionally, because LOCF
continuity across an idle gap needs the last value (a series silent for
a week must resume carrying its old value, exactly like the batch twin).
Total state therefore grows with the number of distinct series ever
seen; callers with unbounded key churn can cap it with
``idle_timeout_hours``, accepting the documented LOCF reset.

Numeric discipline: the batch twin sums exact DECIMAL(18,2) and casts to
double ONCE at the end. The streaming operator matches it bit-for-bit by
quantizing JVM-side to integer cents (``CAST(value AS DECIMAL(18,2)) *
100`` — Spark's HALF_UP, identical to the batch cast), summing int64
cents in state, and dividing by 100.0 only at emit: cents are exact in
int64, and IEEE division yields the nearest double of cents/100 — the
same value as casting the exact decimal sum. Result: where micro-batch
boundaries fall cannot perturb low-order bits.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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

# finalized frontier (epoch microseconds) + carried LOCF value in exact
# integer cents, plus the still-OPEN hours' partial aggregates (parallel
# arrays keyed by hour; sums also in cents). Open state is bounded by the
# watermark delay: an hour leaves the arrays as soon as the watermark
# passes its end.
GAPFILL_STATE = StructType(
    [
        StructField("last_hour_us", LongType()),
        StructField("carried_cents", LongType()),
        StructField("open_hours", ArrayType(LongType())),
        StructField("open_ns", ArrayType(LongType())),
        StructField("open_cents", ArrayType(LongType())),
    ]
)

_HOUR_US = 3_600_000_000
_HOUR_MS = 3_600_000


def _make_gapfill(idle_timeout_hours: int | None):
    """Build the per-group stateful function; see streaming_gapfill_locf."""
    idle_ms = None if idle_timeout_hours is None else idle_timeout_hours * _HOUR_MS

    def _gapfill_user(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        wm_ms = wm_us // 1000

        if state.exists:
            last_us, carried, oh, on, osum = state.get
            opens = {int(h): (int(n), int(s)) for h, n, s in zip(oh, on, osum)}
            has_last = last_us is not None
        else:
            last_us, carried, opens, has_last = None, None, {}, False

        if not state.hasTimedOut:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            hours = (
                pdf["ts"].astype("datetime64[us]").astype("int64")
                // _HOUR_US * _HOUR_US
            )
            # `cents` is already int64 (quantized JVM-side); int64 sums are
            # exact, so partials merge across micro-batches without drift
            agg = pdf.assign(h=hours).groupby("h")["cents"].agg(n="size", s="sum")
            for h, row in agg.iterrows():
                h = int(h)
                if has_last and h <= last_us:
                    continue  # late past the finalized frontier: dropped (append mode)
                n0, s0 = opens.get(h, (0, 0))
                opens[h] = (n0 + int(row["n"]), s0 + int(row["s"]))

        if not opens:
            if state.hasTimedOut and idle_ms is not None:
                # idle TTL: nothing open and no traffic for idle_timeout_hours
                # past the frontier — drop the row; LOCF continuity resets
                state.remove()
            elif state.exists:
                state.update((last_us, carried, [], [], []))
                if idle_ms is not None:
                    state.setTimeoutTimestamp(wm_ms + idle_ms)
            return

        # an hour is final once the watermark passes its END — until then it
        # stays open in state so in-order events landing in the same hour
        # across micro-batch boundaries (and late events the watermark still
        # admits) merge instead of being dropped
        newest = max(opens)
        # largest GRID hour whose end the watermark has passed — floored to
        # the hour grid, or the finalized frontier drifts off-alignment
        emit_end = min(newest, (wm_us // _HOUR_US - 1) * _HOUR_US)
        start_us = last_us + _HOUR_US if has_last else min(opens)

        if emit_end >= start_us:
            out_t, out_n, out_s, out_l = [], [], [], []
            for t in range(start_us, emit_end + _HOUR_US, _HOUR_US):
                b = opens.pop(t, None)
                if b is not None:
                    n, s = b
                    carried = s
                else:
                    n, s = 0, None
                out_t.append(t)
                out_n.append(n)
                # one division at emit: cents are exact in int64 and
                # IEEE division returns the nearest double of cents/100 —
                # identical to the batch cast of the exact decimal sum
                out_s.append(None if s is None else s / 100.0)
                out_l.append(None if carried is None else carried / 100.0)
            last_us = emit_end
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "bucket_hour": pd.to_datetime(pd.Series(out_t), unit="us"),
                    "n_events": out_n,
                    "sum_value": pd.array(out_s, dtype="float64"),
                    "locf_value": pd.array(out_l, dtype="float64"),
                }
            )

        kept = sorted(
            h for h in opens if h > (last_us if last_us is not None else -(1 << 62))
        )
        state.update(
            (
                last_us,
                carried,
                kept,
                [opens[h][0] for h in kept],
                [opens[h][1] for h in kept],
            )
        )
        if kept:
            # wake up when the watermark passes the oldest open hour's end so
            # it flushes even if this series never sees another event
            state.setTimeoutTimestamp(max(kept[0] // 1000 + _HOUR_MS - 1, wm_ms + 1))
        elif idle_ms is not None:
            state.setTimeoutTimestamp(wm_ms + idle_ms)

    return _gapfill_user


def streaming_gapfill_locf(
    events: DataFrame, idle_timeout_hours: int | None = None
) -> DataFrame:
    """ts1's resample + LOCF as a streaming operator with explicit state.

    `events` must be a streaming DataFrame with (user_id, ts, value) AND
    an event-time watermark (`withWatermark` upstream — EventTimeTimeout
    requires one). Values are quantized to exact integer cents JVM-side
    (``CAST(value AS DECIMAL(18,2)) * 100``, the same HALF_UP cast the
    batch twin applies) before they reach Python, so state holds int64
    partials and the emitted double equals the batch result bit-for-bit
    regardless of where micro-batch boundaries fall.

    Each micro-batch folds events into per-hour partial aggregates held
    in state; an hour is emitted — final, append mode — only once the
    watermark passes its end, so in-order events landing in an hour that
    spans a micro-batch boundary merge into the open partial instead of
    being dropped, and late events are admitted exactly as long as the
    watermark allows. Series with no further traffic flush their open
    hours via event-time timeout when the global watermark advances.

    State per series: finalized frontier + carried cents + one partial
    per open hour (bounded by the watermark delay). The frontier/carried
    row is retained after the open hours drain so LOCF survives idle gaps
    — matching the batch twin — which means total state grows with the
    number of distinct series ever seen. Pass ``idle_timeout_hours=N`` to
    evict a series after N hours of watermark-time silence; a series that
    returns after eviction restarts its grid fresh (LOCF reset).
    """
    cents = (dec("value") * 100).cast("long")
    keyed = events.select("user_id", "ts", cents.alias("cents"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_gapfill(idle_timeout_hours),
        outputStructType=GAPFILL_OUTPUT,
        stateStructType=GAPFILL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
