"""Semantics tests for the time-series operators (ts1/ts2) on hand-built
frames — edge cases the sf0.01 oracle data exercises only statistically:
day-boundary-crossing intervals, half-open touching endpoints, LOCF
across multi-bucket gaps, and single-event series — plus batch-equality
for the streaming twins (watermarked OHLC, stateful gap-fill).
"""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile

from pyspark.sql import functions as F

from spark_sql_perf_spark.operators.timeseries import (
    gapfill_locf_df,
    interval_concurrency_df,
)
from tests.conftest import SF_DIR_TINY


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, _ts(t), v) for u, t, v in rows],
        "user_id long, ts timestamp, value double",
    )


def _intervals(spark, rows):
    return spark.createDataFrame(
        [(_ts(s), _ts(e)) for s, e in rows], "s timestamp, e timestamp"
    )


class TestGapfillLocf:
    def test_gap_is_filled_and_carried_forward(self, spark):
        # events at 00h and 03h -> grid has 01h and 02h with n_events=0,
        # NULL raw sum, and the 00h value carried forward
        out = gapfill_locf_df(
            _events(
                spark,
                [
                    (1, "2024-01-01 00:10:00", 5.0),
                    (1, "2024-01-01 03:20:00", 7.0),
                ],
            )
        ).orderBy("bucket_hour")
        rows = out.collect()
        assert [r["bucket_hour"].hour for r in rows] == [0, 1, 2, 3]
        assert [r["n_events"] for r in rows] == [1, 0, 0, 1]
        assert [r["sum_value"] for r in rows] == [5.0, None, None, 7.0]
        assert [r["locf_value"] for r in rows] == [5.0, 5.0, 5.0, 7.0]

    def test_single_event_series_is_one_bucket(self, spark):
        rows = gapfill_locf_df(
            _events(spark, [(9, "2024-03-05 13:59:59", 2.5)])
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["bucket_hour"] == _ts("2024-03-05 13:00:00")
        assert (r["n_events"], r["sum_value"], r["locf_value"]) == (1, 2.5, 2.5)

    def test_series_are_independent(self, spark):
        # user 2's values never leak into user 1's LOCF
        out = gapfill_locf_df(
            _events(
                spark,
                [
                    (1, "2024-01-01 00:00:00", 1.0),
                    (1, "2024-01-01 02:00:00", 3.0),
                    (2, "2024-01-01 01:00:00", 100.0),
                ],
            )
        )
        u1 = {r["bucket_hour"].hour: r["locf_value"]
              for r in out.where(F.col("user_id") == 1).collect()}
        assert u1 == {0: 1.0, 1: 1.0, 2: 3.0}
        assert out.where(F.col("user_id") == 2).count() == 1

    def test_multiple_events_in_bucket_sum(self, spark):
        r = gapfill_locf_df(
            _events(
                spark,
                [
                    (1, "2024-01-01 05:01:00", 1.5),
                    (1, "2024-01-01 05:59:00", 2.0),
                ],
            )
        ).collect()[0]
        assert (r["n_events"], r["sum_value"]) == (2, 3.5)


class TestIntervalConcurrency:
    def test_touching_intervals_do_not_overlap(self, spark):
        # [10:00, 10:10) and [10:10, 10:20): half-open, peak is 1
        out = interval_concurrency_df(
            _intervals(
                spark,
                [
                    ("2024-01-01 10:00:00", "2024-01-01 10:10:00"),
                    ("2024-01-01 10:10:00", "2024-01-01 10:20:00"),
                ],
            )
        ).collect()
        assert len(out) == 1
        assert out[0]["max_concurrent"] == 1
        assert out[0]["n_active"] == 2

    def test_true_overlap_counts(self, spark):
        out = interval_concurrency_df(
            _intervals(
                spark,
                [
                    ("2024-01-01 10:00:00", "2024-01-01 10:10:00"),
                    ("2024-01-01 10:05:00", "2024-01-01 10:15:00"),
                    ("2024-01-01 10:09:00", "2024-01-01 10:19:00"),
                ],
            )
        ).collect()[0]
        assert out["max_concurrent"] == 3  # all open in [10:09, 10:10)

    def test_interval_crossing_midnight_hits_both_days(self, spark):
        out = {
            r["day"]: (r["max_concurrent"], r["n_active"])
            for r in interval_concurrency_df(
                _intervals(
                    spark,
                    [("2024-01-01 23:55:00", "2024-01-02 00:05:00")],
                )
            ).collect()
        }
        assert out == {
            dt.date(2024, 1, 1): (1, 1),
            dt.date(2024, 1, 2): (1, 1),
        }

    def test_interval_ending_exactly_at_midnight_stays_in_first_day(self, spark):
        # half-open [23:50, 00:00) must NOT produce a day-2 segment
        rows = interval_concurrency_df(
            _intervals(
                spark,
                [("2024-01-01 23:50:00", "2024-01-02 00:00:00")],
            )
        ).collect()
        assert len(rows) == 1
        assert rows[0]["day"] == dt.date(2024, 1, 1)

    def test_empty_and_malformed_intervals_contribute_nothing(self, spark):
        # a zero-length interval starting exactly at midnight used to make
        # sequence(day(s), day(e - 1us)) run backwards and throw; it and
        # an e < s row must simply not contribute (DuckDB's generate_series
        # returns empty for the same bounds)
        out = interval_concurrency_df(
            _intervals(
                spark,
                [
                    ("2024-01-02 00:00:00", "2024-01-02 00:00:00"),
                    ("2024-01-03 12:00:00", "2024-01-03 11:00:00"),
                    ("2024-01-01 10:00:00", "2024-01-01 10:10:00"),
                ],
            )
        ).collect()
        assert {r["day"] for r in out} == {dt.date(2024, 1, 1)}
        assert out[0]["max_concurrent"] == 1
        assert out[0]["n_active"] == 1

    def test_multi_day_interval_spans_every_day(self, spark):
        days = sorted(
            r["day"]
            for r in interval_concurrency_df(
                _intervals(
                    spark,
                    [("2024-01-01 12:00:00", "2024-01-04 06:00:00")],
                )
            ).collect()
        )
        assert days == [
            dt.date(2024, 1, 1),
            dt.date(2024, 1, 2),
            dt.date(2024, 1, 3),
            dt.date(2024, 1, 4),
        ]


class TestStreamingTimeseries:
    def test_streaming_ohlc_matches_batch(self, spark):
        from spark_sql_perf_spark.operators import QUERIES
        from spark_sql_perf_spark.streaming.timeseries import streaming_ohlc
        from spark_sql_perf_spark.streaming.windows import run_stream_once

        stream_dir = tempfile.mkdtemp(prefix="events-ohlc-stream-")
        os.symlink(
            f"{SF_DIR_TINY}/events.parquet",
            os.path.join(stream_dir, "part-0.parquet"),
        )
        sdf = streaming_ohlc(spark, SF_DIR_TINY, stream_dir)
        assert sdf.isStreaming
        run_stream_once(sdf, "stream_ohlc_out")
        got = {
            (r.user_id, r.day): (r.open, r.high, r.low, r.close, r.n_ticks)
            for r in spark.table("stream_ohlc_out").collect()
        }
        want = {
            (r.user_id, r.day): (r.open, r.high, r.low, r.close, r.n_ticks)
            for r in QUERIES["ts3_ohlc_bars"](spark, SF_DIR_TINY).collect()
        }
        assert got == want

    def test_streaming_gapfill_matches_batch_across_microbatches(self, spark):
        from spark_sql_perf_spark.operators import QUERIES
        from spark_sql_perf_spark.streaming.timeseries import streaming_gapfill_locf
        from spark_sql_perf_spark.streaming.windows import stream_events

        # split the table MID-HOUR into two files -> with
        # maxFilesPerTrigger=1 the second half arrives in a later
        # micro-batch, so at least one hour's events span the batch
        # boundary: the open-hour partial in state must merge them (the
        # pre-fix operator finalized the newest hour per batch and
        # silently dropped the second half's in-order events). Two
        # far-future sentinel files for user -1 then push the watermark
        # past every real hour so open buckets flush via event-time
        # timeout before the AvailableNow drain stops.
        from spark_sql_perf_spark.catalog import _ts_as_timestamp

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(f"{SF_DIR_TINY}/events.parquet")
        ts = _ts_as_timestamp(ev)
        lo, hi = ev.select(F.min(ts), F.max(ts)).first()
        cut = (lo + (hi - lo) / 2).replace(minute=30, second=0, microsecond=0)
        stream_dir = tempfile.mkdtemp(prefix="events-gapfill-stream-")
        ts_is_long = dict(ev.dtypes)["ts"] == "bigint"
        sentinel = ev.orderBy(F.col("ts").desc()).limit(1).withColumn(
            "user_id", F.lit(-1).cast(dict(ev.dtypes)["user_id"])
        )
        parts = [ev.where(ts < F.lit(cut)), ev.where(ts >= F.lit(cut))]
        for days in (60, 120):
            shift = (
                F.col("ts") + F.lit(days * 86400 * 10**9)
                if ts_is_long
                else F.col("ts") + F.expr(f"interval {days} days")
            )
            parts.append(sentinel.withColumn("ts", shift))
        for i, part in enumerate(parts):
            pdir = os.path.join(stream_dir, f"in{i}")
            part.coalesce(1).write.mode("overwrite").parquet(pdir)
            src = next(f for f in os.listdir(pdir) if f.endswith(".parquet"))
            dst = os.path.join(stream_dir, f"part-{i}.parquet")
            os.rename(os.path.join(pdir, src), dst)
            os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

        src = (
            stream_events(spark, SF_DIR_TINY, stream_dir, max_files_per_trigger=1)
            .withWatermark("ts", "1 hour")
            .select("user_id", "ts", "value")
        )
        out = streaming_gapfill_locf(src)
        assert out.isStreaming
        from spark_sql_perf_spark.streaming.windows import run_stream_once

        run_stream_once(out, "stream_gapfill_out", output_mode="append")

        # EXACT equality (no rounding): state accumulates integer cents,
        # so micro-batch boundaries must not perturb even low-order bits
        def norm(v):
            return None if v is None or (isinstance(v, float) and math.isnan(v)) \
                else v

        got = {
            (r.user_id, r.bucket_hour): (r.n_events, norm(r.sum_value),
                                         norm(r.locf_value))
            for r in spark.table("stream_gapfill_out").collect()
            if r.user_id != -1  # watermark-advancing sentinel series
        }
        want = {
            (r.user_id, r.bucket_hour): (r.n_events, norm(r.sum_value),
                                         norm(r.locf_value))
            for r in QUERIES["ts1_gapfill_locf"](spark, SF_DIR_TINY).collect()
        }
        assert got == want


class _FakeState:
    """Minimal stand-in for pyspark GroupState covering the attrs the
    gap-fill function touches — lets the state machine be unit-tested
    without spinning up a streaming query per scenario.
    """

    def __init__(self, value=None, watermark_ms=0, timed_out=False):
        self._value = value
        self._wm_ms = watermark_ms
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def update(self, v):
        self._value = tuple(v)
        self.removed = False

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutTimestamp(self, ts_ms):
        self.timeout_ts = ts_ms


class TestGapfillStateMachine:
    """Unit tests for _make_gapfill: idle-TTL eviction and exact cents."""

    HOUR_US = 3_600_000_000
    HOUR_MS = 3_600_000

    def _batch(self, ts_us, cents):
        import pandas as pd

        return iter(
            [
                pd.DataFrame(
                    {
                        "ts": pd.to_datetime(pd.Series(ts_us), unit="us"),
                        "cents": pd.Series(cents, dtype="int64"),
                    }
                )
            ]
        )

    def test_no_ttl_retains_drained_state_forever(self):
        from spark_sql_perf_spark.streaming.timeseries import _make_gapfill

        fn = _make_gapfill(None)
        # one event at hour 0; watermark far past it -> emits and drains
        st = _FakeState(watermark_ms=10 * self.HOUR_MS)
        list(fn((1,), self._batch([5_000_000], [250]), st))
        assert st.exists and not st.removed
        last_us, carried, oh, on, osum = st.get
        assert (last_us, carried, list(oh)) == (0, 250, [])
        # flush-timeout fires later with nothing open: row must survive
        st.hasTimedOut = True
        st._wm_ms = 20 * self.HOUR_MS
        list(fn((1,), iter([]), st))
        assert st.exists and not st.removed
        assert st.timeout_ts is None or st.timeout_ts > 0  # no forced eviction

    def test_idle_ttl_evicts_drained_state(self):
        from spark_sql_perf_spark.streaming.timeseries import _make_gapfill

        fn = _make_gapfill(idle_timeout_hours=3)
        st = _FakeState(watermark_ms=10 * self.HOUR_MS)
        list(fn((1,), self._batch([5_000_000], [250]), st))
        # drained but retained, idle timeout armed 3h past the watermark
        assert st.exists
        assert st.timeout_ts == 10 * self.HOUR_MS + 3 * self.HOUR_MS
        # the idle timeout fires with nothing open -> evicted
        st.hasTimedOut = True
        st._wm_ms = 13 * self.HOUR_MS
        list(fn((1,), iter([]), st))
        assert st.removed and not st.exists

    def test_idle_ttl_not_evicted_while_hours_open(self):
        from spark_sql_perf_spark.streaming.timeseries import _make_gapfill

        fn = _make_gapfill(idle_timeout_hours=3)
        # watermark has NOT passed the event's hour end: stays open
        st = _FakeState(watermark_ms=0)
        out = list(fn((1,), self._batch([5_000_000], [250]), st))
        assert out == [] and st.exists
        # flush timeout fires once the watermark passes -> emits, retains
        st.hasTimedOut = True
        st._wm_ms = 2 * self.HOUR_MS
        emitted = list(fn((1,), iter([]), st))
        assert len(emitted) == 1 and st.exists and not st.removed

    def test_cents_sum_is_exact_across_batch_boundaries(self):
        # 0.1 + 0.2 in float64 is 0.30000000000000004; in cents it is 30.
        # Split the two events across micro-batches: the merged partial
        # must equal the single-batch sum exactly.
        from spark_sql_perf_spark.streaming.timeseries import _make_gapfill

        fn = _make_gapfill(None)
        st = _FakeState(watermark_ms=0)
        list(fn((1,), self._batch([1_000_000], [10]), st))
        list(fn((1,), self._batch([2_000_000], [20]), st))
        # drive emission via a flush timeout at an advanced watermark
        st._wm_ms = 5 * self.HOUR_MS
        st.hasTimedOut = True
        emitted = list(fn((1,), iter([]), st))
        assert len(emitted) == 1
        assert emitted[0]["sum_value"].iloc[0] == 0.3  # exactly 30 / 100.0
        assert emitted[0]["n_events"].iloc[0] == 2


class TestScd2Compress:
    def _log(self, spark, rows):
        return spark.createDataFrame(
            [(u, t, _ts(ts), i) for i, (u, t, ts) in enumerate(rows)],
            "user_id long, event_type string, ts timestamp, event_id long",
        )

    def test_consecutive_runs_collapse(self, spark):
        from spark_sql_perf_spark.operators.timeseries import scd2_compress_df

        out = scd2_compress_df(
            self._log(
                spark,
                [
                    (1, "A", "2024-01-01 00:00:00"),
                    (1, "A", "2024-01-01 01:00:00"),
                    (1, "B", "2024-01-01 02:00:00"),
                    (1, "A", "2024-01-01 03:00:00"),
                ],
            )
        ).orderBy("valid_from").collect()
        assert [(r.event_type, r.n_events) for r in out] == [
            ("A", 2), ("B", 1), ("A", 1)  # A reappears as a NEW interval
        ]
        # valid_to chains to the next interval's valid_from; open run is NULL
        assert [r.valid_to for r in out[:-1]] == [r.valid_from for r in out[1:]]
        assert out[-1].valid_to is None

    def test_users_are_independent(self, spark):
        from spark_sql_perf_spark.operators.timeseries import scd2_compress_df

        out = scd2_compress_df(
            self._log(
                spark,
                [
                    (1, "A", "2024-01-01 00:00:00"),
                    (2, "A", "2024-01-01 01:00:00"),
                ],
            )
        ).collect()
        # same type across users never merges; each user's run is open
        assert len(out) == 2 and all(r.valid_to is None for r in out)

    def test_equal_timestamps_break_on_event_id(self, spark):
        from spark_sql_perf_spark.operators.timeseries import scd2_compress_df

        # two changes at the SAME ts: event_id order decides run order,
        # so the output is deterministic (B at id=1 precedes C at id=2)
        out = scd2_compress_df(
            self._log(
                spark,
                [
                    (1, "A", "2024-01-01 00:00:00"),
                    (1, "B", "2024-01-01 01:00:00"),
                    (1, "C", "2024-01-01 01:00:00"),
                ],
            )
        ).orderBy("valid_from", "event_type").collect()
        assert [r.event_type for r in out] == ["A", "B", "C"]
        # B and C share valid_from: the chain must tiebreak on the runs'
        # first event_id (B before C), deterministically in both engines
        assert out[0].valid_to == _ts("2024-01-01 01:00:00")
        assert out[1].valid_to == _ts("2024-01-01 01:00:00")
        assert out[2].valid_to is None
