"""Event-time windowing (north-star extension — SURVEY.md §2.9 records the
reference has NO streaming surface; this is new capability, not parity).

``windows`` — tumbling / sliding / session window aggregations over the
`events` table, written so the same transformation runs in batch (for the
DuckDB oracle) and under Structured Streaming (``readStream`` + watermark,
see ``stream_query`` / tests).
"""
