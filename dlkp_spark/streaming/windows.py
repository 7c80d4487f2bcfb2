"""Watermarked event-time windowed aggregation (Structured Streaming).

The streaming twin of the batch ``events_hourly`` contract query
(contract.q_events_hourly, oracle-gated): tumbling event-time windows
over a stream, with a watermark bounding both state size and
late-arrival acceptance. The reference engine is strictly batch
(SURVEY.md §2.10) — this is an engine-side extension like
streaming/ingest + streaming/dedup.

Scale shape: state is keyed on (window, event_type) — bounded by
(#windows within watermark) × (#event types), independent of event
volume; each micro-batch shuffles once on the group key with map-side
partial aggregation. The watermark is the knob that makes 100 TB/day of
events hold constant state: windows older than (max event time seen −
watermark) are finalized and their state dropped, and events arriving
later than that are discarded (exactly-once semantics per window under
at-least-once delivery requires idempotent sinks, same as ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          window_dur: str = "1 hour",
                          watermark: str = "1 hour") -> DataFrame:
    """(win_start, event_type, n, sum_value) tumbling-window aggregate.

    Works identically on a batch frame (no watermark semantics — pure
    groupBy) and a streaming frame (watermark bounds state + drops
    late events) — the pytest pins streaming == batch on in-order input
    and pins the late-drop divergence on out-of-order input.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (src.groupBy(F.window(ts_col, window_dur).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.unix_timestamp("win.start").alias("win_start"),
                    "event_type", "n", "sum_value"))
