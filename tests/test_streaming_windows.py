"""Watermarked windowed aggregation: streaming == batch on in-order
input; late events beyond the watermark are dropped from streaming state
(and only from streaming — the divergence is the documented semantics)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dlkp_spark.streaming.windows import windowed_event_counts

SCHEMA = "event_id long, ts timestamp, event_type string, value double"
T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _write_wave(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


_EMITTED: list = []


def _run_stream(spark, path, mode="update", watermark="1 hour",
                checkpoint=None, fresh=True):
    """One availableNow pass via foreachBatch (supports checkpoint
    recovery, unlike the memory sink); with a checkpoint dir, a later
    call RESUMES with the persisted watermark — how a restarted job
    keeps dropping the same late data. Returns the LAST emission per
    group key across all captured micro-batches."""
    import pandas as pd

    if fresh:
        _EMITTED.clear()
    stream = spark.readStream.schema(SCHEMA).parquet(path)
    agg = windowed_event_counts(stream, watermark=watermark)

    def capture(batch_df, _bid):
        _EMITTED.extend(batch_df.toPandas().to_dict("records"))

    w = (agg.writeStream.foreachBatch(capture)
         .outputMode(mode).trigger(availableNow=True))
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.awaitTermination(120)
    pdf = pd.DataFrame(_EMITTED)
    return (pdf.groupby(["win_start", "event_type"]).last().reset_index()
            .sort_values(["win_start", "event_type"]).reset_index(drop=True))


def test_streaming_equals_batch_on_in_order_input(spark, tmp_path):
    path = str(tmp_path / "ev1")
    rows = []
    for h in range(4):
        for i in range(5):
            rows.append((h * 10 + i, T0 + dt.timedelta(hours=h, minutes=i * 7),
                         "click" if i % 2 == 0 else "view", float(i)))
    # three in-order waves
    _write_wave(spark, path, rows[:7])
    _write_wave(spark, path, rows[7:13])
    _write_wave(spark, path, rows[13:])
    got = _run_stream(spark, path)
    batch = windowed_event_counts(spark.read.schema(SCHEMA).parquet(path)) \
        .toPandas().sort_values(["win_start", "event_type"]).reset_index(drop=True)
    assert got[["win_start", "event_type", "n", "sum_value"]].astype(str) \
        .values.tolist() == batch.astype(str).values.tolist()


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    path = str(tmp_path / "ev2")
    # wave 1 advances event time to T0+10h; wave 2 carries one event at T0
    # (10h late, watermark 1h) plus one in-order event
    wave1 = [(i, T0 + dt.timedelta(hours=10, minutes=i), "click", 1.0)
             for i in range(3)]
    late = (100, T0, "click", 1.0)
    fresh = (101, T0 + dt.timedelta(hours=10, minutes=30), "click", 1.0)
    ckpt = str(tmp_path / "ckpt")
    # sequential availableNow passes over one checkpoint: pass 1 advances
    # the watermark to 10h-1h=9h and persists it; pass 2 resumes and must
    # drop the 10h-late event while accepting the in-order one
    _write_wave(spark, path, wave1)
    _run_stream(spark, path, checkpoint=ckpt)
    _write_wave(spark, path, [late, fresh])
    got = _run_stream(spark, path, checkpoint=ckpt, fresh=False)
    t0_epoch = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    # the late event's window (T0's hour) must be ABSENT from streaming
    # output: its state was never created after the watermark passed
    stream_windows = set(got["win_start"].astype("int64"))
    batch = windowed_event_counts(spark.read.schema(SCHEMA).parquet(path)).toPandas()
    batch_windows = set(batch["win_start"].astype("int64"))
    late_win = [w for w in batch_windows if w not in stream_windows]
    assert len(late_win) == 1  # exactly the dropped late window diverges
    # and the in-order wave-2 event DID land: its window counts 4 clicks
    ten_h = [r for _, r in got.iterrows()
             if int(r["n"]) == 4 and r["event_type"] == "click"]
    assert len(ten_h) == 1
    assert t0_epoch not in stream_windows
