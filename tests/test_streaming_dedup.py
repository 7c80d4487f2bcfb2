"""Stateful streaming dedup: first-wins across micro-batches, state
survives between triggers, keeper rule matches the batch operator."""

import time

import pytest

from dlkp_spark.streaming.dedup import streaming_exact_dedup


def _run_stream(spark, input_dir, out_name):
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .parquet(input_dir))
    q = (streaming_exact_dedup(stream)
         .writeStream.format("memory").queryName(out_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {out_name}").collect()


def test_streaming_dedup_first_wins_across_batches(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    # wave 1: texts A (ids 10, 11 — 10 wins), B (id 20)
    spark.createDataFrame(
        [(11, "alpha beta"), (10, "alpha beta"), (20, "gamma")],
        "doc_id long, text string").coalesce(1).write.mode("append").parquet(input_dir)
    time.sleep(1.1)  # distinct mtimes → file source orders wave 1 first
    # wave 2: A again (id 5 — must NOT win: state already has it), C (id 30)
    spark.createDataFrame(
        [(5, "alpha beta"), (30, "delta")],
        "doc_id long, text string").coalesce(1).write.mode("append").parquet(input_dir)

    rows = _run_stream(spark, input_dir, "dedup_out")
    by_text = {r["h"]: r["doc_id"] for r in rows}
    assert len(rows) == 3, rows          # one row per distinct text
    assert 10 in by_text.values()        # within-batch keeper = min doc_id
    assert 5 not in by_text.values()     # replayed text suppressed by state
    assert 20 in by_text.values() and 30 in by_text.values()


def test_streaming_dedup_matches_batch_keeper(spark, tmp_path):
    """The streaming operator over a one-shot stream equals the batch
    exact_dedup keeper set."""
    from dlkp_spark.pipeline.dedup import exact_dedup

    input_dir = str(tmp_path / "in1")
    rows = [(i, f"text {i % 7}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.parquet(input_dir)
    got = {r["doc_id"] for r in _run_stream(spark, input_dir, "dedup_out2")}
    want = {r["doc_id"] for r in exact_dedup(df).collect()}
    assert got == want
