"""Incremental index ingest via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10), so this is an
engine-side extension: new web pages arrive as files (stand-in for a Kafka
/ Iceberg CDC feed), and each micro-batch is analyzed, tagged and appended
to the index as a NEW doc-range segment family via ``foreachBatch`` —
exactly the LSM shape that ``index.merge.merge_segments`` compacts.

Doc ids for streamed batches are allocated from a monotonically increasing
base recorded in the index's ingest manifest (streamed docs don't get
url-rank ids — they're appended after the batch-built id space, like any
log-structured index).

Limitations vs the batch build (documented, not hidden): per-batch df/idf
and avgdl are computed batch-locally, so streamed segments' block-max
metadata is admissible only within the segment; a compaction pass
(merge_segments) rebuilding global stats restores exact global BM25. The
test asserts exactly this: stream-append + recompute == batch build.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dlkp_spark.config import IndexConfig
from dlkp_spark.index import manifest as mf
from dlkp_spark.index.build import build_index, prepare_docs


def append_batch(spark: SparkSession, pages: DataFrame, index_dir: str,
                 cfg: IndexConfig, batch_id: int) -> int:
    """Index one micro-batch of pages as new segments; returns rows indexed.

    Each batch gets its own shard namespace (``shard=s{batch}``) and its
    doc ids start at the recorded high-water mark — idempotent per
    batch_id: the ingest manifest records ``(batch_id -> base, n)``, and a
    replayed batch (streaming retry) REUSES its recorded base, so it
    re-derives the identical doc ids and overwrites its own shard only
    (exactly-once effect on the index; next_doc_id does not advance again).
    """
    from pyspark.sql import functions as F

    m = mf.read_global(index_dir, "ingest.json")
    if m is None:
        # first append into this dir: if it already holds a base-built
        # index, its id space is taken — seed the high-water mark from the
        # stats' doc_id_ceiling (NOT n_docs: a purge-compaction leaves ids
        # sparse, and n_docs would hand out ids colliding with survivors)
        # so appended doc ids stay disjoint (reconcile's invariant)
        stats = mf.read_global(index_dir, "stats.json")
        seed = int(stats.get("doc_id_ceiling", stats["n_docs"])) if stats else 0
        m = {"next_doc_id": seed, "batches": {}}
    batches = {str(k): v for k, v in m.get("batches", {}).items()} \
        if isinstance(m.get("batches"), dict) else {}
    replay = str(batch_id) in batches
    base = int(batches[str(batch_id)]["base"]) if replay else int(m["next_doc_id"])
    # row count from the RAW batch (cheap scan): prepare_docs is 1:1 on
    # rows and no longer persists, so counting its output would run the
    # Arrow tagger an extra time per micro-batch
    n = pages.count()
    if n == 0:
        return 0
    if replay and n != int(batches[str(batch_id)]["n"]):
        # retry semantics assume a replayed batch carries identical data;
        # a different row count would make this batch's [base, base+n)
        # doc-id range overlap its successor's — fail loudly BEFORE the
        # build touches the batch's sub-index (raising after would leave
        # the shard overwritten with the mutated data) instead of
        # silently corrupting the id space
        raise ValueError(
            f"replay of batch {batch_id} produced {n} rows but the ingest "
            f"manifest recorded {batches[str(batch_id)]['n']} — replayed "
            "micro-batches must be byte-identical to the original")
    docs = prepare_docs(pages, validate=False, n_docs=n).withColumn(
        "doc_id", F.col("doc_id") + F.lit(base))
    sub_dir = os.path.join(index_dir, "stream", f"batch={batch_id}")
    build_index(spark, docs, sub_dir, cfg=cfg, n_shards=1, resume=False, n_docs=n)
    # batch doc-map (url addressing over appended docs): derived from the
    # SLIM url projection — with_doc_ids ranks urls, the same mapping
    # prepare_docs used, so no extra Arrow tagger pass runs for this
    from dlkp_spark.analysis.analyzer import with_doc_ids
    from dlkp_spark.index.build import DOCMAP_COLS, write_docmap

    slim_cols = [c for c in DOCMAP_COLS if c in pages.columns]
    if "url" in slim_cols:
        dm = (with_doc_ids(pages.select("url", *[c for c in slim_cols
                                                 if c != "url"]), n_docs=n)
              .withColumn("doc_id", F.col("doc_id") + F.lit(base)))
        write_docmap(spark, dm, sub_dir)
    m = mf.read_global(index_dir, "ingest.json") or {"next_doc_id": 0, "batches": {}}
    batches = {str(k): v for k, v in m.get("batches", {}).items()} \
        if isinstance(m.get("batches"), dict) else {}
    batches[str(batch_id)] = {"base": base, "n": n}
    m["batches"] = batches
    if not replay:
        m["next_doc_id"] = base + n
    mf.write_global(index_dir, "ingest.json", m)
    return n


def load_stream_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    """Union of the base index segments (if any) and all streamed batches."""
    import glob

    paths = sorted(glob.glob(os.path.join(index_dir, "stream", "batch=*", "segments")))
    base = os.path.join(index_dir, "segments")
    if os.path.isdir(base):
        paths.insert(0, base)
    assert paths, f"no segments under {index_dir}"
    # per-path reads + union (a multi-path read trips partition discovery
    # on the differing batch= parent directories)
    parts = [spark.read.parquet(p).drop("shard") for p in paths]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def incremental_index_stream(spark: SparkSession, input_dir: str, index_dir: str,
                             cfg: IndexConfig | None = None,
                             checkpoint_dir: str | None = None,
                             max_files_per_trigger: int | None = None):
    """readStream on a file source → foreachBatch index append.

    Returns the StreamingQuery; caller drives it (``processAllAvailable``
    in tests, ``awaitTermination`` in production).
    ``max_files_per_trigger`` bounds micro-batch size (and, with
    availableNow, forces a backlog to ingest as several batches — the
    multi-sub-index path that reconcile_stream folds).
    """
    cfg = cfg or IndexConfig()
    schema = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(spark, batch_df, index_dir, cfg, int(batch_id))

    return (stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation",
                    checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint"))
            .trigger(availableNow=True)
            .start())
