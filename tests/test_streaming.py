"""Structured Streaming incremental ingest: exactly-once per batch,
monotonic doc-id allocation, content equivalence with the oracle index."""

import numpy as np
import pytest

from dlkp_spark.config import FIELD_BODY, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index import manifest as mf
from dlkp_spark.index.codec import decode_postings
from dlkp_spark.oracle import build_oracle_index
from dlkp_spark.streaming.ingest import incremental_index_stream, load_stream_postings

CFG = IndexConfig(segment_docs=64, block_size=16, n_term_partitions=4)
N = 150


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    input_dir = str(base / "incoming")
    index_dir = str(base / "idx")
    pages = generate_web_pages(spark, N, seed=42).persist()
    # three arrival waves as separate files
    for i in range(3):
        (pages.filter(f"pmod(crc32(url), 3) = {i}")
         .coalesce(1).write.mode("append").parquet(input_dir))
    q = incremental_index_stream(spark, input_dir, index_dir, CFG)
    q.awaitTermination(120)
    return input_dir, index_dir, pages


def test_all_docs_ingested_exactly_once(spark, stream_dirs):
    _, index_dir, _ = stream_dirs
    m = mf.read_global(index_dir, "ingest.json")
    assert m["next_doc_id"] == N
    assert len(m["batches"]) >= 1


def test_replayed_batch_reuses_doc_id_base(spark, tmp_path):
    """ADVICE regression: a streaming retry (same batch_id, same data) must
    re-derive the SAME doc ids from the recorded base and must not advance
    next_doc_id — exactly-once in effect, stable ids across replays."""
    from dlkp_spark.streaming.ingest import append_batch, load_stream_postings

    index_dir = str(tmp_path / "replay_idx")
    pages = generate_web_pages(spark, 60, seed=7)
    b0, b1 = pages.filter("pmod(crc32(url), 2) = 0"), pages.filter("pmod(crc32(url), 2) = 1")
    append_batch(spark, b0, index_dir, CFG, 0)
    append_batch(spark, b1, index_dir, CFG, 1)
    m0 = mf.read_global(index_dir, "ingest.json")
    before = sorted(map(tuple, load_stream_postings(spark, index_dir)
                        .select("term", "field", "n_postings").collect()))
    n = append_batch(spark, b0, index_dir, CFG, 0)  # retry of batch 0
    m1 = mf.read_global(index_dir, "ingest.json")
    assert m1["next_doc_id"] == m0["next_doc_id"], "replay advanced the id space"
    assert m1["batches"]["0"]["base"] == m0["batches"]["0"]["base"] == 0
    assert n == m0["batches"]["0"]["n"]
    after = sorted(map(tuple, load_stream_postings(spark, index_dir)
                       .select("term", "field", "n_postings").collect()))
    assert before == after, "replay changed the index content"


def test_replayed_batch_with_mutated_rowcount_fails_loudly(spark, tmp_path):
    """Failure-path hardening (round-3 verdict #1): a replayed batch_id that
    carries a DIFFERENT row count than the ingest manifest recorded would
    make its [base, base+n) doc-id range overlap its successor's — the
    append must raise, not silently overwrite the recorded count, and the
    manifest must be left exactly as it was."""
    from dlkp_spark.streaming.ingest import append_batch

    index_dir = str(tmp_path / "mutated_idx")
    pages = generate_web_pages(spark, 60, seed=7)
    b0 = pages.filter("pmod(crc32(url), 2) = 0")
    b1 = pages.filter("pmod(crc32(url), 2) = 1")
    append_batch(spark, b0, index_dir, CFG, 0)
    append_batch(spark, b1, index_dir, CFG, 1)
    m0 = mf.read_global(index_dir, "ingest.json")
    before = sorted(map(tuple, load_stream_postings(spark, index_dir)
                        .select("term", "field", "n_postings").collect()))
    mutated = b0.limit(b0.count() - 3)  # replay of batch 0 with rows missing
    with pytest.raises(ValueError, match="replay of batch 0"):
        append_batch(spark, mutated, index_dir, CFG, 0)
    m1 = mf.read_global(index_dir, "ingest.json")
    assert m1 == m0, "failed replay mutated the ingest manifest"
    after = sorted(map(tuple, load_stream_postings(spark, index_dir)
                       .select("term", "field", "n_postings").collect()))
    assert after == before, "failed replay touched the index content"


def test_streamed_postings_content_matches_oracle(spark, stream_dirs):
    _, index_dir, pages = stream_dirs
    postings = load_stream_postings(spark, index_dir).filter("field = 0").collect()
    # doc ids are allocation-order, so compare term -> multiset of tfs
    got: dict[str, list[int]] = {}
    for r in postings:
        _, tfs, _ = decode_postings(r["docs_vb"], r["tfs_vb"], r["dls_vb"])
        got.setdefault(r["term"], []).extend(int(t) for t in tfs)
    rows = pages.select("text").collect()
    oracle_idx = build_oracle_index([(i, r["text"]) for i, r in enumerate(rows)])
    want = {t: sorted(d.values()) for t, d in oracle_idx.postings[FIELD_BODY].items()}
    assert {t: sorted(v) for t, v in got.items()} == want


def test_reconcile_gives_exact_global_bm25(spark, stream_dirs, tmp_path_factory):
    """After reconcile_stream, scores over the streamed index are bit-equal
    to the oracle over the union corpus (compared as per-query score
    multisets — streamed doc ids are allocation-order, not url-rank)."""
    from dlkp_spark.config import BM25Params
    from dlkp_spark.index.merge import reconcile_stream
    from dlkp_spark.oracle import bm25_topk
    from dlkp_spark.query.wand import batch_topk

    _, index_dir, pages = stream_dirs
    out = str(tmp_path_factory.mktemp("reconciled"))
    reconcile_stream(spark, index_dir, out, CFG)

    rows = pages.select("text").collect()
    oracle_idx = build_oracle_index([(i, r["text"]) for i, r in enumerate(rows)])
    queries = [(0, ["w0003", "w0001"]), (1, ["w0100"]), (2, ["w0000", "w042"])]
    got_rows = batch_topk(spark, out, queries, BM25Params(), k=10).collect()
    by_q = {}
    for r in got_rows:
        by_q.setdefault(r["query_id"], []).append(r["score"])
    for qid, terms in queries:
        want = sorted((s for _, _, s in bm25_topk(oracle_idx, terms, k=10)), reverse=True)
        got = sorted(by_q.get(qid, []), reverse=True)
        assert got == want, (qid, terms, got[:3], want[:3])


def test_restart_is_idempotent(spark, stream_dirs):
    input_dir, index_dir, _ = stream_dirs
    before = mf.read_global(index_dir, "ingest.json")
    q = incremental_index_stream(spark, input_dir, index_dir, CFG)
    q.awaitTermination(60)
    after = mf.read_global(index_dir, "ingest.json")
    assert after["next_doc_id"] == before["next_doc_id"]  # nothing re-ingested
