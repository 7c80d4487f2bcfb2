"""Composed curation chain: stage effects and keeper semantics."""

import pytest
from pyspark.sql import functions as F

from dlkp_spark.pipeline.curate import curate_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # en docs, unique
        (0, "src0", "the data query is fast and the index is good"),
        (1, "src0", "the query of data and the index of the engine"),
        # exact duplicates of doc 0 (higher ids lose)
        (2, "src0", "the data query is fast and the index is good"),
        (3, "src1", "the data query is fast and the index is good"),
        # near-duplicate of doc 1 (one token differs → high jaccard)
        (4, "src1", "the query of data and the index of the engines"),
        # wrong language (german markers)
        (5, "src1", "der und nicht der und nicht der und nicht"),
        # too short
        (6, "src1", "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_stage_effects(spark, corpus):
    kept = sorted(r["doc_id"] for r in curate_corpus(
        corpus, languages=("en",), min_tokens=5, jaccard_threshold=0.3,
        default_fraction=1.0).collect())
    # 5 out (lang), 6 out (short), 2+3 out (exact dups of 0),
    # 4 out (near-dup cluster with 1; min id 1 survives)
    assert kept == [0, 1]


def test_sampling_composes_after_keepers(spark, corpus):
    full = {r["doc_id"] for r in curate_corpus(
        corpus, min_tokens=5, default_fraction=1.0).collect()}
    sampled = {r["doc_id"] for r in curate_corpus(
        corpus, min_tokens=5, default_fraction=0.5).collect()}
    assert sampled <= full  # downsample only removes, never resurrects


def test_injected_pair_frame_is_respected(spark, corpus):
    # empty edge frame → near-dup stage becomes a no-op
    no_edges = spark.createDataFrame([], "a long, b long")
    kept = sorted(r["doc_id"] for r in curate_corpus(
        corpus, min_tokens=5, default_fraction=1.0, pairs=no_edges).collect())
    assert kept == [0, 1, 4]  # 4 survives without the jaccard edge


def test_webtext_chain_stage_effects(spark):
    from dlkp_spark.pipeline.curate import curate_webtext

    common = "the data query table row scan part hash merge batch"
    docs = [
        # 0/1: identical AFTER PII scrub (different emails) -> one keeper
        (0, f"{common} mail a@x.io {common} value sort window group"),
        (1, f"{common} mail b@y.io {common} value sort window group"),
        # 2: in-distribution survivor
        (2, f"{common} value sort window group line column small fast"),
        # 3: massive repetition -> dup-word gate drops it
        (3, "spam " * 40),
        # 4: French markers dominate -> language gate drops it
        (4, "le les est le les est le les est"),
        # 5: one token -> no bigram score -> perplexity stage drops it
        (5, "solo"),
        # 6: all-novel words -> high nats -> perplexity gate drops it
        (6, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9 zz10"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = curate_webtext(df, max_dup_word_frac=0.6, nats_threshold=2.5,
                         chunk_tokens=8, overlap=2).collect()
    kept_docs = sorted({r["doc_id"] for r in out})
    assert kept_docs == [0, 2]  # doc 1 collapsed into 0 post-scrub
    # chunk shape: every chunk <= 8 tokens, neighbors share 2 tokens
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"].split())
    for chunks in by_doc.values():
        assert all(len(c) <= 8 for c in chunks)
        for a, b in zip(chunks, chunks[1:]):
            assert a[-2:] == b[:2]
    # the scrub happened before chunking: no raw email survives
    assert not any("@" in r["chunk_text"] for r in out)
    assert any("<EMAIL>" in r["chunk_text"] for r in out)
