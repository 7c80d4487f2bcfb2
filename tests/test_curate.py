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
