"""Snippets: deterministic anchor choice + window arithmetic."""

import random

import pytest

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.index.build import build_index
from dlkp_spark.query.snippet import snippet_topk


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = random.Random(3)
    rows = []
    for i in range(300):
        toks = [f"w{rng.randint(0, 25):03d}" for _ in range(rng.randint(15, 40))]
        rows.append((i, toks, []))
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, keyphrases array<string>")
    d = str(tmp_path_factory.mktemp("snip")) + "/idx"
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=64, n_term_partitions=8),
                n_shards=1, resume=False, n_docs=300)
    return d, docs, {i: t for i, t, _ in rows}


def _df(toks_by, term):
    return sum(1 for ts in toks_by.values() if term in ts)


def test_snippet_window_and_anchor_match_python(spark, built):
    d, docs, toks_by = built
    queries = [(0, ["w001", "w002"]), (1, ["w010"]), (2, ["w003", "w004", "w005"])]
    w = 4
    out = snippet_topk(spark, d, docs, queries, BM25Params(), k=5,
                       window=w).collect()
    assert out
    qmap = dict(queries)
    for r in out:
        ts = toks_by[r.doc_id]
        matched = sorted(set(qmap[r.query_id]) & set(ts))
        want_anchor = min(matched, key=lambda t: (_df(toks_by, t), t))
        assert r.anchor == want_anchor
        pos = ts.index(r.anchor)
        assert r.snippet == " ".join(ts[max(0, pos - w): pos + w + 1])


def test_snippet_clamps_at_doc_edges(spark, built):
    d, _, _ = built
    # a tiny doc whose anchor sits at position 0 and a huge window
    docs2 = spark.createDataFrame(
        [(0, ["zzanchor", "b", "c"], [])],
        "doc_id long, tokens array<string>, keyphrases array<string>")
    import tempfile
    d2 = tempfile.mkdtemp() + "/idx"
    build_index(spark, docs2, d2,
                cfg=IndexConfig(segment_docs=64, n_term_partitions=2),
                n_shards=1, resume=False, n_docs=1)
    out = snippet_topk(spark, d2, docs2, [(0, ["zzanchor"])], BM25Params(),
                       k=1, window=50).collect()
    assert out[0].snippet == "zzanchor b c"


def test_snippet_composes_with_filters_kwargs(spark, built):
    """topk kwargs (here: deletes) pass through to batch_topk."""
    d, docs, toks_by = built
    dels = spark.createDataFrame([(i,) for i in range(0, 300, 2)], "doc_id long")
    out = snippet_topk(spark, d, docs, [(0, ["w001"])], BM25Params(), k=10,
                       deletes=dels).collect()
    assert out and all(r.doc_id % 2 == 1 for r in out)


def test_snippet_all_query_terms_oov_returns_empty(spark, built):
    """No query term in the index's body field → empty frame with the
    snippet schema (r6 ADVICE fix: the anchor expression used to index
    into a None df map and raise TypeError)."""
    d, docs, _ = built
    out = snippet_topk(spark, d, docs, [(0, ["zzznotaterm"])],
                       BM25Params(), k=5)
    assert out.columns == ["query_id", "rank", "doc_id", "score",
                           "anchor", "snippet"]
    assert out.count() == 0
