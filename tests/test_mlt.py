"""MoreLikeThis: term selection parity + source exclusion."""

import random

import numpy as np
import pytest

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.index.build import build_index
from dlkp_spark.oracle import idf as idf_fn
from dlkp_spark.query.wand import batch_topk, more_like_this


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = random.Random(19)
    rows = []
    for i in range(400):
        toks = [f"w{rng.randint(0, 30):03d}" for _ in range(rng.randint(20, 50))]
        rows.append((i, toks, []))
    docs = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, keyphrases array<string>")
    d = str(tmp_path_factory.mktemp("mlt")) + "/idx"
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=128, n_term_partitions=8),
                n_shards=1, resume=False, n_docs=400)
    return d, docs, {i: t for i, t, _ in rows}


def _brute_terms(toks_by, src, n_terms):
    from collections import Counter
    n_docs = len(toks_by)
    tf = Counter(toks_by[src])
    dfs = {t: sum(1 for ts in toks_by.values() if t in ts) for t in tf}
    scored = sorted((-(c * idf_fn(n_docs, dfs[t])), t) for t, c in tf.items())
    return [t for _, t in scored[:n_terms]]


def test_mlt_matches_manual_two_stage(spark, built):
    d, docs, toks_by = built
    srcs = [3, 77, 200]
    got = more_like_this(spark, d, docs, srcs, BM25Params(), k=8,
                         n_terms=4).collect()
    # stage 1 parity: run the brute-force-selected terms through batch_topk
    queries = [(s, _brute_terms(toks_by, s, 4)) for s in srcs]
    raw = batch_topk(spark, d, queries, BM25Params(), k=9).collect()
    want = {}
    for s in srcs:
        rows = sorted(((r.doc_id, r.score) for r in raw
                       if r.query_id == s and r.doc_id != s),
                      key=lambda x: (-x[1], x[0]))[:8]
        want[s] = rows
    gm = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        gm.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert gm == want
    # source never in its own results; ranks contiguous from 1
    for s in srcs:
        ranks = [r.rank for r in sorted(got, key=lambda r: r.rank)
                 if r.query_id == s]
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(r.doc_id != s for r in got if r.query_id == s)


def test_mlt_composes_with_deletes(spark, built):
    d, docs, _ = built
    dels = spark.createDataFrame([(i,) for i in range(0, 400, 2)], "doc_id long")
    got = more_like_this(spark, d, docs, [3], BM25Params(), k=10,
                         n_terms=4, deletes=dels).collect()
    assert got and all(r.doc_id % 2 == 1 for r in got)


def test_mlt_unknown_doc_is_empty(spark, built):
    d, docs, _ = built
    assert more_like_this(spark, d, docs, [99999], BM25Params(), k=5).count() == 0


def test_explain_contributions_sum_to_batch_scores(spark, built):
    """Σ contribution over a (query, doc) == the batch_topk score for that
    doc, bit-for-bit when summed in the kernel's (term, field) order."""
    from dlkp_spark.query.wand import explain_scores

    d, docs, _ = built
    queries = [(0, ["w001", "w002"]), (1, ["w010", "w011", "w012"])]
    hits = batch_topk(spark, d, queries, BM25Params(), k=6).collect()
    doc_ids = sorted({r.doc_id for r in hits})
    rows = explain_scores(spark, d, queries, doc_ids, BM25Params()).collect()
    by_qd: dict = {}
    for r in sorted(rows, key=lambda r: (r.query_id, r.doc_id, r.term, r.field)):
        by_qd.setdefault((r.query_id, r.doc_id), []).append(r.contribution)
    for h in hits:
        contribs = by_qd[(h.query_id, h.doc_id)]
        s = 0.0
        for c in contribs:
            s += c
        assert s == h.score, (h, contribs)


def test_explain_prunes_to_wanted_segments(spark, built):
    from dlkp_spark.query.wand import explain_scores

    d, docs, toks_by = built
    rows = explain_scores(spark, d, [(0, ["w001"])], [7], BM25Params()).collect()
    assert all(r.doc_id == 7 for r in rows)
    want_tf = toks_by[7].count("w001")
    if want_tf:
        assert len(rows) == 1 and rows[0].tf == want_tf
    else:
        assert rows == []
