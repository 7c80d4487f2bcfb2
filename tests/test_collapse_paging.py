"""Field collapsing and searchAfter pagination.

Pinned here:
- collapse_topk equals a Python reference that walks the FULL ranking
  (batch_topk at k=N) keeping the first doc per value — including exact
  scores, so the per-segment top-k-distinct-values emit rule loses
  nothing;
- every (query, value) appears at most once; docs with a NULL attribute
  collapse into one shared null group;
- page 2 via the exact page-1 cursor equals ranks (k, 2k] of a single
  2k run, bit-for-bit, on the dense, sparse-fallback, conjunctive, and
  two-wave paths;
- a cursor past the last result yields an empty page.
"""

import pytest
from pyspark.sql import functions as F

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, prepare_docs
from dlkp_spark.oracle import reference_query_set
from dlkp_spark.query.wand import batch_topk, collapse_topk

N_DOCS = 240
K = 8
CFG = IndexConfig(segment_docs=64, block_size=16, n_term_partitions=8)
P = BM25Params()
QUERIES = reference_query_set(n_queries=12)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = prepare_docs(generate_web_pages(spark, N_DOCS, seed=31))
    # every 7th doc loses its lang → the shared null collapse group
    return docs.withColumn(
        "lang", F.when(F.col("doc_id") % 7 == 0, None)
        .otherwise(F.col("lang"))).persist()


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("coll_idx"))
    build_index(spark, corpus, d, cfg=CFG, n_shards=2, attrs=("lang",))
    return d


@pytest.fixture(scope="module")
def doc_lang(corpus):
    return {int(r["doc_id"]): r["lang"]
            for r in corpus.select("doc_id", "lang").collect()}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_collapse_matches_full_ranking_walk(spark, index_dir, doc_lang):
    got = collapse_topk(spark, index_dir, QUERIES, "lang", P, k=K)
    got_rows = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"], r["value"])
        for r in got.collect())
    full = batch_topk(spark, index_dir, QUERIES, P, k=N_DOCS)
    want_rows = []
    for qid in sorted({q for q, _ in QUERIES}):
        ranked = sorted(
            ((r["rank"], r["doc_id"], r["score"]) for r in full.collect()
             if r["query_id"] == qid))
        seen, rank = set(), 0
        for _, did, score in ranked:
            v = doc_lang[did]
            key = v if v is not None else "\0null"
            if key in seen:
                continue
            seen.add(key)
            rank += 1
            want_rows.append((qid, rank, did, score, v))
            if rank >= K:
                break
    assert got_rows == sorted(want_rows)


def test_collapse_values_unique_and_null_grouped(spark, index_dir):
    out = collapse_topk(spark, index_dir, QUERIES, "lang", P, k=K).collect()
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["value"])
    assert per_q
    for vals in per_q.values():
        # at most one NULL row and no repeated value per query
        assert len(vals) == len({v if v is not None else "\0" for v in vals})


def test_collapse_attributeless_segment_ranks_in_null_group(spark, tmp_path):
    """A segment where NO doc carries the collapse attribute must still
    rank its docs (shared null group) — the r6 left-join fix; the former
    inner join against the attr sidecar dropped the whole segment."""
    docs = prepare_docs(generate_web_pages(spark, 128, seed=31))
    docs = docs.withColumn(
        "lang", F.when(F.col("doc_id") < 64, None).otherwise(F.col("lang")))
    d = str(tmp_path / "idx")
    build_index(spark, docs, d,
                cfg=IndexConfig(segment_docs=64, block_size=16,
                                n_term_partitions=8),
                n_shards=1, attrs=("lang",), n_docs=128)
    doc_lang = {int(r["doc_id"]): r["lang"]
                for r in docs.select("doc_id", "lang").collect()}
    qs = QUERIES[:4]
    got_rows = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"], r["value"])
        for r in collapse_topk(spark, d, qs, "lang", P, k=K).collect())
    full = batch_topk(spark, d, qs, P, k=128).collect()
    want_rows = []
    for qid in sorted({q for q, _ in qs}):
        ranked = sorted((r["rank"], r["doc_id"], r["score"])
                        for r in full if r["query_id"] == qid)
        seen, rank = set(), 0
        for _, did, score in ranked:
            v = doc_lang[did]
            key = v if v is not None else "\0null"
            if key in seen:
                continue
            seen.add(key)
            rank += 1
            want_rows.append((qid, rank, did, score, v))
            if rank >= K:
                break
    assert got_rows == sorted(want_rows)
    # the attribute-less segment's docs must actually be present
    assert any(did < 64 for _, _, did, _, _ in got_rows)


def test_collapse_requires_attr(spark, index_dir):
    with pytest.raises(ValueError, match="attribute postings"):
        collapse_topk(spark, index_dir, QUERIES, "nope", P, k=K)


def _cursor_from(page1, k):
    return {int(r["query_id"]): (float(r["score"]), int(r["doc_id"]))
            for r in page1.collect() if r["rank"] == k}


def _page2_want(spark, index_dir, k, **kw):
    full = batch_topk(spark, index_dir, QUERIES, P, k=2 * k, **kw)
    return sorted(
        (r["query_id"], r["rank"] - k, r["doc_id"], r["score"])
        for r in full.collect() if r["rank"] > k)


@pytest.mark.parametrize("kw", [
    {}, {"two_wave": True}, {"min_match": 2},
])
def test_search_after_page2_bit_identical(spark, index_dir, kw):
    p1 = batch_topk(spark, index_dir, QUERIES, P, k=K, **kw)
    cur = _cursor_from(p1, K)
    assert cur, "page 1 must fill for at least one query"
    queries2 = [(q, t) for q, t in QUERIES if q in cur]
    p2 = batch_topk(spark, index_dir, queries2, P, k=K, after=cur, **kw)
    got = sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                 for r in p2.collect())
    want = [t for t in _page2_want(spark, index_dir, K, **kw)
            if t[0] in cur]
    assert got == want


def test_search_after_sparse_fallback_path(spark, index_dir):
    # dense_max_width=0 forces the non-dense branch → cursor goes through
    # the sparse exact TAAT gate
    p1 = batch_topk(spark, index_dir, QUERIES, P, k=K)
    cur = _cursor_from(p1, K)
    queries2 = [(q, t) for q, t in QUERIES if q in cur]
    import unittest.mock as mock

    from dlkp_spark.query import wand as wand_mod
    orig = wand_mod._make_batch_kernel

    def forced(*a, **kw):
        kw["dense_max_width"] = 0
        return orig(*a, **kw)

    with mock.patch.object(wand_mod, "_make_batch_kernel", forced):
        p2 = batch_topk(spark, index_dir, queries2, P, k=K, after=cur)
        got = sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                     for r in p2.collect())
    want = [t for t in _page2_want(spark, index_dir, K) if t[0] in cur]
    assert got == want


def test_search_after_exhausted_cursor_empty(spark, index_dir):
    qid, terms = QUERIES[0]
    full = batch_topk(spark, index_dir, [(qid, terms)], P, k=N_DOCS)
    last = full.orderBy(F.col("rank").desc()).first()
    out = batch_topk(spark, index_dir, [(qid, terms)], P, k=K,
                     after={qid: (float(last["score"]), int(last["doc_id"]))})
    assert out.count() == 0
