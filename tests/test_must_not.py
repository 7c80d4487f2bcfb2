"""Boolean MUST_NOT clauses on the batch query path.

Pinned here:
- must_not equals post-filtering the full ranking by corpus membership
  (docs containing any excluded token in either field drop; survivors
  keep BIT-identical scores and close ranks);
- exclusion composes with two-wave pruning and conjunctive gating
  bit-for-bit;
- excluded terms never score (a query whose only term is also excluded
  returns nothing);
- queries without a must_not entry are untouched.
"""

import pytest

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, prepare_docs
from dlkp_spark.oracle import reference_query_set
from dlkp_spark.query.wand import batch_topk

N_DOCS = 240
K = 8
CFG = IndexConfig(segment_docs=64, block_size=16, n_term_partitions=8)
P = BM25Params()
QUERIES = reference_query_set(n_queries=10)


@pytest.fixture(scope="module")
def corpus(spark):
    return prepare_docs(generate_web_pages(spark, N_DOCS, seed=13)).persist()


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("neg_idx"))
    build_index(spark, corpus, d, cfg=CFG, n_shards=2)
    return d


@pytest.fixture(scope="module")
def doc_terms(corpus):
    rows = corpus.select("doc_id", "tokens", "keyphrases").collect()
    out = {}
    for r in rows:
        toks = set(r["tokens"])
        for kp in r["keyphrases"] or []:
            toks.update(kp.split(" "))
        out[int(r["doc_id"])] = toks
    return out


def _neg_for(queries, doc_terms):
    """A deterministic excluded term per query: the first term of the
    NEXT query (guaranteed in-vocab, usually disjoint)."""
    neg = {}
    for i, (qid, _terms) in enumerate(queries):
        cand = queries[(i + 1) % len(queries)][1][0]
        neg[qid] = [cand]
    return neg


def _want(spark, index_dir, queries, neg, doc_terms, k, **kw):
    full = batch_topk(spark, index_dir, queries, P, k=N_DOCS, **kw)
    rows = sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                  for r in full.collect())
    out = []
    for qid, _ in queries:
        excl = set()
        for t in neg.get(qid, []):
            excl |= {d for d, toks in doc_terms.items() if t in toks}
        rank = 0
        for q, _r, did, score in rows:
            if q != qid or did in excl:
                continue
            rank += 1
            out.append((qid, rank, did, score))
            if rank >= k:
                break
    return sorted(out)


@pytest.mark.parametrize("kw", [{}, {"two_wave": True}, {"conjunctive": True}])
def test_must_not_equals_postfiltered_full_ranking(
        spark, index_dir, doc_terms, kw):
    neg = _neg_for(QUERIES, doc_terms)
    got = batch_topk(spark, index_dir, QUERIES, P, k=K, must_not=neg, **kw)
    rows = sorted((r["query_id"], r["rank"], r["doc_id"], r["score"])
                  for r in got.collect())
    assert rows == _want(spark, index_dir, QUERIES, neg, doc_terms, K, **kw)
    assert rows  # something survived


def test_excluding_own_term_empties(spark, index_dir):
    qid, terms = QUERIES[0]
    out = batch_topk(spark, index_dir, [(qid, [terms[0]])], P, k=K,
                     must_not={qid: [terms[0]]})
    assert out.count() == 0


def test_queries_without_entry_untouched(spark, index_dir):
    neg = {QUERIES[0][0]: [QUERIES[1][1][0]]}
    got = batch_topk(spark, index_dir, QUERIES, P, k=K, must_not=neg)
    plain = batch_topk(spark, index_dir, QUERIES, P, k=K)
    got_other = sorted(tuple(r) for r in got.collect()
                       if r["query_id"] != QUERIES[0][0])
    plain_other = sorted(tuple(r) for r in plain.collect()
                         if r["query_id"] != QUERIES[0][0])
    assert got_other == plain_other
