"""Fuzzy (Lucene FuzzyQuery) top-k and total-hit match counts.

Pinned here:
- fuzzy expansion against the index term dictionary equals a pure-Python
  Levenshtein sweep over the corpus vocabulary (Spark's JVM levenshtein
  and the reference DP agree), including the prefix gate and self-match;
- fuzzy_topk is bit-identical to batch_topk run on the hand-expanded
  term lists (the same rewrite contract prefix_topk pins);
- max_expansion raises like Lucene's maxClauseCount;
- match_counts equals the per-query distinct-matching-doc count computed
  straight from the token table, for min_match=1 and the >=m
  generalization, with OOV terms contributing nothing.
"""

import numpy as np
import pytest

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, load_postings, prepare_docs
from dlkp_spark.query.wand import batch_topk, fuzzy_topk, match_counts

N_DOCS = 200
K = 10
CFG = IndexConfig(segment_docs=64, block_size=16, n_term_partitions=8)


@pytest.fixture(scope="module")
def corpus(spark):
    return prepare_docs(generate_web_pages(spark, N_DOCS, seed=7)).persist()


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzzy_idx"))
    build_index(spark, corpus, d, cfg=CFG, n_shards=2)
    return d


@pytest.fixture(scope="module")
def vocab(spark, index_dir):
    return sorted(r["term"] for r in
                  load_postings(spark, index_dir)
                  .select("term").distinct().collect())


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein DP (unit insert/delete/substitute)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _expand(vocab, src: str, max_edits: int, prefix_len: int) -> list[str]:
    return sorted(t for t in vocab
                  if t[:prefix_len] == src[:prefix_len]
                  and _lev(t, src) <= max_edits)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _fuzzy_sources(vocab):
    """Deterministic misspellings of real vocab terms: drop a middle char
    (distance 1) and swap two adjacent chars (distance <= 2)."""
    longs = [t for t in vocab if len(t) >= 4][:3]
    assert longs, "generator vocab has no term of length >= 4"
    out = []
    for t in longs:
        out.append(t[:1] + t[2:])                      # delete -> d=1
        out.append(t[:1] + t[2] + t[1] + t[3:])        # transpose -> d<=2
    return out


def test_expansion_matches_python_reference(spark, index_dir, vocab):
    srcs = _fuzzy_sources(vocab) + [vocab[0], "zzznothere"]
    for max_edits, prefix_len in [(1, 1), (2, 1), (2, 0)]:
        queries = [(i, [s]) for i, s in enumerate(srcs)]
        got = fuzzy_topk(spark, index_dir, queries, BM25Params(), k=K,
                         max_edits=max_edits, prefix_len=prefix_len)
        expanded = [(i, _expand(vocab, s, max_edits, prefix_len))
                    for i, s in enumerate(srcs)]
        expanded = [(i, ts) for i, ts in expanded if ts]
        want = batch_topk(spark, index_dir, expanded, BM25Params(), k=K) \
            if expanded else None
        if want is None:
            assert got.count() == 0
        else:
            assert _rows(got) == _rows(want)  # exact tuples incl. scores


def test_self_match_at_zero_edits(spark, index_dir, vocab):
    t = vocab[0]
    got = fuzzy_topk(spark, index_dir, [(0, [t])], BM25Params(), k=K,
                     max_edits=0, prefix_len=1)
    want = batch_topk(spark, index_dir, [(0, [t])], BM25Params(), k=K)
    assert _rows(got) == _rows(want)


def test_multi_source_terms_union(spark, index_dir, vocab):
    srcs = _fuzzy_sources(vocab)[:2]
    got = fuzzy_topk(spark, index_dir, [(0, srcs)], BM25Params(), k=K,
                     max_edits=2, prefix_len=1)
    terms = sorted({t for s in srcs for t in _expand(vocab, s, 2, 1)})
    want = batch_topk(spark, index_dir, [(0, terms)], BM25Params(), k=K)
    assert _rows(got) == _rows(want)


def test_max_expansion_guard(spark, index_dir, vocab):
    src = vocab[0]
    with pytest.raises(ValueError, match="max_expansion"):
        fuzzy_topk(spark, index_dir, [(0, [src])], BM25Params(), k=K,
                   max_edits=16, prefix_len=0, max_expansion=1)


def test_empty_inputs(spark, index_dir):
    assert fuzzy_topk(spark, index_dir, [], BM25Params(), k=K).count() == 0
    assert fuzzy_topk(spark, index_dir, [(0, ["qqqqqqq"])], BM25Params(),
                      k=K, max_edits=1).count() == 0


def _token_matrix(corpus):
    """[(doc_id, set(tokens incl. keyphrase tokens))] from the docs frame."""
    rows = corpus.select("doc_id", "tokens", "keyphrases").collect()
    out = []
    for r in rows:
        toks = set(r["tokens"])
        for kp in r["keyphrases"] or []:
            toks.update(kp.split(" "))
        out.append((int(r["doc_id"]), toks))
    return out


def test_match_counts_min_match_1(spark, corpus, index_dir, vocab):
    queries = [(0, vocab[:2]), (1, [vocab[0], "zzznothere"]),
               (2, ["zzznothere"])]
    got = {int(r["query_id"]): int(r["n_docs"])
           for r in match_counts(spark, index_dir, queries).collect()}
    docs = _token_matrix(corpus)
    for qid, terms in queries:
        want = sum(1 for _, toks in docs if toks & set(terms))
        assert got.get(qid, 0) == want


def test_match_counts_min_match_2(spark, corpus, index_dir, vocab):
    terms = vocab[:3]
    got = {int(r["query_id"]): int(r["n_docs"])
           for r in match_counts(spark, index_dir, [(0, terms)],
                                 min_match=2).collect()}
    docs = _token_matrix(corpus)
    want = sum(1 for _, toks in docs if len(toks & set(terms)) >= 2)
    assert got.get(0, 0) == want


def test_match_counts_clamps_to_term_count(spark, corpus, index_dir, vocab):
    # min_match beyond the query's term count clamps (batch_topk contract)
    t = vocab[0]
    got = {int(r["query_id"]): int(r["n_docs"])
           for r in match_counts(spark, index_dir, [(0, [t])],
                                 min_match=5).collect()}
    docs = _token_matrix(corpus)
    want = sum(1 for _, toks in docs if t in toks)
    assert got.get(0, 0) == want


def test_match_counts_rejects_bad_min_match(spark, index_dir):
    with pytest.raises(ValueError):
        match_counts(spark, index_dir, [(0, ["a"])], min_match=0)
