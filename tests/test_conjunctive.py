"""Conjunctive (AND-semantics) BM25 top-k — DataFrame and index paths.

Pinned here:
- kernel brute-force parity: _taat_conjunctive against a pure-Python
  intersect-then-score reference over randomized posting lists;
- engine-vs-engine: batch_topk(conjunctive=True) equals
  exact_topk(conjunctive=True) on the same corpus (both are separately
  SQL-oracle-gated in the driver contract, q_bm25_conjunctive*);
- conjunctive ⊆ disjunctive with identical scores for surviving docs;
- two-wave pruning composes (UB bounds the disjunctive score, which
  dominates the conjunctive score — admissible);
- a query containing an out-of-vocab term returns nothing.
"""

import numpy as np
import pytest

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, prepare_docs
from dlkp_spark.query.bm25 import exact_topk
from dlkp_spark.query.wand import _taat_conjunctive, batch_topk

N_DOCS = 300
K = 10
CFG = IndexConfig(segment_docs=64, block_size=16, n_term_partitions=8)
QUERIES = [(0, ["w0002", "w0005"]), (1, ["w0000", "w0001", "w0003"]),
           (2, ["w0004"]), (3, ["w0002", "zzznothere"])]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    docs = prepare_docs(generate_web_pages(spark, N_DOCS, seed=42))
    idx = str(tmp_path_factory.mktemp("conj") / "idx")
    build_index(spark, docs, idx, cfg=CFG, n_shards=1)
    return docs, idx


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kernel_brute_force_parity():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n_terms = int(rng.integers(1, 4))
        q_lists, per_term_docs = [], {}
        for t in range(n_terms):
            term = f"t{t}"
            for field in (0, 1):
                if rng.random() < 0.3 and t > 0:
                    continue  # some terms miss a field
                docs = np.sort(rng.choice(50, size=int(rng.integers(1, 20)),
                                          replace=False)).astype(np.int64)
                q_lists.append({
                    "term": term, "field": field, "docs": docs,
                    "contribs": rng.random(len(docs)),
                    "boost": float(1.0 if field == 0 else 2.0),
                })
                per_term_docs.setdefault(term, set()).update(docs.tolist())
        q_lists.sort(key=lambda d: (d["term"], d["field"]))
        got = _taat_conjunctive(q_lists, n_terms, K)
        # brute force: docs in every term's union, scored by summing in
        # (term, field) order
        full = set.intersection(*per_term_docs.values()) \
            if len(per_term_docs) == n_terms else set()
        scores = {}
        for lst in q_lists:
            for d, c in zip(lst["docs"], lst["boost"] * lst["contribs"]):
                if int(d) in full:
                    scores[int(d)] = scores.get(int(d), 0.0) + float(c)
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
        assert [(d, pytest.approx(s)) for d, s in got] == \
               [(d, pytest.approx(s)) for d, s in want]


def test_index_path_equals_dataframe_path(spark, corpus):
    docs, idx = corpus
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in QUERIES for t in terms],
        "query_id long, term string")
    a = _rows(exact_topk(docs, qdf, BM25Params(), k=K, conjunctive=True)
              .select("query_id", "rank", "doc_id"))
    b = _rows(batch_topk(spark, idx, QUERIES, BM25Params(), k=K,
                         conjunctive=True).select("query_id", "rank", "doc_id"))
    assert a == b and len(a) > 0


def test_conjunctive_subset_of_disjunctive_same_scores(spark, corpus):
    _, idx = corpus
    dis = {(r["query_id"], r["doc_id"]): r["score"]
           for r in batch_topk(spark, idx, QUERIES, BM25Params(),
                               k=N_DOCS).collect()}
    con = batch_topk(spark, idx, QUERIES, BM25Params(), k=K,
                     conjunctive=True).collect()
    assert len(con) > 0
    for r in con:
        assert dis[(r["query_id"], r["doc_id"])] == r["score"]  # bit-equal


def test_two_wave_composes(spark, corpus):
    _, idx = corpus
    one = _rows(batch_topk(spark, idx, QUERIES, BM25Params(), k=K,
                           conjunctive=True))
    two = _rows(batch_topk(spark, idx, QUERIES, BM25Params(), k=K,
                           conjunctive=True, two_wave=True))
    assert one == two


def test_min_match_paths_agree(spark, corpus):
    """min_match=2 on the index path equals the DataFrame path, including
    the 1-term clamp query (requirement caps at the term count)."""
    docs, idx = corpus
    queries = [*QUERIES, (4, ["w0004"])]  # 1-term: clamp to 1
    qdf = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in terms],
        "query_id long, term string")
    a = _rows(exact_topk(docs, qdf, BM25Params(), k=K, min_match=2)
              .select("query_id", "rank", "doc_id"))
    b = _rows(batch_topk(spark, idx, queries, BM25Params(), k=K,
                         min_match=2).select("query_id", "rank", "doc_id"))
    assert a == b and len(a) > 0
    # min_match is between OR and AND: per query, result-set sizes nest
    dis = batch_topk(spark, idx, QUERIES, BM25Params(), k=K)
    con = batch_topk(spark, idx, QUERIES, BM25Params(), k=K, conjunctive=True)
    mm = batch_topk(spark, idx, QUERIES, BM25Params(), k=K, min_match=2)
    import collections
    sizes = {}
    for name, df in (("dis", dis), ("mm", mm), ("con", con)):
        c = collections.Counter(r["query_id"] for r in df.collect())
        sizes[name] = c
    for qid, _terms in QUERIES:
        assert sizes["con"][qid] <= sizes["mm"][qid] <= sizes["dis"][qid]


def test_min_match_one_is_plain_topk(spark, corpus):
    _, idx = corpus
    a = _rows(batch_topk(spark, idx, QUERIES, BM25Params(), k=K))
    b = _rows(batch_topk(spark, idx, QUERIES, BM25Params(), k=K, min_match=1))
    assert a == b


def test_oov_term_returns_nothing(spark, corpus):
    _, idx = corpus
    got = batch_topk(spark, idx, [(9, ["w0002", "zzznothere"])],
                     BM25Params(), k=K, conjunctive=True)
    assert got.count() == 0


def test_prefix_equals_manual_expansion(spark, corpus):
    """prefix_topk('w000*') == batch_topk over the hand-expanded term list;
    an unmatched prefix yields nothing; the Lucene-style expansion cap
    raises with the prefix named."""
    from dlkp_spark.index.build import load_postings
    from dlkp_spark.query.wand import prefix_topk

    _, idx = corpus
    vocab = sorted(r["term"] for r in load_postings(spark, idx)
                   .select("term").distinct().collect()
                   if r["term"].startswith("w000"))
    assert len(vocab) > 1  # a real multi-term expansion
    a = _rows(prefix_topk(spark, idx, [(0, "w000"), (1, "zzz")],
                          BM25Params(), k=K))
    b = _rows(batch_topk(spark, idx, [(0, vocab)], BM25Params(), k=K))
    assert a == b and len(a) > 0  # qid 1 contributes nothing
    with pytest.raises(ValueError, match="max_expansion"):
        prefix_topk(spark, idx, [(0, "w")], BM25Params(), k=K,
                    max_expansion=3)
