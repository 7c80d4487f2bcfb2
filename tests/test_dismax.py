"""DisMax field combination (Lucene DisjunctionMaxQuery semantics).

Pinned here:
- tie=1.0 recovers the default sum combiner: bit-identical to batch_topk
  for single-term queries (max+min is the same two-operand add), and
  equal within float reassociation for multi-term queries;
- the combiner matches a pure-Python reference (per-field BM25 with own
  df/avgdl, 2.0 kp boost inside the disjunct, max + tie*min) on a
  two-field tagged corpus;
- tie=0.0 is pure max: never exceeds the sum, equals it when a term
  matches in only one field;
- tie outside [0, 1] raises.
"""

import pytest

from dlkp_spark.config import FIELD_BODY, FIELD_KP, BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, load_stats, prepare_docs
from dlkp_spark.oracle import idf as idf_fn
from dlkp_spark.query.wand import batch_topk, dismax_topk

N_DOCS = 200
K = 10
CFG = IndexConfig(segment_docs=64, block_size=16, n_term_partitions=8)
P = BM25Params()


@pytest.fixture(scope="module")
def corpus(spark):
    return prepare_docs(generate_web_pages(spark, N_DOCS, seed=23)).persist()


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dismax_idx"))
    build_index(spark, corpus, d, cfg=CFG, n_shards=2)
    return d


@pytest.fixture(scope="module")
def kp_terms(corpus):
    """Terms that appear in BOTH fields of at least one doc — the only
    ones where the combiner differs from the sum."""
    rows = corpus.select("tokens", "keyphrases").collect()
    both = set()
    for r in rows:
        body = set(r["tokens"])
        kp = {t for p in (r["keyphrases"] or []) for t in p.split(" ")}
        both |= body & kp
    assert both, "tagged generator corpus has no dual-field term"
    return sorted(both)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tie_one_single_term_bit_identical(spark, index_dir, kp_terms):
    queries = [(i, [t]) for i, t in enumerate(kp_terms[:3])]
    got = dismax_topk(spark, index_dir, queries, P, k=K, tie=1.0)
    want = batch_topk(spark, index_dir, queries, P, k=K)
    assert _rows(got) == _rows(want)


def test_tie_one_multi_term_equals_sum(spark, index_dir, kp_terms):
    queries = [(0, kp_terms[:3])]
    got = {r["doc_id"]: r["score"] for r in
           dismax_topk(spark, index_dir, queries, P, k=K, tie=1.0).collect()}
    want = {r["doc_id"]: r["score"] for r in
            batch_topk(spark, index_dir, queries, P, k=K).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def _py_scores(corpus, terms, stats, tie):
    rows = corpus.select("doc_id", "tokens", "keyphrases").collect()
    docs = []
    for r in rows:
        tf_b = {}
        for t in r["tokens"]:
            tf_b[t] = tf_b.get(t, 0) + 1
        tf_k = {}
        for ph in r["keyphrases"] or []:
            for t in ph.split(" "):
                tf_k[t] = tf_k.get(t, 0) + 1
        docs.append((int(r["doc_id"]), tf_b, tf_k,
                     len(r["tokens"]), sum(tf_k.values())))
    df_b, df_k = {}, {}
    for _, tf_b, tf_k, _, _ in docs:
        for t in tf_b:
            df_b[t] = df_b.get(t, 0) + 1
        for t in tf_k:
            df_k[t] = df_k.get(t, 0) + 1
    n = stats["n_docs"]
    avg_b, avg_k = stats["avgdl"][FIELD_BODY], stats["avgdl"][FIELD_KP]

    def tfn(tf, dl, avg):
        return (tf * (P.k1 + 1.0)) / (tf + P.k1 * (1.0 - P.b + P.b * dl / avg))

    out = {}
    for did, tf_b, tf_k, dl_b, dl_k in docs:
        s = 0.0
        for t in sorted(set(terms)):
            cb = idf_fn(n, df_b[t]) * tfn(float(tf_b[t]), float(dl_b), avg_b) \
                if t in tf_b else None
            ck = P.kp_boost * (idf_fn(n, df_k[t])
                               * tfn(float(tf_k[t]), float(dl_k), avg_k)) \
                if t in tf_k else None
            if cb is None and ck is None:
                continue
            if cb is None:
                s += ck
            elif ck is None:
                s += cb
            else:
                s += max(cb, ck) + tie * min(cb, ck)
        if s:
            out[did] = s
    return out


def test_combiner_matches_python_reference(spark, corpus, index_dir, kp_terms):
    stats = load_stats(index_dir)
    terms = kp_terms[:3]
    for tie in (0.0, 0.3):
        got = {int(r["doc_id"]): float(r["score"]) for r in
               dismax_topk(spark, index_dir, [(0, terms)], P, k=N_DOCS,
                           tie=tie).collect()}
        want = _py_scores(corpus, terms, stats, tie)
        assert set(got) == set(want)
        for d, s in want.items():
            assert got[d] == pytest.approx(s, rel=1e-12), (tie, d)


def test_pure_max_never_exceeds_sum(spark, index_dir, kp_terms):
    queries = [(0, kp_terms[:2])]
    mx = {r["doc_id"]: r["score"] for r in
          dismax_topk(spark, index_dir, queries, P, k=N_DOCS, tie=0.0).collect()}
    sm = {r["doc_id"]: r["score"] for r in
          dismax_topk(spark, index_dir, queries, P, k=N_DOCS, tie=1.0).collect()}
    assert set(mx) == set(sm)
    assert all(mx[d] <= sm[d] + 1e-12 for d in mx)
    assert any(mx[d] < sm[d] for d in mx)  # some doc matches in both fields


def test_tie_out_of_range_raises(spark, index_dir):
    with pytest.raises(ValueError, match="tie"):
        dismax_topk(spark, index_dir, [(0, ["a"])], P, k=K, tie=1.5)
