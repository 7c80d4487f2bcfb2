"""SynonymQuery blending and wildcard expansion.

Pinned here:
- a synonym query of singleton clauses (in sorted order) is BIT-identical
  to batch_topk on the same terms — the blend reduces to plain TermQuery
  scoring, same float-add order;
- group blending matches a pure-Python reference (tf summed per doc,
  idf from the group's max GLOBAL df) bit-for-bit, including when group
  members are split across different segments of the same doc range;
- OOV members are ignored; all-OOV clauses yield no rows;
- wildcard expansion equals a pure-Python regex sweep of the vocabulary
  and scores bit-identically to batch_topk on the hand-expanded terms,
  including leading-wildcard patterns; max_expansion raises.
"""

import re

import pytest

from dlkp_spark.config import BM25Params, IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, load_postings, prepare_docs
from dlkp_spark.oracle import idf as idf_fn
from dlkp_spark.query.wand import (_wildcard_regex, batch_topk,
                                   synonym_topk, wildcard_topk)

N_DOCS = 200
K = 10
CFG = IndexConfig(segment_docs=64, block_size=16, n_term_partitions=8)
P = BM25Params()


@pytest.fixture(scope="module")
def corpus(spark):
    return prepare_docs(generate_web_pages(spark, N_DOCS, seed=11)).persist()


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("syn_idx"))
    build_index(spark, corpus, d, cfg=CFG, n_shards=2)
    return d


@pytest.fixture(scope="module")
def vocab(spark, index_dir):
    return sorted(r["term"] for r in
                  load_postings(spark, index_dir)
                  .select("term").distinct().collect())


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_singleton_clauses_equal_batch_topk(spark, index_dir, vocab):
    terms = vocab[:3]
    got = synonym_topk(spark, index_dir, [(0, list(terms))], P, k=K)
    want = batch_topk(spark, index_dir, [(0, terms)], P, k=K)
    assert _rows(got) == _rows(want)  # exact tuples incl. float64 scores


def _doc_stats(corpus):
    """[(doc_id, {term: tf}, dl_body, dl_kp, {kp term: tf})] + global."""
    rows = corpus.select("doc_id", "tokens", "keyphrases").collect()
    docs = []
    for r in rows:
        tf = {}
        for t in r["tokens"]:
            tf[t] = tf.get(t, 0) + 1
        kp_tf = {}
        for kp in r["keyphrases"] or []:
            for t in kp.split(" "):
                kp_tf[t] = kp_tf.get(t, 0) + 1
        docs.append((int(r["doc_id"]), tf, len(r["tokens"]),
                     sum(kp_tf.values()), kp_tf))
    return docs


def _py_synonym_scores(docs, clauses, n_docs, avgdl, kp_boost):
    """Reference blend: per clause and field, tf = Σ member tfs,
    df = max member GLOBAL df; score accumulates clause-by-clause,
    body before kp — the kernel's float order."""
    df_body = {}
    df_kp = {}
    for _, tf, _, _, kp_tf in docs:
        for t in tf:
            df_body[t] = df_body.get(t, 0) + 1
        for t in kp_tf:
            df_kp[t] = df_kp.get(t, 0) + 1
    scores = {}
    for did, tf, dl_b, dl_k, kp_tf in docs:
        s = 0.0
        for cl in clauses:
            members = [cl] if isinstance(cl, str) else sorted(set(cl))
            for field, dfs, tfs, dl, boost in (
                    (0, df_body, tf, dl_b, 1.0),
                    (1, df_kp, kp_tf, dl_k, kp_boost)):
                present = [m for m in members if m in dfs]
                if not present:
                    continue
                tsum = float(sum(tfs.get(m, 0) for m in members))
                if tsum == 0.0:
                    continue
                dmax = max(dfs[m] for m in present)
                tfn = (tsum * (P.k1 + 1.0)) / (
                    tsum + P.k1 * (1.0 - P.b + P.b * float(dl) / avgdl[field]))
                s += boost * (idf_fn(n_docs, dmax) * tfn)
        if s != 0.0:
            scores[did] = s
    return scores


def test_group_blend_matches_python_reference(spark, corpus, index_dir, vocab):
    clauses = [[vocab[0], vocab[1]], vocab[2], [vocab[3], "zzznothere"]]
    got = {int(r["doc_id"]): float(r["score"])
           for r in synonym_topk(spark, index_dir, [(0, clauses)], P,
                                 k=N_DOCS).collect()}
    docs = _doc_stats(corpus)
    n_docs = len(docs)
    avgdl = {0: sum(d[2] for d in docs) / n_docs,
             1: sum(d[3] for d in docs) / n_docs}
    want = _py_synonym_scores(docs, clauses, n_docs, avgdl, P.kp_boost)
    assert set(got) == set(want)
    for did, s in want.items():
        assert got[did] == pytest.approx(s, rel=1e-12), did


def test_group_ranks_differ_from_plain_or(spark, corpus, index_dir, vocab):
    # blending is a different scoring function than the OR of the members:
    # the group scores strictly fewer "clauses" — sanity that we are not
    # accidentally testing the identity
    group = [(0, [[vocab[0], vocab[1]]])]
    plain = [(0, [vocab[0], vocab[1]])]
    g = {r["doc_id"]: r["score"] for r in
         synonym_topk(spark, index_dir, group, P, k=K).collect()}
    b = {r["doc_id"]: r["score"] for r in
         batch_topk(spark, index_dir, plain, P, k=K).collect()}
    assert g and b and g != b


def test_all_oov_clause_empty(spark, index_dir):
    out = synonym_topk(spark, index_dir, [(0, [["zzza", "zzzb"]])], P, k=K)
    assert out.count() == 0


def test_wildcard_matches_python_regex_sweep(spark, index_dir, vocab):
    t = [x for x in vocab if len(x) >= 4][0]
    pats = [t[:2] + "*", "*" + t[-2:], t[:1] + "?" + t[2:], "zzz*"]
    queries = [(i, pat) for i, pat in enumerate(pats)]
    got = wildcard_topk(spark, index_dir, queries, P, k=K)
    expanded = []
    for i, pat in enumerate(pats):
        rx = re.compile(f"^{_wildcard_regex(pat)}$")
        terms = sorted(v for v in vocab if rx.match(v))
        if terms:
            expanded.append((i, terms))
    want = batch_topk(spark, index_dir, expanded, P, k=K)
    assert _rows(got) == _rows(want)


def test_wildcard_escapes_regex_metachars(spark, index_dir):
    # a pattern with regex metachars matches only literally — never
    # interpreted as regex syntax
    out = wildcard_topk(spark, index_dir, [(0, "a.c*")], P, k=K)
    assert out.count() == 0  # vocab has no literal "a.c" prefix


def test_wildcard_max_expansion_guard(spark, index_dir):
    with pytest.raises(ValueError, match="max_expansion"):
        wildcard_topk(spark, index_dir, [(0, "*")], P, k=K, max_expansion=1)


def test_wildcard_empty(spark, index_dir):
    assert wildcard_topk(spark, index_dir, [], P, k=K).count() == 0
    assert wildcard_topk(spark, index_dir, [(0, "zzzz*")], P, k=K).count() == 0
