"""Single-process pure-Python reference engine (the rank-identity oracle).

Builds an exact in-memory inverted index (body + keyphrase fields) over a
document list using the *same* tokenizer and stand-in tagger as the Spark
engine, and scores BM25 (k1=1.2, b=0.75, kp field boost) with a fixed,
documented order of floating-point operations: terms in sorted unique order,
body contribution before keyphrase contribution, float64 throughout. The
Spark engine commits to the same order, so top-k results must be
rank-identical (tie-break: score desc, doc_id asc).

This plays the role of the reference engine in BASELINE.json north_rule
("matching the reference's top-k docIDs and BM25 scores (rank-identical) on
the reference query set").
"""

from __future__ import annotations


from collections import Counter
from dataclasses import dataclass, field

from dlkp_spark.analysis.analyzer import tokenize_py
from dlkp_spark.analysis.keyphrase import tag_and_extract
from dlkp_spark.config import FIELD_BODY, FIELD_KP, BM25Params


def kp_field_tokens(tokens: list[str]) -> list[str]:
    """Keyphrase-field token stream for a doc: tokens of every extracted
    keyphrase, in extraction order (phrases are themselves token sequences,
    so multi-word phrases contribute each constituent term)."""
    kps, _ = tag_and_extract(tokens)
    out: list[str] = []
    for kp in kps:
        out.extend(kp.split(" "))
    return out


@dataclass
class OracleIndex:
    n_docs: int = 0
    doclen: dict = field(default_factory=dict)   # field -> {doc_id: len}
    avgdl: dict = field(default_factory=dict)    # field -> float
    postings: dict = field(default_factory=dict)  # field -> {term: {doc_id: tf}}


def build_oracle_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: [(doc_id, text)] → exact index over body + kp fields."""
    idx = OracleIndex()
    idx.doclen = {FIELD_BODY: {}, FIELD_KP: {}}
    idx.postings = {FIELD_BODY: {}, FIELD_KP: {}}
    for doc_id, text in docs:
        toks = tokenize_py(text)
        streams = {FIELD_BODY: toks, FIELD_KP: kp_field_tokens(toks)}
        for f, stream in streams.items():
            idx.doclen[f][doc_id] = len(stream)
            for term, tf in Counter(stream).items():
                idx.postings[f].setdefault(term, {})[doc_id] = tf
    idx.n_docs = len(docs)
    idx.avgdl = {
        f: (sum(d.values()) / len(d) if d else 0.0) for f, d in idx.doclen.items()
    }
    return idx


def idf(n_docs: int, df: int) -> float:
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5)).

    Uses scalar ``np.log`` — np.log and math.log differ by 1 ulp on some
    inputs, so oracle and Spark-side kernels share THIS function to stay
    bit-exact.
    """
    import numpy as np

    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def tf_norm(tf: int, dl: int, avgdl: float, p: BM25Params) -> float:
    return (tf * (p.k1 + 1.0)) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))


def bm25_topk(idx: OracleIndex, terms: list[str], p: BM25Params | None = None,
              k: int | None = None) -> list[tuple[int, int, float]]:
    """Top-k [(rank, doc_id, score)] — exact, deterministic.

    Accumulation order: for each doc, iterate query terms in sorted unique
    order; per term add body contribution then kp_boost * kp contribution.
    """
    p = p or BM25Params()
    k = k or p.k
    uniq = sorted(set(terms))
    scores: dict[int, float] = {}
    for term in uniq:
        for f, boost in ((FIELD_BODY, 1.0), (FIELD_KP, p.kp_boost)):
            plist = idx.postings[f].get(term)
            if not plist:
                continue
            t_idf = idf(idx.n_docs, len(plist))
            avg = idx.avgdl[f]
            for doc_id, tf in plist.items():
                # parenthesized to match the kernel's float op order:
                # (idf * tf_norm) computed first, boost applied after
                contrib = boost * (t_idf * tf_norm(tf, idx.doclen[f][doc_id], avg, p))
                scores[doc_id] = scores.get(doc_id, 0.0) + contrib
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(r + 1, doc_id, s) for r, (doc_id, s) in enumerate(ranked)]


def reference_query_set(seed: int = 42, n_queries: int = 50) -> list[tuple[int, list[str]]]:
    """Deterministic query set mixing head/mid/rare vocabulary terms and
    known-keyphrase terms (FIXTURES.md §4), plus one OOV term."""
    import hashlib

    from dlkp_spark.corpus import KNOWN_KEYPHRASES, vocab

    v = vocab()
    kp_terms = sorted({t for kp in KNOWN_KEYPHRASES for t in kp.split()})
    queries: list[tuple[int, list[str]]] = []
    for qid in range(n_queries):
        h = hashlib.blake2b(f"q:{seed}:{qid}".encode(), digest_size=16).digest()
        n_terms = 1 + h[0] % 4
        terms = []
        for j in range(n_terms):
            sel = h[1 + j] % 10
            if sel < 4:           # head term
                terms.append(v[h[5 + j] % 20])
            elif sel < 7:         # mid term
                terms.append(v[20 + (h[5 + j] * 7) % 300])
            elif sel < 9:         # rare term
                terms.append(v[320 + (h[5 + j] * 13) % (len(v) - 320)])
            else:                 # keyphrase term
                terms.append(kp_terms[h[5 + j] % len(kp_terms)])
        if qid == n_queries - 1:
            terms.append("zzzoutofvocab")  # empty-postings path
        queries.append((qid, terms))
    return queries
