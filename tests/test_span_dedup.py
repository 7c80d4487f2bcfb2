"""Cross-document duplicate-span removal: brute-force parity + semantics."""

import random

from dlkp_spark.pipeline.dedup import span_dedup

PLANTED = [
    (0, "a b c d e f g h"),   # first occurrence of "c d e f g" -> keeper
    (1, "x y c d e f g z"),   # non-keeper occurrence -> span removed
    (2, "c d e f g"),         # whole doc is the duplicated span
    (3, "short doc"),         # < k tokens: passes through
    (4, ""),                  # empty: passes through
    (5, "a b c d e f g h"),   # exact dup of doc 0: fully removed
]


def _py_span_dedup(docs, k):
    occ, toks_by = {}, {}
    for doc_id, text in docs:
        ts = text.split()
        toks_by[doc_id] = ts
        for i in range(len(ts) - k + 1):
            occ.setdefault(" ".join(ts[i:i + k]), []).append((doc_id, i))
    covered = {d: set() for d, _ in docs}
    for lst in occ.values():
        if len(lst) >= 2:
            keep = min(lst)
            for d, i in lst:
                if (d, i) != keep:
                    covered[d].update(range(i, i + k))
    out = {}
    for doc_id, _ in docs:
        ts = toks_by[doc_id]
        kept = [t for p, t in enumerate(ts) if p not in covered[doc_id]]
        out[doc_id] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def _run(spark, docs, k):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["dedup_text"])
            for r in span_dedup(df, k=k).collect()}


def test_planted_spans(spark):
    got = _run(spark, PLANTED, 5)
    assert got == _py_span_dedup(PLANTED, 5)
    assert got[0] == (8, 0, "a b c d e f g h")  # keeper untouched
    assert got[1] == (8, 5, "x y z")
    assert got[2] == (5, 5, "")
    assert got[3] == (2, 0, "short doc")
    assert got[4] == (0, 0, "")
    assert got[5] == (8, 8, "")


def test_random_corpus_matches_brute_force(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(8)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 40))))
            for i in range(60)]
    for k in (3, 5):
        assert _run(spark, docs, k) == _py_span_dedup(docs, k)


def test_within_doc_repeats_keep_first(spark):
    # the same span twice in ONE doc: second occurrence removed
    docs = [(0, "p q r s t u p q r s t v")]
    got = _run(spark, docs, 5)
    # grams: "p q r s t" at pos 0 and pos 6 -> pos 6..10 covered
    assert got[0] == (12, 5, "p q r s t u v")


def test_plan_has_no_window_or_cartesian(spark):
    # the keeper rule is an agg + join-back, NOT a per-gram window (no
    # per-key buffering of a mega-duplicated gram), and nothing is
    # all-pairs
    df = spark.createDataFrame(PLANTED, "doc_id long, text string")
    plan = span_dedup(df, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
