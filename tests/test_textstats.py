"""Text-analysis operators: deterministic values on hand-checkable rows."""

import pytest

from dlkp_spark.pipeline.multimodal import attach_fake_payload, byte_histogram_features, decode_image
from dlkp_spark.pipeline.textstats import doc_fingerprint, langid, quality_features, token_counts_by


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the data query is fast", "s0"),
        (1, "der und nicht der und", "s0"),
        (2, "le les est le", "s1"),
        (3, "zz yy xx", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_langid_markers(spark, docs):
    got = {r["doc_id"]: r["pred_lang"] for r in langid(docs).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "en"}  # tie → en


def test_quality_features_values(spark, docs):
    r = {x["doc_id"]: x for x in quality_features(docs).collect()}[0]
    # "the data query is fast": 5 tokens, 22 chars, (22-4)/5 avg len
    assert r["n_tokens"] == 5 and r["n_chars"] == 22
    assert r["avg_token_len"] == pytest.approx(3.6)
    assert r["stopword_ratio"] == pytest.approx(0.4)  # the, is


def test_token_counts(spark, docs):
    got = {r["source"]: (r["n_docs"], r["ws_tokens"]) for r in token_counts_by(docs).collect()}
    assert got["s0"] == (2, 10) and got["s1"] == (2, 7)


def test_fingerprint_deterministic_and_rolling(spark, docs):
    a = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(docs).collect()}
    assert a == b
    # pure-python mirror for doc 3: "zz yy xx"
    acc = 0
    for t in ["zz", "yy", "xx"]:
        acc = (acc * 1000003 + (len(t) * 131 + ord(t[0]))) % 2147483647
    assert a[3] == acc


def test_multimodal_plumbing(spark, docs):
    media = attach_fake_payload(docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert rows[0]["payload"] == b"the data query is fast"
    assert rows[0]["meta"]["codec"] == "raw"
    feats = {r["doc_id"]: r for r in byte_histogram_features(media).collect()}
    assert feats[0]["n_bytes"] == 22
    # "the data query is fast": bins = codepoint>>4 → lowercase (6,7), space (2)
    assert feats[0]["n_bins_used"] == 3
    assert feats[0]["top_bin"] == 6
    # 14 bytes in bin 6 (a,d,e,f,h,i,q,r,s,t,u,y occurrences ≥ 0x60)
    assert feats[0]["top_frac"] == pytest.approx(
        sum(1 for c in b"the data query is fast" if c >> 4 == 6) / 22, abs=1e-6)


def test_multimodal_features_empty_text_matches_oracle(spark):
    """ADVICE r3 #2: DuckDB string_split('', '') yields one '' element, so
    the naive oracle disagreed with the Spark kernel (zero bytes) on
    empty-text docs. The guarded SQL_MULTIMODAL_FEATURES (WHERE
    length(text) > 0 + LEFT JOIN defaults) must agree with the kernel on a
    corpus that actually CONTAINS an empty document — the driver testdata
    has none, so this pins the branch."""
    import duckdb
    import pandas as pd

    from dlkp_spark.contract import SQL_MULTIMODAL_FEATURES

    rows = [(0, "the data query is fast", "s0"), (1, "", "s0"), (2, "xyz", "s1")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = (byte_histogram_features(attach_fake_payload(docs))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    want = (con.execute(SQL_MULTIMODAL_FEATURES).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert got[c].astype(float).tolist() == pytest.approx(
            want[c].astype(float).tolist(), abs=1e-9), f"column {c} diverges"
    empty = got[got.doc_id == 1].iloc[0]
    assert (empty.n_bytes, empty.top_bin, empty.top_frac, empty.n_bins_used) \
        == (0, 0, 0.0, 0)


def test_decode_stub_raises(spark, docs):
    with pytest.raises(NotImplementedError, match="stubbed"):
        decode_image(attach_fake_payload(docs))


# -- Gopher-style repetition stats (round 5) --------------------------------

def _py_rep(text: str):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    bis = [" ".join(toks[i:i + 2]) for i in range(n - 1)]
    tris = [" ".join(toks[i:i + 3]) for i in range(n - 2)]
    from collections import Counter
    bc, tc = Counter(bis), Counter(tris)
    dup_word = round(1.0 - len(set(toks)) / n, 6) if n else 0.0
    top_bi = round(max(bc.values()) / len(bis), 6) if bis else 0.0
    dup_tri = (round(sum(c for c in tc.values() if c > 1) / len(tris), 6)
               if tris else 0.0)
    return n, dup_word, top_bi, dup_tri


REP_DOCS = [
    (0, "spam spam spam spam spam spam"),              # maximal repetition
    (1, "all words here are fully distinct tokens"),   # no repetition
    (2, "a b a b a b a b c"),                          # periodic bigrams
    (3, "x y z x y z q r s t u v"),                    # one duplicated trigram
    (4, "one two"),                                    # too short for trigrams
    (5, "solo"),                                       # too short for bigrams
    (6, ""),                                           # empty
]


def test_repetition_stats_matches_bruteforce(spark):
    from dlkp_spark.pipeline.textstats import repetition_stats

    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["dup_word_frac"],
                         r["top_bigram_frac"], r["dup_trigram_frac"])
           for r in repetition_stats(df).collect()}
    for doc_id, text in REP_DOCS:
        assert got[doc_id] == _py_rep(text), (doc_id, text)
    # sanity on the extremes the filter exists to separate
    assert got[0][1] > 0.8 and got[0][2] == 1.0
    assert got[1][1] == 0.0 and got[1][3] == 0.0


def test_repetition_stats_is_scan_local(spark):
    from dlkp_spark.pipeline.textstats import repetition_stats

    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "per-doc stats must not shuffle"
