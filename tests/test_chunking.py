"""Sliding-window chunking: python parity + boundary semantics."""

import pytest

from dlkp_spark.pipeline.sampling import chunk_documents

DOCS = [
    (0, " ".join(f"t{i}" for i in range(100))),  # several chunks
    (1, " ".join(f"u{i}" for i in range(32))),   # exactly one chunk
    (2, " ".join(f"v{i}" for i in range(33))),   # one token past -> 2 chunks
    (3, "a b c"),                                # n <= overlap -> one chunk
    (4, ""),                                     # empty -> none
    (5, " ".join(f"w{i}" for i in range(40))),   # trailing remainder chunk
]


def _py_chunks(text, chunk, ov):
    ts = text.split()
    if not ts:
        return []
    out = []
    for i, s in enumerate(range(0, max(len(ts) - ov, 1), chunk - ov)):
        w = ts[s:s + chunk]
        out.append((i, len(w), " ".join(w)))
    return out


def test_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=32, overlap=8).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"]))
    for d in got:
        got[d].sort()
    exp = {d: _py_chunks(t, 32, 8) for d, t in DOCS if t.split()}
    assert got == exp


def test_overlap_is_carried(spark):
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    rows = sorted((r["chunk_id"], r["chunk_text"])
                  for r in chunk_documents(df, chunk_tokens=32, overlap=8).collect())
    first, second = rows[0][1].split(), rows[1][1].split()
    assert first[-8:] == second[:8]  # 8-token overlap between neighbors


def test_no_redundant_trailing_chunk(spark):
    # 32 tokens, chunk 32, overlap 8: starts range over [0, 24) -> ONE chunk
    df = spark.createDataFrame([DOCS[1]], "doc_id long, text string")
    assert chunk_documents(df, chunk_tokens=32, overlap=8).count() == 1


def test_bad_overlap_rejected(spark):
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    with pytest.raises(AssertionError):
        chunk_documents(df, chunk_tokens=32, overlap=32)


def test_scan_local_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "chunking must not shuffle"
