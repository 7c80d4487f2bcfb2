"""PII redaction: python-re parity, rule ordering, idempotence."""

import re

from dlkp_spark.pipeline.pii import PII_RULES, redact_pii

DOCS = [
    (0, "mail bob.smith+x@corp.example.COM and alice@ex.org today"),
    (1, "server 192.168.001.1 peer 10.0.0.7 done"),
    (2, "call 555-123-4567 or 555 987 6543 now"),
    (3, "mixed a@b.io from 8.8.8.8 dial 800-555-0199"),
    (4, "no pii here at all"),
    (5, ""),
    (6, "already <EMAIL> and <IP> stay put"),
    (7, "edge 999.999.999.999 and 12.3.4.5x"),  # \b still matches digits-run
]


def _py_redact(text):
    out, counts = text, {}
    for name, pat, tok in PII_RULES:
        counts[f"n_{name}"] = len(re.findall(pat, out))
        out = re.sub(pat, tok, out)
    return counts, out


def test_matches_python_re(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    for doc_id, text in DOCS:
        counts, clean = _py_redact(text)
        row = got[doc_id]
        assert row["clean_text"] == clean, (doc_id, row["clean_text"], clean)
        for k, v in counts.items():
            assert row[k] == v, (doc_id, k, row[k], v)


def test_email_digits_do_not_count_as_phone(spark):
    df = spark.createDataFrame([(0, "x 555-123-4567@ex.org y")],
                               "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    assert (r["n_email"], r["n_phone"]) == (1, 0)
    assert r["clean_text"] == "x <EMAIL> y"


def test_idempotent(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    once = redact_pii(df)
    twice = redact_pii(once, text_col="clean_text")
    for r in twice.collect():
        assert r["n_email"] == r["n_ipv4"] == r["n_phone"] == 0


def test_scan_local_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "redaction must not shuffle"
