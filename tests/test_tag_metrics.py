"""Tag-level (seqeval) metrics: golden conlleval cases, pure == DataFrame,
and the generation stand-in decode."""

import random

import pytest
from pyspark.sql import functions as F

from dlkp_spark.metrics import tag_level_metrics, tag_metrics_df, tag_spans


# --- span extraction golden cases (seqeval default/conlleval semantics) ----

def test_spans_basic():
    assert tag_spans(["B", "I", "O", "B"]) == [(0, 1), (3, 3)]


def test_spans_i_after_o_starts_chunk():
    # seqeval default: I following O begins a new chunk
    assert tag_spans(["O", "I", "I", "O"]) == [(1, 2)]


def test_spans_b_after_i_splits():
    assert tag_spans(["B", "I", "B", "I"]) == [(0, 1), (2, 3)]


def test_spans_leading_i_and_trailing_open():
    assert tag_spans(["I", "I"]) == [(0, 1)]
    assert tag_spans(["O", "B"]) == [(1, 1)]
    assert tag_spans([]) == []
    assert tag_spans(["O", "O"]) == []


def test_metrics_golden():
    # pred finds one of two gold spans exactly, plus one spurious
    pred = [["B", "I", "O", "B", "O"]]
    gold = [["B", "I", "O", "O", "B"]]
    m = tag_level_metrics(pred, gold)
    assert (m["n_pred"], m["n_gold"], m["n_matched"]) == (2, 2, 1)
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5
    assert m["accuracy"] == pytest.approx(3 / 5)


def test_metrics_boundary_mismatch_not_matched():
    # span boundaries must match EXACTLY (seqeval strict-boundary rule)
    m = tag_level_metrics([["B", "I", "I"]], [["B", "I", "O"]])
    assert m["n_matched"] == 0


# --- distributed == pure ----------------------------------------------------

def test_df_matches_pure_python(spark):
    rng = random.Random(7)
    docs = []
    for _ in range(60):
        n = rng.randint(1, 25)
        docs.append(([rng.choice("OOBI") for _ in range(n)],
                     [rng.choice("OOBI") for _ in range(n)]))
    rows = [(i, p, g) for i, (p, g) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, pred_tags array<string>, gold_tags array<string>")
    got = tag_metrics_df(df).collect()[0].asDict()
    want = tag_level_metrics([p for p, _ in docs], [g for _, g in docs])
    assert got["n_pred"] == want["n_pred"]
    assert got["n_gold"] == want["n_gold"]
    assert got["n_matched"] == want["n_matched"]
    for k in ("precision", "recall", "f1", "accuracy"):
        assert got[k] == pytest.approx(want[k], abs=1e-6), k


# --- generation stand-in ----------------------------------------------------

def test_generate_topk_decode(spark):
    from dlkp_spark.analysis.generation import generate_topk

    rows = [
        (0, "spark join spark join spark sql data x".split()),
        (1, "data a data a data b".split()),
        (2, "nothing here".split()),
    ]
    d = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = {r["doc_id"]: r for r in
           generate_topk(d, ["spark", "data"], k=2).collect()}
    # doc 0: "spark join" ×2 first; tie at ×1 between "data x" and
    # "spark sql" broken alphabetically → "data x"
    assert got[0]["generated"] == "spark join [KP_SEP] data x"
    assert got[0]["n_kps"] == 2
    # doc 1: "data a" ×2 beats "data b" ×1
    assert got[1]["generated"] == "data a [KP_SEP] data b"
    # doc 2 has no seed-anchored candidates → absent
    assert 2 not in got


def test_load_table_dispatch(spark, tmp_path):
    from dlkp_spark.corpus import load_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    pq = str(tmp_path / "t.parquet")
    js = str(tmp_path / "t.json")
    cv = str(tmp_path / "t.csv")
    df.write.parquet(pq)
    df.write.json(js)
    df.write.option("header", "true").csv(cv)
    assert load_table(spark, pq).count() == 2
    assert set(load_table(spark, js).columns) == {"id", "s"}
    got = load_table(spark, cv, schema="id long, s string").collect()
    assert sorted((r["id"], r["s"]) for r in got) == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError, match="unsupported"):
        load_table(spark, "/x/y.avro")
