"""Subword label alignment (M4) — reference extraction.py:141-183 parity —
and sortish batching (O5) invariance."""

import pytest

from dlkp_spark.analysis.align import (
    IGNORE,
    LABEL_TO_ID,
    align_labels,
    subword_split,
    with_aligned_labels,
)


def test_subword_split_marks_continuations():
    assert subword_split("cat") == ["cat"]
    assert subword_split("w0001") == ["w000", "##1"]
    assert subword_split("abcdefghij") == ["abcd", "##efgh", "##ij"]


def test_special_tokens_get_ignore_label():
    r = align_labels(["cat"], ["B"])
    assert r["subwords"] == ["[CLS]", "cat", "[SEP]"]
    assert r["word_ids"] == [None, 0, None]
    assert r["label_ids"] == [IGNORE, LABEL_TO_ID["B"], IGNORE]


def test_first_subword_carries_label_rest_ignore():
    # default label_all_tokens=False: continuation subwords → -100
    r = align_labels(["extraction"], ["B"])
    assert r["subwords"] == ["[CLS]", "extr", "##acti", "##on", "[SEP]"]
    assert r["label_ids"] == [IGNORE, LABEL_TO_ID["B"], IGNORE, IGNORE, IGNORE]


def test_label_all_tokens_continuations_become_I():
    # reference :166-177 — B/I words propagate I to continuation subwords,
    # O words propagate O
    r = align_labels(["extraction", "keyphrases"], ["B", "O"],
                     label_all_tokens=True)
    b, i, o = LABEL_TO_ID["B"], LABEL_TO_ID["I"], LABEL_TO_ID["O"]
    assert r["label_ids"] == [IGNORE, b, i, i, o, o, o, IGNORE]


def test_truncation_keeps_final_sep():
    r = align_labels(["abcdefgh", "ijklmnop"], ["B", "I"], max_seq_len=4)
    assert len(r["subwords"]) == 4
    assert r["subwords"][0] == "[CLS]" and r["subwords"][-1] == "[SEP]"
    assert r["label_ids"][-1] == IGNORE


def test_with_aligned_labels_spark_matches_pure(spark):
    rows = [(i, ["keyphrase", "extraction", "is", "fun"],
             ["B", "I", "O", "O"]) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, tokens array<string>, tags array<string>")
    out = with_aligned_labels(df, label_all_tokens=True).collect()
    want = align_labels(["keyphrase", "extraction", "is", "fun"],
                        ["B", "I", "O", "O"], label_all_tokens=True)
    for r in out:
        assert list(r["subwords"]) == want["subwords"]
        assert list(r["label_ids"]) == want["label_ids"]
        assert list(r["word_ids"]) == [-1 if w is None else w
                                       for w in want["word_ids"]]


def test_sortish_batching_identical_results(spark):
    """O5: sortish batch composition must not change per-row outputs."""
    from dlkp_spark.analysis.keyphrase import with_keyphrases

    rows = [(i, [f"w{(i * 13 + j) % 97:04d}" for j in range((i % 40) + 1)])
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    plain = {r["doc_id"]: (list(r["keyphrases"]), list(r["kp_scores"]))
             for r in with_keyphrases(docs).collect()}
    sortish = {r["doc_id"]: (list(r["keyphrases"]), list(r["kp_scores"]))
               for r in with_keyphrases(docs, sortish=True).collect()}
    assert plain == sortish
