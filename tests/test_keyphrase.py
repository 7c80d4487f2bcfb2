"""BIO→span decode semantics mirrored from the reference state machine
(/root/reference/src/dlkp/datasets/extraction.py:316-377)."""

import pytest

from dlkp_spark.analysis.keyphrase import (
    calculate_confidence_score,
    extract_kp_from_tags,
    tag_and_extract,
    tag_tokens,
)


def test_basic_spans():
    toks = ["neural", "networks", "are", "fun"]
    tags = ["B", "I", "O", "O"]
    kps, _ = extract_kp_from_tags(toks, tags)
    assert kps == ["neural networks"]


def test_b_after_b_restarts_span():
    toks = ["a", "b", "c"]
    tags = ["B", "B", "I"]
    kps, _ = extract_kp_from_tags(toks, tags)
    assert kps == ["a", "b c"]


def test_trailing_open_span_emitted():
    toks = ["x", "deep", "learning"]
    tags = ["O", "B", "I"]
    kps, _ = extract_kp_from_tags(toks, tags)
    assert kps == ["deep learning"]


def test_i_without_b_starts_accumulating():
    # Reference quirk: 'I' appends unconditionally even with no open span.
    toks = ["alpha", "beta", "gamma"]
    tags = ["I", "I", "O"]
    kps, _ = extract_kp_from_tags(toks, tags)
    assert kps == ["alpha beta"]


def test_all_O_yields_nothing():
    kps, scores = extract_kp_from_tags(["a", "b"], ["O", "O"])
    assert kps == [] and scores is None


def test_lowercase_first_wins_dedup():
    toks = ["Deep", "Learning", "x", "deep", "learning"]
    tags = ["B", "I", "O", "B", "I"]
    kps, _ = extract_kp_from_tags(toks, tags)
    assert kps == ["deep learning"]


def test_confidence_methods():
    toks = ["a", "b", "x", "c"]
    tags = ["B", "I", "O", "B"]
    scores = [0.9, 0.5, 0.1, 0.7]
    kps, s = extract_kp_from_tags(toks, tags, scores, "avg")
    assert kps == ["a b", "c"]
    assert s == [pytest.approx(0.7), pytest.approx(0.7)]
    _, s = extract_kp_from_tags(toks, tags, scores, "max")
    assert s == [0.9, 0.7]
    _, s = extract_kp_from_tags(toks, tags, scores, "first")
    assert s == [0.9, 0.7]


def test_dedup_keeps_first_score():
    toks = ["a", "z", "A"]
    tags = ["B", "O", "B"]
    scores = [0.9, 0.0, 0.3]
    kps, s = extract_kp_from_tags(toks, tags, scores, "avg")
    assert kps == ["a"]
    assert s == [pytest.approx(0.9)]


def test_confidence_score_methods_match_reference():
    assert calculate_confidence_score([0.2, 0.4], "avg") == pytest.approx(0.3)
    assert calculate_confidence_score([0.2, 0.4], "max") == 0.4
    assert calculate_confidence_score([0.2, 0.4], "first") == 0.2


def test_tagger_deterministic():
    toks = ["w0001", "w0002", "w0003"] * 5
    t1 = tag_tokens(toks)
    t2 = tag_tokens(list(toks))
    assert t1 == t2
    assert all(t in ("B", "I", "O") for t in t1[0])
    assert all(0.5 <= s < 1.0 for s in t1[1])


def test_tagger_i_only_as_continuation():
    tags, _ = tag_tokens(["w0000"] * 3)
    # whatever the bucket, the first tag can never be I
    assert tags[0] != "I"


def test_tag_and_extract_end_to_end():
    # find a vocab slice that yields at least one keyphrase
    toks = [f"w{i:04d}" for i in range(200)]
    kps, scores = tag_and_extract(toks)
    assert len(kps) == len(scores)
    assert len(kps) > 0  # with 200 tokens and B-prob ~1/11 this must fire
    assert kps == [k.lower() for k in kps]


def test_with_keyphrases_spark(spark):
    from dlkp_spark.analysis.keyphrase import with_keyphrases

    toks = [f"w{i:04d}" for i in range(100)]
    df = spark.createDataFrame([(0, toks), (1, toks[:10])], "doc_id long, tokens array<string>")
    out = with_keyphrases(df).orderBy("doc_id").collect()
    expected0 = tag_and_extract(toks)
    assert out[0]["keyphrases"] == expected0[0]
    assert out[0]["kp_scores"] == pytest.approx(expected0[1], abs=1e-6)
    assert out[1]["doc_id"] == 1
