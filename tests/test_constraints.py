"""Constraint-scheme transition masks (reference crf_utils.py:17-159
parity): the engine's rule-table formulation must produce the exact pair
sets of the reference's predicate cascade, which is re-derived
independently here as the test oracle.
"""

import numpy as np
import pytest

from dlkp_spark.analysis.constraints import (
    allowed_transitions,
    transition_allowed,
    transition_arrays,
)


def oracle_is_allowed(scheme, from_tag, from_entity, to_tag, to_entity):
    """Independent port of the reference predicate cascade
    (crf_utils.is_transition_allowed) used ONLY as a test oracle."""
    if to_tag == "START" or from_tag == "END":
        return False
    if scheme == "BIOUL":
        if from_tag == "START":
            return to_tag in ("O", "B", "U")
        if to_tag == "END":
            return from_tag in ("O", "L", "U")
        return any([
            from_tag in ("O", "L", "U") and to_tag in ("O", "B", "U"),
            from_tag in ("B", "I") and to_tag in ("I", "L")
            and from_entity == to_entity,
        ])
    if scheme == "BIO":
        if from_tag == "START":
            return to_tag in ("O", "B")
        if to_tag == "END":
            return from_tag in ("O", "B", "I")
        return any([
            to_tag in ("O", "B"),
            to_tag == "I" and from_tag in ("B", "I") and from_entity == to_entity,
        ])
    if scheme == "IOB1":
        if from_tag == "START":
            return to_tag in ("O", "I")
        if to_tag == "END":
            return from_tag in ("O", "B", "I")
        return any([
            to_tag in ("O", "I"),
            to_tag == "B" and from_tag in ("B", "I") and from_entity == to_entity,
        ])
    if scheme == "BMES":
        if from_tag == "START":
            return to_tag in ("B", "S")
        if to_tag == "END":
            return from_tag in ("E", "S")
        return any([
            to_tag in ("B", "S") and from_tag in ("E", "S"),
            to_tag == "M" and from_tag in ("B", "M") and from_entity == to_entity,
            to_tag == "E" and from_tag in ("B", "M") and from_entity == to_entity,
        ])
    raise ValueError(scheme)


def oracle_allowed_transitions(scheme, labels):
    n = len(labels)
    with_bounds = list(labels.items()) + [(n, "START"), (n + 1, "END")]
    out = []
    for i, a in with_bounds:
        a_tag, a_ent = (a, "") if a in ("START", "END") else (a[0], a[1:])
        for j, b in with_bounds:
            b_tag, b_ent = (b, "") if b in ("START", "END") else (b[0], b[1:])
            if oracle_is_allowed(scheme, a_tag, a_ent, b_tag, b_ent):
                out.append((i, j))
    return out


VOCABS = [
    {0: "O", 1: "B", 2: "I"},                               # the engine default
    {0: "O", 1: "B-KP", 2: "I-KP"},
    {0: "O", 1: "B-KP", 2: "I-KP", 3: "B-LOC", 4: "I-LOC"},  # multi-entity
    {0: "O", 1: "B-X", 2: "I-X", 3: "L-X", 4: "U-X"},
    {0: "B-W", 1: "M-W", 2: "E-W", 3: "S-W", 4: "B-V", 5: "M-V",
     6: "E-V", 7: "S-V"},
]


@pytest.mark.parametrize("scheme", ["BIO", "IOB1", "BIOUL", "BMES"])
@pytest.mark.parametrize("vocab_i", range(len(VOCABS)))
def test_allowed_transitions_match_reference_semantics(scheme, vocab_i):
    labels = VOCABS[vocab_i]
    assert sorted(allowed_transitions(scheme, labels)) == \
        sorted(oracle_allowed_transitions(scheme, labels))


def test_unknown_scheme_raises():
    with pytest.raises(ValueError):
        transition_allowed("BILOU", "O", "O")


def test_bio_arrays_match_engine_hardcoded_params():
    """The generic BIO mask must agree with the engine's hand-built 3-tag
    CRF potentials (keyphrase._crf_params) wherever both define them."""
    from dlkp_spark.analysis.keyphrase import _crf_params

    trans, start, _end = transition_arrays("BIO", {0: "O", 1: "B", 2: "I"})
    eng_trans, eng_start = _crf_params()
    assert (trans == eng_trans).all()
    assert (start == eng_start).all()


def test_constrained_viterbi_respects_bmes():
    from dlkp_spark.analysis.keyphrase import viterbi_decode_topk

    labels = {0: "B-W", 1: "M-W", 2: "E-W", 3: "S-W"}
    trans, start, _end = transition_arrays("BMES", labels)
    rng = np.random.Generator(np.random.PCG64(3))
    logits = rng.standard_normal((10, 4))
    for path, score in viterbi_decode_topk(logits, trans, start, top_k=3):
        assert score > -5000  # no banned move taken
        assert labels[path[0]][0] in ("B", "S")
        for prev, cur in zip(path, path[1:]):
            assert transition_allowed("BMES", labels[prev], labels[cur])
