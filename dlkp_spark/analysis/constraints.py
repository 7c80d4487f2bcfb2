"""CRF tag-transition constraint schemes: BIO, IOB1, BIOUL, BMES.

Behavioral parity with the reference's allowed-transition masking
(/root/reference/src/dlkp/extraction/crf_utils.py:17-159
``allowed_transitions`` / ``is_transition_allowed``), re-expressed as a
data-driven rule table instead of the reference's predicate cascade.
The reference's own label space is the fixed 3-tag BIO vocabulary, so the
engine's Viterbi path defaults to BIO — these masks exist so a caller
with an IOB1/BIOUL/BMES-tagged model gets the same constrained decode
the reference CRF would apply (crf.py:60-88 builds its banned-transition
potentials from exactly these pair sets).

A label is "O" or "<TAG>-<entity>" (e.g. "B-KP"); single-letter labels
like "B" are tag-only with an empty entity, matching the reference's
``label[0]`` / ``label[1:]`` split. START/END are virtual boundary states
appended after the real labels (ids n and n+1).
"""

from __future__ import annotations

ANY = "*"

# scheme -> (start_tags, end_tags, rules); each rule is
# (src_tags, dst_tags, same_entity_required). A transition src->dst is
# allowed iff some rule matches; START/END are handled by start/end sets.
_SCHEMES: dict[str, tuple[set[str], set[str], list[tuple[str, str, bool]]]] = {
    "BIO": ({"O", "B"}, {"O", "B", "I"},
            [(ANY, "OB", False), ("BI", "I", True)]),
    "IOB1": ({"O", "I"}, {"O", "B", "I"},
             [(ANY, "OI", False), ("BI", "B", True)]),
    "BIOUL": ({"O", "B", "U"}, {"O", "L", "U"},
              [("OLU", "OBU", False), ("BI", "IL", True)]),
    "BMES": ({"B", "S"}, {"E", "S"},
             [("ES", "BS", False), ("BM", "M", True), ("BM", "E", True)]),
}


def _tag_entity(label: str) -> tuple[str, str]:
    return label[0], label[1:]


def transition_allowed(scheme: str, src: str, dst: str) -> bool:
    """Is the tag transition ``src -> dst`` legal under ``scheme``?

    ``src``/``dst`` are label strings, or the virtual "START"/"END".
    """
    if scheme not in _SCHEMES:
        raise ValueError(f"unknown constraint scheme: {scheme!r}")
    start_tags, end_tags, rules = _SCHEMES[scheme]
    if dst == "START" or src == "END":
        return False
    if src == "START":
        return dst != "END" and _tag_entity(dst)[0] in start_tags
    if dst == "END":
        return _tag_entity(src)[0] in end_tags
    s_tag, s_ent = _tag_entity(src)
    d_tag, d_ent = _tag_entity(dst)
    for src_set, dst_set, need_same in rules:
        if (src_set == ANY or s_tag in src_set) and d_tag in dst_set:
            if not need_same or s_ent == d_ent:
                return True
    return False


def allowed_transitions(scheme: str, labels: dict[int, str]) -> list[tuple[int, int]]:
    """All legal (from_id, to_id) pairs, START/END included as ids
    ``len(labels)`` and ``len(labels)+1`` — same contract as the
    reference's crf_utils.allowed_transitions."""
    n = len(labels)
    with_bounds = list(labels.items()) + [(n, "START"), (n + 1, "END")]
    return [(i, j) for i, a in with_bounds for j, b in with_bounds
            if transition_allowed(scheme, a, b)]


def transition_arrays(scheme: str, labels: dict[int, str], neg: float = -10000.0):
    """(transitions[n,n], start[n], end[n]) numpy potentials for the
    Viterbi kernels: 0 where allowed, ``neg`` where banned — the same
    large-negative-potential banning the reference CRF applies
    (crf.py:60-88)."""
    import numpy as np

    n = len(labels)
    allowed = set(allowed_transitions(scheme, labels))
    trans = np.full((n, n), neg)
    start = np.full(n, neg)
    end = np.full(n, neg)
    for i in range(n):
        if (n, i) in allowed:
            start[i] = 0.0
        if (i, n + 1) in allowed:
            end[i] = 0.0
        for j in range(n):
            if (i, j) in allowed:
                trans[i, j] = 0.0
    return trans, start, end
