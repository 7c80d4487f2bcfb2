"""Viterbi decode (reference crf_utils.py:187-294 / crf.py:197-294 parity):
golden hand-computed cases, brute-force enumeration equality, BIO
constraint enforcement, and the Spark decode='viterbi' path.
"""

from itertools import product

import numpy as np
import pytest

from dlkp_spark.analysis.keyphrase import (
    _crf_params,
    crf_log_likelihood,
    tag_tokens_viterbi,
    token_potentials,
    viterbi_decode_np,
)

NEG = -10000.0


def brute_force(logits, transitions, start=None):
    """Enumerate every tag path — the oracle the DP must match."""
    n, k = logits.shape
    best_path, best_score = None, -np.inf
    for path in product(range(k), repeat=n):
        s = logits[0][path[0]] + (start[path[0]] if start is not None else 0.0)
        for t in range(1, n):
            s += transitions[path[t - 1], path[t]] + logits[t][path[t]]
        # strict > keeps the FIRST maximal path in lexicographic order,
        # matching argmax/torch.max first-index tie-breaking
        if s > best_score:
            best_score, best_path = s, list(path)
    return best_path, float(best_score)


def test_viterbi_golden_simple():
    # two steps, no constraints: picks per-step argmax when transitions=0
    logits = np.array([[1.0, 2.0, 0.0], [0.0, 0.5, 3.0]])
    path, score = viterbi_decode_np(logits, np.zeros((3, 3)))
    assert path == [1, 2]
    assert score == pytest.approx(5.0)


def test_viterbi_golden_transition_flip():
    # greedy would take tag1 at t0, but the transition penalty makes the
    # globally-best path go through tag0
    logits = np.array([[1.0, 1.1], [0.0, 5.0]])
    trans = np.array([[0.0, 0.0], [0.0, NEG]])
    path, _ = viterbi_decode_np(logits, trans)
    assert path == [0, 1]


@pytest.mark.parametrize("seed", range(10))
def test_viterbi_matches_brute_force(seed):
    rng = np.random.Generator(np.random.PCG64(seed))
    n = int(rng.integers(1, 7))
    logits = rng.standard_normal((n, 3))
    trans, start = _crf_params()
    got = viterbi_decode_np(logits, trans, start)
    want = brute_force(logits, trans, start)
    assert got[0] == want[0]
    assert got[1] == pytest.approx(want[1])


@pytest.mark.parametrize("seed", range(5))
def test_viterbi_matches_brute_force_random_transitions(seed):
    rng = np.random.Generator(np.random.PCG64(100 + seed))
    n = int(rng.integers(2, 6))
    k = int(rng.integers(2, 5))
    logits = rng.standard_normal((n, k))
    trans = rng.standard_normal((k, k))
    got = viterbi_decode_np(logits, trans)
    want = brute_force(logits, trans)
    assert got[0] == want[0]
    assert got[1] == pytest.approx(want[1])


def brute_force_topk(logits, transitions, start=None, top_k=1):
    """All paths scored and ranked (score desc, path lex asc) — the k-best
    oracle."""
    n, k = logits.shape
    scored = []
    for path in product(range(k), repeat=n):
        s = logits[0][path[0]] + (start[path[0]] if start is not None else 0.0)
        for t in range(1, n):
            s += transitions[path[t - 1], path[t]] + logits[t][path[t]]
        scored.append((list(path), float(s)))
    scored.sort(key=lambda ps: (-ps[1], ps[0]))
    return scored[:top_k]


@pytest.mark.parametrize("seed", range(10))
def test_viterbi_topk_matches_brute_force(seed):
    from dlkp_spark.analysis.keyphrase import viterbi_decode_topk

    rng = np.random.Generator(np.random.PCG64(200 + seed))
    n = int(rng.integers(1, 7))
    k = int(rng.integers(2, 5))
    logits = rng.standard_normal((n, k))
    trans = rng.standard_normal((k, k))
    top_k = int(rng.integers(1, 6))
    got = viterbi_decode_topk(logits, trans, top_k=top_k)
    want = brute_force_topk(logits, trans, top_k=top_k)
    assert len(got) == min(top_k, k ** n)
    # continuous random potentials → ties measure-zero; compare directly
    for (gp, gs), (wp, ws) in zip(got, want):
        assert gp == wp
        assert gs == pytest.approx(ws)


@pytest.mark.parametrize("seed", range(5))
def test_viterbi_topk_rank1_equals_top1_kernel(seed):
    from dlkp_spark.analysis.keyphrase import viterbi_decode_topk

    rng = np.random.Generator(np.random.PCG64(300 + seed))
    n = int(rng.integers(1, 8))
    logits = rng.standard_normal((n, 3))
    trans, start = _crf_params()
    path1, score1 = viterbi_decode_np(logits, trans, start)
    [(pathk, scorek), *_] = viterbi_decode_topk(logits, trans, start, top_k=3)
    assert pathk == path1
    assert scorek == pytest.approx(score1)


def test_viterbi_topk_respects_bio_constraints():
    from dlkp_spark.analysis.keyphrase import TAG_NAMES, viterbi_decode_topk

    rng = np.random.Generator(np.random.PCG64(7))
    logits = rng.standard_normal((12, 3))
    trans, start = _crf_params()
    for path, _score in viterbi_decode_topk(logits, trans, start, top_k=5):
        tags = [TAG_NAMES[i] for i in path]
        assert tags[0] != "I"
        for prev, cur in zip(tags, tags[1:]):
            assert not (prev == "O" and cur == "I")


def brute_force_ll(logits, gold, transitions, start, end):
    """Path-enumeration oracle for the CRF log-likelihood (M11): gold path
    score minus logsumexp over every path, start/end transitions applied."""
    n, k = logits.shape

    def path_score(path):
        s = start[path[0]] + logits[0][path[0]]
        for t in range(1, n):
            s += transitions[path[t - 1], path[t]] + logits[t][path[t]]
        return s + end[path[-1]]

    all_scores = np.array([path_score(p) for p in product(range(k), repeat=n)])
    m = all_scores.max()
    denom = m + np.log(np.exp(all_scores - m).sum())
    return float(path_score(gold) - denom)


@pytest.mark.parametrize("seed", range(20))
def test_crf_log_likelihood_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 6))
    k = int(rng.integers(2, 4))
    logits = rng.normal(size=(n, k))
    trans = rng.normal(size=(k, k))
    start = rng.normal(size=k)
    end = rng.normal(size=k)
    gold = [int(x) for x in rng.integers(0, k, size=n)]
    got = crf_log_likelihood(logits, gold, trans, start, end)
    want = brute_force_ll(logits, gold, trans, start, end)
    assert got == pytest.approx(want, abs=1e-10)
    # a probability: never positive, and exp sums to 1 over all gold paths
    assert got <= 1e-12


@pytest.mark.parametrize("seed", range(12))
def test_crf_ll_direct_twin_matches_production(seed):
    """crf_log_likelihood_direct (the scalar-libm oracle twin behind the
    crf_loss_toy DuckDB gate) must agree with the production max-shifted
    numpy kernel at toy magnitudes — including banned -10000 transitions
    (the underflow the direct form relies on being harmless)."""
    from dlkp_spark.analysis.keyphrase import _crf_params, crf_log_likelihood_direct

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 6))
    k = 3
    logits = rng.uniform(0.0, 2.0, size=(n, k))
    trans_np, start_np = _crf_params()
    gold = [int(x) for x in rng.integers(0, k, size=n)]
    T = [[float(x) for x in row] for row in trans_np]
    S = [float(x) for x in start_np]
    got = crf_log_likelihood_direct(
        [[float(x) for x in row] for row in logits], gold, T, S)
    want = crf_log_likelihood(logits, gold, trans_np, start_np)
    assert got == pytest.approx(want, rel=1e-12, abs=1e-9)


@pytest.mark.parametrize("seed", range(8))
def test_crf_ll_padding_mask_equals_truncation(seed):
    """Reference padding semantics (crf.py:102-110,171-175): trailing
    masked positions must contribute nothing — the masked LL equals the LL
    of the truncated sequence. -100 gold tags mask their position
    (forward(): mask[tags == -100] = 0)."""
    rng = np.random.default_rng(seed)
    n, pad, k = 4, 2, 3
    logits = rng.normal(size=(n + pad, k))
    trans = rng.normal(size=(k, k))
    start = rng.normal(size=k)
    end = rng.normal(size=k)
    gold = [int(x) for x in rng.integers(0, k, size=n)]
    padded = gold + [-100] * pad
    got = crf_log_likelihood(logits, padded, trans, start, end)
    want = crf_log_likelihood(logits[:n], gold, trans, start, end)
    assert got == pytest.approx(want, abs=1e-10)


def test_crf_loss_table_spark(spark):
    """The distributed loss operator: finite, non-positive LL per doc,
    0.0 for empty docs, and the per-doc value equals the local kernel."""
    from dlkp_spark.analysis.keyphrase import crf_loss_table
    from dlkp_spark.analysis.analyzer import tokenize_py

    rows = [(0, "the data query is fast"), (1, ""), (2, "compression layout")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in crf_loss_table(docs).collect()}
    assert got[1]["log_likelihood"] == 0.0 and got[1]["n_tokens"] == 0
    trans, start = _crf_params()
    for doc_id, text in rows:
        toks = tokenize_py(text)
        if not toks:
            continue
        logits = np.array([token_potentials(t) for t in toks])
        path, _ = viterbi_decode_np(logits, trans, start)
        want = crf_log_likelihood(logits, path, trans, start)
        assert got[doc_id]["log_likelihood"] == pytest.approx(want, abs=1e-12)
        assert got[doc_id]["log_likelihood"] <= 0.0


def test_viterbi_tags_respect_bio_constraints():
    toks = [f"w{i:04d}" for i in range(400)]
    tags, scores = tag_tokens_viterbi(toks)
    assert len(tags) == len(scores) == 400
    assert tags[0] != "I"
    for prev, cur in zip(tags, tags[1:]):
        assert not (prev == "O" and cur == "I"), "I after O banned by CRF"
    assert all(0.0 < s <= 1.0 for s in scores)
    # deterministic
    assert tag_tokens_viterbi(toks) == (tags, scores)


def test_potentials_deterministic_and_bounded():
    p = token_potentials("spark")
    assert p == token_potentials("spark")
    assert len(p) == 3


def test_with_keyphrases_viterbi_spark(spark):
    from dlkp_spark.analysis.keyphrase import with_keyphrases

    rows = [(i, [f"w{(i * 7 + j) % 50:04d}" for j in range(30)]) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    out = with_keyphrases(docs, decode="viterbi").collect()
    assert len(out) == 40
    # Spark path must equal the local single-doc path (partition-invariant)
    from dlkp_spark.analysis.keyphrase import tag_and_extract

    for r in out:
        kps, sc = tag_and_extract(list(r["tokens"]), "avg", "viterbi")
        assert list(r["keyphrases"]) == kps
        assert [pytest.approx(x) for x in r["kp_scores"]] == sc
