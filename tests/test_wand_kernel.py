"""Pure-kernel tests: block-max WAND vs brute-force scoring (no Spark)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dlkp_spark.query.wand import (
    _taat_topk,
    _taat_topk_dense,
    bmw_topk_lists,
    exact_topk_lists,
    merge_topk,
)


def brute_topk(lists, k):
    scores = {}
    for lst in sorted(lists, key=lambda d: (d["term"], d["field"])):
        for d, c in zip(lst["docs"], lst["contribs"]):
            scores[int(d)] = scores.get(int(d), 0.0) + lst["boost"] * float(c)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


def make_list(term, field, boost, docs, contribs, block_size):
    docs = np.asarray(docs, dtype=np.int64)
    contribs = np.asarray(contribs, dtype=np.float64)
    n = len(docs)
    nb = (n + block_size - 1) // block_size
    bm, bl = [], []
    for b in range(nb):
        sl = slice(b * block_size, min((b + 1) * block_size, n))
        bm.append(float(contribs[sl].max()))
        bl.append(int(docs[sl][-1]))
    return {"term": term, "field": field, "boost": boost, "docs": docs,
            "contribs": contribs,
            "block_max": np.array(bm), "block_last": np.array(bl, dtype=np.int64)}


def test_single_list():
    lst = make_list("a", 0, 1.0, [1, 5, 9], [0.5, 2.0, 1.0], block_size=2)
    assert bmw_topk_lists([lst], 2, 2) == [(5, 2.0), (9, 1.0)]


def test_two_lists_overlap_and_tiebreak():
    l1 = make_list("a", 0, 1.0, [1, 2, 3], [1.0, 1.0, 1.0], 2)
    l2 = make_list("b", 0, 1.0, [2, 4], [1.0, 2.0], 2)
    # scores: 1→1, 2→2, 3→1, 4→2 ; tie at 2.0 broken by doc asc; k=3
    assert bmw_topk_lists([l1, l2], 3, 2) == [(2, 2.0), (4, 2.0), (1, 1.0)]


def test_boost_applied():
    l1 = make_list("a", 0, 1.0, [1], [1.0], 64)
    l2 = make_list("a", 1, 2.0, [2], [1.0], 64)
    assert bmw_topk_lists([l1, l2], 2, 64) == [(2, 2.0), (1, 1.0)]


@given(st.data())
@settings(max_examples=150, deadline=None)
def test_bmw_matches_brute_force(data):
    rng_seed = data.draw(st.integers(0, 10**6))
    rng = np.random.default_rng(rng_seed)
    n_lists = data.draw(st.integers(1, 6))
    block_size = data.draw(st.sampled_from([1, 2, 4, 8]))
    k = data.draw(st.integers(1, 8))
    lists = []
    for i in range(n_lists):
        n = int(rng.integers(1, 60))
        docs = np.unique(rng.integers(0, 100, size=n))
        contribs = rng.uniform(0.01, 3.0, size=len(docs))
        boost = 2.0 if i % 3 == 2 else 1.0
        lists.append(make_list(f"t{i}", i % 2, boost, docs, contribs, block_size))
    got = bmw_topk_lists(lists, k, block_size)
    want = brute_topk(lists, k)
    assert [(d, round(s, 12)) for d, s in got] == [(d, round(s, 12)) for d, s in want]


@given(st.data())
@settings(max_examples=150, deadline=None)
def test_dense_taat_bit_identical_to_reference_kernel(data):
    """The batch path's dense-accumulator TAAT must return BIT-identical
    (doc, score) tuples — including boundary ties and <k-hit queries — to
    the unique+add.at reference kernel (which is itself pinned against the
    oracle by test_rank_identity)."""
    rng = np.random.default_rng(data.draw(st.integers(0, 10**6)))
    n_lists = data.draw(st.integers(1, 6))
    k = data.draw(st.integers(1, 8))
    base = data.draw(st.integers(0, 1000)) * 64
    width = data.draw(st.integers(1, 64))
    lists = []
    for i in range(n_lists):
        n = int(rng.integers(1, width + 1))
        docs = base + np.sort(rng.choice(width, size=n, replace=False))
        # quantized contribs to force score ties across docs/lists
        contribs = rng.integers(1, 4, size=n) * 0.5
        lists.append(make_list(f"t{i}", int(rng.integers(0, 2)),
                               1.0 + float(rng.integers(0, 2)), docs, contribs, 8))
    lists.sort(key=lambda d: (d["term"], d["field"]))
    want = _taat_topk(lists, k)
    for lst in lists:
        lst["cols"] = (lst["docs"] - base).astype(np.int64)
        lst["vals"] = lst["boost"] * lst["contribs"]
    acc = np.zeros(width, dtype=np.float64)
    got = _taat_topk_dense(lists, acc, base, k)
    assert got == want


@given(st.data())
@settings(max_examples=150, deadline=None)
def test_adaptive_kernel_both_paths_identical(data):
    """exact_topk_lists must return the same result whichever kernel the
    width threshold selects — run the SAME lists through a forced-dense
    and a forced-BMW call and require equality (both are exact by
    construction; this pins the dispatch wiring and the cols/vals prep)."""
    rng = np.random.default_rng(data.draw(st.integers(0, 10**6)))
    n_lists = data.draw(st.integers(1, 5))
    k = data.draw(st.integers(1, 8))
    base = data.draw(st.integers(0, 100)) * 64
    width = data.draw(st.integers(1, 48))
    lists = []
    for i in range(n_lists):
        n = int(rng.integers(1, width + 1))
        docs = base + np.sort(rng.choice(width, size=n, replace=False))
        contribs = rng.integers(1, 4, size=n) * 0.5
        lists.append(make_list(f"t{i}", int(rng.integers(0, 2)),
                               1.0 + float(rng.integers(0, 2)), docs, contribs, 4))
    import copy
    dense = exact_topk_lists(copy.deepcopy(lists), k, 4, dense_max_width=1 << 22)
    bmw = exact_topk_lists(copy.deepcopy(lists), k, 4, dense_max_width=0)
    assert dense == bmw


def test_merge_topk_tiebreak():
    assert merge_topk([(5, 1.0), (2, 1.0), (9, 2.0)], 2) == [(9, 2.0), (2, 1.0)]
