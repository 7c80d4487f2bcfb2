import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dlkp_spark.config import BM25Params
from dlkp_spark.index.codec import (
    decode_postings,
    decode_postings_batch,
    delta_decode,
    delta_encode,
    encode_postings,
    tf_norm_vec,
    varbyte_decode,
    varbyte_decode_concat,
    varbyte_encode,
)


def test_varbyte_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**56 + 5], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@given(st.lists(st.lists(st.integers(min_value=0, max_value=2**40), max_size=60),
                min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_varbyte_concat_decode_equals_per_stream(streams):
    bufs = [varbyte_encode(np.array(s, dtype=np.uint64)) for s in streams]
    vals, counts = varbyte_decode_concat(bufs)
    assert counts.tolist() == [len(s) for s in streams]
    off = 0
    for s in streams:
        assert np.array_equal(vals[off:off + len(s)],
                              np.array(s, dtype=np.uint64))
        off += len(s)


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_decode_postings_batch_bit_identical_to_row_at_a_time(data):
    rng = np.random.default_rng(data.draw(st.integers(0, 10**6)))
    n_lists = data.draw(st.integers(1, 12))
    rows = []
    for _ in range(n_lists):
        n = int(rng.integers(1, 80))
        docs = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, size=n).astype(np.int64)
        dls = rng.integers(1, 400, size=n).astype(np.int64)
        enc = encode_postings(docs, tfs, dls, idf=1.0, avgdl=100.0,
                              p=BM25Params(), block_size=8)
        rows.append((enc["docs_vb"], enc["tfs_vb"], enc["dls_vb"]))
    d_f, t_f, l_f, counts = decode_postings_batch(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows])
    off = 0
    for (dv, tv, lv), c in zip(rows, counts):
        d1, t1, l1 = decode_postings(dv, tv, lv)
        assert np.array_equal(d_f[off:off + c], d1)
        assert np.array_equal(t_f[off:off + c], t1)
        assert np.array_equal(l_f[off:off + c], l1)
        off += c


def test_decode_group_batch_bit_identical(spark_noop=None):
    """wand._decode_group (batched codec + flat contribs) must produce
    bit-identical docs/contribs to row-at-a-time decode + tf_norm_vec."""
    import pandas as pd

    from dlkp_spark.oracle import idf as idf_fn
    from dlkp_spark.query.wand import _decode_group

    rng = np.random.default_rng(7)
    p = BM25Params()
    stats = {"n_docs": 500, "avgdl": {0: 123.456, 1: 7.89}}
    rows = []
    for i in range(25):
        n = int(rng.integers(1, 60))
        docs = np.sort(rng.choice(5000, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, size=n).astype(np.int64)
        dls = rng.integers(1, 400, size=n).astype(np.int64)
        field = int(rng.integers(0, 2))
        df_val = int(rng.integers(1, 400))
        enc = encode_postings(docs, tfs, dls, idf=idf_fn(500, df_val),
                              avgdl=stats["avgdl"][field], p=p, block_size=8)
        rows.append({"term": f"t{i%7}", "field": field, "df": df_val,
                     "docs_vb": enc["docs_vb"], "tfs_vb": enc["tfs_vb"],
                     "dls_vb": enc["dls_vb"], "block_max": enc["block_max"],
                     "block_last": enc["block_last"]})
    g = pd.DataFrame(rows)
    got = _decode_group(g, stats, p)
    assert len(got) == len(rows)
    for lst, r in zip(got, rows):
        d1, t1, l1 = decode_postings(r["docs_vb"], r["tfs_vb"], r["dls_vb"])
        want = idf_fn(500, r["df"]) * tf_norm_vec(
            t1, l1, stats["avgdl"][r["field"]], p)
        assert np.array_equal(lst["docs"], d1)
        assert np.array_equal(lst["contribs"], want)  # exact, not approx


def test_encode_decode_postings_roundtrip():
    p = BM25Params()
    doc_ids = np.array([3, 10, 11, 500, 100000], dtype=np.int64)
    tfs = np.array([1, 5, 2, 9, 1], dtype=np.int64)
    dls = np.array([100, 300, 50, 900, 120], dtype=np.int64)
    enc = encode_postings(doc_ids, tfs, dls, idf=1.7, avgdl=250.0, p=p, block_size=2)
    d, t, dl = decode_postings(enc["docs_vb"], enc["tfs_vb"], enc["dls_vb"])
    assert np.array_equal(d, doc_ids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(dl, dls)
    # block structure: 5 postings, block_size 2 → 3 blocks
    assert len(enc["block_max"]) == 3
    assert enc["block_last"] == [10, 500, 100000]
    # block maxes are admissible upper bounds of true contributions
    contribs = 1.7 * tf_norm_vec(tfs, dls, 250.0, p)
    for b in range(3):
        blk = contribs[b * 2:(b + 1) * 2]
        assert enc["block_max"][b] == pytest.approx(blk.max(), abs=0)
    assert enc["max_contrib"] == contribs.max()


def test_block_max_admissible_property():
    rng = np.random.default_rng(7)
    p = BM25Params()
    doc_ids = np.cumsum(rng.integers(1, 50, size=1000)).astype(np.int64)
    tfs = rng.integers(1, 20, size=1000).astype(np.int64)
    dls = rng.integers(30, 2000, size=1000).astype(np.int64)
    enc = encode_postings(doc_ids, tfs, dls, idf=2.1, avgdl=400.0, p=p, block_size=64)
    contribs = 2.1 * tf_norm_vec(tfs, dls, 400.0, p)
    for i, c in enumerate(contribs):
        assert enc["block_max"][i // 64] >= c


def test_shared_idf_is_bit_stable():
    """Oracle and kernels share one idf implementation (np.log differs from
    math.log by 1 ulp on some inputs, e.g. log(7.3)); repeated evaluation is
    bit-identical."""
    from dlkp_spark.oracle import idf
    for n, df in [(10, 1), (500, 3), (10**6, 12345), (7, 7)]:
        assert idf(n, df) == idf(n, df)
        assert isinstance(idf(n, df), float)


def test_encode_postings_multi_matches_single():
    """The cross-group vectorized encoder (r6) must be BIT-identical to
    the per-group encoder: same blobs, same block metadata, same floats."""
    from dlkp_spark.index.codec import encode_postings_multi

    rng = np.random.default_rng(13)
    p = BM25Params()
    groups = []
    for g in range(200):
        n = int(rng.integers(1, 140))
        doc_ids = np.cumsum(rng.integers(1, 9, size=n)).astype(np.int64)
        tfs = rng.integers(1, 30, size=n).astype(np.int64)
        dls = rng.integers(10, 3000, size=n).astype(np.int64)
        idf = float(rng.uniform(0.1, 8.0))
        avgdl = float(rng.uniform(50.0, 900.0))
        groups.append((doc_ids, tfs, dls, idf, avgdl))
    flat_d = np.concatenate([g[0] for g in groups])
    flat_t = np.concatenate([g[1] for g in groups])
    flat_l = np.concatenate([g[2] for g in groups])
    counts = np.array([len(g[0]) for g in groups], dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    multi = encode_postings_multi(
        flat_d, flat_t, flat_l, starts, ends,
        np.array([g[3] for g in groups]), np.array([g[4] for g in groups]),
        p, block_size=16)
    for i, (doc_ids, tfs, dls, idf, avgdl) in enumerate(groups):
        single = encode_postings(doc_ids, tfs, dls, idf=idf, avgdl=avgdl,
                                 p=p, block_size=16)
        assert multi["docs_vb"][i] == single["docs_vb"]
        assert multi["tfs_vb"][i] == single["tfs_vb"]
        assert multi["dls_vb"][i] == single["dls_vb"]
        assert multi["block_max"][i] == single["block_max"]
        assert multi["block_last"][i] == single["block_last"]
        assert multi["n_postings"][i] == single["n_postings"]
        assert multi["max_contrib"][i] == single["max_contrib"]
