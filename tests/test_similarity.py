"""Similarity search: brute-force exactness vs numpy; LSH recall."""

import numpy as np
import pytest

from dlkp_spark.pipeline.similarity import brute_cosine_topk, lsh_cosine_topk

DIM = 16
N = 200


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist(), vecs


def np_topk(vecs, q, k):
    v = vecs.astype(np.float64)
    qq = np.asarray(q, dtype=np.float64)
    cos = (v @ qq) / (np.linalg.norm(v, axis=1) * np.linalg.norm(qq))
    order = np.lexsort((np.arange(len(v)), -np.round(cos, 6)))[:k]
    return [(int(i), round(float(cos[i]), 6)) for i in order]


def test_brute_cosine_matches_numpy(spark, embs):
    df, vecs = embs
    q = [float(x) for x in vecs[0]]
    got = [(r["vec_id"], r["cosine"]) for r in
           brute_cosine_topk(df, q, k=10).orderBy("rank").collect()]
    want = np_topk(vecs, q, 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gid, gc), (wid, wc) in zip(got, want):
        assert gc == pytest.approx(wc, abs=2e-6)
    assert got[0][0] == 0 and got[0][1] == pytest.approx(1.0)


def test_lsh_recall_at_10(spark, embs):
    df, vecs = embs
    q = [float(x) for x in vecs[7]]
    exact = {r["vec_id"] for r in brute_cosine_topk(df, q, k=10).collect()}
    ann = {r["vec_id"] for r in
           lsh_cosine_topk(df, q, k=10, n_planes=8, multiprobe=1).collect()}
    recall = len(exact & ann) / 10
    assert recall >= 0.5  # multiprobe-1 over 8 planes on random data
    assert 7 in ann  # the query vector itself is always in its own bucket


def test_ivf_recall(spark, embs):
    from dlkp_spark.pipeline.similarity import ivf_cosine_topk
    df, vecs = embs
    q = [float(x) for x in vecs[11]]
    exact = {r["vec_id"] for r in brute_cosine_topk(df, q, k=10).collect()}
    ivf = {r["vec_id"] for r in
           ivf_cosine_topk(df, q, k=10, n_centroids=8, n_probe=4).collect()}
    assert len(exact & ivf) / 10 >= 0.5
    assert 11 in ivf  # the query's own cell is always probed


def test_lsh_fewer_planes_higher_recall(spark, embs):
    df, vecs = embs
    q = [float(x) for x in vecs[3]]
    exact = {r["vec_id"] for r in brute_cosine_topk(df, q, k=10).collect()}
    ann4 = {r["vec_id"] for r in lsh_cosine_topk(df, q, k=10, n_planes=4).collect()}
    assert len(exact & ann4) / 10 >= 0.7
