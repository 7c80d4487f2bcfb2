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


def test_gate_knobs_full_recall_on_driver_testdata(spark):
    """ADVICE r3 #5: the knn_lsh / knn_ivf driver gates compare the ANN
    paths against the EXACT top-k oracle, which is valid only while the
    pinned knobs achieve recall 1.0 on the driver's sf0.01 testdata. That
    precondition was previously a measured-once claim in a docstring; this
    test asserts it, so a regenerated testdata (or a knob drift) fails
    HERE with a diagnosis instead of as a mystery driver hash mismatch.

    Knobs mirrored from contract.q_knn_lsh / q_knn_ivf — keep in sync.
    """
    import os

    from dlkp_spark.pipeline.similarity import ivf_cosine_topk

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
        pytest.skip("driver testdata not present")
    df = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
          .filter("vec_id != 0").persist())
    q_row = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
             .filter("vec_id = 0").select("embedding").head())
    q = [float(x) for x in q_row["embedding"]]
    exact = [r["vec_id"] for r in
             brute_cosine_topk(df, q, k=10).orderBy("rank").collect()]
    lsh = [r["vec_id"] for r in
           lsh_cosine_topk(df, q, k=10, n_planes=8, multiprobe=4)
           .orderBy("rank").collect()]
    ivf = [r["vec_id"] for r in
           ivf_cosine_topk(df, q, k=10, n_centroids=8, n_probe=7)
           .orderBy("rank").collect()]
    df.unpersist()
    assert lsh == exact, (
        "knn_lsh gate precondition broken: pinned knobs (n_planes=8, "
        "multiprobe=4) no longer give recall 1.0 on sf0.01 — testdata was "
        "regenerated or knobs drifted; fix the knobs BEFORE the driver gate "
        "reports a hash mismatch")
    assert ivf == exact, (
        "knn_ivf gate precondition broken: pinned knobs (n_centroids=8, "
        "n_probe=7) no longer give recall 1.0 on sf0.01 — see q_knn_ivf")


def test_lsh_fewer_planes_higher_recall(spark, embs):
    df, vecs = embs
    q = [float(x) for x in vecs[3]]
    exact = {r["vec_id"] for r in brute_cosine_topk(df, q, k=10).collect()}
    ann4 = {r["vec_id"] for r in lsh_cosine_topk(df, q, k=10, n_planes=4).collect()}
    assert len(exact & ann4) / 10 >= 0.7


def test_embedding_cosine_pairs_exact_vs_numpy(spark, embs):
    from dlkp_spark.pipeline.similarity import embedding_cosine_pairs

    df, vecs = embs
    got = {(r["a"], r["b"]) for r in embedding_cosine_pairs(df, threshold=0.5).collect()}
    v = vecs.astype(np.float64)
    nrm = np.linalg.norm(v, axis=1)
    cos = (v @ v.T) / np.outer(nrm, nrm)
    want = {(a, b) for a in range(N) for b in range(a + 1, N) if cos[a, b] >= 0.5}
    assert got == want


def test_embedding_cosine_pairs_lsh_recall_on_near_dups(spark):
    """Planted near-duplicate vectors (tiny perturbations) must survive the
    LSH-bucketed scale path — high-cosine pairs agree on hyperplane signs."""
    from dlkp_spark.pipeline.similarity import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_lsh,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, DIM))
    rows = []
    for i in range(40):
        rows.append((2 * i, [float(x) for x in base[i]]))
        rows.append((2 * i + 1, [float(x) for x in base[i] + 0.02 * rng.standard_normal(DIM)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["a"], r["b"]) for r in embedding_cosine_pairs(df, threshold=0.99).collect()}
    lsh = {(r["a"], r["b"]) for r in
           embedding_cosine_pairs_lsh(df, threshold=0.99, n_planes=8).collect()}
    assert len(exact) == 40          # each planted twin pair
    assert lsh <= exact              # verify step guarantees precision
    assert len(lsh) >= 0.9 * len(exact)   # near-identical vectors share buckets
