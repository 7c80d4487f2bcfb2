"""Broadcast numpy tensor model through the M9 tagger seam (round-5 #3).

The hash stand-in tagger proves the Arrow inference plumbing but not the
model-DISTRIBUTION contract a real transformer needs. Pinned here with a
real (small) tensor model:

- broadcast-weight inference in executors is bit-stable and identical to
  a driver-local forward with the same seed (weights genuinely shipped,
  not re-randomized per worker);
- the full build pipeline (fused analyze+tag → token table → encode →
  commit) is deterministic end-to-end under the tensor tagger: two
  builds produce identical stats and identical posting blobs;
- decoded tags respect the CRF transition constraints (no orphan I).
"""

import numpy as np
import pytest

from dlkp_spark.analysis.keyphrase import tag_and_extract
from dlkp_spark.analysis.tensor_model import NumpyTagger, broadcast_tagger, init_weights
from dlkp_spark.config import IndexConfig
from dlkp_spark.corpus import generate_web_pages
from dlkp_spark.index.build import build_index, load_postings, load_stats, prepare_docs

SEED = 3


def test_weights_deterministic():
    a, b = init_weights(seed=SEED), init_weights(seed=SEED)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    c = init_weights(seed=SEED + 1)
    assert any(not np.array_equal(a[k], c[k]) for k in a)


def test_crf_constraints_hold():
    model = NumpyTagger(init_weights(seed=SEED))
    toks = [f"tok{i}" for i in range(40)] + ["data", "spark", "query"] * 5
    tags, scores = model(toks)
    assert len(tags) == len(toks) == len(scores)
    assert tags[0] != "I"
    for prev, cur in zip(tags, tags[1:]):
        assert not (prev == "O" and cur == "I")


@pytest.fixture(scope="module")
def tagged_docs(spark):
    pages = generate_web_pages(spark, 120, seed=9)
    tagger = broadcast_tagger(spark, seed=SEED)
    return prepare_docs(pages, validate=True, tagger=tagger).persist()


def test_distributed_inference_matches_local_forward(tagged_docs):
    rows = tagged_docs.select("tokens", "keyphrases", "kp_scores").collect()
    local = NumpyTagger(init_weights(seed=SEED))
    n_span_docs = 0
    for r in rows:
        kps, scores = tag_and_extract(list(r["tokens"]), "avg", tagger=local)
        assert list(r["keyphrases"]) == kps
        # kp_scores column is float32; local scores are float64
        np.testing.assert_allclose(np.asarray(r["kp_scores"], dtype=np.float64),
                                   scores, rtol=1e-6)
        n_span_docs += bool(kps)
    assert n_span_docs > 0, "tensor model emitted no spans — seam untested"


def test_build_index_stable_under_tensor_tagger(spark, tagged_docs, tmp_path):
    """Two full builds under broadcast-weight inference → identical index
    bytes (the 'stable tags end-to-end through build_index' gate)."""
    cfg = IndexConfig(segment_docs=32, block_size=16, n_term_partitions=8)

    def build(name):
        d = str(tmp_path / name)
        build_index(spark, tagged_docs, d, cfg=cfg, n_shards=2, resume=False)
        stats = load_stats(d)
        rows = sorted(
            (r["term"], r["field"], r["segment"], r["df"], r["n_postings"],
             bytes(r["docs_vb"]), bytes(r["tfs_vb"]), bytes(r["dls_vb"]))
            for r in load_postings(spark, d).collect())
        return stats, rows

    s1, r1 = build("idx_a")
    s2, r2 = build("idx_b")
    assert s1["dl_sums"] == s2["dl_sums"] and s1["n_docs"] == s2["n_docs"]
    assert r1 == r2 and len(r1) > 0
    # keyphrase field actually populated by the tensor model
    assert s1["dl_sums"][1] > 0, "kp field empty — tagger produced nothing"
