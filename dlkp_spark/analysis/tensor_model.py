"""Tiny numpy token-classifier — exercises the M9 transformer seam for real.

The environment has no torch, so the production tagger is a hash stand-in
(keyphrase.tag_tokens). What the stand-in CANNOT prove is the
model-DISTRIBUTION contract a real transformer needs: tensor weights
shipped to every executor once (broadcast), loaded once per worker
process, applied batch-wise inside the Arrow iterator. This module proves
exactly that with a real (if small) tensor model:

    embedding lookup (hash-bucketed) → dense ReLU layer → 3-tag logits
    → CRF-constrained Viterbi decode (the existing keyphrase head)

mirroring the reference stack: transformer emissions
(/root/reference/src/dlkp/extraction/models.py:57-110) feeding the CRF
decode (crf.py:197-294), with weight loading once per process
(tagger.py:23-46). Any future torch/transformers model drops in by
replacing ``NumpyTagger.forward`` — the broadcast/laziness plumbing is
identical.

Scale shape: weights ship via ``SparkContext.broadcast`` (one copy per
executor, torrent-distributed by Spark — NOT pickled into every task
closure), and the lazy per-process materialization in
``BroadcastTagger.__call__`` is the "load model once per worker" pattern
the reference uses for its HF pipeline.
"""

from __future__ import annotations

import numpy as np

from dlkp_spark.analysis.keyphrase import TAG_NAMES, _crf_params, _tok_hash, viterbi_decode_np


def init_weights(seed: int = 0, n_buckets: int = 4096, dim: int = 16,
                 hidden: int = 16) -> dict:
    """Deterministic model weights (seeded RNG): same seed → bit-identical
    parameters on every process, so tests can rebuild the model locally
    and compare against distributed inference."""
    rng = np.random.default_rng(seed)
    w = {
        "emb": rng.standard_normal((n_buckets, dim)) * 0.5,
        "W1": rng.standard_normal((dim, hidden)) * (1.0 / np.sqrt(dim)),
        "b1": np.zeros(hidden),
        "W2": rng.standard_normal((hidden, 3)) * (1.0 / np.sqrt(hidden)),
        "b2": np.array([0.4, 0.0, 0.0]),  # mild O-bias → sparse spans, like a trained tagger
    }
    return w


class NumpyTagger:
    """tokens → (BIO tags, per-token confidence) via a real tensor forward.

    Callable with the exact ``tagger=`` signature of
    ``keyphrase.tag_and_extract`` / ``with_keyphrases`` — the injectable
    seam the oracle-gated ruled tagger already drives.
    """

    def __init__(self, weights: dict):
        self.w = {k: np.asarray(v) for k, v in weights.items()}
        self.n_buckets = self.w["emb"].shape[0]

    def forward(self, tokens: list[str]) -> np.ndarray:
        """(n, 3) float64 emission logits — the transformer stand-in."""
        ids = np.fromiter((_tok_hash(t) % self.n_buckets for t in tokens),
                          dtype=np.int64, count=len(tokens))
        x = self.w["emb"][ids]
        h = np.maximum(x @ self.w["W1"] + self.w["b1"], 0.0)
        return h @ self.w["W2"] + self.w["b2"]

    def __call__(self, tokens: list[str]) -> tuple[list[str], list[float]]:
        if not tokens:
            return [], []
        logits = self.forward(tokens)
        trans, start = _crf_params()
        path, _ = viterbi_decode_np(logits, trans, start)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
        tags = [TAG_NAMES[i] for i in path]
        scores = [float(probs[t, i]) for t, i in enumerate(path)]
        return tags, scores


class BroadcastTagger:
    """Picklable tagger handle: tasks serialize only the broadcast ref;
    the tensor model materializes lazily ONCE per worker process from the
    broadcast value (the reference's load-model-once-per-process pattern,
    tagger.py:23-46)."""

    def __init__(self, bc):
        self._bc = bc
        self._model: NumpyTagger | None = None

    def __call__(self, tokens):
        if self._model is None:
            self._model = NumpyTagger(self._bc.value)
        return self._model(tokens)


def broadcast_tagger(spark, weights: dict | None = None, seed: int = 0) -> BroadcastTagger:
    """Ship model weights to executors via Spark broadcast and return the
    tagger callable for ``with_keyphrases(tagger=...)`` /
    ``analyze_and_tag(tagger=...)`` / ``prepare_docs(tagger=...)``."""
    weights = weights if weights is not None else init_weights(seed)
    return BroadcastTagger(spark.sparkContext.broadcast(weights))
