"""Keyphrase field producer — the dlkp graft.

Reimplements the *behavior* of ``KeyphraseTagger.predict``
(/root/reference/src/dlkp/extraction/tagger.py:52-100): run a token-level
BIO tagger over each document, decode tag sequences into keyphrase spans,
score each span, and lowercase-first-wins dedup — faithfully mirroring the
reference state machine at
/root/reference/src/dlkp/datasets/extraction.py:308-377 and the confidence
aggregation at :298-306.

The transformer forward (reference ``extraction/models.py:57-110``) is
replaced by a deterministic stand-in "model" (a pure function of the token
bytes) because no torch/transformers exist in this environment. The Spark
plumbing is the real thing and is exactly what a transformer would use:
Arrow-batched iterator ``mapInPandas`` so the model loads once per partition
(reference loads once per process, tagger.py:23-46), model parameters
shipped via closure/broadcast, never per-row Python.
"""

from __future__ import annotations

import functools
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Stand-in tagger "model": deterministic pseudo-logits per token.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1 << 20)
def _tok_hash(tok: str) -> int:
    # memoized: token occurrences are Zipf-distributed over a small
    # vocabulary, so the hit rate in a real corpus is ~100% — this is the
    # per-token hot path of the stand-in model (a real transformer would
    # amortize differently: per-batch GPU forward). Identical outputs,
    # pure function.
    return int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big")


def tag_tokens(tokens: list[str]) -> tuple[list[str], list[float]]:
    """Deterministic BIO tags + per-token confidence scores.

    Stand-in for the transformer token classifier + argmax
    (reference tagger.py:67-68): tag B where the token hash lands in the
    B-bucket, I where it lands in the I-bucket *and* a span is open
    (mirroring how a trained tagger emits I only as continuations), else O.
    Scores are deterministic pseudo-softmax confidences in [0.5, 1.0).
    """
    tags: list[str] = []
    scores: list[float] = []
    prev_in_span = False
    for tok in tokens:
        h = _tok_hash(tok)
        m = h % 11
        if m == 0:
            tag = "B"
        elif m in (1, 2) and prev_in_span:
            tag = "I"
        else:
            tag = "O"
        tags.append(tag)
        scores.append(0.5 + (h % 1000) / 2000.0)
        prev_in_span = tag in ("B", "I")
    return tags, scores


# ---------------------------------------------------------------------------
# BIO → span decode: faithful port of the reference semantics.
# ---------------------------------------------------------------------------


def calculate_confidence_score(scores: list[float], score_method: str) -> float:
    """Mirror of datasets/extraction.py:298-306 (avg / first / max)."""
    if score_method == "avg":
        return float(sum(scores) / len(scores))
    if score_method == "first":
        return scores[0]
    if score_method == "max":
        return max(scores)
    raise ValueError(score_method)


def extract_kp_from_tags(
    tokens: list[str],
    tags: list[str],
    scores: list[float] | None = None,
    score_method: str | None = None,
) -> tuple[list[str], list[float] | None]:
    """BIO state machine, mirroring datasets/extraction.py:316-377 exactly:

    - ``O`` closes an open span;
    - ``B`` closes an open span and starts a new one;
    - ``I`` appends to the current span — including when no span is open
      (an I right after O starts accumulating, as in the reference);
    - a trailing open span is emitted at sequence end (:349-355);
    - spans decode to space-joined surface strings; final list is
      lowercased with first-wins ordered dedup (:361-375), scores kept for
      the first occurrence only.
    """
    if score_method:
        assert scores is not None and len(tags) == len(scores)
    all_kps: list[list[str]] = []
    all_scores: list[float] = []
    cur: list[str] = []
    cur_scores: list[float] = []
    for i, (tok, tag) in enumerate(zip(tokens, tags)):
        if tag == "O" and cur:
            if score_method:
                all_scores.append(calculate_confidence_score(cur_scores, score_method))
                cur_scores = []
            all_kps.append(cur)
            cur = []
        elif tag == "B":
            if cur:
                if score_method:
                    all_scores.append(calculate_confidence_score(cur_scores, score_method))
                all_kps.append(cur)
            cur = [tok]
            cur_scores = [scores[i]] if score_method else []
        elif tag == "I":
            cur.append(tok)
            if score_method:
                cur_scores.append(scores[i])
    if cur:
        all_kps.append(cur)
        if score_method:
            all_scores.append(calculate_confidence_score(cur_scores, score_method))

    decoded = [" ".join(kp) for kp in all_kps]
    final_kps: list[str] = []
    final_scores: list[float] = []
    seen: set[str] = set()
    for i, kp in enumerate(decoded):
        low = kp.lower()
        if low not in seen:
            seen.add(low)
            final_kps.append(low)
            if score_method:
                final_scores.append(all_scores[i])
    return final_kps, (final_scores if score_method else None)


# ---------------------------------------------------------------------------
# CRF-style Viterbi decode (reference M10/O4).
#
# Mirrors the inference path of the reference CRF layer
# (/root/reference/src/dlkp/extraction/crf.py:197-294 — ConditionalRandomField
# .viterbi_tags) and the DP kernel it calls
# (/root/reference/src/dlkp/extraction/crf_utils.py:187-294 viterbi_decode):
# max-sum dynamic programming over per-token tag potentials plus a pairwise
# transition matrix, backpointer reconstruction, first-index tie-breaking
# (torch.max and np.argmax both return the first maximal index).
#
# The transformer emissions are replaced by the same deterministic stand-in
# hash potentials as the greedy tagger; the transition matrix encodes the
# BIO constraint the reference trains into its CRF (I only continues B/I —
# extraction/crf.py:60-88 allowed-transition masking).
# ---------------------------------------------------------------------------

TAG_NAMES = ("O", "B", "I")
_NEG = -10000.0  # reference uses large negative potentials for banned moves

# transitions[prev, cur]: O→I banned; everything else free
_TRANSITIONS = None
_START = None


def _crf_params():
    global _TRANSITIONS, _START
    if _TRANSITIONS is None:
        import numpy as np

        t = np.zeros((3, 3))
        t[0, 2] = _NEG  # O → I
        s = np.zeros(3)
        s[2] = _NEG     # sequence cannot start with I
        _TRANSITIONS, _START = t, s
    return _TRANSITIONS, _START


def token_potentials(tok: str) -> list[float]:
    """Deterministic per-token tag potentials (stand-in for transformer
    emission logits): three stable values in [0, 1) from disjoint bits of
    the token hash, biased so O dominates and spans are sparse — the same
    head-term behavior a trained tagger shows."""
    h = _tok_hash(tok)
    o = ((h >> 0) & 0xFFFF) / 65536.0 + 0.55
    b = ((h >> 16) & 0xFFFF) / 65536.0
    i = ((h >> 32) & 0xFFFF) / 65536.0 + 0.25
    return [o, b, i]


def viterbi_decode_np(logits, transitions, start=None) -> tuple[list[int], float]:
    """numpy port of crf_utils.viterbi_decode (reference :187-294, the
    unobserved/top-1 path): returns (best tag-index path, path score)."""
    import numpy as np

    logits = np.asarray(logits, dtype=np.float64)
    n, k = logits.shape
    score = logits[0] + (start if start is not None else 0.0)
    ptr = np.zeros((max(n - 1, 0), k), dtype=np.int64)
    for t in range(1, n):
        summed = score[:, None] + transitions  # prev × cur potentials
        ptr[t - 1] = summed.argmax(axis=0)
        score = logits[t] + summed.max(axis=0)
    best = int(score.argmax())
    path = [best]
    for t in range(n - 2, -1, -1):
        best = int(ptr[t, best])
        path.append(best)
    path.reverse()
    return path, float(score.max())


def viterbi_decode_topk(logits, transitions, start=None,
                        top_k: int = 1) -> list[tuple[list[int], float]]:
    """k-best Viterbi (reference O4: crf.py:197-216 exposes ``top_k``
    decodings through crf_utils.viterbi_decode:187-232's contract —
    "a List of length top_k, containing the top K viterbi decodings ...
    (tag_sequence, viterbi_score)").

    Standard k-best DP: each (timestep, tag) state keeps its ``top_k``
    best incoming (score, prev_tag, prev_rank) continuations; the final
    merge ranks all (tag, rank) endings. Ties break deterministically by
    (score desc, prev_tag asc, prev_rank asc) — consistent with the
    top-1 kernel's first-maximal-index rule, and the rank-1 result is
    bit-identical to :func:`viterbi_decode_np` (pinned in
    tests/test_viterbi.py).
    """
    import numpy as np

    logits = np.asarray(logits, dtype=np.float64)
    n, k_tags = logits.shape
    kb = top_k
    NEG = -np.inf
    # score[tag, r]; parent[t][tag, r] = (prev_tag, prev_rank)
    score = np.full((k_tags, kb), NEG)
    score[:, 0] = logits[0] + (start if start is not None else 0.0)
    parents: list[np.ndarray] = []
    for t in range(1, n):
        new_score = np.full((k_tags, kb), NEG)
        parent = np.zeros((k_tags, kb, 2), dtype=np.int64)
        for tag in range(k_tags):
            # all K*kb candidate continuations into `tag`
            cand = score + transitions[:, tag][:, None]  # (prev_tag, rank)
            flat = cand.ravel()  # index = prev_tag * kb + rank → asc tiebreak
            order = np.argsort(-flat, kind="stable")[:kb]
            for r, idx in enumerate(order):
                if flat[idx] == NEG:
                    break
                new_score[tag, r] = flat[idx] + logits[t, tag]
                parent[tag, r] = (idx // kb, idx % kb)
        parents.append(parent)
        score = new_score
    flat = score.ravel()
    order = np.argsort(-flat, kind="stable")[:kb]
    out: list[tuple[list[int], float]] = []
    for idx in order:
        if flat[idx] == NEG:
            break
        tag, r = int(idx // kb), int(idx % kb)
        path = [tag]
        for t in range(n - 2, -1, -1):
            tag, r = (int(x) for x in parents[t][tag, r])
            path.append(tag)
        path.reverse()
        out.append((path, float(flat[idx])))
    return out


def crf_log_likelihood(logits, tags, transitions, start=None, end=None,
                       mask=None) -> float:
    """CRF log-likelihood of one tag sequence (SURVEY §2.3 M11; reference
    ConditionalRandomField.forward, crf.py:176-195, with its
    _input_likelihood denominator crf.py:71-119 and _joint_likelihood
    numerator crf.py:121-175).

    log P(tags | logits) = score(tags) − logsumexp over ALL tag paths,
    with optional start/end transition vectors and a boolean mask whose
    False positions are skipped (the reference's padding semantics: a
    masked step keeps the previous forward alpha and contributes neither
    emission nor transition). Gold tags of -100 are masked out, mirroring
    forward()'s `mask[tags == -100] = 0`.

    numpy forward algorithm — O(n·K²), no path enumeration; brute-force
    path-sum parity is pinned by tests/test_viterbi.py.
    """
    import numpy as np

    logits = np.asarray(logits, dtype=np.float64)
    tags = np.asarray(tags, dtype=np.int64)
    n, k = logits.shape
    mask = np.ones(n, dtype=bool) if mask is None else np.asarray(mask, dtype=bool).copy()
    mask[tags == -100] = False
    tags = np.where(tags == -100, 0, tags)
    start = np.zeros(k) if start is None else np.asarray(start, dtype=np.float64)
    end = np.zeros(k) if end is None else np.asarray(end, dtype=np.float64)
    if not mask.any():
        return 0.0

    def _logsumexp(a, axis):
        m = a.max(axis=axis, keepdims=True)
        return (m + np.log(np.exp(a - m).sum(axis=axis, keepdims=True))).squeeze(axis)

    # denominator: forward algorithm with mask-skip
    alpha = start + logits[0]
    for i in range(1, n):
        if mask[i]:
            alpha = _logsumexp(alpha[:, None] + transitions + logits[i][None, :], axis=0)
    denom = _logsumexp(alpha + end, axis=0)

    # numerator: gold path score under the same masking rules
    score = start[tags[0]]
    for i in range(n - 1):
        if mask[i + 1]:
            score += transitions[tags[i], tags[i + 1]]
        if mask[i]:
            score += logits[i, tags[i]]
    last = int(np.flatnonzero(mask)[-1])
    score += end[tags[last]]
    if mask[n - 1]:
        score += logits[n - 1, tags[n - 1]]
    return float(score - denom)


def crf_log_likelihood_direct(potentials, tags, transitions, start) -> float:
    """Oracle-replayable twin of :func:`crf_log_likelihood` for TOY
    magnitudes: the same forward-algorithm recursion, but with DIRECT
    ``log(exp(..) + exp(..) + ..)`` per step (no max-shift) computed with
    scalar libm ``math.exp``/``math.log`` in fixed left-to-right order.

    Why it exists: DuckDB's ``exp``/``ln`` are bit-identical to Python's
    ``math`` (both libm — probed empirically), while numpy's SIMD
    transcendentals differ by ulps — so THIS variant is what a SQL oracle
    can replay exactly (contract.q_crf_loss_toy unrolls the identical
    expression tree in DuckDB). Direct LSE is numerically safe only at
    bounded magnitudes (potentials in [0, ~2), short sequences); the
    production path stays :func:`crf_log_likelihood` (max-shifted,
    vectorized, mask-aware), with the two pinned against each other in
    tests/test_viterbi.py.

    ``potentials``: n×k nested lists; ``tags``: gold indices; ``transitions``
    /``start``: k×k and k nested lists of plain floats (no mask surface).
    """
    import math

    n, k = len(potentials), len(potentials[0])
    alpha = [start[j] + potentials[0][j] for j in range(k)]
    for i in range(1, n):
        new = []
        for j in range(k):
            acc = math.exp(alpha[0] + transitions[0][j])
            for prev in range(1, k):
                acc = acc + math.exp(alpha[prev] + transitions[prev][j])
            new.append(math.log(acc) + potentials[i][j])
        alpha = new
    acc = math.exp(alpha[0])
    for j in range(1, k):
        acc = acc + math.exp(alpha[j])
    denom = math.log(acc)
    score = start[tags[0]] + potentials[0][tags[0]]
    for i in range(1, n):
        score = score + transitions[tags[i - 1]][tags[i]]
        score = score + potentials[i][tags[i]]
    return score - denom


def crf_loss_table(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, log_likelihood) — per-document CRF training loss
    of the Viterbi-decoded tags under the stand-in potentials, as a
    batched Arrow operator (the distributed shape of an evaluation/
    fine-tuning loss pass; reference runs this inside the HF Trainer,
    train_eval_kp_tagger.py — here it is a first-class engine operator).
    """
    import numpy as np

    from dlkp_spark.analysis.analyzer import tokenize_py

    trans, start = _crf_params()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, counts, lls = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = tokenize_py(text)
                if toks:
                    logits = np.array([token_potentials(t) for t in toks])
                    path, _ = viterbi_decode_np(logits, trans, start)
                    ll = crf_log_likelihood(logits, path, trans, start)
                else:
                    ll = 0.0
                ids.append(doc_id)
                counts.append(len(toks))
                lls.append(ll)
            yield pd.DataFrame({"doc_id": ids, "n_tokens": counts,
                                "log_likelihood": lls})

    return docs.select(id_col, text_col).mapInPandas(
        run, "doc_id long, n_tokens int, log_likelihood double")


def tag_tokens_viterbi(tokens: list[str]) -> tuple[list[str], list[float]]:
    """Viterbi-decoded BIO tags + pseudo-softmax confidence per token."""
    import numpy as np

    if not tokens:
        return [], []
    logits = np.array([token_potentials(t) for t in tokens])
    trans, start = _crf_params()
    path, _ = viterbi_decode_np(logits, trans, start)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    tags = [TAG_NAMES[i] for i in path]
    scores = [float(probs[t, i]) for t, i in enumerate(path)]
    return tags, scores


def tag_and_extract(tokens: list[str], score_method: str = "avg",
                    decode: str = "greedy", tagger=None) -> tuple[list[str], list[float]]:
    """Full predict path for one document: tag → decode → dedup + scores.

    decode='greedy' → per-token argmax with the I-continuation constraint
    (reference non-CRF path); decode='viterbi' → CRF-style global decode
    (reference use_crf=True path, extraction/models.py:92-99).
    ``tagger`` overrides the model: any ``tokens → (tags, scores)``
    callable slots in where the transformer forward would run — used by
    the contract's oracle-gated variant to drive the REAL Arrow inference
    surface with a SQL-replayable tag rule.
    """
    if tagger is not None:
        tags, scores = tagger(tokens)
    elif decode == "viterbi":
        tags, scores = tag_tokens_viterbi(tokens)
    else:
        tags, scores = tag_tokens(tokens)
    kps, kp_scores = extract_kp_from_tags(tokens, tags, scores, score_method)
    return kps, kp_scores or []


# ---------------------------------------------------------------------------
# Spark surface: batched Arrow UDF inference (iterator form).
# ---------------------------------------------------------------------------


def analyze_and_tag(web_pages: DataFrame, validate: bool = True,
                    score_method: str = "avg", decode: str = "greedy",
                    tagger=None) -> DataFrame:
    """Fused analyzer + tagger: one Python pass per Arrow batch.

    html→text extraction, tokenization, and BIO tagging all happen inside a
    single ``mapInPandas`` so the wide token arrays never round-trip
    JVM↔Python between stages (chaining ``analyze`` → ``with_keyphrases``
    costs two extra Arrow transfers of the largest columns — measured ~2×
    build-time overhead at 20k docs).

    ``tagger`` slots a real model into the fused pass (same seam as
    ``with_keyphrases``) — e.g. ``tensor_model.broadcast_tagger`` ships
    tensor weights via Spark broadcast and materializes the model once per
    worker process.
    """
    from dlkp_spark.analysis.analyzer import extract_text_py, tokenize_py

    schema = ("url string, warc_ts timestamp, text string, lang string, "
              "tokens array<string>, keyphrases array<string>, kp_scores array<float>")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (a real transformer would be loaded here, once per partition)
        for pdf in batches:
            extracted = pdf["html"].map(extract_text_py)
            if validate:
                bad = pdf.loc[extracted != pdf["text"], "url"]
                if len(bad):
                    raise ValueError(
                        f"extracted text not byte-identical for urls: {bad.tolist()[:5]}")
            tokens = extracted.map(tokenize_py)
            results = tokens.map(
                lambda toks: tag_and_extract(toks, score_method, decode, tagger))
            yield pd.DataFrame({
                "url": pdf["url"], "warc_ts": pdf["warc_ts"], "text": extracted,
                "lang": pdf["lang"], "tokens": tokens,
                "keyphrases": results.map(lambda r: r[0]),
                "kp_scores": results.map(lambda r: r[1]),
            })

    return web_pages.mapInPandas(run, schema)


def with_keyphrases(docs: DataFrame, score_method: str = "avg",
                    tokens_col: str = "tokens", decode: str = "greedy",
                    sortish: bool = False, tagger=None,
                    project: tuple[str, ...] | None = None) -> DataFrame:
    """docs(+tokens array<string>) → +keyphrases array<string>,
    +kp_scores array<float>.

    Iterator-form ``mapInPandas``: the stand-in model is trivially cheap, but
    the structure is transformer-ready — a real model would be loaded once at
    iterator start (per partition) from a broadcast/SparkFiles artifact and
    applied per Arrow batch (reference trainer batch loop,
    extraction/trainer.py:87-131).

    sortish=True (O5, the reference's sortish/length batching): sort each
    partition by token count before batching, so a real transformer pads
    each Arrow batch to near-uniform lengths instead of the partition max —
    no shuffle (sortWithinPartitions), results identical either way
    (per-row function), only the batch composition changes.

    ``project`` (r6, guide §4.1 "pass only the columns the function
    needs"): names of INPUT columns to carry into the output. mapInPandas
    ships every declared output column back through Arrow, so a caller
    that only wants (doc_id, keyphrases) otherwise pays the round-trip of
    the wide token arrays it is about to drop. Default None keeps every
    input column (unchanged behavior); ``tokens_col`` always crosses
    INTO the pass either way.
    """
    if sortish:
        from pyspark.sql import functions as F

        docs = docs.sortWithinPartitions(F.size(tokens_col))
    keep = [f.name for f in docs.schema.fields] if project is None \
        else list(project)
    by_name = {f.name: f for f in docs.schema.fields}
    out_fields = ", ".join(
        f"{n} {by_name[n].dataType.simpleString()}" for n in keep)
    schema = f"{out_fields}, keyphrases array<string>, kp_scores array<float>"

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (model load would happen here, once per partition)
        for pdf in batches:
            results = pdf[tokens_col].map(
                lambda toks: tag_and_extract(list(toks), score_method, decode, tagger))
            pdf = pdf[keep].copy()
            pdf["keyphrases"] = results.map(lambda r: r[0])
            pdf["kp_scores"] = results.map(lambda r: r[1])
            yield pdf

    return docs.mapInPandas(infer, schema)
