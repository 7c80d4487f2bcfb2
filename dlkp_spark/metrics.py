"""Evaluation harness: keyphrase-level P@k / R@k / F1@k and rank-identity
checks, mirroring the reference semantics at
/root/reference/src/dlkp/metrics/metrics.py:59-132:

- per-example: predicted and gold keyphrase lists are (optionally
  normalized then) set-ified; ``correctly_matched`` is the membership
  indicator over the predicted set; P@k = hits-in-first-k / k,
  R@k = hits-in-first-k / |gold|, F1 harmonic; k ∈ {5, 10, "m"} where
  "m" = number of predictions (``calculate_f1_k``, :108-132).
- corpus-level: plain average over examples (``compute_kp_level_metrics``,
  :59-76 — A1 in SURVEY §2.5).

The reference stems with Porter (nltk, absent here); the engine's
normalizer is the analyzer fold (lowercase), injectable for parity tests.

Both a pure-Python version (for small eval sets) and a distributed
DataFrame version (explode → semi-join → window agg — A2/A3 pattern) are
provided; they are tested equal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KS = (5, 10, "m")


def f1_at_k(correctly_matched: list[int], n_gold: int, k) -> dict:
    """Mirror of calculate_f1_k (metrics.py:108-132), including its quirks:
    P@m uses k=len(predictions) and returns 0.0 when there are none."""
    name = k
    if isinstance(k, str):
        k = len(correctly_matched)
    p = float(sum(correctly_matched[:k])) / float(k) if k != 0 else 0.0
    r = float(sum(correctly_matched[:k])) / float(n_gold) if n_gold != 0 else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return {f"P@{name}": p, f"R@{name}": r, f"F1@{name}": f1}


def compute_f1s(predicted: list[str], gold: list[str],
                normalize: Callable[[str], str] | None = None) -> dict:
    """Mirror of compute_f1s (metrics.py:79-105) with the same
    set-membership semantics. NB the reference iterates ``set(predicted)``
    — Python set order; we keep first-occurrence order of the deduped
    predictions, which is deterministic and order-stable (the engine's
    dedup already emits first-wins order, M7)."""
    norm = normalize or (lambda s: s.lower())
    pred_n = [norm(p) for p in predicted]
    gold_set = {norm(g) for g in gold}
    seen: set[str] = set()
    pred_dedup = [p for p in pred_n if not (p in seen or seen.add(p))]
    matched = [1 if p in gold_set else 0 for p in pred_dedup]
    out: dict = {}
    for k in KS:
        out.update(f1_at_k(matched, len(gold_set), k))
    return out


def compute_kp_level_metrics(predictions: list[list[str]],
                             originals: list[list[str]],
                             normalize: Callable[[str], str] | None = None) -> dict:
    """Corpus average (metrics.py:59-76)."""
    assert len(predictions) == len(originals)
    acc: dict = {}
    for pred, gold in zip(predictions, originals):
        for key, v in compute_f1s(pred, gold, normalize).items():
            acc[key] = acc.get(key, 0.0) + v
    n = len(predictions)
    return {key: v / n for key, v in acc.items()} if n else {}


def kp_metrics_df(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Distributed corpus metrics.

    pred: (doc_id, keyphrases array<string>) — already normalized/deduped
    in order; gold: (doc_id, keyphrases array<string>).
    Returns one row with avg P@/R@/F1@ for k in {5, 10, m}.

    Plan shape: one broadcast-free equi-join on doc_id + one aggregation;
    membership is per-row ``array``-wise (J3 analog), no explode shuffle.
    """
    j = (pred.select("doc_id", F.col("keyphrases").alias("p"))
         .join(gold.select("doc_id",
                           F.transform("keyphrases", lambda g: F.lower(g)).alias("g")),
               "doc_id"))
    matched = F.transform(
        "p", lambda kp: F.when(F.array_contains("g", F.lower(kp)), 1).otherwise(0))
    j = j.select(F.col("g"), matched.alias("m"))

    def stats(k_expr, name):
        hits = F.aggregate(F.slice("m", 1, k_expr), F.lit(0), lambda a, x: a + x) \
            .cast("double")
        p = F.when(k_expr != 0, hits / k_expr).otherwise(F.lit(0.0))
        r = F.when(F.size("g") != 0, hits / F.size("g")).otherwise(F.lit(0.0))
        f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
        return [F.avg(p).alias(f"P@{name}"), F.avg(r).alias(f"R@{name}"),
                F.avg(f1).alias(f"F1@{name}")]

    aggs = []
    for k in (5, 10):
        # reference divides by the fixed k even when fewer predictions exist
        aggs += stats(F.lit(k), k)
    aggs += stats(F.size("m"), "m")
    return j.groupBy().agg(*aggs)


# ---------------------------------------------------------------------------
# Tag-level (seqeval) metrics — SURVEY A2, reference metrics/metrics.py:32-38.
#
# The reference calls seqeval precision/recall/f1/accuracy over BIO tag
# sequences. seqeval's default (conlleval) chunking for plain B/I/O tags:
# a chunk starts at every B, and at an I whose predecessor is O (or start
# of sequence); it extends through consecutive I tags. Entities match on
# exact (start, end) boundaries; micro P/R/F1 over all documents;
# accuracy is token-level tag equality.
# ---------------------------------------------------------------------------


def tag_spans(tags: list[str]) -> list[tuple[int, int]]:
    """seqeval/conlleval chunk extraction for B/I/O tags: [(start, end)]
    with inclusive end."""
    spans: list[tuple[int, int]] = []
    start = None
    for i, tag in enumerate(tags):
        if tag == "O":
            if start is not None:
                spans.append((start, i - 1))
                start = None
        elif tag == "B" or start is None:  # B always starts; I-after-O starts
            if start is not None:
                spans.append((start, i - 1))
            start = i
    if start is not None:
        spans.append((start, len(tags) - 1))
    return spans


def tag_level_metrics(pred: list[list[str]], gold: list[list[str]]) -> dict:
    """Pure-Python micro P/R/F1 + token accuracy (seqeval semantics)."""
    assert len(pred) == len(gold)
    n_pred = n_gold = n_match = n_tok = n_tok_ok = 0
    for p, g in zip(pred, gold):
        assert len(p) == len(g)
        ps, gs = set(tag_spans(p)), set(tag_spans(g))
        n_pred += len(ps)
        n_gold += len(gs)
        n_match += len(ps & gs)
        n_tok += len(p)
        n_tok_ok += sum(1 for a, b in zip(p, g) if a == b)
    precision = n_match / n_pred if n_pred else 0.0
    recall = n_match / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"n_pred": n_pred, "n_gold": n_gold, "n_matched": n_match,
            "precision": precision, "recall": recall, "f1": f1,
            "accuracy": n_tok_ok / n_tok if n_tok else 0.0}


def spans_df(tagged: DataFrame, tags_col: str, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tags array<string>) → (doc_id, start, end) entity spans.

    Distributed gaps-and-islands: posexplode + per-doc window (partitioned
    by doc_id — no global window), span_id = running count of chunk starts,
    then min/max pos per span. One shuffle keyed on doc_id.
    """
    from pyspark.sql import Window

    t = tagged.select(F.col(id_col).alias("doc_id"),
                      F.posexplode(tags_col).alias("pos", "tag"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("tag").over(w)
    is_start = (F.col("tag") != "O") & (
        (F.col("tag") == "B") | prev.isNull() | (prev == "O"))
    t = t.withColumn("span_id",
                     F.sum(is_start.cast("int")).over(
                         w.rowsBetween(Window.unboundedPreceding, 0)))
    return (t.filter(F.col("tag") != "O")
            .groupBy("doc_id", "span_id")
            .agg(F.min("pos").alias("start"), F.max("pos").alias("end"))
            .select("doc_id", "start", "end"))


def tag_metrics_df(tagged: DataFrame, pred_col: str = "pred_tags",
                   gold_col: str = "gold_tags", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_tags, gold_tags) → one row of micro tag-level metrics:
    (n_pred, n_gold, n_matched, precision, recall, f1, accuracy).

    SCAN-LOCAL (r6): a doc's spans are a pure function of its own tags
    arrays, so span starts/ends, the matched-span count and the token
    accuracy are all computed per row with array built-ins (a start is a
    non-O tag at 0 / after O / tagged B; its span ends before the first
    subsequent non-I; a pred span matches when gold starts at the same
    position with the same end) and reduced by ONE tiny global aggregate
    of five long counters. The former plan — two posexplode + doc-window
    span extractions, a span equi-join, a zipped explode, three persisted
    subframes — shuffled the exploded token stream several times to
    recombine per-doc information (measured 2.62 s → 0.44 s at sf1.0;
    output bit-identical: counts are exact longs, and the final
    divisions see the same integer operands). :func:`spans_df` remains
    the distributed extraction for callers that need the span ROWS of
    arbitrarily long token streams; here each doc's tags array is
    row-bounded, so the fold shape wins.

    Every per-row expression lives inside one ``transform`` lambda over a
    1-element bound array (the let-expression shape, see
    decontam.word_ngrams) so the tags arrays are evaluated once per row
    however many sub-expressions read them.
    """

    def _starts(ts):
        n = F.size(ts)
        idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)) \
               .otherwise(F.array().cast("array<int>"))

        def is_start(i):
            tag = F.get(ts, i)
            prev = F.get(ts, i - 1)
            return (tag != F.lit("O")) & (
                (tag == F.lit("B")) | (i == 0) | (prev == F.lit("O")))

        return F.filter(idx, is_start)

    def _span_end(ts, s):
        # first j > s whose tag != 'I', minus 1; last index if none
        n = F.size(ts)
        tail = F.when(s + 1 <= n - 1, F.sequence(s + 1, n - 1)) \
                .otherwise(F.array().cast("array<int>"))
        nxt = F.filter(tail, lambda j: F.get(ts, j) != F.lit("I"))
        return F.coalesce(F.get(nxt, 0) - 1, n - 1)

    def _inner(p, g):
        sp = _starts(p)
        sg = _starts(g)
        matched = F.filter(sp, lambda s: F.array_contains(sg, s)
                           & (_span_end(p, s) == _span_end(g, s)))
        okv = F.zip_with(p, g, lambda a, b: (a == b).cast("int"))
        return F.struct(
            F.size(sp).cast("long").alias("n_pred"),
            F.size(sg).cast("long").alias("n_gold"),
            F.size(matched).cast("long").alias("n_matched"),
            F.aggregate(okv, F.lit(0).cast("long"), lambda a, x: a + x).alias("ok"),
            F.size(p).cast("long").alias("n_tok"))

    bound = F.array(F.struct(F.col(pred_col).alias("p"), F.col(gold_col).alias("g")))
    m = tagged.select(
        F.get(F.transform(bound, lambda b: _inner(b["p"], b["g"])), 0).alias("m"))
    agg = m.groupBy().agg(
        F.sum("m.n_pred").alias("n_pred"), F.sum("m.n_gold").alias("n_gold"),
        F.sum("m.n_matched").alias("n_matched"),
        F.sum("m.ok").alias("oks"), F.sum("m.n_tok").alias("n_tok"))
    p = F.when(F.col("n_pred") > 0, F.col("n_matched") / F.col("n_pred")).otherwise(0.0)
    r = F.when(F.col("n_gold") > 0, F.col("n_matched") / F.col("n_gold")).otherwise(0.0)
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0)
    return agg.select(
        "n_pred", "n_gold", "n_matched",
        F.round(p, 6).alias("precision"), F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(F.col("oks") / F.col("n_tok"), 6).alias("accuracy"))


def rank_identity_report(got: list[tuple[int, int, float]],
                         want: list[tuple[int, int, float]]) -> dict:
    """Compare two (rank, doc_id, score) rankings: exact-rank identity and
    score agreement — the engine's acceptance check (north_rule)."""
    ids_equal = [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    score_bits = all(gs == ws for (_, _, gs), (_, _, ws) in zip(got, want)) \
        if len(got) == len(want) else False
    return {"rank_identical": ids_equal, "scores_bit_identical": score_bits,
            "n_got": len(got), "n_want": len(want)}
