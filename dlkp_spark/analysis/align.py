"""Subword label alignment — M4, the reference's tokenize_and_align_labels
(/root/reference/src/dlkp/datasets/extraction.py:141-183).

The reference runs a HuggingFace subword tokenizer with
``is_split_into_words=True`` and aligns word-level BIO labels onto the
subword stream via ``word_ids``:

- special tokens (word_id None) → label -100 (ignored by the loss);
- the FIRST subword of each word carries the word's label id;
- continuation subwords carry I's id when the word label is B or I, else
  the word's own label id — but only when ``label_all_tokens``; otherwise
  -100 (:158-177).

No HF tokenizer exists in this environment, so the subword splitter is a
deterministic stand-in (fixed-width WordPiece-style chunks with ``##``
continuation markers); the alignment logic itself is the faithful part and
is what the tests pin. The Spark surface is the same iterator
``mapInPandas`` shape as the tagger (Arrow batches, model-per-partition).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

LABEL_TO_ID = {"B": 0, "I": 1, "O": 2}
IGNORE = -100
CLS, SEP = "[CLS]", "[SEP]"
CHUNK = 4  # stand-in subword width


def subword_split(token: str) -> list[str]:
    """Deterministic WordPiece-style stand-in: fixed-width chunks, ``##``
    marks continuations (real impl: the HF tokenizer's subword model)."""
    if len(token) <= CHUNK:
        return [token]
    return [token[:CHUNK]] + [f"##{token[i:i + CHUNK]}"
                              for i in range(CHUNK, len(token), CHUNK)]


def align_labels(tokens: list[str], labels: list[str],
                 label_all_tokens: bool = False,
                 max_seq_len: int | None = None) -> dict:
    """One example → (subwords, word_ids, label_ids), mirroring the
    reference loop at extraction.py:152-180 exactly (same -100 rules,
    same first-subword / continuation handling, same truncation)."""
    assert len(tokens) == len(labels)
    subwords: list[str] = [CLS]
    word_ids: list[int | None] = [None]
    for wi, tok in enumerate(tokens):
        for sw in subword_split(tok):
            subwords.append(sw)
            word_ids.append(wi)
    subwords.append(SEP)
    word_ids.append(None)
    if max_seq_len is not None and len(subwords) > max_seq_len:
        # HF truncation keeps the leading max_seq_len-1 pieces + final SEP
        subwords = subwords[: max_seq_len - 1] + [SEP]
        word_ids = word_ids[: max_seq_len - 1] + [None]

    label_ids: list[int] = []
    prev = None
    for wi in word_ids:
        if wi is None:
            label_ids.append(IGNORE)
        elif wi != prev:
            label_ids.append(LABEL_TO_ID[labels[wi]])
        else:
            label_ids.append(
                (LABEL_TO_ID["I"] if labels[wi] in ("B", "I")
                 else LABEL_TO_ID[labels[wi]])
                if label_all_tokens else IGNORE)
        prev = wi
    return {"subwords": subwords, "word_ids": word_ids, "label_ids": label_ids}


def with_aligned_labels(docs: DataFrame, tokens_col: str = "tokens",
                        tags_col: str = "tags", label_all_tokens: bool = False,
                        max_seq_len: int | None = None) -> DataFrame:
    """docs(doc_id, tokens, tags) → +subwords, +word_ids, +label_ids.

    word_ids uses -1 for None (Spark arrays are not nullable-friendly in
    Arrow round-trips); the pure function keeps None for reference parity.
    """
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
    schema = (f"{out_fields}, subwords array<string>, "
              "word_ids array<int>, label_ids array<int>")
    cols = [f.name for f in docs.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [align_labels(list(t), list(g), label_all_tokens, max_seq_len)
                   for t, g in zip(pdf[tokens_col], pdf[tags_col])]
            out = pdf[cols].copy()
            out["subwords"] = [r["subwords"] for r in res]
            out["word_ids"] = [[-1 if w is None else w for w in r["word_ids"]]
                               for r in res]
            out["label_ids"] = [r["label_ids"] for r in res]
            yield out

    return docs.mapInPandas(run, schema)
