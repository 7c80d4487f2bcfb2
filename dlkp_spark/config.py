"""Engine-wide constants and tunables.

BM25 parameters follow the north-star spec: k1=1.2, b=0.75, with a
multiplicative boost for hits in the keyphrase field. All constants that
affect scoring are centralized here so the Spark engine and the pure-Python
oracle (``dlkp_spark.oracle``) provably share them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# Tokenizer: lowercase + runs of [a-z0-9]. Deterministic and byte-stable;
# shared by the Spark analyzer, the DuckDB oracle construction, and the
# pure-Python oracle engine. (Analog of the reference's whitespace split +
# HF fast tokenizer at dlkp tagger.py:60 / datasets/extraction.py:128-139 —
# the engine's analyzer is the index-side replacement, per SURVEY.md §2.12.)
TOKEN_RE = re.compile(r"[a-z0-9]+")

# Field ids for the two index fields.
FIELD_BODY = 0
FIELD_KP = 1


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75
    # score(doc) = sum_body + kp_boost * sum_kp  (field boost for keyphrase
    # hits, per BASELINE.json north_star)
    kp_boost: float = 2.0
    k: int = 10  # top-k


@dataclass(frozen=True)
class IndexConfig:
    """Index build layout knobs.

    ``segment_docs``: documents per doc-range segment. Segments are the unit
    of (a) head-term salting during the build shuffle — a term's postings are
    built per-(term, segment), so a Zipf head term that appears in most
    documents is split into ``n_docs / segment_docs`` independently-built
    sub-lists instead of hot-spotting one reducer — and (b) query-time
    parallelism: block-max WAND runs per (query, segment) and partial top-k
    heaps are merged. At 10^12 docs this would be sized so a segment's
    postings for one term stay well under executor memory (e.g. 2**23 docs).
    """

    segment_docs: int = 4096
    block_size: int = 64  # postings per block for block-max metadata
    n_term_partitions: int = 32  # range partitions over term for the build
    fields: tuple = (FIELD_BODY, FIELD_KP)
    bm25: BM25Params = field(default_factory=BM25Params)
    # opt-in positional postings (per-doc token positions, delta+varbyte in
    # a pos_vb column) — enables exact phrase queries (query/phrase.py) at
    # the cost of a posexplode build pass and a larger index; the default
    # build layout is byte-identical with this off
    positions: bool = False
