"""Stateful streaming dedup — custom stateful operator (SURVEY §2.10 ext).

First-wins exact dedup across an unbounded document stream:
``applyInPandasWithState`` keyed on the content hash keeps one boolean
"seen" flag per distinct text (plus the keeper's doc id), so a document
whose text already appeared in ANY earlier micro-batch is dropped, and
within a batch the lowest doc_id wins (same keeper rule as the batch
``pipeline.dedup.exact_dedup``).

Scale shape: state is keyed on md5(text) — uniform 128-bit key space, no
skew; state size is O(#distinct texts) spread across the state store's
shuffle partitions; each micro-batch shuffles only (hash → rows) once.
This is the streaming twin of the batch hash-groupBy dedup: same key,
same keeper, state instead of aggregation.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "seen boolean, keeper long"


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """stream(doc_id, text, ...) → stream of first-seen rows (doc_id, h).

    Emits exactly one row per distinct text across the whole stream
    lifetime, in the micro-batch where the text first appears.
    """
    keyed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col).cast("binary")).alias("h"))

    def dedup(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        min_id = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            min_id = m if min_id is None else min(min_id, m)
        if state.exists or min_id is None:
            return
        state.update((True, min_id))
        yield pd.DataFrame({"doc_id": [min_id], "h": [key[0]]})

    return keyed.groupBy("h").applyInPandasWithState(
        dedup,
        outputStructType="doc_id long, h string",
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
