"""Session-lifetime cache registry for operator-internal persist() calls.

Operators like minhash_lsh_pairs persist intermediate frames that several
plan branches re-use (measured ~10× recompute without it), but the caller
only sees the final DataFrame — it has no handle to unpersist. Every
internal persist goes through :func:`persist` so callers (bench, long-lived
services, tests) can release all executor storage with one
:func:`release_cached` call between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for later bulk release."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every operator-internal cached frame; returns the count.

    Safe to call at any time: unpersist only drops cached blocks — any
    still-live downstream DataFrame stays correct (recomputes lazily).
    """
    n = 0
    for df in _PERSISTED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    _PERSISTED.clear()
    return n
