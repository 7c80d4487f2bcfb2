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

# Strong references on purpose: JVM cache blocks are freed only by an
# explicit unpersist (Python GC of the handle does NOT release them), so
# a weak registry would silently lose the ability to free blocks. The
# registry is bounded instead — past _MAX_REGISTERED the oldest half is
# unpersisted eagerly (those frames belong to completed operator calls;
# eviction-then-recompute is safe ONLY because every plan persisted
# through this module is DETERMINISTIC — see persist()'s contract below).
# Long-lived services should still call release_cached() between jobs to
# return executor storage promptly.
_PERSISTED: list[DataFrame] = []
_MAX_REGISTERED = 256


def persist(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for later bulk release.

    CONTRACT: ``df``'s plan must be DETERMINISTIC under re-evaluation —
    eager eviction (or executor loss) silently recomputes evicted blocks,
    so a nondeterministic plan (rand() without a seed, unseeded sampling,
    monotonically_increasing_id over an unpinned partitioning) would
    change results mid-operator. Every current caller satisfies this:
    e.g. with_doc_ids persists spark_partition_id over a
    repartitionByRange whose boundaries are fixed by the sampled input,
    and the dedup/similarity persists are pure column transforms. Keep it
    that way when adding persist() call sites.
    """
    df = df.persist()
    if len(_PERSISTED) >= _MAX_REGISTERED:
        old = _PERSISTED[: _MAX_REGISTERED // 2]
        del _PERSISTED[: _MAX_REGISTERED // 2]
        for frame in old:
            try:
                frame.unpersist()
            except Exception:
                pass
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
