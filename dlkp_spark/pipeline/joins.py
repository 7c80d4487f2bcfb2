"""Skew-handling join strategies.

``salted_join``: the classic remedy for a shuffled equi-join whose key
distribution is Zipf — a hot key's rows all land on one reducer and that
task runs as long as the whole rest of the stage. Salting splits every
build-side key into ``n_salt`` sub-keys: the probe (large, skewed) side
tags each row with a deterministic salt from the ROW (content-hash, not
rand() — reproducible), the build side is replicated once per salt
value, and the join key becomes (key, salt) — the hot key's rows now
spread over ``n_salt`` reducers. Output is row-identical to the plain
join (gated by the ``salted_join_orders`` contract entry).

When to use which (the decision the engine's own operators encode):
- build side fits in memory → ``F.broadcast`` (no shuffle at all; the
  BM25/WAND query paths do this with query terms);
- both sides big, keys mild → plain shuffled join + AQE skew splitting;
- both sides big, keys Zipf-hot and AQE's split not enough (a single
  KEY cannot be split by AQE, only oversized partitions) → salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                n_salt: int = 8, how: str = "inner") -> DataFrame:
    """probe ⋈ build on ``key`` with the hot-key shuffle split ``n_salt``
    ways. ``build`` is replicated ``n_salt``× (choose it small-ish, or
    pre-filter to the hot keys and union a plain join for the rest);
    ``probe`` rows get a deterministic content-derived salt so repeated
    runs shuffle identically. Columns: probe's then build's (minus the
    duplicate key), like a plain ``join on key``.

    Only probe-side-preserving join types are allowed: with ``right`` or
    ``full``/``outer``, an unmatched BUILD row would surface once per salt
    replica (n_salt copies), silently breaking the row-identity guarantee
    — so those are rejected rather than quietly wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join how={how!r} is not row-identical to a plain join: "
            "unmatched build rows would be replicated n_salt times; use one "
            f"of {sorted(allowed)} or a plain join for right/full outer")
    salt_vals = F.array(*[F.lit(i) for i in range(n_salt)])
    probe_s = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]),
                        F.lit(n_salt)).cast("int"))
    build_s = build.withColumn("_salt", F.explode(salt_vals))
    out = probe_s.join(build_s, [key, "_salt"], how)
    return out.drop("_salt")
