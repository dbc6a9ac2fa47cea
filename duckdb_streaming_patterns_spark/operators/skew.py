"""Skew mitigation: salted joins and two-phase salted aggregation.

At 100 TB a handful of hot keys (one power user, one null-ish default key)
can pin an entire shuffle partition on one executor. AQE's skew-join
splitting (on by default in session.py) handles sort-merge joins
adaptively; these operators are the *explicit* form for when the skew is
known ahead of time or the operation is one AQE can't split (stateful
aggregation toward a single key).

Both are pure DataFrame compositions — deterministic salts derived with
xxhash64 from a caller-named unique column, never Python randomness — so
results are bit-identical to the unsalted plan (verified by tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting: the (skewed) fact side gets a
    deterministic salt in [0, n_salts) hashed from ``salt_src`` (any
    roughly-unique fact column), the dim side is replicated n_salts times,
    and the join key becomes (on..., salt) — splitting each hot key's rows
    across n_salts reducers at the cost of an n_salts× dim replication
    (dim is the small side; at scale it was broadcast-or-small anyway).

    Only fact-preserving join types are allowed: with ``right`` or
    ``full_outer`` the replicated dim side would emit every unmatched dim
    row n_salts times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — the n_salts-replicated dim side would duplicate "
            "unmatched dim rows under right/full_outer."
        )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(replicated_dim, [*on, "__salt"], how).drop("__salt")


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    salt_src: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Aggregation in two shuffles: partial per (keys..., salt), then final
    re-aggregation per keys.

    ``aggs`` maps output column → (input column or '*', agg) where agg is
    'count' | 'sum' | 'max' | 'min'. count re-aggregates as sum of partial
    counts (the same partial→final shape the reference's pattern 2 staging
    table uses, pattern_2.py:100-105). Useful when one group key dominates:
    phase one spreads the hot key across n_salts reducers, phase two
    combines n_salts (not n_rows) rows per key.
    """
    first = {"count": F.count, "sum": F.sum, "max": F.max, "min": F.min}
    second = {"count": F.sum, "sum": F.sum, "max": F.max, "min": F.min}
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            first[agg](F.col(src) if src != "*" else F.lit(1)).alias(out)
            for out, (src, agg) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[second[agg](F.col(out)).alias(out) for out, (_, agg) in aggs.items()]
    )
