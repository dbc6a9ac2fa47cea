"""Vector column functions over ``array<float>`` embeddings.

All built as Catalyst expressions (higher-order functions) — JVM-side,
codegen-able, no Python in the hot path. The fold in ``F.aggregate`` is a
sequential left-to-right double sum, which is bit-exact with DuckDB's
``list_sum(list_transform(...))`` — verified empirically — so cosine
thresholds compare identically against the oracle.

For very hot inner loops (brute-force k-NN at scale) a numpy-backed
``mapInPandas`` variant is in operators/similarity.py; these expression
versions are the correctness reference and the default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def to_double_array(arr: Column) -> Column:
    """Materialize a float array as double — do this once per *row* before
    a pair join so the per-pair dot skips two interpreted cast passes."""
    return _to_double(arr)


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_double(a: Column, b: Column) -> Column:
    """dot() for inputs already cast to array<double> (see to_double_array)
    — identical values, two fewer interpreted HOF passes per pair."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    sq = F.aggregate(
        _to_double(a), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a||b|), all double, deterministic fold order."""
    return dot(a, b) / l2_norm(a) / l2_norm(b)


# DuckDB oracle fragments mirroring the exact same arithmetic/order, for use
# inside oracle SQL strings. {a}/{b} are list<float> column references.
DUCKDB_DOT = (
    "list_sum(list_transform(range(1, len({a})+1),"
    " i -> CAST({a}[i] AS DOUBLE) * {b}[i]))"
)
DUCKDB_NORM = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * x)))"


def duckdb_cosine(a: str, b: str) -> str:
    return (
        f"({DUCKDB_DOT.format(a=a, b=b)}"
        f" / {DUCKDB_NORM.format(a=a)}"
        f" / {DUCKDB_NORM.format(a=b)})"
    )
