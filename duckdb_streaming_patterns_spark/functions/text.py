"""Text column functions: tokenization, shingling, normalization.

Built-in expression compositions only (split/transform/filter) — these run
in whole-stage codegen and scale linearly with no Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (order-preserving, duplicates kept)."""
    return F.split(F.trim(text), WHITESPACE)


def distinct_tokens(text: Column) -> Column:
    """Token *set* — the unit for token-level Jaccard."""
    return F.array_distinct(tokens(text))


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles ('w1 w2 w3' strings) — the unit for
    MinHash/near-dup Jaccard. Word order matters, so shingles discriminate
    where raw token sets don't."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - k)  # 0-based start positions
    parts = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    # guard: fewer than k tokens → empty set (sequence() would count down)
    empty = F.array().cast("array<string>")
    return F.when(n >= k, F.array_distinct(parts)).otherwise(empty)


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, whitespace collapsed."""
    return F.lower(F.regexp_replace(F.trim(text), WHITESPACE, " "))


# DuckDB oracle fragments with identical semantics.
DUCKDB_TOKENS = "string_split_regex(trim({t}), '\\s+')"
DUCKDB_DISTINCT_TOKENS = "list_distinct(string_split_regex(trim({t}), '\\s+'))"


def duckdb_shingles(t: str, k: int = 3) -> str:
    toks = DUCKDB_TOKENS.format(t=t)
    join = " || ' ' || ".join(f"__t[i+{j}]" for j in range(k))
    return (
        f"(SELECT list_distinct(list_transform(range(1, len(__t)-{k - 2}),"
        f" i -> {join})) FROM (SELECT {toks} AS __t) __sh)"
    )
