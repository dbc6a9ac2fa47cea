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
    where raw token sets don't.

    Built as a zip_with chain over shifted slices of the token array:
    acc = zip(toks, toks[2:], toks[3:], ...) joined by spaces. Crucially the
    token split is evaluated a constant number of times per row; the naive
    transform(sequence(...), i -> element_at(toks, i+j)) form re-evaluates
    the regex split per element access inside the interpreted HOF (~3·n
    splits per row — measured ~20× slower end-to-end on minhash).

    Positions past n-k+1 pair with the null padding zip_with emits for the
    shorter array; concat propagates the null and filter() drops them, so
    short docs (< k tokens) yield an empty set with no size() guard.
    """
    toks = tokens(text)
    acc = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(acc, lambda x: x.isNotNull()))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, whitespace collapsed."""
    return F.lower(F.regexp_replace(F.trim(text), WHITESPACE, " "))


# DuckDB oracle fragments with identical semantics.
DUCKDB_TOKENS = "string_split_regex(trim({t}), '\\s+')"

# Shared oracle CTE: per-doc distinct 3-token shingle sets over `documents`
# — the single source of truth for every shingle-based oracle (minhash,
# clustering, n-gram contamination), so tokenization/k changes cannot
# silently diverge between them. Mirrors shingles() above.
DUCKDB_SHINGLE_SET_CTE = r"""sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents)
      WHERE len(t) >= 3
    )"""
DUCKDB_DISTINCT_TOKENS = "list_distinct(string_split_regex(trim({t}), '\\s+'))"


def duckdb_shingles(t: str, k: int = 3) -> str:
    toks = DUCKDB_TOKENS.format(t=t)
    join = " || ' ' || ".join(f"__t[i+{j}]" for j in range(k))
    return (
        f"(SELECT list_distinct(list_transform(range(1, len(__t)-{k - 2}),"
        f" i -> {join})) FROM (SELECT {toks} AS __t) __sh)"
    )
