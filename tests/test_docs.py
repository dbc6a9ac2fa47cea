"""The README operator inventory is generated from the query registry
and may not drift from it (round-4 verdict item 8): every registered
query maps to exactly one documented family, and the README's generated
block equals the current generator output."""

from __future__ import annotations

import os

from duckdb_streaming_patterns_spark import docs
from duckdb_streaming_patterns_spark.queries import QUERIES

README = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md"
)


def test_every_registered_query_has_a_documented_family():
    for name, (fn, _) in QUERIES.items():
        fam = docs.family_of(name, fn.__module__)  # raises if unmapped
        assert fam in docs.FAMILIES, (name, fam)


def test_readme_inventory_matches_registry():
    with open(README) as f:
        text = f.read()
    assert docs.BEGIN in text and docs.END in text, (
        "README has no generated inventory section — run "
        "python -m duckdb_streaming_patterns_spark.docs"
    )
    start = text.index(docs.BEGIN)
    end = text.index(docs.END) + len(docs.END)
    assert text[start:end] == docs.generate_markdown(), (
        "README inventory is stale — regenerate with "
        "python -m duckdb_streaming_patterns_spark.docs"
    )


def test_inventory_counts_are_live():
    md = docs.generate_markdown()
    assert f"{len(QUERIES)} registered queries" in md
