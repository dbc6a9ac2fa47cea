"""Registry-generated operator documentation (round-4 verdict item 8).

The README's operator inventory is GENERATED from the live query
registry (``queries.QUERIES``) by ``python -m
duckdb_streaming_patterns_spark.docs`` and pinned by
``tests/test_docs.py``: every registered query must map to exactly one
documented family, and the README section between the BEGIN/END markers
must equal the current generator output — so the docs cannot drift from
the registered surface.
"""

from __future__ import annotations

import re

# family key -> (title, one-liner)
FAMILIES: dict[str, tuple[str, str]] = {
    "reference-core": (
        "Reference core",
        "The reference repo's own query surface: projections, filters, "
        "JSON extraction, incremental/complete aggregation, top-k.",
    ),
    "star-schema": (
        "Star-schema SQL",
        "TPC-H-style joins and aggregates proving the Catalyst story: "
        "broadcast dimensions, semi/anti joins, rollup/cube, windows over "
        "facts.",
    ),
    "advanced-sql": (
        "Advanced SQL & skew",
        "Window functions, correlated/decorrelated subqueries, set ops, "
        "as-of and range joins, salted-join and two-phase-agg skew "
        "patterns, batch sessionization.",
    ),
    "physical-layout": (
        "Physical layout",
        "Bucketed exchange-free joins, hive partition pruning, dynamic "
        "partition pruning, Morton-Z clustering with footer-stats file "
        "skipping, CDF/time-travel snapshot reads.",
    ),
    "streaming-patterns": (
        "Streaming patterns",
        "End-to-end Structured Streaming pipelines with durable state, "
        "exactly-once foreachBatch contracts, and streaming ≡ batch "
        "oracles — the reference's continuous-ingestion surface plus the "
        "training-data funnel patterns.",
    ),
    "dedup": (
        "Deduplication",
        "Exact, hash-keyed, token-Jaccard, MinHash+LSH, SimHash, "
        "duplicated-span profiling/removal, clustering + canonicals, and "
        "cross-corpus incremental verdicts — band-bucketed joins, never "
        "all-pairs.",
    ),
    "similarity-ann": (
        "Similarity search / ANN",
        "Brute-force cosine baseline, hyperplane LSH, IVF with "
        "cell-partitioned at-rest index, PQ-ADC with exact re-rank, and "
        "SemDeDup embedding pruning.",
    ),
    "text-analysis": (
        "Text analysis",
        "Token counts, quality scoring, language ID, unigram surprisal, "
        "repetition stats, PII scan, TF-IDF terms, percentiles, "
        "fingerprints, per-source top-k.",
    ),
    "corpus-pipeline": (
        "Corpus pipeline",
        "Sampling/splits/mixing, chunking and token-bin packing, "
        "contamination gates (Jaccard, n-gram, Bloom), distinct-count "
        "sketches, seeded shuffle + shard assignment, the composed "
        "shard-build capstone.",
    ),
    "multimodal": (
        "Multimodal",
        "Binary payload columns with typed metadata, Arrow-batched decode "
        "stubs, frame sampling, cross-modal ANN retrieval.",
    ),
}

# name-level overrides, consulted before the module defaults
_NAME_OVERRIDES: dict[str, str] = {
    # layout-flavored queries that live in other modules
    "bucketed_join_revenue": "physical-layout",
    "partition_pruned_daily_clicks": "physical-layout",
    "dpp_pruned_daily_clicks": "physical-layout",
    "zorder_boxed_clicks": "physical-layout",
    "cdf_table_changes": "physical-layout",
    "snapshot_time_travel_read": "physical-layout",
    # dedup-flavored queries in text/pipeline modules
    "doc_fingerprint": "dedup",
    "text_duplicated_spans": "dedup",
    "text_remove_duplicated_spans": "dedup",
    # text-flavored queries elsewhere
    "source_topk_docs": "text-analysis",
    "top_bigrams_per_lang": "text-analysis",
    "quality_classifier_scores": "text-analysis",
    "quality_filter_funnel": "text-analysis",
    # sketch module (round 12): the streaming KMV fold is a streaming
    # pattern, the runtime-bloom join a join-strategy surface
    "pattern_streaming_distinct_kmv": "streaming-patterns",
    "pattern_streaming_quantiles_kmv": "streaming-patterns",
    "runtime_bloom_join_revenue": "advanced-sql",
    # custom Python DataSource (round 12): the batch scan is a source
    # surface (reference core), the poll-loop replay stays streaming
    "python_datasource_scan": "reference-core",
}

_MODULE_DEFAULTS: dict[str, str] = {
    "queries": "reference-core",
    "queries_star": "star-schema",
    "queries_tpch": "star-schema",
    "queries_tpch2": "star-schema",
    "queries_advanced": "advanced-sql",
    "queries_streaming": "streaming-patterns",
    "queries_text": "text-analysis",
    "queries_sim": "similarity-ann",
    "queries_pipeline": "corpus-pipeline",
    "queries_multimodal": "multimodal",
    "queries_sketch": "corpus-pipeline",
}


def family_of(name: str, module: str) -> str:
    """The documented family of a registered query; raises on a query the
    docs don't know how to place (the test turns that into a failure, so
    adding a query forces a docs decision)."""
    if name in _NAME_OVERRIDES:
        return _NAME_OVERRIDES[name]
    if name.startswith("dedup_"):
        return "dedup"
    mod = module.rsplit(".", 1)[-1]
    if mod in _MODULE_DEFAULTS:
        return _MODULE_DEFAULTS[mod]
    raise KeyError(f"no documented family for query {name!r} (module {mod})")


BEGIN = "<!-- BEGIN GENERATED OPERATOR INVENTORY (do not edit by hand) -->"
END = "<!-- END GENERATED OPERATOR INVENTORY -->"


def generate_markdown() -> str:
    """The README inventory section, generated from the live registry."""
    from duckdb_streaming_patterns_spark.queries import QUERIES

    groups: dict[str, list[str]] = {k: [] for k in FAMILIES}
    oracled = 0
    for name, (fn, oracle) in QUERIES.items():
        fam = family_of(name, fn.__module__)
        groups[fam].append(name + ("" if oracle is not None else " ◦"))
        oracled += oracle is not None
    lines = [
        BEGIN,
        "",
        "### Operator inventory (generated from the query registry)",
        "",
        f"{len(QUERIES)} registered queries, {oracled} with an exact "
        "DuckDB oracle (◦ = rows-only check, e.g. HLL estimates). "
        "Regenerate with `python -m duckdb_streaming_patterns_spark.docs`.",
        "",
    ]
    for fam, (title, blurb) in FAMILIES.items():
        names = sorted(groups[fam])
        lines.append(f"- **{title}** ({len(names)}) — {blurb}")
        lines.append("  " + ", ".join(f"`{n}`" for n in names))
    lines += ["", END]
    return "\n".join(lines)


def update_readme(path: str) -> bool:
    """Replace (or append) the generated section; returns True if the
    file changed."""
    with open(path) as f:
        text = f.read()
    block = generate_markdown()
    if BEGIN in text and END in text:
        new = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END),
            lambda _: block,
            text,
            flags=re.DOTALL,
        )
    else:
        new = text.rstrip() + "\n\n" + block + "\n"
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        return True
    return False


if __name__ == "__main__":
    import os

    readme = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    changed = update_readme(readme)
    print(f"README.md {'updated' if changed else 'already current'}")
