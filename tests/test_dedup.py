"""Property tests for dedup operators without a SQL oracle (SURVEY §5.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.operators import dedup


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "spark engines about content different completely"),  # same tokens, diff order
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_identical_text_identical_fp(spark):
    fps = dedup.simhash(_docs(spark), "doc_id", "text").collect()
    by_id = {r["id"]: r["simhash"] for r in fps}
    assert by_id[1] == by_id[2]
    # same token *set* (order ignored by simhash-over-token-set) → same fp
    assert by_id[4] == by_id[5]
    # near dup differs in few bits
    ham = bin((by_id[1] ^ by_id[3]) & ((1 << 64) - 1)).count("1")
    assert 0 < ham <= 16


def test_simhash_pairs_contain_exact_dups(spark):
    pairs = dedup.simhash_pairs(_docs(spark), "doc_id", "text", max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (4, 5) in got


def test_minhash_lsh_finds_exact_and_near_dups(spark):
    pairs = dedup.minhash_lsh_pairs(
        _docs(spark), "doc_id", "text", threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0


def test_exact_dedup_keeps_min_id(spark):
    out = dedup.exact_dedup(_docs(spark), "text", "doc_id").collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3, 4, 5]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    rows = [(1, "Hello   World"), (2, "hello world"), (3, "hello  world ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: r["fingerprint"] for r in dedup.fingerprint(df, "doc_id", "text").collect()}
    assert fps[1] == fps[2] == fps[3]


def test_connected_components_chain_and_singletons(spark):
    """A chain has diameter > 1, forcing multiple propagation rounds — the
    case the quasi-clique dedup fixture doesn't exercise."""
    from duckdb_streaming_patterns_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 7, 8, 9)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)], "id_a long, id_b long"
    )
    labels = {r["id"]: r["cluster"] for r in connected_components(nodes, edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 7: 7, 8: 7, 9: 9}
