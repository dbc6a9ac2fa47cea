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


def test_incremental_exact_matches(spark):
    """New-batch exact dedup vs corpus: only identical content matches,
    corpus_id = min matching corpus id."""
    corpus = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),
            (11, "alpha beta gamma delta"),  # second copy: min id 10 wins
            (12, "entirely different corpus text"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta"),  # exact dup of 10/11
            (101, "brand new unseen content"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["batch_id"], r["corpus_id"])
        for r in dedup.incremental_exact_matches(
            batch, corpus, "text", "doc_id"
        ).collect()
    }
    assert got == {(100, 10)}


def test_incremental_neardup_matches(spark):
    """Cross-corpus near-dup: batch docs match their corpus near-dups (and
    only those); batch-internal and corpus-internal pairs are NOT emitted."""
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight again"),
            (11, "completely unrelated corpus document about spark engines"),
            # corpus-internal near-dup pair (10, 12): must not appear
            (12, "the quick brown fox jumps over the lazy dog tonight too"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight again"),
            (101, "nothing like anything in the existing corpus at all here"),
            # batch-internal near-dup of 100: cross pairs only, so 102's
            # matches are corpus docs, not 100
            (102, "the quick brown fox jumps over the lazy dog tonight again"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.incremental_neardup_matches(
        batch, corpus, "doc_id", "text", threshold=0.5
    ).collect()
    got = {(r["batch_id"], r["corpus_id"]) for r in rows}
    assert (100, 10) in got
    assert (102, 10) in got
    assert all(b >= 100 and c < 100 for b, c in got)
    assert not any(b == 101 for b, _ in got)
    exact = [r for r in rows if r["batch_id"] == 100 and r["corpus_id"] == 10]
    assert exact and exact[0]["jaccard"] == 1.0


def test_incremental_neardup_at_rest_bands_identical(spark, tmp_path):
    """The at-rest path — corpus band index written to parquet once, read
    back, passed via corpus_bands — must produce exactly the inline
    result. This is the 100 TB shape: the stored index replaces the
    corpus-side signature computation entirely."""
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight again"),
            (11, "completely unrelated corpus document about spark engines"),
            (12, "the quick brown fox jumps over the lazy dog tonight too"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight again"),
            (101, "nothing like anything in the existing corpus at all here"),
        ],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "corpus_bands")
    dedup.minhash_bands(corpus, "doc_id", "text").write.parquet(idx_path)
    stored = spark.read.parquet(idx_path)
    inline = {
        tuple(r)
        for r in dedup.incremental_neardup_matches(
            batch, corpus, "doc_id", "text", threshold=0.5
        ).collect()
    }
    at_rest = {
        tuple(r)
        for r in dedup.incremental_neardup_matches(
            batch, corpus, "doc_id", "text", threshold=0.5, corpus_bands=stored
        ).collect()
    }
    assert at_rest == inline and len(inline) > 0


def test_remove_duplicated_spans_kills_cross_doc_dups(spark, sf_small):
    """Re-profiling the cleaned corpus must find ZERO cross-document
    duplicated 8-grams: every later copy of a span was excised, the first
    occurrence survives, and token splicing at excision joints does not
    coincidentally recreate a cross-doc 8-gram on this corpus. Also pins
    the keep-first policy: total tokens removed < total duplicated-gram
    tokens flagged (something survives), and docs under 8 tokens pass
    through byte-identical (modulo whitespace normalization)."""
    from duckdb_streaming_patterns_spark.operators import textstats
    from duckdb_streaming_patterns_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    cleaned = textstats.remove_duplicated_spans(docs, "doc_id", "text", n=8)
    assert cleaned.count() == docs.count()  # every doc gets a verdict row

    redocs = cleaned.select("doc_id", F.col("clean_text").alias("text"))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 7),
        lambda i: F.array_join(F.slice(toks, i, 8), " "),
    )
    cross = (
        redocs.filter((F.length("text") > 0) & (F.size(toks) >= 8))
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
        .groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .count()
    )
    assert cross == 0, f"{cross} cross-doc duplicated grams survived removal"

    # keep-first: the corpus keeps at least one copy of duplicated content
    stats = cleaned.agg(
        F.sum("n_removed").alias("rem"), F.sum("n_tokens").alias("tot")
    ).first()
    assert 0 < stats["rem"] < stats["tot"]


def test_band_candidates_hot_bucket_cap(spark):
    """One degenerate band value matched by many corpus docs must be
    droppable: with max_bucket set, candidates from band keys exceeding
    the cap (counted as DISTINCT corpus docs) disappear while cold
    buckets survive. Cap unset keeps everything (the tested-SF default
    path — oracle exactness untouched)."""
    cb = spark.createDataFrame(
        [(i, 0, 111) for i in range(1, 6)] + [(6, 1, 222)],
        "doc_id long, band_id int, band_hash long",
    )
    bb = spark.createDataFrame(
        [(100, 0, 111), (100, 1, 222)],
        "doc_id long, band_id int, band_hash long",
    )
    uncapped = dedup.band_candidates(cb, bb)
    assert {r["corpus_id"] for r in uncapped.collect()} == {1, 2, 3, 4, 5, 6}
    capped = dedup.band_candidates(cb, bb, max_bucket=3)
    assert {r["corpus_id"] for r in capped.collect()} == {6}


def test_minhash_lsh_hot_bucket_cap_drops_degenerate_cluster(spark):
    """An identical-content cluster collides on EVERY band: with a cap
    below the cluster size the quadratic in-bucket expansion is skipped
    for those keys (no pairs emitted from them), while an independent
    near-dup pair in cold buckets is still found. At real thresholds the
    exact-dedup tier owns identical docs, so capping costs nothing
    there; the default cap (1024) never trips at the tested SFs."""
    boiler = "spam spam spam spam spam spam spam spam spam spam"
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy dog again and once"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(4)] + [(10, a), (11, b)],
        "doc_id long, text string",
    )
    capped = dedup.minhash_lsh_pairs(df, "doc_id", "text", 0.5, max_bucket=3)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (10, 11) in got
    assert not any(x < 4 and y < 4 for x, y in got), got
    # uncapped finds the boilerplate cluster's pairs too
    full = dedup.minhash_lsh_pairs(df, "doc_id", "text", 0.5)
    gf = {(r["id_a"], r["id_b"]) for r in full.collect()}
    assert (0, 1) in gf and (10, 11) in gf


def test_minhash_from_shared_shingle_sets_is_bit_identical(spark):
    """The sets= derivation path (streaming patterns shingle batch text
    once and derive signatures/bands/verification from the shared frame)
    must be BIT-identical to the direct text path — shingles() is
    distinct and MIN aggregation is duplicate-insensitive, so both
    pipelines see the same shingle multiset."""
    from duckdb_streaming_patterns_spark.functions.text import shingles

    df = _docs(spark)
    sets = df.select("doc_id", shingles(F.col("text")).alias("s"))

    direct_sigs = dedup.minhash_signatures(df, "doc_id", "text").collect()
    shared_sigs = dedup.minhash_signatures(
        df, "doc_id", "text", sets=sets
    ).collect()
    assert {r["id"]: r["sig"] for r in direct_sigs} == {
        r["id"]: r["sig"] for r in shared_sigs
    }

    direct_bands = dedup.minhash_bands(df, "doc_id", "text").collect()
    shared_bands = dedup.minhash_bands(df, "doc_id", "text", sets=sets).collect()
    key = lambda r: (r["doc_id"], r["band_id"])  # noqa: E731
    assert {key(r): r["band_hash"] for r in direct_bands} == {
        key(r): r["band_hash"] for r in shared_bands
    }

    direct_pairs = dedup.minhash_lsh_pairs(df, "doc_id", "text", 0.5).collect()
    shared_pairs = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", 0.5, sets=sets
    ).collect()
    pk = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert {pk(r): r["jaccard"] for r in direct_pairs} == {
        pk(r): r["jaccard"] for r in shared_pairs
    }
