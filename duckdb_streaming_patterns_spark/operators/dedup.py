"""Deduplication operators for training-data pipelines (SURVEY §2.11).

Five tiers, all join/agg-shaped (no driver-side loops, no O(n²) scans unless
explicitly the exact-verification step over a *blocked* candidate set):

- exact:      hash-groupBy on content (or md5(content) for wide payloads)
- token/shingle Jaccard: exact set similarity over blocked pairs
- MinHash+LSH: shingle → 128 minhashes → 64 bands of 2 → band-bucket
  equi-join for candidates → exact-Jaccard verification
- SimHash:    64-bit fingerprint via per-bit majority of token hashes;
  near-dup = small Hamming distance within band buckets

At 100 TB the LSH band join is the only all-data shuffle, and it shuffles
(doc_id, band_key) pairs — a fixed small multiple of the row count — never
the full text. Exact verification only touches candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.text import (
    distinct_tokens,
    shingles,
    normalized_text,
)

# MinHash parameters: 64 hashes = 32 bands × 2 rows. P(candidate | s) =
# 1-(1-s^2)^32 → 1-1.2e-9 at s=0.7, so verified output at threshold 0.7
# equals the exact all-pairs result with overwhelming probability, at half
# the signature cost of the classic 128.
N_HASHES = 64
BAND_ROWS = 2
N_BANDS = N_HASHES // BAND_ROWS


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup: canonical row id per distinct content (min id)."""
    return df.groupBy(content_col).agg(F.min(id_col).alias(id_col))


def exact_dedup_by_hash(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup keyed on md5(content): at scale you shuffle the 16-byte
    hash, not the (arbitrarily wide) content."""
    h = F.md5(F.col(content_col)).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / union


def _balanced_sum(terms):
    """Pairwise-reduced addition tree: depth log2(n) instead of n. A 64-term
    linear chain generates one enormous nested-add method that Janino takes
    seconds to compile (and may kick out of whole-stage codegen); the
    balanced tree compiles fast and computes the same value."""
    terms = list(terms)
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return terms[0]


def _bucket_pairs(
    bucketed: DataFrame,
    key_cols: list[str],
    item_col,
    max_bucket: int | None = None,
) -> DataFrame:
    """Ordered within-bucket pairs via collect + in-array expansion.

    The naive candidate join self-joins the bucketed relation, which makes
    Catalyst compute the (expensive) upstream fingerprint aggregation
    TWICE — exchange reuse does not fire across the alias boundary. Here
    each bucket's items are collected once and pairs are expanded with
    array transforms: one scan, one aggregation, and the shuffle carries
    each item once per bucket key. Right for near-uniform small buckets
    (MinHash bands: 2-row bands make collisions rare). For blocking keys
    with LARGE clusters, prefer a persisted-input self-join instead — the
    quadratic in-bucket expansion runs in codegen there, while these array
    transforms are interpreted (see simhash_pairs).

    ``item_col`` must sort by id first (atom or struct with id leading) so
    pair order gives id_a < id_b. Returns columns ``a`` and ``b``.

    ``max_bucket`` drops buckets with more than that many items before the
    quadratic expansion — the hot-bucket cap: one degenerate key (empty or
    boilerplate-heavy docs hashing to the same band value) otherwise
    produces |bucket|² candidates and takes the whole stage down with it.
    A true near-dup pair lost to one capped band is recovered by its
    other bands with the standard LSH probability (two docs at J ≥ 0.7
    collide on ~16 of 32 bands in expectation); identical docs are caught
    by the exact tier before the near tier ever runs.
    """
    buckets = bucketed.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(item_col)).alias("items")
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("items") <= max_bucket)
    pair_arrays = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        buckets.filter(F.size("items") >= 2)
        .select(F.explode(pair_arrays).alias("p"))
        .select("p.a", "p.b")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    set_col: str,
    threshold: float,
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact set-Jaccard similar pairs (a.id < b.id), optionally blocked on
    equality columns (e.g. language) so the join is equi-shaped rather than
    a full cross product."""
    cols = [F.col(id_col).alias("id"), F.col(set_col).alias("s")] + [
        F.col(c) for c in block_cols
    ]
    left = df.select(*cols)
    right = (
        df.select(*cols)
        .withColumnRenamed("id", "id_b")
        .withColumnRenamed("s", "s_b")
    )
    cond = F.col("id") < F.col("id_b")
    for c in block_cols:
        cond = cond & (left[c] == right[c])
    pairs = left.join(right, cond)
    j = _jaccard(F.col("s"), F.col("s_b"))
    return (
        pairs.withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = N_HASHES,
    sets: DataFrame | None = None,
) -> DataFrame:
    """doc → array of n minhash values.

    Shape: explode shingles → one base xxhash64 per shingle → n_hashes
    derived hashes as a flat codegen'd projection → groupBy(doc) with
    n_hashes MIN aggregates. The per-row projection runs in whole-stage
    codegen (a nested higher-order-function fold would be interpreted —
    ~10× slower), and partial aggregation means the shuffle carries one
    n_hashes-wide row per (doc × partition), not per shingle.

    ``sets``: pre-computed (id, shingle-set) frame (column ORDER, any
    names) to explode instead of re-reading and re-shingling ``df`` —
    bit-identical output (shingles() is already distinct, and MIN
    aggregation is duplicate-insensitive regardless). The streaming
    near-dup pattern derives the band index from its shared shingle
    frame this way, so batch text is read and regex-shingled exactly
    once per micro-batch.

    Hash family: h_i = xxhash64(i, base_hash) — deterministic, no sampled
    coefficients to broadcast.
    """
    base = (
        sets.toDF("id", "__s")
        if sets is not None
        else df.select(
            F.col(id_col).alias("id"), shingles(F.col(text_col)).alias("__s")
        )
    )
    exploded = base.select(
        "id", F.explode("__s").alias("shingle")
    ).withColumn("h", F.xxhash64("shingle"))
    mins = exploded.groupBy("id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"m{i}") for i in range(n_hashes)]
    )
    return mins.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(n_hashes)]).alias("sig")
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    sets: DataFrame | None = None,
) -> DataFrame:
    """The LSH band index: (id, band_id, band_hash), one row per document
    per band. This is the AT-REST form a production corpus stores (a
    narrow table, n_bands rows × ~24 B per document): new batches join
    against it directly, so corpus text is never re-hashed — and, for
    incremental dedup, never even re-read.

    ``sets``: pre-computed (id, shingle-set) frame to derive the
    signatures from instead of re-shingling ``df`` — see
    minhash_signatures."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, sets=sets)
    n_bands = n_hashes // band_rows
    return sigs.select(
        F.col("id").alias(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    b, F.slice("sig", b * band_rows + 1, band_rows).cast("string")
                ),
            )
        ).alias("band_id", "band_hash"),
    )


MAX_BAND_BUCKET = 1024  # hot-bucket cap: see _bucket_pairs / band_candidates


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    bands: DataFrame | None = None,
    max_bucket: int | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    candidate generation: explode each signature into (band_id, band_hash)
    keys; equi-join on the band key. Only candidate pairs are verified with
    the exact Jaccard on shingle sets — the O(n²) step never materializes.

    ``bands``: pre-computed ``minhash_bands(df, ...)`` output — pass it
    when the caller already materialized the band index (the streaming
    near-dup pattern shares ONE band computation between its state append,
    the cross-corpus candidate join, and this batch-internal pair search,
    so batch text is hashed exactly once per micro-batch).

    ``sets``: pre-computed (id, shingle-set) frame (column ORDER, any
    names) for the exact-Jaccard verification — same sharing idea as
    ``bands``: the streaming pattern computes the batch's shingle sets
    once and reuses them here, in the docs-state append, and in the
    cross-corpus verify, so batch text is shingled exactly once per
    micro-batch.

    ``max_bucket`` caps band-bucket size before the quadratic candidate
    expansion (see _bucket_pairs). The BATCH-facing default is None —
    the registered batch queries carry an exact all-pairs oracle, and a
    silently-tripped cap at a larger SF would fail the driver hash check
    with no signal that the cap (not the LSH math) caused it. The
    streaming/incremental callers pass ``MAX_BAND_BUCKET`` explicitly:
    at 100 TB it bounds the worst band key to max_bucket² candidates
    instead of letting one boilerplate cluster go quadratic in corpus
    size (true matches lost to a capped band are recovered by the doc's
    other bands with standard LSH probability).
    """
    bands = (
        bands
        if bands is not None
        else minhash_bands(df, id_col, text_col, n_hashes, band_rows, sets=sets)
    ).withColumnRenamed(id_col, "id")
    cand = (
        _bucket_pairs(
            bands, ["band_id", "band_hash"], F.col("id"), max_bucket=max_bucket
        )
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification only on candidates: join the shingle sets back in
    sets = (
        sets.toDF("sid", "s")
        if sets is not None
        else df.select(
            F.col(id_col).alias("sid"), shingles(F.col(text_col)).alias("s")
        )
    )
    cand = (
        cand.join(sets.withColumnRenamed("sid", "id_a").withColumnRenamed("s", "s_a"), "id_a")
        .join(sets.withColumnRenamed("sid", "id_b").withColumnRenamed("s", "s_b"), "id_b")
    )
    j = _jaccard(F.col("s_a"), F.col("s_b"))
    return (
        cand.withColumn("jaccard", j)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def incremental_exact_matches(
    batch: DataFrame,
    corpus: DataFrame,
    content_col: str,
    id_col: str,
) -> DataFrame:
    """Exact-content matches of a NEW batch against an EXISTING corpus:
    (batch_id, corpus_id) where md5(content) is identical, corpus_id = the
    minimum matching corpus id.

    The production shape for continuous ingestion: the corpus side reduces
    to (content_hash, min id) — at rest this is a stored index that never
    gets recomputed — and the batch side is hashed fresh and broadcast
    (a batch is ≪ the corpus by definition; if it ever isn't, drop the
    broadcast hint and this is a plain equi-join on the 16-byte hash).
    The corpus is scanned once and NEVER shuffled: Spark plans a broadcast
    hash join keyed on the md5."""
    c = (
        corpus.select(
            F.md5(F.col(content_col)).alias("content_hash"),
            F.col(id_col).alias("corpus_id"),
        )
        .groupBy("content_hash")
        .agg(F.min("corpus_id").alias("corpus_id"))
    )
    b = batch.select(
        F.col(id_col).alias("batch_id"),
        F.md5(F.col(content_col)).alias("content_hash"),
    )
    return c.join(F.broadcast(b), "content_hash").select("batch_id", "corpus_id")


def band_candidates(
    corpus_bands: DataFrame,
    batch_bands: DataFrame,
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct (batch_id, corpus_id) candidate pairs from the band-index
    equi-join: corpus index ⋈ BROADCAST batch index — the corpus side
    never shuffles. Inputs are (id, band_id, band_hash)-shaped (column
    ORDER, any id name).

    ``max_bucket`` is the incremental hot-bucket cap: drop band keys
    matched by more than that many DISTINCT corpus docs — one degenerate
    band value (boilerplate/near-empty docs) otherwise floods the verify
    join with |hot bucket| candidates per batch doc. The count is a
    window over the already-joined, batch-relevant-only frame — a single
    pass that shuffles O(candidate rows), never aggregating the full
    at-rest index. True matches lost to a capped band are recovered by
    the doc's other bands with standard LSH probability; identical docs
    are caught by the exact tier first."""
    cb = corpus_bands.toDF("corpus_id", "band_id", "band_hash")
    bb = batch_bands.toDF("batch_id", "band_id", "band_hash")
    joined = cb.join(F.broadcast(bb), ["band_id", "band_hash"])
    if max_bucket is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("band_id", "band_hash")
        joined = joined.withColumn(
            "__n", F.size(F.collect_set("corpus_id").over(w))
        ).filter(F.col("__n") <= max_bucket)
    return joined.select("batch_id", "corpus_id").dropDuplicates(
        ["batch_id", "corpus_id"]
    )


def verify_jaccard_matches(
    cand: DataFrame,
    batch_sets: DataFrame,
    corpus_sets: DataFrame,
    threshold: float,
    join_cols: tuple[str, ...] = ("corpus_id",),
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs.
    ``cand``: (batch_id, corpus_id); ``batch_sets``: (batch_id, s_b);
    ``corpus_sets``: (corpus_id, s_c). The candidate side (⋈ batch sets)
    is candidate-sized and broadcast, so the corpus side of the verify
    join stays a pure scan — no Exchange on any corpus-derived relation
    (asserted in tests/test_plans.py).

    ``join_cols`` extends the verify-join key: when the corpus state is
    hive-partitioned on a derived bucket column and BOTH sides carry it
    (``("corpus_id", "__kb")``), the broadcast join equi-key on the
    partition column lets Spark insert a dynamic-partition-pruning
    subquery — the corpus scan then reads only partitions that hold
    candidates, lazily, with no driver-side bucket collection."""
    verified = (
        corpus_sets.join(
            F.broadcast(cand.join(F.broadcast(batch_sets), "batch_id")),
            list(join_cols),
        )
        .withColumn("jaccard", _jaccard(F.col("s_b"), F.col("s_c")))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    )


def incremental_neardup_matches(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    corpus_bands: DataFrame | None = None,
    batch_bands: DataFrame | None = None,
    corpus_sets: DataFrame | None = None,
    max_bucket: int | None = MAX_BAND_BUCKET,
) -> DataFrame:
    """Near-dup matches of a NEW batch against an EXISTING corpus:
    (batch_id, corpus_id, jaccard) for every cross pair with shingle
    Jaccard ≥ threshold. Incremental MinHash+LSH: candidates come from the
    corpus band index equi-joined with the (broadcast) batch band index,
    exact Jaccard is verified on candidates only.

    100 TB shape: pass ``corpus_bands`` — the at-rest (id, band_id,
    band_hash) index ``minhash_bands`` produces, stored once and appended
    per ingested batch — and the whole operator is one narrow index scan
    plus two broadcast joins: NOTHING corpus-sized ever shuffles, and
    corpus text is only read for the candidate rows in the verify join.
    Without it the bands are computed in-line, which adds the signature
    partial-aggregation's corpus-KEYED shuffle (narrow: one 64-value row
    per doc × map partition — never text) — correct, but the index is the
    point of the incremental shape. Batch-internal duplicates are NOT
    emitted here (run minhash_lsh_pairs on the batch for those); this
    operator answers "which new docs already exist".

    ``corpus_sets``: pre-computed (id, shingle-set) corpus state — the
    at-rest form the streaming pattern stores, so verification reads the
    narrow set column instead of re-shingling raw text every batch.
    ``max_bucket``: the hot-bucket cap (see band_candidates; the default
    never trips at the tested SFs, so oracle exactness is untouched).
    """
    cb = (
        corpus_bands
        if corpus_bands is not None
        else minhash_bands(corpus, id_col, text_col, n_hashes, band_rows)
    )
    bb = (
        batch_bands
        if batch_bands is not None
        else minhash_bands(batch, id_col, text_col, n_hashes, band_rows)
    )
    cand = band_candidates(cb, bb, max_bucket=max_bucket)
    b_sets = batch.select(
        F.col(id_col).alias("batch_id"), shingles(F.col(text_col)).alias("s_b")
    )
    c_sets = (
        corpus_sets.toDF("corpus_id", "s_c")
        if corpus_sets is not None
        else corpus.select(
            F.col(id_col).alias("corpus_id"),
            shingles(F.col(text_col)).alias("s_c"),
        )
    )
    return verify_jaccard_matches(cand, b_sets, c_sets, threshold)


SIMHASH_BITS = 60


def portable_token_hash(col) -> "F.Column":
    """60-bit token hash every engine can reproduce: the first 15 hex chars
    of md5 as an integer. xxhash64 would be marginally faster JVM-side but
    is Spark-specific — md5 exists identically in DuckDB/Postgres/etc., so
    SimHash fingerprints built on it are oracle-checkable bit for bit
    (DUCKDB_HEX15 below is the other half of the contract). 15 hex chars
    = 60 bits < 2^63 keeps every value positive in a BIGINT on both
    engines: no sign-bit special cases in masks or shifts."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# DuckDB fragment computing the same 60-bit value from a hex column {m}
# (exact integer arithmetic: digit × 16^k with literal BIGINT powers —
# power() returns DOUBLE, which cannot hold a 60-bit sum exactly).
_HEX15_POWERS = [16 ** (15 - i) for i in range(1, 16)]
DUCKDB_HEX15 = (
    "CAST(list_sum(list_transform(range(1,16),"
    " i -> (strpos('0123456789abcdef', {m}[i]) - 1)"
    f" * ({_HEX15_POWERS}::BIGINT[])[i])) AS BIGINT)"
)


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """SimHash fingerprints: per-bit majority vote over token hashes.

    Shaped as explode(tokens) → per-(doc, bit) signed vote → groupBy doc.
    Token hashing via portable_token_hash (md5-derived, 60-bit) so the
    fingerprint — and therefore the near-dup pair set — is engine-portable
    and exactly oracle-checkable. Shuffle volume = rows × bits of tiny
    ints; partial aggregation keeps it one row per (doc × partition).
    """
    masks = [1 << b for b in range(bits)]
    # Shape: explode token set → one hash per token → `bits` ±1 vote columns
    # (flat codegen'd projection) → groupBy(doc) summing votes map-side.
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(distinct_tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", portable_token_hash(F.col("tok")))
    votes = exploded.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b, m in enumerate(masks)
        ]
    )
    # fingerprint = OR of masks where the vote is positive; masks are
    # disjoint bits so integer addition == bitwise OR (balanced tree —
    # a 64-deep linear add chain stalls Janino compilation).
    fp = _balanced_sum(
        F.when(F.col(f"v{b}") > 0, F.lit(m).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b, m in enumerate(masks)
    )
    return votes.select("id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidate-blocked on
    15-bit fingerprint quarters (a pair within Hamming ≤3 of 60 bits must
    agree exactly on at least one of the 4 quarters — pigeonhole). The
    blocking is therefore lossless: the blocked join returns EXACTLY the
    all-pairs Hamming ≤3 set, which is what the DuckDB oracle computes
    with an unblocked self-join at test scale.

    Candidates come from a hash self-join on the quarter key: near-dup
    corpora have LARGE clusters (every pair in a cluster shares quarters),
    and the codegen'd join handles the quadratic in-bucket expansion far
    better than interpreted array transforms (measured 2x at sf0.1). The
    fingerprints are persisted first so the expensive vote aggregation
    runs once, not once per join side — exchange reuse does not fire
    across the self-join alias boundary. The cache entry is one 16-byte
    row per doc; it lives until the session drops it."""
    fps = simhash(df, id_col, text_col).persist()
    quarters = fps.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright("simhash", q * (SIMHASH_BITS // 4))
                        .bitwiseAND((1 << (SIMHASH_BITS // 4)) - 1)
                        .alias("qh"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("qq"),
    ).select("id", "simhash", "qq.q", "qq.qh")
    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qh") == F.col("b.qh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over the near-dup pair graph: every node gets
    ``cluster`` = the minimum node id in its component (singletons cluster
    with themselves). This is the step that turns pairwise near-dup output
    into actionable dedup groups.

    Algorithm: iterative min-label propagation — each round every node
    takes min(own label, neighbors' labels); converges in O(graph
    diameter) rounds. Near-dup components are quasi-cliques (every member
    pairs with most others), so diameter is 1-2 and the loop exits after
    2-3 rounds; for adversarially chain-shaped graphs the known fix is the
    large-star/small-star contraction (Kiveris et al., MR-CC — see
    connected_components_star below). Convergence is detected by COUNTING
    CHANGED LABELS — a flag column on the frame the round already joins,
    so it costs one scalar agg and no extra join, and (unlike a label-SUM
    probe) works for string/any orderable id types where SUM would be
    NULL. Each round shuffles (src, label) pairs — never document content.

    Each round's labels are ``localCheckpoint``ed, not merely persisted:
    ``labels`` appears TWICE in the next round's plan (neighbor-min build
    and the join back), so without lineage truncation the logical plan
    doubles per round — by round ~10 analysis/codegen alone OOMs the
    driver, long before any data-size limit. Checkpointing keeps the plan
    O(1)-deep however many rounds run; the checkpointed blocks are
    (id, label) pairs only and are GC'd when the frame is dropped.

    ``nodes``: one column ``id_col``; ``edges``: columns id_a/id_b.
    Returns (id, cluster).
    """
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = sym.persist()
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        flagged = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nbr_min"), F.col("cluster"))
                ).alias("cluster"),
                (F.col("nbr_min") < F.col("cluster")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = (
            flagged.agg(F.sum(F.col("__changed").cast("long"))).first()[0] or 0
        )
        labels = flagged.drop("__changed")
        if n_changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        # A component with diameter > max_iters (chain-shaped, not the
        # quasi-clique shape near-dup graphs have). Silent partial
        # convergence would split components, so switch to the
        # O(log²)-round star contraction, which handles any shape.
        return connected_components_star(nodes, edges, id_col)
    return labels


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — O(log² n) rounds regardless of graph diameter,
    the scale-safe path for chain-shaped graphs where per-round min-label
    propagation needs O(diameter) rounds.

    One round:
    - large-star: every node u links each STRICTLY LARGER neighbor to
      m(u) = min(Γ(u) ∪ {u});
    - small-star: edges pointed large→small; every node u re-links its
      smaller-or-equal neighborhood (and itself) into a star on m(u).
    Both steps are groupBy(min) + equi-join — each round shuffles (node,
    label) pairs only, and the edge frame is localCheckpoint'ed per round
    so lineage stays O(1) however many rounds run.

    At the fixed point the edge set is a star forest (v, root) with root =
    the component minimum. Same contract as connected_components:
    ``nodes`` has ``id_col``; ``edges`` has id_a/id_b; returns
    (id, cluster) with singletons labelled by themselves.
    """
    e = (
        edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("lo"), F.greatest("u", "v").alias("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        prev = e
        # large-star over the symmetric closure
        sym = prev.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionByName(
            prev.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("u", "mv").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
        )
        # small-star on large's output (edges already point large→small
        # because each pair is stored as (lo, hi))
        dir_ = large.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        mins2 = dir_.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            dir_.join(mins2, "u")
            .select(
                F.col("m"),
                F.explode(F.array(F.col("v"), F.col("u"))).alias("n"),
            )
            .filter(F.col("m") != F.col("n"))
            .select(F.col("m").alias("lo"), F.col("n").alias("hi"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        e = small
        # fixed point: the edge SET is unchanged (counts + one anti-join)
        n_new = e.count()
        if n_new == prev.count() and e.subtract(prev).count() == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds — O(log² n) bound exceeded; graph larger than this "
            "configuration supports"
        )
    # star forest: every non-root points at its component min
    labels = e.groupBy(F.col("hi").alias("id")).agg(F.min("lo").alias("cluster"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select("id", F.coalesce("cluster", F.col("id")).alias("cluster"))
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercase text —
    engine-portable (md5 is identical everywhere), used as the exact-dedup
    key for wide documents."""
    return df.select(
        F.col(id_col),
        F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Bloom-filter membership gate (Dolma-style): the KB-sized stand-in for a
# broadcast gram set when the reference set has billions of entries.
# --------------------------------------------------------------------------

BLOOM_BITS = 1 << 18  # 262144 bits = 32 KB
BLOOM_K = 3  # three disjoint 20-bit slices of the portable 60-bit hash


def bloom_positions(col) -> "F.Column":
    """The BLOOM_K bit positions for a gram: disjoint 20-bit slices of the
    portable 60-bit md5 hash, reduced mod BLOOM_BITS — pure integer
    arithmetic both engines reproduce exactly, so the bloom DECISION
    (including its false positives) is oracle-checkable."""
    h = portable_token_hash(col)
    return F.array(
        *[
            F.pmod(F.shiftright(h, 20 * j), F.lit(BLOOM_BITS)).cast("long")
            for j in range(BLOOM_K)
        ]
    )


def bloom_build(grams: DataFrame, gram_col: str = "g") -> bytes:
    """Build the bitset from a gram relation. The collect is the DISTINCT
    bit-position set — bounded by min(BLOOM_K·|grams|, BLOOM_BITS), i.e. by
    the filter's 32 KB capacity, never by corpus size."""
    rows = (
        grams.select(F.explode(bloom_positions(F.col(gram_col))).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for r in rows:
        p = int(r["p"])
        bits[p >> 3] |= 1 << (p & 7)
    return bits.tobytes()


def bloom_hit_count(grams_col, bitset: bytes) -> "F.Column":
    """COLUMN form of the bloom membership count — how many of the gram
    array's entries the bitset claims are members. Positions are computed
    JVM-side (md5 + integer slices per gram), then an Arrow-batched UDF
    tests them against the closure-broadcast 32 KB bitset — the corpus
    never shuffles and the reference set never travels beyond the bitset.
    Extracted from ``bloom_flag_docs`` (r17) so single-pass consumers
    (the funnel's fused quality+bloom projection) can evaluate the probe
    in the SAME select as their other per-row expressions instead of a
    second text pass + join."""
    bits = np.frombuffer(bitset, dtype=np.uint8)

    @F.pandas_udf("long")
    def n_hits(pos_lists: pd.Series) -> pd.Series:
        out = []
        for gram_positions in pos_lists:
            if len(gram_positions) == 0:
                out.append(0)
                continue
            # one vectorized bit-test over the batch row's (grams × k)
            # position matrix instead of per-gram Python loops
            ps = np.asarray(
                [np.asarray(p, dtype=np.int64) for p in gram_positions]
            )
            hit = (bits[ps >> 3] & (1 << (ps & 7)).astype(np.uint8)) != 0
            out.append(int(hit.all(axis=1).sum()))
        return pd.Series(out, dtype="int64")

    return n_hits(F.transform(grams_col, lambda g: bloom_positions(g)))


def bloom_flag_docs(
    docs_grams: DataFrame,
    bitset: bytes,
    id_col: str = "doc_id",
    grams_col: str = "s",
) -> DataFrame:
    """Per doc: how many of its (distinct) grams the bloom filter claims
    are members — the DataFrame wrapper over :func:`bloom_hit_count`.
    Output: (id, n_grams, n_flagged, bloom_flagged)."""
    return (
        docs_grams.select(
            F.col(id_col),
            F.size(grams_col).cast("long").alias("n_grams"),
            bloom_hit_count(F.col(grams_col), bitset).alias("n_flagged"),
        )
        .withColumn("bloom_flagged", F.col("n_flagged") > 0)
    )


# DuckDB fragment for one gram's j-th bloom bit position ({m} = a column
# holding md5(gram); j from a range(0, BLOOM_K) lateral named j) — kept
# beside the Spark arithmetic it must replay bit for bit.
DUCKDB_BLOOM_POS = (
    f"(({DUCKDB_HEX15.format(m='m')} >> (20 * j.j)) % {BLOOM_BITS})"
)
