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


def _bucket_pairs(bucketed: DataFrame, key_cols: list[str], item_col) -> DataFrame:
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
    """
    buckets = bucketed.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list(item_col)).alias("items")
    )
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
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = N_HASHES
) -> DataFrame:
    """doc → array of n minhash values.

    Shape: explode shingles → one base xxhash64 per shingle → n_hashes
    derived hashes as a flat codegen'd projection → groupBy(doc) with
    n_hashes MIN aggregates. The per-row projection runs in whole-stage
    codegen (a nested higher-order-function fold would be interpreted —
    ~10× slower), and partial aggregation means the shuffle carries one
    n_hashes-wide row per (doc × partition), not per shingle.

    Hash family: h_i = xxhash64(i, base_hash) — deterministic, no sampled
    coefficients to broadcast.
    """
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col))).alias("shingle"),
    ).withColumn("h", F.xxhash64("shingle"))
    mins = exploded.groupBy("id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"m{i}") for i in range(n_hashes)]
    )
    return mins.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(n_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    candidate generation: explode each signature into (band_id, band_hash)
    keys; equi-join on the band key. Only candidate pairs are verified with
    the exact Jaccard on shingle sets — the O(n²) step never materializes.
    """
    sigs = minhash_signatures(df, id_col, text_col, n_hashes)
    n_bands = n_hashes // band_rows
    bands = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    b, F.slice("sig", b * band_rows + 1, band_rows).cast("string")
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    cand = (
        _bucket_pairs(bands, ["band_id", "band_hash"], F.col("id"))
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification only on candidates: join the shingle sets back in
    sets = df.select(
        F.col(id_col).alias("sid"), shingles(F.col(text_col)).alias("s")
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


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprints: per-bit majority vote over token hashes.

    Shaped as explode(tokens) → per-(doc, bit) signed vote → groupBy doc.
    Token hashing via xxhash64 (JVM). Shuffle volume = rows × bits of tiny
    ints; at scale prefer the aggregate form below which keeps it rows ×
    1 array column.
    """
    # Bit masks unrolled in Python (shift amounts must be literals); bit 63's
    # mask is the sign bit, i.e. long MIN_VALUE in two's complement.
    masks = [(1 << b) if b < 63 else -(1 << 63) for b in range(bits)]
    # Shape: explode token set → one xxhash64 per token → 64 ±1 vote columns
    # (flat codegen'd projection) → groupBy(doc) summing votes map-side.
    # The shuffle carries one 64-int row per (doc × partition).
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(distinct_tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
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
    16-bit fingerprint quarters (a pair within Hamming ≤3 of 64 bits must
    agree exactly on at least one of the 4 quarters — pigeonhole).

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
                        F.shiftright("simhash", q * 16)
                        .bitwiseAND(0xFFFF)
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
    large-star/small-star contraction (Kiveris et al., MR-CC) which this
    loop's join structure extends to. Convergence is detected by the label
    SUM (strictly decreasing until fixpoint — one scalar agg per round,
    no full-table diff join). Each round shuffles (src, label) pairs —
    never document content.

    ``nodes``: one column ``id_col``; ``edges``: columns id_a/id_b.
    Returns (id, cluster).
    """
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = sym.persist()
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster")
    ).persist()
    prev_sum = labels.agg(F.sum("cluster")).first()[0] or 0
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nbr_min"), F.col("cluster"))
                ).alias("cluster"),
            )
            .persist()
        )
        cur_sum = new_labels.agg(F.sum("cluster")).first()[0] or 0
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    sym.unpersist()
    if not converged:
        # Silent partial convergence would split components (and, e.g.,
        # keep multiple "canonical" docs per duplicate family) — fail loud.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "the pair graph has a component with diameter > max_iters "
            "(chain-shaped, not clique-shaped) — raise max_iters or switch "
            "to large-star/small-star contraction"
        )
    return labels


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercase text —
    engine-portable (md5 is identical everywhere), used as the exact-dedup
    key for wide documents."""
    return df.select(
        F.col(id_col),
        F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
    )
