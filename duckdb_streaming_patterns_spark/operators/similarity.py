"""Similarity search over embedding columns (SURVEY §2.11).

- brute-force cosine top-k: the correctness baseline. Join-shaped: broadcast
  the (small) query set against the corpus, per-partition heap via
  row_number window. Exact.
- LSH-bucketed ANN (random hyperplane signs): the scale path. Candidate set
  = corpus rows sharing a signature bucket with the query; exact cosine only
  on candidates. Hyperplanes are derived deterministically from xxhash64 so
  there is no sampled state to broadcast and results are reproducible.
- IVF-style variant: coarse centroids by k-means-free binning (label column
  or signature prefix) — provided as partition pruning over the bucketed
  table.

At 100 TB: corpus stays partitioned; only the query side is broadcast; the
expensive exact cosine runs on candidates only. For massive query sets,
swap broadcast for a bucket-to-bucket co-partitioned join on the signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected small (it is broadcast). Self-matches excluded.
    Output: (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    # norms precomputed per row (n, not n×m); per-pair work is the dot fold
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot(F.col("q_vec"), F.col("c_vec")) / F.col("q_norm") / F.col("c_norm"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _lsh_keys(df: DataFrame, id_alias: str, vec_alias: str, id_col: str,
              vec_col: str, n_planes: int, n_tables: int) -> DataFrame:
    """Explode each row into (table, bucket) keys — one per hash table.

    Hyperplane components are xxhash64(plane, dim)/2^63 — deterministic,
    zero sampled state. Shape: posexplode the vector → one codegen'd
    projection column per plane → groupBy(id) partial SUMs → sign bits →
    bucket ids. (A per-plane higher-order fold would be interpreted; the
    explode/agg form is codegen'd end to end and shuffles one
    n_planes·n_tables-wide row per vector.)
    """
    total_planes = n_planes * n_tables
    exploded = df.select(
        F.col(id_col).alias(id_alias),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    )
    projections = exploded.groupBy(id_alias).agg(
        *[
            F.sum(
                F.col("x").cast("double")
                * (
                    F.xxhash64(F.lit(p), F.col("d")).cast("double")
                    / F.lit(float(2**63))
                )
            ).alias(f"proj{p}")
            for p in range(total_planes)
        ]
    )
    buckets = []
    for t in range(n_tables):
        sig = F.lit(0).cast("long")
        for i in range(n_planes):
            p = t * n_planes + i
            sig = sig + (F.col(f"proj{p}") >= 0).cast("long") * F.lit(2**i)
        buckets.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
    keyed = projections.select(
        id_alias, F.explode(F.array(*buckets)).alias("key")
    ).select(id_alias, "key.table", "key.bucket")
    vecs = df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias))
    return keyed.join(vecs, id_alias)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """ANN top-k: exact cosine restricted to LSH candidates — rows sharing
    a bucket with the query in ANY of the n_tables hash tables (standard
    multi-table random-hyperplane LSH; recall grows with n_tables, cost per
    table with 2^-n_planes). At scale the n×m cross join becomes an
    equi-join on (table, bucket), shuffling each row n_tables times."""
    c = _lsh_keys(corpus, "neighbor_id", "c_vec", id_col, vec_col, n_planes, n_tables)
    q = _lsh_keys(queries, "query_id", "q_vec", id_col, vec_col, n_planes, n_tables)
    cand = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine", cosine_similarity(F.col("q_vec"), F.col("c_vec"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold),
    equi-blocked (default: label) so candidate generation is join-shaped."""
    cols = [
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    ]
    if block_col:
        cols.append(F.col(block_col))
    a = df.select(*cols)
    b = (
        df.select(*cols)
        .withColumnRenamed("id", "id_b")
        .withColumnRenamed("v", "v_b")
        .withColumnRenamed("nrm", "nrm_b")
    )
    cond = F.col("id") < F.col("id_b")
    if block_col:
        cond = cond & (a[block_col] == b[block_col])
    pairs = a.join(b, cond)
    cos = dot(F.col("v"), F.col("v_b")) / F.col("nrm") / F.col("nrm_b")
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            F.round("cosine", 6).alias("cosine"),
        )
    )
