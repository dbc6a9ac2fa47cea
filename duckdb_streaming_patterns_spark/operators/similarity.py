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

from duckdb_streaming_patterns_spark.functions.vectors import cosine_similarity


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
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("q_vec"), F.col("c_vec")))
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


def _hyperplane_sign(vec, plane_idx: int) -> "F.Column":
    """Sign of <v, h_p> where h_p[d] is a deterministic pseudo-random ±…
    value derived from xxhash64(plane_idx, d). Gives reproducible random
    hyperplanes with zero sampled state."""
    d_idx = F.sequence(F.lit(1), F.size(vec))
    comps = F.zip_with(
        vec,
        d_idx,
        lambda x, d: x.cast("double")
        * (F.xxhash64(F.lit(plane_idx), d).cast("double") / F.lit(float(2**63))),
    )
    proj = F.aggregate(comps, F.lit(0.0), lambda acc, x: acc + x)
    return (proj >= 0).cast("int")


def lsh_signature(vec_col: str, n_planes: int, table: int = 0):
    """n_planes sign bits → one integer bucket id. ``table`` offsets the
    hyperplane indices so each hash table uses an independent family."""
    vec = F.col(vec_col)
    bits = [
        _hyperplane_sign(vec, table * n_planes + p) for p in range(n_planes)
    ]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig + (b.cast("long") * F.lit(2**i))
    return sig


def _lsh_keys(df: DataFrame, id_alias: str, vec_alias: str, id_col: str,
              vec_col: str, n_planes: int, n_tables: int) -> DataFrame:
    """Explode each row into (table, bucket) keys — one per hash table."""
    keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_signature(vec_col, n_planes, t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.explode(keys).alias("key"),
    ).select(id_alias, vec_alias, "key.table", "key.bucket")


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
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col))
    a = df.select(*cols)
    b = (
        df.select(*cols)
        .withColumnRenamed("id", "id_b")
        .withColumnRenamed("v", "v_b")
    )
    cond = F.col("id") < F.col("id_b")
    if block_col:
        cond = cond & (a[block_col] == b[block_col])
    pairs = a.join(b, cond)
    cos = cosine_similarity(F.col("v"), F.col("v_b"))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            F.round("cosine", 6).alias("cosine"),
        )
    )
