"""Similarity-search query registrations (SURVEY §2.11) over the
`embeddings` fixture. The cosine oracle SQL mirrors the Spark expression
fold-for-fold (sequential double sums), so similarity values — and therefore
thresholds and rank boundaries — agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.queries import register, _t
from duckdb_streaming_patterns_spark.operators import similarity
from duckdb_streaming_patterns_spark.functions.vectors import duckdb_cosine

_COS = duckdb_cosine("q_vec", "c_vec")

_KNN_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
               FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec
               FROM embeddings),
         s AS (SELECT query_id, neighbor_id, {_COS} AS cosine
               FROM q, c WHERE query_id <> neighbor_id),
         r AS (SELECT query_id, neighbor_id, cosine,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rank
               FROM s)
    SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 10
"""


@register("knn_bruteforce", _KNN_ORACLE)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for query vectors vec_id ∈ [0,5)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_bruteforce(emb, queries, k=10)


_NEARDUP_COS = duckdb_cosine("a.embedding", "b.embedding")

_NEARDUP_ORACLE = f"""
    SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_NEARDUP_COS} AS cosine
      FROM embeddings a
      JOIN embeddings b ON a.vec_id < b.vec_id AND a.label = b.label
    ) WHERE cosine >= 0.35
"""


@register("embedding_neardup_pairs", _NEARDUP_ORACLE)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding pairs with cosine ≥ 0.35, equi-blocked on label so pair
    generation is join-shaped (the 100 TB path: blocked or LSH-bucketed,
    never unblocked n²). Threshold sits where the fixture's pair set is
    non-trivial (it contains no planted >0.9 duplicates)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_pairs(
        emb, threshold=0.35, block_col="label"
    )


@register("embedding_neardup_lsh", None)
def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlabeled-corpus near-dup pairs: LSH-bucketed blocking (4 planes ×
    16 tables) instead of a label column — the blocking strategy a real
    100 TB corpus needs. No SQL oracle (Spark-seeded hyperplanes make the
    candidate set engine-specific); tests/test_similarity.py pins recall
    of the exact ≥-threshold pair set."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_neardup_pairs(emb, threshold=0.35)


@register("knn_lsh_ann", None)
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors via multi-table random-hyperplane LSH.
    No SQL oracle (the hyperplane family is Spark-seeded);
    tests/test_similarity.py checks recall against the exact result."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_lsh(emb, queries, k=10, n_planes=6, n_tables=8)


@register("knn_ivf_ann", None)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors via IVF coarse quantization: nearest
    n_probe of 16 centroid cells per query, exact cosine inside the probed
    cells. No SQL oracle (centroids come from distributed Lloyd
    iterations); tests/test_similarity.py checks recall vs exact."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_ivf(
        emb, queries, k=10, n_centroids=16, n_probe=4, iters=2
    )
