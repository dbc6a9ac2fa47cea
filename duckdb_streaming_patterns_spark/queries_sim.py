"""Similarity-search query registrations (SURVEY §2.11) over the
`embeddings` fixture. The cosine oracle SQL mirrors the Spark expression
fold-for-fold (sequential double sums), so similarity values — and therefore
thresholds and rank boundaries — agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.registry import register, _t
from duckdb_streaming_patterns_spark.operators import similarity
from duckdb_streaming_patterns_spark.functions.vectors import duckdb_cosine

# Fixture embedding dimensionality (constant across every sf — asserted by
# tests/test_similarity.py); the oracle SQL inlines dim-sized hyperplane
# literals so it must be known at registration time.
_DIM = 64


def _lsh_bucket_sql(n_planes: int, n_tables: int, seed: int = 42):
    """DuckDB fragments replaying similarity._lsh_keys bit for bit.

    Returns (w_cte, bucket_select_list). The hyperplane matrix comes from
    the SAME lsh_planes() the Spark UDF uses, flattened column-major into
    one DOUBLE[] literal (repr round-trips IEEE754 exactly); each bucket
    bit is the sign of a sequential left-to-right double fold — the order
    DuckDB's list_sum evaluates and the Spark UDF reproduces, so bucket
    assignments agree exactly."""
    planes = similarity.lsh_planes(_DIM, n_planes, n_tables, seed)
    n_total = n_planes * n_tables
    w_flat = ", ".join(
        repr(float(planes[i, c])) for c in range(n_total) for i in range(_DIM)
    )
    w_cte = f"w AS (SELECT [{w_flat}]::DOUBLE[] AS w)"

    def dot(c: int) -> str:
        return (
            f"list_sum(list_transform(range(1,{_DIM + 1}),"
            f" i -> CAST(embedding[i] AS DOUBLE) * w[{c * _DIM} + i]))"
        )

    buckets = []
    for t in range(n_tables):
        terms = " + ".join(
            f"(CASE WHEN {dot(t * n_planes + p)} >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )
        buckets.append(f"CAST({terms} AS BIGINT) AS b{t}")
    return w_cte, ",\n             ".join(buckets)

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


_ND_W_CTE, _ND_BUCKETS = _lsh_bucket_sql(n_planes=4, n_tables=16)
_ND_MATCH = " OR ".join(f"a.b{t} = b.b{t}" for t in range(16))
_ND_LSH_ORACLE = f"""
    WITH {_ND_W_CTE},
         k AS (SELECT vec_id, embedding,
             {_ND_BUCKETS}
             FROM embeddings, w)
    SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {duckdb_cosine("a.embedding", "b.embedding")} AS cosine
      FROM k a JOIN k b ON a.vec_id < b.vec_id AND ({_ND_MATCH})
    ) WHERE cosine >= 0.35
"""


@register("embedding_neardup_lsh", _ND_LSH_ORACLE)
def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlabeled-corpus near-dup pairs: LSH-bucketed blocking (4 planes ×
    16 tables) instead of a label column — the blocking strategy a real
    100 TB corpus needs. The oracle replays the (deterministic,
    fold-ordered) bucket assignment with inlined hyperplane literals, so
    the candidate set — and therefore the emitted pair set — is exactly
    checkable; tests/test_similarity.py additionally pins recall ≥ 0.7 of
    the exact ≥-threshold pair set."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_neardup_pairs(emb, threshold=0.35)


_KNN_N_PLANES, _KNN_N_TABLES = 6, 8
_KNN_W_CTE, _KNN_BUCKETS = _lsh_bucket_sql(_KNN_N_PLANES, _KNN_N_TABLES)
# multi-probe: a corpus row is a candidate if its bucket equals the query's
# bucket OR any Hamming-1 neighbor of it (single-bit xor probes), per table.
_KNN_MATCH = " OR ".join(
    "c.b{t} IN (q.b{t}, {probes})".format(
        t=t,
        probes=", ".join(
            f"xor(q.b{t}, {1 << p})" for p in range(_KNN_N_PLANES)
        ),
    )
    for t in range(_KNN_N_TABLES)
)
_KNN_LSH_ORACLE = f"""
    WITH {_KNN_W_CTE},
         k AS (SELECT vec_id, embedding,
             {_KNN_BUCKETS}
             FROM embeddings, w),
         q AS (SELECT * FROM k WHERE vec_id < 5),
         cand AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  q.embedding AS q_vec, c.embedding AS c_vec
           FROM q JOIN k c ON q.vec_id <> c.vec_id AND ({_KNN_MATCH})
         ),
         s AS (SELECT query_id, neighbor_id,
                      {duckdb_cosine("q_vec", "c_vec")} AS cosine
               FROM cand),
         r AS (SELECT query_id, neighbor_id, cosine,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rank
               FROM s)
    SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 10
"""


@register("knn_lsh_ann", _KNN_LSH_ORACLE)
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors via multi-table random-hyperplane LSH
    with Hamming-1 multi-probe on the query side (recall without extra
    corpus shuffle). Deterministic fold-ordered bucketing + inlined
    hyperplane literals make the candidate set — hence the ANN result —
    exactly oracle-checkable; tests/test_similarity.py pins recall vs the
    exact top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_lsh(
        emb, queries, k=10, n_planes=_KNN_N_PLANES, n_tables=_KNN_N_TABLES,
        multiprobe=True,
    )


_IVF_N_CELLS, _IVF_N_PROBE = 16, 8


def ivf_oracle_sql(anchor_ctes: str, n_probe: int = _IVF_N_PROBE) -> str:
    """The md5-anchor IVF search replayed in SQL, parameterized by the
    anchor CTE chain (must end in ``a(aid, a_vec)``) so variants that
    train the quantizer on a subset (e.g. the streaming index's
    first-micro-batch sample) share the machinery."""
    return f"""
    WITH {anchor_ctes},
         s AS (SELECT e.vec_id, a.aid,
                      {duckdb_cosine("e.embedding", "a.a_vec")} AS cos
               FROM embeddings e CROSS JOIN a),
         r AS (SELECT vec_id, aid,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, aid) AS rn
               FROM s),
         cells AS (SELECT vec_id, aid AS cell_id FROM r WHERE rn = 1),
         probes AS (SELECT vec_id AS query_id, aid AS cell_id
                    FROM r WHERE vec_id < 5 AND rn <= {n_probe}),
         cand AS (SELECT p.query_id, c.vec_id AS neighbor_id
                  FROM probes p JOIN cells c USING (cell_id)
                  WHERE c.vec_id <> p.query_id),
         rer AS (SELECT cand.query_id, cand.neighbor_id,
                        {duckdb_cosine("q.embedding", "c.embedding")} AS cosine
                 FROM cand
                 JOIN embeddings q ON q.vec_id = cand.query_id
                 JOIN embeddings c ON c.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id)
                   AS rank
          FROM rer)
    WHERE rank <= 10
"""


_IVF_ORACLE = ivf_oracle_sql(
    f"""a AS (SELECT CAST(vec_id AS BIGINT) AS aid, embedding AS a_vec
               FROM embeddings
               ORDER BY md5(CAST(vec_id AS VARCHAR)), aid
               LIMIT {_IVF_N_CELLS})"""
)


@register("knn_ivf_ann", _IVF_ORACLE)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors via IVF coarse quantization: nearest
    8 of 16 cells probed per query, exact cosine inside the probed cells.
    The registered variant uses the deterministic md5-anchor quantizer
    (same family as semdedup/PQ — Lloyd skipped) so the entire index +
    search decision is hash-exact against the SQL oracle; the
    distributed-Lloyd production variant (similarity.knn_ivf, with
    distance-margin multi-probe) is recall-pinned in
    tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_ivf_exact(
        emb, queries, k=10, n_cells=_IVF_N_CELLS, n_probe=_IVF_N_PROBE
    )


_SD_N_CELLS, _SD_THR = 16, 0.3
_SD_ORACLE = f"""
    WITH a AS (SELECT CAST(vec_id AS BIGINT) AS anchor_id, embedding AS a_vec
               FROM embeddings
               ORDER BY md5(CAST(vec_id AS VARCHAR)), anchor_id
               LIMIT {_SD_N_CELLS}),
         s AS (SELECT e.vec_id, a.anchor_id,
                      {duckdb_cosine("e.embedding", "a.a_vec")} AS cos
               FROM embeddings e CROSS JOIN a),
         g AS (SELECT vec_id, anchor_id,
                      row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, anchor_id) AS rnk
               FROM s),
         cells AS (SELECT CAST(g.vec_id AS BIGINT) AS vec_id,
                          CAST(g.anchor_id AS BIGINT) AS cell_id, e.embedding
                   FROM g JOIN embeddings e ON g.vec_id = e.vec_id
                   WHERE g.rnk = 1),
         dup AS (SELECT DISTINCT b.vec_id
                 FROM cells a JOIN cells b
                   ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
                 WHERE {duckdb_cosine("a.embedding", "b.embedding")} >= {_SD_THR})
    SELECT c.vec_id, c.cell_id, (d.vec_id IS NULL) AS keep
    FROM cells c LEFT JOIN dup d ON c.vec_id = d.vec_id
"""


@register("semdedup_prune", _SD_ORACLE)
def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023): coarse-cluster the
    embedding corpus into 16 cells, then inside each cell drop every row
    with a cosine >= 0.3 neighbor of smaller id. Emits a keep/drop verdict
    per row — the decision a training pipeline ships. The deterministic
    md5-anchor quantizer makes the whole decision exactly oracle-checkable;
    at production scale the quantizer swaps to distributed-Lloyd centroids
    (operators/similarity.ivf_centroids) with the pruning stage unchanged."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.semdedup_verdicts(
        emb, n_cells=_SD_N_CELLS, threshold=_SD_THR
    )


_PQ_M, _PQ_KS = 8, 32
_PQ_SUB = _DIM // _PQ_M
_PQ_SHORTLIST = 100


def _pq_d2(vec: str, off: str) -> str:
    """Squared L2 between 16-dim subvectors of {vec} and anchor a_vec at
    1-based offset expression {off} — sequential fold, matching Spark's
    F.aggregate order."""
    t = (
        f"(CAST({vec}[{off} + i] AS DOUBLE)"
        f" - CAST(a.a_vec[{off} + i] AS DOUBLE))"
    )
    return (
        f"list_sum(list_transform(range(1, {_PQ_SUB + 1}),"
        f" i -> {t} * {t}))"
    )


_PQ_ORACLE = f"""
    WITH a0 AS (SELECT CAST(vec_id AS BIGINT) AS aid, embedding AS a_vec
                FROM embeddings
                ORDER BY md5(CAST(vec_id AS VARCHAR)), aid
                LIMIT {_PQ_KS}),
         a AS (SELECT aid, a_vec,
                      row_number() OVER (ORDER BY aid) AS pos
               FROM a0),
         subs AS (SELECT unnest(range(0, {_PQ_M})) AS j),
         enc0 AS (SELECT e.vec_id, s.j, a.pos,
                         {_pq_d2("e.embedding", f"s.j * {_PQ_SUB}")} AS d
                  FROM embeddings e CROSS JOIN a CROSS JOIN subs s),
         enc AS (SELECT vec_id, j, pos FROM (
                   SELECT vec_id, j, pos,
                          row_number() OVER (PARTITION BY vec_id, j
                                             ORDER BY d, pos) AS rnk
                   FROM enc0) WHERE rnk = 1),
         qd AS (SELECT q.vec_id AS query_id, s.j, a.pos,
                       CAST(round({_pq_d2("q.embedding", f"s.j * {_PQ_SUB}")},
                                  6) AS DECIMAL(20,6)) AS d
                FROM embeddings q CROSS JOIN a CROSS JOIN subs s
                WHERE q.vec_id < 5),
         scored AS (SELECT qd.query_id, enc.vec_id AS neighbor_id,
                           CAST(sum(qd.d) AS DOUBLE) AS adc_dist
                    FROM enc JOIN qd ON enc.j = qd.j AND enc.pos = qd.pos
                    WHERE enc.vec_id != qd.query_id
                    GROUP BY qd.query_id, enc.vec_id),
         sl AS (SELECT query_id, neighbor_id FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                                               ORDER BY adc_dist,
                                                        neighbor_id) AS slr
                  FROM scored) WHERE slr <= {_PQ_SHORTLIST}),
         rer AS (SELECT sl.query_id, sl.neighbor_id,
                        {duckdb_cosine("q.embedding", "c.embedding")}
                          AS cosine
                 FROM sl
                 JOIN embeddings q ON q.vec_id = sl.query_id
                 JOIN embeddings c ON c.vec_id = sl.neighbor_id)
    SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT query_id, neighbor_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id)
                   AS rank
          FROM rer)
    WHERE rank <= 10
"""


@register("knn_pq_adc", _PQ_ORACLE)
def q_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (8 subspaces x 32 codewords, asymmetric
    distance, 100-candidate shortlist + exact cosine re-rank) for the
    same 5 query vectors the other k-NN variants use. The md5-anchor
    codebooks and decimal-exact ADC sums make the entire index + search
    decision hash-exact against the SQL oracle — the third ANN strategy
    (brute force = baseline, LSH/IVF = recall-pinned, PQ = memory-bound
    scale path). See operators/similarity.knn_pq_adc."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return similarity.knn_pq_adc(
        emb, queries, k=10, m=_PQ_M, ks=_PQ_KS, shortlist=_PQ_SHORTLIST
    )


_EMB_CLUSTER_ORACLE = f"""
    WITH RECURSIVE
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a
      JOIN embeddings b ON a.vec_id < b.vec_id AND a.label = b.label
      WHERE {duckdb_cosine("a.embedding", "b.embedding")} >= 0.35
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    walk(id, lbl) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id
    )
    SELECT CAST(id AS BIGINT) AS vec_id,
           CAST(min(lbl) AS BIGINT) AS cluster_id
    FROM walk GROUP BY id
"""


@register("embedding_neardup_clusters", _EMB_CLUSTER_ORACLE)
def q_embedding_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERS: the label-blocked cosine pair graph
    (>= 0.35) fed through connected components, every vector labeled with
    the min vec_id of its component — the graph-clustering counterpart of
    semdedup_prune's cell-local verdicts, completing the embedding-dedup
    family the same way dedup_minhash_clusters completes MinHash. The
    oracle re-derives the exact pair set AND replays the propagation with
    a recursive CTE."""
    from duckdb_streaming_patterns_spark.operators import dedup

    emb = _t(spark, sf_dir, "embeddings")
    pairs = similarity.cosine_neardup_pairs(
        emb, id_col="vec_id", vec_col="embedding",
        threshold=0.35, block_col="label",
    )
    labels = dedup.connected_components(
        emb.select("vec_id"), pairs.select("id_a", "id_b"), id_col="vec_id"
    )
    return labels.select(
        F.col("id").cast("long").alias("vec_id"),
        F.col("cluster").cast("long").alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# Index observability (round 12): per-cell occupancy of the AT-REST
# anchor-IVF embedding index — cell-size imbalance is the operational
# metric that predicts probe-latency skew (a hot cell makes every probe
# touching it pay its size; the mitigation is re-anchoring or splitting).
# The oracle replays the md5-anchor assignment in SQL, so the whole
# health report is hash-exact. Counts are read from the index's OWN
# partition layout (one pruned-column scan), never recomputed from raw
# vectors — at 100 TB this is footer-sized work per cell directory.
# ---------------------------------------------------------------------------

_IVF_CELL_STATS_ORACLE = f"""
    WITH a AS (SELECT CAST(vec_id AS BIGINT) AS aid, embedding AS a_vec
               FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), aid
               LIMIT 8),
    asim AS (SELECT e.vec_id, a.aid,
                    {duckdb_cosine("e.embedding", "a.a_vec")} AS cos
             FROM embeddings e CROSS JOIN a),
    cells AS (SELECT vec_id, aid AS cell_id
              FROM (SELECT vec_id, aid,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY cos DESC, aid) AS rn
                    FROM asim)
              WHERE rn = 1),
    c AS (SELECT cell_id, count(*) AS n_vecs FROM cells GROUP BY cell_id),
    t AS (SELECT sum(n_vecs) AS total FROM c)
    SELECT CAST(cell_id AS BIGINT) AS cell_id,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           ROUND(CAST(n_vecs AS DOUBLE) / total, 6) AS share
    FROM c, t
"""


@register("ann_index_cell_stats", _IVF_CELL_STATS_ORACLE)
def q_ann_index_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index health report: per-cell vector count and corpus share
    over the at-rest md5-anchor-partitioned embedding index (the layout
    hybrid_rrf_retrieval_ivf probes — memoized, so this row reads the
    index that already exists). The aggregate is cell-count-sized (index
    WIDTH, not corpus size), so the unpartitioned share window is
    metadata-scale at any corpus."""
    from duckdb_streaming_patterns_spark.operators import layout

    path, _anchors = layout.ivf_anchor_partitioned_embeddings(
        spark, sf_dir, n_cells=8
    )
    c = (
        spark.read.parquet(path)
        .groupBy("cell_id")
        .agg(F.count("*").alias("n_vecs"))
    )
    from pyspark.sql import Window as W

    total = F.sum("n_vecs").over(W.partitionBy())
    return c.select(
        F.col("cell_id").cast("bigint").alias("cell_id"),
        F.col("n_vecs").cast("bigint").alias("n_vecs"),
        F.round(F.col("n_vecs").cast("double") / total, 6).alias("share"),
    )
