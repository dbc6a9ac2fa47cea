"""Similarity search over embedding columns (SURVEY §2.11).

- brute-force cosine top-k: the correctness baseline. Join-shaped: broadcast
  the (small) query set against the corpus, per-partition heap via
  row_number window. Exact.
- LSH-bucketed ANN (random hyperplane signs): the scale path. Candidate set
  = corpus rows sharing a signature bucket with the query (optionally plus
  Hamming-1 multi-probe buckets); exact cosine only on candidates.
  Hyperplanes come from a fixed-seed generator (lsh_planes) and the
  projections are fold-ordered, so bucket assignment is deterministic,
  engine-portable, and exactly oracle-checkable.
- IVF-style variant: coarse centroids by k-means-free binning (label column
  or signature prefix) — provided as partition pruning over the bucketed
  table.

At 100 TB: corpus stays partitioned; only the query side is broadcast; the
expensive exact cosine runs on candidates only. For massive query sets,
swap broadcast for a bucket-to-bucket co-partitioned join on the signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.vectors import (
    dot_double,
    l2_norm,
    to_double_array,
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
    # casts and norms computed per row (n, not n×m); per-pair work is one
    # zip_with+fold
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(F.col(vec_col)).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot_double(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
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


def lsh_planes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    """The random-hyperplane matrix, shape (dim, n_planes·n_tables).

    Single source of truth shared by the Spark bucketing UDF AND the
    DuckDB oracle generators (queries_sim.py inlines these exact float64
    values as SQL literals via repr — which round-trips IEEE754 exactly),
    so the bucket assignment is engine-portable and hash-checkable.
    """
    return np.random.RandomState(seed).standard_normal((dim, n_planes * n_tables))


def _lsh_keys(df: DataFrame, id_alias: str, id_col: str,
              vec_col: str, n_planes: int, n_tables: int,
              seed: int = 42) -> DataFrame:
    """Explode each row into (id, table, bucket) keys — one per hash table.

    Bucket ids are computed by an Arrow-batched pandas UDF. Dense-vector
    math is exactly the case where a vectorized pandas UDF beats Catalyst
    expressions — the expression form (posexplode + planes·tables SUM
    aggregates) costs an extra shuffle plus a multi-second codegen compile
    of the 48-agg operator, measured ~10× slower end to end at sf0.1.

    The projections are accumulated SEQUENTIALLY over dimensions
    (acc += x_i·p_i, vectorized across rows×planes but ordered over i) —
    bit-identical to a left-to-right double fold, i.e. to Spark's
    F.aggregate and DuckDB's list_sum(list_transform(...)). A BLAS matmul
    would be ~the same speed here but uses pairwise/SIMD summation whose
    last-ulp differences could flip a sign at a bucket boundary and make
    the candidate set engine-specific; the sequential form keeps the
    oracle exact. Hyperplanes are regenerated per executor from the fixed
    seed (lsh_planes) — deterministic, zero broadcast state.

    Output is narrow (id, table, bucket) rows; vectors join back *after*
    candidate dedup so no shuffle ever carries an embedding.
    """
    n_total = n_planes * n_tables
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64
        )
        # Inline (not a call to lsh_planes) so the closure stays
        # self-contained — a module-level reference would require the
        # package on every Python worker's sys.path. MUST stay identical
        # to lsh_planes(), which the DuckDB oracle generators replay.
        planes = np.random.RandomState(seed).standard_normal(
            (mat.shape[1], n_total)
        )
        acc = np.zeros((len(vecs), n_total))
        for i in range(mat.shape[1]):
            acc = acc + mat[:, i : i + 1] * planes[i : i + 1, :]
        signs = (acc >= 0).reshape(len(vecs), n_tables, n_planes)
        buckets = (signs * weights).sum(axis=2)
        return pd.Series(list(buckets))

    return df.select(
        F.col(id_col).alias(id_alias),
        F.posexplode(bucket_ids(F.col(vec_col))).alias("table", "bucket"),
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    multiprobe: bool = False,
) -> DataFrame:
    """ANN top-k: exact cosine restricted to LSH candidates — rows sharing
    a bucket with the query in ANY of the n_tables hash tables (standard
    multi-table random-hyperplane LSH; recall grows with n_tables, cost per
    table with 2^-n_planes). At scale the n×m cross join becomes an
    equi-join on (table, bucket), shuffling each row n_tables times.

    ``multiprobe``: additionally probe every Hamming-1 neighbor bucket of
    the query's bucket in each table (Lv et al., multi-probe LSH). Only
    the (tiny, broadcast) QUERY side fans out ×(n_planes+1); the corpus
    shuffle is unchanged — recall rises sharply at near-zero cost, the
    right trade at 100 TB where corpus passes dominate."""
    c = _lsh_keys(corpus, "neighbor_id", id_col, vec_col, n_planes, n_tables)
    q = _lsh_keys(queries, "query_id", id_col, vec_col, n_planes, n_tables)
    if multiprobe:
        q = q.select(
            "query_id",
            "table",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << p))
                        for p in range(n_planes)
                    ],
                )
            ).alias("bucket"),
        )
    # bucket join + dedup over narrow id rows only; vectors join in after.
    cand = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(F.col(vec_col)).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )
    # casts and norms computed once per row; per-pair work is one fold.
    scored = (
        cand.join(c_vecs, "neighbor_id")
        .join(F.broadcast(q_vecs), "query_id")
        .withColumn(
            "cosine",
            dot_double(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
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


def md5_anchor_rows(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n: int = 16,
) -> list:
    """The ``n`` rows with the smallest md5(id) — the deterministic,
    engine-portable anchor sample the quantized operators (semdedup, exact
    IVF, PQ) use as their coarse codebook. KB-sized: the only driver-side
    collect in those operators. Returned sorted by anchor id so positional
    argmax ties resolve to the smallest id (the oracle's ``ORDER BY cos
    DESC, anchor_id`` tie-break)."""
    rows = (
        df.select(
            F.col(id_col).cast("long").alias("aid"),
            to_double_array(F.col(vec_col)).alias("vec"),
        )
        .withColumn("__h", F.md5(F.col("aid").cast("string")))
        .orderBy("__h", "aid")
        .limit(n)
        .collect()
    )
    if not rows:
        raise ValueError("md5_anchor_rows: input corpus is empty")
    return sorted(rows, key=lambda r: r.aid)


def anchor_cell_udf(anchor_rows: list, n_probe: int = 1):
    """Arrow-batched nearest-anchor (cosine) assignment against a
    closure-captured anchor matrix — the scale-safe cell assignment: one
    vectorized pass per batch, O(rows × n_anchors) flops at numpy memory
    bandwidth instead of interpreted per-row Catalyst HOF folds (which die
    when n_cells grows with the corpus — measured curvature 24 at x10).
    Returns a pandas UDF: vec → array of the ``n_probe`` nearest anchor
    ids, ranked by (cos DESC, anchor_id ASC) exactly like the oracle's
    row_number.

    Exactness: dots and norms are accumulated SEQUENTIALLY over dimensions
    (acc += x_i·a_i, vectorized across rows×anchors but ordered over i) —
    bit-identical to a left-to-right double fold, i.e. to Spark's
    F.aggregate and DuckDB's list_sum(list_transform(...)); division runs
    in duckdb_cosine's ``dot / row_norm / anchor_norm`` order. A BLAS
    matmul would use pairwise/SIMD summation whose last-ulp differences
    could flip an argmax at a cell boundary and make the assignment
    engine-specific (same contract as _lsh_keys). The closure is
    self-contained (only numpy/pandas references + captured arrays): a
    reference to a module-level helper would pickle by module name and
    crash Python workers that don't have the repo on sys.path."""
    amat = np.asarray([list(r.vec) for r in anchor_rows], dtype=np.float64)
    aids = np.asarray([int(r.aid) for r in anchor_rows], dtype=np.int64)
    a_sq = np.zeros(amat.shape[0])
    for i in range(amat.shape[1]):
        a_sq = a_sq + amat[:, i] * amat[:, i]
    a_norm = np.sqrt(a_sq)

    @F.pandas_udf("array<long>")
    def nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64
        )
        acc = np.zeros((mat.shape[0], amat.shape[0]))
        r_sq = np.zeros(mat.shape[0])
        for i in range(mat.shape[1]):
            acc = acc + mat[:, i : i + 1] * amat[None, :, i]
            r_sq = r_sq + mat[:, i] * mat[:, i]
        cos = acc / np.sqrt(r_sq)[:, None] / a_norm[None, :]
        # anchors are aid-sorted and stable argsort keeps that order for
        # exact cosine ties → (cos DESC, aid ASC), the oracle's tie-break
        order = np.argsort(-cos, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(aids[order]))

    return nearest


def anchor_cells(
    df: DataFrame,
    anchor_rows: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell_id) nearest-anchor assignment — narrow projection, no
    shuffle, no driver data beyond the KB-sized anchors."""
    nearest = anchor_cell_udf(anchor_rows, n_probe=1)
    return df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.element_at(nearest(F.col(vec_col)), 1).alias("cell_id"),
    )


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid cell.

    One Arrow-batched matmul per batch against the (tiny, closure-captured)
    centroid matrix — the 100 TB shape: a narrow (id, cell) projection with
    no shuffle; the physical index is the corpus written partitioned by
    ``cell`` so probes prune partitions.
    """
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64
        )
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ cn.T).argmax(axis=1).astype("int32"))

    return df.select(
        F.col(id_col), F.col(vec_col), nearest(F.col(vec_col)).alias("cell")
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: seed with the n_centroids
    lowest-id vectors, refine with ``iters`` distributed Lloyd iterations.

    Each iteration is one assignment pass (ivf_assign) plus a per-cell mean
    — posexplode to (cell, dim, x), groupBy avg, and a collect of exactly
    n_centroids × dim cells (the only driver-side data ever, ~KBs; the
    corpus itself is never collected).
    """
    dim_probe = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_probe["d"])
    seeds = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    centroids = np.asarray([list(r[0]) for r in seeds], dtype=np.float64)
    for _ in range(iters):
        assigned = ivf_assign(corpus, centroids, id_col, vec_col)
        means = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("d", "x"))
            .groupBy("cell", "d")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        nxt = centroids.copy()  # empty cells keep their previous centroid
        by_cell: dict[int, list] = {}
        for r in means:
            by_cell.setdefault(r["cell"], [None] * dim)[r["d"]] = r["m"]
        for cell, vals in by_cell.items():
            nxt[cell] = np.asarray(vals, dtype=np.float64)
        centroids = nxt
    return centroids


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    probe_margin: float | None = 0.15,
) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize the corpus into centroid cells,
    probe the nearest cells per query, exact cosine on the surviving
    candidates.

    Multi-probe: beyond the ``n_probe`` nearest cells, every cell whose
    centroid cosine is within ``probe_margin`` of the best cell is probed
    too (the distance-margin analogue of LSH's Hamming-1 probes — a true
    neighbor lands in a non-nearest cell exactly when its query sits near
    a cell boundary, i.e. when two centroid cosines are close). Only the
    (tiny, broadcast) QUERY side fans out; the corpus scan is unchanged.
    Measured on the fixtures: mean recall@10 is 0.84 at n_probe=4 (0.74 at
    n_probe=1) with the margin DORMANT — the fixture corpus is strongly
    label-clustered, so queries sit deep inside their cell (best centroid
    cos ≈ 0.75, runner-up ≈ 0.15; no query within 0.15 of a boundary) and
    the remaining misses are corpus rows assigned to overlapping cells,
    which more probes recover. The margin is the guard for the boundary
    case a real (less separable) corpus hits constantly.

    At 100 TB the corpus is written partitioned by cell, so each query
    batch reads probed/n_centroids of the data (partition pruning); the
    probe→cell map is an equi-join, and queries broadcast.
    """
    centroids = ivf_centroids(corpus, id_col, vec_col, n_centroids, iters)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    cells = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(F.col(vec_col)).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
        "cell",
    )

    @F.pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64
        )
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        cos = mat @ cn.T
        order = np.argsort(-cos, axis=1)
        out = []
        for r in range(len(vecs)):
            probes = list(order[r, :n_probe])
            if probe_margin is not None:
                floor = cos[r, order[r, 0]] - probe_margin
                probes = [
                    c
                    for rank, c in enumerate(order[r])
                    if rank < n_probe or cos[r, c] >= floor
                ]
            out.append(np.asarray(probes, dtype="int32"))
        return pd.Series(out)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    scored = (
        cells.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot_double(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
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


def knn_ivf_exact(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 6,
) -> DataFrame:
    """IVF ANN with a fully deterministic, oracle-replayable index: the
    coarse quantizer is the md5-anchor sample (md5_anchor_rows) instead of
    Lloyd iterations, so cell assignment, probe selection, and therefore
    the whole ANN decision replay exactly in SQL — the same technique that
    made knn_pq_adc hash-exact. Search shape is identical to ``knn_ivf``
    (cell-partitioned corpus at rest, probes prune partitions, queries
    broadcast); swap ``ivf_centroids`` back in when index quality matters
    more than replayability.

    Exactness: assignment and probe ranking run in the sequential-fold
    assignment UDF (anchor_cell_udf — bit-identical cosines to DuckDB's
    list_sum, ties to the smallest anchor id); the candidate scoring is
    the same dot_double expression the oracle mirrors. Output:
    (query_id, neighbor_id, cosine, rank) like every other knn_* variant.
    """
    anchor_rows = md5_anchor_rows(corpus, id_col, vec_col, n_cells)
    cells = anchor_cells(corpus, anchor_rows, id_col, vec_col).join(
        corpus.select(
            F.col(id_col).cast("long").alias("vec_id"),
            to_double_array(F.col(vec_col)).alias("c_vec"),
            l2_norm(F.col(vec_col)).alias("c_norm"),
        ),
        "vec_id",
    ).select(F.col("vec_id").alias("neighbor_id"), "cell_id", "c_vec", "c_norm")
    probe = anchor_cell_udf(anchor_rows, n_probe=n_probe)
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        to_double_array(F.col(vec_col)).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        F.explode(probe(F.col(vec_col))).alias("cell_id"),
    )
    scored = (
        cells.join(F.broadcast(q), "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot_double(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
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


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_planes: int = 4,
    n_tables: int = 16,
) -> DataFrame:
    """Embedding near-duplicate pairs for an UNLABELED corpus: candidate
    pairs are rows colliding in ≥1 random-hyperplane hash table, exact
    cosine only on candidates. This is the 100 TB blocking story end to
    end — ``cosine_neardup_pairs`` needs a label column to block on; real
    corpora have none, so the blocks come from the data itself.

    Recall/cost knob: a pair at angle θ collides per table with
    p = (1 − θ/π)^n_planes and survives ≥1 of n_tables with
    1 − (1 − p)^n_tables; fewer planes / more tables = higher recall and
    more candidates. Defaults (4 planes × 16 tables) give ~0.9+ expected
    recall at cosine 0.35. The shuffle carries (id, table, bucket) rows
    and then deduped id pairs — never a vector; vectors join back in at
    the end, exactly like knn_lsh.
    """
    keys = _lsh_keys(df, "id_a", id_col, vec_col, n_planes, n_tables)
    # Self-join: exchange reuse does not cross the alias boundary, so
    # persist the (tiny, narrow) key set rather than recompute the pandas
    # UDF on both sides (same measured trade as simhash's self-join).
    keys = keys.persist()
    b = (
        keys.withColumnRenamed("id_a", "id_b")
    )
    cand = (
        keys.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Materialize the (narrow) candidate pairs, then release the key cache
    # — without this the persisted keys leak cached blocks for the life of
    # the session on every call. localCheckpoint truncates lineage so the
    # downstream cosine join never re-triggers the unpersisted UDF scan.
    cand = cand.localCheckpoint(eager=True)
    keys.unpersist()
    vecs_a = df.select(
        F.col(id_col).alias("id_a"),
        to_double_array(F.col(vec_col)).alias("v_a"),
        l2_norm(F.col(vec_col)).alias("n_a"),
    )
    vecs_b = df.select(
        F.col(id_col).alias("id_b"),
        to_double_array(F.col(vec_col)).alias("v_b"),
        l2_norm(F.col(vec_col)).alias("n_b"),
    )
    cos = dot_double(F.col("v_a"), F.col("v_b")) / F.col("n_a") / F.col("n_b")
    return (
        cand.join(vecs_a, "id_a")
        .join(vecs_b, "id_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
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
    # cast to double and compute the norm once per ROW; per-pair work is
    # then a single zip_with+fold (dot_double), not five HOF passes
    cols = [
        F.col(id_col).alias("id"),
        to_double_array(F.col(vec_col)).alias("v"),
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
    cos = dot_double(F.col("v"), F.col("v_b")) / F.col("nrm") / F.col("nrm_b")
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("id").alias("id_a"),
            "id_b",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def semdedup_verdicts(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.3,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): coarse-cluster
    the corpus in embedding space, then inside each cluster drop every
    document that has a near-identical (cosine >= threshold) member with a
    smaller id. Output: one verdict row per input — (vec_id, cell_id, keep).

    Spark-first shape, designed for 100 TB:

    - The coarse quantizer is a deterministic anchor sample: the n_cells
      rows with the smallest md5(id) (engine-portable "random" — the same
      family the corpus split uses; md5_anchor_rows). The anchors are
      KB-sized, collected once, and closure-captured by an Arrow-batched
      assignment UDF (anchor_cell_udf): one vectorized numpy pass per
      batch — NO shuffle, and O(rows × n_cells) flops at memory bandwidth.
      Real SemDeDup keeps CELL SIZE constant as the corpus grows (n_cells
      ∝ corpus), so the assignment must stay vectorized: the previous
      expression-literal form (one interpreted HOF fold per anchor per
      row) measured curvature 24 at x10 when n_cells scales; this form is
      linear. At production scale ``ivf_centroids`` (distributed Lloyd)
      swaps in for tighter cells; the pruning stage is unchanged.
    - Exactness: the UDF accumulates dots SEQUENTIALLY over dimensions and
      divides in duckdb_cosine's order, so cosines are bit-identical to
      the oracle's list_sum folds; ties argmax to the smallest anchor id,
      mirroring ``row_number() ORDER BY cos DESC, anchor_id``.
    - The only wide shuffle carries (id, cell) plus one vector copy into
      the intra-cell self-join; pair blow-up is bounded by cell size (IVF
      discipline), never all-pairs. The narrow (id, cell) assignment is
      localCheckpoint'ed so the assignment evaluates once and no cache
      handle leaks.
    """
    anchor_rows = md5_anchor_rows(df, id_col, vec_col, n_cells)
    cells = anchor_cells(df, anchor_rows, id_col, vec_col).localCheckpoint(
        eager=True
    )
    with_cell = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("__emb"),
    ).join(cells, "vec_id")
    dup_pairs = cosine_neardup_pairs(
        with_cell,
        id_col="vec_id",
        vec_col="__emb",
        threshold=threshold,
        block_col="cell_id",
    )
    dups = (
        dup_pairs.select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return cells.join(dups, "vec_id", "left").select(
        "vec_id",
        "cell_id",
        F.col("__dup").isNull().alias("keep"),
    )


def knn_pq_adc(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    ks: int = 32,
    shortlist: int | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011) with asymmetric
    distance computation and exact re-rank: split each vector into ``m``
    subspaces, encode every corpus vector as the id of its nearest
    codeword per subspace, shortlist the ``shortlist`` (default 10·k)
    corpus rows with the smallest SUM of per-subspace query-to-codeword
    distances — ``m`` table lookups and adds per candidate instead of a
    full-dimension scan — then re-rank only the shortlist by exact
    cosine (the standard PQ search shape: coarse ADC prune, exact
    refine). Output: (query_id, neighbor_id, cosine, rank), top-k per
    query — directly comparable with ``knn_bruteforce``.

    Spark-first shape, designed for 100 TB:

    - Codebooks are deterministic anchor samples (the ``ks`` rows with the
      smallest md5(id), their subvectors quantizing each subspace) —
      KB-sized, collected once, inlined as literals. Corpus encoding is
      then a pure per-row Catalyst expression: scan → m codes, NO shuffle,
      no Python; at rest the codes table is m bytes-per-subspace per row
      instead of the full vector (the PQ memory story). Swap per-subspace
      Lloyd (``ivf_centroids`` on slices) for tighter cells in production;
      encoding and ADC stages are unchanged.
    - ADC lookup tables (ks × m distances) are computed per query row as
      expressions and broadcast; scoring is a broadcast nested-loop over
      the codes table with per-pair work = m ``element_at`` + adds —
      the same join shape as ``knn_bruteforce`` but touching codes, not
      vectors. Shortlisting is a per-query window (state = shortlist
      rows per query); the exact re-rank joins vectors back for ONLY
      shortlist·#queries rows (broadcast — query-side-sized), so the
      full-dimension cosine never runs over the corpus. At 100 TB the
      shortlist stays fixed while the corpus grows: the exact-scan
      fraction tends to zero.
    - Exactness: per-subspace distances are rounded to 6 dp and cast to
      DECIMAL before summing, so the m-term sum is exact integer
      arithmetic — engine-portable regardless of evaluation order, and
      the whole ANN decision (codes, ADC shortlist, re-ranked top-k)
      replays exactly in the SQL oracle.
    """
    shortlist = shortlist if shortlist is not None else 10 * k
    anchor_rows = (
        corpus.select(
            F.col(id_col).cast("long").alias("aid"),
            to_double_array(F.col(vec_col)).alias("vec"),
        )
        .withColumn("__h", F.md5(F.col("aid").cast("string")))
        .orderBy("__h", "aid")
        .limit(ks)
        .collect()
    )
    if not anchor_rows:
        raise ValueError("knn_pq_adc: corpus is empty — no codebook anchors")
    anchor_rows = sorted(anchor_rows, key=lambda r: r.aid)
    dim = len(anchor_rows[0].vec)
    if dim % m != 0:
        raise ValueError(
            f"knn_pq_adc: vector dim {dim} is not divisible by m={m} "
            "subspaces — trailing dimensions would be silently dropped "
            "from encoding and ADC (recall degrades with no signal); "
            "pick m with dim % m == 0"
        )
    sub = dim // m

    # The per-subspace expressions are built as SQL strings and parsed
    # server-side with ONE F.expr per output column: composing them from
    # Column objects costs a py4j round-trip per node (~50k for
    # m=8/ks=32 — measured 21 s of pure driver-side plan construction vs
    # <1 s for the string form). Semantics are identical: same slice /
    # zip_with / sequential-fold aggregate, so the oracle match is
    # unaffected. repr() round-trips IEEE-754 doubles exactly.
    # The cast+slice runs in its OWN projection so it evaluates once per
    # row: interpreted HOFs get no common-subexpression elimination, and
    # inlining the slice into each of the ks per-anchor folds re-cast the
    # full vector ks times (measured 2.1× end-to-end on the encode).
    dvec = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"

    def _lit_arr(vals) -> str:
        return "array(" + ", ".join(f"{float(x)!r}D" for x in vals) + ")"

    def _d2_sql(j: int, vals) -> str:
        return (
            f"aggregate(zip_with(__s{j}, {_lit_arr(vals)},"
            f" (x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE),"
            f" (acc, x) -> acc + x)"
        )

    slice_cols = [
        F.expr(f"slice({dvec}, {j * sub + 1}, {sub})").alias(f"__s{j}")
        for j in range(m)
    ]

    enc_cols = []
    for j in range(m):
        structs = ", ".join(
            f"named_struct('d',"
            f" {_d2_sql(j, r.vec[j * sub:(j + 1) * sub])}, 'pos', {p + 1})"
            for p, r in enumerate(anchor_rows)
        )
        enc_cols.append(
            F.expr(f"array_min(array({structs}))['pos']").alias(f"c{j}")
        )
    codes = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"), *slice_cols
    ).select("neighbor_id", *enc_cols)

    adc_cols = []
    for j in range(m):
        dists = ", ".join(
            f"CAST(round({_d2_sql(j, r.vec[j * sub:(j + 1) * sub])}, 6)"
            f" AS DECIMAL(20,6))"
            for r in anchor_rows
        )
        adc_cols.append(F.expr(f"array({dists})").alias(f"adc{j}"))
    # ADC tables and full query vectors ride SEPARATE frames: the scoring
    # join and its shortlist window must only ever carry
    # (query_id, neighbor_id, adc_dist) — with q_vec/q_norm attached they
    # would ride the |corpus|×|queries| row_number exchange, contradicting
    # the codes-only scale claim. The (query-sized) vector side re-joins
    # broadcast AFTER the shortlist prune, touching shortlist·queries rows.
    q_adc = queries.select(
        F.col(id_col).cast("long").alias("query_id"), *slice_cols
    ).select("query_id", *adc_cols)
    q_vecs = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        to_double_array(F.col(vec_col)).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
    )

    adc = F.element_at(F.col("adc0"), F.col("c0"))
    for j in range(1, m):
        adc = adc + F.element_at(F.col(f"adc{j}"), F.col(f"c{j}"))
    scored = (
        codes.join(F.broadcast(q_adc))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.cast("double").alias("adc_dist"))
    )
    w_sl = W.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    sl = (
        scored.withColumn("slrank", F.row_number().over(w_sl))
        .filter(F.col("slrank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    cvecs = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        to_double_array(F.col(vec_col)).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_norm"),
    )
    rer = (
        cvecs.join(F.broadcast(sl), "neighbor_id")
        .join(F.broadcast(q_vecs), "query_id")
        .withColumn(
            "cosine",
            dot_double(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
        )
    )
    w_k = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
