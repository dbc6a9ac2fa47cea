"""Mergeable-sketch + runtime-filter query surface (round 12).

Three operators a 100 TB corpus pipeline runs constantly, all built on
the same portable md5/60-bit hash family as the dedup/sampling surface
(operators/dedup.py:spark_h60 / DUCKDB_HEX15) so every approximate
answer is still ORACLE-HASH-EXACT:

- ``approx_quantiles_kmv``: per-group quantile estimates from a
  deterministic bottom-k hash sample — the mergeable counterpart of the
  exact ``text_length_percentiles`` (whose full per-group sort is the
  thing you cannot afford at 100 TB).
- ``pattern_streaming_distinct_kmv``: the KMV cardinality sketch
  MAINTAINED by a stream, estimate trajectory pinned at every prefix
  (streaming/patterns.pattern_streaming_distinct_kmv).
- ``runtime_bloom_join_revenue``: the join whose large side Spark's
  runtime row-level Bloom filter prunes before the shuffle — the
  semi-join-reduction plan shape tests/test_sketch_queries.py pins
  under production thresholds.

The reference engine answers these with exact scans at demo scale
(pattern_1_1.py:96-116's running counts); the sketch forms are the
charter's 100 TB restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from duckdb_streaming_patterns_spark.operators.dedup import DUCKDB_HEX15
from duckdb_streaming_patterns_spark.registry import _t, register

_KQ_K = 64  # bottom-k sample size per group (rsd ~ 1/sqrt(k))

_KQ_H60 = DUCKDB_HEX15.format(m="hx")

# Nearest-rank index over an m-row sample at percentile num/den, as exact
# integer arithmetic on both engines: ceil(m*num/den) = (m*num + den - 1)
# integer-divided by den.
_KQ_PCTS = [("p50_tokens", 1, 2), ("p90_tokens", 9, 10), ("p99_tokens", 99, 100)]

_KQ_PCT_SQL = ",\n           ".join(
    f"max(CASE WHEN vr = (m * {num} + {den} - 1) // {den} THEN val END)"
    f" AS {name}"
    for name, num, den in _KQ_PCTS
)

_APPROX_QUANTILES_ORACLE = rf"""
    WITH tc AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS val,
             md5(CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ),
    h AS (SELECT doc_id, lang, val, hx, {_KQ_H60} AS h60 FROM tc),
    s AS (SELECT lang, doc_id, val,
                 row_number() OVER (PARTITION BY lang ORDER BY h60, hx)
                   AS rn
          FROM h),
    k AS (SELECT lang, doc_id, val FROM s WHERE rn <= {_KQ_K}),
    r AS (SELECT lang, val,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY val, doc_id) AS vr,
                 count(*) OVER (PARTITION BY lang) AS m
          FROM k)
    SELECT lang, CAST(max(m) AS BIGINT) AS n_sample,
           {_KQ_PCT_SQL}
    FROM r GROUP BY lang
"""


@register("approx_quantiles_kmv", _APPROX_QUANTILES_ORACLE)
def q_approx_quantiles_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-count quantile ESTIMATES from a deterministic
    bottom-k hash sample (k=64): keep each group's k smallest
    md5(doc_id) hashes — a uniform sample because the hash is uniform
    and independent of the value — then exact nearest-rank percentiles
    within the sample. ``text_length_percentiles`` is the exact
    operator; at 100 TB its per-group full sort is the cost this sketch
    removes: the bottom-k sample is MERGEABLE (k-min of a union = k-min
    of merged k-min sets — the same law the KMV cardinality sketch and
    the streaming fold in pattern_streaming_distinct_kmv rely on), so
    partial aggregation collapses the corpus map-side to k rows per
    group per partition and the single shuffle carries O(k · n_groups).
    Unlike t-digest/GK (engine-specific layouts, rows-only checkable at
    best), the bottom-k-by-md5 sample is a pure function of the data,
    so the estimate is oracle-hash-exact. Error: the sampled nearest
    rank deviates ~ p(1-p)/sqrt(k) in rank terms;
    tests/test_sketch_queries.py pins the observed rank error vs the
    exact percentiles."""
    docs = _t(spark, sf_dir, "documents")
    from duckdb_streaming_patterns_spark.functions.text import tokens

    tc = docs.select(
        "doc_id",
        "lang",
        F.size(tokens(F.col("text"))).cast("bigint").alias("val"),
        F.md5(F.col("doc_id").cast("string")).alias("hx"),
    ).withColumn(
        # 60-bit integer view of the already-computed hex (spark_h60
        # would RE-hash the hex string — both engines must rank the
        # same md5(doc_id) value)
        "h60",
        F.conv(F.substring("hx", 1, 15), 16, 10).cast("long"),
    )
    s = tc.select(
        "lang",
        "doc_id",
        "val",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("h60", "hx"))
        .alias("rn"),
    ).where(F.col("rn") <= _KQ_K)
    r = s.select(
        "lang",
        "val",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("val", "doc_id"))
        .alias("vr"),
        F.count("*").over(W.partitionBy("lang")).alias("m"),
    )
    aggs = [F.max("m").cast("bigint").alias("n_sample")]
    for name, num, den in _KQ_PCTS:
        idx = F.floor((F.col("m") * num + den - 1) / den)
        aggs.append(
            F.max(F.when(F.col("vr") == idx, F.col("val"))).alias(name)
        )
    return r.groupBy("lang").agg(*aggs)


_SKMV_K = 64
_SKMV_H60 = DUCKDB_HEX15.format(m="hx")

# Streaming ≡ batch at EVERY prefix: a user's first batch fb is its
# arrival batch under monotone event_id chunking; batch b's accumulated
# sketch ranks exactly the users with fb <= b.
_STREAM_KMV_ORACLE = f"""
    WITH p AS (SELECT CAST(ceil(count(*) / 5.0) AS BIGINT) AS per
               FROM events),
    u AS (SELECT event_type,
                 md5(CAST(user_id AS VARCHAR)) AS hx,
                 min(CAST(floor(event_id / per) AS BIGINT)) AS fb
          FROM events, p GROUP BY 1, 2),
    bs AS (SELECT DISTINCT CAST(floor(event_id / per) AS BIGINT)
                    AS batch_seq
           FROM events, p),
    pre AS (SELECT bs.batch_seq, u.event_type, u.hx, {_SKMV_H60} AS h60
            FROM u JOIN bs ON u.fb <= bs.batch_seq),
    r AS (SELECT batch_seq, event_type, h60,
                 row_number() OVER (PARTITION BY batch_seq, event_type
                                    ORDER BY h60, hx) AS rn,
                 count(*) OVER (PARTITION BY batch_seq, event_type) AS m
          FROM pre)
    SELECT batch_seq, event_type,
           CASE WHEN max(m) < {_SKMV_K} THEN CAST(max(m) AS DOUBLE)
                ELSE ROUND({_SKMV_K - 1} * pow(2.0, 60)
                           / max(CASE WHEN rn = {_SKMV_K} THEN h60 END), 2)
           END AS est_users
    FROM r GROUP BY batch_seq, event_type
"""


@register("pattern_streaming_distinct_kmv", _STREAM_KMV_ORACLE)
def q_pattern_streaming_distinct_kmv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming KMV cardinality sketch: events replayed as 5
    micro-batches; each batch folds its distinct (event_type,
    md5(user)) hashes into a ≤ k-row-per-type SummaryTable and appends
    a durable (batch_seq, event_type, est_users) estimate row. Oracle =
    the batch KMV over every PREFIX of the stream — KMV's merge law
    makes the maintained sketch exactly the prefix sketch, so the whole
    estimate trajectory is one hash row. See
    streaming/patterns.pattern_streaming_distinct_kmv."""
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    run = staging.new_run_dir("pkmv")
    chunks = staging.stage_event_chunks(spark, sf_dir, run, n_chunks=5)
    # cadence 2: fires the estimate-log maintenance mid-replay (the
    # production default of 8 never fires at 5-batch fixture scale —
    # see test_entry_contract's cadence rationale)
    return patterns.pattern_streaming_distinct_kmv(
        spark, chunks, run, k=_SKMV_K, state_partitions=4, compact_every=2
    )


_BLOOM_JOIN_ORACLE = """
    SELECT l.l_returnflag AS returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY 1
"""


@register("runtime_bloom_join_revenue", _BLOOM_JOIN_ORACLE)
def q_runtime_bloom_join_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Urgent-order revenue by return flag — the fact-fact join whose
    SELECTIVE dimension-side predicate (1 of 5 priorities) is exactly
    the shape Spark's runtime row-level Bloom filter exists for: when
    neither side broadcasts, the optimizer builds a Bloom filter over
    the filtered orders' join keys and injects might_contain(l_orderkey)
    into the lineitem SCAN, dropping ~80% of the big side before the
    shuffle — semi-join reduction without bucketing or manual staging.
    At fixture scale the filtered side broadcasts (which subsumes the
    bloom filter); tests/test_sketch_queries.py pins the injected-bloom
    plan under production thresholds (broadcast off, creation/application
    size gates zeroed) — `bloomfilter` on the creation side and
    `might_contain` in the lineitem scan's filters. The revenue sum is
    per-row double products cast DECIMAL(18,6) then summed exactly, so
    the aggregate is order-independent and engine-identical (the
    float-sum discipline the streaming patterns use)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count("*").alias("n_lines"),
            # exact decimal fold, ONE double conversion at the end —
            # order-independent and identical on both engines
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


_SQ_PCT_SQL = ",\n           ".join(
    f"max(CASE WHEN vr = (m * {num} + {den} - 1) // {den} THEN val END)"
    f" AS {name}"
    for name, num, den in (("p50_tokens", 1, 2), ("p90_tokens", 9, 10))
)

# Streaming ≡ batch at EVERY prefix: under monotone doc_id chunking a
# doc's batch is floor(doc_id/per); batch b's maintained sample ranks
# exactly the docs with fb <= b (the quantile analogue of the KMV
# prefix oracle above).
_STREAM_QUANTILES_ORACLE = rf"""
    WITH p AS (SELECT CAST(ceil(count(*) / 5.0) AS BIGINT) AS per
               FROM documents),
    t AS (SELECT doc_id, lang,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS val,
                 md5(CAST(doc_id AS VARCHAR)) AS hx,
                 CAST(floor(doc_id / per) AS BIGINT) AS fb
          FROM documents, p),
    h AS (SELECT doc_id, lang, val, hx, fb, {_KQ_H60} AS h60 FROM t),
    bs AS (SELECT DISTINCT fb AS batch_seq FROM t),
    pre AS (SELECT bs.batch_seq, h.lang, h.doc_id, h.val, h.hx, h.h60
            FROM h JOIN bs ON h.fb <= bs.batch_seq),
    s AS (SELECT batch_seq, lang, doc_id, val,
                 row_number() OVER (PARTITION BY batch_seq, lang
                                    ORDER BY h60, hx) AS rn
          FROM pre),
    k AS (SELECT batch_seq, lang, doc_id, val FROM s
          WHERE rn <= {_KQ_K}),
    r AS (SELECT batch_seq, lang, val,
                 row_number() OVER (PARTITION BY batch_seq, lang
                                    ORDER BY val, doc_id) AS vr,
                 count(*) OVER (PARTITION BY batch_seq, lang) AS m
          FROM k)
    SELECT batch_seq, lang, CAST(max(m) AS BIGINT) AS n_sample,
           {_SQ_PCT_SQL}
    FROM r GROUP BY batch_seq, lang
"""


@register("pattern_streaming_quantiles_kmv", _STREAM_QUANTILES_ORACLE)
def q_pattern_streaming_quantiles_kmv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming quantile-sketch maintenance: documents replayed as 5
    micro-batches; each batch folds its per-language bottom-k hash
    sample into the fenced state and records the sample's exact
    nearest-rank p50/p90 token counts — the distribution-drift
    trajectory, oracle-pinned at every prefix by the same merge law as
    the KMV cardinality fold. See
    streaming/patterns.pattern_streaming_quantiles_kmv."""
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    run = staging.new_run_dir("pqkmv")
    chunks = staging.stage_document_chunks(spark, sf_dir, run, n_chunks=5)
    # cadence 2: fires the estimate-log maintenance mid-replay (see
    # test_entry_contract's cadence rationale)
    return patterns.pattern_streaming_quantiles_kmv(
        spark, chunks, run, k=_KQ_K, state_partitions=4, compact_every=2
    )
