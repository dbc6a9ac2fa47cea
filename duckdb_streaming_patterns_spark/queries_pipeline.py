"""Training-data pipeline queries: deterministic sampling, dataset splits,
corpus statistics, benchmark-contamination flagging, quality filtering, and
sketch-based cardinality. These are the day-to-day operations of a 100 TB
pretraining-data pipeline, composed from the engine's operator modules and
oracle-checked like everything else.

Sampling/split determinism: membership is a pure function of the row key
(first hex digit of md5(key)) — identical on any cluster size, any
partitioning, any engine (md5 is engine-portable), re-runnable with no
sampled state.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.text import distinct_tokens
from duckdb_streaming_patterns_spark.registry import register, _t


def _hash_digit(key):
    """First hex digit of md5(key) — a uniform 1/16 bucket id."""
    return F.substring(F.md5(key.cast("string")), 1, 1)


@register(
    "sample_docs_hash",
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    """,
)
def q_sample_docs_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1/16 corpus sample by content-independent key hash.
    The predicate is a pure row-local projection — no shuffle, no RNG
    state, stable under re-partitioning and re-runs."""
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(_hash_digit(F.col("doc_id")) == "0").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "train_val_test_split",
    """
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                     ('0','1','2','3','4','5','6','7','8','9','a','b')
                THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
                THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """75/12.5/12.5 train/val/test split by key hash; the assignment is a
    deterministic function of doc_id, so splits never leak across re-runs
    or cluster changes."""
    docs = _t(spark, sf_dir, "documents")
    h = _hash_digit(F.col("doc_id"))
    split = (
        F.when(h.isin(*list("0123456789ab")), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "corpus_token_stats",
    r"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           ROUND(avg(n_tok), 4) AS avg_tokens,
           CAST(max(n_tok) AS BIGINT) AS max_tokens
    FROM (SELECT source,
                 len(string_split_regex(trim(text), '\s+')) AS n_tok
          FROM documents)
    GROUP BY source
    """,
)
def q_corpus_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget accounting per source — the number every training run
    starts from. Single pass, partial aggregation, shuffle = #sources."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.select("source", n_tok.alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.max("n_tok").cast("bigint").alias("max_tokens"),
        )
    )


_CONTAMINATION_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_distinct(string_split_regex(trim(text), '\s+')) AS t
      FROM documents
    )
    SELECT a.doc_id,
           count(*) AS n_benchmark_matches,
           ROUND(max(len(list_intersect(a.t, b.t))
                     / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t)))),
                 6) AS max_jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.doc_id >= 50 AND b.doc_id < 50
    WHERE len(list_intersect(a.t, b.t))
          / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) >= 0.8
    GROUP BY a.doc_id
"""


@register("contamination_flags", _CONTAMINATION_ORACLE)
def q_contamination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: corpus docs (doc_id ≥ 50) whose token
    set overlaps a benchmark doc (doc_id < 50) at Jaccard ≥ 0.8, blocked on
    language. At 100 TB the benchmark side is tiny and broadcast; the
    corpus is never self-joined — cost is corpus × benchmark-per-block. For
    huge benchmarks, swap in the MinHash band join (operators/dedup.py)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", distinct_tokens(F.col("text")).alias("t")
    )
    corpus = toks.filter(F.col("doc_id") >= 50)
    bench = (
        toks.filter(F.col("doc_id") < 50)
        .withColumnRenamed("doc_id", "bench_id")
        .withColumnRenamed("t", "t_b")
    )
    inter = F.size(F.array_intersect(F.col("t"), F.col("t_b")))
    union = F.size(F.col("t")) + F.size(F.col("t_b")) - inter
    j = inter / union
    return (
        corpus.join(F.broadcast(bench), "lang")
        .withColumn("jaccard", j)
        .filter(F.col("jaccard") >= 0.8)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_benchmark_matches"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
    )


@register(
    "quality_filter_summary",
    r"""
    SELECT lang,
           count(*) AS n_pass,
           ROUND(avg(n_chars), 4) AS avg_chars
    FROM (SELECT lang, length(text) AS n_chars,
                 len(string_split_regex(trim(text), '\s+')) AS n_tok
          FROM documents)
    WHERE n_chars >= 150 AND n_tok >= 25
    GROUP BY lang
    """,
)
def q_quality_filter_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate pass rates per language (length + token-count floors —
    the first stage of every corpus-cleaning pipeline). All predicates are
    row-local; the only shuffle is the #langs-sized aggregation."""
    docs = _t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.select("lang", n_chars.alias("n_chars"), n_tok.alias("n_tok"))
        .filter((F.col("n_chars") >= 150) & (F.col("n_tok") >= 25))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_pass"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


_DOC_CHUNKS_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    )
    SELECT doc_id, start AS chunk_start,
           len(t[start:start+63]) AS n_chunk_tokens,
           md5(array_to_string(t[start:start+63], ' ')) AS chunk_md5
    FROM toks, unnest(range(1, greatest(1, len(t))+1, 48)) AS u(start)
"""


@register("doc_chunks", _DOC_CHUNKS_ORACLE)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into 64-token windows
    with stride 48 (16-token overlap) — the pretraining tokenize-and-chunk
    step. Pure row-local explode (sequence of window starts → slice), so
    it parallelizes per document with no shuffle at any scale; emitted
    chunks carry an md5 so the (wide) chunk text never needs to move."""
    docs = _t(spark, sf_dir, "documents")
    t = F.split(F.trim(F.col("text")), r"\s+")
    chunked = docs.select(
        "doc_id",
        t.alias("t"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(t)), F.lit(48))
        ).alias("chunk_start"),
    )
    window = F.slice(F.col("t"), F.col("chunk_start"), 64)
    return chunked.select(
        "doc_id",
        "chunk_start",
        F.size(window).alias("n_chunk_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_md5"),
    )


@register(
    "pack_token_bins",
    r"""
    WITH sized AS (
      SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             doc_id,
             len(string_split_regex(trim(text), '\s+')) AS n_tok
      FROM documents
    ), offsets AS (
      SELECT shard, n_tok,
             COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS prefix
      FROM sized
    )
    SELECT shard, CAST(floor(prefix / 2048.0) AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM offsets
    GROUP BY shard, bin_id
    """,
)
def q_pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to 2048-token training bins by
    running token offset, sharded 16 ways by key hash. Packing is
    inherently sequential, so the scale move is to shard first (each shard
    packs independently — one window shuffle per shard, never a global
    sort) and accept bin boundaries that split a document across bins:
    that IS how contiguous-token pretraining batches are built."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        _hash_digit(F.col("doc_id")).alias("shard"),
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sized.select(
        "shard",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("prefix"),
    )
    return (
        offsets.groupBy(
            "shard",
            F.floor(F.col("prefix") / 2048.0).cast("bigint").alias("bin_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "domain_mix_sample",
    """
    SELECT source, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE instr('0123456789abcdef',
                substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
          < CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 16
                 WHEN source IN ('src5','src6','src7','src8','src9') THEN 8
                 WHEN source IN ('src10','src11','src12','src13','src14') THEN 4
                 ELSE 2 END
    GROUP BY source
    """,
)
def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: per-source sampling rates (1, 1/2, 1/4, 1/8) applied
    as deterministic key-hash thresholds — the corpus-reweighting step of
    every pretraining mix. Membership is a pure function of (doc_id,
    source): no RNG state, stable under re-partitioning, and the same doc
    survives identically on every engine and cluster size."""
    docs = _t(spark, sf_dir, "documents")
    digit16 = (
        F.instr(F.lit("0123456789abcdef"), _hash_digit(F.col("doc_id"))) - 1
    )
    threshold = (
        F.when(F.col("source").isin(*[f"src{i}" for i in range(5)]), 16)
        .when(F.col("source").isin(*[f"src{i}" for i in range(5, 10)]), 8)
        .when(F.col("source").isin(*[f"src{i}" for i in range(10, 15)]), 4)
        .otherwise(2)
    )
    return (
        docs.filter(digit16 < threshold)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "top_bigrams_per_lang",
    r"""
    WITH toks AS (
      SELECT lang, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), bg AS (
      SELECT lang,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS bigram
      FROM toks
    ), counted AS (
      SELECT lang, bigram, count(*) AS n FROM bg GROUP BY lang, bigram
    )
    SELECT lang, bigram, n
    FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY n DESC, bigram) AS rk
          FROM counted)
    WHERE rk <= 5
    """,
)
def q_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 token bigrams per language — the n-gram statistics pass of
    corpus analysis. Bigram generation is a row-local zip of the token
    array with its own tail (no shuffle); the count is one partial+final
    aggregation, and the per-language top-k is a window over the (small)
    counted relation with a total-order tiebreak."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    t = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    counted = (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "bigram")
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "bigram", "n")
    )


@register("doc_chunks_udtf", _DOC_CHUNKS_ORACLE)
def q_doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME chunking as doc_chunks, via a Python UDTF lateral join
    (SURVEY §2.10 — the engine-defined table-function surface the
    reference only consumes). Row-at-a-time Python: the flexibility
    escape hatch, NOT the scale path — the native sequence/slice form is
    ~10x cheaper and both are held to the same DuckDB oracle, which is
    the point: swap-in extensions must not change results."""
    from duckdb_streaming_patterns_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("__docs_chunk_src")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_start, c.n_chunk_tokens, c.chunk_md5
        FROM __docs_chunk_src d, LATERAL chunk_doc(d.text) c
        """
    )


@register(
    "events_variant_stats",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM (SELECT event_type, CAST(props ->> '$.k' AS BIGINT) AS k FROM events)
    WHERE k IS NOT NULL
    GROUP BY event_type
    """,
)
def q_events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via VariantType (SURVEY §1.4's Spark-4
    mapping for the reference's `::json` cast, bonus_pattern.py:21):
    parse_json once, then typed variant_get extraction — the open-schema
    path where the JSON shape is not declared up front. Variant's binary
    encoding makes repeated field extraction cheaper than re-parsing
    strings per path (the get_json_object form in events_json_extract)."""
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


@register("approx_distinct_users", None)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user estimate per event type
    (approx_count_distinct, rsd 2%) — the constant-memory cardinality path
    for 100 TB streams where exact distinct state is unaffordable. No SQL
    oracle: sketch estimates differ across engines by construction;
    tests/test_pipeline_queries.py bounds the relative error against the
    exact count instead."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


@register(
    "user_gap_stats_pandas",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
      FROM events
    )
    SELECT user_id,
           count(gap_us) AS n_gaps,
           ROUND(quantile_cont(gap_us / 1e6, 0.5), 4) AS median_gap_s
    FROM g
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q_user_gap_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user median inter-event gap via grouped-map applyInPandas —
    the §2.10 grouped-map surface (one Arrow batch per key group, pandas
    inside). The same result is expressible natively (lag window +
    percentile) — the point of registering the pandas form is proving the
    escape hatch is value-equal to the SQL oracle, like doc_chunks_udtf.
    Gap multiset depends only on sorted timestamp VALUES, so timestamp
    ties cannot make the median nondeterministic."""
    import numpy as np
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        gaps = (
            pdf["ts"].sort_values().diff().dropna().dt.total_seconds().to_numpy()
        )
        if len(gaps) == 0:
            return pd.DataFrame(
                {"user_id": [], "n_gaps": [], "median_gap_s": []}
            ).astype({"user_id": "int64", "n_gaps": "int64"})
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_gaps": [len(gaps)],
                "median_gap_s": [float(np.median(gaps))],
            }
        )

    # round JVM-side: Spark's HALF_UP matches DuckDB's ROUND, while
    # Python's round() is half-even — one boundary value per ~10k groups
    # would mismatch the oracle otherwise.
    return ev.groupBy("user_id").applyInPandas(
        stats, "user_id long, n_gaps long, median_gap_s double"
    ).withColumn("median_gap_s", F.round("median_gap_s", 4))


from duckdb_streaming_patterns_spark.functions.text import DUCKDB_SHINGLE_SET_CTE

_NGRAM_CONTAM_ORACLE = rf"""
    WITH {DUCKDB_SHINGLE_SET_CTE},
    bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 50),
    corpus AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 50)
    SELECT c.doc_id, CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared_ngrams
    FROM corpus c JOIN bench b ON c.g = b.g
    GROUP BY c.doc_id
"""


@register("contamination_ngram_overlap", _NGRAM_CONTAM_ORACLE)
def q_contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram decontamination (the standard eval-leakage check):
    corpus docs (doc_id ≥ 50) that share any 3-token shingle with a
    benchmark doc (doc_id < 50), with the count of distinct shared
    shingles. The benchmark's distinct shingle set is broadcast — at
    100 TB scale that side is a few benchmark suites (~MBs as hashes, or
    a Bloom filter for billions of grams); the corpus side is one
    explode + semi-shaped join + per-doc count, never self-joined."""
    from duckdb_streaming_patterns_spark.functions.text import shingles

    docs = _t(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles(F.col("text")).alias("s"))
    bench_g = (
        sh.filter(F.col("doc_id") < 50)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    corpus_g = sh.filter(F.col("doc_id") >= 50).select(
        "doc_id", F.explode("s").alias("g")
    )
    return (
        corpus_g.join(F.broadcast(bench_g), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_ngrams"))
    )


from duckdb_streaming_patterns_spark.operators import dedup as _dedup

# The bloom decision replayed exactly: same 60-bit md5 hash, same three
# 20-bit slices mod 2^18, same all-k-bits membership rule — so the oracle
# checks the REAL bloom semantics, false positives included.
_BLOOM_POS = _dedup.DUCKDB_BLOOM_POS
_BLOOM_CONTAM_ORACLE = rf"""
    WITH {DUCKDB_SHINGLE_SET_CTE},
    bench_g AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 50),
    bench_pos AS (
      SELECT DISTINCT {_BLOOM_POS} AS p
      FROM (SELECT md5(g) AS m FROM bench_g) CROSS JOIN range(0, 3) j(j)
    ),
    corpus AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 50),
    cpos AS (
      SELECT doc_id, g, j.j, {_BLOOM_POS} AS p
      FROM (SELECT doc_id, g, md5(g) AS m FROM corpus)
      CROSS JOIN range(0, 3) j(j)
    ),
    hits AS (
      SELECT doc_id, g
      FROM cpos JOIN bench_pos USING (p)
      GROUP BY doc_id, g
      HAVING count(DISTINCT j) = 3
    ),
    flagged AS (SELECT doc_id, count(*) AS n_flagged FROM hits GROUP BY doc_id)
    SELECT c.doc_id,
           CAST(len(c.s) AS BIGINT) AS n_grams,
           CAST(COALESCE(f.n_flagged, 0) AS BIGINT) AS n_flagged,
           COALESCE(f.n_flagged, 0) > 0 AS bloom_flagged
    FROM (SELECT doc_id, s FROM sh WHERE doc_id >= 50) c
    LEFT JOIN flagged f ON c.doc_id = f.doc_id
"""


@register("contamination_bloom_flags", _BLOOM_CONTAM_ORACLE)
def q_contamination_bloom_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination gate (the Dolma-scale shape): the
    benchmark's shingle set is folded into a 32 KB bitset (three 20-bit
    md5-slice positions per gram) and every corpus doc's shingles are
    tested against it in one Arrow-batched pass — no join, no shuffle of
    the corpus, and the reference set costs 32 KB however many grams it
    holds (vs the exact check's broadcast of the full gram set). Flagged
    docs then go to `contamination_ngram_overlap` for exact verification.
    The oracle replays the identical bit arithmetic, so the gate's
    decision — false positives included — is hash-checked."""
    from duckdb_streaming_patterns_spark.functions.text import shingles

    docs = _t(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles(F.col("text")).alias("s")).filter(
        F.size("s") >= 1
    )
    bench_g = (
        sh.filter(F.col("doc_id") < 50)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    bitset = _dedup.bloom_build(bench_g, "g")
    return _dedup.bloom_flag_docs(
        sh.filter(F.col("doc_id") >= 50), bitset, "doc_id", "s"
    )


_MIX_BUDGET = 2000  # tokens per source

_MIX_BUDGET_ORACLE = rf"""
    WITH sized AS (
      SELECT source, doc_id,
             len(string_split_regex(trim(text), '\s+')) AS n_tok,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), running AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM sized
    )
    SELECT source, doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM running WHERE cum_tokens <= {_MIX_BUDGET}
"""


@register("mix_token_budget", _MIX_BUDGET_ORACLE)
def q_mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-proportional corpus mixing: per source, keep docs in
    deterministic md5(doc_id) order until the source's cumulative token
    count reaches the budget — how a training mix hits per-domain token
    targets reproducibly (same selection on any cluster size or engine,
    no sampled state). One window per source partition; the shuffle
    carries (source, doc_id, n_tok) — never text."""
    from pyspark.sql import Window as W

    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sized = docs.select(
        "source",
        "doc_id",
        n_tok.alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        sized.withColumn("cum_tokens", F.sum("n_tok").over(w))
        .filter(F.col("cum_tokens") <= _MIX_BUDGET)
        .select(
            "source",
            "doc_id",
            F.col("n_tok").cast("bigint").alias("n_tokens"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
    )


@register(
    "stratified_sample_docs",
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE CASE WHEN lang = 'en'
               THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                    IN ('0','1','2','3')
               ELSE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                    IN ('0','1','2','3','4','5','6','7')
          END
    """,
)
def q_stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus downsampling: keep 4/16 of over-represented
    English and 8/16 of every other language, selected by the first hex
    digit of md5(doc_id) — the same engine-portable hash family as the
    train/val/test split, so the sample is a pure function of the key:
    identical on any cluster size or partitioning, re-runnable with no
    stored state, and exactly oracle-checkable. The filter is a Column
    expression (no shuffle at all — a scan-time predicate); rebalancing
    language mix this way is the first step of corpus curation at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    h = _hash_digit(F.col("doc_id"))
    keep = F.when(F.col("lang") == "en", h.isin(*"0123")).otherwise(
        h.isin(*"01234567")
    )
    return docs.filter(keep).select("doc_id", "lang", "source", "n_chars")


_MIX_TARGET_FRAC = "0.2"  # target sample = 20% of the corpus
_MIX_W_SCALE = 1048576.0  # 2^20: weight quantization
_MIX_THR_SCALE = 4503599627370496.0  # 2^52: threshold quantization

# Temperature-weighted mixture sampling (round 13): per-source acceptance
# rates DERIVED from the corpus's own counts — rate_s = min(1, T*p_s/n_s)
# with p_s ~ sqrt(n_s) (temperature alpha = 0.5) and T = frac*total.
# ENGINE-EXACT by construction: the only transcendental is sqrt (IEEE
# correctly-rounded in both engines, unlike pow), each weight is floored
# to an integer W_s = floor(sqrt(n_s)*2^20), Z = SUM of integers (no
# order-dependent double reduction anywhere), and the rate is a FIXED
# sequence of scalar double ops on identical operands, floored to a
# 52-bit integer threshold compared against the doc hash's first 13 hex
# digits — so the sampled row set is a pure function of the corpus, bit-
# identical on any engine or partitioning.
_MIX_RATE_SQL = (
    "CAST(floor(LEAST(1.0, ({frac} * {total}) * "
    "(CAST({w} AS DOUBLE) / CAST({z} AS DOUBLE)) / {n}) * "
    "{thr_scale}) AS BIGINT)"
)

_MIX_TEMP_ORACLE = rf"""
    WITH n AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_docs,
                      CAST(floor(sqrt(CAST(count(*) AS DOUBLE))
                           * {_MIX_W_SCALE}) AS BIGINT) AS w
               FROM documents GROUP BY source),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM documents),
    z AS (SELECT sum(w) AS z FROM n),
    r AS (SELECT source,
                 {_MIX_RATE_SQL.format(frac=_MIX_TARGET_FRAC,
                                       total="total", w="n.w", z="z.z",
                                       n="n.n_docs",
                                       thr_scale=_MIX_THR_SCALE)}
                   AS accept_threshold
          FROM n, tot, z)
    SELECT d.doc_id, d.source, r.accept_threshold
    FROM (SELECT doc_id, source,
                 CAST(concat('0x',
                     substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                   AS BIGINT) AS h52
          FROM documents) d
    JOIN r USING (source)
    WHERE d.h52 < r.accept_threshold
"""


@register("mixture_temperature_sample", _MIX_TEMP_ORACLE)
def q_mixture_temperature_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-weighted corpus MIXING (the multilingual-LM sampling
    trick): source s's share of the training mix is ~sqrt(n_s)
    (alpha = 0.5 — upweights small sources, tempers the head), realized
    as a per-source acceptance rate over a deterministic 52-bit hash
    threshold. Unlike ``stratified_sample_docs`` (operator-chosen fixed
    rates) the rates here are a FUNCTION OF THE CORPUS STATISTICS,
    recomputed exactly on both engines — integer-quantized weights and
    an integer Z keep every cross-engine reduction exact (see
    _MIX_RATE_SQL's derivation note).

    Scale shape: one partial-agg count per source (tiny), the rate
    table broadcasts (n_sources rows), and the accept filter is a scan-
    time map-side predicate — the whole mix selection is one pass over
    the corpus with no shuffle of document rows at all; re-runnable
    with no sampled state (the selection is a pure function of doc_id
    and the corpus histogram)."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.count("*").cast("double").alias("n_docs")
    )
    n = n.withColumn(
        "w",
        F.expr(f"CAST(floor(sqrt(n_docs) * {_MIX_W_SCALE}) AS BIGINT)"),
    )
    # ONE bounded collect of the per-source histogram (n_sources rows)
    # replaces two scalar actions that each re-scanned the corpus (r16,
    # guide §1.2 — fewer passes): the corpus count is the exact sum of
    # the per-source counts, Z the exact integer weight sum (order-free
    # integer/double-exact reductions), and the rate expression below
    # re-evaluates over a LITERAL frame of the same (n_docs, w) rows —
    # identical operands through identical engine arithmetic, so the
    # thresholds are bit-identical while `documents` is scanned once for
    # the histogram instead of twice more (z=0 — an empty corpus — still
    # short-circuits: a zero Z would divide by zero in the rate
    # expression).
    src_stats = sorted(
        (r["source"], float(r["n_docs"]), int(r["w"]))
        for r in n.collect()  # bounded: n_sources rows
    )
    total = float(sum(t[1] for t in src_stats))
    z = int(sum(t[2] for t in src_stats))
    if z == 0:
        return docs.select(
            "doc_id", "source", F.lit(0).cast("long").alias("accept_threshold")
        ).limit(0)
    n_lit = spark.createDataFrame(
        src_stats, "source string, n_docs double, w bigint"
    )
    rates = n_lit.select(
        "source",
        F.expr(
            _MIX_RATE_SQL.format(
                frac=_MIX_TARGET_FRAC, total=total, w="w", z=z,
                n="n_docs", thr_scale=_MIX_THR_SCALE,
            )
        ).alias("accept_threshold"),
    )
    h52 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    return (
        docs.select("doc_id", "source", h52.alias("h52"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("h52") < F.col("accept_threshold"))
        .select("doc_id", "source", "accept_threshold")
    )


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle + sharding, KMV cardinality, quality classifier
# (round-4 additions)
# ---------------------------------------------------------------------------

from duckdb_streaming_patterns_spark.operators.dedup import (  # noqa: E402
    DUCKDB_HEX15,
)

_SHUF_SEED = "42"
_N_SHARDS = 8

_SHUFFLE_H60 = DUCKDB_HEX15.format(m="hx")

_SHUFFLE_ORACLE = f"""
    WITH h AS (SELECT doc_id,
                      md5('{_SHUF_SEED}:' || CAST(doc_id AS VARCHAR)) AS hx
               FROM documents),
         s AS (SELECT doc_id, hx, {_SHUFFLE_H60} % {_N_SHARDS} AS shard
               FROM h)
    SELECT doc_id,
           CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY hx, doc_id) AS BIGINT)
             AS shard_pos
    FROM s
"""


@register("corpus_shuffle_shards", _SHUFFLE_ORACLE)
def q_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded corpus shuffle + shard assignment — the
    data-ordering step every training run needs before sequence packing:
    each doc gets a shard (uniform by a 60-bit seeded md5 hash) and a
    position within its shard (hash order), so the global training order
    is a pure function of (seed, doc_id): identical on any cluster size
    or partitioning, re-runnable, resumable mid-epoch by (shard,
    shard_pos) ranges, and exactly oracle-checkable — none of which holds
    for rand()-based shuffles. At 100 TB the physical form is
    repartition(shard) + sortWithinPartitions(hash): ONE shuffle whose
    reducer output files ARE the epoch's shard files; the window here is
    the per-shard restatement of that sort (state = one counter per
    shard)."""
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    hx = F.md5(F.concat(F.lit(f"{_SHUF_SEED}:"), F.col("doc_id").cast("string")))
    h60 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    s = docs.select(
        "doc_id",
        hx.alias("hx"),
        F.pmod(h60, F.lit(_N_SHARDS)).cast("bigint").alias("shard"),
    )
    w = W.partitionBy("shard").orderBy("hx", "doc_id")
    return s.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("shard_pos"),
    )


_KMV_K = 64
_KMV_H60 = DUCKDB_HEX15.format(m="hx")

_KMV_ORACLE = f"""
    WITH d AS (SELECT DISTINCT event_type,
                      md5(CAST(user_id AS VARCHAR)) AS hx
               FROM events),
         h AS (SELECT event_type, hx, {_KMV_H60} AS h60 FROM d),
         r AS (SELECT event_type, h60,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY h60, hx) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS m
               FROM h)
    SELECT event_type,
           CASE WHEN max(m) < {_KMV_K} THEN CAST(max(m) AS DOUBLE)
                ELSE ROUND({_KMV_K - 1} * pow(2.0, 60)
                           / max(CASE WHEN rn = {_KMV_K} THEN h60 END), 2)
           END AS est_users
    FROM r GROUP BY event_type
"""


@register("approx_distinct_users_kmv", _KMV_ORACLE)
def q_approx_distinct_users_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-user estimate per event type —
    the engine-portable counterpart of `approx_distinct_users`: HLL
    register layouts are engine-specific (that query is rows-only by
    construction), while KMV's estimate (k-1)/R_k is a pure function of
    the k smallest md5 hashes, so the SAME portable hash family the
    sampling/dedup operators use makes an approximate-cardinality sketch
    exactly oracle-checkable. Groups smaller than k fall back to their
    exact count (standard KMV). At 100 TB, KMV is a mergeable sketch
    (union = merge k-min sets); this window formulation is its
    oracle-exact batch restatement, and the shuffle carries one 16-byte
    hash per DISTINCT (type, user) — partial aggregation collapses
    repeats map-side. Accuracy ~ 1/sqrt(k-1) ≈ 13% rsd at k=64;
    tests/test_pipeline_queries.py pins the observed error vs exact."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    d = ev.select(
        "event_type",
        F.md5(F.col("user_id").cast("string")).alias("hx"),
    ).distinct()
    h = d.withColumn(
        "h60", F.conv(F.substring("hx", 1, 15), 16, 10).cast("long")
    )
    r = h.select(
        "event_type",
        "h60",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("h60", "hx"))
        .alias("rn"),
        F.count("*").over(W.partitionBy("event_type")).alias("m"),
    )
    kth = F.max(F.when(F.col("rn") == _KMV_K, F.col("h60")))
    return r.groupBy("event_type").agg(
        F.when(
            F.max("m") < _KMV_K, F.max("m").cast("double")
        )
        .otherwise(
            F.round(
                F.lit(float(_KMV_K - 1)) * F.pow(F.lit(2.0), F.lit(60)) / kth,
                2,
            )
        )
        .alias("est_users")
    )


# The logistic-gate weights/fragments live in operators/textstats (a leaf
# module) so the streaming ingest funnel and its oracle can share them
# without importing the query registry (circular-import hazard).
from duckdb_streaming_patterns_spark.operators.textstats import (  # noqa: E402
    QC_LOGIT_SQL as _QC_LOGIT_SQL,
    QC_WEIGHTS as _QC_W,  # noqa: F401
    qc_logit,  # noqa: F401
)


@register("quality_classifier_scores", None)  # oracle assembled below
def q_quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate: a fixed-weight logistic classifier over
    the `text_quality_scores` features (the fastText-filter shape with
    the trained model reduced to literal weights — swap in real weights
    without touching the plan). Emits the logit (rounded 6dp), the
    sigmoid score (4dp, reporting only), and keep = logit >= 0 — the
    sign decision avoids cross-engine exp() last-ulp drift entirely.
    Scoring is one scan-side expression over the quality projection: no
    shuffle, no Python, 100 TB cost = the quality_scores scan itself.
    The oracle wraps the quality-scores oracle as a CTE so both engines
    score the exact same rounded features in the same written order."""
    from duckdb_streaming_patterns_spark.operators import textstats

    qs = textstats.quality_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )
    logit = qc_logit(qs)
    return qs.select(
        "doc_id",
        F.round(logit, 6).alias("quality_logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 4).alias(
            "quality_score"
        ),
        (logit >= 0).alias("keep"),
    )


from duckdb_streaming_patterns_spark.registry import QUERIES as _QP  # noqa: E402

_QC_ORACLE = f"""
    WITH qs AS ({_QP["text_quality_scores"][1]})
    SELECT doc_id,
           ROUND({_QC_LOGIT_SQL}, 6) AS quality_logit,
           ROUND(1.0 / (1.0 + exp(-{_QC_LOGIT_SQL})), 4) AS quality_score,
           {_QC_LOGIT_SQL} >= 0 AS keep
    FROM qs
"""
_QP["quality_classifier_scores"] = (
    _QP["quality_classifier_scores"][0],
    _QC_ORACLE,
)


# ---------------------------------------------------------------------------
# Capstone composition: the batch corpus build — ingest-funnel keep set →
# span removal WITHIN the kept corpus → deterministic shard assignment.
# One oracle replays the whole pipeline, so the driver can hash-check the
# end-to-end build decision, not just each stage.
# ---------------------------------------------------------------------------

from duckdb_streaming_patterns_spark.operators.dedup import (  # noqa: E402
    DUCKDB_BLOOM_POS as _BP,
)
from duckdb_streaming_patterns_spark.operators.textstats import (  # noqa: E402
    QC_LOGIT_SQL as _QLOGIT,
)
from duckdb_streaming_patterns_spark.functions.text import (  # noqa: E402
    duckdb_shingles as _duckdb_shingles,
)

# Decontamination unit for the BUILD is the word-8-gram (published
# practice: Lee et al. / GPT-3-style n≥8 overlap), not the 3-gram the
# standalone contamination checks use — on this small-vocabulary fixture
# 3-gram overlap is ~universal, and a build that drops everything tests
# nothing downstream.
_SH8 = _duckdb_shingles("text", 8)

# Shared funnel + span-removal CTE prefix (through ``clean``): the
# corpus-build manifest and the versioned RELEASE capstone both start
# from the same kept/cleaned corpus; the release extends it through
# temperature mixing + packing (round 14).
_FUNNEL_CLEAN_CTES = rf"""qs AS ({{quality_sql}}),
    firsts AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
      FROM documents
    ),
    sh8 AS (SELECT doc_id, {_SH8} AS s8 FROM documents),
    bench_g AS (SELECT DISTINCT unnest(s8) AS g FROM sh8 WHERE doc_id < 50),
    bench_pos AS (
      SELECT DISTINCT {_BP} AS p
      FROM (SELECT md5(g) AS m FROM bench_g) CROSS JOIN range(0, 3) j(j)
    ),
    corpus_g AS (SELECT doc_id, unnest(s8) AS g FROM sh8),
    cpos AS (
      SELECT doc_id, g, j.j, {_BP} AS p
      FROM (SELECT doc_id, g, md5(g) AS m FROM corpus_g)
      CROSS JOIN range(0, 3) j(j)
    ),
    hits AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id, g FROM cpos JOIN bench_pos USING (p)
        GROUP BY doc_id, g HAVING count(DISTINCT j) = 3
      )
    ),
    ql AS (SELECT doc_id, {_QLOGIT} AS logit FROM qs),
    kept AS (
      SELECT d.doc_id, d.text, d.source
      FROM documents d
      JOIN firsts f ON d.doc_id = f.doc_id
      JOIN ql ON d.doc_id = ql.doc_id
      LEFT JOIN hits h ON d.doc_id = h.doc_id
      WHERE d.doc_id = f.canonical_id
        AND ql.logit >= 0
        AND h.doc_id IS NULL
    ),
    toks AS (SELECT doc_id, text,
                    string_split_regex(trim(text), '\s+') AS t
             FROM kept),
    g AS (SELECT doc_id, u.i AS pos,
                 array_to_string(t[u.i : u.i + 7], ' ') AS gram
          FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS u(i)
          WHERE len(t) >= 8),
    r AS (SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY gram
                                    ORDER BY doc_id, pos) AS rn
          FROM g),
    cov AS (SELECT doc_id, unnest(generate_series(pos, pos + 7)) AS p
            FROM r WHERE rn >= 2),
    rem AS (SELECT doc_id, list(DISTINCT p) AS ps FROM cov GROUP BY doc_id),
    clean AS (
      SELECT toks.doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(COALESCE(len(rem.ps), 0) AS BIGINT) AS n_removed,
             COALESCE(array_to_string(
               list_filter(
                 list_transform(range(1, len(t) + 1),
                   i -> CASE WHEN NOT COALESCE(list_contains(rem.ps, i), FALSE)
                             THEN t[i] END),
                 x -> x IS NOT NULL),
               ' '), '') AS clean_text
      FROM toks LEFT JOIN rem ON toks.doc_id = rem.doc_id
    )"""

_BUILD_ORACLE = rf"""
    WITH {_FUNNEL_CLEAN_CTES},
    sharded AS (
      SELECT doc_id,
             md5('{_SHUF_SEED}:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM kept
    ),
    placed AS (
      SELECT doc_id, hx, {_SHUFFLE_H60} % {_N_SHARDS} AS shard
      FROM sharded
    )
    SELECT c.doc_id,
           CAST(p.shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY p.shard
                                   ORDER BY p.hx, p.doc_id) AS BIGINT)
             AS shard_pos,
           c.n_tokens, c.n_removed,
           c.n_tokens - c.n_removed AS n_clean_tokens,
           md5(c.clean_text) AS clean_md5
    FROM clean c JOIN placed p ON c.doc_id = p.doc_id
"""


def _funnel_keep_clean(spark: SparkSession, docs: DataFrame):
    """The ingest funnel's keep set + span-removed text, shared by the
    corpus-build manifest and the versioned release capstone: (1)
    corpus-wide exact dedup (first occurrence wins), (2) logistic
    quality gate, (3) Bloom decontamination vs the doc_id<50 benchmark,
    then Lee-et-al span removal computed WITHIN the kept corpus (gram
    statistics over survivors only). Returns (kept, clean): kept carries
    (doc_id, text, source), clean the per-doc token accounting +
    cleaned text."""
    from pyspark.sql import Window as W

    from duckdb_streaming_patterns_spark.functions.text import shingles
    from duckdb_streaming_patterns_spark.operators import dedup as dedup_ops
    from duckdb_streaming_patterns_spark.operators import textstats

    wdup = W.partitionBy(F.md5("text"))
    dedup_keep = docs.withColumn(
        "__canon", F.min("doc_id").over(wdup)
    ).filter(F.col("doc_id") == F.col("__canon"))
    # Quality gate AND bloom decontamination in ONE corpus scan (r17,
    # guide §1.2): both are per-row expressions over the same text, so
    # they evaluate in a single projection + filter — the r16 form ran
    # them as two separate corpus-scanning subtrees attached by a
    # semi-join and an anti-join. A doc is kept iff its logit clears
    # the gate and NO gram hits the bitset (hit-count 0 subsumes the
    # old size(s)>=1 pre-filter: a gram-less doc probes nothing and is
    # never flagged). The shingle array is aliased so it is computed
    # once per row; identical keep set, one corpus text pass and one
    # join fewer at any scale.
    pre = docs.select(
        "doc_id", "text", shingles(F.col("text"), k=8).alias("__s")
    )
    bench_g = (
        pre.filter(F.col("doc_id") < 50)
        .select(F.explode("__s").alias("g"))
        .distinct()
    )
    bitset = dedup_ops.bloom_build(bench_g, "g")
    qs = textstats.quality_scores(pre, "doc_id", "text", keep=["__s"])
    keep_ids = qs.filter(
        (textstats.qc_logit(qs) >= 0)
        & (dedup_ops.bloom_hit_count(F.col("__s"), bitset) == 0)
    ).select("doc_id")
    kept = dedup_keep.join(keep_ids, "doc_id", "semi").select(
        "doc_id", "text", "source"
    )
    clean = textstats.remove_duplicated_spans(kept, "doc_id", "text", n=8)
    return kept, clean


@register("corpus_build_shards", None)  # oracle assembled below
def q_corpus_build_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end batch corpus build, one plan: (1) the ingest
    funnel's keep set — corpus-wide exact dedup, logistic quality gate,
    Bloom decontamination vs the doc_id<50 benchmark; (2) Lee-et-al span
    removal computed WITHIN the kept corpus (pipeline order matters: gram
    statistics over the surviving docs only); (3) deterministic seeded
    shuffle + shard/position assignment of the cleaned docs. Output is
    the training-shard manifest (doc -> shard, position, token budget,
    cleaned-content fingerprint). Everything is a pure function of the
    corpus + seed, so the WHOLE build replays in one oracle SQL statement
    — the composition, not just the stages, is hash-verified."""
    from pyspark.sql import Window as W

    docs = _t(spark, sf_dir, "documents")
    kept, clean = _funnel_keep_clean(spark, docs)
    # deterministic shard placement of the survivors
    hx = F.md5(
        F.concat(F.lit(f"{_SHUF_SEED}:"), F.col("doc_id").cast("string"))
    )
    h60 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    placed = kept.select(
        "doc_id",
        hx.alias("hx"),
        F.pmod(h60, F.lit(_N_SHARDS)).cast("bigint").alias("shard"),
    )
    wsh = W.partitionBy("shard").orderBy("hx", "doc_id")
    return (
        clean.join(placed, "doc_id")
        .select(
            "doc_id",
            "shard",
            F.row_number().over(wsh).cast("bigint").alias("shard_pos"),
            "n_tokens",
            "n_removed",
            (F.col("n_tokens") - F.col("n_removed")).alias("n_clean_tokens"),
            F.md5("clean_text").alias("clean_md5"),
        )
    )


_QP["corpus_build_shards"] = (
    _QP["corpus_build_shards"][0],
    _BUILD_ORACLE.format(quality_sql=_QP["text_quality_scores"][1]),
)


# ---------------------------------------------------------------------------
# Versioned training-data RELEASE (round 14, verdict item 6): the full
# composition a training run consumes — funnel keep set → span removal →
# temperature-mixture sampling (rates from the KEPT corpus's own
# histogram) → deterministic shuffle/shards → packed token bins — built
# as ONE plan, written as shard data, and published behind a CommitIO
# release-manifest pointer (version, mixture thresholds, per-shard
# fingerprints + bin counts). The consumer's read path is ONE manifest
# GET + direct reads of the manifest-named data (zero LISTs) — pinned by
# tests/test_commitio_budget.py.
# ---------------------------------------------------------------------------

_RELEASE_BIN_TOKENS = 2048

#: releases of (version, data-dir) history the manifest retains — one
#: tiny dict per published release (same rationale as the hybrid
#: manifest's cap)
_RELEASE_HISTORY_CAP = 64

#: per-shard clean-token budget the release build derives its shard
#: count from (round 15, verdict item 2): n_shards = ceil(released
#: tokens / budget), so shard SIZE is constant as the corpus grows and
#: shard COUNT carries the scale — the Window.partitionBy("shard")
#: position pass parallelizes with the corpus instead of capping at a
#: module constant, and every per-shard/per-bin aggregation buffer is
#: budget-bounded. Test-scale value; a production deployment sets this
#: to its shard-file target (e.g. ~256M tokens per training shard).
_SHARD_TOKEN_BUDGET = 4096

_RELEASE_ORACLE = rf"""
    WITH {_FUNNEL_CLEAN_CTES},
    mixn AS (SELECT source, CAST(count(*) AS DOUBLE) AS n_docs,
                    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))
                         * {_MIX_W_SCALE}) AS BIGINT) AS w
             FROM kept GROUP BY source),
    mixtot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM kept),
    mixz AS (SELECT sum(w) AS z FROM mixn),
    mixr AS (SELECT source,
                    {_MIX_RATE_SQL.format(frac=_MIX_TARGET_FRAC,
                                          total="total", w="mixn.w",
                                          z="mixz.z", n="mixn.n_docs",
                                          thr_scale=_MIX_THR_SCALE)}
                      AS accept_threshold
             FROM mixn, mixtot, mixz),
    mixed AS (SELECT kept.doc_id, kept.source, mixr.accept_threshold
              FROM kept JOIN mixr USING (source)
              WHERE CAST(concat('0x',
                        substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                      AS BIGINT) < mixr.accept_threshold),
    reltok AS (SELECT CAST(COALESCE(sum(c.n_tokens - c.n_removed), 0)
                        AS BIGINT) AS t
               FROM mixed m JOIN clean c ON m.doc_id = c.doc_id),
    nsh AS (SELECT GREATEST(CAST(1 AS BIGINT),
                            (t + {_SHARD_TOKEN_BUDGET} - 1)
                              // {_SHARD_TOKEN_BUDGET}) AS n
            FROM reltok),
    placed AS (SELECT doc_id, source, accept_threshold,
                      md5('{_SHUF_SEED}:' || CAST(doc_id AS VARCHAR)) AS hx
               FROM mixed),
    sharded AS (SELECT doc_id, source, accept_threshold, hx,
                       {_SHUFFLE_H60} % (SELECT n FROM nsh) AS shard
                FROM placed),
    rel AS (SELECT s.doc_id, s.source, s.accept_threshold, s.hx,
                   CAST(s.shard AS BIGINT) AS shard,
                   c.n_tokens - c.n_removed AS n_clean_tokens,
                   md5(c.clean_text) AS clean_md5
            FROM sharded s JOIN clean c ON s.doc_id = c.doc_id)
    SELECT doc_id, source, accept_threshold, shard,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY hx, doc_id) AS BIGINT)
             AS shard_pos,
           CAST(floor(COALESCE(sum(n_clean_tokens) OVER (
                    PARTITION BY shard ORDER BY hx, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) / {_RELEASE_BIN_TOKENS}.0) AS BIGINT) AS bin_id,
           CAST(n_clean_tokens AS BIGINT) AS n_clean_tokens,
           clean_md5
    FROM rel
"""


def _release_manifest_path(release_dir: str) -> str:
    return _os.path.join(release_dir, "release.json")


def _release_assign(
    spark: SparkSession,
    reldocs: DataFrame,
    shard_token_budget: int = _SHARD_TOKEN_BUDGET,
):
    """The released per-doc assignment over funnel-kept, span-cleaned
    corpus metadata ``reldocs`` (doc_id, source, n_clean_tokens,
    clean_md5): temperature-mixture sampling → derived shard count →
    deterministic seeded shard placement → packed token bins. Shared by
    the batch release build and the streaming incremental release
    (round 15) — both MUST produce byte-identical assignments for the
    same corpus prefix, so everything here is a pure function of
    (reldocs, seed, budget) with engine-exact integer arithmetic.

    Returns (released DF, mixture block dict, n_shards). Scale shape:
    two bounded collects (the per-source histogram — n_sources rows —
    and the released token sum), a broadcast rate join, ONE shuffle on
    shard for the position window — at 100 TB the physical form is
    repartition(shard) + sortWithinPartitions (see
    q_corpus_shuffle_shards), with n_shards ~ corpus tokens / budget so
    per-shard state is budget-bounded regardless of corpus size."""
    n = reldocs.groupBy("source").agg(
        F.count("*").cast("double").alias("n_docs")
    )
    n = n.withColumn(
        "w",
        F.expr(f"CAST(floor(sqrt(n_docs) * {_MIX_W_SCALE}) AS BIGINT)"),
    )
    # ONE bounded collect of the per-source histogram (n_sources rows)
    # replaces three sequential actions over reldocs (r16, guide §1.2 —
    # fewer passes): the corpus count is the exact sum of the per-source
    # counts (double-exact below 2^53), Z the exact integer sum of the
    # per-source weights, and the rate table is re-evaluated over a
    # LITERAL frame of the same (source, n_docs, w) rows — the
    # _MIX_RATE_SQL arithmetic runs unchanged in the engine on identical
    # operands, so the thresholds (and with them the sampled set) are
    # bit-identical while reldocs is scanned once here instead of three
    # times (count, weight-sum, and the threshold collect below each
    # re-ran the groupBy; so did every downstream action through the
    # broadcast join's rate subtree).
    src_stats = sorted(
        (r["source"], float(r["n_docs"]), int(r["w"]))
        for r in n.collect()  # bounded: n_sources rows
    )
    total = float(sum(t[1] for t in src_stats))
    z = int(sum(t[2] for t in src_stats))
    if z == 0:
        raise ValueError("_release_assign: empty kept corpus")
    n_lit = spark.createDataFrame(
        src_stats, "source string, n_docs double, w bigint"
    )
    rates = n_lit.select(
        "source",
        F.expr(
            _MIX_RATE_SQL.format(
                frac=_MIX_TARGET_FRAC, total=total, w="w", z=z,
                n="n_docs", thr_scale=_MIX_THR_SCALE,
            )
        ).alias("accept_threshold"),
    )
    h52 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    mixed = (
        reldocs.select(
            "doc_id", "source", "n_clean_tokens", "clean_md5",
            h52.alias("__h52"),
        )
        .join(F.broadcast(rates), "source")
        .filter(F.col("__h52") < F.col("accept_threshold"))
        .select(
            "doc_id", "source", "accept_threshold",
            "n_clean_tokens", "clean_md5",
        )
    )
    # derived shard count (round 15, verdict item 2): one more bounded
    # scalar — the RELEASED token total — then integer ceil-div so both
    # engines agree exactly; shard size is budget-pinned, shard count
    # (and with it the window's parallelism) grows with the corpus
    rel_tok = int(mixed.agg(F.sum("n_clean_tokens")).first()[0] or 0)
    n_shards = max(
        1, (rel_tok + shard_token_budget - 1) // shard_token_budget
    )
    hx = F.md5(
        F.concat(F.lit(f"{_SHUF_SEED}:"), F.col("doc_id").cast("string"))
    )
    h60 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    placed = mixed.select(
        "doc_id",
        "source",
        "accept_threshold",
        "n_clean_tokens",
        "clean_md5",
        hx.alias("hx"),
        F.pmod(h60, F.lit(n_shards)).cast("bigint").alias("shard"),
    )
    from pyspark.sql import Window as W

    wsh = W.partitionBy("shard").orderBy("hx", "doc_id")
    wtok = wsh.rowsBetween(W.unboundedPreceding, -1)
    released = placed.select(
        "doc_id",
        "source",
        "accept_threshold",
        "shard",
        F.row_number().over(wsh).cast("bigint").alias("shard_pos"),
        F.floor(
            F.coalesce(F.sum("n_clean_tokens").over(wtok), F.lit(0))
            / float(_RELEASE_BIN_TOKENS)
        )
        .cast("bigint")
        .alias("bin_id"),
        "n_clean_tokens",
        "clean_md5",
    )
    thresholds = sorted(
        (r["source"], int(r["accept_threshold"]))
        for r in rates.collect()  # bounded: n_sources rows
    )
    mixture = {
        "alpha": 0.5,
        "target_frac": float(_MIX_TARGET_FRAC),
        "total": int(total),
        "z": z,
        "thresholds": [
            {"source": s, "accept_threshold": t} for s, t in thresholds
        ],
    }
    return released, mixture, n_shards


def _release_fingerprint_df(stored: DataFrame) -> DataFrame:
    """Merkle-shaped per-shard fingerprints over the WRITTEN release
    data (round 15, verdict item 2): md5 over each bin's clean_md5
    sequence in position order, then md5 over the shard's bin hashes in
    bin order. Hash-exact for a consumer that verifies bottom-up, and
    every aggregation buffer is bounded — the per-bin collect_list
    holds one BIN's docs (~bin_tokens worth), the per-shard list holds
    32-byte bin hashes (budget/bin_tokens of them) — instead of the
    r14 shape that materialized a whole shard's md5 sequence in one
    buffer (O(shard) executor memory, the 100 TB killer). DataFrame
    form shared by the build-time attestation
    (:func:`_release_fingerprints`, an n_shards-row bounded collect)
    and the consumer-side :func:`corpus_release_verify`."""
    bins = stored.groupBy("shard", "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_clean_tokens").cast("long").alias("n_clean_tokens"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("shard_pos", "clean_md5"))
                    ),
                    lambda s: s["clean_md5"],
                ),
            )
        ).alias("bin_md5"),
    )
    return bins.groupBy("shard").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        (F.max("bin_id") + 1).cast("long").alias("n_bins"),
        F.sum("n_clean_tokens").cast("long").alias("n_clean_tokens"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bin_id", "bin_md5"))
                    ),
                    lambda s: s["bin_md5"],
                ),
            )
        ).alias("fingerprint"),
    )


def _release_fingerprints(stored: DataFrame) -> list:
    """Build-time attestation form: bounded collect, n_shards rows."""
    return _release_fingerprint_df(stored).collect()


def _release_raise_floor(io, path: str, cur: dict, version: int):
    """The forget's covered-race branch: the head version already
    covers ours — raise the floor and truncate sub-floor history on
    the CURRENT head (one CAS; None on a lost race, caller
    re-reads)."""
    from duckdb_streaming_patterns_spark.plans.commitio import (
        PointerCasError,
    )

    new_man = dict(cur)
    new_man["floor"] = max(int(cur.get("floor", 0)), version)
    new_man["hist"] = [
        h for h in cur.get("hist", [])
        if int(h["version"]) >= new_man["floor"]
    ]
    try:
        io.swap_pointer(path, new_man, expected=cur)
        return new_man
    except PointerCasError:
        return None


def _release_covered(io, release_dir: str, version: int, forget: bool):
    """Spark-free pre-check half of the release publish discipline:
    returns the GOVERNING manifest when ``version`` is already covered
    (raising the floor for a not-yet-raised forget), else None — the
    caller may build. Factored from corpus_release_build (round 15) so
    the pointer algebra is property-testable without building data."""
    from duckdb_streaming_patterns_spark.plans.commitio import (
        PointerCasError,
    )

    path = _release_manifest_path(release_dir)
    cur = io.try_read_json(path)
    if cur is None or int(cur["version"]) < version:
        return None
    if not forget or int(cur.get("floor", 0)) >= version:
        return cur
    for _ in range(16):
        out = _release_raise_floor(io, path, cur, version)
        if out is not None:
            return out
        cur = io.read_json(path)
        if int(cur.get("floor", 0)) >= version:
            return cur
    raise PointerCasError(
        f"corpus_release_build({release_dir}, v{version}): floor "
        "CAS retry budget exhausted"
    )


def _release_publish(
    io, release_dir: str, manifest: dict, version: int, forget: bool,
    data_dir: str | None = None,
) -> dict:
    """Spark-free CAS half of the release publish discipline: install
    ``manifest`` as the head iff the version is still uncovered —
    version-monotone, multi-writer-safe (a lost race re-reads and
    re-plans), floor-carrying. On a race lost AFTER the build, the
    caller's attempt ``data_dir`` is deleted (it can never be
    published) and the winner's manifest governs — a forget still
    raises the floor on the winner's head. Factored from
    corpus_release_build (round 15) for property testing."""
    from duckdb_streaming_patterns_spark.plans.commitio import (
        READ_ABSENT,
        PointerCasError,
    )

    path = _release_manifest_path(release_dir)
    for _ in range(16):
        cur = io.try_read_json(path)
        cur_floor = int(cur.get("floor", 0)) if cur else 0
        if cur is not None and int(cur["version"]) >= version:
            if data_dir is not None:
                io.delete_tree(data_dir)
                data_dir = None  # delete once
            if not forget or cur_floor >= version:
                return cur
            out = _release_raise_floor(io, path, cur, version)
            if out is not None:
                return out
            continue
        floor = version if forget else cur_floor
        hist = [] if forget else (list(cur.get("hist", [])) if cur else [])
        if cur is not None and not forget:
            hist.append({"version": cur["version"], "data": cur["data"]})
            hist = [h for h in hist if int(h["version"]) >= floor]
        manifest["floor"] = floor
        manifest["hist"] = hist[-_RELEASE_HISTORY_CAP:]
        expected = cur if cur is not None else {READ_ABSENT: True}
        try:
            io.swap_pointer(path, manifest, expected=expected)
            return manifest
        except PointerCasError:
            continue
    raise PointerCasError(
        f"corpus_release_build({release_dir}, v{version}): CAS retry "
        "budget exhausted"
    )


def corpus_release_build(
    spark: SparkSession,
    docs: DataFrame | None,
    release_dir: str,
    io=None,
    version: int = 0,
    forget: bool = False,
    shard_token_budget: int = _SHARD_TOKEN_BUDGET,
    covers=None,
    reldocs: DataFrame | None = None,
) -> dict:
    """Build + publish one corpus release version: compute the released
    per-doc assignment (funnel → clean → mixture → shard → bin) as one
    plan, write it as shard-partitioned parquet under a version-named
    ATTEMPT dir, and CAS-publish the release manifest STRICTLY LAST —
    the pointer is the commit point, so a crash mid-write leaves an
    unreferenced orphan dir and readers on the previous version.

    Version monotonicity is checked BEFORE any data write (round 15,
    ADVICE r14): a stale or duplicate-version rebuild returns the
    CURRENT manifest without touching storage, and the data dir name
    carries a unique attempt suffix, so even a build racing the
    pre-check can never overwrite a dir the live manifest references —
    the published per-shard fingerprints always attest exactly the
    bytes their dir holds. A build that loses the version race deletes
    its own orphan attempt dir and returns the winner's manifest;
    crashed attempts are swept by :func:`corpus_release_sweep_orphans`.

    ``forget=True`` marks a GDPR-driven rebuild over the surviving
    corpus: the manifest publishes with its version history TRUNCATED
    and its ``floor`` (minimum pinnable version) raised to this
    version — pre-delete releases must stop being pinnable — and the
    guarantee survives a racing normal publish exactly like the hybrid
    manifest's (a covered-but-floor-unraised retry republishes the
    racer's head with the floor raised). Coordination caveat: the floor
    governs PINNABILITY; a concurrent normal build that read the
    pre-delete corpus could still publish post-forget content-stale
    data at a higher version — orchestration must sequence corpus
    deletes before dependent rebuilds (same contract as
    retrieval_forget's corpus feed).

    The manifest carries what a training run needs to trust the bytes:
    the mixture thresholds it was sampled with (auditable mixing), the
    derived shard count + token budget, and per-shard MERKLE
    fingerprints (md5 per bin in position order, md5 over the ordered
    bin hashes) — so a consumer can verify any shard OR any single bin
    it read without re-deriving the corpus, with bounded memory at
    every level.

    Scale shape: one pass over the corpus (the funnel + span removal
    dominate), two bounded collects (per-source histogram + released
    token sum), an n_shards-row collect for the fingerprints, one data
    write, one pointer swap. Publish is
    version-monotone and multi-writer-safe via the CAS (same
    discipline as publish_hybrid_manifest). ``reldocs`` (round 16)
    skips the funnel entirely: the caller supplies the per-doc
    (doc_id, source, n_clean_tokens, clean_md5) metadata — the
    streaming release ladder maintains it incrementally per
    micro-batch, so its release ticks cost O(released metadata) +
    the data write, never a corpus re-funnel."""
    import uuid as _uuid

    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    io = io if io is not None else POSIX_IO
    covered = _release_covered(io, release_dir, version, forget)
    if covered is not None:
        # version already covered: REFUSED BEFORE ANY DATA WRITE — the
        # live manifest may reference this version's dir; rebuilding it
        # would overwrite attested bytes under readers (ADVICE r14)
        return covered
    if reldocs is None:
        # one-shot batch build: run the funnel + span removal here. The
        # streaming ladder instead passes ``reldocs`` — the per-doc
        # funnel/clean metadata it maintains INCREMENTALLY per
        # micro-batch (round 16) — so a release tick pays O(released
        # metadata), never a corpus-prefix funnel re-run.
        kept, clean = _funnel_keep_clean(spark, docs)
        reldocs = kept.select("doc_id", "source").join(
            clean.select(
                "doc_id",
                (F.col("n_tokens") - F.col("n_removed"))
                .cast("bigint")
                .alias("n_clean_tokens"),
                F.md5("clean_text").alias("clean_md5"),
            ),
            "doc_id",
        )
    reldocs = reldocs.localCheckpoint(eager=True)  # the assignment takes
    # several actions over this frame — funnel/state-scan runs once, not 4x
    released, mixture, n_shards = _release_assign(
        spark, reldocs, shard_token_budget
    )
    data_name = f"data_v{version:04d}_{_uuid.uuid4().hex[:8]}"
    data_dir = _os.path.join(release_dir, data_name)
    (
        released.repartition(F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(data_dir)
    )
    # per-shard fingerprints from the WRITTEN data (the manifest attests
    # the bytes a consumer will read, not the plan that produced them)
    shards = _release_fingerprints(spark.read.parquet(data_dir))
    manifest = {
        "version": version,
        "data": data_name,
        "bin_tokens": _RELEASE_BIN_TOKENS,
        "seed": _SHUF_SEED,
        "n_shards": n_shards,
        "shard_token_budget": shard_token_budget,
        "fingerprint_algo": "merkle/bin-md5/v1",
        # which corpus prefix this release covers (the streaming
        # incremental build stamps its micro-batch watermark here so a
        # training run can correlate release versions with ingest
        # progress; None for a one-shot batch build)
        "covers": covers,
        "mixture": mixture,
        "shards": sorted(
            (
                {
                    "shard": int(r["shard"]),
                    "n_docs": int(r["n_docs"]),
                    "n_bins": int(r["n_bins"]),
                    "n_clean_tokens": int(r["n_clean_tokens"]),
                    "fingerprint": r["fingerprint"],
                }
                for r in shards
            ),
            key=lambda d: d["shard"],
        ),
    }
    # pointer strictly last, version-monotone, CAS-retried (the same
    # multi-writer discipline as publish_hybrid_manifest). The manifest
    # keeps a bounded HISTORY of (version, data) pairs so a training
    # run can pin an OLDER release from the same single GET — the
    # reproducibility contract a rerun needs.
    return _release_publish(
        io, release_dir, manifest, version, forget, data_dir=data_dir
    )


def release_version_diff(
    spark: SparkSession,
    release_dir: str,
    v_old: int,
    v_new: int | None = None,
    io=None,
) -> DataFrame:
    """Cross-release audit (round 15): which docs ENTERED, LEFT, or
    MOVED between two published release versions — the "what changed in
    my training data" question a rerun asks before trusting a new
    version. Both versions resolve through the SAME manifest (one GET —
    ``v_old`` through the bounded history, ``v_new=None`` = the head),
    then one full-outer join on doc_id classifies every doc:

    - ``added``: in the new release only (corpus growth or mixture
      rates admitting it as the histogram shifted);
    - ``removed``: in the old only (rates tightened, or the doc left
      the corpus — the GDPR case);
    - ``moved``: in both but at a different (shard, shard_pos, bin) —
      repacking, which a resumable training run must know about;
    - ``stable``: same placement.

    Old/new placement columns are -1-coalesced (never NULL) so the
    result is engine-exactly comparable. Scale: two manifest-named
    parquet scans + ONE shuffle on doc_id for the join — no corpus
    rescan, no funnel re-run; cost is O(released rows), not O(corpus).
    """
    old = corpus_release_read(spark, release_dir, io=io, at_version=v_old)
    new = corpus_release_read(spark, release_dir, io=io, at_version=v_new)
    o = old.select(
        "doc_id",
        F.col("shard").alias("__os"),
        F.col("shard_pos").alias("__op"),
        F.col("bin_id").alias("__ob"),
    )
    n = new.select(
        "doc_id",
        F.col("shard").alias("__ns"),
        F.col("shard_pos").alias("__np"),
        F.col("bin_id").alias("__nb"),
    )
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("__os").isNull(), F.lit("added"))
        .when(F.col("__ns").isNull(), F.lit("removed"))
        .when(
            (F.col("__os") != F.col("__ns"))
            | (F.col("__op") != F.col("__np"))
            | (F.col("__ob") != F.col("__nb")),
            F.lit("moved"),
        )
        .otherwise(F.lit("stable"))
    )
    neg1 = F.lit(-1).cast("bigint")
    return j.select(
        "doc_id",
        status.alias("status"),
        F.coalesce(F.col("__os"), neg1).alias("old_shard"),
        F.coalesce(F.col("__ob"), neg1).alias("old_bin"),
        F.coalesce(F.col("__ns"), neg1).alias("new_shard"),
        F.coalesce(F.col("__nb"), neg1).alias("new_bin"),
    )


def release_epoch_plan(
    spark: SparkSession,
    release_dir: str,
    n_workers: int,
    at_version: int | None = None,
    io=None,
) -> DataFrame:
    """The data-loader's read plan for one training epoch (round 15;
    TOKEN-balanced round 16): given a published release version, emit
    each worker's ORDERED list of (shard, bin) units with doc/token
    counts. Workers own whole shards (a shard's position order is never
    split across workers and the seeded global order is preserved
    within each worker), assigned by SERPENTINE order over shards
    ranked by (token count desc, shard): rank r goes to worker r % w on
    even rounds and w-1-(r % w) on odd rounds — the boustrophedon
    schedule that closes the r15 corner where `shard % n_workers` gave
    one worker up to a full extra shard (the budget-partial last shard
    + any n_workers ∤ n_shards remainder). The spread (max − min worker
    tokens) stays ≤ the largest shard's tokens — i.e. ≤ the shard
    token budget — the same bound greedy LPT gives, while remaining a
    pure SQL-expressible function of the manifest (the oracle replays
    it; LPT's argmin recurrence is not). ``seq`` numbers each worker's
    units in read order (shard, then bin); resumption is a (worker,
    seq) watermark. Re-sharding the WORKERS (a different n_workers)
    never changes what a unit contains, only who reads it — the unit
    identity is (shard, bin), pinned by the manifest's Merkle bin
    hashes, which :func:`corpus_release_verify` recomputes from the
    stored bytes (the pre-epoch integrity check this plan's consumer
    should run first).

    Scale: one manifest-named scan + a (shard, bin)-grouped aggregation
    (partial map-side — the scan is shard-partitioned) + one window
    over units (corpus_tokens/bin_tokens rows — millions at 100 TB,
    trivially window-able) + one global rank over SHARDS
    (corpus_tokens/budget narrow rows; metadata-scale, the same class
    as the manifest itself). O(units), never O(docs)."""
    from pyspark.sql import Window as W

    rel = corpus_release_read(spark, release_dir, io=io, at_version=at_version)
    units = rel.groupBy("shard", "bin_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_clean_tokens").cast("long").alias("n_tokens"),
    )
    shards = units.groupBy("shard").agg(
        F.sum("n_tokens").alias("__stok")
    )
    r = (
        F.row_number().over(
            W.orderBy(F.col("__stok").desc(), F.col("shard"))
        )
        - 1
    )
    pos = F.pmod(r, F.lit(n_workers))
    worker = F.when(
        F.pmod(F.floor(r / n_workers), F.lit(2)) == 0, pos
    ).otherwise(F.lit(n_workers - 1) - pos)
    asg = shards.select(
        "shard", worker.cast("bigint").alias("worker")
    )
    wseq = W.partitionBy("worker").orderBy("shard", "bin_id")
    return (
        units.join(F.broadcast(asg), "shard")
        .select(
            "worker", "shard", "bin_id", "n_docs", "n_tokens"
        )
        .select(
            "worker",
            F.row_number().over(wseq).cast("bigint").alias("seq"),
            "shard",
            "bin_id",
            "n_docs",
            "n_tokens",
        )
    )


def corpus_release_sweep_orphans(release_dir: str, io=None) -> list[str]:
    """Delete unreferenced release data dirs left by crashed or
    race-losing builds (round 15): any ``data_v*`` dir whose version is
    <= the manifest head's and whose name is referenced by neither the
    head nor the history can never be published (the CAS is
    version-monotone) — it is garbage. Attempt dirs at versions ABOVE
    the head are left alone: they may belong to an in-flight build.
    O(dirs) requests; never touches referenced data."""
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    io = io if io is not None else POSIX_IO
    cur = io.try_read_json(_release_manifest_path(release_dir))
    if cur is None:
        return []
    head = int(cur["version"])
    referenced = {cur["data"]} | {h["data"] for h in cur.get("hist", [])}
    swept = []
    for name in io.list_names(release_dir):
        if not name.startswith("data_v") or name in referenced:
            continue
        try:
            # parse up to the '_' attempt-suffix separator, NOT a fixed
            # 4-char slice (ADVICE r15: data_v10000_… would misparse as
            # 1000 and an above-head in-flight attempt could be swept
            # mid-build once the head passes 4 digits)
            v = int(name[6:].split("_", 1)[0])
        except ValueError:
            continue
        if v <= head:
            io.delete_tree(_os.path.join(release_dir, name))
            swept.append(name)
    return sorted(swept)


def corpus_release_read(
    spark: SparkSession, release_dir: str, io=None, at_version: int | None = None
) -> DataFrame:
    """The training run's read path: ONE manifest GET resolves the
    released version and its data dir; the scan reads the manifest-named
    path directly — zero LIST calls, zero reliance on directory layout
    (tests/test_commitio_budget.py pins the request budget). Returns the
    per-doc release assignment exactly as published.

    ``at_version`` pins an OLDER release through the manifest's bounded
    history (still the same single GET) — the reproducibility path a
    training rerun takes; raises if the version was never published,
    was expired by :func:`corpus_release_expire`, or sits below the
    manifest's forget ``floor`` (a GDPR rebuild truncated the history —
    pre-delete releases must not be pinnable even if a reader could
    somehow still resolve one)."""
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    io = io if io is not None else POSIX_IO
    man = io.read_json(_release_manifest_path(release_dir))
    if at_version is not None and at_version < int(man.get("floor", 0)):
        raise ValueError(
            f"release version {at_version} was forgotten (manifest "
            f"floor {man.get('floor')}) — not servable"
        )
    if at_version is not None and int(man["version"]) != at_version:
        hits = [
            h for h in man.get("hist", [])
            if int(h["version"]) == at_version
        ]
        if not hits:
            raise ValueError(
                f"release version {at_version} is not in the manifest "
                f"(head {man['version']}, history holds "
                f"{len(man.get('hist', []))} versions)"
            )
        man = hits[-1]
    return spark.read.parquet(
        _os.path.join(release_dir, man["data"])
    ).select(
        "doc_id",
        "source",
        "accept_threshold",
        F.col("shard").cast("bigint").alias("shard"),
        "shard_pos",
        "bin_id",
        "n_clean_tokens",
        "clean_md5",
    )


def corpus_release_verify(
    spark: SparkSession,
    release_dir: str,
    shard: int | None = None,
    io=None,
) -> DataFrame:
    """Consumer-side Merkle verification (round 16, verdict item 6) —
    the integrity half a training run calls BEFORE an epoch: recompute
    the per-shard fingerprints bottom-up (bin md5s over clean_md5 in
    position order, shard md5 over bin hashes in bin order) from the
    manifest-named stored data and compare them, field by field,
    against what the HEAD manifest attests. Returns one row per shard:
    (shard, n_docs, n_bins, n_clean_tokens, fingerprint, ok) — the
    recomputed values with ``ok`` false on any divergence (tampered or
    truncated bins flip the bin hash and everything above it; a shard
    missing from storage or unattested by the manifest reports -1
    counts / '' fingerprint on its absent side).

    ``shard`` restricts the check to one shard — the stored data is
    shard-partitioned, so the scan prunes to that shard's partition
    (PartitionFilters), the single-shard pre-read check a resuming
    worker runs. Head-only by design: history entries pin (version,
    data) but deliberately not the O(n_shards) fingerprint lists (the
    pointer document stays metadata-sized); a pinned rung re-verifies
    against the manifest that published it.

    Scale: one manifest GET, one (pruned) scan of the release data,
    the same bounded-buffer Merkle aggregation as the build, one
    n_shards-row (or 1-row) broadcast of the attested values. O(stored
    release), never O(corpus)."""
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    io = io if io is not None else POSIX_IO
    man = io.read_json(_release_manifest_path(release_dir))
    attested = [
        s for s in man["shards"]
        if shard is None or int(s["shard"]) == shard
    ]
    # n_shards-row driver list — the manifest already holds it in one
    # pointer document, so this adds no new scale class
    exp = spark.createDataFrame(
        [
            (
                int(s["shard"]),
                int(s["n_docs"]),
                int(s["n_bins"]),
                int(s["n_clean_tokens"]),
                s["fingerprint"],
            )
            for s in attested
        ],
        "shard bigint, e_n_docs bigint, e_n_bins bigint, "
        "e_n_clean_tokens bigint, e_fingerprint string",
    )
    stored = spark.read.parquet(_os.path.join(release_dir, man["data"]))
    if shard is not None:
        stored = stored.filter(F.col("shard") == shard)
    actual = _release_fingerprint_df(stored).withColumn(
        "shard", F.col("shard").cast("bigint")
    )
    neg1 = F.lit(-1).cast("bigint")
    return (
        actual.join(F.broadcast(exp), "shard", "full_outer")
        .select(
            "shard",
            F.coalesce("n_docs", neg1).alias("n_docs"),
            F.coalesce("n_bins", neg1).alias("n_bins"),
            F.coalesce("n_clean_tokens", neg1).alias("n_clean_tokens"),
            F.coalesce("fingerprint", F.lit("")).alias("fingerprint"),
            (
                F.col("n_docs").eqNullSafe(F.col("e_n_docs"))
                & F.col("n_bins").eqNullSafe(F.col("e_n_bins"))
                & F.col("n_clean_tokens").eqNullSafe(
                    F.col("e_n_clean_tokens")
                )
                & F.col("fingerprint").eqNullSafe(F.col("e_fingerprint"))
            ).alias("ok"),
        )
    )


def corpus_release_expire(
    release_dir: str, io=None, keep_last: int = 2
) -> list[int]:
    """Release retention: drop all but the newest ``keep_last``
    versions. Ordering keeps readers safe at every instant — the
    manifest republishes with the expired versions REMOVED from history
    FIRST (CAS; a reader resolving the pointer after this can no longer
    name the expired versions), and only then are their data dirs
    deleted (a crash between the two leaves unreferenced orphan dirs, a
    retry re-lists nothing from the manifest and sweeps them — the same
    orphan discipline as promote). Returns the expired version numbers.
    O(expired versions) requests; never touches live data."""
    from duckdb_streaming_patterns_spark.plans.commitio import (
        POSIX_IO,
        PointerCasError,
    )

    io = io if io is not None else POSIX_IO
    path = _release_manifest_path(release_dir)
    for _ in range(16):
        cur = io.try_read_json(path)
        if cur is None:
            return []
        hist = list(cur.get("hist", []))
        keep_hist = max(0, keep_last - 1)  # the head is version #1 kept
        expired = hist[: len(hist) - keep_hist] if keep_hist else hist
        if not expired:
            return []
        new_man = dict(cur)
        new_man["hist"] = hist[len(expired):]
        try:
            io.swap_pointer(path, new_man, expected=cur)
        except PointerCasError:
            continue  # lost a race with a publisher — re-read, re-plan
        for h in expired:
            io.delete_tree(_os.path.join(release_dir, h["data"]))
        return [int(h["version"]) for h in expired]
    raise PointerCasError(
        f"corpus_release_expire({release_dir}): CAS retry budget exhausted"
    )


@register("corpus_release_manifest", None)  # oracle assembled below
def q_corpus_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned training-data RELEASE capstone (round 14): ONE
    composition — funnel keep set → span removal → temperature-mixture
    sampling (rates from the kept corpus's histogram, auditable in the
    manifest) → deterministic seeded shuffle + shard placement → packed
    2048-token bins — written as shard data and published behind a
    CommitIO release-manifest pointer; the returned rows are read BACK
    through that pointer (one GET + direct data reads), so the driver
    hash covers build, publish, and the consumer read path in one row.
    Every stage is a pure function of corpus + seed: the whole release
    replays as one oracle SQL statement."""
    from duckdb_streaming_patterns_spark.streaming import staging

    docs = _t(spark, sf_dir, "documents")
    release_dir = staging.new_run_dir("crelease")
    corpus_release_build(spark, docs, release_dir, version=0)
    return corpus_release_read(spark, release_dir)


_QP["corpus_release_manifest"] = (
    _QP["corpus_release_manifest"][0],
    _RELEASE_ORACLE.format(quality_sql=_QP["text_quality_scores"][1]),
)


_RELEASE_VERIFY_ORACLE_TMPL = """
    WITH rel AS ({release_sql}),
    bins AS (SELECT shard, bin_id,
                    CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(sum(n_clean_tokens) AS BIGINT) AS n_tok,
                    md5(string_agg(clean_md5, '' ORDER BY shard_pos))
                      AS bin_md5
             FROM rel GROUP BY shard, bin_id)
    SELECT shard,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(max(bin_id) + 1 AS BIGINT) AS n_bins,
           CAST(sum(n_tok) AS BIGINT) AS n_clean_tokens,
           md5(string_agg(bin_md5, '' ORDER BY bin_id)) AS fingerprint,
           TRUE AS ok
    FROM bins GROUP BY shard
"""


@register("corpus_release_verify", None)  # oracle assembled below
def q_corpus_release_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consumer-side Merkle verification of a published release (round
    16): build + publish version 0, then recompute every shard's
    bin-wise fingerprint bottom-up from the stored bytes and compare
    against the manifest's attestation — the pre-epoch integrity check
    a training run performs. The oracle recomputes the same Merkle
    chain in SQL from the release definition, so the driver hash pins
    recomputation AND agreement (every ok=true). Tamper detection is
    pinned locally by test_release_verify_detects_tampered_bin.
    See :func:`corpus_release_verify`."""
    from duckdb_streaming_patterns_spark.streaming import staging

    docs = _t(spark, sf_dir, "documents")
    release_dir = staging.new_run_dir("crelver")
    corpus_release_build(spark, docs, release_dir, version=0)
    return corpus_release_verify(spark, release_dir)


_QP["corpus_release_verify"] = (
    _QP["corpus_release_verify"][0],
    _RELEASE_VERIFY_ORACLE_TMPL.format(
        release_sql=_QP["corpus_release_manifest"][1]
    ),
)


_EPOCH_WORKERS = 4

_EPOCH_PLAN_ORACLE_TMPL = """
    WITH rel AS ({release_sql}),
    units AS (SELECT shard, bin_id,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_clean_tokens) AS BIGINT) AS n_tokens
              FROM rel GROUP BY shard, bin_id),
    shards AS (SELECT shard, sum(n_tokens) AS stok
               FROM units GROUP BY shard),
    ranked AS (SELECT shard,
                      row_number() OVER (ORDER BY stok DESC, shard) - 1
                        AS r
               FROM shards),
    asg AS (SELECT shard,
                   CAST(CASE WHEN (r // {w}) % 2 = 0 THEN r % {w}
                             ELSE {w} - 1 - (r % {w}) END AS BIGINT)
                     AS worker
            FROM ranked)
    SELECT asg.worker,
           CAST(row_number() OVER (PARTITION BY asg.worker
                                   ORDER BY units.shard, units.bin_id)
                AS BIGINT) AS seq,
           units.shard, units.bin_id, units.n_docs, units.n_tokens
    FROM units JOIN asg ON asg.shard = units.shard
"""


@register("release_epoch_plan", None)  # oracle assembled below
def q_release_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The epoch read plan the training data-loader consumes (round
    15): publish one release, then emit each of 4 workers' ordered
    (shard, bin) unit list with doc/token counts — shard-whole worker
    ownership, (worker, seq) resumption watermark, unit identity pinned
    by the manifest's Merkle bin hashes.
    See :func:`release_epoch_plan`."""
    from duckdb_streaming_patterns_spark.streaming import staging

    docs = _t(spark, sf_dir, "documents")
    release_dir = staging.new_run_dir("crelepoch")
    corpus_release_build(spark, docs, release_dir, version=0)
    return release_epoch_plan(spark, release_dir, n_workers=_EPOCH_WORKERS)


_QP["release_epoch_plan"] = (
    _QP["release_epoch_plan"][0],
    _EPOCH_PLAN_ORACLE_TMPL.format(
        release_sql=_QP["corpus_release_manifest"][1], w=_EPOCH_WORKERS
    ),
)
