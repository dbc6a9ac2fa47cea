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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.text import distinct_tokens
from duckdb_streaming_patterns_spark.queries import register, _t


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
