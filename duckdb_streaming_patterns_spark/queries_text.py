"""Text-analysis + dedup query registrations (SURVEY §2.11) over the
`documents` fixture, each with a DuckDB oracle where SQL-expressible.

The oracle SQL mirrors the Spark expressions operation-for-operation
(same tokenization regex, same fold order, same rounding), so value hashes
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.text import DUCKDB_SHINGLE_SET_CTE
from duckdb_streaming_patterns_spark.queries import register, _t
from duckdb_streaming_patterns_spark.operators import dedup, textstats

_SW = textstats.STOPWORDS


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in _SW[lang]) + "]"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_count",
    r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT)
             AS n_subword_units
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_count(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_quality_scores",
    r"""
    WITH base AS (
      SELECT doc_id,
             text,
             length(text) AS n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tok,
             list_transform(string_split_regex(trim(text), '\s+'),
                            t -> lower(t)) AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_tok AS BIGINT)   AS n_tokens,
           ROUND((n_chars - (n_tok - 1)) / n_tok, 4) AS mean_token_len,
           ROUND((n_chars - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / n_chars, 4) AS punct_ratio,
           ROUND((n_chars - length(regexp_replace(text, '[A-Z]', '', 'g')))
                 / n_chars, 4) AS upper_ratio,
           ROUND(len(list_filter(toks, t -> list_contains({sw_en}, t)))
                 / n_tok, 4) AS stopword_ratio
    FROM base
    """.replace("{sw_en}", _sw_list("en")),
)
def q_text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_scores(_t(spark, sf_dir, "documents"), "doc_id", "text")


_LANG_ID_ORACLE = (
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\s+'),
                            t -> lower(t)) AS t
      FROM documents
    ), hits AS (
      SELECT doc_id,
             len(list_filter(t, x -> list_contains({sw_en}, x))) AS hits_en,
             len(list_filter(t, x -> list_contains({sw_de}, x))) AS hits_de,
             len(list_filter(t, x -> list_contains({sw_es}, x))) AS hits_es,
             len(list_filter(t, x -> list_contains({sw_fr}, x))) AS hits_fr
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN hits_en > 0 AND hits_en = g THEN 'en'
                WHEN hits_de > 0 AND hits_de = g THEN 'de'
                WHEN hits_es > 0 AND hits_es = g THEN 'es'
                WHEN hits_fr > 0 AND hits_fr = g THEN 'fr'
                ELSE 'unknown' END AS pred_lang,
           CAST(hits_en AS BIGINT) AS hits_en,
           CAST(hits_de AS BIGINT) AS hits_de,
           CAST(hits_es AS BIGINT) AS hits_es,
           CAST(hits_fr AS BIGINT) AS hits_fr
    FROM (SELECT *, greatest(hits_en, hits_de, hits_es, hits_fr) AS g FROM hits)
    """.replace("{sw_en}", _sw_list("en"))
    .replace("{sw_de}", _sw_list("de"))
    .replace("{sw_es}", _sw_list("es"))
    .replace("{sw_fr}", _sw_list("fr"))
)


@register("text_language_id", _LANG_ID_ORACLE)
def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.language_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    "SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "dedup_exact_hash",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_by_hash(_t(spark, sf_dir, "documents"), "text", "doc_id")


_JACCARD_FRAG = (
    "len(list_intersect(a.s, b.s))"
    " / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))"
)

_TOKEN_JACCARD_ORACLE = rf"""
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(string_split_regex(trim(text), '\s+')) AS s
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND({_JACCARD_FRAG}, 6) AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id AND a.lang = b.lang
    WHERE {_JACCARD_FRAG} >= 0.95
"""


@register("dedup_token_jaccard", _TOKEN_JACCARD_ORACLE)
def q_dedup_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard pairs, blocked on language."""
    docs = _t(spark, sf_dir, "documents")
    from duckdb_streaming_patterns_spark.functions.text import distinct_tokens

    with_sets = docs.withColumn("token_set", distinct_tokens(F.col("text")))
    return dedup.jaccard_pairs(
        with_sets, "doc_id", "token_set", threshold=0.95, block_cols=("lang",)
    )


_SHINGLE_JACCARD_ORACLE = rf"""
    WITH {DUCKDB_SHINGLE_SET_CTE}
    SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, {_JACCARD_FRAG} AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ) WHERE jac >= 0.7
"""


@register("dedup_minhash_lsh", _SHINGLE_JACCARD_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs at Jaccard ≥ 0.7 over 3-token shingles.

    The oracle is the *exact* all-pairs shingle-Jaccard result: with 64
    bands × 2 rows the LSH candidate recall at s ≥ 0.7 is 1-(1-0.49)^64 ≈
    1-1e-19, so the verified LSH output equals the exact result."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.7
    )


# SimHash oracle: same md5-derived 60-bit token hash (DUCKDB_HEX15 ==
# portable_token_hash), same per-bit majority votes, then an UNBLOCKED
# self-join — valid because the engine's 15-bit quarter blocking is
# lossless for Hamming ≤ 3 (pigeonhole; see simhash_pairs docstring).
_SIMHASH_VOTES = ",\n             ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(dedup.SIMHASH_BITS)
)
_SIMHASH_FP = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)"
    for b in range(dedup.SIMHASH_BITS)
)
_SIMHASH_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
      FROM documents
    ),
    hashes AS (
      SELECT doc_id, {dedup.DUCKDB_HEX15.format(m="m")} AS h
      FROM (SELECT doc_id, md5(tok) AS m FROM toks)
    ),
    votes AS (
      SELECT doc_id,
             {_SIMHASH_VOTES}
      FROM hashes GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, CAST({_SIMHASH_FP} AS BIGINT) AS f FROM votes)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= 3
"""


@register("dedup_simhash", _SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3 of 60 bits). The fingerprint is
    built on the portable md5-derived token hash, so the oracle replays the
    exact vote arithmetic in SQL; the engine's quarter blocking is lossless
    at this Hamming radius, so the blocked and unblocked pair sets are
    identical. Property tests (identical text → identical fingerprint,
    near-dup pairs ⊇ exact dups) in tests/test_dedup.py."""
    return dedup.simhash_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


_CLUSTER_EDGES_FRAG = rf"""
    {DUCKDB_SHINGLE_SET_CTE},
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE {_JACCARD_FRAG} >= 0.7
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    walk(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id
    ),
    clusters AS (
      SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id
    )
"""

_CLUSTER_ORACLE = f"""
    WITH RECURSIVE {_CLUSTER_EDGES_FRAG}
    SELECT doc_id, cluster_id FROM clusters
"""


@register("dedup_minhash_clusters", _CLUSTER_ORACLE)
def q_dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: MinHash+LSH pairs (Jaccard ≥ 0.7) fed through
    connected components; every doc labeled with the min doc_id of its
    component (singletons label themselves). The oracle re-derives the
    exact pair set in SQL and clusters it with a recursive CTE — so both
    the pair generation AND the iterative propagation are verified."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.7)
    labels = dedup.connected_components(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), id_col="doc_id"
    )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("cluster").alias("cluster_id")
    )


_CANONICAL_ORACLE = f"""
    WITH RECURSIVE {_CLUSTER_EDGES_FRAG}
    SELECT cluster_id,
           doc_id AS canonical_doc_id,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM (
      SELECT c.cluster_id, c.doc_id, length(d.text) AS n_chars,
             count(*) OVER (PARTITION BY c.cluster_id) AS n_docs,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY length(d.text) DESC, c.doc_id) AS rn
      FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    ) WHERE rn = 1
"""


@register("dedup_canonical_docs", _CANONICAL_ORACLE)
def q_dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEEP decision a dedup pipeline actually ships: one canonical doc
    per near-dup cluster — longest text wins, doc_id breaks ties — plus the
    cluster's member count. Composition of dedup_minhash_clusters with a
    per-cluster top-1 window."""
    from pyspark.sql import Window as W

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.7)
    labels = dedup.connected_components(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), id_col="doc_id"
    )
    member = labels.select(
        F.col("id").alias("doc_id"), F.col("cluster").alias("cluster_id")
    ).join(
        docs.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    )
    w = W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wc = W.partitionBy("cluster_id")
    return (
        member.withColumn("n_docs", F.count("*").over(wc))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
    )


_REPETITION_ORACLE = r"""
    WITH base AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS t,
             string_split(text, chr(10)) AS lines
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
      FROM base
    ), cnt AS (
      SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
    ), top AS (
      SELECT doc_id, max(c) AS top_cnt, sum(c) AS n_bigrams
      FROM cnt GROUP BY doc_id
    )
    SELECT base.doc_id,
           ROUND(1 - len(list_distinct(t)) / len(t), 4) AS dup_token_ratio,
           ROUND(1 - len(list_distinct(lines)) / len(lines), 4) AS dup_line_ratio,
           ROUND(COALESCE(top.top_cnt / top.n_bigrams, 0), 4) AS top_bigram_ratio,
           CAST(COALESCE(top.n_bigrams, 0) AS BIGINT) AS n_bigrams
    FROM base LEFT JOIN top ON base.doc_id = top.doc_id
"""


@register("text_repetition_stats", _REPETITION_ORACLE)
def q_text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-token / duplicate-line
    fractions and top-bigram occupancy per document."""
    return textstats.repetition_stats(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )
