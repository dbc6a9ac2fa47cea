"""Focused tests for the r17 fusion optimizations' operator internals.

Round 17 fused the funnel's quality gate and contamination-bloom probe
into one text pass (`bloom_hit_count` column form + `quality_scores`'s
``keep=`` passthrough) and rebuilt `_funnel_keep_clean` around them.
The oracle sweep pins the end results; these tests pin the INTERNAL
contracts the fusion relies on, so a future edit that breaks one fails
here with a named invariant instead of as an opaque hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.text import shingles
from duckdb_streaming_patterns_spark.operators import dedup
from duckdb_streaming_patterns_spark.operators import textstats


def _docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three"),  # < 8 tokens: no 8-gram, gram-less
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa xi"),
        (4, "totally different words nine ten eleven twelve thirteen "
            "fourteen fifteen sixteen"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_hit_count_matches_wrapper_and_gramless_is_zero(spark):
    """The column form extracted in r17 must agree with the
    `bloom_flag_docs` wrapper it was extracted from, and a gram-less doc
    must count 0 hits — that is what lets the fused filter drop the old
    ``size(s) >= 1`` pre-filter without changing the keep set."""
    docs = _docs(spark)
    sh = docs.select("doc_id", shingles(F.col("text"), k=8).alias("s"))
    bench = (
        sh.filter(F.col("doc_id") == 1)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    bitset = dedup.bloom_build(bench, "g")
    wrapper = {
        r["doc_id"]: (r["n_flagged"], r["bloom_flagged"])
        for r in dedup.bloom_flag_docs(sh, bitset).collect()
    }
    col_form = {
        r["doc_id"]: r["n"]
        for r in sh.select(
            "doc_id", dedup.bloom_hit_count(F.col("s"), bitset).alias("n")
        ).collect()
    }
    for d, (n_flagged, flagged) in wrapper.items():
        assert col_form[d] == n_flagged
        assert flagged == (n_flagged > 0)
    # the benchmark doc's own grams all hit; the gram-less doc hits 0
    assert col_form[1] > 0
    assert col_form[2] == 0


def test_quality_scores_keep_passthrough_is_inert(spark):
    """``keep=`` must carry the named columns through UNCHANGED and must
    not perturb any quality signal — the fused funnel projection rides
    on both properties."""
    docs = _docs(spark).withColumn("extra", F.col("doc_id") * 10)
    base = textstats.quality_scores(docs, "doc_id", "text").collect()
    kept = {
        r["doc_id"]: r
        for r in textstats.quality_scores(
            docs, "doc_id", "text", keep=["extra"]
        ).collect()
    }
    assert base, "quality_scores returned no rows"
    for r in base:
        k = kept[r["doc_id"]]
        for c in r.asDict():
            assert k[c] == r[c], f"signal {c} changed under keep="
        assert k["extra"] == r["doc_id"] * 10


def test_funnel_fused_gate_matches_unfused_reference(spark, sf_oracle):
    """The r17 single-scan gate (quality AND bloom in one projection +
    one semi-join) must produce the exact keep set of the r16 form (two
    corpus-scanning subtrees attached by a semi-join + an anti-join
    behind a ``size(s) >= 1`` pre-filter)."""
    from pyspark.sql import Window as W

    # the full registry must load first (queries_pipeline's module body
    # reads sibling modules' registered SQL at import time)
    import duckdb_streaming_patterns_spark.queries  # noqa: F401
    from duckdb_streaming_patterns_spark.queries_pipeline import (
        _funnel_keep_clean,
    )
    from duckdb_streaming_patterns_spark.registry import _t

    docs = _t(spark, sf_oracle, "documents")
    kept, _ = _funnel_keep_clean(spark, docs)
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}

    # the unfused r16 reference, reconstructed verbatim
    wdup = W.partitionBy(F.md5("text"))
    dedup_keep = docs.withColumn(
        "__canon", F.min("doc_id").over(wdup)
    ).filter(F.col("doc_id") == F.col("__canon"))
    qs = textstats.quality_scores(docs, "doc_id", "text")
    q_keep = qs.filter(textstats.qc_logit(qs) >= 0).select("doc_id")
    sh8 = docs.select(
        "doc_id", shingles(F.col("text"), k=8).alias("s")
    ).filter(F.size("s") >= 1)
    bench_g = (
        sh8.filter(F.col("doc_id") < 50)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    bitset = dedup.bloom_build(bench_g, "g")
    flagged = (
        dedup.bloom_flag_docs(sh8, bitset)
        .filter(F.col("bloom_flagged"))
        .select("doc_id")
    )
    ref = (
        dedup_keep.join(q_keep, "doc_id", "semi")
        .join(flagged, "doc_id", "left_anti")
        .select("doc_id")
    )
    want = {r["doc_id"] for r in ref.collect()}
    assert got == want
