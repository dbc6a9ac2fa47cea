"""Text-analysis operators (SURVEY §2.11): language ID, quality scoring,
token counting, fingerprinting. Pure expression compositions — codegen'd,
no UDFs — so they run at full scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.text import tokens

# Stopword sets for the n-gram/stopword-hit language heuristic. Deliberately
# tiny: the operator's shape (per-language token-set hit counts → argmax) is
# what matters; swap in real lists for production.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "auf", "ein", "zu"),
    "es": ("el", "la", "los", "de", "y", "es", "en", "un", "una", "con"),
    "fr": ("le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"),
}

PUNCT_RE = "[^a-zA-Z0-9 ]"


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy: number of matches
    of letter-runs/digit-runs/punctuation singletons."""
    t = F.col(text_col)
    n_ws = F.size(tokens(t))
    # regexp_count of word-ish units approximates a subword tokenizer's
    # pre-tokenization pass.
    n_bpe = F.regexp_count(t, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))
    return df.select(
        F.col(id_col),
        n_ws.cast("bigint").alias("n_tokens"),
        n_bpe.cast("bigint").alias("n_subword_units"),
    )


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(lit_arr, x)))


def quality_scores(
    df: DataFrame, id_col: str, text_col: str, keep: list[str] | None = None
) -> DataFrame:
    """Heuristic quality signals: length, mean token length, punctuation
    ratio, stopword ratio, uppercase ratio — the standard cheap filters a
    pretraining pipeline applies before anything model-based.

    ``keep`` (r17) carries the named input columns through the projection
    unchanged — the single-pass hook for callers that compute sibling
    per-row signals over the same text scan (the streaming funnel's fused
    quality+bloom frame) instead of re-scanning and joining."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct_chars = n_chars - F.length(F.regexp_replace(t, PUNCT_RE, ""))
    upper_chars = F.length(t) - F.length(F.regexp_replace(t, "[A-Z]", ""))
    sw_hits = _stopword_hits(F.transform(toks, F.lower), STOPWORDS["en"])
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round((n_chars - (n_tok - 1)) / n_tok, 4).alias("mean_token_len"),
        F.round(punct_chars / n_chars, 4).alias("punct_ratio"),
        F.round(upper_chars / n_chars, 4).alias("upper_ratio"),
        F.round(sw_hits / n_tok, 4).alias("stopword_ratio"),
        *[F.col(c) for c in (keep or [])],
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family):
    duplicate-token fraction, duplicate-line fraction, and the fraction of
    bigram occurrences taken by the single most frequent bigram — the cheap
    detectors for boilerplate/spam/keyword-stuffed documents.

    Shape: the per-doc ratios are pure expressions; the top-bigram count is
    explode → (doc, bigram) groupBy → per-doc max/sum — partial aggregation
    collapses each doc's bigrams map-side, so the shuffle carries one row
    per distinct (doc, bigram), never the text. Bigrams come from the same
    zip_with-of-shifted-slices construction as shingles() (the element_at
    form re-evaluates the regex split per element — see functions/text.py).
    """
    t = F.col(text_col)
    toks = tokens(t)
    lines = F.split(t, "\n", -1)
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bigrams = F.filter(
        F.zip_with(toks, shifted, lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )
    scalars = df.select(
        F.col(id_col),
        F.round(F.lit(1) - F.size(F.array_distinct(toks)) / F.size(toks), 4).alias(
            "dup_token_ratio"
        ),
        F.round(F.lit(1) - F.size(F.array_distinct(lines)) / F.size(lines), 4).alias(
            "dup_line_ratio"
        ),
    )
    per_bigram = (
        df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .count()
    )
    top = per_bigram.groupBy(id_col).agg(
        F.max("count").alias("top_cnt"), F.sum("count").alias("n_bigrams")
    )
    return scalars.join(top, id_col, "left").select(
        F.col(id_col),
        "dup_token_ratio",
        "dup_line_ratio",
        F.round(
            F.coalesce(F.col("top_cnt") / F.col("n_bigrams"), F.lit(0.0)), 4
        ).alias("top_bigram_ratio"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-hit language ID: per-language hit counts over the token set,
    argmax with deterministic tie order (en > de > es > fr > unknown)."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    hits = {lang: _stopword_hits(toks, words) for lang, words in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    pred = F.lit("unknown")
    # build CASE from lowest to highest priority so earlier langs win ties
    for lang in reversed(list(STOPWORDS)):
        pred = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    out = [F.col(id_col), pred.alias("pred_lang")]
    out += [hits[lang].cast("bigint").alias(f"hits_{lang}") for lang in STOPWORDS]
    return df.select(*out)


# PII detector patterns. Alternation-free and backreference-free on purpose:
# Java's backtracking engine (Spark) and RE2 (DuckDB) agree on
# leftmost-greedy matches for character-class + quantifier patterns, so the
# match COUNTS are engine-portable; alternation would diverge (Java takes
# the first branch, RE2 the longest match).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "ssn": r"\d{3}-\d{2}-\d{4}",
    "phone": r"\+?\d[\d().\- ]{7,14}\d",
}


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII signal counts (email / IPv4 / SSN-shaped / phone-
    shaped) plus an any-hit flag — the redaction-or-drop gate a training
    pipeline runs before text leaves the ingest boundary. Pure regexp_count
    expressions: codegen'd, one scan, no shuffle at all (the operator is
    embarrassingly parallel over documents)."""
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)).cast("bigint")
        for name, pat in PII_PATTERNS.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        (total > 0).alias("has_pii"),
    )


#: Redaction order is part of the contract: email first (its local part
#: may contain digits a later pattern would eat), then IPv4, then SSN,
#: then the greedy phone shape — and the placeholder tokens are
#: digit-free, so no later pattern can match inside an earlier
#: replacement. Both engines replace leftmost-greedy non-overlapping,
#: so a fixed order makes the rewrite engine-identical.
PII_REDACT_ORDER = ["email", "ipv4", "ssn", "phone"]
PII_PLACEHOLDERS = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
}


def pii_redact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The REWRITE half of the PII gate (``pii_scan`` is the detector):
    every email / IPv4 / SSN-shaped / phone-shaped span replaced with a
    digit-free placeholder token, emitted as ``clean_text`` with a
    ``redacted`` flag. Chained ``regexp_replace`` projection — codegen'd,
    one scan, no shuffle; at 100 TB this is the map-only pass that runs
    right before text leaves the ingest boundary."""
    clean = F.col(text_col)
    for name in PII_REDACT_ORDER:
        clean = F.regexp_replace(
            clean, PII_PATTERNS[name], PII_PLACEHOLDERS[name]
        )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        (clean != F.col(text_col)).alias("redacted"),
    )


#: SQL fragment (identical Spark SQL / DuckDB dialect) building one
#: deterministic PII marker per document from its id: 4 of every 5 docs
#: get an email / IPv4 / SSN-shaped / phone-shaped span spliced into the
#: text at a doc_id-derived offset; the 5th is the unredacted control.
#: Pure id arithmetic — no randomness — so the injected corpus is a
#: FUNCTION of the fixture and the oracle rebuilds it bit-for-bit.
_PII_MARKER_SQL = (
    "CASE CAST({id} % 5 AS INT) "
    " WHEN 0 THEN 'user' || CAST({id} AS STRING) || '@example.com' "
    " WHEN 1 THEN CAST({id} % 256 AS STRING) || '.0.10.' "
    "      || CAST(({id} * 7) % 256 AS STRING) "
    " WHEN 2 THEN '123-45-' || lpad(CAST({id} % 10000 AS STRING), 4, '0') "
    " WHEN 3 THEN '555-867-' || lpad(CAST({id} % 10000 AS STRING), 4, '0') "
    " ELSE '' END"
)

#: injected text: marker spliced (space-delimited) at offset
#: doc_id % (length+1) — mid-text, not appended, so the rewrite is
#: proven to preserve BOTH surrounding halves byte-for-byte.
_PII_INJECT_SQL = (
    "CASE WHEN {marker} = '' THEN {text} ELSE "
    "substring({text}, 1, CAST({id} % (length({text}) + 1) AS INT)) "
    "|| ' ' || {marker} || ' ' || "
    "substring({text}, CAST({id} % (length({text}) + 1) AS INT) + 1) END"
)


def pii_inject_sql(id_col: str, text_col: str) -> str:
    """The full injected-text expression for either engine (Spark SQL and
    DuckDB agree on substring/length/lpad/||/% here — CASTs pin the
    integer arithmetic)."""
    marker = _PII_MARKER_SQL.format(id=id_col)
    return _PII_INJECT_SQL.format(marker=marker, text=text_col, id=id_col)


def pii_redact_positive(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """``pii_redact`` driven over a deterministically PII-INJECTED copy of
    the corpus, so the output hash covers ACTUAL rewrites (placeholder
    choice, leftmost-greedy span boundaries, ordering among patterns) on
    a pinned 4/5 of rows — not just no-op parity on a digit-free fixture
    (round-12 verdict finding #3). Still a map-only projection: the
    injection is id arithmetic fused into the same scan."""
    injected = df.select(
        F.col(id_col),
        F.expr(pii_inject_sql(id_col, text_col)).alias(text_col),
    )
    return pii_redact(injected, id_col, text_col)


def tfidf_top_terms(
    df: DataFrame,
    group_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per group by TF-IDF: tf = term
    occurrences within the group, idf = ln(n_docs / doc_frequency).
    Deterministic total order (score DESC, term ASC) so top-k is unique.

    Scale shape: one explode pass feeds BOTH aggregations — (group, term)
    counts and per-term document frequency — each a partial-agg shuffle of
    narrow (term, count) rows bounded by vocabulary size, never text. The
    df side joins back on term (vocabulary-sized, so a plain equi-join —
    do NOT broadcast a 100 TB corpus's vocabulary), and top-k per group is
    a window over (group), state = k rows per group."""
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    n_docs = df.count()  # scalar-only driver action, like scalar_max_ts
    exploded = df.select(F.col(group_col).alias("grp"), toks.alias("toks"))
    tf = (
        exploded.select("grp", F.explode("toks").alias("term"))
        .groupBy("grp", "term")
        .agg(F.count("*").alias("tf"))
    )
    # each input row is one document, so exploding its DISTINCT terms
    # yields exactly one row per (doc, term) — df = a plain count
    docfreq = (
        exploded.select(F.explode(F.array_distinct("toks")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    from pyspark.sql import Window as W

    scored = tf.join(docfreq, "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4)
    )
    w = W.partitionBy("grp").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("grp").alias(group_col),
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("doc_freq"),
            "tfidf",
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Model-based quality score: mean per-token surprisal (negative ln
    probability) under a per-language unigram LM trained on the corpus
    itself — the shape of CCNet/KenLM perplexity filtering with the
    n-gram order dropped to 1 so the "model" is a pure aggregation.
    High surprisal = rare-token-heavy (gibberish, OCR noise); low =
    boilerplate. Output: (id, lang, n_tokens, surprisal_nats).

    Scale shape (100 TB): ONE explode pass over the corpus produces the
    per-doc term counts; the LM "training" aggregation (per-(lang, token)
    counts) and per-language totals both derive from THAT aggregate —
    sum of per-doc counts — so the text is scanned and tokenized exactly
    once (three independent aggregations off the raw explode would plan
    three corpus scans). Scoring joins doc-distinct terms to the
    vocabulary on (lang, token) — a plain equi-join against a
    vocabulary-sized side (do NOT broadcast a 100 TB corpus's
    vocabulary); per-language totals ARE broadcast (rows = #languages).
    No text ever shuffles after the explode.

    Exactness: the per-token ln(c/T) is rounded to 6 dp and cast to
    DECIMAL before the per-doc sum, so the aggregation is exact integer
    arithmetic — partial-sum order (Spark) vs sequential order (DuckDB)
    cannot change the result, the same trick the TPC-H Q11 threshold uses.
    """
    toks = F.transform(tokens(F.col(text_col)), F.lower)
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("__lang"),
        F.explode(toks).alias("tok"),
    )
    doc_terms = exploded.groupBy("__id", "__lang", "tok").agg(
        F.count("*").alias("cnt")
    )
    vocab = doc_terms.groupBy("__lang", "tok").agg(
        F.sum("cnt").alias("c")
    )
    totals = vocab.groupBy("__lang").agg(F.sum("c").alias("t_all"))
    lp = F.round(F.log(F.col("c") / F.col("t_all")), 6).cast("decimal(20,6)")
    scored = (
        doc_terms.join(vocab, ["__lang", "tok"])
        .join(F.broadcast(totals), "__lang")
        .withColumn("lp", lp)
    )
    return (
        scored.groupBy("__id", "__lang")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("lp")).alias("slp"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__lang").alias(lang_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                -(F.col("slp").cast("double")) / F.col("n_tokens"), 4
            ).alias("surprisal_nats"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """The rewrite pass the Lee et al. 2022 pipeline actually ships:
    excise duplicated word n-gram spans from every document, keeping the
    FIRST occurrence corpus-wide. ``duplicated_spans`` flags the
    duplication; this operator emits the cleaned corpus.

    Policy (deterministic, oracle-replayable): occurrences of each gram
    are ranked by (doc_id, position); every occurrence with rank ≥ 2 is a
    duplicate, and a token is removed iff at least one duplicate gram
    window covers it. The rank-1 occurrence's tokens survive unless
    covered by some OTHER gram's duplicate window — i.e. within a long
    copied span the earliest copy survives intact and later copies are
    excised wholesale. Output: (id, n_tokens, n_removed, clean_text) for
    EVERY input doc (docs under n tokens pass through whole); clean_text
    is the surviving tokens joined by single spaces (whitespace
    normalized, same as fingerprint()).

    Scale shape (100 TB): gram windows are built JVM-side and explode to
    (doc_id, pos, xxhash64) rows — the hash stands in for gram EQUALITY
    only (the portable-hash trade duplicated_spans documents), so the
    8-byte key is free to be Spark-specific while the oracle ranks raw
    gram strings. The occurrence ranking is one window over the gram key
    (narrow rows); removed positions fold back to ONE array row per
    affected doc (groupBy doc_id, collect_set) and equi-join the corpus
    scan; the rewrite itself is a per-row filter-by-index expression —
    document text never shuffles anywhere.
    """
    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(F.array_join(F.slice(toks, i, n), " ")).alias("gram"),
        ),
    )
    g = (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("__id"), F.explode(grams).alias("g"))
        .select("__id", "g.pos", "g.gram")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("gram").orderBy("__id", "pos")
    dup = (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") >= 2)
        .select("__id", F.explode(F.sequence("pos", F.col("pos") + (n - 1))).alias("p"))
    )
    rem = dup.groupBy("__id").agg(F.collect_set("p").alias("__rem"))
    keep = lambda x, i: ~F.coalesce(  # noqa: E731
        F.array_contains(F.col("__rem"), i + F.lit(1)), F.lit(False)
    )
    return (
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
        .join(rem, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.coalesce(F.size("__rem"), F.lit(0)).cast("bigint").alias("n_removed"),
            F.array_join(F.filter(toks, keep), " ").alias("clean_text"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Substring-level duplication profile (the signal behind exact
    substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better"): slide a word n-gram window over each
    document, hash every window, and report per document how many of its
    windows also occur elsewhere in the corpus (or again in the same
    doc). Output: (id, n_grams, n_dup_grams, dup_fraction) for every doc
    with >= n tokens — the per-doc evidence a span-removal pass acts on.

    Scale shape (100 TB): windows are built JVM-side (transform over a
    token-index sequence — no Python, no self-join) and explode to
    (doc_id, gram_hash) rows; the global occurrence count is a
    partial-agg shuffle on the 8-byte xxhash64 key, then one equi-join
    back on that key, then a per-doc partial agg. Nothing wider than
    (id, hash, count) ever shuffles — the suffix-array approach this
    approximates cannot be expressed as a join, while this form is three
    narrow exchanges. The hash only stands in for gram EQUALITY (its
    value never reaches the output), so the engine is free to use
    xxhash64 (measured 2.3× over md5 at sf0.1, and 4× narrower shuffle
    keys) while the oracle groups on the raw gram string — results agree
    unless xxhash64 collides (~1e-7 at 25M grams, 0 in fixtures).

    The count agg and the join-back each scan the corpus once (their
    exchange subtrees differ, so ReusedExchange can't fire). Measured
    locally that beats both single-scan forms — window-count (sort cost)
    and per-(gram, doc) pre-agg (extra shuffle) — because the gram table
    outweighs the corpus re-scan. If the corpus read ever dominates
    (very wide rows, remote storage), switch to the pre-agg form:
    dg = g.groupBy(gram, id).count, totals from dg, join dg↔totals —
    exchange-reuse then reads the text exactly once.
    """
    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " ")),
    )
    g = (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("__id"), F.explode(grams).alias("gram"))
    )
    counts = g.groupBy("gram").agg(F.count("*").alias("gc"))
    dup = (F.col("gc") >= 2).cast("long")
    return (
        g.join(counts, "gram")
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(dup).alias("n_dup_grams"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_dup_grams").cast("bigint").alias("n_dup_grams"),
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 4).alias(
                "dup_fraction"
            ),
        )
    )


# Fixed logistic-classifier weights over the quality_scores features —
# the fastText-style model-based quality gate, with the model reduced to
# literal weights so scoring is a pure column expression (the production
# shape: weights broadcast, scoring scan-side, no Python). keep is decided
# on the LOGIT's sign (threshold 0.5 on the sigmoid) so the decision needs
# no transcendental function — bit-portable across engines. Lives here (a
# leaf module) so the batch classifier query, the streaming ingest funnel,
# and their oracles can all import it without touching the query registry.
QC_WEIGHTS = {
    "bias": -1.2,
    "n_chars": 0.004,       # longer docs score higher (per char)
    "stopword_ratio": 12.0,  # natural-language signal
    "punct_ratio": -2.0,     # symbol soup penalized
    "upper_ratio": -1.5,     # shouting penalized
}

QC_LOGIT_SQL = (
    f"({QC_WEIGHTS['bias']} + {QC_WEIGHTS['n_chars']} * n_chars"
    f" + {QC_WEIGHTS['stopword_ratio']} * stopword_ratio"
    f" + {QC_WEIGHTS['punct_ratio']} * punct_ratio"
    f" + {QC_WEIGHTS['upper_ratio']} * upper_ratio)"
)


def qc_logit(qs: DataFrame) -> Column:
    """The logistic gate's logit as a Column over the quality_scores
    projection — shared by the batch classifier query and the streaming
    ingest funnel so both score identically."""
    return (
        F.lit(QC_WEIGHTS["bias"])
        + F.lit(QC_WEIGHTS["n_chars"]) * F.col("n_chars")
        + F.lit(QC_WEIGHTS["stopword_ratio"]) * F.col("stopword_ratio")
        + F.lit(QC_WEIGHTS["punct_ratio"]) * F.col("punct_ratio")
        + F.lit(QC_WEIGHTS["upper_ratio"]) * F.col("upper_ratio")
    )
