"""Property-based tests (hypothesis): the Column-expression text functions
are differentially checked against plain-Python references on arbitrary
inputs, and the merge algebra's invariants are checked on random tables.

Spark jobs are expensive per example, so each property batches all of a
hypothesis example's rows into one job and runs few examples.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.functions.text import (
    normalized_text,
    shingles,
)
from duckdb_streaming_patterns_spark.operators.dedup import simhash
from duckdb_streaming_patterns_spark.operators.merge import additive_merge

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.text(alphabet="abcdef", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=9).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=25)


def _py_shingles(text: str, k: int = 3) -> set[str]:
    stripped = text.strip()
    toks = re.split(r"\s+", stripped)  # "" → [""], same as split(trim(x))
    if len(toks) < k:
        return set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


@settings(**_SETTINGS)
@given(_docs)
def test_shingles_match_python_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r["i"]: set(r["s"])
        for r in df.select("i", shingles(F.col("t")).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_shingles(t), (t, got[i])


@settings(**_SETTINGS)
@given(_docs)
def test_normalized_text_is_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        normalized_text(F.col("t")).alias("once"),
    ).select(
        "once", normalized_text(F.col("once")).alias("twice")
    ).collect()
    for r in rows:
        assert r["once"] == r["twice"]


@settings(**_SETTINGS)
@given(_docs, st.randoms(use_true_random=False))
def test_simhash_is_token_set_invariant(spark, texts, rnd):
    """SimHash votes over the distinct-token set: permuting the words of a
    document must not change its fingerprint."""
    shuffled = []
    for t in texts:
        toks = t.split(" ")
        rnd.shuffle(toks)
        shuffled.append(" ".join(toks))
    base = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    perm = spark.createDataFrame(
        [(i, t) for i, t in enumerate(shuffled)], "id long, t string"
    )
    h1 = {r["id"]: r["simhash"] for r in simhash(base, "id", "t").collect()}
    h2 = {r["id"]: r["simhash"] for r in simhash(perm, "id", "t").collect()}
    assert h1 == h2


_kv = st.dictionaries(
    st.integers(min_value=0, max_value=20),
    st.integers(min_value=0, max_value=1000),
    max_size=12,
)


@settings(**_SETTINGS)
@given(_kv, _kv)
def test_additive_merge_is_per_key_sum(spark, dest, src):
    ddl = "k long, n long"
    d = spark.createDataFrame(list(dest.items()), ddl)
    s = spark.createDataFrame(list(src.items()), ddl)
    merged = {
        r["k"]: r["n"]
        for r in additive_merge(d, s, keys=["k"], add_cols=["n"], max_cols=[]).collect()
    }
    want = {k: dest.get(k, 0) + src.get(k, 0) for k in set(dest) | set(src)}
    assert merged == want


_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    max_size=20,
)


@settings(**_SETTINGS)
@given(_edges)
def test_connected_components_matches_union_find(spark, raw_edges):
    """Spark min-label propagation == a plain Python union-find on random
    graphs (including multi-edges, both orientations, and isolated nodes)."""
    from duckdb_streaming_patterns_spark.operators.dedup import connected_components

    node_ids = sorted({0, 15, *(n for e in raw_edges for n in e)})
    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    want = {n: find(n) for n in node_ids}

    nodes = spark.createDataFrame([(n,) for n in node_ids], "id long")
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in raw_edges] or [(0, 0)],
        "id_a long, id_b long",
    )
    if not raw_edges:
        edges = edges.filter("id_a <> id_a")  # empty edge set
    got = {r["id"]: r["cluster"] for r in connected_components(nodes, edges).collect()}
    assert got == want


@settings(**_SETTINGS)
@given(_edges)
def test_connected_components_star_matches_union_find(spark, raw_edges):
    """The large-star/small-star contraction path must agree with
    union-find on the same arbitrary graphs as min-label propagation."""
    from duckdb_streaming_patterns_spark.operators.dedup import (
        connected_components_star,
    )

    node_ids = sorted({0, 15, *(n for e in raw_edges for n in e)})
    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in node_ids}

    nodes = spark.createDataFrame([(n,) for n in node_ids], "id long")
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in raw_edges] or [(0, 0)],
        "id_a long, id_b long",
    )
    if not raw_edges:
        edges = edges.filter("id_a <> id_a")
    got = {
        r["id"]: r["cluster"]
        for r in connected_components_star(nodes, edges).collect()
    }
    assert got == want


def test_connected_components_chain_exceeding_round_limit(spark):
    """A 150-node path graph has diameter 149 > the propagation round
    limit; connected_components must fall back to star contraction (no
    RuntimeError for legal inputs) and still label every node with the
    component minimum. Ids are permuted so the chain order is unrelated
    to the id order."""
    import random

    from duckdb_streaming_patterns_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    n = 150
    ids = list(range(1000, 1000 + n))
    random.Random(7).shuffle(ids)
    chain_edges = [
        (min(a, b), max(a, b)) for a, b in zip(ids, ids[1:])
    ]
    nodes = spark.createDataFrame([(i,) for i in ids], "id long")
    edges = spark.createDataFrame(chain_edges, "id_a long, id_b long")
    want = {i: 1000 for i in ids}  # one component, min id 1000
    got = {
        r["id"]: r["cluster"]
        for r in connected_components(nodes, edges, max_iters=10).collect()
    }
    assert got == want
    got_star = {
        r["id"]: r["cluster"]
        for r in connected_components_star(nodes, edges).collect()
    }
    assert got_star == want


@settings(**_SETTINGS)
@given(_docs)
def test_duplicated_spans_match_python_reference(spark, texts):
    """duplicated_spans (word n-grams, global occurrence >= 2) against a
    plain-Python reference on arbitrary corpora — covers within-doc
    repeats, cross-doc duplicates, and sub-n-token docs (excluded)."""
    import re as _re
    from collections import Counter

    from duckdb_streaming_patterns_spark.operators.textstats import (
        duplicated_spans,
    )

    n = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in duplicated_spans(df, "doc_id", "text", n=n).collect()
    }
    grams_by_doc = {}
    counts = Counter()
    for i, t in enumerate(texts):
        toks = _re.split(r"\s+", t.strip())
        if len(toks) < n:
            continue
        g = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        grams_by_doc[i] = g
        counts.update(g)
    assert set(got) == set(grams_by_doc)
    for i, g in grams_by_doc.items():
        expect = (len(g), sum(1 for x in g if counts[x] >= 2))
        assert got[i] == expect, (texts[i], got[i], expect)


@settings(**_SETTINGS)
@given(_docs)
def test_unigram_surprisal_matches_python_reference(spark, texts):
    """unigram_surprisal against a plain-Python reference computing the
    same decimal-exact pipeline (6-dp-rounded ln(c/T), count-weighted
    mean, 4-dp round) — proves the Spark aggregation order cannot leak
    into results on arbitrary corpora."""
    import math as _math
    import re as _re
    from collections import Counter
    from decimal import Decimal

    from duckdb_streaming_patterns_spark.operators.textstats import (
        unigram_surprisal,
    )

    df = spark.createDataFrame(
        [(i, t, "xx") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_nats"])
        for r in unigram_surprisal(df, "doc_id", "text", "lang").collect()
    }
    toks_by_doc = {
        i: [w.lower() for w in _re.split(r"\s+", t.strip())]
        for i, t in enumerate(texts)
    }
    vocab = Counter(w for toks in toks_by_doc.values() for w in toks)
    total = sum(vocab.values())
    for i, toks in toks_by_doc.items():
        slp = sum(
            Decimal(str(round(_math.log(vocab[w] / total), 6)))
            for w in toks
        )
        expect = round(-float(slp) / len(toks), 4)
        assert got[i][0] == len(toks)
        assert abs(got[i][1] - expect) < 1e-9, (texts[i], got[i], expect)


def _py_remove_spans(texts: list[str], n: int = 3):
    """Pure-Python reference for remove_duplicated_spans: rank each gram's
    occurrences by (doc, pos); tokens covered by any rank>=2 window are
    removed."""
    toks = [re.split(r"\s+", t.strip()) for t in texts]
    occs: dict[tuple, list] = {}
    for d, tk in enumerate(toks):
        if len(tk) < n:
            continue
        for i in range(len(tk) - n + 1):
            occs.setdefault(tuple(tk[i : i + n]), []).append((d, i))
    removed = [set() for _ in texts]
    for occ in occs.values():
        for d, i in sorted(occ)[1:]:
            removed[d].update(range(i, i + n))
    return [
        (
            len(tk),
            len(removed[d]),
            " ".join(w for p, w in enumerate(tk) if p not in removed[d]),
        )
        for d, tk in enumerate(toks)
    ]


# few distinct short words → dense gram collisions within and across docs
_spanword = st.sampled_from(["aa", "bb", "cc"])
_spandoc = st.lists(_spanword, min_size=0, max_size=10).map(" ".join)
_spandocs = st.lists(_spandoc, min_size=1, max_size=12)


@settings(**_SETTINGS)
@given(_spandocs)
def test_remove_duplicated_spans_matches_python_reference(spark, texts):
    from duckdb_streaming_patterns_spark.operators.textstats import (
        remove_duplicated_spans,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_duplicated_spans(df, "doc_id", "text", n=3).collect()
    }
    want = {d: v for d, v in enumerate(_py_remove_spans(texts, n=3))}
    assert got == want


# -- UpsertLog LWW x maintenance algebra (round 10) ------------------------
# The machinery that regressed in round 9: random emission schedules,
# cadences, and fanouts; the maintained log must resolve every key to
# its LAST emission, exactly as an unmaintained replay would.

_schedules = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=15), min_size=1, max_size=8
    ).map(lambda ks: sorted(set(ks))),
    min_size=2,
    max_size=6,
)


@settings(**_SETTINGS)
@given(_schedules, st.sampled_from([1, 2, 3]), st.sampled_from([2, 3]))
def test_upsert_log_lww_invariant_under_random_maintenance(
    spark, schedule, cadence, fanout
):
    """For ANY emission schedule and ANY maintenance cadence/fanout:
    read_latest() == {key: last batch that emitted it}; a terminal full
    compact() preserves it; and a mid-stream scoped read either equals
    the prefix reference or raises the documented span-straddle error —
    never a silently wrong prefix."""
    import shutil
    import tempfile

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    root = tempfile.mkdtemp(prefix="lww_prop_")
    try:
        log = UpsertLog(spark, root, keys=["key"])
        expected: dict[int, int] = {}
        for b, keys in enumerate(schedule):
            if b > 0 and b % cadence == 0:
                log.maintain(before_batch=b, fanout=fanout)
            log.append(
                spark.createDataFrame(
                    [(k, b) for k in keys], "key long, emitted_in long"
                ),
                b,
            )
            for k in keys:
                expected[k] = b
        got = {
            r["key"]: r["emitted_in"] for r in log.read_latest().collect()
        }
        assert got == expected

        mid = len(schedule) // 2
        prefix = {}
        for b, keys in enumerate(schedule[:mid]):
            for k in keys:
                prefix[k] = b
        try:
            got_mid = {
                r["key"]: r["emitted_in"]
                for r in log.read_latest(before_batch=mid).collect()
            }
            assert got_mid == prefix
        except RuntimeError as e:
            # documented contract (r8 item 3): a scope boundary inside a
            # merged span REFUSES rather than leaking post-boundary rows
            assert "straddle" in str(e)

        log.compact()
        got2 = {
            r["key"]: r["emitted_in"] for r in log.read_latest().collect()
        }
        assert got2 == expected
    finally:
        shutil.rmtree(root, ignore_errors=True)


# -- SnapshotTable time-travel x tombstone algebra (round 10) ---------------
# Randomized coverage of the CDF core: for ANY interleaving of appends
# and key-scoped deletes, read_as_of(s) equals a plain-Python replay of
# the history through s ("a tombstone kills matching rows from snapshots
# BEFORE it; a later re-insert of the same key survives").

_snap_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("ins"),
            st.lists(
                st.integers(min_value=0, max_value=15),
                min_size=1,
                max_size=6,
            ).map(lambda ks: sorted(set(ks))),
        ),
        st.tuples(st.just("del"), st.integers(min_value=0, max_value=15)),
    ),
    min_size=2,
    max_size=6,
).filter(lambda ops: ops[0][0] == "ins")  # a table starts with an insert


@settings(**_SETTINGS)
@given(_snap_ops)
def test_snapshot_time_travel_matches_replay_under_deletes(spark, ops):
    import shutil
    import tempfile

    from duckdb_streaming_patterns_spark.plans.snapshots import SnapshotTable

    root = tempfile.mkdtemp(prefix="snap_prop_")
    try:
        t = SnapshotTable(spark, root, "id long, v long")
        history: list[set] = []  # visible (id, v) multiset-as-set per snapshot
        live: set = set()
        committed = 0
        for b, (kind, arg) in enumerate(ops):
            if kind == "ins":
                t.append(
                    spark.createDataFrame(
                        [(k, b) for k in arg], "id long, v long"
                    ),
                    batch_id=b,
                )
                live = live | {(k, b) for k in arg}
                committed += 1
                history.append(set(live))
            else:
                sid = t.delete(
                    F.col("id") == arg, key_cols=["id"], batch_id=b
                )
                assert sid >= 0  # batch ids here are unique -> never fenced
                # a no-match delete still commits a (rows=0) tombstone
                # snapshot; its visible state simply equals the prior one
                live = {(k, v) for (k, v) in live if k != arg}
                committed += 1
                history.append(set(live))
        # every committed snapshot time-travels to its replay state
        snaps = [s["snapshot_id"] for s in t.snapshots()]
        assert len(snaps) == committed
        for idx, sid in enumerate(snaps):
            got = {
                (r["id"], r["v"]) for r in t.read_as_of(sid).collect()
            }
            assert got == history[idx], (sid, ops)
        # and the current read is the final state
        assert {
            (r["id"], r["v"]) for r in t.read().collect()
        } == live
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(**_SETTINGS)
@given(_snap_ops)
def test_change_feed_replay_reconstructs_any_snapshot(spark, ops):
    """The incremental-consumer invariant (the reference's whole
    pattern-1.2 loop): for every committed snapshot a, applying the
    include_deletes change feed (a, head] IN SNAPSHOT ORDER to
    read_as_of(a) reconstructs read_as_of(head) — on arbitrary
    interleavings of appends and key-scoped deletes. A feed that
    dropped a change, replayed one out of order, or leaked a
    tombstone's kill across a later re-insert would break some prefix."""
    import shutil
    import tempfile

    from duckdb_streaming_patterns_spark.plans.snapshots import SnapshotTable

    root = tempfile.mkdtemp(prefix="cdf_prop_")
    try:
        t = SnapshotTable(spark, root, "id long, v long")
        for b, (kind, arg) in enumerate(ops):
            if kind == "ins":
                t.append(
                    spark.createDataFrame(
                        [(k, b) for k in arg], "id long, v long"
                    ),
                    batch_id=b,
                )
            else:
                t.delete(
                    F.col("id") == arg, key_cols=["id"], batch_id=b
                )
        snaps = [s["snapshot_id"] for s in t.snapshots()]
        head = snaps[-1]
        want = {(r["id"], r["v"]) for r in t.read_as_of(head).collect()}
        for a in snaps[:-1]:
            state = {
                (r["id"], r["v"]) for r in t.read_as_of(a).collect()
            }
            feed = t.table_changes(a, head, include_deletes=True).collect()
            by_sid: dict[int, list] = {}
            for r in feed:
                by_sid.setdefault(r["snapshot_id"], []).append(r)
            for sid in sorted(by_sid):
                for r in by_sid[sid]:
                    if r["_change_type"] == "delete":
                        state = {
                            (k, v) for (k, v) in state if k != r["id"]
                        }
                for r in by_sid[sid]:
                    if r["_change_type"] == "insert":
                        state.add((r["id"], r["v"]))
            assert state == want, (a, head, ops)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_widen_eras = st.lists(
    st.tuples(
        # era type of the v column — the two integer widths plus the two
        # decimal shapes (round 12: the DECIMAL(p,s) LUB joins the
        # lattice; scale growth AND precision/int mixes are exercised)
        st.sampled_from(["int", "bigint", "decimal(10,2)", "decimal(12,4)"]),
        st.integers(min_value=1, max_value=4),  # rows in the era's batch
    ),
    min_size=1,
    max_size=5,
)

_INT_DIGITS_SPEC = {"int": 10, "bigint": 19}


def _expected_lub(types: set[str]) -> str:
    """Independent restatement of the widening spec (NOT the
    implementation): identical types pass through; integer-only mixes
    take the wider integer; any decimal in the mix keeps max integer
    digits + max scale, with integers joining at their exact width."""
    if len(types) == 1:
        return next(iter(types))
    if not any(t.startswith("decimal") for t in types):
        return "bigint" if "bigint" in types else "int"
    parts = []
    for t in types:
        if t.startswith("decimal"):
            p, s = (int(x) for x in t[8:-1].split(","))
            parts.append((p - s, s))
        else:
            parts.append((_INT_DIGITS_SPEC[t], 0))
    i = max(a for a, _ in parts)
    s = max(b for _, b in parts)
    return f"decimal({i + s},{s})"


@settings(**_SETTINGS)
@given(_widen_eras)
def test_type_widened_reads_match_replay_at_every_snapshot(spark, eras):
    """Round-11 property (decimal eras added round 12): under ARBITRARY
    per-batch type choices for a column (widening, narrowing back,
    alternating, int/decimal mixes — not just the monotone INT→BIGINT
    story), every read_as_of(k) returns exactly the replayed rows AND
    carries the least-upper-bound type of the eras inside its range
    (checked against an independent restatement of the LUB spec).
    Values are era-stamped so a cast that dropped or mangled an era
    would change the set; bigint eras include a value beyond int32 and
    decimal eras carry exact fractional digits a narrower scale could
    not represent."""
    import shutil
    import tempfile
    from decimal import Decimal

    from duckdb_streaming_patterns_spark.plans.snapshots import SnapshotTable

    root = tempfile.mkdtemp(prefix="widen_prop_")
    try:
        t = SnapshotTable(spark, root, "id long, v int")
        expected: list[set] = []
        live: set = set()
        next_id = 0
        for b, (typ, n) in enumerate(eras):
            rows = []
            for i in range(n):
                v = next_id * 10 + b
                if typ == "bigint" and i == 0:
                    v += 5_000_000_000  # unrepresentable in int32
                if typ == "decimal(10,2)":
                    v = Decimal(v) + Decimal("0.25")
                elif typ == "decimal(12,4)":
                    v = Decimal(v) + Decimal("0.0625")
                rows.append((next_id, v))
                next_id += 1
            t.append(
                spark.createDataFrame(rows, f"id long, v {typ}"),
                batch_id=b,
            )
            # Decimal compares and hashes by numeric value (== across
            # int/Decimal and across scales), so one set serves every
            # LUB the prefix can resolve to
            live = live | set(rows)
            expected.append(set(live))
        snaps = [s["snapshot_id"] for s in t.snapshots()]
        assert len(snaps) == len(eras)
        for idx, sid in enumerate(snaps):
            got_df = t.read_as_of(sid)
            vt = {
                f.name: f.dataType.simpleString()
                for f in got_df.schema.fields
            }["v"]
            lub = _expected_lub({typ for typ, _ in eras[: idx + 1]})
            assert vt == lub, (sid, eras)
            got = {(r["id"], r["v"]) for r in got_df.collect()}
            assert got == expected[idx], (sid, eras)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_kmv_batches = st.lists(
    st.lists(
        st.tuples(st.integers(0, 9), st.sampled_from(["a", "b"])),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@settings(**_SETTINGS)
@given(_kmv_batches)
def test_streaming_kmv_state_is_prefix_kmin(spark, tmp_path_factory, batches):
    """Merge-law property at a k SMALL enough to exercise the cap (k=3):
    after every micro-batch, the maintained KMV state must equal the
    k-min-by-md5 set of the PREFIX's distinct (type, user) pairs — the
    exact invariant the oracle row pins only on the fixture. String
    compare on (type, hx): no floats involved."""
    import hashlib
    import os

    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        distinct_kmv_batch,
    )

    k = 3
    root = str(tmp_path_factory.mktemp("kmvprop"))
    state = SummaryTable(
        spark,
        os.path.join(root, "kmv"),
        "event_type string, hx string, h60 long",
    )
    vlog = UpsertLog(
        spark,
        os.path.join(root, "est"),
        keys=["batch_seq", "event_type"],
        insert_only=True,
    )
    seen: set[tuple[str, int]] = set()
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows or [(None, None)], "user_id long, event_type string"
        )
        if not rows:
            df = df.where(F.col("user_id").isNotNull())
        distinct_kmv_batch(state, vlog, df, bid, k)
        seen |= {(t, u) for u, t in rows}
        expect = set()
        for t in {t for t, _ in seen}:
            hs = sorted(
                hashlib.md5(str(u).encode()).hexdigest()
                for tt, u in seen
                if tt == t
            )
            ranked = sorted(hs, key=lambda h: (int(h[:15], 16), h))
            expect |= {(t, h) for h in ranked[:k]}
        got = {
            (r["event_type"], r["hx"]) for r in state.read().collect()
        }
        assert got == expect, (bid, got, expect)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.integers(0, 7), min_size=0, max_size=5),
        min_size=1,
        max_size=3,
    )
)
def test_streaming_quantile_state_is_prefix_bottom_k(
    spark, tmp_path_factory, batches
):
    """The quantile fold's maintained sample must equal the prefix's
    bottom-k-by-md5(doc_id) set per language, at a k small enough (k=3)
    to exercise the cap — same merge law as the KMV property, here over
    (lang, doc_id, val) triples. doc_ids are globally unique across
    batches (the staging contract)."""
    import hashlib
    import os

    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        quantiles_kmv_batch,
    )

    k = 3
    root = str(tmp_path_factory.mktemp("qprop"))
    state = SummaryTable(
        spark,
        os.path.join(root, "sample"),
        "lang string, doc_id long, val long, hx string, h60 long",
    )
    vlog = UpsertLog(
        spark,
        os.path.join(root, "est"),
        keys=["batch_seq", "lang"],
        insert_only=True,
    )
    next_id = 0
    seen: list[tuple[int, str]] = []  # (doc_id, lang)
    for bid, word_counts in enumerate(batches):
        rows = []
        for n in word_counts:
            lang = "en" if next_id % 2 == 0 else "de"
            rows.append((next_id, lang, "w " * n))
            seen.append((next_id, lang))
            next_id += 1
        df = spark.createDataFrame(
            rows or [(None, None, None)],
            "doc_id long, lang string, text string",
        )
        if not rows:
            df = df.where(F.col("doc_id").isNotNull())
        quantiles_kmv_batch(state, vlog, df, bid, k)
        expect = set()
        for lang in {l for _, l in seen}:
            members = [d for d, l in seen if l == lang]
            ranked = sorted(
                members,
                key=lambda d: (
                    int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16),
                    hashlib.md5(str(d).encode()).hexdigest(),
                ),
            )
            expect |= {(lang, d) for d in ranked[:k]}
        got = {(r["lang"], r["doc_id"]) for r in state.read().collect()}
        assert got == expect, (bid, got, expect)


# -- Hybrid-manifest floor/clamp algebra (round 15) -------------------------
# The pointer plane is pure Python (no Spark), so random operation
# sequences are cheap: any interleaving of normal publishes and forget
# publishes must preserve the GDPR guarantees the race tests pin at
# specific interleavings.


@given(
    st.lists(
        st.tuples(
            st.booleans(),          # is this publish a forget?
            st.integers(0, 12),     # version
            st.integers(0, 20),     # lex_gen
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_manifest_floor_and_clamp_invariants_hold_for_any_sequence(ops):
    """For ANY sequence of hybrid-manifest publishes: the head version
    and the floor are monotone non-decreasing; after a forget at
    version v completes, floor >= v whenever the head covers v; the
    head NEVER serves a lexical generation below forget_gen (the
    round-15 clamp — a stale pre-forget head is either re-pointed or
    its install refused); and every history entry sits at or above the
    floor. ValueError from the clamp is an allowed outcome for a
    would-install stale normal publish — the coordinator re-resolves."""
    import os
    import tempfile

    from duckdb_streaming_patterns_spark.plans.commitio import (
        ObjectStoreSimIO,
    )
    from duckdb_streaming_patterns_spark.streaming import patterns

    io = ObjectStoreSimIO()
    with tempfile.TemporaryDirectory() as run:
        os.makedirs(run, exist_ok=True)
        path = patterns._hybrid_manifest_path(run)
        prev_head, prev_floor = -1, 0
        for is_forget, version, lex_gen in ops:
            try:
                patterns.publish_hybrid_manifest(
                    io, run, version=version, lex_gen=lex_gen,
                    ann_snapshot=lex_gen, sum_dl=lex_gen * 10,
                    n_docs=lex_gen, reset_history=is_forget,
                )
            except ValueError:
                # the clamp refusing a would-install publish whose
                # lex_gen predates forget_gen (normal OR a stale
                # redelivered forget): legal; the invariant checks
                # below verify the pointer stayed consistent
                pass
            man = io.try_read_json(path)
            if man is None:
                continue
            head = int(man["version"])
            floor = int(man.get("floor", 0))
            fgen = int(man.get("forget_gen", 0))
            # monotone head + floor
            assert head >= prev_head
            assert floor >= prev_floor
            prev_head, prev_floor = head, floor
            # a completed forget's guarantee (its version is covered)
            if is_forget and head >= version:
                assert floor >= version
                assert fgen >= lex_gen
            # the clamp: the head never serves pre-forget scoping
            assert int(man["lex_gen"]) >= fgen
            # history respects the floor and the clamp
            for h in man.get("hist", []):
                assert int(h["version"]) >= floor


@given(
    st.lists(
        st.tuples(
            st.booleans(),          # forget-driven publish?
            st.integers(0, 10),     # version
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_release_publish_floor_invariants_hold_for_any_sequence(ops):
    """The release manifest's factored pointer algebra
    (queries_pipeline._release_covered / _release_publish, round 15)
    under ANY sequence of builds: head version and floor monotone
    non-decreasing; after a forget at version v whose version is
    covered, floor >= v; every history entry at or above the floor;
    the pre-check never reports 'covered' for a version above the
    head. Runs the REAL publish code with synthetic manifests — no
    Spark, no data dirs."""
    import os
    import tempfile

    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _chain,
    )
    from duckdb_streaming_patterns_spark import queries_pipeline as qp
    from duckdb_streaming_patterns_spark.plans.commitio import (
        ObjectStoreSimIO,
    )

    io = ObjectStoreSimIO()
    with tempfile.TemporaryDirectory() as rel:
        os.makedirs(rel, exist_ok=True)
        path = qp._release_manifest_path(rel)
        prev_head, prev_floor = -1, 0
        for forget, version in ops:
            covered = qp._release_covered(io, rel, version, forget)
            if covered is None:
                # the uncovered path "builds" and publishes
                qp._release_publish(
                    io, rel,
                    {"version": version, "data": f"data_v{version:04d}_x"},
                    version, forget,
                )
            else:
                # covered must never under-report the head
                assert int(covered["version"]) >= version
            man = io.try_read_json(path)
            head = int(man["version"])
            floor = int(man.get("floor", 0))
            assert head >= prev_head
            assert floor >= prev_floor
            prev_head, prev_floor = head, floor
            if forget and head >= version:
                assert floor >= version
            for h in man.get("hist", []):
                assert int(h["version"]) >= floor
