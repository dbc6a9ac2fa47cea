"""Execute the SCALE.md §10 object-store port contract (round 11):
re-run the SnapshotTable / UpsertLog ledger, fold, checkpoint, vacuum,
and expiry CRASH-WINDOW tests with every table defaulting to the
object-store-semantics CommitIO backend (no rename, no hard links,
conditional-PUT fence, pointer CAS, copy-based promote) instead of the
POSIX one. Each wrapper delegates to the existing test function — the
scenario logic is identical; only the transaction-protocol substrate
changes — so a green run here means the metadata plane's whole verb
protocol survives on primitives an S3/GCS client actually has.

The backend swap is the module-level default (POSIX_IO rebind) rather
than per-constructor io= so the streaming patterns' internally
constructed logs are covered too.
"""

from __future__ import annotations

import pytest

from duckdb_streaming_patterns_spark.operators import merge as merge_mod
from duckdb_streaming_patterns_spark.plans import snapshots as snaps_mod
from duckdb_streaming_patterns_spark.plans.commitio import ObjectStoreSimIO

from tests import test_streaming_patterns as tsp


@pytest.fixture()
def objstore(monkeypatch):
    sim = ObjectStoreSimIO()
    monkeypatch.setattr(snaps_mod, "POSIX_IO", sim)
    monkeypatch.setattr(merge_mod, "POSIX_IO", sim)
    return sim


# -- UpsertLog fold/compact crash windows -----------------------------------

def test_upsert_compact_crash_window(spark, tmp_path, objstore):
    tsp.test_upsert_log_compact_crash_window_is_consistent(spark, tmp_path)


def test_upsert_maintain_survives_gc_crash(spark, tmp_path, objstore):
    tsp.test_upsert_log_maintain_survives_gc_crash(spark, tmp_path)


def test_upsert_maintain_every_gc_crash_point(spark, tmp_path, objstore):
    tsp.test_upsert_log_maintain_every_gc_crash_point(spark, tmp_path)


def test_upsert_lww_maintain_survives_gc_crash(spark, tmp_path, objstore):
    tsp.test_upsert_log_lww_maintain_survives_gc_crash(spark, tmp_path)


def test_insert_only_compact_crash_mid_gc(spark, tmp_path, objstore):
    tsp.test_insert_only_compact_crash_mid_gc_has_no_duplicates(
        spark, tmp_path
    )


# -- SnapshotTable ledger / checkpoint / vacuum / expiry ---------------------

def test_ledger_scoped_reads(spark, tmp_path, objstore):
    tsp.test_snapshot_reads_are_ledger_scoped_never_list_data_dir(
        spark, tmp_path
    )


def test_ledger_checkpointing_bounds_opens(spark, tmp_path, objstore):
    tsp.test_ledger_checkpointing_bounds_opens_per_read(spark, tmp_path)


def test_vacuum_flag_survives_checkpoint_fold(spark, tmp_path, objstore):
    tsp.test_vacuum_flag_survives_checkpoint_fold(spark, tmp_path)


def test_maintenance_only_checkpoint_windows(spark, tmp_path, objstore):
    tsp.test_maintenance_only_checkpoint_windows_never_serve_or_bake_stale_state(
        spark, tmp_path
    )


def test_expire_flags_after_maintenance_checkpoint(spark, tmp_path, objstore):
    tsp.test_expire_flags_visible_after_maintenance_only_checkpoint(
        spark, tmp_path
    )


def test_vacuum_applies_tombstones_physically(spark, tmp_path, objstore):
    tsp.test_snapshot_vacuum_applies_tombstones_physically(spark, tmp_path)


def test_vacuum_then_append_and_cdf_continue(spark, tmp_path, objstore):
    tsp.test_vacuum_then_append_and_cdf_continue(spark, tmp_path)


def test_expire_folds_history_and_bounds_paths(spark, tmp_path, objstore):
    tsp.test_expire_snapshots_folds_history_and_bounds_paths(spark, tmp_path)


def test_expire_crash_before_swap(spark, tmp_path, monkeypatch, objstore):
    tsp.test_expire_crash_before_swap_keeps_history_travellable(
        spark, tmp_path, monkeypatch
    )


def test_expire_crash_after_swap(spark, tmp_path, objstore):
    tsp.test_expire_crash_after_swap_keeps_cdf_guard_armed(spark, tmp_path)


def test_snapshots_survives_checkpoint_cleanup_race(
    spark, tmp_path, objstore
):
    tsp.test_snapshots_survives_checkpoint_cleanup_race(spark, tmp_path)


# -- a full streaming pattern on the simulated backend -----------------------
# (UpsertLog appends + tiered maintenance + SummaryTable fenced stats +
# DPP-pruned reads, end-to-end through object-store verbs only)

def test_streaming_bm25_pattern(spark, sf_small, objstore):
    tsp.test_streaming_bm25_equals_batch_and_prunes_query_buckets(
        spark, sf_small
    )


def test_streaming_bm25_midstream_probe(spark, sf_small, tmp_path, objstore):
    tsp.test_streaming_bm25_midstream_probe_equals_batch_prefix(
        spark, sf_small, tmp_path
    )


def test_deferred_gc_parks_dirs(spark, tmp_path, objstore):
    tsp.test_upsert_log_deferred_gc_parks_folded_dirs_one_cycle(
        spark, tmp_path
    )


def test_deferred_gc_defaults_on_by_backend(spark, tmp_path, objstore):
    """Round-12 (verdict item 3): constructing an UpsertLog over a
    non-POSIX CommitIO is reader-safe BY CONSTRUCTION — deferred_gc
    resolves to True without being asked for, so a fold parks its
    sources and a stale pre-fold reader plan still collects. POSIX keeps
    the prompt-GC default; an explicit bool overrides either way."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog
    from duckdb_streaming_patterns_spark.plans.commitio import PosixCommitIO

    log = UpsertLog(
        spark, str(tmp_path / "d"), keys=["k"], insert_only=True
    )  # io= defaulted — the monkeypatched module POSIX_IO is the sim
    assert log.io is objstore and log.deferred_gc is True
    posix_log = UpsertLog(
        spark, str(tmp_path / "p"), keys=["k"], io=PosixCommitIO()
    )
    assert posix_log.deferred_gc is False
    assert (
        UpsertLog(
            spark, str(tmp_path / "o"), keys=["k"], deferred_gc=False
        ).deferred_gc
        is False
    )
    # the reader-safety the default buys, end-to-end: a lazy plan whose
    # file listing predates the fold survives it (with prompt GC this
    # same sequence dies on deleted files — the round-11 race)
    for b in range(4):
        log.append(spark.range(b * 10, b * 10 + 10).selectExpr("id AS k"), b)
    stale = log.read_latest()
    assert log.maintain(fanout=2) >= 1
    assert stale.count() == 40
    assert log.read_latest().count() == 40


class _GatedPointerIO:
    """Interposer for ONE maintainer in the CAS race test: its first
    read of the generation pointer signals `read_evt` and then blocks
    until `commit_evt` — deterministically freezing this maintainer
    between its pointer read and its swap while the rival commits.
    Everything else passes through to the SHARED store endpoint."""

    def __init__(self, inner, pointer_path, read_evt, commit_evt):
        self._inner = inner
        self._pointer_path = pointer_path
        self._read_evt = read_evt
        self._commit_evt = commit_evt
        # armed explicitly AFTER table construction — the constructor
        # itself reads the pointer, which must pass through
        self._armed = False

    def arm(self):
        self._armed = True

    def try_read_json(self, path):
        val = self._inner.try_read_json(path)
        if self._armed and path == self._pointer_path:
            self._armed = False
            self._read_evt.set()
            assert self._commit_evt.wait(timeout=120)
        return val

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_two_maintainer_pointer_cas_race_loses_loudly_and_replans(
    spark, tmp_path, objstore
):
    """Round-12 (verdict item 6): the SCALE §10.2 scenario END-TO-END —
    two real maintenance passes race on one table's generation pointer
    on object-store verbs. Exactly one fold wins per generation; the
    loser's swap raises PointerCasError (never silently dropping the
    winner's generation), and its re-read + re-plan (a fresh compact)
    wins the NEXT generation. No snapshot is lost at any point."""
    import threading

    import pytest

    from duckdb_streaming_patterns_spark.plans.commitio import (
        PointerCasError,
    )
    from duckdb_streaming_patterns_spark.plans.snapshots import SnapshotTable

    root = str(tmp_path / "race")
    t2 = SnapshotTable(spark, root, "id long", io=objstore)
    for i in range(3):
        t2.append(
            spark.createDataFrame([(i * 10,), (i * 10 + 1,)], "id long"),
            batch_id=i,
        )
    want = sorted(r["id"] for r in t2.read().collect())
    t2.compact()  # pointer now EXISTS at generation 1 (value-CAS arm)
    assert t2._pointer()["generation"] == 1

    read_evt, commit_evt = threading.Event(), threading.Event()
    gated = _GatedPointerIO(objstore, t2._pointer_path, read_evt, commit_evt)
    t1 = SnapshotTable(spark, root, "id long", io=gated)
    gated.arm()
    caught: list = []

    def loser():
        try:
            t1.compact()
        except Exception as e:  # noqa: BLE001 — the test records it
            caught.append(e)

    th = threading.Thread(target=loser)
    th.start()
    assert read_evt.wait(timeout=120)  # t1 holds its gen-1 pointer read
    t2.compact()  # the rival wins generation 2
    assert t2._pointer()["generation"] == 2
    commit_evt.set()
    th.join(timeout=300)
    assert not th.is_alive()
    # exactly one winner per generation: the loser raised, wrote nothing
    assert len(caught) == 1 and isinstance(caught[0], PointerCasError)
    assert t2._pointer()["generation"] == 2
    # no snapshot lost through the race
    assert sorted(r["id"] for r in t2.read().collect()) == want
    assert t2.max_snapshot_id(t2.snapshots()) == 2
    # the loser re-reads and re-plans: a fresh compact wins generation 3
    t1.compact()
    assert t2._pointer()["generation"] == 3
    assert sorted(r["id"] for r in t2.read().collect()) == want
    # the first-install arm of the same race: two maintainers both read
    # ABSENCE (a brand-new table), one installs first, the stale twin
    # must lose loudly too (conditional CREATE, not blind PUT)
    root2 = str(tmp_path / "race2")
    a = SnapshotTable(spark, root2, "id long", io=objstore)
    a.append(spark.createDataFrame([(1,)], "id long"), batch_id=0)
    stale_bootstrap = a._pointer()  # read absence
    a.compact()  # installs generation 1
    with pytest.raises(PointerCasError, match="first-install"):
        objstore.swap_pointer(
            a._pointer_path,
            {"generation": 1, "data": "dup", "prev_data": None},
            expected=stale_bootstrap,
        )
    assert a._pointer()["data"] != "dup"


def test_lww_property_suite(spark, objstore):
    """The hypothesis LWW invariant (random schedules/cadence/fanout)
    executed on object-store verbs — the property suite, not just the
    scenario tests, holds on the simulated backend."""
    tsp_prop = __import__(
        "tests.test_properties", fromlist=["x"]
    )
    # hypothesis wraps the test function; call the wrapped property
    tsp_prop.test_upsert_log_lww_invariant_under_random_maintenance(spark)


# -- round-12 state shapes: sketch folds + as-of probe ------------------------

from tests import test_sketch_queries as tsk  # noqa: E402


def test_streaming_kmv_fold_crash_windows(spark, tmp_path, objstore):
    tsk.test_streaming_kmv_retries_idempotently_across_crash_windows(
        spark, tmp_path
    )


def test_streaming_quantile_fold_crash_windows(spark, tmp_path, objstore):
    tsk.test_streaming_quantiles_retries_idempotently(spark, tmp_path)


def test_asof_enrichment_crash_windows(spark, tmp_path, objstore):
    tsp.test_asof_enrichment_retries_and_prunes_state_probe(spark, tmp_path)


def test_bm25_consistent_serve_torn_batch(spark, sf_small, objstore):
    # the generation pointer's CAS publish + the scoped serve on
    # object-store semantics (swap_pointer = If-Match / If-None-Match)
    tsp.test_bm25_consistent_serve_ignores_torn_batch(spark, sf_small)


def test_hybrid_consistent_cross_index(spark, sf_small, objstore):
    # generation-pointer resolve + as-of partition-pruned ANN probe on
    # object-store semantics (the cross-index §18 extension)
    tsp.test_hybrid_consistent_serve_pins_both_indexes(spark, sf_small)
