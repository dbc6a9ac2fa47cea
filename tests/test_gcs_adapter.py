"""GCSCommitIO contract tests (plans/gcsio.py): the §10 verb mapping's
GCS column EXECUTED against an in-memory google-cloud-storage-surface
fake — generation-number conditional uploads (if_generation_match=0
fence + generation CAS), delimiter list_blobs with .prefixes, ordered
copy_blob promote, 412/404 error narrowing — zero network in CI; a
deployment passes ``google.cloud.storage.Client()``.

The fake's errors carry ``code`` attributes exactly like
google.api_core.exceptions (PreconditionFailed.code == 412,
NotFound.code == 404), which is all the adapter narrows on — no SDK
import anywhere.
"""

from __future__ import annotations

import threading

import pytest

from duckdb_streaming_patterns_spark.plans.commitio import (
    READ_ABSENT,
    PointerCasError,
)
from duckdb_streaming_patterns_spark.plans.gcsio import GCSCommitIO


class FakeApiError(Exception):
    def __init__(self, code: int, msg: str = ""):
        super().__init__(msg or str(code))
        self.code = code


class FakeBlob:
    def __init__(self, bucket: "FakeBucket", name: str, pinned_gen=None):
        self._bucket = bucket
        self.name = name
        # like the real library: a blob returned by get_blob carries the
        # generation OBSERVED AT FETCH TIME (a snapshot), not a live view
        self._pinned_gen = pinned_gen

    # -- generation bookkeeping lives in the bucket store: {name: (bytes, gen)}

    @property
    def generation(self):
        if self._pinned_gen is not None:
            return self._pinned_gen
        rec = self._bucket._store.get(self.name)
        return rec[1] if rec else None

    def upload_from_string(self, data, if_generation_match=None):
        body = data if isinstance(data, bytes) else data.encode()
        with self._bucket._lock:
            rec = self._bucket._store.get(self.name)
            if if_generation_match is not None:
                cur_gen = rec[1] if rec else 0
                if cur_gen != if_generation_match:
                    raise FakeApiError(412, "PreconditionFailed")
            self._bucket._gen += 1
            self._bucket._store[self.name] = (body, self._bucket._gen)

    def download_as_bytes(self):
        rec = self._bucket._store.get(self.name)
        if rec is None:
            raise FakeApiError(404, "NotFound")
        return rec[0]

    def exists(self):
        return self.name in self._bucket._store

    def delete(self):
        if self.name not in self._bucket._store:
            raise FakeApiError(404, "NotFound")
        del self._bucket._store[self.name]


class FakeBucket:
    def __init__(self, name: str):
        self.name = name
        self._store: dict[str, tuple[bytes, int]] = {}
        self._gen = 0
        self._lock = threading.Lock()
        self.copy_log: list[str] = []

    def blob(self, name: str) -> FakeBlob:
        return FakeBlob(self, name)

    def get_blob(self, name: str):
        rec = self._store.get(name)
        return FakeBlob(self, name, pinned_gen=rec[1]) if rec else None

    def copy_blob(self, blob: FakeBlob, dst_bucket: "FakeBucket", new_name: str):
        body = blob.download_as_bytes()
        dst_bucket._gen += 1
        dst_bucket._store[new_name] = (body, dst_bucket._gen)
        dst_bucket.copy_log.append(new_name)
        return FakeBlob(dst_bucket, new_name)


class FakeListIterator:
    """Mimics the library's HTTPIterator: yields blobs; .prefixes is
    populated as pages are consumed."""

    def __init__(self, blobs, prefixes):
        self._blobs = blobs
        self.prefixes = set()  # populated on iteration, like the library
        self._final_prefixes = prefixes

    def __iter__(self):
        self.prefixes |= self._final_prefixes
        return iter(self._blobs)


class FakeGCSClient:
    def __init__(self):
        self._buckets: dict[str, FakeBucket] = {}

    def bucket(self, name: str) -> FakeBucket:
        return self._buckets.setdefault(name, FakeBucket(name))

    def list_blobs(self, bucket, prefix=None, delimiter=None, max_results=None):
        b = bucket if isinstance(bucket, FakeBucket) else self.bucket(bucket)
        names = sorted(k for k in b._store if k.startswith(prefix or ""))
        blobs, prefixes = [], set()
        for k in names:
            rest = k[len(prefix or ""):]
            if delimiter and delimiter in rest:
                prefixes.add((prefix or "") + rest.split(delimiter, 1)[0] + delimiter)
            else:
                blobs.append(FakeBlob(b, k))
        if max_results is not None:
            blobs = blobs[:max_results]
        return FakeListIterator(blobs, prefixes)


@pytest.fixture
def gcsio():
    return GCSCommitIO(FakeGCSClient(), "test", prefix="engine")


def test_put_get_roundtrip_and_absence(gcsio):
    assert gcsio.try_read_json("/state/doc.json") is None
    with pytest.raises(FileNotFoundError):
        gcsio.read_json("/state/doc.json")
    gcsio.put_json("/state/doc.json", {"a": 1})
    assert gcsio.read_json("/state/doc.json") == {"a": 1}


def test_put_if_absent_is_write_once(gcsio):
    assert gcsio.put_json_if_absent("/f/0.json", {"w": "first"})
    assert not gcsio.put_json_if_absent("/f/0.json", {"w": "second"})
    assert gcsio.read_json("/f/0.json") == {"w": "first"}


def test_list_names_immediate_children_only(gcsio):
    gcsio.put_json("/root/a.json", {})
    gcsio.put_json("/root/sub/b.json", {})
    gcsio.put_json("/root/.hidden.json", {})
    assert sorted(gcsio.list_names("/root")) == ["a.json", "sub"]
    assert gcsio.list_names("/nowhere") == []


def test_exists_object_and_prefix(gcsio):
    gcsio.put_json("/t/__batch_id=0/_folds.json", {})
    assert gcsio.exists("/t/__batch_id=0/_folds.json")
    assert gcsio.exists("/t/__batch_id=0")
    assert not gcsio.exists("/t/__batch_id=1")


def test_swap_pointer_generation_cas(gcsio):
    p = "/ptr/gen.json"
    gcsio.swap_pointer(p, {"gen": 0}, expected={READ_ABSENT: True})
    with pytest.raises(PointerCasError):
        gcsio.swap_pointer(p, {"gen": 0}, expected={READ_ABSENT: True})
    cur = gcsio.read_json(p)
    gcsio.swap_pointer(p, {"gen": 1}, expected=cur)
    with pytest.raises(PointerCasError):  # stale expected
        gcsio.swap_pointer(p, {"gen": 2}, expected=cur)
    got = gcsio.read_json(p)
    gcsio.delete(p)
    with pytest.raises(PointerCasError):  # deleted under a stale writer
        gcsio.swap_pointer(p, {"gen": 2}, expected=got)
    gcsio.swap_pointer(p, {"gen": 9}, expected=None)
    assert gcsio.read_json(p) == {"gen": 9}


def test_swap_pointer_generation_guards_get_put_window(gcsio):
    """GCS's advantage over ETags: even a BYTE-IDENTICAL racing rewrite
    bumps the generation, so the CAS refuses — no value-collision
    caveat at all."""
    p = "/ptr/gen.json"
    gcsio.put_json(p, {"gen": 5})
    real_get_blob = gcsio.bucket.get_blob

    def racing_get_blob(name):
        blob = real_get_blob(name)
        # racer rewrites the SAME BYTES after our read
        gcsio.bucket.blob(name).upload_from_string(b'{"gen": 5}')
        return blob

    gcsio.bucket.get_blob = racing_get_blob
    try:
        with pytest.raises(PointerCasError, match="generation"):
            gcsio.swap_pointer(p, {"gen": 6}, expected={"gen": 5})
    finally:
        gcsio.bucket.get_blob = real_get_blob


def test_promote_dir_copies_manifest_strictly_last(gcsio):
    gcsio.put_json("/stage/x/part-0.parquet", {"d": 1})
    gcsio.put_json("/stage/x/_meta.json", {"m": 1})
    gcsio.put_json("/stage/x/_folds.json", {"folded": [1]})
    gcsio.put_json("/live/x/part-stale.parquet", {"old": True})
    gcsio.bucket.copy_log.clear()
    gcsio.promote_dir("/stage/x", "/live/x")
    copied = gcsio.bucket.copy_log
    assert copied[-1].endswith("_folds.json"), copied
    assert sorted(gcsio.list_names("/live/x")) == [
        "_folds.json", "_meta.json", "part-0.parquet",
    ]
    assert not gcsio.exists("/stage/x")


def test_delete_tree_prefix_isolation(gcsio):
    gcsio.put_json("/logs/a/0.json", {})
    gcsio.put_json("/logs/ab/1.json", {})
    gcsio.delete_tree("/logs/a")
    assert not gcsio.exists("/logs/a")
    assert gcsio.exists("/logs/ab/1.json")


def test_pointer_protocols_on_gcs(gcsio):
    """The engine's own pointer protocols end-to-end on the adapter."""
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        _bm25_gen_path,
        _hybrid_manifest_path,
        _publish_bm25_gen,
        publish_hybrid_manifest,
    )

    run = "/runs/bm25"
    _publish_bm25_gen(gcsio, run, 0, 100, 10)
    _publish_bm25_gen(gcsio, run, 1, 50, 5)
    ptr = gcsio.read_json(_bm25_gen_path(run))
    assert ptr["gen"] == 1 and ptr["hist"] == [
        {"gen": 0, "sum_dl": 100, "n_docs": 10}
    ]
    publish_hybrid_manifest(gcsio, "/runs/h", 0, 1, 3, 5, 1)
    publish_hybrid_manifest(gcsio, "/runs/h", 1, 3, 7, 10, 2)
    man = gcsio.read_json(_hybrid_manifest_path("/runs/h"))
    assert man["version"] == 1 and man["hist"][0]["version"] == 0
