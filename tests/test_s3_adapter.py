"""S3CommitIO contract tests (plans/s3io.py): the §10 verb mapping
EXECUTED against an in-memory boto3-surface fake — conditional PUTs
(If-None-Match / If-Match + ETag), delimiter LISTs, CopyObject promote
ordering, paged deletes — so the adapter's protocol is tested in CI
with zero network; a deployment swaps in ``boto3.client("s3")``.

The fake raises real ``botocore.exceptions.ClientError``s with the
status codes S3 documents (412 PreconditionFailed, NoSuchKey), so the
adapter's error narrowing is exercised against the same exception shape
the real SDK produces.
"""

from __future__ import annotations

import hashlib
import io as _io
import json
import threading

import pytest
from botocore.exceptions import ClientError

from duckdb_streaming_patterns_spark.plans.commitio import (
    READ_ABSENT,
    PointerCasError,
)
from duckdb_streaming_patterns_spark.plans.s3io import S3CommitIO


def _err(code: str, op: str) -> ClientError:
    return ClientError({"Error": {"Code": code, "Message": code}}, op)


class FakeS3Client:
    """The subset of the boto3 S3 client surface S3CommitIO uses, with
    S3's documented semantics: whole-object puts, ETag = md5(body),
    If-None-Match:* and If-Match conditional writes (412 on failure,
    NoSuchKey for If-Match on a missing key), prefix+delimiter lists,
    server-side CopyObject. A lock serializes conditional check+commit
    pairs — the store's server-side atomicity."""

    def __init__(
        self,
        copy_size_cap: int | None = None,
        fail_part_copy_at: int | None = None,
    ) -> None:
        self.objects: dict[str, bytes] = {}
        self.copy_log: list[str] = []
        self._lock = threading.Lock()
        # S3's documented CopyObject ceiling (5 GiB); injectable small
        # so the multipart path is testable with tiny objects
        self.copy_size_cap = copy_size_cap
        self._multipart: dict[str, dict] = {}
        self._upload_seq = 0
        # fault injection: UploadPartCopy raises on this PartNumber
        self.fail_part_copy_at = fail_part_copy_at
        self.aborted_uploads: list[str] = []

    @staticmethod
    def _etag(body: bytes) -> str:
        return '"%s"' % hashlib.md5(body).hexdigest()

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, IfMatch=None):
        body = Body if isinstance(Body, bytes) else Body.encode()
        with self._lock:
            if IfNoneMatch == "*" and Key in self.objects:
                raise _err("PreconditionFailed", "PutObject")
            if IfMatch is not None:
                cur = self.objects.get(Key)
                if cur is None:
                    raise _err("NoSuchKey", "PutObject")
                if self._etag(cur) != IfMatch:
                    raise _err("PreconditionFailed", "PutObject")
            self.objects[Key] = body
            return {"ETag": self._etag(body)}

    def get_object(self, Bucket, Key):
        body = self.objects.get(Key)
        if body is None:
            raise _err("NoSuchKey", "GetObject")
        return {"Body": _io.BytesIO(body), "ETag": self._etag(body)}

    def head_object(self, Bucket, Key):
        if Key not in self.objects:
            raise _err("404", "HeadObject")
        return {"ETag": self._etag(self.objects[Key])}

    def list_objects_v2(
        self, Bucket, Prefix="", Delimiter=None, MaxKeys=1000,
        ContinuationToken=None,
    ):
        keys = sorted(k for k in self.objects if k.startswith(Prefix))
        contents, prefixes = [], []
        for k in keys:
            rest = k[len(Prefix):]
            if Delimiter and Delimiter in rest:
                p = Prefix + rest.split(Delimiter, 1)[0] + Delimiter
                if p not in prefixes:
                    prefixes.append(p)
            else:
                contents.append({"Key": k, "Size": len(self.objects[k])})
        return {
            "Contents": contents[:MaxKeys],
            "CommonPrefixes": [{"Prefix": p} for p in prefixes],
            "IsTruncated": False,
        }

    def copy_object(self, Bucket, Key, CopySource):
        src = self.objects.get(CopySource["Key"])
        if src is None:
            raise _err("NoSuchKey", "CopyObject")
        if self.copy_size_cap is not None and len(src) > self.copy_size_cap:
            # real S3: "The specified copy source is larger than the
            # maximum allowable size for a copy source: 5368709120"
            raise _err("InvalidRequest", "CopyObject")
        self.objects[Key] = src
        self.copy_log.append(Key)
        return {"CopyObjectResult": {"ETag": self._etag(src)}}

    def create_multipart_upload(self, Bucket, Key):
        self._upload_seq += 1
        uid = f"upload-{self._upload_seq}"
        self._multipart[uid] = {"key": Key, "parts": {}}
        return {"UploadId": uid}

    def upload_part_copy(
        self, Bucket, Key, UploadId, PartNumber, CopySource, CopySourceRange
    ):
        if self.fail_part_copy_at == PartNumber:
            raise _err("InternalError", "UploadPartCopy")
        src = self.objects.get(CopySource["Key"])
        if src is None:
            raise _err("NoSuchKey", "UploadPartCopy")
        lo, hi = CopySourceRange.removeprefix("bytes=").split("-")
        part = src[int(lo): int(hi) + 1]
        self._multipart[UploadId]["parts"][PartNumber] = part
        return {"CopyPartResult": {"ETag": self._etag(part)}}

    def abort_multipart_upload(self, Bucket, Key, UploadId):
        # real S3: aborting an unknown/completed upload is NoSuchUpload
        if UploadId not in self._multipart:
            raise _err("NoSuchUpload", "AbortMultipartUpload")
        self._multipart.pop(UploadId)
        self.aborted_uploads.append(UploadId)
        return {}

    def complete_multipart_upload(self, Bucket, Key, UploadId, MultipartUpload):
        up = self._multipart.pop(UploadId)
        body = b"".join(
            up["parts"][p["PartNumber"]]
            for p in MultipartUpload["Parts"]
        )
        self.objects[Key] = body
        self.copy_log.append(Key)
        return {"ETag": self._etag(body)}

    def delete_object(self, Bucket, Key):
        self.objects.pop(Key, None)  # S3 delete is idempotent
        return {}

    def delete_objects(self, Bucket, Delete):
        for o in Delete["Objects"]:
            self.objects.pop(o["Key"], None)
        return {}


@pytest.fixture
def s3io():
    return S3CommitIO(FakeS3Client(), bucket="test", prefix="engine")


def test_put_get_roundtrip_and_absence(s3io):
    assert s3io.try_read_json("/state/doc.json") is None
    with pytest.raises(FileNotFoundError):
        s3io.read_json("/state/doc.json")
    s3io.put_json("/state/doc.json", {"a": 1})
    assert s3io.read_json("/state/doc.json") == {"a": 1}


def test_put_if_absent_is_write_once(s3io):
    assert s3io.put_json_if_absent("/f/0.json", {"w": "first"})
    assert not s3io.put_json_if_absent("/f/0.json", {"w": "second"})
    assert s3io.read_json("/f/0.json") == {"w": "first"}


def test_list_names_immediate_children_only(s3io):
    s3io.put_json("/root/a.json", {})
    s3io.put_json("/root/sub/b.json", {})
    s3io.put_json("/root/sub/deeper/c.json", {})
    s3io.put_json("/root/.hidden.json", {})
    assert sorted(s3io.list_names("/root")) == ["a.json", "sub"]
    assert s3io.list_names("/nowhere") == []


def test_exists_object_and_prefix(s3io):
    s3io.put_json("/t/__batch_id=0/_folds.json", {})
    assert s3io.exists("/t/__batch_id=0/_folds.json")  # HEAD
    assert s3io.exists("/t/__batch_id=0")  # prefix LIST
    assert not s3io.exists("/t/__batch_id=1")


def test_swap_pointer_cas_value_and_etag(s3io):
    p = "/ptr/gen.json"
    # first install goes through the absence-read conditional CREATE
    s3io.swap_pointer(p, {"gen": 0}, expected={READ_ABSENT: True})
    # racing first install loses loudly
    with pytest.raises(PointerCasError):
        s3io.swap_pointer(p, {"gen": 0}, expected={READ_ABSENT: True})
    # normal advance: read value, swap conditioned on it
    cur = s3io.read_json(p)
    s3io.swap_pointer(p, {"gen": 1}, expected=cur)
    assert s3io.read_json(p) == {"gen": 1}
    # lost update: expected is stale
    with pytest.raises(PointerCasError):
        s3io.swap_pointer(p, {"gen": 2}, expected=cur)
    # deleted pointer under a stale writer: If-Match refuses
    got = s3io.read_json(p)
    s3io.delete(p)
    with pytest.raises(PointerCasError):
        s3io.swap_pointer(p, {"gen": 2}, expected=got)
    # unconditional install is explicit
    s3io.swap_pointer(p, {"gen": 9}, expected=None)
    assert s3io.read_json(p) == {"gen": 9}


def test_swap_pointer_etag_guards_get_put_window(s3io):
    """Even when the VALUE matches at read time, a concurrent writer
    landing between the adapter's GET and PUT is refused server-side:
    the If-Match carries the GET's ETag, which the race invalidated."""
    p = "/ptr/gen.json"
    s3io.put_json(p, {"gen": 5})
    real_get = s3io.client.get_object

    def racing_get(Bucket, Key):
        resp = real_get(Bucket=Bucket, Key=Key)
        # the race: same VALUE re-written with different whitespace
        # (different bytes -> different ETag), after our read
        s3io.client.objects[Key] = b'{"gen": 5}   '
        return resp

    s3io.client.get_object = racing_get
    try:
        with pytest.raises(PointerCasError, match="If-Match"):
            s3io.swap_pointer(p, {"gen": 6}, expected={"gen": 5})
    finally:
        s3io.client.get_object = real_get
    assert s3io.read_json(p) == {"gen": 5}  # the racer's write survives


def test_promote_dir_copies_manifest_strictly_last(s3io):
    s3io.put_json("/stage/x/part-0.parquet", {"d": 1})
    s3io.put_json("/stage/x/part-1.parquet", {"d": 2})
    s3io.put_json("/stage/x/_meta.json", {"m": 1})
    s3io.put_json("/stage/x/_folds.json", {"folded": [1, 2]})
    # an orphan from a crashed prior attempt at the final prefix
    s3io.put_json("/live/x/part-stale.parquet", {"old": True})
    s3io.client.copy_log.clear()
    s3io.promote_dir("/stage/x", "/live/x")
    copied = s3io.client.copy_log
    assert copied[-1].endswith("_folds.json"), copied
    assert all(not c.endswith("_folds.json") for c in copied[:-1])
    assert sorted(s3io.list_names("/live/x")) == [
        "_folds.json", "_meta.json", "part-0.parquet", "part-1.parquet",
    ]
    assert not s3io.exists("/live/x/part-stale.parquet")  # orphan swept
    assert not s3io.exists("/stage/x")  # staged prefix deleted


def test_delete_tree_and_prefix_isolation(s3io):
    s3io.put_json("/logs/a/0.json", {})
    s3io.put_json("/logs/a/sub/1.json", {})
    s3io.put_json("/logs/ab/2.json", {})  # sibling prefix must survive
    s3io.delete_tree("/logs/a")
    assert not s3io.exists("/logs/a")
    assert s3io.exists("/logs/ab/2.json")


def test_upsert_log_pointer_protocol_on_s3(s3io):
    """The generation-pointer protocol (streaming/patterns) end-to-end
    on the adapter: publish, idempotent re-publish, CAS advance —
    exactly the calls _publish_bm25_gen makes."""
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        _bm25_gen_path,
        _publish_bm25_gen,
    )

    run = "/runs/bm25"
    _publish_bm25_gen(s3io, run, 0, 100, 10)
    _publish_bm25_gen(s3io, run, 0, 999, 99)  # redelivery: no-op
    ptr = s3io.read_json(_bm25_gen_path(run))
    assert ptr["gen"] == 0 and ptr["sum_dl"] == 100 and ptr["hist"] == []
    _publish_bm25_gen(s3io, run, 1, 50, 5)
    ptr = s3io.read_json(_bm25_gen_path(run))
    assert ptr == {
        "gen": 1, "sum_dl": 150, "n_docs": 15,
        "hist": [{"gen": 0, "sum_dl": 100, "n_docs": 10}],
    }


def test_hybrid_manifest_protocol_on_s3(s3io):
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        _hybrid_manifest_path,
        publish_hybrid_manifest,
    )

    run = "/runs/hyb"
    publish_hybrid_manifest(s3io, run, 1, lex_gen=3, ann_snapshot=7,
                            sum_dl=10, n_docs=2)
    publish_hybrid_manifest(s3io, run, 0, lex_gen=1, ann_snapshot=3,
                            sum_dl=5, n_docs=1)  # stale: no-op
    man = s3io.read_json(_hybrid_manifest_path(run))
    assert man["version"] == 1 and man["lex_gen"] == 3
    assert man["ann_snapshot"] == 7


def test_promote_dir_multipart_copy_above_copyobject_ceiling():
    """Objects above the CopyObject 5 GiB API ceiling must promote via
    multipart copy (CreateMultipartUpload + ranged UploadPartCopy) —
    ADVICE r13: a single CopyObject would fail server-side mid-promote.
    The fake enforces the ceiling; the adapter's limit is shrunk so a
    20-byte object exercises the ranged-part path."""
    from duckdb_streaming_patterns_spark.plans.s3io import S3CommitIO

    client = FakeS3Client(copy_size_cap=8)
    io = S3CommitIO(client, "bkt", copy_part_limit=8)
    big = b"0123456789abcdefghij"  # 20 bytes -> parts of 8+8+4
    client.objects["stage/y/part-0.parquet"] = big
    client.objects["stage/y/_meta.json"] = b"{}"
    client.objects["stage/y/_folds.json"] = b"{}"
    io.promote_dir("/stage/y", "/live/y")
    assert client.objects["live/y/part-0.parquet"] == big
    assert client.objects["live/y/_folds.json"] == b"{}"
    assert not any(k.startswith("stage/y/") for k in client.objects)
    # manifest still strictly last even when data went multipart
    assert client.copy_log[-1].endswith("_folds.json")
    assert not client._multipart  # no dangling uncommitted uploads


def test_multipart_copy_aborts_upload_on_part_failure():
    """ADVICE r14: a part failure mid-multipart must abort the upload
    in-band — an uncommitted multipart upload is invisible but BILLED
    until aborted, so without the abort a transient fault leaks storage
    cost indefinitely (unless the bucket carries an
    AbortIncompleteMultipartUpload lifecycle rule, which only the hard-
    crash case should need). The original failure still surfaces."""
    from duckdb_streaming_patterns_spark.plans.s3io import S3CommitIO

    client = FakeS3Client(copy_size_cap=8, fail_part_copy_at=2)
    io = S3CommitIO(client, "bkt", copy_part_limit=8)
    client.objects["stage/z/part-0.parquet"] = b"0123456789abcdefghij"
    with pytest.raises(Exception) as exc:
        io.promote_dir("/stage/z", "/live/z")
    assert "InternalError" in str(exc.value)
    # the upload was aborted, not left uncommitted-and-billed
    assert client.aborted_uploads == ["upload-1"]
    assert not client._multipart
    # nothing visible landed at the destination
    assert "live/z/part-0.parquet" not in client.objects
    # a RETRY after the transient fault completes cleanly end-to-end
    client.fail_part_copy_at = None
    io.promote_dir("/stage/z", "/live/z")
    assert client.objects["live/z/part-0.parquet"] == b"0123456789abcdefghij"
    assert not client._multipart
