"""Real-client CommitIO port: ``S3CommitIO`` — the SCALE.md §10 verb
mapping executed against the boto3 S3 client surface.

The engine's entire metadata plane (UpsertLog fold manifests, ledger
entries + checkpoints, generation pointers, the hybrid two-index
manifest) talks to storage through the CommitIO verbs. ``ObjectStoreSimIO``
executes those verbs' S3/GCS SEMANTICS over a local directory — this
class is the same protocol against a real endpoint, with the client
CONSTRUCTOR-INJECTED so the contract tests run it against an in-memory
fake (tests/test_s3_adapter.py) and a deployment passes
``boto3.client("s3")``. No network, no credentials, no import of boto3
is required at import time.

Per-verb mapping (§10; GCS equivalents noted — a ``GCSCommitIO`` is the
same shape with ``if_generation_match`` in place of the ETag headers and
is deliberately descoped until the google-cloud-storage surface is
available to test against):

| CommitIO verb        | S3 call                                    | GCS equivalent              |
|----------------------|--------------------------------------------|-----------------------------|
| list_names           | ListObjectsV2 (Prefix + Delimiter="/")     | objects.list + delimiter    |
| read_json            | GetObject                                  | blob.download               |
| put_json             | PutObject                                  | blob.upload                 |
| put_json_if_absent   | PutObject + If-None-Match: *               | if_generation_match=0       |
| swap_pointer (CAS)   | GetObject (value+ETag) → PutObject+If-Match| if_generation_match=<gen>   |
| delete               | DeleteObject (idempotent)                  | blob.delete (404-tolerant)  |
| promote_dir          | ListObjectsV2 → CopyObject each (data →    | objects.rewrite, same order |
|                      | meta → _folds.json STRICTLY LAST) → delete |                             |
|                      | (>5 GiB objects: multipart UploadPartCopy) |                             |
| delete_tree          | paged ListObjectsV2 + DeleteObjects (1000) | objects.list + batch delete |
| exists               | HeadObject, else MaxKeys=1 prefix LIST     | blob.exists / list          |
| ensure_dir           | no-op (prefixes need no creation)          | no-op                       |

Conditional-write notes: S3 supports ``If-None-Match: *`` on PutObject
(write-once fence) and ``If-Match: <etag>`` on PutObject (pointer CAS);
a failed condition surfaces as HTTP 412 ``PreconditionFailed`` (or 404
``NoSuchKey`` for If-Match on a deleted object) — both map to
:class:`PointerCasError`, matching the sim's strictness (round 12): a
stale writer racing a pointer delete must fail loudly, never
re-install.

Path mapping: callers hand CommitIO POSIX-style absolute paths (the
table/log roots); the adapter strips the leading slash and prepends the
configured key prefix — deterministic path construction is preserved
verbatim, which is what lets the rest of the engine stay
backend-agnostic.
"""

from __future__ import annotations

import json

from duckdb_streaming_patterns_spark.plans.commitio import (
    READ_ABSENT,
    PointerCasError,
)


def _error_code(exc) -> str:
    """The service error code of a botocore-shaped ClientError — duck-
    typed so the fake client's errors (and any SDK version) match."""
    try:
        return str(exc.response["Error"]["Code"])
    except (AttributeError, KeyError, TypeError):
        return ""


_NOT_FOUND = {"404", "NoSuchKey", "NotFound"}
_PRECONDITION = {"412", "PreconditionFailed", "ConditionalRequestConflict"}


class S3CommitIO:
    """CommitIO over an injected boto3-surface S3 client (module
    docstring has the full verb mapping). Single endpoint, no local
    state: every verb is one-or-more client calls with the store's own
    conditional semantics doing the fencing."""

    #: CopyObject's documented hard ceiling is 5 GiB per object; larger
    #: objects must go through multipart copy (CreateMultipartUpload +
    #: UploadPartCopy with byte ranges). Class-level so contract tests
    #: can shrink it and exercise the multipart path with tiny objects.
    COPY_PART_LIMIT = 5 * 1024**3

    def __init__(
        self, client, bucket: str, prefix: str = "",
        copy_part_limit: int | None = None,
    ) -> None:
        self.client = client
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.copy_part_limit = (
            copy_part_limit if copy_part_limit else self.COPY_PART_LIMIT
        )

    # -- key construction ---------------------------------------------------

    def _key(self, path: str) -> str:
        k = path.lstrip("/")
        return f"{self.prefix}/{k}" if self.prefix else k

    def _iter_keys(self, prefix_key: str):
        """Every object key under the prefix (recursive), paged."""
        for key, _size in self._iter_objects(prefix_key):
            yield key

    def _iter_objects(self, prefix_key: str):
        """(key, size) for every object under the prefix, paged — size
        drives the CopyObject-vs-multipart choice in promote_dir."""
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": prefix_key}
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for obj in resp.get("Contents", []) or []:
                yield obj["Key"], int(obj.get("Size", 0))
            if not resp.get("IsTruncated"):
                return
            token = resp.get("NextContinuationToken")

    # -- small-JSON metadata plane -------------------------------------------

    def list_names(self, dir_path: str) -> list[str]:
        """LIST with delimiter: immediate children (objects AND
        sub-prefixes) of the directory prefix; dot-names are
        backend-reserved and hidden, matching the sim."""
        base = self._key(dir_path).rstrip("/") + "/"
        names: set[str] = set()
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": base, "Delimiter": "/"}
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            for obj in resp.get("Contents", []) or []:
                names.add(obj["Key"][len(base):])
            for cp in resp.get("CommonPrefixes", []) or []:
                names.add(cp["Prefix"][len(base):].rstrip("/"))
            if not resp.get("IsTruncated"):
                break
            token = resp.get("NextContinuationToken")
        return [n for n in names if n and not n.startswith(".")]

    def read_json(self, path: str):
        """GET; 404 propagates as FileNotFoundError (the contract's
        absence signal)."""
        try:
            resp = self.client.get_object(
                Bucket=self.bucket, Key=self._key(path)
            )
        except Exception as e:  # noqa: BLE001 — narrowed by code below
            if _error_code(e) in _NOT_FOUND:
                raise FileNotFoundError(path) from e
            raise
        return json.loads(resp["Body"].read())

    def try_read_json(self, path: str):
        try:
            return self.read_json(path)
        except FileNotFoundError:
            return None

    def _get_with_etag(self, path: str):
        try:
            resp = self.client.get_object(
                Bucket=self.bucket, Key=self._key(path)
            )
        except Exception as e:  # noqa: BLE001
            if _error_code(e) in _NOT_FOUND:
                return None, None
            raise
        return json.loads(resp["Body"].read()), resp.get("ETag")

    def put_json(self, path: str, obj) -> None:
        """Unconditional PUT — last-writer-wins, atomic whole-object
        visibility is the store's own guarantee."""
        self.client.put_object(
            Bucket=self.bucket,
            Key=self._key(path),
            Body=json.dumps(obj).encode(),
        )

    def put_json_if_absent(self, path: str, obj) -> bool:
        """Write-once fence: PutObject + ``If-None-Match: *``. Exactly
        one writer per name succeeds; the loser writes NOTHING (the 412
        is the store refusing server-side)."""
        try:
            self.client.put_object(
                Bucket=self.bucket,
                Key=self._key(path),
                Body=json.dumps(obj).encode(),
                IfNoneMatch="*",
            )
            return True
        except Exception as e:  # noqa: BLE001
            if _error_code(e) in _PRECONDITION:
                return False
            raise

    def swap_pointer(self, path: str, obj, expected=None) -> None:
        """Pointer CAS (sim-identical semantics — see ObjectStoreSimIO):

        - value-read ``expected`` → re-GET for the current (value, ETag);
          absence or value drift raises PointerCasError before any
          write; the PUT then carries ``If-Match: <etag>`` so a racer
          landing between the GET and the PUT is refused server-side
          (412 → PointerCasError);
        - absence-read ``expected`` (READ_ABSENT marker) → conditional
          CREATE via ``If-None-Match: *``;
        - ``expected=None`` → explicit unconditional install.

        ABA caveat (vs the sim's and GCS adapter's GENERATION tokens):
        S3's If-Match rides on a content-derived ETag (MD5 of the
        body), so a racer that deletes the pointer and reinstalls
        byte-identical content between our GET and PUT passes the
        condition — the condition proves "same bytes", not "same write".
        Benign for every pointer this engine publishes today (versions,
        batch fences, and manifest generations are monotonically
        growing, so byte-identical reinstalls cannot express a
        different state), but a latent trap for any future pointer type
        whose payload can revisit a prior value — such payloads must
        embed a monotonic nonce to keep ETags unique, or use the GCS
        adapter's generation semantics."""
        key = self._key(path)
        body = json.dumps(obj).encode()
        if expected is None:
            self.client.put_object(Bucket=self.bucket, Key=key, Body=body)
            return
        absent_read = isinstance(expected, dict) and expected.get(READ_ABSENT)
        if absent_read:
            try:
                self.client.put_object(
                    Bucket=self.bucket, Key=key, Body=body, IfNoneMatch="*"
                )
                return
            except Exception as e:  # noqa: BLE001
                if _error_code(e) in _PRECONDITION:
                    raise PointerCasError(
                        f"swap_pointer({path}): first-install race — the "
                        "pointer was absent when read but now exists — "
                        "re-read and re-plan"
                    ) from e
                raise
        current, etag = self._get_with_etag(path)
        if current is None:
            raise PointerCasError(
                f"swap_pointer({path}): pointer deleted since it was read "
                f"(If-Match expected {expected!r}, found absence) — "
                "re-read and re-plan"
            )
        if current != expected:
            raise PointerCasError(
                f"swap_pointer({path}): pointer changed since it was read "
                f"(CAS expected {expected!r}, found {current!r}) — re-read "
                "and re-plan"
            )
        try:
            self.client.put_object(
                Bucket=self.bucket, Key=key, Body=body, IfMatch=etag
            )
        except Exception as e:  # noqa: BLE001
            if _error_code(e) in _PRECONDITION | _NOT_FOUND:
                raise PointerCasError(
                    f"swap_pointer({path}): lost the conditional PUT race "
                    f"(If-Match {etag}) — re-read and re-plan"
                ) from e
            raise

    def delete(self, path: str) -> None:
        """DELETE — idempotent, absence is the goal (S3's delete of a
        missing key already succeeds)."""
        self.client.delete_object(Bucket=self.bucket, Key=self._key(path))

    # -- data-directory plane -------------------------------------------------

    def promote_dir(self, staged: str, final: str) -> None:
        """CopyObject each staged object to the final prefix, ordered
        data → underscore-metadata → ``_folds.json`` STRICTLY LAST (the
        reader-visible commit point — §10.3, same order the sim
        enforces), then delete the staged prefix. A crashed prior
        attempt at the final prefix is an unreferenced orphan: deleted
        first, exactly like the sim."""
        staged_key = self._key(staged).rstrip("/") + "/"
        final_key = self._key(final).rstrip("/") + "/"
        self._delete_prefix(final_key)
        data, meta, manifest = [], [], []
        for k, size in self._iter_objects(staged_key):
            rel = k[len(staged_key):]
            name = rel.rsplit("/", 1)[-1]
            triple = (k, final_key + rel, size)
            if name == "_folds.json":
                manifest.append(triple)
            elif name.startswith(("_", ".")):
                meta.append(triple)
            else:
                data.append(triple)
        for src, dst, size in data + meta + manifest:
            self._copy_object(src, dst, size)
        self._delete_prefix(staged_key)

    def _copy_object(self, src: str, dst: str, size: int) -> None:
        """Server-side copy, sized: one CopyObject up to the 5 GiB API
        ceiling, multipart (CreateMultipartUpload + ranged
        UploadPartCopy + CompleteMultipartUpload) above it — merged
        parquet data files at the engine's target scale routinely
        exceed the single-call limit, and promote must not be the verb
        that caps file size. Parts are the ceiling-sized ranges in
        order; a crash mid-multipart leaves an uncommitted upload (no
        visible object), which the manifest-last ordering already makes
        harmless for CORRECTNESS — the retry re-lists and re-copies.

        Cost hygiene (round 15): an uncommitted multipart upload is
        invisible but BILLED until aborted, so a part failure aborts
        the upload in-band (best-effort — the abort itself may fail on
        the same network fault), and a HARD crash (process death, no
        except block runs) still leaves one. Real deployments must pair
        this with the standard bucket lifecycle rule
        (AbortIncompleteMultipartUpload, e.g. after 1 day) — the only
        mechanism that covers the crash case; documented here because
        no in-band code path can."""
        if size <= self.copy_part_limit:
            self.client.copy_object(
                Bucket=self.bucket,
                Key=dst,
                CopySource={"Bucket": self.bucket, "Key": src},
            )
            return
        up = self.client.create_multipart_upload(Bucket=self.bucket, Key=dst)
        upload_id = up["UploadId"]
        parts = []
        offset = 0
        try:
            while offset < size:
                end = min(offset + self.copy_part_limit, size) - 1
                resp = self.client.upload_part_copy(
                    Bucket=self.bucket,
                    Key=dst,
                    UploadId=upload_id,
                    PartNumber=len(parts) + 1,
                    CopySource={"Bucket": self.bucket, "Key": src},
                    CopySourceRange=f"bytes={offset}-{end}",
                )
                parts.append(
                    {
                        "PartNumber": len(parts) + 1,
                        "ETag": resp["CopyPartResult"]["ETag"],
                    }
                )
                offset = end + 1
            self.client.complete_multipart_upload(
                Bucket=self.bucket,
                Key=dst,
                UploadId=upload_id,
                MultipartUpload={"Parts": parts},
            )
        except Exception:
            try:
                self.client.abort_multipart_upload(
                    Bucket=self.bucket, Key=dst, UploadId=upload_id
                )
            except Exception:  # noqa: BLE001 — abort is best-effort;
                pass  # the original failure is the one to surface
            raise

    def _delete_prefix(self, prefix_key: str) -> None:
        batch: list[dict] = []
        for k in self._iter_keys(prefix_key):
            batch.append({"Key": k})
            if len(batch) == 1000:  # DeleteObjects page limit
                self.client.delete_objects(
                    Bucket=self.bucket, Delete={"Objects": batch}
                )
                batch = []
        if batch:
            self.client.delete_objects(
                Bucket=self.bucket, Delete={"Objects": batch}
            )

    def delete_tree(self, path: str) -> None:
        """Paged LIST + batched DeleteObjects over the prefix."""
        self._delete_prefix(self._key(path).rstrip("/") + "/")
        # the path may also name a single object (the sim's rmtree on a
        # file is a no-op; S3 keys can be both) — idempotent delete
        self.delete(path)

    def exists(self, path: str) -> bool:
        """HEAD on the object, else a MaxKeys=1 LIST on the prefix (the
        'directory exists' question on a store without directories)."""
        key = self._key(path)
        try:
            self.client.head_object(Bucket=self.bucket, Key=key)
            return True
        except Exception as e:  # noqa: BLE001
            if _error_code(e) not in _NOT_FOUND:
                raise
        resp = self.client.list_objects_v2(
            Bucket=self.bucket, Prefix=key.rstrip("/") + "/", MaxKeys=1
        )
        return bool(resp.get("Contents"))

    def ensure_dir(self, path: str) -> None:
        """No-op: prefixes need no creation."""
