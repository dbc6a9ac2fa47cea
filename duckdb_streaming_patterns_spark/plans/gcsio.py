"""Real-client CommitIO port #2: ``GCSCommitIO`` — the SCALE.md §10 verb
mapping against the google-cloud-storage client surface, completing the
pair with :mod:`.s3io` (which documents the full verb table; the GCS
column there is THIS class).

Same design rules as S3CommitIO: the client is CONSTRUCTOR-INJECTED —
no google-cloud-storage import at module import time, so the adapter is
import-clean in environments without the SDK and the contract tests
(tests/test_gcs_adapter.py) execute every verb against an in-memory
fake that reproduces the library's surface (generation numbers,
``if_generation_match`` preconditions, 412/404 error codes,
``list_blobs`` pages with ``prefixes``). A deployment passes
``google.cloud.storage.Client()``.

GCS-specific notes vs S3:

- Conditional writes use GENERATION NUMBERS, not ETags:
  ``if_generation_match=0`` is the write-once fence (only succeeds
  while the object does not exist) and ``if_generation_match=<gen>``
  is the pointer CAS. The server bumps the generation on every write,
  so the CAS is airtight against same-bytes rewrites (the S3 adapter
  needed the ETag-differs argument; here even a byte-identical racer
  bumps the generation).
- Errors are typed (``PreconditionFailed``/``NotFound`` in
  google.api_core) but the adapter narrows by the ``code`` attribute
  (412/404) so the fake needs no SDK import either.
- ``copy_blob`` is the CopyObject analogue; the promote keeps the same
  strict ordering (data → underscore metadata → ``_folds.json`` LAST).
"""

from __future__ import annotations

import json

from duckdb_streaming_patterns_spark.plans.commitio import (
    READ_ABSENT,
    PointerCasError,
)


def _code(exc) -> int:
    """HTTP status of a google-api-core-shaped error (duck-typed)."""
    c = getattr(exc, "code", None)
    if isinstance(c, int):
        return c
    try:
        return int(getattr(c, "value", 0))  # enum-shaped codes
    except (TypeError, ValueError):
        return 0


class GCSCommitIO:
    """CommitIO over an injected google-cloud-storage-surface client.
    See the module docstring and s3io's verb table."""

    def __init__(self, client, bucket_name: str, prefix: str = "") -> None:
        self.client = client
        self.bucket = client.bucket(bucket_name)
        self.prefix = prefix.strip("/")

    # -- key construction ---------------------------------------------------

    def _key(self, path: str) -> str:
        k = path.lstrip("/")
        return f"{self.prefix}/{k}" if self.prefix else k

    # -- small-JSON metadata plane -------------------------------------------

    def list_names(self, dir_path: str) -> list[str]:
        base = self._key(dir_path).rstrip("/") + "/"
        it = self.client.list_blobs(
            self.bucket, prefix=base, delimiter="/"
        )
        names = {b.name[len(base):] for b in it}
        # delimiter sub-prefixes are populated by iteration (library
        # contract: consume the iterator first, then read .prefixes)
        names |= {p[len(base):].rstrip("/") for p in it.prefixes}
        return [n for n in names if n and not n.startswith(".")]

    def read_json(self, path: str):
        blob = self.bucket.blob(self._key(path))
        try:
            return json.loads(blob.download_as_bytes())
        except Exception as e:  # noqa: BLE001 — narrowed by code
            if _code(e) == 404:
                raise FileNotFoundError(path) from e
            raise

    def try_read_json(self, path: str):
        try:
            return self.read_json(path)
        except FileNotFoundError:
            return None

    def put_json(self, path: str, obj) -> None:
        self.bucket.blob(self._key(path)).upload_from_string(
            json.dumps(obj).encode()
        )

    def put_json_if_absent(self, path: str, obj) -> bool:
        """Write-once fence: ``if_generation_match=0`` — succeeds only
        while the name is unclaimed; the loser writes nothing."""
        try:
            self.bucket.blob(self._key(path)).upload_from_string(
                json.dumps(obj).encode(), if_generation_match=0
            )
            return True
        except Exception as e:  # noqa: BLE001
            if _code(e) == 412:
                return False
            raise

    def swap_pointer(self, path: str, obj, expected=None) -> None:
        """Pointer CAS via generation match (sim-identical semantics):
        value-read ``expected`` → re-GET for (value, generation); drift
        or absence raises before any write; the upload carries
        ``if_generation_match=<generation>`` so the GET→PUT window is
        closed server-side. Absence-read → ``if_generation_match=0``."""
        key = self._key(path)
        body = json.dumps(obj).encode()
        blob = self.bucket.blob(key)
        if expected is None:
            blob.upload_from_string(body)
            return
        absent_read = isinstance(expected, dict) and expected.get(READ_ABSENT)
        if absent_read:
            try:
                blob.upload_from_string(body, if_generation_match=0)
                return
            except Exception as e:  # noqa: BLE001
                if _code(e) == 412:
                    raise PointerCasError(
                        f"swap_pointer({path}): first-install race — the "
                        "pointer was absent when read but now exists — "
                        "re-read and re-plan"
                    ) from e
                raise
        cur = self.bucket.get_blob(key)
        if cur is None:
            raise PointerCasError(
                f"swap_pointer({path}): pointer deleted since it was read "
                f"(generation match expected {expected!r}, found absence) "
                "— re-read and re-plan"
            )
        current = json.loads(cur.download_as_bytes())
        if current != expected:
            raise PointerCasError(
                f"swap_pointer({path}): pointer changed since it was read "
                f"(CAS expected {expected!r}, found {current!r}) — re-read "
                "and re-plan"
            )
        try:
            blob.upload_from_string(
                body, if_generation_match=cur.generation
            )
        except Exception as e:  # noqa: BLE001
            if _code(e) in (412, 404):
                raise PointerCasError(
                    f"swap_pointer({path}): lost the conditional upload "
                    f"race (generation {cur.generation}) — re-read and "
                    "re-plan"
                ) from e
            raise

    def delete(self, path: str) -> None:
        """DELETE — idempotent, absence is the goal (the library raises
        NotFound on a missing blob; swallow exactly that)."""
        try:
            self.bucket.blob(self._key(path)).delete()
        except Exception as e:  # noqa: BLE001
            if _code(e) != 404:
                raise

    # -- data-directory plane -------------------------------------------------

    def _iter_blobs(self, prefix_key: str):
        return list(self.client.list_blobs(self.bucket, prefix=prefix_key))

    def promote_dir(self, staged: str, final: str) -> None:
        """copy_blob each staged object to the final prefix, data →
        metadata → ``_folds.json`` STRICTLY LAST (the reader-visible
        commit point), then delete the staged prefix; a crashed prior
        attempt at the final prefix is deleted first.

        Large-object note (the GCS side of the S3 adapter's multipart
        story): promote is SAME-bucket, same storage class by
        construction, and GCS documents that such rewrites complete in
        a single ``objects.copy``/``rewrite`` call at ANY object size —
        so no token loop is needed here, unlike S3's hard 5 GiB
        CopyObject ceiling. A future cross-bucket or KMS-rekeying
        promote would need ``Blob.rewrite``'s token loop instead of
        ``copy_blob``."""
        staged_key = self._key(staged).rstrip("/") + "/"
        final_key = self._key(final).rstrip("/") + "/"
        self._delete_prefix(final_key)
        data, meta, manifest = [], [], []
        for b in self._iter_blobs(staged_key):
            rel = b.name[len(staged_key):]
            name = rel.rsplit("/", 1)[-1]
            trio = (
                manifest
                if name == "_folds.json"
                else meta if name.startswith(("_", ".")) else data
            )
            trio.append((b, final_key + rel))
        for blob, dst in data + meta + manifest:
            self.bucket.copy_blob(blob, self.bucket, dst)
        self._delete_prefix(staged_key)

    def _delete_prefix(self, prefix_key: str) -> None:
        for b in self._iter_blobs(prefix_key):
            try:
                b.delete()
            except Exception as e:  # noqa: BLE001
                if _code(e) != 404:
                    raise

    def delete_tree(self, path: str) -> None:
        self._delete_prefix(self._key(path).rstrip("/") + "/")
        self.delete(path)

    def exists(self, path: str) -> bool:
        key = self._key(path)
        if self.bucket.blob(key).exists():
            return True
        it = self.client.list_blobs(
            self.bucket, prefix=key.rstrip("/") + "/", max_results=1
        )
        return any(True for _ in it)

    def ensure_dir(self, path: str) -> None:
        """No-op: prefixes need no creation."""
