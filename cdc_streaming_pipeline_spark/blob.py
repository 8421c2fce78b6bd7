"""Pluggable blob storage for the engine's METADATA objects — the
object-store seam.

The txlog engine touches storage in two distinct ways:

1. **Data files** (parquet) and the distributed sidecar scan
   (`binaryFile` in ``_dv_pairs_df``) go through SPARK's filesystem
   layer — already object-store capable (s3a://, gs://, abfss://) with
   no engine change.
2. **Metadata objects** — deletion-vector sidecars, bloom sidecars,
   log entries, checkpoints, the change-feed cursor — are small whole
   objects the engine reads and writes itself. THIS module owns that
   traffic: every such byte moves through a ``BlobStore``, whose API
   is deliberately restricted to object-store primitives:

   - ``put(path, data)`` — whole-object atomic create/overwrite (S3
     PUT: readers see the old object or the new one, never a prefix);
   - ``put_if_absent(path, data) -> bool`` — conditional create (S3
     ``If-None-Match: *``, GCS ``x-goog-if-generation-match: 0``, ABFS
     ETag create) — the commit primitive ``TxLogTable`` already
     accepts via ``commit_backend``;
   - ``get(path) -> bytes`` — whole-object read, raises
     ``FileNotFoundError`` when absent;
   - ``exists`` / ``list(dir)`` / ``mtime`` / ``delete`` — the probes
     vacuum and log replay need.

   No rename, no append, no partial read, no directory semantics — if
   the engine compiles against this interface, it runs against a real
   object store by swapping one class.

``PosixBlobStore`` is the default (local filesystem, tmp+replace for
atomicity — the sandbox deployment). ``MappedBlobStore`` relocates
every object under a different root while the engine keeps addressing
LOGICAL paths: pointing a table at it proves no code path bypasses the
seam, because a direct ``open()`` of a logical metadata path finds
nothing and fails LOUDLY (tests/test_txlog_blob_backend.py runs the
full table lifecycle that way)."""

from __future__ import annotations

import os
import uuid
from glob import glob


class PosixBlobStore:
    """Local-filesystem backend. Stateless and picklable — instances
    ship inside executor closures (sidecar composition writes from
    executor tasks). Atomicity via sibling-tmp + rename, an
    implementation detail BEHIND the whole-object contract."""

    # -- writes -----------------------------------------------------------
    def put(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{uuid.uuid4().hex[:12]}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def put_text(self, path: str, text: str) -> None:
        self.put(path, text.encode("utf-8"))

    def put_if_absent(self, path: str, text: str) -> bool:
        """Conditional create WITH full content: tmp + link(2), which
        fails EEXIST on a lost race and otherwise publishes the fully
        written object atomically (see posix_put_if_absent's rationale
        in sources/txlog.py — O_EXCL-then-write would make the create
        the commit point but not the content)."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{uuid.uuid4().hex[:12]}.tmp"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    # -- reads ------------------------------------------------------------
    def get(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def get_text(self, path: str) -> str:
        return self.get(path).decode("utf-8")

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list(self, directory: str, pattern: str = "*") -> list[str]:
        """Non-recursive listing of one logical 'directory' (an object
        prefix). Returns LOGICAL paths."""
        return sorted(glob(os.path.join(directory, pattern)))

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def delete(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass  # object-store deletes are idempotent


class MappedBlobStore(PosixBlobStore):
    """Conformance backend: stores every object under ``store_root``
    while the engine addresses logical paths under ``logical_root`` —
    the two namespaces share NOTHING, so an engine code path that
    bypasses the seam (direct ``open()``/``glob`` of a logical
    metadata path) finds no object and fails loudly instead of
    silently working because both happened to be the same local disk.
    Picklable (two strings), so executor-side sidecar composition
    exercises the seam too."""

    def __init__(self, logical_root: str, store_root: str):
        self.logical_root = os.path.abspath(logical_root)
        self.store_root = os.path.abspath(store_root)

    def _map(self, path: str) -> str:
        ap = os.path.abspath(path)
        if ap == self.logical_root or ap.startswith(self.logical_root + os.sep):
            return self.store_root + ap[len(self.logical_root):]
        return ap  # outside the mapped namespace: passthrough

    def _unmap(self, path: str) -> str:
        ap = os.path.abspath(path)
        if ap == self.store_root or ap.startswith(self.store_root + os.sep):
            return self.logical_root + ap[len(self.store_root):]
        return ap

    def put(self, path: str, data: bytes) -> None:
        super().put(self._map(path), data)

    def put_if_absent(self, path: str, text: str) -> bool:
        return super().put_if_absent(self._map(path), text)

    def get(self, path: str) -> bytes:
        return super().get(self._map(path))

    def exists(self, path: str) -> bool:
        return super().exists(self._map(path))

    def list(self, directory: str, pattern: str = "*") -> list[str]:
        return [self._unmap(p) for p in super().list(self._map(directory), pattern)]

    def mtime(self, path: str) -> float:
        return super().mtime(self._map(path))

    def delete(self, path: str) -> None:
        super().delete(self._map(path))


#: module default — tables without an injected backend use this.
DEFAULT_BLOB = PosixBlobStore()
