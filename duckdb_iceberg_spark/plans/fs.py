"""Filesystem abstraction under the Iceberg *metadata* layer.

Every metadata read/write (metadata.json, version-hint, avro manifest
lists/manifests, the commit CAS) goes through :func:`get_fs`, which
resolves a scheme-keyed filesystem:

- no scheme / ``file://`` — :class:`LocalFS` (the default)
- ``memory://`` — :class:`MemoryFS`, an in-process store used to test
  the full scan + write + commit-CAS cycle without a real object
  store (the reference exercises the same cycle against minio,
  test/sql/iceberg_scan_generated_data_0_01_remote.test_slow:27-37)
- anything else (``s3://``, ``gs://``, ``abfs://``, ...) — delegated
  to `fsspec <https://filesystem-spec.readthedocs.io>`_ when that
  package is installed (it is not vendored here); a clear error
  otherwise.

DATA files are read and written by Spark itself (parquet through the
JVM's Hadoop filesystems, e.g. ``s3a://``), so only driver-side
metadata I/O flows through this layer — the same split the reference
has between its catalog I/O and DuckDB's parquet readers.

Atomicity contracts each implementation must honor:

- ``create_exclusive`` fails with :class:`FileExistsError` when the
  target exists — the optimistic-concurrency token for commits.
- ``write_atomic`` never exposes a partially-written file to readers
  (write-aside + rename on POSIX; single dict assignment in memory).
"""

from __future__ import annotations

import fnmatch
import glob as _glob
import os
import threading
from typing import Optional


def scheme_of(path: str) -> str:
    """URL scheme of ``path`` ('' for plain local paths)."""
    idx = path.find("://")
    return path[:idx] if idx > 0 else ""


def is_local(path: str) -> bool:
    return scheme_of(path) in ("", "file")


class LocalFS:
    """POSIX filesystem (the default)."""

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        with open(path, "wb") as f:
            f.write(data)

    def write_atomic(self, path: str, data: bytes) -> None:
        import uuid

        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def create_exclusive(self, path: str, data: bytes) -> None:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        try:
            os.write(fd, data)
        finally:
            os.close(fd)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def glob(self, pattern: str) -> list[str]:
        return _glob.glob(pattern)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        os.remove(path)


class MemoryFS:
    """In-process filesystem for ``memory://`` paths.

    One global store per process (class-level), mirroring how an
    object store is one namespace per endpoint. Thread-safe: the
    commit CAS (``create_exclusive``) takes a lock so two concurrent
    committers race exactly like two O_EXCL creates.
    """

    _store: dict[str, bytes] = {}
    _lock = threading.Lock()

    def read_bytes(self, path: str) -> bytes:
        try:
            return self._store[path]
        except KeyError:
            raise FileNotFoundError(path) from None

    def write_bytes(self, path: str, data: bytes) -> None:
        self._store[path] = data

    # dict assignment is atomic under the GIL — readers never see a
    # partial file, which is all write_atomic promises
    write_atomic = write_bytes

    def create_exclusive(self, path: str, data: bytes) -> None:
        with self._lock:
            if path in self._store:
                raise FileExistsError(path)
            self._store[path] = data

    def exists(self, path: str) -> bool:
        return self.isfile(path) or self.isdir(path)

    def isfile(self, path: str) -> bool:
        return path in self._store

    def isdir(self, path: str) -> bool:
        prefix = path.rstrip("/") + "/"
        return any(k.startswith(prefix) for k in self._store)

    def glob(self, pattern: str) -> list[str]:
        return sorted(k for k in self._store if fnmatch.fnmatch(k, pattern))

    def makedirs(self, path: str) -> None:
        pass  # directories are implicit (object-store semantics)

    def remove(self, path: str) -> None:
        try:
            del self._store[path]
        except KeyError:
            raise FileNotFoundError(path) from None

    @classmethod
    def clear(cls) -> None:
        """Test helper: drop every memory:// object."""
        with cls._lock:
            cls._store.clear()


class FsspecFS:
    """Adapter over an ``fsspec`` filesystem (s3://, gs://, ...)."""

    def __init__(self, fs):
        self._fs = fs

    def read_bytes(self, path: str) -> bytes:
        with self._fs.open(path, "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        with self._fs.open(path, "wb") as f:
            f.write(data)

    # object stores publish a key in one PUT — already atomic
    write_atomic = write_bytes

    def create_exclusive(self, path: str, data: bytes) -> None:
        # object stores have no O_EXCL; exists-then-put is the common
        # hadoop-catalog approximation (real deployments use a catalog
        # with a proper CAS — see sources/rest_catalog.py)
        if self._fs.exists(path):
            raise FileExistsError(path)
        self.write_bytes(path, data)

    def exists(self, path: str) -> bool:
        return self._fs.exists(path)

    def isfile(self, path: str) -> bool:
        return self._fs.isfile(path)

    def isdir(self, path: str) -> bool:
        return self._fs.isdir(path)

    def glob(self, pattern: str) -> list[str]:
        scheme = scheme_of(pattern)
        out = self._fs.glob(pattern)
        # fsspec strips the scheme from glob results; restore it
        return [p if scheme_of(p) else f"{scheme}://{p.lstrip('/')}" for p in out]

    def makedirs(self, path: str) -> None:
        self._fs.makedirs(path, exist_ok=True)

    def remove(self, path: str) -> None:
        self._fs.rm(path)


_local = LocalFS()
_memory = MemoryFS()


def get_fs(path: str):
    """Filesystem for ``path``, keyed by URL scheme (see module doc)."""
    scheme = scheme_of(path)
    if scheme in ("", "file"):
        return _local
    if scheme == "memory":
        return _memory
    try:
        import fsspec
    except ImportError:
        raise ValueError(
            f"No filesystem available for scheme {scheme!r} (path {path!r}): "
            f"install fsspec (plus its {scheme} backend) to enable remote "
            f"metadata I/O"
        ) from None
    return FsspecFS(fsspec.filesystem(scheme))


def abspath(path: str) -> str:
    """os.path.abspath for local paths; URLs pass through unchanged."""
    return path if scheme_of(path) else os.path.abspath(path)
