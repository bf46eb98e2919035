"""Filesystem abstraction under the Iceberg *metadata* layer.

Every metadata read/write (metadata.json, version-hint, avro manifest
lists/manifests, the commit CAS) goes through :func:`get_fs`, which
resolves a scheme-keyed filesystem:

- no scheme / ``file://`` — :class:`LocalFS` (the default)
- ``memory://`` — :class:`MemoryFS`, an in-process store used to test
  the full scan + write + commit-CAS cycle without a real object
  store (the reference exercises the same cycle against minio,
  test/sql/iceberg_scan_generated_data_0_01_remote.test_slow:27-37)
- ``s3://`` / ``s3a://`` — :class:`S3FS`, boto3-backed with a true
  conditional-PUT commit CAS (tested against moto's S3
  implementation in ``tests/test_fs_s3.py``)
- anything else (``gs://``, ``abfs://``, ...) — delegated to
  `fsspec <https://filesystem-spec.readthedocs.io>`_ when that
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

import glob as _glob
import os
import re as _re
import threading
from typing import Optional


def _glob_match(pattern: str, key: str) -> bool:
    """Separator-aware glob match: ``*`` and ``?`` never cross ``/``
    (mirroring :mod:`glob` semantics on LocalFS), unlike
    :func:`fnmatch.fnmatch` — so ``t/metadata/v*.metadata.json`` does
    NOT match keys in deeper subdirectories."""
    out, i = [], 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "*":
            out.append("[^/]*")
        elif ch == "?":
            out.append("[^/]")
        elif ch == "[":
            j = pattern.find("]", i + 1)
            if j == -1:
                out.append(_re.escape(ch))
            else:
                out.append(pattern[i : j + 1])
                i = j
        else:
            out.append(_re.escape(ch))
        i += 1
    return _re.match("".join(out) + r"\Z", key) is not None


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
        return sorted(k for k in self._store if _glob_match(pattern, k))

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


class S3FS:
    """``s3://`` / ``s3a://`` metadata I/O via boto3 (no fsspec
    needed — boto3 is the one object-store SDK assumed present).

    ``create_exclusive`` is a TRUE compare-and-swap: S3 conditional
    writes (``If-None-Match: *``) fail the PUT with 412 when the key
    already exists, so two racing committers serialize exactly like
    two O_EXCL creates — no exists-then-put window. The reference
    exercises the same store through httpfs + minio
    (test/sql/iceberg_scan_generated_data_0_01_remote.test_slow:5-13,
    scripts/upload_iceberg_to_s3_test_server.sh); here the metadata
    layer owns the S3 round-trips and Spark's Hadoop s3a:// connector
    owns the data files.
    """

    def __init__(self, client=None):
        if client is None:
            import boto3

            client = boto3.client(
                "s3",
                region_name=os.environ.get("AWS_DEFAULT_REGION", "us-east-1"),
                endpoint_url=os.environ.get("AWS_ENDPOINT_URL_S3")
                or os.environ.get("AWS_ENDPOINT_URL")
                or None,
            )
        self._s3 = client

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        rest = path.split("://", 1)[1]
        bucket, _, key = rest.partition("/")
        return bucket, key

    def _not_found(self, err) -> bool:
        code = err.response.get("Error", {}).get("Code", "")
        return code in ("NoSuchKey", "404", "NotFound")

    def read_bytes(self, path: str) -> bytes:
        from botocore.exceptions import ClientError

        bucket, key = self._split(path)
        try:
            return self._s3.get_object(Bucket=bucket, Key=key)["Body"].read()
        except ClientError as e:
            if self._not_found(e):
                raise FileNotFoundError(path) from None
            raise

    def write_bytes(self, path: str, data: bytes) -> None:
        bucket, key = self._split(path)
        self._s3.put_object(Bucket=bucket, Key=key, Body=data)

    # a single PUT publishes the key atomically — readers never see a
    # partial object
    write_atomic = write_bytes

    def create_exclusive(self, path: str, data: bytes) -> None:
        from botocore.exceptions import ClientError

        bucket, key = self._split(path)
        try:
            self._s3.put_object(Bucket=bucket, Key=key, Body=data, IfNoneMatch="*")
        except ClientError as e:
            code = e.response.get("Error", {}).get("Code", "")
            status = e.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
            if code == "PreconditionFailed" or status in (412, 409):
                raise FileExistsError(path) from None
            raise

    def exists(self, path: str) -> bool:
        return self.isfile(path) or self.isdir(path)

    def isfile(self, path: str) -> bool:
        from botocore.exceptions import ClientError

        bucket, key = self._split(path)
        try:
            self._s3.head_object(Bucket=bucket, Key=key)
            return True
        except ClientError as e:
            if self._not_found(e):
                return False
            raise

    def isdir(self, path: str) -> bool:
        bucket, key = self._split(path)
        prefix = key.rstrip("/") + "/"
        resp = self._s3.list_objects_v2(Bucket=bucket, Prefix=prefix, MaxKeys=1)
        return resp.get("KeyCount", 0) > 0

    def glob(self, pattern: str) -> list[str]:
        scheme = scheme_of(pattern)
        bucket, key = self._split(pattern)
        # list from the longest wildcard-free prefix, match client-side
        cut = len(key)
        for ch in "*?[":
            idx = key.find(ch)
            if idx != -1:
                cut = min(cut, idx)
        prefix = key[:cut]
        out = []
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
            for obj in page.get("Contents", []):
                if _glob_match(key, obj["Key"]):
                    out.append(f"{scheme}://{bucket}/{obj['Key']}")
        return sorted(out)

    def makedirs(self, path: str) -> None:
        pass  # object-store directories are implicit

    def remove(self, path: str) -> None:
        if not self.isfile(path):
            raise FileNotFoundError(path)
        bucket, key = self._split(path)
        self._s3.delete_object(Bucket=bucket, Key=key)


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
_s3: Optional[S3FS] = None


def reset_s3() -> None:
    """Drop the cached S3 client (tests recreate it inside a mock)."""
    global _s3
    _s3 = None


def get_fs(path: str):
    """Filesystem for ``path``, keyed by URL scheme (see module doc)."""
    global _s3
    scheme = scheme_of(path)
    if scheme in ("", "file"):
        return _local
    if scheme == "memory":
        return _memory
    if scheme in ("s3", "s3a"):
        if _s3 is None:
            _s3 = S3FS()
        return _s3
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


def s3_env_conf() -> dict:
    """Driver-side snapshot of the S3 connection env (endpoint,
    region, credentials), to ship to executors inside plan objects.
    Python workers inherit the executor JVM's environment, which was
    frozen when the session started — plan-time capture is the only
    reliable propagation for settings made later in the driver."""
    return {
        "endpoint": os.environ.get("AWS_ENDPOINT_URL_S3") or os.environ.get("AWS_ENDPOINT_URL"),
        "region": os.environ.get("AWS_DEFAULT_REGION", "us-east-1"),
        "access_key": os.environ.get("AWS_ACCESS_KEY_ID"),
        "secret_key": os.environ.get("AWS_SECRET_ACCESS_KEY"),
        "session_token": os.environ.get("AWS_SESSION_TOKEN"),
    }


def arrow_fs_path(path: str, conf: Optional[dict] = None):
    """``(pyarrow filesystem | None, path-for-pyarrow)`` for reading a
    DATA file with pyarrow: local paths pass through (``None`` fs);
    ``s3://``/``s3a://`` resolve to pyarrow's native S3 client, so the
    streaming source's executor-side reads and ``add_files``' footer
    reads work against object stores without Spark's s3a connector.
    """
    scheme = scheme_of(path)
    if scheme in ("", "file"):
        return None, path
    if scheme in ("s3", "s3a"):
        from pyarrow import fs as pafs

        c = conf or s3_env_conf()
        kw = {}
        endpoint = c.get("endpoint")
        if endpoint:
            for proto in ("http", "https"):
                if endpoint.startswith(f"{proto}://"):
                    kw = {"endpoint_override": endpoint[len(proto) + 3 :], "scheme": proto}
                    break
            else:
                kw = {"endpoint_override": endpoint}
        s3 = pafs.S3FileSystem(
            region=c.get("region") or "us-east-1",
            access_key=c.get("access_key") or None,
            secret_key=c.get("secret_key") or None,
            session_token=c.get("session_token") or None,
            **kw,
        )
        return s3, path.split("://", 1)[1]
    raise ValueError(f"No pyarrow filesystem for scheme {scheme!r} (path {path!r})")


def read_range(path: str, off: int, size: int, conf: Optional[dict] = None) -> bytes:
    """Ranged byte read usable on EXECUTORS (deletion-vector Puffin
    blobs decode task-side): local paths via seek+read, ``s3://`` /
    ``s3a://`` via pyarrow's native S3 client with ``conf`` the
    :func:`s3_env_conf` snapshot captured at PLAN time on the driver
    (Python workers inherit the executor JVM's frozen env, so env
    alone does not propagate endpoints set later), anything else via
    :func:`get_fs` (driver-process schemes like ``memory://``)."""
    scheme = scheme_of(path)
    if scheme in ("", "file"):
        local = path.split("://", 1)[1] if scheme else path
        with open(local, "rb") as fh:
            fh.seek(off)
            return fh.read(size)
    if scheme in ("s3", "s3a"):
        afs, p = arrow_fs_path(path, conf)
        with afs.open_input_file(p) as fh:
            fh.seek(off)
            return fh.read(size)
    return get_fs(path).read_bytes(path)[off : off + size]
