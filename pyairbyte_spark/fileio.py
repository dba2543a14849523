"""FileIO: the storage seam under the commit-log table store.

:class:`~pyairbyte_spark.writers.CommitLogTableStore` does three kinds
of I/O. Bulk DATA moves through Spark's own readers/writers and works
on any Hadoop-supported filesystem already. Everything else is
driver-side METADATA — manifest JSON, commit publication, listings,
parquet-footer harvest, vacuum deletes — and previously went straight
to ``os.*``, which pinned the store to a local filesystem. A 100-TB
table lives on HDFS/S3/DBFS, where there are no hard links and no
POSIX ``listdir``; this module abstracts exactly those operations:

- :class:`LocalFileIO` — the original semantics (commit publication is
  a create-exclusive hard link of a fully-written temp file).
- :class:`HadoopFileIO` — the same protocol through the JVM's
  ``org.apache.hadoop.fs.FileSystem`` (the pattern
  ``destinations/base.py:52-92`` already uses for epoch markers):
  commit = write temp + contract-compliant ``rename`` that refuses an
  existing destination. Atomic on HDFS; object stores with atomic
  conditional-PUT should implement :meth:`FileIO.put_if_absent`
  directly instead.
- :class:`S3FileIO` — the real object-store deployment path: boto3
  against the S3 API, commit publication via native conditional PUT
  (``If-None-Match: *``), footer harvest via ranged GETs. Exercised
  against an in-process S3 implementation in ``tests/test_s3_fileio.py``.
- :class:`FakeObjectStoreFileIO` — a test double with object-store
  semantics ONLY: atomic conditional PUT, overwrite PUT, list, delete.
  Any rename or link attempt raises, proving the store's protocol
  never depends on them (it backs the full 3-backend store suite,
  where Spark data writes need a shared local FS).

The reference (airbytehq/PyAirbyte) has no analogue — it delegates
storage atomicity to the destination warehouse (``shared/
sql_processor.py`` finalize path); building on raw parquet, the
atomicity protocol and therefore this seam live here.

Only SMALL files flow through FileIO (manifests, sidecars; KB-scale):
``read_text``/``write_text`` buffer whole payloads by design. The one
big-file consumer is the parquet-footer harvest, which gets a lazy
seekable reader via :meth:`FileIO.open_input`.
"""

from __future__ import annotations

import contextlib
import io as _io
import os
import shutil
import tempfile
import threading
from typing import BinaryIO


class FileIO:
    """Driver-side metadata I/O. All paths are absolute strings in the
    implementation's namespace (POSIX paths locally, URIs for Hadoop).
    Directory-ness is emulated on stores that lack directories."""

    scheme = "abstract"

    def join(self, *parts: str) -> str:
        return "/".join(p.rstrip("/") for p in parts if p)

    # -- small-file ops ----------------------------------------------------

    def read_text(self, path: str) -> str:
        """Full contents; raises FileNotFoundError if absent."""
        raise NotImplementedError

    def write_text(self, path: str, data: str) -> None:
        """Atomic PUT (readers see old or new content, never partial);
        overwrites an existing file."""
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        """Full binary contents; FileNotFoundError if absent."""
        with self.open_input(path) as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        """Atomic binary PUT (for manifest checkpoint sidecars)."""
        raise NotImplementedError

    def put_if_absent(self, path: str, data: str) -> bool:
        """Atomic create-exclusive PUT with full content: the file
        appears with ALL its bytes or not at all, and exactly one of
        any number of concurrent callers wins. Returns False if the
        path already exists. This is the store's commit primitive."""
        raise NotImplementedError

    # -- namespace ops -----------------------------------------------------

    def list_names(self, path: str) -> list[str]:
        """Immediate child names of a directory ([] if absent)."""
        raise NotImplementedError

    def list_files(self, path: str) -> list[tuple[str, int]]:
        """All files under ``path`` recursively as ``(relative_path,
        size_bytes)``, '/'-separated rel paths, sorted. [] if absent."""
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        """Ensure a directory exists (no-op where dirs are virtual)."""
        raise NotImplementedError

    def delete_file(self, path: str) -> None:
        """Delete one file; missing is a no-op."""
        raise NotImplementedError

    def delete_dir(self, path: str) -> None:
        """Recursive delete; missing is a no-op."""
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Atomically move ``src`` over ``dst`` (clobbers). Only the
        rename-swap parquet store needs this; object-store backends
        may refuse."""
        raise NotImplementedError

    # -- bulk reads --------------------------------------------------------

    def open_input(self, path: str) -> BinaryIO:
        """Seekable binary reader (for parquet footer harvest)."""
        raise NotImplementedError

    def file_size(self, path: str) -> int:
        """Size in bytes of one file; FileNotFoundError if absent.
        Gates the distributed-manifest path (a checkpoint sidecar
        above the threshold is scanned with Spark, not materialized
        into driver Python)."""
        raise NotImplementedError

    def spark_read_path(self, path: str) -> str | None:
        """A path/URI for the SAME file that Spark executors can read
        (enables distributed checkpoint-sidecar scans), or ``None``
        when the backend's namespace is driver-only — callers must
        then fall back to driver-side resolution via
        :meth:`read_bytes`."""
        return None


class LocalFileIO(FileIO):
    """POSIX-filesystem implementation — byte-for-byte the store's
    original ``os.*`` behavior, including hard-link commit publication
    (create-exclusive, content fully durable before the name exists)."""

    scheme = "file"

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, data: str) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def write_bytes(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: str) -> bool:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(data)
        try:
            os.link(tmp, path)  # atomic; fails if the target exists
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def list_names(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except OSError:
            return []

    def list_files(self, path: str) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for dirpath, _, names in os.walk(path):
            for fn in names:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, path).replace(os.sep, "/")
                try:
                    out.append((rel, os.path.getsize(full)))
                except OSError:
                    continue  # vanished mid-walk (concurrent vacuum)
        return sorted(out)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def delete_file(self, path: str) -> None:
        with contextlib.suppress(OSError):
            os.remove(path)

    def delete_dir(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def open_input(self, path: str) -> BinaryIO:
        return open(path, "rb")

    def file_size(self, path: str) -> int:
        try:
            return os.path.getsize(path)
        except OSError as e:
            raise FileNotFoundError(path) from e

    def spark_read_path(self, path: str) -> str | None:
        return path  # local[*]: executors share the driver's FS


class FakeObjectStoreFileIO(FileIO):
    """Object-store-semantics test double backed by a local directory.

    Exposes ONLY what S3-class stores provide: atomic conditional PUT
    (``put_if_absent`` — S3 ``If-None-Match:*``/GCS ``ifGeneration
    Match=0``), overwrite PUT, GET, LIST, DELETE. ``rename`` raises:
    running the full commit-log suite against this proves the store's
    protocol needs neither hard links nor rename. Spark still
    writes/reads the parquet DATA under the same root (an object
    store is a filesystem to Spark's committers); the double guards
    the store's own metadata protocol, which is the part that was
    os.*-bound.

    In-process writer races are made atomic with a lock — standing in
    for the store service's server-side conditional-write atomicity.
    """

    scheme = "fake-object-store"
    _lock = threading.Lock()

    def __init__(self) -> None:
        self.rename_calls = 0

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, data: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".put")
        with os.fdopen(fd, "w") as f:
            f.write(data)
        os.replace(tmp, path)  # emulates the PUT's server-side atomicity

    def write_bytes(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".put")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def put_if_absent(self, path: str, data: str) -> bool:
        with self._lock:  # server-side conditional-write atomicity
            if os.path.exists(path):
                return False
            self.write_text(path, data)
            return True

    def list_names(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except OSError:
            return []

    def list_files(self, path: str) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for dirpath, _, names in os.walk(path):
            for fn in names:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, path).replace(os.sep, "/")
                try:
                    out.append((rel, os.path.getsize(full)))
                except OSError:
                    continue
        return sorted(out)

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)  # virtual on a real store

    def delete_file(self, path: str) -> None:
        with contextlib.suppress(OSError):
            os.remove(path)

    def delete_dir(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def rename(self, src: str, dst: str) -> None:
        self.rename_calls += 1
        raise NotImplementedError(
            "object stores cannot rename; the commit-log protocol must "
            "not require it"
        )

    def open_input(self, path: str) -> BinaryIO:
        return open(path, "rb")

    def file_size(self, path: str) -> int:
        try:
            return os.path.getsize(path)
        except OSError as e:
            raise FileNotFoundError(path) from e

    def spark_read_path(self, path: str) -> str | None:
        # A real object store is a filesystem to Spark (s3a://…); the
        # double's namespace is the local FS, equally Spark-readable.
        return path


class S3FileIO(FileIO):
    """Real object-store FileIO over the S3 API (boto3): the
    deployment backend :class:`FakeObjectStoreFileIO` doubles for.

    Commit publication is an atomic server-side conditional PUT —
    ``PutObject`` with ``If-None-Match: *`` (S3 native since 2024;
    also the semantics of GCS ``ifGenerationMatch=0`` and Azure
    ``If-None-Match: *``): the object appears with ALL its bytes or
    not at all, and of any number of concurrent writers exactly one
    wins — no LIST-after-write races, no rename anywhere. Overwrite
    PUTs (``write_text``/``write_bytes`` — the latest-version pointer,
    vacuum's checkpoint rewrite) are atomic per S3's read-after-write
    model: readers see the old object or the new one, never partial.
    Parquet footer harvest reads via ranged GETs
    (:class:`_S3InputFile`), so staging a 1 GB data file costs two
    small range requests, not a download.

    Paths are ``s3://bucket/key`` URIs. Spark reads the DATA under
    the same bucket through s3a as usual; pass
    ``spark_scheme="s3a"`` so distributed manifest scans hand the
    sidecar straight to Spark (leave None where executors cannot
    reach the endpoint — tests against an in-process mock — and the
    driver-side resolution path is used instead).
    """

    scheme = "s3"

    def __init__(self, client=None, *, spark_scheme: str | None = None) -> None:
        if client is None:
            import boto3

            client = boto3.client("s3")
        self._c = client
        self._spark_scheme = spark_scheme

    @staticmethod
    def _bk(path: str) -> tuple[str, str]:
        rest = path.split("://", 1)[1]
        bucket, _, key = rest.partition("/")
        return bucket, key.strip("/")

    def _client_error_code(self, e) -> str:
        return getattr(e, "response", {}).get("Error", {}).get("Code", "")

    def read_bytes(self, path: str) -> bytes:
        b, k = self._bk(path)
        try:
            return self._c.get_object(Bucket=b, Key=k)["Body"].read()
        except self._c.exceptions.NoSuchKey:
            raise FileNotFoundError(path) from None

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def write_bytes(self, path: str, data: bytes) -> None:
        b, k = self._bk(path)
        self._c.put_object(Bucket=b, Key=k, Body=data)

    def write_text(self, path: str, data: str) -> None:
        self.write_bytes(path, data.encode("utf-8"))

    def put_if_absent(self, path: str, data: str) -> bool:
        from botocore.exceptions import ClientError

        b, k = self._bk(path)
        body = data.encode("utf-8")
        while True:
            try:
                self._c.put_object(Bucket=b, Key=k, Body=body, IfNoneMatch="*")
                return True
            except ClientError as e:
                code = self._client_error_code(e)
                if code == "PreconditionFailed":
                    return False  # someone else holds the version
                if code in ("ConditionalRequestConflict", "409"):
                    # concurrent conditional writes collided server-side;
                    # S3 docs: re-check and retry
                    if self.exists(path):
                        return False
                    continue
                raise

    def list_names(self, path: str) -> list[str]:
        b, k = self._bk(path)
        prefix = f"{k}/" if k else ""
        names: set[str] = set()
        paginator = self._c.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=b, Prefix=prefix, Delimiter="/"):
            for cp in page.get("CommonPrefixes") or []:
                names.add(cp["Prefix"][len(prefix):].rstrip("/"))
            for obj in page.get("Contents") or []:
                rel = obj["Key"][len(prefix):]
                if rel:
                    names.add(rel)
        return sorted(names)

    def list_files(self, path: str) -> list[tuple[str, int]]:
        b, k = self._bk(path)
        prefix = f"{k}/" if k else ""
        out: list[tuple[str, int]] = []
        paginator = self._c.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=b, Prefix=prefix):
            for obj in page.get("Contents") or []:
                rel = obj["Key"][len(prefix):]
                if rel:
                    out.append((rel, int(obj["Size"])))
        return sorted(out)

    def is_dir(self, path: str) -> bool:
        b, k = self._bk(path)
        prefix = f"{k}/" if k else ""
        resp = self._c.list_objects_v2(Bucket=b, Prefix=prefix, MaxKeys=1)
        return bool(resp.get("KeyCount"))

    def exists(self, path: str) -> bool:
        from botocore.exceptions import ClientError

        b, k = self._bk(path)
        try:
            self._c.head_object(Bucket=b, Key=k)
            return True
        except ClientError:
            return self.is_dir(path)

    def makedirs(self, path: str) -> None:
        pass  # directories are virtual

    def delete_file(self, path: str) -> None:
        b, k = self._bk(path)
        self._c.delete_object(Bucket=b, Key=k)  # idempotent

    def delete_dir(self, path: str) -> None:
        b, k = self._bk(path)
        prefix = f"{k}/" if k else ""
        paginator = self._c.get_paginator("list_objects_v2")
        batch: list[dict] = []
        for page in paginator.paginate(Bucket=b, Prefix=prefix):
            for obj in page.get("Contents") or []:
                batch.append({"Key": obj["Key"]})
                if len(batch) == 1000:
                    self._c.delete_objects(Bucket=b, Delete={"Objects": batch})
                    batch = []
        if batch:
            self._c.delete_objects(Bucket=b, Delete={"Objects": batch})

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError(
            "object stores cannot rename; the commit-log protocol must "
            "not require it"
        )

    def file_size(self, path: str) -> int:
        from botocore.exceptions import ClientError

        b, k = self._bk(path)
        try:
            return int(self._c.head_object(Bucket=b, Key=k)["ContentLength"])
        except ClientError:
            raise FileNotFoundError(path) from None

    def open_input(self, path: str) -> BinaryIO:
        return _S3InputFile(self, path, self.file_size(path))

    def spark_read_path(self, path: str) -> str | None:
        if self._spark_scheme is None:
            return None
        b, k = self._bk(path)
        return f"{self._spark_scheme}://{b}/{k}"


class _S3InputFile(_io.RawIOBase):
    """Seekable read-only file over S3 ranged GETs — enough for
    pyarrow's parquet footer reads (a handful of seek+read calls,
    each one bounded range request; the data body is never fetched
    whole)."""

    def __init__(self, fio: S3FileIO, path: str, size: int) -> None:
        self._fio = fio
        self._bucket, self._key = fio._bk(path)
        self._size = size
        self._pos = 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        self._pos = max(0, min(self._pos, self._size))
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        resp = self._fio._c.get_object(
            Bucket=self._bucket,
            Key=self._key,
            Range=f"bytes={self._pos}-{self._pos + n - 1}",
        )
        data = resp["Body"].read()
        self._pos += len(data)
        return data


class HadoopFileIO(FileIO):
    """Metadata I/O through the JVM ``org.apache.hadoop.fs.FileSystem``
    bound to ``root_uri``'s scheme — the store's cluster deployment
    path (HDFS, DBFS, or any FS with Hadoop bindings), extending the
    epoch-marker pattern of ``destinations/base.py:52-92`` to the whole
    commit protocol.

    Commit publication (:meth:`put_if_absent`) = write a temp file,
    then ``FileSystem.rename(temp, target)`` after an existence check;
    the FileSystem contract returns False when the destination exists.
    On HDFS the rename is an atomic namespace op, giving the same
    exactly-one-winner + full-content guarantee as the local hard
    link. On S3A, rename is copy+delete — deploy there with
    :class:`S3FileIO` (native conditional PUT) instead.
    """

    scheme = "hadoop"

    def __init__(self, spark, root_uri: str) -> None:
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        self._jconf = spark._jsc.hadoopConfiguration()
        self._fs = self._jvm.org.apache.hadoop.fs.Path(root_uri).getFileSystem(
            self._jconf
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def read_text(self, path: str) -> str:
        hp = self._p(path)
        if not self._fs.exists(hp):
            raise FileNotFoundError(path)
        stream = self._fs.open(hp)
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 65536, False
            )
            return bytes(baos.toByteArray()).decode("utf-8")
        finally:
            stream.close()

    def _write_bytes(self, path: str, data: bytes, overwrite: bool) -> None:
        out = self._fs.create(self._p(path), overwrite)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def write_text(self, path: str, data: str) -> None:
        self.write_bytes(path, data.encode("utf-8"))

    def write_bytes(self, path: str, data: bytes) -> None:
        # temp + atomic clobbering rename: a concurrent reader sees
        # OLD content or NEW content, never partial and never absent.
        # ``FileContext.rename(…, Options.Rename.OVERWRITE)`` is a
        # single namespace op on HDFS; the previous delete-then-rename
        # left a window where the path did not exist at all — vacuum
        # rewrites the oldest kept commit JSON in place through this
        # method, and a reader resolving that version mid-window got a
        # spurious "no commit version … vacuumed".
        import uuid as _uuid

        tmp = f"{path}.{_uuid.uuid4().hex[:8]}.tmp"
        self._write_bytes(tmp, data, True)
        target = self._p(path)
        try:
            opts = self._jvm.org.apache.hadoop.fs.Options
            overwrite = opts.Rename.OVERWRITE
            arr = self._gw.new_array(opts.Rename, 1)
            arr[0] = overwrite
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                self._fs.getUri(), self._jconf
            )
            fc.rename(self._p(tmp), target, arr)
        except Exception:
            # FS without FileContext bindings: fall back to the
            # non-atomic swap (documented old-or-new weakening).
            if self._fs.exists(target):
                self._fs.delete(target, False)
            if not self._fs.rename(self._p(tmp), target):
                raise OSError(f"could not publish {path}") from None

    def put_if_absent(self, path: str, data: str) -> bool:
        target = self._p(path)
        if self._fs.exists(target):
            return False
        # Unique temp name: two racing writers must not clobber each
        # other's temp before the rename decides the winner.
        import uuid

        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        self._write_bytes(tmp, data.encode("utf-8"), False)
        try:
            # FileSystem contract: rename fails when dst exists (HDFS
            # enforces atomically in the namenode).
            return bool(self._fs.rename(self._p(tmp), target))
        finally:
            with contextlib.suppress(Exception):
                self._fs.delete(self._p(tmp), False)

    def list_names(self, path: str) -> list[str]:
        hp = self._p(path)
        if not self._fs.exists(hp):
            return []
        return sorted(
            st.getPath().getName() for st in self._fs.listStatus(hp)
        )

    def list_files(self, path: str) -> list[tuple[str, int]]:
        hp = self._p(path)
        if not self._fs.exists(hp):
            return []
        base = self._fs.getFileStatus(hp).getPath().toUri().getPath()
        it = self._fs.listFiles(hp, True)
        out: list[tuple[str, int]] = []
        while it.hasNext():
            st = it.next()
            full = st.getPath().toUri().getPath()
            rel = full[len(base) :].lstrip("/")
            out.append((rel, int(st.getLen())))
        return sorted(out)

    def is_dir(self, path: str) -> bool:
        hp = self._p(path)
        return self._fs.exists(hp) and self._fs.getFileStatus(hp).isDirectory()

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete_file(self, path: str) -> None:
        with contextlib.suppress(Exception):
            self._fs.delete(self._p(path), False)

    def delete_dir(self, path: str) -> None:
        with contextlib.suppress(Exception):
            self._fs.delete(self._p(path), True)

    def rename(self, src: str, dst: str) -> None:
        dp = self._p(dst)
        if self._fs.exists(dp):
            self._fs.delete(dp, True)
        if not self._fs.rename(self._p(src), dp):
            raise OSError(f"rename {src} -> {dst} failed")

    def open_input(self, path: str) -> BinaryIO:
        size = int(self._fs.getFileStatus(self._p(path)).getLen())
        return _HadoopInputFile(self, path, size)

    def file_size(self, path: str) -> int:
        hp = self._p(path)
        if not self._fs.exists(hp):
            raise FileNotFoundError(path)
        return int(self._fs.getFileStatus(hp).getLen())

    def spark_read_path(self, path: str) -> str | None:
        # Paths in this namespace are Hadoop URIs — the same namespace
        # Spark's readers resolve, so executors can read them as-is.
        return path


class _HadoopInputFile(_io.RawIOBase):
    """Seekable read-only file over an FSDataInputStream, sufficient
    for pyarrow's ParquetFile footer reads (a handful of seek+read
    calls; each read is one bounded JVM ``copyBytes``)."""

    def __init__(self, fio: HadoopFileIO, path: str, size: int) -> None:
        self._fio = fio
        self._stream = fio._fs.open(fio._p(path))
        self._size = size
        self._pos = 0

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        self._pos = max(0, min(self._pos, self._size))
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        jvm = self._fio._jvm
        self._stream.seek(self._pos)
        # commons-io toByteArray(in, n) reads EXACTLY n bytes. (Do NOT
        # use hadoop IOUtils.copyBytes(in, out, int, bool) here — that
        # int is a BUFFER size and it copies to EOF.)
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(self._stream, int(n))
        )
        self._pos += len(data)
        return data

    def close(self) -> None:
        with contextlib.suppress(Exception):
            self._stream.close()
        super().close()
