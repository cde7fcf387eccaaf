"""Driver-side filesystem helpers over the Hadoop FileSystem API.

The thin utility SURVEY §1.4 promised: the reference exposes a uniform fs
object on every runner with ``can_handle_path / du / exists / ls / cat /
mkdir / rm / touchz / md5sum`` (``mrjob/fs/base.py:26-150``) backed by
per-scheme implementations (local/hadoop/s3/gcs). On Spark the JVM's
``org.apache.hadoop.fs.FileSystem`` already multiplexes schemes through the
active Hadoop configuration (``file://``, ``hdfs://``, ``s3a://``, ...), so
one py4j-backed class covers them all — no per-scheme code, and the same
credentials/filesystems the executors use.

All operations are driver-side metadata/control calls (job setup, output
inspection, cleanup) — never the data path; data moves through Spark reads
and writes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import SparkSession


class HadoopFilesystem:
    """Uniform fs facade: ``fs = HadoopFilesystem(spark)``; every method
    accepts any URI the Hadoop conf can handle (bare paths = local fs).

    Mirrors the reference surface (``mrjob/fs/base.py:26-150``):
    ``exists, du, ls, cat, mkdir, rm, touchz, md5sum, put, get``.
    """

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._jvm = spark.sparkContext._jvm
        self._jconf = spark.sparkContext._jsc.hadoopConfiguration()

    # -- internals ------------------------------------------------------

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _jfs(self, path: str):
        return self._jpath(path).getFileSystem(self._jconf)

    # -- queries --------------------------------------------------------

    def exists(self, path: str) -> bool:
        """True if the path (file or directory) exists
        (``mrjob/fs/base.py:62-70``)."""
        return bool(self._jfs(path).exists(self._jpath(path)))

    def du(self, path: str) -> int:
        """Total size in bytes of the file, or of every file under the
        directory, recursively (``mrjob/fs/base.py:49-60``)."""
        fs = self._jfs(path)
        return int(fs.getContentSummary(self._jpath(path)).getLength())

    def ls(self, path: str) -> Iterator[str]:
        """URIs of all FILES at/under the path, recursively — directories
        are descended into, matching the reference's contract
        (``mrjob/fs/base.py:72-86``)."""
        fs = self._jfs(path)
        it = fs.listFiles(self._jpath(path), True)
        while it.hasNext():
            yield it.next().getPath().toString()

    def md5sum(self, path: str) -> str:
        """Hex md5 of one file's content (``mrjob/fs/base.py:88-96``).
        Streams in 1 MiB chunks — constant memory for any file size."""
        h = hashlib.md5()
        for chunk in self._stream(path):
            h.update(chunk)
        return h.hexdigest()

    def cat(self, path: str) -> Iterator[bytes]:
        """Yield the decompressed(-by-extension is NOT applied; raw bytes)
        content of one file in chunks (``mrjob/fs/base.py:37-47``)."""
        yield from self._stream(path)

    def _stream(self, path: str, chunk: int = 1 << 20) -> Iterator[bytes]:
        # py4j passes byte[] BY VALUE in both directions, so a Java
        # read(buf) can never fill a Python-held buffer. readNBytes (Java
        # 11+) returns a fresh byte[] per call — py4j converts each returned
        # chunk to Python bytes, keeping the transfer chunked either way.
        stream = self._jfs(path).open(self._jpath(path))
        try:
            while True:
                buf = stream.readNBytes(chunk)
                if not buf:
                    break
                yield bytes(buf)
        finally:
            stream.close()

    # -- mutations ------------------------------------------------------

    def mkdir(self, path: str) -> None:
        """Create a directory and its parents (``mrjob/fs/base.py:98-105``)."""
        self._jfs(path).mkdirs(self._jpath(path))

    def rm(self, path: str) -> None:
        """Recursively delete the path; no error if it doesn't exist
        (``mrjob/fs/base.py:115-122``)."""
        self._jfs(path).delete(self._jpath(path), True)

    def touchz(self, path: str) -> None:
        """Create an empty file; error if it exists non-empty
        (``mrjob/fs/base.py:124-132``)."""
        fs = self._jfs(path)
        jp = self._jpath(path)
        if fs.exists(jp) and fs.getFileStatus(jp).getLen() != 0:
            raise OSError(f"non-empty file exists: {path}")
        fs.create(jp, True).close()

    def put(self, local_path: str, dest: str) -> None:
        """Upload a local file (driver-side control files, not data)."""
        self._jfs(dest).copyFromLocalFile(
            False, True, self._jpath(local_path), self._jpath(dest)
        )

    def get(self, src: str, local_path: str) -> None:
        """Download a file to the driver's local filesystem."""
        self._jfs(src).copyToLocalFile(
            False, self._jpath(src), self._jpath(local_path), True
        )

    def retrying(self, retry_if=None, **retry_kwargs):
        """This fs behind transparent retry-with-backoff on transient
        errors (``mrjob/retry.py`` parity): object-store throttle/5xx and
        connection blips repeat with exponential backoff instead of
        failing job setup/teardown. Control-plane only — the data path
        rides Spark's own task retry."""
        from mrjob_spark.retry import RetryWrapper, is_transient_io_error

        return RetryWrapper(
            self, retry_if or is_transient_io_error, **retry_kwargs
        )
