"""Driver-side object-store filesystem over a boto3-shaped client —
the ``runner.fs`` surface for the cloud runners (reference
``mrjob/fs/s3.py`` and ``mrjob/fs/gcs.py``; one class serves both here
because the runners speak to duck-typed clients with one shape).

Same helper set as :class:`mrjob_spark.fs.HadoopFilesystem` and the
``-r hadoop`` runner's :class:`~mrjob_spark.dataflow.hdfs.
HadoopClientFS`: ``ls / exists / du / cat / cat_lines / md5sum / put /
get / rm / mkdir / touchz``, glob support limited to a trailing ``*``
segment plus prefix listing (the reference's S3 ls is also
prefix-driven — object stores have no real directories, so ``ls`` of a
"directory" URI lists the prefix, ``mrjob/fs/s3.py:122-163``).

Memory stays O(object) on the driver: ``cat`` streams one object at a
time and ``cat_lines`` yields line by line; ``.gz`` objects decompress
transparently like every other runner's cat path.
"""

from __future__ import annotations

import fnmatch
import gzip
import hashlib
import os
import posixpath
from typing import Iterator, Optional


def _split_uri(uri: str) -> tuple:
    if "://" not in str(uri):
        raise ValueError("object-store paths need a scheme: %r" % uri)
    scheme, rest = str(uri).split("://", 1)
    bucket, _, key = rest.partition("/")
    return scheme, bucket, key


def iter_objects(client, bucket: str, prefix: str = "") -> Iterator[dict]:
    """Paginate ``list_objects_v2`` to exhaustion. Real S3/GCS return at
    most 1000 keys per call with ``IsTruncated`` + ``NextContinuationToken``
    (the reference auto-paginates via ``bucket.objects.filter`` /
    ``_boto3_paginate``, mrjob/fs/s3.py / mrjob/emr.py); a single-call
    consumer silently drops job output past 1000 part files. Every
    listing in the cloud runners and tools goes through here."""
    token = None
    while True:
        kwargs = {"Bucket": bucket, "Prefix": prefix}
        if token:
            kwargs["ContinuationToken"] = token
        resp = client.list_objects_v2(**kwargs)
        yield from resp.get("Contents") or []
        if not resp.get("IsTruncated"):
            return
        token = resp.get("NextContinuationToken")
        if not token:  # defensive: truncated but token-less response
            return


def key_within(key: str, prefix: str) -> bool:
    """True when *key* IS the object *prefix* names or lives under it as
    a path 'directory' — rejects sibling keys that merely share the
    string prefix (``out-old/x`` vs ``out``). The reference enforces the
    same boundary by fnmatching ``path_glob`` and ``path_glob + '/*'``
    (mrjob/fs/s3.py:142-162); without it, ``rm`` of a trailing-slash-less
    output dir deletes unrelated sibling-prefix data."""
    if not prefix or prefix.endswith("/"):
        return key.startswith(prefix)
    return key == prefix or key.startswith(prefix + "/")


class ObjectStoreFS:
    """``ObjectStoreFS(client, scheme="s3")`` — *client* is any
    boto3-shaped object client (real boto3, the mock EMR S3 client, or
    the mock GCS storage client, which shares the shape)."""

    def __init__(self, client, scheme: str = "s3"):
        self.client = client
        self.scheme = scheme

    def can_handle_path(self, path: str) -> bool:
        return str(path).startswith(self.scheme + "://")

    # -- listing --------------------------------------------------------

    def _iter_keys(self, bucket: str, prefix: str) -> Iterator[dict]:
        yield from iter_objects(self.client, bucket, prefix)

    def ls(self, path_glob: str) -> Iterator[str]:
        """URIs under *path_glob*. A glob applies fnmatch per key
        relative to the fixed prefix before the first wildcard; a
        plain URI lists itself plus everything under it as a
        'directory' — NOT sibling keys that merely extend the string
        (mrjob/fs/s3.py:142-162 boundary rule)."""
        scheme, bucket, key = _split_uri(path_glob)
        wild = min(
            (key.index(c) for c in "*?[" if c in key), default=None
        )
        if wild is None:
            prefix, pattern = key, None
        else:
            prefix, pattern = key[:wild], key
        for obj in self._iter_keys(bucket, prefix):
            if pattern is None:
                if not key_within(obj["Key"], key):
                    continue
            elif not (
                fnmatch.fnmatch(obj["Key"], pattern)
                or fnmatch.fnmatch(obj["Key"], pattern.rstrip("/") + "/*")
            ):
                continue
            yield "%s://%s/%s" % (scheme, bucket, obj["Key"])

    def exists(self, path_glob: str) -> bool:
        for _ in self.ls(path_glob):
            return True
        return False

    def du(self, path_glob: str) -> int:
        scheme, bucket, key = _split_uri(path_glob)
        matched = set()
        for uri in self.ls(path_glob):
            _, _, k = _split_uri(uri)
            matched.add(k)
        wild = min((key.index(c) for c in "*?[" if c in key), default=None)
        prefix = key if wild is None else key[:wild]
        return sum(
            obj.get("Size", 0)
            for obj in self._iter_keys(bucket, prefix)
            if obj["Key"] in matched
        )

    # -- reading ----------------------------------------------------------

    def _read(self, uri: str) -> bytes:
        _, bucket, key = _split_uri(uri)
        body = self.client.get_object(Bucket=bucket, Key=key)["Body"].read()
        if key.endswith(".gz"):
            body = gzip.decompress(body)
        return body

    def cat(self, path_glob: str) -> Iterator[bytes]:
        """One bytes chunk per matching object (driver memory is
        bounded by the largest single object, as with hadoop fs -cat)."""
        for uri in sorted(self.ls(path_glob)):
            yield self._read(uri)

    def cat_lines(self, path_glob: str) -> Iterator[bytes]:
        for chunk in self.cat(path_glob):
            for line in chunk.splitlines():
                yield line

    def md5sum(self, path: str) -> str:
        return hashlib.md5(self._read(path)).hexdigest()

    # -- writing ------------------------------------------------------------

    def put(self, local_path: str, dest: str) -> None:
        _, bucket, key = _split_uri(dest)
        if key.endswith("/") or not key:
            key = posixpath.join(key, os.path.basename(local_path))
        self.client.upload_file(
            Filename=local_path, Bucket=bucket, Key=key
        )

    def get(self, src: str, local_path: str) -> None:
        with open(local_path, "wb") as fh:
            fh.write(self._read(src))

    def touchz(self, path: str) -> None:
        _, bucket, key = _split_uri(path)
        self.client.put_object(Bucket=bucket, Key=key, Body=b"")

    def mkdir(self, path: str) -> None:
        """Object stores have no directories; the reference creates the
        bucket if needed and otherwise no-ops (mrjob/fs/s3.py:187-202)."""
        _, bucket, _ = _split_uri(path)
        try:
            self.client.head_bucket(Bucket=bucket)
        except Exception:
            self.client.create_bucket(Bucket=bucket)

    def rm(self, path_glob: str) -> None:
        """Remove matching objects AND everything under them when the
        URI names a 'directory' prefix (the reference's recursive
        default for cloud tmp cleanup). ``ls`` already enforces the
        sibling-prefix boundary, so ``rm`` of ``.../out`` can never
        touch ``.../out-old``."""
        _, bucket, key = _split_uri(path_glob)
        doomed = set()
        for uri in self.ls(path_glob):
            _, _, k = _split_uri(uri)
            doomed.add(k)
        for k in sorted(doomed):
            self.client.delete_object(Bucket=bucket, Key=k)

    # -- retry facade (same contract as HadoopFilesystem.retrying) ---------

    def retrying(self, retry_if=None, **retry_kwargs) -> "ObjectStoreFS":
        from mrjob_spark.retry import RetryWrapper

        return RetryWrapper(self, retry_if=retry_if, **retry_kwargs)


__all__ = ["ObjectStoreFS", "iter_objects", "key_within"]
