"""Driver-side HDFS client that shells out to ``hadoop fs``.

The ``-r hadoop`` runner never moves data through the driver except when
the user asks for output bytes: uploads stream through ``hadoop fs -put``
and output streams through ``hadoop fs -cat`` a chunk at a time, so the
driver's memory footprint is O(1) in the data size — the contract the
reference's subprocess HDFS client keeps (``mrjob/fs/hadoop.py:140-340``).

Reference parity (behavior, not code): binary discovery order
(``mrjob/fs/hadoop.py:88-123``), ``hadoop version`` parsing
(:144-160), ``-ls`` line parsing and glob passthrough (:208-262),
and the ok-returncode convention for idempotent ops (:140-188).
"""

from __future__ import annotations

import bz2
import gzip
import os
import posixpath
import re
import shutil
import subprocess
from typing import Iterator

#: first line of ``hadoop version``: "Hadoop 3.3.6"
_VERSION_RE = re.compile(r"^Hadoop (\S+)")

#: an ``fs -ls`` entry line: permissions, replication, owner, group,
#: size, date, time, path. Paths may contain spaces: split at most 7
#: times and keep the tail whole.
_LS_LINE_RE = re.compile(r"^[bcdlsp-][rwxst-]{9}\+?\s")


class HadoopBinError(RuntimeError):
    """No usable hadoop binary."""


def find_hadoop_bin(env: dict | None = None) -> list[str]:
    """Locate the hadoop launcher: ``$HADOOP_HOME/bin/hadoop`` (and the
    other ``HADOOP_*`` homes), then ``$PATH`` — the reference's search
    order (``mrjob/fs/hadoop.py:88-123``)."""
    env = dict(os.environ if env is None else env)
    for var in ("HADOOP_HOME", "HADOOP_PREFIX", "HADOOP_INSTALL",
                "HADOOP_MAPRED_HOME"):
        home = env.get(var)
        if home:
            cand = os.path.join(home, "bin", "hadoop")
            if os.access(cand, os.X_OK):
                return [cand]
    found = shutil.which("hadoop", path=env.get("PATH"))
    if found:
        return [found]
    raise HadoopBinError(
        "no hadoop binary found; set hadoop_bin or $HADOOP_HOME"
    )


def fully_qualify_hdfs_path(path: str, user: str | None = None) -> str:
    """``tmp/foo`` → ``hdfs:///user/<user>/tmp/foo``; absolute paths gain
    the scheme; URIs pass through (``mrjob/hadoop.py:108-116``)."""
    if "://" in path:
        return path
    if path.startswith("/"):
        return "hdfs://" + path
    if user is None:
        import getpass

        user = getpass.getuser()
    return "hdfs:///user/%s/%s" % (user, path)


class HadoopClientFS:
    """Filesystem ops over a ``hadoop fs`` subprocess.

    :param hadoop_bin: launcher argv (a list — may be
        ``[python, "-m", "mrjob_spark.testing.mockhadoop"]`` in tests).
    :param env: extra environment for every invocation (merged over
        ``os.environ``); the mock binary reads its HDFS root from here.
    """

    def __init__(self, hadoop_bin: list[str] | None = None,
                 env: dict | None = None):
        self._bin = list(hadoop_bin) if hadoop_bin else None
        self._env_extra = dict(env or {})
        self._version: str | None = None

    @property
    def hadoop_bin(self) -> list[str]:
        if self._bin is None:
            self._bin = find_hadoop_bin(self._subprocess_env())
        return self._bin

    def _subprocess_env(self) -> dict:
        env = dict(os.environ)
        env.update(self._env_extra)
        return env

    def invoke(
        self,
        args: list[str],
        ok_returncodes: tuple = (0,),
        stdin_path: str | None = None,
    ) -> subprocess.CompletedProcess:
        """Run ``hadoop <args>``; raise with captured stderr on a
        returncode outside *ok_returncodes* (idempotent ops pass e.g.
        ``(0, 1)`` so "already exists" isn't an error)."""
        argv = self.hadoop_bin + list(args)
        with open(stdin_path, "rb") if stdin_path else open(
            os.devnull, "rb"
        ) as stdin:
            proc = subprocess.run(
                argv,
                stdin=stdin,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                env=self._subprocess_env(),
            )
        if proc.returncode not in ok_returncodes:
            raise subprocess.CalledProcessError(
                proc.returncode, argv, output=proc.stdout, stderr=proc.stderr
            )
        return proc

    # --- queries -----------------------------------------------------

    def get_version(self) -> str:
        if self._version is None:
            out = self.invoke(["version"]).stdout.decode("utf-8", "replace")
            m = _VERSION_RE.match(out.splitlines()[0] if out else "")
            if not m:
                raise HadoopBinError(f"can't parse hadoop version: {out!r}")
            self._version = m.group(1)
        return self._version

    def uses_yarn(self) -> bool:
        """Hadoop 2+ = YARN (``mrjob/compat.py`` version gate)."""
        major = self.get_version().split(".")[0]
        return major.isdigit() and int(major) >= 2

    def ls(self, path_glob: str) -> list[str]:
        """Paths under *path_glob* (non-recursive; globs are expanded by
        hadoop itself). Missing path → empty list, matching the
        reference's forgiving ls (ok returncodes include 1)."""
        proc = self.invoke(["fs", "-ls", path_glob], ok_returncodes=(0, 1))
        paths = []
        for line in proc.stdout.decode("utf-8", "replace").splitlines():
            if not _LS_LINE_RE.match(line):
                continue  # "Found N items" banner / noise
            fields = line.split(None, 7)
            if len(fields) == 8:
                paths.append(fields[7])
        return paths

    def exists(self, path: str) -> bool:
        return (
            self.invoke(
                ["fs", "-test", "-e", path], ok_returncodes=(0, 1)
            ).returncode
            == 0
        )

    def du(self, path_glob: str) -> dict[str, int]:
        proc = self.invoke(["fs", "-du", path_glob], ok_returncodes=(0, 1))
        sizes: dict[str, int] = {}
        for line in proc.stdout.decode("utf-8", "replace").splitlines():
            fields = line.split(None, 2)
            # modern -du: "<size> <disk-size> <path>"; pre-2.8: two fields
            if len(fields) >= 2 and fields[0].isdigit():
                sizes[fields[-1]] = int(fields[0])
        return sizes

    # --- mutations ---------------------------------------------------

    def mkdir(self, path: str) -> None:
        self.invoke(["fs", "-mkdir", "-p", path])

    def put(self, src: str, dst: str) -> None:
        self.invoke(["fs", "-put", src, dst])

    def rm(self, path_glob: str) -> None:
        self.invoke(
            ["fs", "-rm", "-r", "-f", path_glob], ok_returncodes=(0, 1)
        )

    def touchz(self, path: str) -> None:
        self.invoke(["fs", "-touchz", path])

    def get(self, src: str, dst: str) -> None:
        self.invoke(["fs", "-get", src, dst])

    # --- streaming reads ---------------------------------------------

    def cat_lines(self, path: str) -> Iterator[bytes]:
        """Yield the lines of one file, transparently decompressing
        ``.gz``/``.bz2`` by extension (``mrjob/cat.py:78-104`` contract).
        Bytes stream through the subprocess pipe — the whole file is
        buffered only for compressed formats (codec needs the stream)."""
        argv = self.hadoop_bin + ["fs", "-cat", path]
        proc = subprocess.Popen(
            argv,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=self._subprocess_env(),
        )
        try:
            if path.endswith(".gz"):
                data = gzip.decompress(proc.stdout.read())
                yield from data.splitlines()
            elif path.endswith(".bz2"):
                data = bz2.decompress(proc.stdout.read())
                yield from data.splitlines()
            else:
                yield from (ln.rstrip(b"\r\n") for ln in proc.stdout)
        finally:
            stderr = proc.stderr.read()
            proc.stdout.close()
            proc.stderr.close()
            if proc.wait() != 0:
                raise subprocess.CalledProcessError(
                    proc.returncode, argv, stderr=stderr
                )

    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)
