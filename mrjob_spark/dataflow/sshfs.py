"""Driver-side SSH filesystem — ``ssh://host/path`` (and chained
``ssh://master!worker/path``) reads for cluster-node log fetch.

The reference's ``mrjob/fs/ssh.py`` surface: shell out to an ``ssh``
binary with host-key checks disabled and agent forwarding on, run
``find``/``cat`` on the node, and stream the result back. Hosts behind
the master (EMR core/task nodes on the private subnet) are reached by
CHAINING — ``master!worker`` renders as ``ssh … hadoop@master ssh …
hadoop@worker <cmd>``, with the key loaded into the local agent via
``ssh-add`` so the second hop can authenticate through ``-A``
(mrjob/fs/ssh.py:68-162).

Why this exists at 100 TB: EMR ships logs to the S3 ``LogUri`` with a
multi-minute delay, but the step/task logs are ON the master's disk the
moment the step ends (``/mnt/var/log/hadoop/steps/<step-id>/``). A
driver that can read them over SSH gets counters and failure diagnosis
immediately instead of polling S3 — the reference tries SSH first for
exactly this reason (mrjob/emr.py:2040-2090). Data never moves through
this class; it is a log/inspection channel, not a job-data path.

Helper-set parity with :class:`~mrjob_spark.dataflow.objectstore.
ObjectStoreFS` / :class:`~mrjob_spark.dataflow.hdfs.HadoopClientFS`
where the transport allows: ``ls / exists / cat / cat_lines`` plus the
command channel ``run`` (which ``mrjob boss`` uses). Mutating helpers
raise ``IOError`` — the reference's SSH fs is read-only too.

Tests drive this against the executing fake binary in
:mod:`mrjob_spark.testing.mockssh` (the reference mocks ssh with a fake
binary the same way, ``tests/mockssh.py``).
"""

from __future__ import annotations

import gzip
import os
import re
import subprocess
from typing import Iterator, Optional

_SSH_URI_RE = re.compile(r"^ssh://(?P<host>[^/]+)(?P<path>/.*)$")


def parse_ssh_uri(uri: str) -> tuple:
    """``ssh://master!worker/a/b`` → ``('master!worker', '/a/b')``."""
    m = _SSH_URI_RE.match(str(uri))
    if not m:
        raise ValueError("not an ssh:// URI: %r" % uri)
    return m.group("host"), m.group("path")


class SSHFilesystem:
    """Filesystem over an ``ssh`` binary.

    :param ssh_bin: argv prefix for ssh (e.g. ``['ssh']`` or the mock's
        ``[sys.executable, '-m', 'mrjob_spark.testing.mockssh']``).
    :param ec2_key_pair_file: identity file passed to the FIRST hop via
        ``-i`` (the reference requires it; so do we).
    :param ssh_add_bin: argv prefix for ``ssh-add`` (used before chained
        hops so agent forwarding can carry the key to hop 2).
    :param ssh_user: remote user; EMR's Hadoop user is ``hadoop``.
    :param env: extra environment for the subprocess (the mock's
        ``MOCK_SSH_ROOT`` contract rides here).
    """

    def __init__(
        self,
        ssh_bin: list,
        ec2_key_pair_file: str,
        ssh_add_bin: Optional[list] = None,
        ssh_user: str = "hadoop",
        env: Optional[dict] = None,
    ):
        if ec2_key_pair_file is None:
            raise ValueError("ec2_key_pair_file must be a path")
        self._ssh_bin = list(ssh_bin)
        self._ssh_add_bin = list(ssh_add_bin or ["ssh-add"])
        self._key_file = ec2_key_pair_file
        self._ssh_user = ssh_user
        self._env = dict(env or {})
        self._sudo = False
        self._key_added = False

    # --- command rendering -------------------------------------------------

    def can_handle_path(self, path: str) -> bool:
        return _SSH_URI_RE.match(str(path)) is not None

    def use_sudo_over_ssh(self, sudo: bool = True) -> None:
        """EMR AMIs whose log dirs are root-owned need ``sudo cat``."""
        self._sudo = sudo

    def ssh_args(self, address: str, cmd_args: list) -> list:
        """The full argv that runs *cmd_args* on *address* (hops joined
        by ``!``). First hop carries ``-i <keyfile>`` and ``-A`` so
        later hops authenticate through the forwarded agent; every hop
        disables host-key prompts (these are throwaway cloud hosts)."""
        args: list = []
        for i, host in enumerate(address.split("!")):
            args.extend(self._ssh_bin)
            if i == 0:
                args.extend(["-i", self._key_file])
            args.extend(
                [
                    "-o", "UserKnownHostsFile=%s"
                    % (os.devnull if i == 0 else "/dev/null"),
                    "-o", "StrictHostKeyChecking=no",
                    "-o", "VerifyHostKeyDNS=no",
                    "-A",
                    "%s@%s" % (self._ssh_user, host),
                ]
            )
        if self._sudo:
            args.append("sudo")
        args.extend(cmd_args)
        return args

    def _add_key_once(self) -> None:
        """Load the key into the agent (bounded lifetime) before the
        first chained call; hop 2+ has no ``-i`` and rides ``-A``."""
        if self._key_added:
            return
        argv = self._ssh_add_bin + ["-t", "60", self._key_file]
        proc = subprocess.run(
            argv, capture_output=True, env=self._subprocess_env()
        )
        if proc.returncode != 0:
            raise IOError(proc.stderr.decode("utf-8", "replace"))
        self._key_added = True

    def _subprocess_env(self) -> dict:
        env = dict(os.environ)
        env.update(self._env)
        return env

    def _launch(self, address: str, cmd_args: list) -> subprocess.Popen:
        if "!" in address:
            self._add_key_once()
        argv = self.ssh_args(address, cmd_args)
        try:
            return subprocess.Popen(
                argv,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                env=self._subprocess_env(),
            )
        except OSError as ex:
            raise IOError(ex.strerror)

    def run(self, address: str, cmd_args: list) -> tuple:
        """Run a bounded-output command; ``(stdout, stderr)`` bytes, or
        ``IOError`` on nonzero exit. The ``mrjob boss`` channel."""
        proc = self._launch(address, cmd_args)
        stdout, stderr = proc.communicate()
        if proc.returncode != 0:
            raise IOError(stderr.decode("utf-8", "replace"))
        return stdout, stderr

    # --- filesystem helpers --------------------------------------------------

    def ls(self, path_glob: str) -> Iterator[str]:
        """Stream ``ssh://`` URIs of every file at/under the path. Plain
        ``find -L <path> -type f`` on the node — no shell, no glob
        expansion server-side (same contract as the reference).

        The child is ALWAYS reaped, even when the caller abandons the
        generator mid-iteration, and stderr is drained concurrently on
        a thread — a remote ``find`` spewing more than a pipe buffer of
        permission-denied noise to stderr must not deadlock the stdout
        stream (both were real leaks: round-8 ADVICE).
        """
        import threading

        address, path = parse_ssh_uri(path_glob)
        proc = self._launch(address, ["find", "-L", path, "-type", "f"])
        stderr_buf: list = []
        drainer = threading.Thread(
            target=lambda: stderr_buf.append(proc.stderr.read()), daemon=True
        )
        drainer.start()
        drained = False
        try:
            for line in proc.stdout:
                name = line.decode("utf-8", "replace").rstrip("\n")
                if name:
                    yield "ssh://%s%s" % (address, name)
            drained = True
        finally:
            proc.stdout.close()
            if not drained and proc.poll() is None:
                # generator abandoned mid-stream: the caller no longer
                # wants output, so exit status is meaningless — just stop
                # the child and reap it (no zombie, no leaked fds)
                proc.terminate()
            proc.wait()
            drainer.join()
            proc.stderr.close()
            if drained and proc.returncode != 0:
                stderr = stderr_buf[0] if stderr_buf else b""
                raise IOError(stderr.decode("utf-8", "replace"))

    def exists(self, path_glob: str) -> bool:
        # bounded probe instead of any(self.ls(...)): `-print -quit` stops
        # the remote find at the first match, and run() communicate()s so
        # the child is fully reaped (round-8 ADVICE: the any() short-circuit
        # abandoned the ls generator, leaking the ssh subprocess)
        address, path = parse_ssh_uri(path_glob)
        try:
            stdout, _ = self.run(
                address,
                ["find", "-L", path, "-type", "f", "-print", "-quit"],
            )
        except IOError:
            return False
        return bool(stdout.strip())

    def cat(self, path: str) -> Iterator[bytes]:
        """Yield the file's bytes (one chunk; log files are bounded).
        ``.gz``/``.bz2`` decompress transparently like every other fs
        here (the reference's cat path runs ``mrjob/cat.py:decompress``
        on SSH reads too)."""
        import bz2

        address, fs_path = parse_ssh_uri(path)
        stdout, _ = self.run(address, ["cat", fs_path])
        if fs_path.endswith(".gz"):
            stdout = gzip.decompress(stdout)
        elif fs_path.endswith(".bz2"):
            stdout = bz2.decompress(stdout)
        if stdout:
            yield stdout

    def cat_lines(self, path: str) -> Iterator[bytes]:
        for chunk in self.cat(path):
            yield from chunk.splitlines()

    # --- not implemented over this transport (reference parity) ----------

    def du(self, path_glob: str) -> int:
        raise IOError("du not implemented over ssh")

    def md5sum(self, path: str) -> str:
        raise IOError("md5sum not implemented over ssh")

    def mkdir(self, path: str) -> None:
        raise IOError("mkdir not implemented over ssh")

    def rm(self, path_glob: str) -> None:
        raise IOError("rm not implemented over ssh")

    def touchz(self, path: str) -> None:
        raise IOError("touchz not implemented over ssh")


class CompositeFS:
    """Dispatch by URI scheme across named sub-filesystems — the
    reference's ``CompositeFilesystem`` idea (``mrjob/fs/composite.py``):
    ``fs.ls(uri)`` routes to the first sub-fs whose ``can_handle_path``
    accepts, and each sub-fs stays reachable by name (``fs.ssh``,
    ``fs.s3``) for transport-specific calls like ``fs.ssh.run``."""

    def __init__(self):
        self._order: list = []

    def add_fs(self, name: str, fs) -> None:
        self._order.append((name, fs))
        setattr(self, name, fs)

    def can_handle_path(self, path: str) -> bool:
        return any(
            fs.can_handle_path(path) for _, fs in self._order
        )

    def _for_path(self, path: str):
        for _, fs in self._order:
            if fs.can_handle_path(path):
                return fs
        raise IOError("no filesystem can handle %r" % path)

    def ls(self, path_glob: str) -> Iterator[str]:
        return self._for_path(path_glob).ls(path_glob)

    def exists(self, path_glob: str) -> bool:
        return self._for_path(path_glob).exists(path_glob)

    def cat(self, path: str) -> Iterator[bytes]:
        return self._for_path(path).cat(path)

    def cat_lines(self, path: str) -> Iterator[bytes]:
        return self._for_path(path).cat_lines(path)

    def du(self, path_glob: str) -> int:
        return self._for_path(path_glob).du(path_glob)

    def md5sum(self, path: str) -> str:
        return self._for_path(path).md5sum(path)

    def rm(self, path_glob: str) -> None:
        return self._for_path(path_glob).rm(path_glob)

    def mkdir(self, path: str) -> None:
        return self._for_path(path).mkdir(path)

    def touchz(self, path: str) -> None:
        return self._for_path(path).touchz(path)

    def put(self, local_path: str, dest: str) -> None:
        return self._for_path(dest).put(local_path, dest)

    def get(self, src: str, local_path: str) -> None:
        return self._for_path(src).get(src, local_path)

    def retrying(self, retry_if=None, **retry_kwargs) -> "CompositeFS":
        """Composite whose sub-filesystems retry transient errors (same
        facade contract as the concrete filesystems; sub-fs without a
        retry facade, like SSH, pass through unwrapped)."""
        wrapped = CompositeFS()
        for name, fs in self._order:
            if hasattr(fs, "retrying"):
                fs = fs.retrying(retry_if=retry_if, **retry_kwargs)
            wrapped.add_fs(name, fs)
        return wrapped
