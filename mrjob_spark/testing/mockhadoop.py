"""An executing mock ``hadoop`` binary.

    python -m mrjob_spark.testing.mockhadoop version
    python -m mrjob_spark.testing.mockhadoop fs -ls hdfs:///tmp
    python -m mrjob_spark.testing.mockhadoop jar hadoop-streaming.jar ...

Environment contract (mirrors the reference's ``tests/mockhadoop.py:58-95``
test-case surface, which drives its mock through env vars too):

- ``MOCK_HDFS_ROOT`` (required): local directory standing in for HDFS;
  ``hdfs://host/p`` and ``/p`` map to ``$MOCK_HDFS_ROOT/p``, relative
  paths to ``$MOCK_HDFS_ROOT/user/<user>/p``.
- ``MOCK_HADOOP_VERSION`` (default ``3.3.6``): what ``version`` reports.
- ``MOCK_HADOOP_LOG_DIR``: where task logs land
  (``userlogs/<application_id>/<container>/{stderr,syslog}``) — the
  layout ``mrjob_spark diagnose`` and the runner's failure path read.
- ``MOCK_HADOOP_CMD_LOG``: append one JSON line of argv per invocation
  (the reference records argv the same way for its command-construction
  tests, ``tests/mockhadoop.py:198-207``).
- ``MOCK_HADOOP_DEFAULT_REDUCES`` (default ``2``): reduce-task count when
  the job doesn't set ``mapreduce.job.reduces`` — 2, not 1, so tests
  exercise partitioning by default.

Unlike the reference's mock — which records the command and plays back
pre-staged output — ``jar`` here EXECUTES the streaming job: it runs the
real ``-mapper``/``-combiner``/``-reducer`` commands as subprocesses over
the mock-HDFS input with Hadoop streaming's own semantics (one map task
per input file; sort on the first ``stream.num.map.output.key.fields``
tab-fields; ``KeyFieldBasedPartitioner -k1,1`` partitioning; counters
aggregated from each task's ``reporter:counter:`` stderr lines) and
prints a driver log in log4j format, including the indented
``Counters:`` block and a YARN application id. A ``-r hadoop`` test
against this mock therefore exercises command rendering, upload, wire
protocols, shuffle grouping, counter plumbing, and log parsing for real.
"""

from __future__ import annotations

import bz2
import glob as globmod
import gzip
import hashlib
import json
import os
import posixpath
import re
import shutil
import subprocess
import sys
import tempfile
import threading
import time

#: per-process container sequence; 1 is the application master on a
#: real cluster, tasks start at 2
_CONTAINER_SEQ = 1
_CONTAINER_SEQ_LOCK = threading.Lock()

_STREAMING_JAR_RE = re.compile(r"^hadoop.*streaming.*(?<!-sources)\.jar$")


# ---------------------------------------------------------------------------
# mock-HDFS path mapping
# ---------------------------------------------------------------------------


def hdfs_root() -> str:
    root = os.environ.get("MOCK_HDFS_ROOT")
    if not root:
        raise SystemExit("mockhadoop: $MOCK_HDFS_ROOT is not set")
    return root


def _to_real(uri: str) -> str:
    """hdfs/s3 URI/path → path under $MOCK_HDFS_ROOT.

    An ``hdfs://host:port/p`` authority is a namenode address — not part
    of the file's identity — so it's stripped. An ``s3://bucket/key`` /
    ``gs://bucket/key`` authority IS the bucket, so it maps to a first
    path component (``$MOCK_HDFS_ROOT/bucket/key``) — which is also how
    the mock EMR/Dataproc services lay buckets out, so cloud steps and
    ``fs`` commands see one store."""
    if "://" in uri:
        scheme, rest = uri.split("://", 1)
        if scheme in ("s3", "s3a", "s3n", "gs"):
            path = "/" + rest
        else:
            # strip authority (host:port or empty)
            path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
    elif uri.startswith("/"):
        path = uri
    else:
        import getpass

        path = "/user/%s/%s" % (getpass.getuser(), uri)
    return os.path.join(hdfs_root(), path.lstrip("/"))


def _to_uri(real: str) -> str:
    rel = os.path.relpath(real, hdfs_root())
    scheme = os.environ.get("MOCK_FS_SCHEME", "hdfs")
    if scheme in ("s3", "s3a", "s3n", "gs"):
        return "%s://%s" % (scheme, rel.replace(os.sep, "/"))
    return "hdfs:///" + rel.replace(os.sep, "/")


# ---------------------------------------------------------------------------
# fs subcommands
# ---------------------------------------------------------------------------


def _ls_line(real: str) -> str:
    if os.path.isdir(real):
        perm, size = "drwxr-xr-x", 0
    else:
        perm, size = "-rw-r--r--", os.path.getsize(real)
    mtime = time.strftime(
        "%Y-%m-%d %H:%M", time.localtime(os.path.getmtime(real))
    )
    return "%s   1 mock supergroup %10d %s %s" % (
        perm, size, mtime, _to_uri(real)
    )


def _expand(uri: str) -> list[str]:
    """Glob expansion against the mock HDFS; returns real paths."""
    real = _to_real(uri)
    if any(ch in real for ch in "*?["):
        return sorted(globmod.glob(real))
    return [real] if os.path.exists(real) else []


def fs_main(args: list[str], stdout, stderr) -> int:
    if not args:
        stderr.write(b"mockhadoop fs: no subcommand\n")
        return -1
    cmd, rest = args[0], args[1:]

    if cmd == "-ls":
        reals: list[str] = []
        for uri in rest:
            for real in _expand(uri):
                if os.path.isdir(real):
                    reals.extend(
                        os.path.join(real, n) for n in sorted(os.listdir(real))
                    )
                else:
                    reals.append(real)
        if not reals:
            stderr.write(b"ls: no such file or directory\n")
            return 1
        stdout.write(("Found %d items\n" % len(reals)).encode())
        for real in reals:
            stdout.write((_ls_line(real) + "\n").encode())
        return 0

    if cmd == "-test":
        # only -e is emulated (all the runner uses)
        flags = [a for a in rest if a.startswith("-")]
        paths = [a for a in rest if not a.startswith("-")]
        if flags != ["-e"] or len(paths) != 1:
            stderr.write(b"mockhadoop fs -test: only -e <path>\n")
            return -1
        return 0 if os.path.exists(_to_real(paths[0])) else 1

    if cmd == "-mkdir":
        for uri in rest:
            if uri == "-p":
                continue
            os.makedirs(_to_real(uri), exist_ok=True)
        return 0

    if cmd == "-put":
        src, dst = rest[0], rest[1]
        real_dst = _to_real(dst)
        if os.path.isdir(real_dst):
            real_dst = os.path.join(real_dst, os.path.basename(src))
        if os.path.exists(real_dst):
            stderr.write(b"put: target already exists\n")
            return 1
        os.makedirs(os.path.dirname(real_dst), exist_ok=True)
        shutil.copyfile(src, real_dst)
        return 0

    if cmd == "-get":
        src, dst = rest[0], rest[1]
        shutil.copyfile(_to_real(src), dst)
        return 0

    if cmd == "-cat":
        ok = False
        for uri in rest:
            for real in _expand(uri):
                with open(real, "rb") as fh:
                    shutil.copyfileobj(fh, stdout)
                ok = True
        if not ok:
            stderr.write(b"cat: no such file\n")
            return 1
        return 0

    if cmd == "-rm":
        paths = [a for a in rest if not a.startswith("-")]
        recursive = "-r" in rest or "-R" in rest
        force = "-f" in rest
        rc = 0
        for uri in paths:
            matched = _expand(uri)
            if not matched and not force:
                stderr.write(b"rm: no such file\n")
                rc = 1
            for real in matched:
                if os.path.isdir(real):
                    if recursive:
                        shutil.rmtree(real)
                    else:
                        stderr.write(b"rm: is a directory\n")
                        rc = 1
                else:
                    os.unlink(real)
        return rc

    if cmd == "-du":
        for uri in rest:
            for real in _expand(uri):
                size = 0
                if os.path.isdir(real):
                    for dirpath, _, names in os.walk(real):
                        size += sum(
                            os.path.getsize(os.path.join(dirpath, n))
                            for n in names
                        )
                else:
                    size = os.path.getsize(real)
                stdout.write(
                    ("%d  %d  %s\n" % (size, size, _to_uri(real))).encode()
                )
        return 0

    if cmd == "-touchz":
        for uri in rest:
            real = _to_real(uri)
            os.makedirs(os.path.dirname(real), exist_ok=True)
            open(real, "wb").close()
        return 0

    stderr.write(("mockhadoop fs: unknown %s\n" % cmd).encode())
    return -1


# ---------------------------------------------------------------------------
# jar (hadoop streaming) execution
# ---------------------------------------------------------------------------


def _parse_streaming_args(args: list[str]) -> dict:
    opts: dict = dict(
        files=[], archives=[], jobconf={}, inputs=[], cmdenv={},
        output=None, mapper=None, combiner=None, reducer=None,
        partitioner=None, libjars=[], inputformat=None, outputformat=None,
    )
    i = 0
    while i < len(args):
        a = args[i]

        def val():
            nonlocal i
            i += 1
            return args[i]

        if a == "-D":
            k, _, v = val().partition("=")
            opts["jobconf"][k] = v
        elif a == "-files":
            opts["files"].extend(val().split(","))
        elif a == "-archives":
            opts["archives"].extend(val().split(","))
        elif a == "-libjars":
            opts["libjars"].extend(val().split(","))
        elif a == "-cmdenv":
            k, _, v = val().partition("=")
            opts["cmdenv"][k] = v
        elif a == "-input":
            opts["inputs"].append(val())
        elif a in ("-output", "-mapper", "-combiner", "-reducer",
                   "-partitioner", "-inputformat", "-outputformat"):
            opts[a[1:]] = val()
        else:
            raise SystemExit("mockhadoop jar: unknown streaming arg %r" % a)
        i += 1
    if not opts["inputs"] or not opts["output"] or not opts["mapper"]:
        raise SystemExit("mockhadoop jar: need -input, -output, -mapper")
    return opts


def _open_input(real: str) -> bytes:
    with open(real, "rb") as fh:
        data = fh.read()
    if real.endswith(".gz"):
        return gzip.decompress(data)
    if real.endswith(".bz2"):
        return bz2.decompress(data)
    return data


def _sort_key_fields(line: bytes, k: int) -> bytes:
    return b"\t".join(line.split(b"\t")[:k])


def _partition_field(line: bytes, opts: dict) -> bytes:
    k = int(opts["jobconf"].get("stream.num.map.output.key.fields", 1))
    part_opts = opts["jobconf"].get(
        "mapreduce.partition.keypartitioner.options"
    ) or opts["jobconf"].get("mapred.text.key.partitioner.options")
    if opts["partitioner"] and part_opts:
        # only -kPOS,POS single-field specs are emulated; -k1,1 is what
        # SORT_VALUES emits
        m = re.match(r"-k(\d+),(\d+)$", part_opts)
        if m and m.group(1) == m.group(2):
            f = int(m.group(1))
            fields = line.split(b"\t")
            return fields[f - 1] if f <= len(fields) else b""
    return _sort_key_fields(line, k)


class _Counters:
    def __init__(self):
        self.data: dict = {}
        # map/reduce tasks run CONCURRENTLY (like real task containers);
        # counter aggregation is the one piece of shared state they touch
        self._lock = threading.Lock()

    def add(self, group: str, name: str, amount: int) -> None:
        with self._lock:
            g = self.data.setdefault(group, {})
            g[name] = g.get(name, 0) + amount

    def absorb_reporter(self, stderr_bytes: bytes) -> list[bytes]:
        """Pull reporter:counter lines out of a task's stderr; return the
        remaining (real diagnostic) lines."""
        other = []
        for line in stderr_bytes.splitlines():
            m = re.match(
                rb"^reporter:counter:([^,]*),([^,]*),(-?\d+)\s*$", line
            )
            if m:
                self.add(
                    m.group(1).decode("utf-8", "replace"),
                    m.group(2).decode("utf-8", "replace"),
                    int(m.group(3)),
                )
            elif not line.startswith(b"reporter:status:"):
                other.append(line)
        return other

    def block(self) -> str:
        total = sum(len(g) for g in self.data.values())
        lines = ["Counters: %d" % total]
        for group in sorted(self.data):
            lines.append("\t" + group)
            for name in sorted(self.data[group]):
                lines.append("\t\t%s=%d" % (name, self.data[group][name]))
        return "\n".join(lines)


class _Driver:
    """Log4j-format driver output (what ``hadoop jar`` prints on stderr)."""

    def __init__(self, stderr):
        self._stderr = stderr

    def emit(self, message: str, level: str = "INFO",
             logger: str = "mapreduce.Job") -> None:
        ts = time.strftime("%y/%m/%d %H:%M:%S")
        self._stderr.write(
            ("%s %s %s: %s\n" % (ts, level, logger, message)).encode()
        )
        self._stderr.flush()


def _localize_files(uris: list[str], dest: str) -> None:
    """Distributed-cache localization: each ``uri#alias`` lands in the
    task working dir under its alias (default basename)."""
    for entry in uris:
        uri, _, alias = entry.partition("#")
        real = _to_real(uri) if "://" in uri else uri
        name = alias or posixpath.basename(uri)
        target = os.path.join(dest, name)
        if not os.path.exists(target):
            shutil.copyfile(real, target)


def _task_env(opts: dict, extra: dict) -> dict:
    env = dict(os.environ)
    for k, v in opts["jobconf"].items():
        env[re.sub(r"[^A-Za-z0-9]", "_", k)] = str(v)
    env.update(opts["cmdenv"])
    env.update(extra)
    return env


def _run_task(cmd: str, stdin_bytes: bytes, workdir: str, env: dict,
              counters: _Counters, log_dir: str | None, app_id: str,
              task_name: str) -> tuple[int, list[bytes]]:
    proc = subprocess.run(
        ["/bin/sh", "-c", cmd],
        input=stdin_bytes,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        cwd=workdir,
        env=env,
    )
    diag = counters.absorb_reporter(proc.stderr)
    if log_dir:
        # real YARN container ids are all-digit groups
        # (container_<clusterts>_<app>_<attempt>_<seq>, seq 1 = the AM);
        # log-path matchers — the reference's included — key on that
        # shape, so the mock's names must carry it
        global _CONTAINER_SEQ
        with _CONTAINER_SEQ_LOCK:
            _CONTAINER_SEQ += 1
            seq = _CONTAINER_SEQ
        cdir = os.path.join(
            log_dir, "userlogs", app_id,
            "container_%s_01_%06d" % (
                app_id[len("application_"):], seq,
            ),
        )
        os.makedirs(cdir, exist_ok=True)
        with open(os.path.join(cdir, "stderr"), "wb") as fh:
            fh.write(b"\n".join(diag) + (b"\n" if diag else b""))
        with open(os.path.join(cdir, "syslog"), "w") as fh:
            ts = time.strftime("%Y-%m-%d %H:%M:%S,000")
            fh.write(
                "%s INFO [main] org.apache.hadoop.mapred.MapTask: "
                "task %s\n" % (ts, task_name)
            )
            if proc.returncode != 0:
                fh.write(
                    "%s INFO [main] org.apache.hadoop.streaming.PipeMapRed:"
                    " PipeMapRed failed!\n" % ts
                )
                # the record carries the stack frames a real PipeMapRed
                # logs — task-log interpreters (the reference's
                # _JAVA_TRACEBACK_RE included) key on the '\tat
                # Class.method(File.java:N)' continuation lines
                fh.write(
                    "%s ERROR [main] org.apache.hadoop.streaming.PipeMapRed:"
                    " java.lang.RuntimeException: PipeMapRed"
                    ".waitOutputThreads(): subprocess failed with code %d\n"
                    "\tat org.apache.hadoop.streaming.PipeMapRed"
                    ".waitOutputThreads(PipeMapRed.java:326)\n"
                    "\tat org.apache.hadoop.streaming.PipeMapRed"
                    ".mapRedFinished(PipeMapRed.java:539)\n"
                    "\tat org.apache.hadoop.streaming.PipeReducer"
                    ".close(PipeReducer.java:134)\n"
                    "\tat org.apache.hadoop.mapred.ReduceTask"
                    ".runOldReducer(ReduceTask.java:453)\n"
                    % (ts, proc.returncode)
                )
    return proc.returncode, proc.stdout.splitlines()


def jar_main(args: list[str], stdout, stderr) -> int:
    if not args:
        stderr.write(b"mockhadoop jar: no jar\n")
        return -1
    jar, rest = args[0], args[1:]
    if not _STREAMING_JAR_RE.match(posixpath.basename(jar)):
        stderr.write(b"mockhadoop jar: only streaming jars are emulated\n")
        return -1
    opts = _parse_streaming_args(rest)

    drv = _Driver(stderr)
    log_dir = os.environ.get("MOCK_HADOOP_LOG_DIR")
    now = int(time.time())
    job_id = "job_%d_0001" % now
    app_id = "application_%d_0001" % now

    # resolve input files (glob / directory expansion like FileInputFormat)
    input_reals: list[str] = []
    for uri in opts["inputs"]:
        for real in _expand(uri):
            if os.path.isdir(real):
                input_reals.extend(
                    os.path.join(real, n)
                    for n in sorted(os.listdir(real))
                    if not n.startswith((".", "_"))
                )
            else:
                input_reals.append(real)
    if not input_reals:
        drv.emit("Error launching job: no input paths", level="ERROR",
                 logger="streaming.StreamJob")
        return 2

    out_real = _to_real(opts["output"])
    if os.path.exists(out_real):
        drv.emit(
            "Output directory %s already exists" % opts["output"],
            level="ERROR", logger="streaming.StreamJob",
        )
        return 2

    reduces = int(
        opts["jobconf"].get("mapreduce.job.reduces")
        or opts["jobconf"].get("mapred.reduce.tasks")
        or os.environ.get("MOCK_HADOOP_DEFAULT_REDUCES", "2")
    )
    key_fields = int(
        opts["jobconf"].get("stream.num.map.output.key.fields", 1)
    )

    stdout.write(
        ("packageJobJar: [] [%s] /tmp/streamjob.jar tmpDir=null\n"
         % jar).encode()
    )
    drv.emit("Connecting to ResourceManager at mock/127.0.0.1:8032",
             logger="client.RMProxy")
    drv.emit("number of splits:%d" % len(input_reals),
             logger="mapreduce.JobSubmitter")
    drv.emit("Submitted application %s" % app_id, logger="impl.YarnClientImpl")
    drv.emit("The url to track the job: http://mock:8088/proxy/%s/" % app_id)
    drv.emit("Running job: %s" % job_id)

    counters = _Counters()
    workdir = tempfile.mkdtemp(prefix="mockhadoop-task-")
    try:
        _localize_files(opts["files"], workdir)

        def fail(task_name: str, rc: int) -> int:
            drv.emit(
                "Task Id : attempt_%s_%s, Status : FAILED (exit code %d)"
                % (job_id[4:], task_name, rc)
            )
            drv.emit("Job %s failed with state FAILED due to: "
                     "Task failed task_%s_%s" % (job_id, job_id[4:],
                                                 task_name))
            drv.emit("Job not successful!", level="ERROR",
                     logger="streaming.StreamJob")
            stderr.write(b"Streaming Command Failed!\n")
            return 1  # hadoop jar's exit code for a failed streaming job

        # --- map phase (one task per input file; compressed input is
        # unsplittable, so this is Hadoop's own split shape for it).
        # Tasks run CONCURRENTLY, like real task containers — each split's
        # mapper (+ its combiner) is an independent subprocess chain, and
        # serializing them was pure fixed cost: every task interpreter
        # pays its own import-time, so a 4-split job was 4x slower than
        # the cluster it mocks (VERDICT r11 task 2, subprocess tier).
        from concurrent.futures import ThreadPoolExecutor

        # task-container width = the mocked cluster's slot count: default
        # to the host's cores (a real cluster runs one container per
        # slot), overridable for constrained hosts. The old fixed 8 left
        # 3/4 of a 32-core host idle during the task waves (round 12).
        try:
            pool_size = int(os.environ.get("MOCK_HADOOP_TASK_SLOTS") or 0)
        except ValueError:
            pool_size = 0  # non-integer override: fall back to cpu width
        if pool_size < 1:
            pool_size = max(1, os.cpu_count() or 1)

        def run_split(m: int, real: str):
            """mapper (+combiner) for one split → (task_name, rc, lines)"""
            task = "m_%06d" % m
            env = _task_env(opts, {
                "mapreduce_map_input_file": _to_uri(real),
                "mapreduce_task_partition": str(m),
                "mapreduce_job_id": job_id,
                "mapreduce_task_ismap": "true",
            })
            data = _open_input(real)
            counters.add(
                "Map-Reduce Framework", "Map input records",
                sum(1 for ln in data.splitlines() if ln),
            )
            rc, out_lines = _run_task(
                opts["mapper"], data, workdir, env, counters, log_dir,
                app_id, task,
            )
            if rc != 0:
                return task, rc, []
            counters.add(
                "Map-Reduce Framework", "Map output records", len(out_lines)
            )
            if opts["combiner"]:
                out_lines.sort(key=lambda ln: _sort_key_fields(ln,
                                                               key_fields))
                counters.add("Map-Reduce Framework", "Combine input records",
                             len(out_lines))
                rc, out_lines = _run_task(
                    opts["combiner"], b"\n".join(out_lines) + b"\n"
                    if out_lines else b"",
                    workdir, env, counters, log_dir, app_id,
                    "c_%06d" % m,
                )
                if rc != 0:
                    return "c_%06d" % m, rc, []
                counters.add("Map-Reduce Framework", "Combine output records",
                             len(out_lines))
            return None, 0, out_lines

        with ThreadPoolExecutor(max_workers=pool_size) as pool:
            split_results = list(pool.map(
                run_split, range(len(input_reals)), input_reals))
        map_outs: list[list[bytes]] = []
        for task, rc, out_lines in split_results:
            # deterministic failure report: the lowest-index failed task
            if rc != 0:
                return fail(task, rc)
            map_outs.append(out_lines)
        counters.add("Job Counters", "Launched map tasks", len(input_reals))
        drv.emit(" map 100% reduce 0%")

        os.makedirs(out_real, exist_ok=True)

        if reduces == 0 or not opts["reducer"]:
            # map-only: each map task's output is its own part file
            for m, out_lines in enumerate(map_outs):
                with open(
                    os.path.join(out_real, "part-%05d" % m), "wb"
                ) as fh:
                    for ln in out_lines:
                        fh.write(ln + b"\n")
        else:
            # --- shuffle: partition on the key field, sort by key bytes ---
            parts: list[list[bytes]] = [[] for _ in range(reduces)]
            for out_lines in map_outs:
                for ln in out_lines:
                    pf = _partition_field(ln, opts)
                    p = int(hashlib.md5(pf).hexdigest(), 16) % reduces
                    parts[p].append(ln)
            counters.add("Job Counters", "Launched reduce tasks", reduces)

            def run_reduce(p: int):
                """one reduce partition → (task_name, rc); writes its own
                part file (distinct files, no shared state)"""
                lines = parts[p]
                lines.sort(key=lambda ln: _sort_key_fields(ln, key_fields))
                counters.add("Map-Reduce Framework", "Reduce input records",
                             len(lines))
                task = "r_%06d" % p
                env = _task_env(opts, {
                    "mapreduce_task_partition": str(p),
                    "mapreduce_job_id": job_id,
                    "mapreduce_task_ismap": "false",
                })
                rc, out_lines = _run_task(
                    opts["reducer"],
                    b"\n".join(lines) + b"\n" if lines else b"",
                    workdir, env, counters, log_dir, app_id, task,
                )
                if rc != 0:
                    return task, rc
                counters.add("Map-Reduce Framework", "Reduce output records",
                             len(out_lines))
                with open(
                    os.path.join(out_real, "part-%05d" % p), "wb"
                ) as fh:
                    for ln in out_lines:
                        fh.write(ln + b"\n")
                return None, 0

            with ThreadPoolExecutor(max_workers=pool_size) as pool:
                reduce_results = list(pool.map(run_reduce, range(reduces)))
            for task, rc in reduce_results:
                if rc != 0:
                    return fail(task, rc)
        drv.emit(" map 100% reduce 100%")

        open(os.path.join(out_real, "_SUCCESS"), "wb").close()
        drv.emit("Job %s completed successfully" % job_id)
        drv.emit(counters.block())
        drv.emit("Output directory: %s" % opts["output"],
                 logger="streaming.StreamJob")
        return 0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv

    cmd_log = os.environ.get("MOCK_HADOOP_CMD_LOG")
    if cmd_log:
        with open(cmd_log, "a") as fh:
            fh.write(json.dumps(argv) + "\n")

    stdout, stderr = sys.stdout.buffer, sys.stderr.buffer
    if not argv:
        stderr.write(b"mockhadoop: no subcommand\n")
        return -1
    if argv[0] == "version":
        version = os.environ.get("MOCK_HADOOP_VERSION", "3.3.6")
        stdout.write(
            ("Hadoop %s\nCompiled by mock\n" % version).encode()
        )
        return 0
    if argv[0] == "fs":
        return fs_main(argv[1:], stdout, stderr)
    if argv[0] == "jar":
        return jar_main(argv[1:], stdout, stderr)
    stderr.write(("mockhadoop: unknown subcommand %r\n" % argv[0]).encode())
    return -1


if __name__ == "__main__":
    sys.exit(main())
