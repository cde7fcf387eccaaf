"""``-r hadoop``: run a :class:`SparkMRJob` on a Hadoop cluster by
shelling out to ``hadoop jar <streaming jar>`` — the reference's
``HadoopJobRunner`` re-expressed for this engine (``mrjob/hadoop.py:
324-482`` is the behavioral contract; nothing is translated from it).

Control plane only: the driver uploads support files with ``hadoop fs
-put``, renders one streaming command per step, launches it, and reads
the driver's log4j stderr for the job id, the YARN application id, and
the indented ``Counters:`` block. Data never flows through the driver —
step N's HDFS output directory is step N+1's ``-input``, and
``cat_output()`` streams part files through ``hadoop fs -cat`` one chunk
at a time. At 100 TB the driver's footprint is the command lines and the
counter dict.

Task side: Hadoop re-invokes
``python -m mrjob_spark.dataflow.hstream --kind ... --step-num ... job.pkl``
per task (see :mod:`~mrjob_spark.dataflow.hstream` for the transport
contract), so mapper/combiner/reducer semantics, wire protocols, and the
``reporter:counter:`` side-channel are byte-identical to the inline /
``-r local`` / Spark runners — pinned by the four-way differential in
``tests/test_hadoop_runner.py``.

On failure the runner mirrors the reference's log-interpretation walk
(``mrjob/hadoop.py:530-560``): it scans the Hadoop log dirs for the
application's task logs and surfaces the probable cause through the same
pattern library ``mrjob_spark diagnose`` uses (dataflow/errors.py).
"""

from __future__ import annotations

import getpass
import os
import posixpath
import re
import subprocess
import sys
import tempfile
import time
import zipfile
from typing import Iterator, Optional

from mrjob_spark.dataflow.hdfs import (
    HadoopClientFS,
    find_hadoop_bin,
    fully_qualify_hdfs_path,
)

#: streaming jar filename shape (the reference's
#: ``_HADOOP_STREAMING_JAR_RE``, ``mrjob/hadoop.py:104-106``)
_STREAMING_JAR_RE = re.compile(r"^hadoop.*streaming.*(?<!-sources)\.jar$")

#: don't treat these as a Hadoop home when guessing from the binary path
_BAD_HADOOP_HOMES = {"/", "/usr", "/usr/local"}

#: SORT_VALUES needs the shuffle to sort on (key, value) but partition
#: and group on key alone (``mrjob/runner.py:67-74``)
_SORT_VALUES_JOBCONF = {
    "mapreduce.partition.keypartitioner.options": "-k1,1",
    "stream.num.map.output.key.fields": "2",
}
_SORT_VALUES_PARTITIONER = (
    "org.apache.hadoop.mapred.lib.KeyFieldBasedPartitioner"
)

# jobconf dialect translation lives in dataflow/compat.py (round 9):
# keys this runner emits itself translate EXACTLY to the target dialect,
# user-supplied keys get the reference's combine-and-warn treatment
# (mrjob/compat.py translate_jobconf_dict) so a job written against one
# Hadoop generation still configures the other

_COUNTERS_START_RE = re.compile(r"^Counters: \d+\s*$")
_COUNTER_LINE_RE = re.compile(r"^\t\t(?P<name>.*)=(?P<amount>-?\d+)\s*$")
_GROUP_LINE_RE = re.compile(r"^\t(?P<group>\S.*?)\s*$")
_JOB_ID_RE = re.compile(r"Running job: (?P<id>job_\S+)")
_APP_ID_RE = re.compile(r"Submitted application (?P<id>application_\S+)")


def _parse_indented_counters(message: str) -> dict:
    """The ``Counters: N`` block a finished job logs: group lines at one
    tab, ``name=amount`` lines at two (``mrjob/hadoop.py:93-99``
    documents the same shapes for the reference's parser)."""
    counters: dict = {}
    group = None
    for line in message.splitlines()[1:]:
        m = _COUNTER_LINE_RE.match(line)
        if m and group is not None:
            counters[group][m.group("name")] = int(m.group("amount"))
            continue
        m = _GROUP_LINE_RE.match(line)
        if m:
            group = m.group("group")
            counters.setdefault(group, {})
    return {g: names for g, names in counters.items() if names}


def interpret_driver_stderr(text: str) -> dict:
    """Pull the job id, YARN application id, and the ``Counters:`` block
    out of a ``hadoop jar`` driver's log4j stderr — the same text an EMR
    step's ``stderr.gz`` log holds, so ``-r hadoop`` and ``-r emr`` share
    this interpreter."""
    from mrjob_spark.dataflow.errors import parse_log4j_records

    interp: dict = {}
    m = _JOB_ID_RE.search(text)
    if m:
        interp["job_id"] = m.group("id")
    m = _APP_ID_RE.search(text)
    if m:
        interp["application_id"] = m.group("id")
    for rec in parse_log4j_records(text.splitlines()):
        first = rec["message"].split("\n", 1)[0]
        if _COUNTERS_START_RE.match(first):
            interp["counters"] = _parse_indented_counters(rec["message"])
    return interp


def _zip_package(dest_dir: str) -> str:
    """Zip the installed ``mrjob_spark`` package (sans caches) so task
    nodes that lack it can import it from the distributed cache — the
    reference's ``mrjob.zip`` bootstrap (``mrjob/bin.py`` mrjob-zip
    path). PySpark itself must already be on the nodes, exactly as the
    reference requires Python + mrjob's own deps there."""
    import mrjob_spark

    pkg_dir = os.path.dirname(os.path.abspath(mrjob_spark.__file__))
    zip_path = os.path.join(dest_dir, "mrjob_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in filenames:
                if name.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.join(
                    "mrjob_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return zip_path


class StreamingStepRenderer:
    """Streaming-step argument rendering shared by every runner that
    submits Hadoop-streaming work to a cluster-shaped control plane —
    ``-r hadoop`` builds ``hadoop jar <streaming jar> <body>`` argvs,
    ``-r emr`` builds ``command-runner.jar`` steps whose Args are
    ``['hadoop-streaming'] + <body>`` (the reference renders both from
    one ``mrjob/bin.py`` code path too). Hosts need: ``job``,
    ``_jobconf``, ``num_reducers``, ``_cmdenv``, ``_setup``,
    ``_python_bin``, ``_bootstrap_sys_path``, ``_libjars``,
    ``_hadoop_extra_args``."""

    def _uses_yarn(self) -> bool:
        return True

    def _task_cmdenv(self) -> dict:
        from mrjob_spark.dataflow.conf import combine_envs

        ours = {"PYTHONPATH": "mrjob_spark.zip"}
        if self._bootstrap_sys_path:
            entries = ["mrjob_spark.zip"] + [
                os.path.abspath(p) for p in sys.path if p
            ]
            ours["PYTHONPATH"] = os.pathsep.join(dict.fromkeys(entries))
        return combine_envs(self._cmdenv, ours)

    def _render_substep(self, step, step_num: int, kind: str) -> str | None:
        """One streaming task command (the reference's
        ``_render_substep``, ``mrjob/bin.py:153-200``): a ``*_cmd`` IS
        the command; a script substep re-invokes this engine's task
        entry; pre-filters pipe into it; setup lines run first inside an
        ``sh -ex`` wrapper (inlined rather than a shipped wrapper script
        — no flock, single-command form of ``mrjob/bin.py:
        _setup_wrapper_script_content``)."""
        cmd = getattr(step, f"{kind}_cmd", None)
        if cmd:
            return cmd
        pre = getattr(step, f"{kind}_pre_filter", None)
        has = {
            "mapper": step.has_mapper,
            "combiner": step.has_combiner,
            "reducer": step.has_reducer,
        }[kind]
        if has:
            base = "%s -m mrjob_spark.dataflow.hstream --kind %s " \
                "--step-num %d job.pkl" % (
                    " ".join(self._python_bin), kind, step_num
                )
        elif kind == "mapper":
            # a step always renders a mapper command; with no script
            # mapper that's the identity — or the pre-filter alone,
            # which IS an identity-with-filter (mrjob/bin.py:174-200)
            base, pre = (pre or "cat"), None
        else:
            return None
        parts = list(self._setup)
        parts.append("%s | %s" % (pre, base) if pre else base)
        if len(parts) > 1 or pre:
            return "/bin/sh -ex -c '%s'" % "; ".join(parts).replace(
                "'", "'\\''"
            )
        return base

    def _jobconf_dialect(self) -> str:
        """The Hadoop generation whose jobconf names the target cluster
        reads — what :func:`translate_jobconf` keys on."""
        return "2.0" if self._uses_yarn() else "1.0"

    def _step_jobconf(self, step, has_reducer: bool) -> dict:
        from mrjob_spark.dataflow.compat import (
            translate_jobconf,
            translate_jobconf_dict,
        )

        version = self._jobconf_dialect()
        # user-supplied keys: combine-and-warn (the cluster reads its
        # own dialect; the original stays so nothing silently vanishes)
        jobconf = translate_jobconf_dict(dict(self._jobconf), version)
        # keys this runner emits itself: exact dialect, no duplicates
        if self.num_reducers is not None and has_reducer:
            jobconf[translate_jobconf("mapreduce.job.reduces", version)] = \
                str(self.num_reducers)
        if getattr(self.job, "SORT_VALUES", False):
            for k, v in _SORT_VALUES_JOBCONF.items():
                jobconf[translate_jobconf(k, version)] = v
        return jobconf

    def _streaming_step_body(
        self, step, step_num: int, files: list[str], archives: list[str],
        inputs: list[str], output_uri: str,
    ) -> list[str]:
        """Everything after the streaming jar. Argument order is the
        reference's (``mrjob/bin.py:307-352``): uploads, reduces=0 for
        map-only steps, -D jobconf sorted, extra args, partitioner,
        cmdenv, input/output, then the task commands."""
        mapper = self._render_substep(step, step_num, "mapper")
        combiner = self._render_substep(step, step_num, "combiner")
        reducer = self._render_substep(step, step_num, "reducer")

        args: list[str] = []
        if files:
            args += ["-files", ",".join(files)]
        if archives:
            args += ["-archives", ",".join(archives)]
        if not reducer:
            from mrjob_spark.dataflow.compat import translate_jobconf

            key = translate_jobconf(
                "mapreduce.job.reduces", self._jobconf_dialect())
            args += ["-D", "%s=0" % key]
        if self._libjars:
            args += ["-libjars", ",".join(self._libjars)]
        for k, v in sorted(
            self._step_jobconf(step, reducer is not None).items()
        ):
            args += ["-D", "%s=%s" % (k, v)]
        args += self._hadoop_extra_args
        if getattr(self.job, "SORT_VALUES", False):
            args += ["-partitioner", _SORT_VALUES_PARTITIONER]
        for k, v in sorted(self._task_cmdenv().items()):
            args += ["-cmdenv", "%s=%s" % (k, v)]
        for uri in inputs:
            args += ["-input", uri]
        args += ["-output", output_uri]
        args += ["-mapper", mapper or "cat"]
        if combiner:
            args += ["-combiner", combiner]
        if reducer:
            args += ["-reducer", reducer]
        return args


class HadoopJobRunner(StreamingStepRenderer):
    """Streaming-on-Hadoop runner with the same surface as the other
    three (``run`` / ``cat_output`` / ``counters`` / context manager).

    :param hadoop_bin: launcher argv; default
        ``$HADOOP_HOME/bin/hadoop`` then ``$PATH``.
    :param hadoop_streaming_jar: explicit jar path; default searched
        under the Hadoop homes (shallower + shorter names win, the
        reference's tiebreak at ``mrjob/hadoop.py:240-252``).
    :param hadoop_tmp_dir: HDFS scratch root (default ``tmp/mrjob`` →
        ``hdfs:///user/<user>/tmp/mrjob/<job key>``).
    :param hadoop_extra_args: raw args spliced after ``-D`` ones.
    :param hadoop_log_dirs: where to look for task logs on failure.
    :param env: extra environment for every hadoop subprocess (tests
        point the mock's ``MOCK_*`` knobs here).
    :param bootstrap_sys_path: include this driver's ``sys.path`` in the
        tasks' ``PYTHONPATH`` (right for single-node / shared-filesystem
        clusters and the mock; turn OFF for a real multi-node cluster
        and ship your job's module via ``FILES`` instead).
    """

    alias = "hadoop"

    def __init__(
        self,
        job,
        input_paths: Optional[list] = None,
        output_dir: Optional[str] = None,
        hadoop_bin: Optional[list] = None,
        hadoop_streaming_jar: Optional[str] = None,
        hadoop_tmp_dir: str = "tmp/mrjob",
        hadoop_extra_args: Optional[list] = None,
        hadoop_log_dirs: Optional[list] = None,
        libjars: Optional[list] = None,
        num_reducers: Optional[int] = None,
        jobconf: Optional[dict] = None,
        conf_jobconf: Optional[dict] = None,
        cmdenv: Optional[dict] = None,
        setup: Optional[list] = None,
        env: Optional[dict] = None,
        python_bin: Optional[list] = None,
        bootstrap_sys_path: bool = True,
        **_ignored,
    ):
        self.job = job
        self.input_paths = list(input_paths or [])
        self._env_extra = dict(env or {})
        if isinstance(hadoop_bin, str):
            hadoop_bin = hadoop_bin.split()
        self.fs = HadoopClientFS(hadoop_bin, env=self._env_extra)
        self._streaming_jar = hadoop_streaming_jar
        self._hadoop_extra_args = list(hadoop_extra_args or [])
        self._hadoop_log_dirs = list(hadoop_log_dirs or [])
        self._libjars = list(libjars or [])
        # streaming tasks execute on cluster nodes, so the default must
        # be a name resolvable THERE — 'python3', like the reference's
        # non-local runners (mrjob/bin.py:191-205) — never the driver
        # machine's sys.executable path
        self._python_bin = list(python_bin or ["python3"])
        self._bootstrap_sys_path = bootstrap_sys_path

        merged = dict(conf_jobconf or {})
        merged.update(job.JOBCONF)
        for step in job.steps():
            merged.update(getattr(step, "jobconf", {}) or {})
        merged.update(jobconf or {})
        self._jobconf = {k: str(v) for k, v in merged.items()}
        if num_reducers is None and "mapreduce.job.reduces" in merged:
            num_reducers = int(merged["mapreduce.job.reduces"])
        self.num_reducers = num_reducers
        self._cmdenv = dict(cmdenv or {})
        self._setup = list(setup or [])

        user = getpass.getuser()
        self._job_key = "%s.%s.%d" % (
            type(job).__name__, user, time.time_ns()
        )
        self._tmp_hdfs = fully_qualify_hdfs_path(
            posixpath.join(hadoop_tmp_dir, self._job_key), user=user
        )
        self._files_dir = posixpath.join(self._tmp_hdfs, "files")
        self.output_dir = fully_qualify_hdfs_path(
            output_dir or posixpath.join(self._tmp_hdfs, "output"),
            user=user,
        )
        self._explicit_output = output_dir is not None

        self._scratch: Optional[str] = None
        self._counters_per_step: list[dict] = []
        self._log_interpretations: list[dict] = []
        self._uploaded_uris: dict[str, str] = {}  # local path -> hdfs uri
        self._ran = False

    # --- discovery ---------------------------------------------------

    def get_hadoop_bin(self) -> list[str]:
        return self.fs.hadoop_bin

    def get_hadoop_version(self) -> str:
        return self.fs.get_version()

    def _hadoop_dirs(self) -> Iterator[str]:
        env = dict(os.environ)
        env.update(self._env_extra)
        for var in ("HADOOP_PREFIX", "HADOOP_HOME", "HADOOP_INSTALL",
                    "HADOOP_MAPRED_HOME"):
            if env.get(var):
                yield env[var]
        # guess a home from the binary's parent (mrjob/hadoop.py:571-593)
        try:
            bin0 = self.get_hadoop_bin()[0]
        except Exception:
            bin0 = None
        if bin0 and os.sep in bin0:
            home = os.path.abspath(
                os.path.join(os.path.realpath(os.path.dirname(bin0)), "..")
            )
            if home not in _BAD_HADOOP_HOMES:
                yield home
        for var in sorted(env):
            if var.startswith("HADOOP_") and var.endswith("_HOME"):
                yield env[var]

    def get_hadoop_streaming_jar(self) -> str:
        if self._streaming_jar:
            return self._streaming_jar
        candidates: list[str] = []
        seen: set[str] = set()
        for home in self._hadoop_dirs():
            if home in seen or not os.path.isdir(home):
                continue
            seen.add(home)
            for dirpath, _, filenames in os.walk(home):
                for name in filenames:
                    if _STREAMING_JAR_RE.match(name):
                        candidates.append(os.path.join(dirpath, name))
        if not candidates:
            raise RuntimeError(
                "Hadoop streaming jar not found; set hadoop_streaming_jar"
            )
        candidates.sort(
            key=lambda p: (len(p.split(os.sep)),
                           len(os.path.basename(p)), p)
        )
        self._streaming_jar = candidates[0]
        return self._streaming_jar

    # --- upload ------------------------------------------------------

    def _get_scratch(self) -> str:
        if self._scratch is None:
            self._scratch = tempfile.mkdtemp(prefix="mrjob-spark-hadoop-")
        return self._scratch

    def _upload(self, local_path: str, name: str | None = None) -> str:
        """Put one local file into the job's HDFS files dir; idempotent
        per path."""
        local_path = os.path.abspath(local_path)
        if local_path in self._uploaded_uris:
            return self._uploaded_uris[local_path]
        name = name or os.path.basename(local_path)
        uri = posixpath.join(self._files_dir, name)
        self.fs.put(local_path, uri)
        self._uploaded_uris[local_path] = uri
        return uri

    def _prepare_uploads(self) -> tuple[list[str], list[str], list[str]]:
        """Returns (-files entries, -archives entries, input URIs)."""
        import pyspark.cloudpickle as cloudpickle

        scratch = self._get_scratch()
        self.fs.mkdir(self._files_dir)

        job_pkl = os.path.join(scratch, "job.pkl")
        with open(job_pkl, "wb") as fh:
            fh.write(cloudpickle.dumps(self.job))

        files = [
            self._upload(job_pkl) + "#job.pkl",
            self._upload(_zip_package(scratch)) + "#mrjob_spark.zip",
        ]
        for entry in list(self.job.FILES) + list(
            getattr(self.job, "DIRS", []) or []
        ):
            path, _, alias = str(entry).partition("#")
            name = alias or os.path.basename(path.rstrip("/"))
            files.append(self._upload(path) + "#" + name)

        archives = []
        for entry in list(getattr(self.job, "ARCHIVES", []) or []):
            path, _, alias = str(entry).partition("#")
            name = alias or os.path.basename(path)
            archives.append(self._upload(path) + "#" + name)

        inputs = []
        for i, p in enumerate(self.input_paths):
            if "://" in p:
                inputs.append(p)
            else:
                import glob as globmod

                matches = sorted(globmod.glob(p)) or [p]
                for j, m in enumerate(matches):
                    inputs.append(self._upload(
                        m, "input-%05d-%05d-%s" % (i, j, os.path.basename(m))
                    ))
        if not inputs:
            raise ValueError("no input: pass input_paths")
        return files, archives, inputs

    # --- command rendering -------------------------------------------

    def _uses_yarn(self) -> bool:
        return self.fs.uses_yarn()

    def _args_for_streaming_step(
        self, step, step_num: int, files: list[str], archives: list[str],
        inputs: list[str], output_uri: str,
    ) -> list[str]:
        """The launcher prefix + the shared streaming body
        (:class:`StreamingStepRenderer`)."""
        return (
            self.get_hadoop_bin()
            + ["jar", self.get_hadoop_streaming_jar()]
            + self._streaming_step_body(
                step, step_num, files, archives, inputs, output_uri
            )
        )

    # --- execution ---------------------------------------------------

    def run(self) -> "HadoopJobRunner":
        from mrjob_spark.dataflow.step import MRStep

        if self._ran:
            return self
        steps = self.job.steps()
        for step in steps:
            if not isinstance(step, MRStep):
                raise NotImplementedError(
                    "-r hadoop runs streaming (MRStep) steps; %r needs the"
                    " Spark runner" % type(step).__name__
                )
            if getattr(step, "mapper_raw", None):
                raise NotImplementedError(
                    "mapper_raw under -r hadoop needs the input-manifest"
                    " machinery (reference mrjob/bin.py manifest setup);"
                    " use -r inline/local/spark"
                )

        files, archives, inputs = self._prepare_uploads()

        for step_num, step in enumerate(steps):
            last = step_num == len(steps) - 1
            output_uri = (
                self.output_dir
                if last
                else posixpath.join(
                    self._tmp_hdfs, "step-output", "%04d" % step_num
                )
            )
            args = self._args_for_streaming_step(
                step, step_num, files, archives, inputs, output_uri
            )
            interp = self._run_hadoop_jar(args, step_num, len(steps))
            self._log_interpretations.append(interp)
            self._counters_per_step.append(interp.get("counters", {}))
            inputs = [output_uri]
        self._ran = True
        return self

    def _run_hadoop_jar(self, args: list[str], step_num: int,
                        num_steps: int) -> dict:
        env = dict(os.environ)
        env.update(self._env_extra)
        proc = subprocess.Popen(
            args, stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env
        )
        stdout, stderr = proc.communicate()
        text = stderr.decode("utf-8", "replace")
        interp = self._interpret_stderr(text)
        interp["stdout"] = stdout.decode("utf-8", "replace")
        if proc.returncode != 0:
            cause, log_excerpt = self._probable_cause(
                interp.get("application_id")
            )
            msg = (
                "step %d of %d failed with returncode %d"
                % (step_num + 1, num_steps, proc.returncode)
            )
            if cause:
                msg += "\nProbable cause of failure:\n" + cause
            if log_excerpt:
                # raw task-log lines ride along so explain_failure /
                # diagnose can re-extract the embedded traceback from
                # the exception text alone
                msg += "\n--- task log excerpt ---\n" + log_excerpt
            tail = "\n".join(text.splitlines()[-12:])
            raise RuntimeError(msg + "\n--- hadoop stderr tail ---\n" + tail)
        return interp

    def _interpret_stderr(self, text: str) -> dict:
        return interpret_driver_stderr(text)

    # --- failure interpretation --------------------------------------

    def _log_dirs(self) -> Iterator[str]:
        env = dict(os.environ)
        env.update(self._env_extra)
        for d in self._hadoop_log_dirs:
            yield d
        for var in ("MOCK_HADOOP_LOG_DIR", "HADOOP_LOG_DIR", "YARN_LOG_DIR"):
            if env.get(var):
                yield env[var]
        for home in self._hadoop_dirs():
            yield os.path.join(home, "logs")
        yield "/var/log/hadoop-yarn"
        yield "/var/log/hadoop"

    def _probable_cause(
        self, application_id: str | None
    ) -> tuple[str | None, str | None]:
        """Scan task logs for the documented Hadoop failure shapes (same
        pattern library as ``mrjob_spark diagnose``); returns the cause
        summary plus a bounded raw excerpt of the log that yielded it."""
        import glob as globmod

        from mrjob_spark.dataflow.errors import extract_probable_cause

        seen: set[str] = set()
        for log_dir in self._log_dirs():
            if log_dir in seen or not os.path.isdir(log_dir):
                continue
            seen.add(log_dir)
            sub = os.path.join(
                log_dir, "userlogs", application_id or "*", "*"
            )
            texts = []
            for name in ("stderr", "syslog"):
                for path in sorted(globmod.glob(os.path.join(sub, name))):
                    try:
                        with open(path, errors="replace") as fh:
                            texts.append(fh.read())
                    except OSError:
                        continue
            if texts:
                joined = "\n".join(texts)
                cause = extract_probable_cause(joined)
                if cause:
                    excerpt = "\n".join(joined.splitlines()[-40:])
                    return cause, excerpt
        return None, None

    # --- output ------------------------------------------------------

    def cat_output(self) -> Iterator:
        if not self._ran:
            self.run()
        read = self.job.OUTPUT_PROTOCOL().read
        for uri in self.fs.ls(self.output_dir):
            name = posixpath.basename(uri)
            if name.startswith(("_", ".")):
                continue  # Hadoop convention (mrjob/runner.py:512-556)
            for line in self.fs.cat_lines(uri):
                if line:
                    yield read(line)

    def collect_output(self) -> list:
        return list(self.cat_output())

    def counters(self) -> dict:
        """Merged across steps (this engine's runner convention); the
        per-step split stays on ``_log_interpretations`` like the
        reference's ``counters()`` list."""
        merged: dict = {}
        for step_counters in self._counters_per_step:
            for group, names in step_counters.items():
                g = merged.setdefault(group, {})
                for name, amount in names.items():
                    g[name] = g.get(name, 0) + amount
        return merged

    # --- cleanup -----------------------------------------------------

    def cleanup(self) -> None:
        import shutil

        if self._scratch:
            shutil.rmtree(self._scratch, ignore_errors=True)
            self._scratch = None
        try:
            self.fs.rm(self._tmp_hdfs)
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.cleanup()
        return False


__all__ = ["HadoopJobRunner", "find_hadoop_bin", "fully_qualify_hdfs_path"]
