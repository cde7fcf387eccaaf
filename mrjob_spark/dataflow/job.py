"""SparkMRJob — the user-facing job class.

API-compatible in spirit with the reference's ``MRJob``
(``mrjob/job.py:89-136,260-338``): subclass, override generator methods,
optionally override :meth:`steps` for multi-step pipelines, set protocol
class attributes and :attr:`SORT_VALUES`, call :meth:`increment_counter`
from any substep. Execution happens through
:class:`~mrjob_spark.dataflow.runner.SparkJobRunner`, which compiles all
steps into one lazy Spark plan.

Example (wordcount, cf. ``mrjob/examples/mr_word_freq_count.py:20-33``)::

    class MRWordFreqCount(SparkMRJob):
        def mapper(self, _, line):
            for word in re.findall(r"[a-z']+", line.lower()):
                yield word, 1

        def combiner(self, word, counts):
            yield word, sum(counts)

        def reducer(self, word, counts):
            yield word, sum(counts)

    with MRWordFreqCount().make_runner(spark, input_paths=[...]) as r:
        r.run()
        for key, value in r.cat_output():
            ...
"""

from __future__ import annotations

import argparse
import os
import sys

from mrjob_spark.dataflow.protocols import (
    JSONProtocol,
    RawValueProtocol,
)
from mrjob_spark.dataflow.step import MRStep, SparkStep


def _is_overridden(obj, name: str) -> bool:
    return getattr(type(obj), name) is not getattr(SparkMRJob, name)


class SparkMRJob:
    """Subclassable MapReduce-style job compiled to Spark.

    Class-level knobs (same names/meaning as the reference):

    * ``INPUT_PROTOCOL`` — decodes input lines into ``(key, value)``
      (default :class:`RawValueProtocol`: key=None, value=line text;
      ``mrjob/job.py:1270``).
    * ``INTERNAL_PROTOCOL`` — NOT used for data movement (pairs stay native
      Python between steps); supplies the canonical byte encoding for
      shuffle grouping and SORT_VALUES ordering (``mrjob/job.py:1282``).
    * ``OUTPUT_PROTOCOL`` — encodes final pairs into output lines
      (default :class:`JSONProtocol`; ``mrjob/job.py:1291``).
    * ``SORT_VALUES`` — deliver each key's values sorted by their encoded
      bytes (``mrjob/job.py:1567-1593``).
    * ``JOBCONF`` — engine knobs; ``mapreduce.job.reduces`` maps to shuffle
      partition count (``mrjob/spark/runner.py:456-459``).
    * ``FILES`` — paths shipped to every task via ``SparkContext.addFile``
      (``mrjob/job.py:1410-1430``).
    * ``ARCHIVES`` — tar/zip archives shipped via ``SparkContext.addArchive``
      and unpacked into every task's file root (``mrjob/job.py:1432-1446``);
      a trailing ``#alias`` fragment names the unpack directory, else the
      file name is used. Resolve with :meth:`archive_path`.
    * ``DIRS`` — local directories shipped whole (``mrjob/job.py:1448-1464``):
      the runner tars each one and ships it like an archive aliased to the
      directory's basename.
    * ``PARTITIONER`` — optional ``f(key_bytes) -> int`` replacing the
      default crc32 shuffle partitioner (reference semantics:
      ``mrjob/job.py:1390-1408``, where it names a Hadoop partitioner class;
      here it is a callable over the canonical encoded key, which is what a
      custom partitioner actually needs — e.g. route on a key prefix the
      way ``KeyFieldBasedPartitioner`` routes on key fields).
    """

    INPUT_PROTOCOL = RawValueProtocol
    INTERNAL_PROTOCOL = JSONProtocol
    OUTPUT_PROTOCOL = JSONProtocol
    SORT_VALUES = False
    JOBCONF: dict = {}
    FILES: list = []
    ARCHIVES: list = []
    DIRS: list = []
    PARTITIONER = None

    def __init__(self, args=None):
        # Counter sink; the runner swaps in a Spark accumulator before
        # compiling the plan (cf. mrjob/spark/harness.py:202-229).
        self._counter_acc = None
        #: CLI args given at construction (the reference's ``MRJob(args)``
        #: pattern, ``mrjob/job.py:89-136``) — consumed by the no-argument
        #: :meth:`make_runner` / :meth:`execute` forms.
        self._cli_args = list(args) if args is not None else None

    # ------------------------------------------------------------------
    # overridable substeps (single-step jobs)
    # ------------------------------------------------------------------

    def mapper(self, key, value):
        raise NotImplementedError

    def mapper_init(self):
        raise NotImplementedError

    def mapper_final(self):
        raise NotImplementedError

    def mapper_raw(self, local_path, uri):
        raise NotImplementedError

    def combiner(self, key, values):
        raise NotImplementedError

    def combiner_init(self):
        raise NotImplementedError

    def combiner_final(self):
        raise NotImplementedError

    def reducer(self, key, values):
        raise NotImplementedError

    def reducer_init(self):
        raise NotImplementedError

    def reducer_final(self):
        raise NotImplementedError

    def spark(self, spark_session, input_rdd):
        raise NotImplementedError

    # command substeps are class attributes on the instance level:
    mapper_cmd: str | None = None
    reducer_cmd: str | None = None
    mapper_pre_filter: str | None = None
    combiner_pre_filter: str | None = None
    reducer_pre_filter: str | None = None

    # ------------------------------------------------------------------
    # steps
    # ------------------------------------------------------------------

    def steps(self) -> list:
        """Default: one step assembled from whichever substep methods the
        subclass overrides (``mrjob/job.py:497-545``). Override to chain
        multiple :class:`MRStep` / :class:`SparkStep` objects."""
        if _is_overridden(self, "spark"):
            return [SparkStep(spark=self.spark, jobconf=dict(self.JOBCONF))]

        kwargs = {}
        for slot in (
            "mapper", "mapper_init", "mapper_final", "mapper_raw",
            "combiner", "combiner_init", "combiner_final",
            "reducer", "reducer_init", "reducer_final",
        ):
            if _is_overridden(self, slot):
                kwargs[slot] = getattr(self, slot)
        for slot in (
            "mapper_cmd", "reducer_cmd",
            "mapper_pre_filter", "combiner_pre_filter", "reducer_pre_filter",
        ):
            if getattr(self, slot):
                kwargs[slot] = getattr(self, slot)
        if not kwargs:
            raise ValueError(
                f"{type(self).__name__} defines no substeps and does not "
                "override steps()"
            )
        kwargs["jobconf"] = dict(self.JOBCONF)
        return [MRStep(**kwargs)]

    # ------------------------------------------------------------------
    # counters / status (A8; mrjob/job.py:547-597)
    # ------------------------------------------------------------------

    def increment_counter(self, group: str, counter: str, amount: int = 1):
        """Increment a global counter, readable after the run via
        ``runner.counters()``. Implemented as a Spark accumulator add —
        exactly-once per *successful* task, same caveat as Hadoop."""
        if self._counter_acc is not None:
            self._counter_acc.add({str(group): {str(counter): int(amount)}})

    def set_status(self, msg: str):
        """Status messages are advisory; Spark has no per-task status
        channel, so this is a no-op hook kept for API compatibility."""

    # ------------------------------------------------------------------
    # testing surface (mrjob/job.py:798-894, 1597-1656 and
    # docs/guides/testing.rst — what a switching user's unit tests call)
    # ------------------------------------------------------------------

    def sandbox(self, stdin=None, stdout=None, stderr=None):
        """Redirect the job's stdio for tests (``mrjob/job.py:1597-1656``):
        ``stdin`` feeds a ``'-'`` input path on either runner, ``stdout``
        captures the cat-output stream. Returns ``self`` for chaining."""
        import io

        self.stdin = stdin if stdin is not None else io.BytesIO()
        self.stdout = stdout if stdout is not None else io.BytesIO()
        self.stderr = stderr if stderr is not None else io.BytesIO()
        return self

    def parse_output(self, chunks):
        """Decode OUTPUT_PROTOCOL bytes into ``(key, value)`` pairs
        (``mrjob/job.py:634-646``) — the reference idiom
        ``job.parse_output(runner.cat_output())`` for byte streams.
        (:meth:`SparkJobRunner.cat_output` already yields decoded pairs;
        this exists for code that reads raw part files or sandboxed
        stdout.)"""
        read = self.OUTPUT_PROTOCOL().read
        buf = b""
        for chunk in chunks:
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for line in lines:
                if line:
                    yield read(line)
        if buf:
            yield read(buf)

    def _mrstep(self, step_num: int) -> MRStep:
        steps = self.steps()
        step = steps[step_num]
        if not isinstance(step, MRStep):
            raise TypeError(f"step {step_num} is not an MRStep")
        return step

    def map_pairs(self, pairs, step_num: int = 0):
        """One map task's worth of pairs through ``mapper_init`` →
        ``mapper`` → ``mapper_final`` (``mrjob/job.py:798-835``); yields
        ``(key, value)`` pairs. The unit-test entry point for a single
        mapper substep."""
        step = self._mrstep(step_num)
        if step.mapper_init:
            yield from step.mapper_init() or ()
        mapper = step.mapper
        if mapper is None and not step.has_reducer and not step.has_combiner:
            raise ValueError(f"no mapper in step {step_num}")
        for key, value in pairs:
            yield from (mapper(key, value) or ()) if mapper else ((key, value),)
        if step.mapper_final:
            yield from step.mapper_final() or ()

    def combine_pairs(self, pairs, step_num: int = 0):
        """One combine task (``mrjob/job.py:837-851``). ``pairs`` must
        arrive key-grouped (sorted), as after a shuffle."""
        yield from self._grouped_pairs(pairs, "combiner", step_num)

    def reduce_pairs(self, pairs, step_num: int = 0):
        """One reduce task (``mrjob/job.py:853-867``). ``pairs`` must
        arrive key-grouped (sorted), as after a shuffle; each key's values
        reach the reducer as a LAZY iterator."""
        yield from self._grouped_pairs(pairs, "reducer", step_num)

    def _grouped_pairs(self, pairs, kind: str, step_num: int):
        import itertools

        step = self._mrstep(step_num)
        fn = getattr(step, kind)
        if fn is None:
            raise ValueError(f"no {kind} in step {step_num}")
        init = getattr(step, f"{kind}_init")
        final = getattr(step, f"{kind}_final")
        if init:
            yield from init() or ()
        for key, group in itertools.groupby(pairs, lambda kv: kv[0]):
            yield from fn(key, (v for _, v in group)) or ()
        if final:
            yield from final() or ()

    # ------------------------------------------------------------------
    # runner
    # ------------------------------------------------------------------

    def make_runner(self, spark=None, **kwargs):
        """Build a runner for this job.

        Two forms, matching both this engine's API and the reference's:

        * ``job.make_runner(spark, input_paths=[...], ...)`` — explicit
          :class:`SparkJobRunner` construction (kwargs: ``input_paths``,
          ``input_rdd``, ``output_dir``, ``num_reducers``, ...).
        * ``MRJob([args...]).make_runner()`` — the reference's canonical
          programmatic pattern (``mrjob/job.py:689-736``): the runner is
          assembled from the argv the job was constructed with, conf files
          included; ``-r inline`` needs no Spark at all, ``-r spark``
          builds a session on ``--spark-master``.
        """
        from mrjob_spark.dataflow.runner import SparkJobRunner

        if spark is not None:
            return SparkJobRunner(self, spark, **kwargs)
        if kwargs:
            raise ValueError(
                "pass an active SparkSession as the first argument when "
                "giving runner kwargs"
            )
        if self._cli_args is None:
            raise ValueError(
                "no-argument make_runner() needs CLI args at construction: "
                "MRMyJob(['-r', 'inline', 'input.txt']).make_runner()"
            )
        return self._build_runner(self._load_options(None))

    def make_inline_runner(self, **kwargs):
        """Build an :class:`InlineJobRunner` — single-process, zero-Spark
        execution for development and unit tests (the reference's
        ``-r inline``, ``mrjob/inline.py:60-120``). Same step semantics;
        run the identical job on Spark by switching to :meth:`make_runner`.

        :param kwargs: ``input_paths``, ``input_pairs``, ``output_dir``.
        """
        from mrjob_spark.dataflow.inline import InlineJobRunner

        return InlineJobRunner(self, **kwargs)

    def make_local_runner(self, **kwargs):
        """Build a :class:`LocalJobRunner` — subprocess-per-task execution
        with an external sort (the reference's ``-r local``,
        ``mrjob/local.py:143-166``): the runner for tests that need real
        PROCESS isolation (crashing ``*_init`` hooks, env/cwd mutation,
        native-code faults stay contained in one task). Same step
        semantics as inline and Spark; differential-tested against both
        and against the reference's own runners.

        :param kwargs: ``input_paths``, ``output_dir``, ``num_mappers``,
            ``num_reducers``, ``jobconf``, ``cmdenv``, ``setup``,
            ``max_output_files``.
        """
        from mrjob_spark.dataflow.local import LocalJobRunner

        return LocalJobRunner(self, **kwargs)

    def make_hadoop_runner(self, **kwargs):
        """Build a :class:`HadoopJobRunner` — shell out to ``hadoop jar
        <streaming jar>`` per step (the reference's ``-r hadoop``,
        ``mrjob/hadoop.py:324-482``). Control-plane only: data stays on
        HDFS; tasks re-enter through
        ``python -m mrjob_spark.dataflow.hstream`` with the same wire
        plan as every other runner. Tested against the executing mock
        cluster (:mod:`mrjob_spark.testing.mockhadoop`).

        :param kwargs: ``input_paths``, ``output_dir``, ``hadoop_bin``,
            ``hadoop_streaming_jar``, ``hadoop_tmp_dir``,
            ``hadoop_extra_args``, ``num_reducers``, ``jobconf``,
            ``cmdenv``, ``setup``, ``env``, ``bootstrap_sys_path``.
        """
        from mrjob_spark.dataflow.hadoop import HadoopJobRunner

        return HadoopJobRunner(self, **kwargs)

    def make_emr_runner(self, **kwargs):
        """Build an :class:`EMRJobRunner` — upload to S3, create/join/
        pool-reuse an EMR cluster, submit ``command-runner.jar``
        streaming steps, poll, and read results from S3 (the reference's
        ``-r emr``, ``mrjob/emr.py``). Inject boto3-shaped clients via
        ``emr_client=``/``s3_client=`` (tests use
        :class:`mrjob_spark.testing.mockemr.MockEMRService`); without
        them the runner builds real boto3 clients on ``region=``.

        :param kwargs: ``input_paths``, ``output_dir``, ``cluster_id``,
            ``pool_clusters``, ``pool_name``, ``cloud_tmp_dir``,
            ``release_label``, ``instance_type``, ``num_core_instances``,
            ``max_mins_idle``, ``check_cluster_every``, ``num_reducers``,
            ``jobconf``, ``cmdenv``, ``setup``, ...
        """
        from mrjob_spark.dataflow.emr import EMRJobRunner

        return EMRJobRunner(self, **kwargs)

    def make_dataproc_runner(self, **kwargs):
        """Build a :class:`DataprocJobRunner` — upload to GCS, create/
        join a Dataproc cluster, submit one ``hadoopJob`` per step
        through the jobs API, stream the chunked driver output, and
        read results from GCS (the reference's ``-r dataproc``,
        ``mrjob/dataproc.py``). Clients must be injected in this
        environment (``cluster_client=``/``job_client=``/
        ``storage_client=``/``logging_client=`` — tests use
        :class:`mrjob_spark.testing.mockdataproc.MockDataprocService`).

        :param kwargs: ``input_paths``, ``output_dir``,
            ``cluster_name``, ``project_id``, ``region``,
            ``cloud_tmp_dir``, ``image_version``, ``instance_type``,
            ``num_core_instances``, ``max_mins_idle``,
            ``check_cluster_every``, ``num_reducers``, ``jobconf``,
            ``cmdenv``, ``setup``, ...
        """
        from mrjob_spark.dataflow.dataproc import DataprocJobRunner

        return DataprocJobRunner(self, **kwargs)

    # ------------------------------------------------------------------
    # distributed-cache path resolution (inside tasks)
    # ------------------------------------------------------------------

    @staticmethod
    def archive_path(name: str) -> str:
        """Task-side path of an unpacked ``ARCHIVES``/``DIRS`` entry: the
        directory Spark extracted ``<archive>#<name>`` into. Valid on the
        driver and inside any substep (including ``*_init``)."""
        from pyspark import SparkFiles

        return os.path.join(SparkFiles.getRootDirectory(), name)

    def file_path(self, name: str) -> str:
        """Task-side path of a ``FILES`` entry: the Spark-distributed copy
        (``SparkFiles.get``) when one exists, else the original driver-side
        path from ``FILES`` with a matching basename — which is what makes
        file args work identically under the inline runner (single
        process, no distributed cache to resolve against)."""
        try:
            from pyspark import SparkFiles

            p = SparkFiles.get(name)
            if os.path.exists(p):
                return p
        except Exception:
            pass
        for f in self.FILES:
            if os.path.basename(f) == name:
                return f
        return name

    # ------------------------------------------------------------------
    # command line (mrjob/job.py:601-687: `python my_job.py <input...>`)
    # ------------------------------------------------------------------

    def configure_args(self, parser: argparse.ArgumentParser) -> None:
        """Hook for subclasses to add custom options (the reference's
        ``configure_args``/``add_passthru_arg``, ``mrjob/job.py:1080-1179``).
        Parsed values land on ``self.options`` before ``steps()`` is read,
        so substeps may close over them. Both styles work: call
        ``parser.add_argument(...)`` directly, or the reference's
        ``self.add_passthru_arg(...)`` / ``self.add_file_arg(...)``."""

    def add_passthru_arg(self, *args, **kwargs):
        """Reference-style custom option (``mrjob/job.py:1080-1129``);
        valid inside :meth:`configure_args`."""
        return self._parser.add_argument(*args, **kwargs)

    def add_file_arg(self, *args, **kwargs):
        """Custom option whose value is a FILE shipped to every task
        (``mrjob/job.py:1131-1179`` — "e.g. a SQLite DB"). The file is
        added to the distributed cache and the parsed option value is
        rewritten to the task-visible name; resolve it inside any substep
        with ``self.file_path(self.options.<dest>)``."""
        action = self._parser.add_argument(*args, **kwargs)
        self._file_arg_dests.append(action.dest)
        return action

    def arg_parser(self) -> argparse.ArgumentParser:
        parser = argparse.ArgumentParser(
            prog=type(self).__name__,
            description=(self.__doc__ or "").strip().splitlines()[0]
            if self.__doc__
            else None,
        )
        parser.add_argument(
            "input", nargs="*", default=["-"],
            help="input paths/globs (.gz/.bz2 transparent); '-' = stdin",
        )
        parser.add_argument("-o", "--output-dir", default=None,
                            help="write part-* files here instead of stdout")
        parser.add_argument(
            "--cat-output", action=argparse.BooleanOptionalAction,
            default=None,
            help="stream output to stdout (default: only when no -o)",
        )
        parser.add_argument("--num-reducers", type=int, default=None,
                            help="shuffle partition count")
        parser.add_argument(
            "--jobconf", action="append", default=[], metavar="KEY=VALUE",
            help="jobconf knob, repeatable (mapreduce.job.reduces, ...)",
        )
        parser.add_argument(
            "--cmdenv", action="append", default=[], metavar="KEY=VALUE",
            help="env var for *_cmd/*_pre_filter subprocesses, repeatable",
        )
        parser.add_argument(
            "--setup", action="append", default=[], metavar="CMD",
            help="shell line run before each *_cmd/*_pre_filter subprocess "
                 "(repeatable; conf setup lines run first)",
        )
        parser.add_argument(
            "-c", "--conf-path", action="append", default=None,
            help="mrjob.conf to load, repeatable — later files win "
                 "(default: $MRJOB_CONF, ~/.mrjob.conf, /etc/mrjob.conf)",
        )
        parser.add_argument(
            "--no-conf", action="store_true",
            help="skip config files entirely",
        )
        parser.add_argument(
            "--step-output-dir", default=None,
            help="materialize each non-final step's output under "
                 "<dir>/000N/ (debugging; forces per-step barriers)",
        )
        parser.add_argument(
            "--steps", action="store_true",
            help="print the job's step descriptions as JSON and exit "
                 "(the reference's --steps introspection, "
                 "mrjob/job.py:914-930)",
        )
        parser.add_argument("--max-output-files", type=int, default=None)
        parser.add_argument("--compression", choices=("gzip", "bzip2"),
                            default=None)
        parser.add_argument("--partition-output-by-key", action="store_true")
        parser.add_argument("--emulate-map-input-file", action="store_true",
                            help="expose $mapreduce_map_input_file to mappers")
        parser.add_argument("--file", action="append", default=[],
                            help="ship a file to every task (repeatable)")
        parser.add_argument("--archive", action="append", default=[],
                            help="ship + unpack an archive (repeatable)")
        parser.add_argument("--dir", action="append", default=[],
                            help="ship a directory whole (repeatable)")
        parser.add_argument(
            "--spark-master", default=None,
            help="(default: $SPARK_GRAFT_MASTER, conf spark_master, "
                 "local[*])",
        )
        parser.add_argument(
            "-r", "--runner",
            choices=("spark", "inline", "local", "hadoop", "emr",
                     "dataproc"),
            default="spark",
            help="inline = single-process, no Spark (dev/test; "
                 "mrjob/inline.py:60-120); local = subprocess-per-task "
                 "with external sort (process isolation; "
                 "mrjob/local.py:143-166); hadoop = shell out to "
                 "hadoop jar <streaming jar> (mrjob/hadoop.py:324-482); "
                 "emr = S3 uploads + EMR cluster steps (mrjob/emr.py; "
                 "needs boto3 creds, or $MOCK_EMR_BASE_DIR for the "
                 "executing mock service); dataproc = GCS uploads + "
                 "Dataproc jobs API (mrjob/dataproc.py; "
                 "$MOCK_DATAPROC_BASE_DIR for the executing mock)",
        )
        parser.add_argument("--hadoop-bin", default=None,
                            help="hadoop launcher (default: "
                                 "$HADOOP_HOME/bin/hadoop, then $PATH)")
        parser.add_argument("--hadoop-streaming-jar", default=None,
                            help="path to hadoop-streaming*.jar "
                                 "(default: searched under Hadoop homes)")
        parser.add_argument("--hadoop-tmp-dir", default=None,
                            help="HDFS scratch root (default tmp/mrjob)")
        parser.add_argument("--region", default=None,
                            help="-r emr: AWS region for boto3 clients")
        parser.add_argument("--cluster-id", default=None,
                            help="-r emr: join this existing cluster")
        parser.add_argument("--pool-clusters", action="store_true",
                            help="-r emr: reuse/leave WAITING pooled "
                                 "clusters (mrjob/pool.py tag protocol)")
        parser.add_argument("--pool-name", default=None,
                            help="-r emr: pool to draw from "
                                 "(default 'default')")
        parser.add_argument("--cloud-tmp-dir", default=None,
                            help="-r emr: s3://bucket/prefix/ scratch "
                                 "root")
        parser.add_argument("--release-label", default=None,
                            help="-r emr: EMR release (default "
                                 "emr-6.9.0)")
        parser.add_argument("--instance-type", default=None,
                            help="-r emr: core/task instance type")
        parser.add_argument("--num-core-instances", type=int, default=None,
                            help="-r emr: core instance count")
        parser.add_argument("--max-mins-idle", type=float, default=None,
                            help="-r emr: idle auto-termination for "
                                 "pooled/persistent clusters")
        self._parser = parser
        self._file_arg_dests: list = []
        self.configure_args(parser)
        return parser

    def _log_counters(self, runner) -> None:
        """Print the run's counters to stderr in the reference's format
        (``mrjob/logs/counters.py:19-33``: "Counters: N", then sorted
        groups and name=value lines) — the after-run visibility every
        mrjob CLI user expects."""
        counters = runner.counters()
        n = sum(len(g) for g in counters.values())
        if not n:
            return
        err = getattr(self, "stderr", None) or sys.stderr.buffer
        lines = [f"Counters: {n}"]
        for group in sorted(counters):
            if counters[group]:
                lines.append(f"\t{group}")
                for name in sorted(counters[group]):
                    lines.append(f"\t\t{name}={counters[group][name]}")
        err.write(("\n".join(lines) + "\n").encode("utf-8"))
        err.flush()

    def _load_options(self, args=None):
        """Parse argv into ``self.options``, applying the file-arg rewrite
        (``mrjob/job.py:1131-1179``: the file joins the distributed cache
        and the option value becomes its task-visible name)."""
        if args is None:
            args = self._cli_args
        opts = self.arg_parser().parse_args(args)
        self.options = opts
        # collected separately AND recomputed from the class attribute so
        # that parsing twice — execute() after make_runner(), say — never
        # ships the same file twice; the direct-make_runner(spark, ...)
        # path (no _build_runner) reads self.FILES, so it must be current
        # here too
        self._file_arg_files = []
        for dest in self._file_arg_dests:
            value = getattr(opts, dest, None)
            if value:
                self._file_arg_files.append(value)
                setattr(opts, dest, os.path.basename(value))
        self.FILES = list(type(self).FILES) + self._file_arg_files
        return opts

    def execute(self, args=None, spark=None):
        """Parse argv, run the job, and stream output like the reference's
        ``run_job`` (``mrjob/job.py:611-645``): part files under ``-o``,
        OUTPUT_PROTOCOL lines on stdout otherwise.

        :param args: argv list (default: the args the job was constructed
            with, else ``sys.argv[1:]``).
        :param spark: reuse an existing ``SparkSession`` (tests); default
            builds one on ``--spark-master``.
        """
        opts = self._load_options(args)

        if opts.steps:
            import json

            print(
                json.dumps(
                    [s.description(i) for i, s in enumerate(self.steps())]
                )
            )
            return None

        runner = self._build_runner(opts, spark=spark)
        with runner:
            runner.run()
            self._log_counters(runner)
            cat = opts.cat_output
            if cat is None:
                cat = not opts.output_dir
            if cat:
                write = self.OUTPUT_PROTOCOL().write
                out = getattr(self, "stdout", None) or sys.stdout.buffer
                for key, value in runner.cat_output():
                    out.write(write(key, value) + b"\n")
                out.flush()
        return runner

    def _build_runner(self, opts, spark=None):
        """Assemble the runner ``opts`` describe, without running it.
        mrjob.conf opts sit UNDER everything explicit: CLI switch > job
        class attribute > config file (mrjob/conf.py precedence)."""
        from mrjob_spark.dataflow.conf import (
            combine_envs,
            combine_jobconfs,
            load_runner_opts,
        )

        conf = (
            {}
            if opts.no_conf
            else load_runner_opts(opts.runner, conf_paths=opts.conf_path)
        )

        def _kv_pairs(items):
            out = {}
            for item in items:
                key, _, value = item.partition("=")
                out[key] = value
            return out

        # conf-file jobconf travels separately so the runner can seat it
        # UNDER the class JOBCONF (precedence: CLI > class attr > conf file,
        # mrjob/conf.py); the jobconf kwarg stays CLI-only
        conf_jobconf = combine_jobconfs(conf.get("jobconf"))
        jobconf = combine_jobconfs(_kv_pairs(opts.jobconf))
        # combine_envs, not dict.update: a CLI *PATH value must PREPEND to
        # the conf value with ':' like conf-file layering does
        cmdenv = combine_envs(conf.get("cmdenv"), _kv_pairs(opts.cmdenv))
        setup = list(conf.get("setup") or []) + list(opts.setup)

        # conf + CLI + file-arg uploads extend the class-level lists.
        # Recomputed from the CLASS attributes each call so that building a
        # runner twice from one job instance never ships duplicates.
        cls = type(self)
        self.FILES = (
            list(cls.FILES)
            + list(conf.get("upload_files") or conf.get("files") or [])
            + list(opts.file)
            + list(getattr(self, "_file_arg_files", []) or [])
        )
        self.ARCHIVES = (
            list(cls.ARCHIVES)
            + list(conf.get("upload_archives") or conf.get("archives") or [])
            + list(opts.archive)
        )
        self.DIRS = (
            list(cls.DIRS)
            + list(conf.get("upload_dirs") or conf.get("dirs") or [])
            + list(opts.dir)
        )

        def _opt(name, cli_value, default=None):
            if cli_value is not None and cli_value is not False:
                return cli_value
            conf_value = conf.get(name)
            return default if conf_value is None else conf_value

        if opts.runner == "inline":
            return self.make_inline_runner(
                input_paths=list(opts.input) or ["-"],
                output_dir=opts.output_dir,
                jobconf=jobconf,
                conf_jobconf=conf_jobconf,
                cmdenv=cmdenv,
                setup=setup,
            )

        if opts.runner == "hadoop":
            return self.make_hadoop_runner(
                input_paths=list(opts.input) or ["-"],
                output_dir=opts.output_dir,
                hadoop_bin=(
                    opts.hadoop_bin.split()
                    if opts.hadoop_bin
                    else _opt("hadoop_bin", None)
                ),
                hadoop_streaming_jar=_opt(
                    "hadoop_streaming_jar", opts.hadoop_streaming_jar
                ),
                hadoop_tmp_dir=_opt(
                    "hadoop_tmp_dir", opts.hadoop_tmp_dir, "tmp/mrjob"
                ),
                hadoop_extra_args=_opt("hadoop_extra_args", None, []),
                num_reducers=_opt("num_reducers", opts.num_reducers),
                jobconf=jobconf,
                conf_jobconf=conf_jobconf,
                cmdenv=cmdenv,
                setup=setup,
            )

        if opts.runner == "emr":
            kwargs = dict(
                input_paths=list(opts.input) or ["-"],
                output_dir=opts.output_dir,
                region=_opt("region", opts.region),
                cluster_id=_opt("cluster_id", opts.cluster_id),
                pool_clusters=_opt(
                    "pool_clusters", opts.pool_clusters, False
                ),
                pool_name=_opt("pool_name", opts.pool_name, "default"),
                cloud_tmp_dir=_opt("cloud_tmp_dir", opts.cloud_tmp_dir),
                release_label=_opt(
                    "release_label", opts.release_label, "emr-6.9.0"
                ),
                instance_type=_opt(
                    "instance_type", opts.instance_type, "m5.xlarge"
                ),
                num_core_instances=_opt(
                    "num_core_instances", opts.num_core_instances, 2
                ),
                max_mins_idle=_opt(
                    "max_mins_idle", opts.max_mins_idle, 10.0
                ),
                num_reducers=_opt("num_reducers", opts.num_reducers),
                jobconf=jobconf,
                conf_jobconf=conf_jobconf,
                cmdenv=cmdenv,
                setup=setup,
            )
            # the executing mock service stands in for AWS when
            # $MOCK_EMR_BASE_DIR points at its base dir (CLI testability;
            # real runs use boto3 clients on --region)
            mock_base = os.environ.get("MOCK_EMR_BASE_DIR")
            if mock_base:
                from mrjob_spark.testing.mockemr import MockEMRService

                svc = MockEMRService(mock_base)
                kwargs["emr_client"] = svc.emr_client()
                kwargs["s3_client"] = svc.s3_client()
                kwargs["check_cluster_every"] = 0.001
            return self.make_emr_runner(**kwargs)

        if opts.runner == "dataproc":
            kwargs = dict(
                input_paths=list(opts.input) or ["-"],
                output_dir=opts.output_dir,
                region=_opt("region", opts.region, "us-central1"),
                cluster_name=_opt("cluster_id", opts.cluster_id),
                cloud_tmp_dir=_opt("cloud_tmp_dir", opts.cloud_tmp_dir),
                instance_type=_opt(
                    "instance_type", opts.instance_type, "n1-standard-1"
                ),
                num_core_instances=_opt(
                    "num_core_instances", opts.num_core_instances, 2
                ),
                max_mins_idle=_opt(
                    "max_mins_idle", opts.max_mins_idle, 10.0
                ),
                num_reducers=_opt("num_reducers", opts.num_reducers),
                jobconf=jobconf,
                conf_jobconf=conf_jobconf,
                cmdenv=cmdenv,
                setup=setup,
            )
            mock_base = os.environ.get("MOCK_DATAPROC_BASE_DIR")
            if mock_base:
                from mrjob_spark.testing.mockdataproc import (
                    MockDataprocService,
                )

                svc = MockDataprocService(mock_base)
                kwargs.update(
                    cluster_client=svc.cluster_client(),
                    job_client=svc.job_client(),
                    storage_client=svc.storage_client(),
                    logging_client=svc.logging_client(),
                    check_cluster_every=0.0,
                )
            return self.make_dataproc_runner(**kwargs)

        if opts.runner == "local":
            return self.make_local_runner(
                input_paths=list(opts.input) or ["-"],
                output_dir=opts.output_dir,
                num_reducers=_opt("num_reducers", opts.num_reducers),
                max_output_files=_opt(
                    "max_output_files", opts.max_output_files
                ),
                jobconf=jobconf,
                conf_jobconf=conf_jobconf,
                cmdenv=cmdenv,
                setup=setup,
            )

        if spark is None:
            from mrjob_spark.session import get_spark

            spark = get_spark(
                app_name=type(self).__name__,
                master=_opt(
                    "spark_master",
                    opts.spark_master
                    or os.environ.get("SPARK_GRAFT_MASTER"),
                    "local[*]",
                ),
            )

        runner = self.make_runner(
            spark,
            input_paths=list(opts.input) or ["-"],
            output_dir=opts.output_dir,
            num_reducers=_opt("num_reducers", opts.num_reducers),
            max_output_files=_opt("max_output_files", opts.max_output_files),
            compression=_opt("compression", opts.compression),
            partition_output_by_key=_opt(
                "partition_output_by_key", opts.partition_output_by_key, False
            ),
            emulate_map_input_file=_opt(
                "emulate_map_input_file", opts.emulate_map_input_file, False
            ),
            jobconf=jobconf,
            conf_jobconf=conf_jobconf,
            cmdenv=cmdenv,
            setup=setup,
            step_output_dir=opts.step_output_dir,
        )
        return runner

    @classmethod
    def run(cls, args=None, spark=None):
        """CLI entry point: ``python my_job.py input.txt -o out/``
        (``mrjob/job.py:601-615``). Subclass modules end with::

            if __name__ == "__main__":
                MRMyJob.run()
        """
        return cls().execute(args=args, spark=spark)
