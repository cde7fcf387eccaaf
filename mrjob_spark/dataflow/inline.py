"""InlineJobRunner — single-process, zero-Spark execution of a SparkMRJob.

The reference ships an inline runner (``mrjob/inline.py:60-120``) whose
whole point is DEVELOPMENT SPEED: run the job in-process with no cluster,
no serialization boundary, and real breakpoints, then switch ``-r`` to the
distributed runner unchanged. This is that, for the Spark engine: the same
step semantics as :class:`~mrjob_spark.dataflow.runner.SparkJobRunner`
(generator substeps, 0/≥2-pair combiners, SORT_VALUES on canonical encoded
bytes, counters, ``*_cmd``/``*_pre_filter`` subprocesses, protocols at the
edges), executed eagerly over Python lists.

Differential testing is the contract: ``tests/test_inline.py`` runs probe
jobs through BOTH runners and asserts identical output — the reference's
own strategy for validating its Spark harness against the simpler engines
(``tests/spark/test_harness.py:244-300``).

Not for data of any size — one process, fully materialized. The Spark
runner is the same job's scale path.
"""

from __future__ import annotations

import glob as _glob
import itertools
import os
import subprocess
import sys
from typing import Iterator, Optional

from mrjob_spark.dataflow.local import _open_lines
from mrjob_spark.dataflow.protocols import crossing
from mrjob_spark.dataflow.step import (
    GENERIC_ARGS,
    INPUT,
    OUTPUT,
    JarStep,
    MRStep,
    ProtocolPlan,
    SparkJarStep,
    SparkScriptStep,
    SparkStep,
    spool_stdin,
)


class _DictCounterSink:
    """Stands in for the Spark accumulator (same ``add`` surface)."""

    def __init__(self):
        self.value: dict = {}

    def add(self, other: dict) -> None:
        for group, counters in other.items():
            dst = self.value.setdefault(group, {})
            for name, amount in counters.items():
                dst[name] = dst.get(name, 0) + amount


class InlineJobRunner:
    """Execute a :class:`SparkMRJob` eagerly in this process.

    Accepts ``input_paths`` (text files/globs, ``.gz`` transparent) or
    ``input_pairs`` (an iterable of ``(key, value)``). ``output_dir``
    writes a single ``part-00000`` with OUTPUT_PROTOCOL, mirroring the
    reference inline runner's layout (``mrjob/inline.py:146-160``).
    """

    def __init__(
        self,
        job,
        input_paths: Optional[list] = None,
        input_pairs=None,
        output_dir: Optional[str] = None,
        jobconf: Optional[dict] = None,
        conf_jobconf: Optional[dict] = None,
        cmdenv: Optional[dict] = None,
        setup: Optional[list] = None,
    ):
        if input_paths is not None and input_pairs is not None:
            raise ValueError("pass input_paths or input_pairs, not both")
        self.job = job
        self.input_paths = list(input_paths or [])
        self.input_pairs = input_pairs
        self.output_dir = output_dir
        # same env derivation as SparkJobRunner._task_env so cmd substeps
        # behave identically under both runners (differential tests rely
        # on it): conf-file jobconf under job + step jobconf as
        # Hadoop-style vars, cmdenv on top
        merged = dict(conf_jobconf or {})
        merged.update(job.JOBCONF)
        for step in job.steps():
            merged.update(getattr(step, "jobconf", {}) or {})
        merged.update(jobconf or {})
        self._jobconf = merged
        self._cmdenv = dict(cmdenv or {})
        self._setup = list(setup or [])
        self._counters = _DictCounterSink()
        job._counter_acc = self._counters
        self._output: Optional[list] = None

    def _task_env(self) -> dict:
        env = dict(os.environ)
        env.update(
            {str(k).replace(".", "_"): str(v) for k, v in self._jobconf.items()}
        )
        env.update(self._cmdenv)
        return env

    # -- input ----------------------------------------------------------

    def _source_pairs(self, steps) -> list:
        if self.input_pairs is not None:
            return list(self.input_pairs)
        read = self.job.INPUT_PROTOCOL().read
        first = steps[0]
        if isinstance(first, MRStep) and first.mapper_raw is not None:
            # handled by _run_step; deliver (path, None) markers
            return [(p, None) for p in self._expand_paths()]
        pairs = []
        for path in self._expand_paths():
            # extension-transparent decompression like every other runner
            # (mrjob/cat.py:78-104; local.py's _open_lines is the twin —
            # a .bz2 input must not crash under -r inline alone, ADVICE/
            # VERDICT r6)
            with _open_lines(path) as fh:
                for line in fh:
                    pairs.append(read(line.rstrip(b"\r\n")))
        return pairs

    def _expand_paths(self) -> list:
        out = []
        for p in self.input_paths:
            if p == "-":  # stdin; run() spools it to a file before this
                continue
            matches = sorted(_glob.glob(p))
            # absolute so mapper_raw path markers survive the task-workdir
            # chdir in run()
            out.extend(
                [os.path.abspath(m) for m in matches]
                if matches
                else [os.path.abspath(p)]
            )
        return out

    def _make_workdir(self) -> str | None:
        """Mirror the reference's task working directory (mrjob/sim.py):
        every FILES/DIRS entry appears under its basename (or ``#alias``)
        via symlink, ARCHIVES unpack into a directory of that name, and
        tasks run with this directory as cwd — so reference example code
        like ``open('stop_words.txt')`` works unmodified (the idiom the
        reference's own MRMostUsedWord uses; found by
        tests/test_reference_differential.py). Returns None when the job
        ships nothing, leaving cwd untouched."""
        job = self.job
        files = list(job.FILES) + list(getattr(job, "DIRS", []) or [])
        archives = list(getattr(job, "ARCHIVES", []) or [])
        if not files and not archives:
            return None
        import tarfile
        import tempfile
        import zipfile

        wd = tempfile.mkdtemp(prefix="mrjob_spark_inline_wd_")
        for entry in files:
            path, _, alias = str(entry).partition("#")
            name = alias or os.path.basename(path.rstrip("/"))
            dest = os.path.join(wd, name)
            if not os.path.exists(dest):
                os.symlink(os.path.abspath(path), dest)
        for entry in archives:
            path, _, alias = str(entry).partition("#")
            name = alias or os.path.basename(path)
            dest = os.path.join(wd, name)
            if os.path.exists(dest):
                continue
            if tarfile.is_tarfile(path):
                os.makedirs(dest, exist_ok=True)
                with tarfile.open(path) as tf:
                    # filter="data" rejects absolute/../ members (tar-slip)
                    # and strips setuid bits etc. (PEP 706; 3.11.4+)
                    tf.extractall(dest, filter="data")
            elif zipfile.is_zipfile(path):
                os.makedirs(dest, exist_ok=True)
                with zipfile.ZipFile(path) as zf:
                    # zipfile.extract sanitizes absolute paths and '..'
                    # natively, but reject suspicious members loudly
                    # rather than silently relocating them
                    bad = [
                        n for n in zf.namelist()
                        if n.startswith(("/", "\\")) or ".." in n.split("/")
                    ]
                    if bad:
                        raise ValueError(
                            f"unsafe archive member paths in {path}: {bad[:3]}"
                        )
                    zf.extractall(dest)
            else:
                os.symlink(os.path.abspath(path), dest)
        return wd

    # -- execution ------------------------------------------------------

    def run(self) -> "InlineJobRunner":
        steps = self.job.steps()
        # '-' becomes a spooled temp file up front, so mapper_raw markers
        # and a step-0 SparkScriptStep/JarStep (which consume paths, not
        # pairs) see stdin data instead of silently dropping it
        self.input_paths = spool_stdin(self.job, self.input_paths)
        pairs = self._source_pairs(steps)
        # run() is supported without the context manager, and repeatedly on
        # one runner: reap the previous run's workdir here so neither
        # pattern leaks a mrjob_spark_inline_wd_* dir (__exit__ stays as
        # the backstop for the final one; ADVICE r5)
        prev_wd = getattr(self, "_workdir", None)
        if prev_wd:
            import shutil

            shutil.rmtree(prev_wd, ignore_errors=True)
        workdir = self._workdir = self._make_workdir()
        launch_dir = os.getcwd()
        try:
            if workdir:
                os.chdir(workdir)
            plan = ProtocolPlan(self.job, steps)
            internal = self.job.INTERNAL_PROTOCOL()
            wire, consumed = internal, False
            for step_num, step in enumerate(steps):
                is_last = step_num == len(steps) - 1
                if isinstance(step, SparkStep):
                    raise NotImplementedError(
                        "SparkStep requires the Spark runner (make_runner)"
                    )
                if isinstance(step, JarStep):
                    pairs = self._run_jar_step(step, step_num, pairs)
                    wire, consumed = internal, False
                elif isinstance(step, (SparkScriptStep, SparkJarStep)):
                    pairs = self._run_spark_script_step(step, step_num, pairs)
                    wire, consumed = internal, False
                else:
                    pairs, wire, consumed = self._run_step(
                        step, step_num, pairs, plan,
                        in_wire=wire, is_last=is_last,
                    )
                if not is_last and not consumed and wire is not None:
                    # a non-final step's output crosses its writer's wire
                    # into the next step's first script reader (jar/script
                    # steps moved real INTERNAL bytes already). When the
                    # next step leads with a cmd, skip — its pipe encodes
                    # from native pairs with `wire`.
                    nxt = steps[step_num + 1]
                    if isinstance(nxt, MRStep) and nxt.mapper_cmd is None:
                        target = (plan.read_for(step_num + 1, "mapper")
                                  or plan.read_for(step_num + 1, "reducer")
                                  or wire)
                        rt = crossing(wire, target)
                        pairs = [rt(k, v) for k, v in pairs]
                        wire = target
                    elif not isinstance(nxt, MRStep):
                        rt = crossing(wire, internal)
                        pairs = [rt(k, v) for k, v in pairs]
                        wire = internal
        finally:
            if workdir:
                os.chdir(launch_dir)
        self._output = pairs

        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            write = self.job.OUTPUT_PROTOCOL().write
            with open(os.path.join(self.output_dir, "part-00000"), "wb") as fh:
                for k, v in pairs:
                    fh.write(write(k, v) + b"\n")
        return self

    def _run_spark_script_step(self, step, step_num: int, pairs: list) -> list:
        """X6 external-app forms inline: run the pyspark script
        (:class:`SparkScriptStep`) or JVM Spark app (:class:`SparkJarStep`)
        via spark-submit over temp-file IO — same contract as the Spark
        runner, differentially tested, so an app-bearing job debugs
        under -r inline like any other. Free-form apps (no OUTPUT
        sentinel — the ``mrjob spark-submit`` tool's shape) own their IO:
        nothing is spooled and the chain continues empty."""
        import shutil
        import subprocess
        import tempfile

        scratch = tempfile.mkdtemp(
            prefix=f"mrjob_spark_inline_script_{step_num}_"
        )
        out_dir = os.path.join(scratch, "output")  # must NOT exist yet
        step_args = [str(a) for a in step.args]
        uses_input = any(INPUT in a for a in step_args)
        uses_output = any(OUTPUT in a for a in step_args)

        if not uses_input:
            in_arg = ""
        elif step_num == 0 and self.input_paths:
            in_arg = ",".join(p for p in self.input_paths if p != "-")
        else:
            write = self.job.INTERNAL_PROTOCOL().write
            in_dir = os.path.join(scratch, "input")
            os.makedirs(in_dir)
            with open(os.path.join(in_dir, "part-00000"), "wb") as fh:
                for k, v in pairs:
                    fh.write(write(k, v) + b"\n")
            in_arg = in_dir

        args = [
            a.replace(INPUT, in_arg).replace(OUTPUT, out_dir)
            for a in step_args
        ]
        submit = shutil.which("spark-submit") or os.path.join(
            os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
        )
        cmd = [submit]
        spark_args = [str(a) for a in step.spark_args]
        if "--master" not in spark_args:
            cmd += ["--master", "local[2]"]
        cmd += spark_args
        for k, v in step.jobconf.items():
            cmd += ["--conf", f"{k}={v}"]
        cmd += step.submit_target() + args
        proc = subprocess.run(cmd, capture_output=True, text=True)
        self.spark_submit_stdout = proc.stdout
        self.spark_submit_stderr = proc.stderr
        if proc.returncode != 0:
            raise RuntimeError(
                f"spark app step {step_num} failed (rc={proc.returncode}): "
                f"{' '.join(cmd)}\n{proc.stderr[-2000:]}"
            )

        if not uses_output:
            return []
        read = self.job.INTERNAL_PROTOCOL().read
        out = []
        for name in sorted(os.listdir(out_dir)):
            if name.startswith(("_", ".")):
                continue
            with open(os.path.join(out_dir, name), "rb") as fh:
                for line in fh:
                    out.append(read(line.rstrip(b"\r\n")))
        return out

    def _run_jar_step(self, step: JarStep, step_num: int, pairs: list) -> list:
        """X7 inline: the same driver-side JVM subprocess contract as the
        Spark runner (``mrjob/step.py:421-460``). Note the reference's
        inline runner REFUSES jar steps outright — supporting them keeps
        this runner a faithful single-process twin of the Spark one, so a
        jar-bearing job debugs locally like any other."""
        import shutil
        import subprocess
        import tempfile

        scratch = tempfile.mkdtemp(prefix=f"mrjob_spark_inline_jar_{step_num}_")
        out_dir = os.path.join(scratch, "output")  # must NOT exist yet

        if step_num == 0 and self.input_paths:
            in_arg = ",".join(p for p in self.input_paths if p != "-")
        else:
            write = self.job.INTERNAL_PROTOCOL().write
            in_dir = os.path.join(scratch, "input")
            os.makedirs(in_dir)
            with open(os.path.join(in_dir, "part-00000"), "wb") as fh:
                for k, v in pairs:
                    fh.write(write(k, v) + b"\n")
            in_arg = in_dir

        props = [f"-D{k}={v}" for k, v in step.jobconf.items()]
        args, generic_spliced = [], False
        for a in step.args:
            if a == GENERIC_ARGS:
                args.extend(props)
                generic_spliced = True
            else:
                args.append(
                    str(a).replace(INPUT, in_arg).replace(OUTPUT, out_dir)
                )
        java = shutil.which("java") or "java"
        cmd = [java]
        if not generic_spliced:
            cmd += props
        if step.main_class:
            cmd += ["-cp", step.jar, step.main_class]
        else:
            cmd += ["-jar", step.jar]
        cmd += args
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"jar step {step_num} failed (rc={proc.returncode}): "
                f"{' '.join(cmd)}\n{proc.stderr[-2000:]}"
            )

        read = self.job.INTERNAL_PROTOCOL().read
        out = []
        for name in sorted(os.listdir(out_dir)):
            if name.startswith(("_", ".")):
                continue
            with open(os.path.join(out_dir, name), "rb") as fh:
                for line in fh:
                    out.append(read(line.rstrip(b"\n")))
        return out

    def _run_step(self, step: MRStep, step_num: int, pairs: list, plan,
                  in_wire=None, is_last: bool = False):
        """One MRStep under the reference's protocol-position wire
        semantics (see :class:`~mrjob_spark.dataflow.step.ProtocolPlan`;
        decisions mirror the Spark runner's ``_compile_step`` 1:1,
        differential-pinned). Returns ``(pairs, out_wire, consumed)``."""
        job = self.job
        internal = job.INTERNAL_PROTOCOL()
        enc = internal.encode_sort_key
        m_write = plan.write_for(step_num, "mapper")
        r_write = plan.write_for(step_num, "reducer")
        r_read = plan.read_for(step_num, "reducer")
        m_out = plan.mapper_output(step_num)
        script_reducer = step.has_reducer and step.reducer_cmd is None
        combinable = step.combiner is not None and step.combiner_cmd is None
        consumed = False

        # ---- mapper ----
        if step.mapper_cmd:
            if combinable or step.reducer_cmd:
                decode = m_out
            elif script_reducer:
                decode = r_read
            else:
                decode = plan.cmd_decode(step_num, "mapper")
                consumed = True
            pairs = self._pipe(pairs, step.mapper_cmd,
                               raw_lines=(step_num == 0 and self.input_paths),
                               encode=in_wire, decode=decode)
        else:
            out = []
            if step.mapper_pre_filter:
                pairs = self._pipe(pairs, step.mapper_pre_filter,
                                   raw_lines=(step_num == 0 and bool(self.input_paths)),
                                   filter_only=True, encode=in_wire)
            if step.mapper_init:
                out.extend(step.mapper_init() or ())
            if step.mapper_raw is not None and step_num == 0:
                for path, _ in pairs:
                    os.environ["mapreduce_map_input_file"] = path
                    out.extend(step.mapper_raw(path, path) or ())
            elif step.mapper is not None:
                for k, v in pairs:
                    out.extend(step.mapper(k, v) or ())
            else:
                out.extend(pairs)  # identity mapper
            if step.mapper_final:
                out.extend(step.mapper_final() or ())
            if (combinable or script_reducer) and m_write is not None:
                # mapper output crosses its write-protocol wire before the
                # combiner/reducer reads it — without this, type-observing
                # user code diverges (tuple vs list under JSON;
                # test_reference_differential.py). m_write is None when
                # the step renders NO mapper substep (step>0 reducer-only
                # — the boundary crossing already landed pairs on the
                # reducer's wire; the identity pass adds no crossing).
                rt = crossing(
                    m_write, r_read if (script_reducer and not combinable)
                    else m_write)
                pairs = [rt(k, v) for k, v in out]
            else:
                # mapper-ONLY (or cmd-consumed) output: the reference
                # writes it straight through the mapper's position-chosen
                # protocol (OUTPUT for the job's last script substep —
                # cat_output applies that crossing); an extra INTERNAL
                # crossing here would be WRONG when the protocols differ
                # (JSON internal would mangle tuples a pickle output
                # preserves)
                pairs = out

        if not (step.has_reducer or step.has_combiner):
            return pairs, (m_out if step.mapper_cmd else m_write), consumed

        # ---- shuffle & sort (single "reducer task") ----
        # Reducer grouping is on the byte-level group key of the wire the
        # reducer READS (Hadoop groups on bytes-before-first-tab; the
        # reference's local runner splits reducer tasks at exactly those
        # byte-key changes, mrjob/sim.py:525-527). For keyed wires this
        # is the encoded key — for value-only wires (script reducer
        # behind a cmd mapper reading RawValue lines) each distinct line
        # is its own group even though every line decodes to key=None.
        sort_values = bool(job.SORT_VALUES)
        wire_r = (r_read if script_reducer else m_out) or internal
        gk = wire_r.group_key
        keyfn = (lambda k, v: enc(k)) if combinable else gk
        keyed = [((keyfn(k, v), enc(v) if sort_values else b""), (k, v))
                 for k, v in pairs]
        keyed.sort(key=lambda item: item[0])

        # ---- combiner (once per key, like a single map task's combine) ----
        if step.combiner is not None and step.combiner_cmd is None:
            combined = []
            if step.combiner_init:
                combined.extend(step.combiner_init() or ())
            # combiners group by DECODED key (the reference's combiner
            # task sorts byte lines then groups decoded-equal runs —
            # unlike reducers there is no byte-key task split)
            for _, group in itertools.groupby(keyed, key=lambda i: i[1][0]):
                vals = [kv for _, kv in group]
                key = vals[0][0]
                combined.extend(
                    step.combiner(key, (v for _, v in vals)) or ()
                )
            if step.combiner_final:
                combined.extend(step.combiner_final() or ())
            # combiner output sits on the mapper-output wire
            # (mrjob/job.py:1040-1044) and crosses into the reducer's read
            # protocol before the reducer sees it
            cx = crossing(m_out, r_read if script_reducer else m_out)
            keyed = [((gk(k, v), enc(v) if sort_values else b""), (k, v))
                     for k, v in (cx(k, v) for k, v in combined)]
            keyed.sort(key=lambda item: item[0])

        if not step.has_reducer:
            return [kv for _, kv in keyed], m_out, consumed

        # ---- reducer ----
        if step.reducer_cmd:
            # the reference feeds reducer cmds FULLY line-sorted input
            # (external sort of the map output): equal pairs must arrive
            # adjacent for uniq-style cmds — sort by (enc k, enc v)
            # regardless of SORT_VALUES
            feed = sorted((kv for _, kv in keyed),
                          key=lambda kv: (enc(kv[0]), enc(kv[1])))
            out = self._pipe(feed, step.reducer_cmd,
                             encode=m_out,
                             decode=plan.cmd_decode(step_num, "reducer"))
            return out, None, True
        if step.reducer_pre_filter:
            # the pre-filter sits on the bytes the reducer READS: pairs
            # here have already crossed onto r_read's decoded domain, so
            # re-encoding them with m_out diverges (and crashes outright
            # when a cmd mapper leaves m_out=RawValue but the reducer
            # reads a structured INPUT_PROTOCOL — ADVICE r6)
            flat = self._pipe([kv for _, kv in keyed],
                              step.reducer_pre_filter, filter_only=True,
                              encode=(r_read if script_reducer else m_out))
            keyed = [((gk(k, v), enc(v) if sort_values else b""), (k, v))
                     for k, v in flat]
            keyed.sort(key=lambda item: item[0])

        out = []
        if step.reducer_init:
            out.extend(step.reducer_init() or ())
        for kbytes, group in itertools.groupby(keyed, key=lambda i: i[0][0]):
            vals = (kv for _, kv in group)
            first_key, first_value = next(vals)
            values = itertools.chain(
                (first_value,), (v for _, v in vals)
            )
            if step.reducer is not None:
                out.extend(step.reducer(first_key, values) or ())
            else:
                out.extend((first_key, v) for v in values)
        if step.reducer_final:
            out.extend(step.reducer_final() or ())
        return out, r_write, consumed

    # -- shell substeps -------------------------------------------------

    def _pipe(self, pairs: list, cmd: str, raw_lines: bool = False,
              filter_only: bool = False, encode=None, decode=None) -> list:
        """Encoded lines through a shell command (``mrjob/job.py:340-363``),
        same protocol selection as the Spark runner's ``_pipe_pairs``.
        ``encode``/``decode`` are protocol instances overriding the wire
        each side of the cmd sits on (the reference's protocol-position
        rule — e.g. a terminal cmd's stdout decodes with OUTPUT_PROTOCOL
        because it IS the job output)."""
        internal = self.job.INTERNAL_PROTOCOL()
        edge = self.job.INPUT_PROTOCOL() if raw_lines else (encode or internal)
        write = edge.write
        read = edge.read if (filter_only or not raw_lines) else internal.read
        if raw_lines and not filter_only:
            read = internal.read
        if decode is not None and not filter_only:
            read = decode.read

        payload = b"".join(write(*kv) + b"\n" for kv in pairs)
        full_cmd = "; ".join([*self._setup, cmd])
        proc = subprocess.run(
            full_cmd, shell=True, input=payload, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, check=False, env=self._task_env(),
        )
        # Hadoop streaming's stderr side-channel: `reporter:counter:...`
        # lines from the command reach runner.counters(), everything else
        # passes through to real stderr (mrjob/parse.py:111-150)
        from mrjob_spark.dataflow.step import parse_reporter_stderr

        _, _, other = parse_reporter_stderr(proc.stderr, add=self._counters.add)
        for line in other:
            sys.stderr.buffer.write(line + b"\n")
        return [
            read(line)
            for line in proc.stdout.split(b"\n")
            if line
        ]

    # -- results --------------------------------------------------------

    def cat_output(self) -> Iterator:
        if self._output is None:
            self.run()
        # consumers see pairs as OUTPUT_PROTOCOL delivers them (the
        # reference's parse_output reads real output bytes)
        rt = self.job.OUTPUT_PROTOCOL().roundtrip
        for k, v in self._output:
            yield rt(k, v)

    def counters(self) -> dict:
        return self._counters.value

    # context-manager contract, like SparkJobRunner / the reference's
    # `with job.make_runner() as runner:` (mrjob/runner.py:671-677); exit
    # removes the task-workdir mirror
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        wd = getattr(self, "_workdir", None)
        if wd:
            import shutil

            shutil.rmtree(wd, ignore_errors=True)
        return False
