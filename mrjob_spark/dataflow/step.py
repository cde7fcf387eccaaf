"""Step descriptions — the dataflow IR.

Mirrors the reference's step model (``mrjob/step.py:180-321``): a job is a
list of steps; each :class:`MRStep` holds up to three substeps (mapper,
combiner, reducer), each of which is either a Python generator function, a
shell command (``*_cmd``), and/or bracketed by ``*_init``/``*_final`` hooks
and an optional shell ``*_pre_filter``. :class:`SparkStep` is the free-form
escape hatch (``mrjob/job.py:478-493``, X6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

#: Substep function slots accepted by MRStep (cf. mrjob/step.py:144-176).
_FN_SLOTS = (
    "mapper",
    "mapper_init",
    "mapper_final",
    "mapper_raw",
    "combiner",
    "combiner_init",
    "combiner_final",
    "reducer",
    "reducer_init",
    "reducer_final",
)
_CMD_SLOTS = (
    "mapper_cmd",
    "combiner_cmd",
    "reducer_cmd",
    "mapper_pre_filter",
    "combiner_pre_filter",
    "reducer_pre_filter",
)


@dataclass
class MRStep:
    """One map/combine/reduce stage.

    Generator contracts (reference ``mrjob/job.py:260-338``):

    * ``mapper(key, value)`` — yields 0..n ``(key, value)`` pairs.
    * ``combiner(key, values)`` — values is an iterator; may yield 0..n pairs.
    * ``reducer(key, values)`` — values is a LAZY iterator (safe for huge
      groups); may yield 0..n pairs.
    * ``*_init()`` / ``*_final()`` — run once per task before/after; may
      yield pairs themselves.
    * ``mapper_raw(local_path, uri)`` — one whole input file per call
      (``mrjob/job.py:365-374``).
    * ``*_cmd`` — replace the substep with a shell command over encoded
      lines (``mrjob/job.py:340-351``); ``*_pre_filter`` — shell predicate
      piped in front of the substep (``mrjob/job.py:353-363``).
    """

    mapper: Optional[Callable] = None
    mapper_init: Optional[Callable] = None
    mapper_final: Optional[Callable] = None
    mapper_raw: Optional[Callable] = None
    mapper_cmd: Optional[str] = None
    mapper_pre_filter: Optional[str] = None
    combiner: Optional[Callable] = None
    combiner_init: Optional[Callable] = None
    combiner_final: Optional[Callable] = None
    combiner_cmd: Optional[str] = None
    combiner_pre_filter: Optional[str] = None
    reducer: Optional[Callable] = None
    reducer_init: Optional[Callable] = None
    reducer_final: Optional[Callable] = None
    reducer_cmd: Optional[str] = None
    reducer_pre_filter: Optional[str] = None
    jobconf: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.has_mapper and not self.has_reducer and not self.has_combiner:
            raise ValueError("MRStep needs at least one of mapper/combiner/reducer")
        if self.mapper and self.mapper_raw:
            raise ValueError("can't specify both mapper and mapper_raw")
        if self.mapper_cmd and (self.mapper or self.mapper_raw):
            raise ValueError("can't specify both mapper_cmd and a mapper fn")
        if self.combiner_cmd and self.combiner:
            raise ValueError("can't specify both combiner_cmd and a combiner fn")
        if self.reducer_cmd and self.reducer:
            raise ValueError("can't specify both reducer_cmd and a reducer fn")

    @property
    def has_mapper(self) -> bool:
        return any(
            getattr(self, s) is not None
            for s in ("mapper", "mapper_raw", "mapper_cmd", "mapper_init",
                      "mapper_final", "mapper_pre_filter")
        )

    @property
    def has_combiner(self) -> bool:
        return any(
            getattr(self, s) is not None
            for s in ("combiner", "combiner_cmd", "combiner_init",
                      "combiner_final", "combiner_pre_filter")
        )

    @property
    def has_reducer(self) -> bool:
        return any(
            getattr(self, s) is not None
            for s in ("reducer", "reducer_cmd", "reducer_init",
                      "reducer_final", "reducer_pre_filter")
        )

    def description(self, step_num: int = 0) -> dict:
        """JSON-able step description, same shape family as the reference
        (``mrjob/step.py:301-321``) — used for logging/inspection only."""
        d = {"type": "streaming", "step_num": step_num}
        for s in _FN_SLOTS:
            if getattr(self, s) is not None:
                d[s] = {"type": "script"}
        for s in _CMD_SLOTS:
            if getattr(self, s) is not None:
                d[s] = {"type": "command", "command": getattr(self, s)}
        if self.jobconf:
            d["jobconf"] = dict(self.jobconf)
        return d


#: JarStep arg-interpolation sentinels (``mrjob/step.py:30-46``): replaced
#: at run time with the step's input path(s) / output directory.
#: GENERIC_ARGS expands to the ``-Dkey=value`` property list derived from
#: ``jobconf`` at that position in ``args`` (when absent, the properties
#: are passed as JVM ``-D`` flags before the main class instead).
INPUT = "<input>"
OUTPUT = "<output>"
GENERIC_ARGS = "<generic_args>"


@dataclass
class JarStep:
    """X7 JVM jar step (``mrjob/step.py:421-460``): run a custom jar
    between streaming steps, with :data:`INPUT` / :data:`OUTPUT` sentinels
    in ``args`` interpolated to the step's input path(s) and a fresh
    output directory (``mrjob/runner.py:971-990``).

    Contract mirrored from the reference: the jar reads files under
    INPUT, writes its result files into OUTPUT (which must not exist yet
    — the FileOutputFormat convention), and line-oriented content flows
    between streaming steps through ``INTERNAL_PROTOCOL`` encoding.
    ``jobconf`` entries become ``-D`` JVM system properties. A note on
    parity: the reference's local/inline sim runners refuse jar steps
    outright (Hadoop-cluster only); here the jar runs as a driver-side
    JVM process over materialized step IO — the local-mode analogue of
    Hadoop's between-step HDFS barrier, and an explicit, documented break
    in the otherwise-lazy plan."""

    jar: str
    args: list = field(default_factory=list)
    main_class: Optional[str] = None
    jobconf: dict = field(default_factory=dict)

    def description(self, step_num: int = 0) -> dict:
        d = {"type": "jar", "jar": self.jar, "step_num": step_num}
        if self.main_class:
            d["main_class"] = self.main_class
        if self.args:
            d["args"] = list(self.args)
        if self.jobconf:
            d["jobconf"] = dict(self.jobconf)
        return d


@dataclass
class SparkScriptStep:
    """X6 external-script form (``mrjob/step.py:517-571``): a standalone
    pyspark script run through ``spark-submit``, with :data:`INPUT` /
    :data:`OUTPUT` sentinels in ``args`` interpolated exactly like
    :class:`JarStep`. The script reads line files under INPUT, writes its
    result files into OUTPUT (which must not exist yet), and the runner
    bridges both ends through the step protocols. ``spark_args`` pass
    straight to spark-submit (``['--executor-memory', '2G']``);
    ``jobconf`` entries become ``--conf k=v`` pairs."""

    script: str
    args: list = field(default_factory=list)
    jobconf: dict = field(default_factory=dict)
    spark_args: list = field(default_factory=list)

    def description(self, step_num: int = 0) -> dict:
        d = {"type": "spark_script", "script": self.script,
             "step_num": step_num}
        if self.args:
            d["args"] = list(self.args)
        if self.jobconf:
            d["jobconf"] = dict(self.jobconf)
        if self.spark_args:
            d["spark_args"] = list(self.spark_args)
        return d

    def submit_target(self) -> list:
        return [self.script]


@dataclass
class SparkJarStep:
    """X6 JVM-app form (``mrjob/step.py:473-515``): a Java/Scala Spark
    application submitted through ``spark-submit [--class main_class]
    <jar>`` — distinct from :class:`JarStep`, which launches a plain
    ``java -jar`` (the Hadoop-jar contract). INPUT/OUTPUT sentinels in
    ``args`` interpolate exactly like :class:`SparkScriptStep`, and the
    same materialized-IO barrier bridges it into a streaming chain;
    ``spark_args`` pass straight to spark-submit and ``jobconf`` entries
    become ``--conf k=v`` pairs."""

    jar: str
    main_class: Optional[str] = None
    args: list = field(default_factory=list)
    jobconf: dict = field(default_factory=dict)
    spark_args: list = field(default_factory=list)

    def description(self, step_num: int = 0) -> dict:
        d = {"type": "spark_jar", "jar": self.jar, "step_num": step_num}
        if self.main_class:
            d["main_class"] = self.main_class
        if self.args:
            d["args"] = list(self.args)
        if self.jobconf:
            d["jobconf"] = dict(self.jobconf)
        if self.spark_args:
            d["spark_args"] = list(self.spark_args)
        return d

    # the submit target spark-submit sees in place of a script path
    def submit_target(self) -> list:
        target = []
        if self.main_class:
            target += ["--class", self.main_class]
        return target + [self.jar]


@dataclass
class SparkStep:
    """Free-form Spark escape hatch (X6, ``mrjob/job.py:478-493``): the
    function receives ``(spark, input_rdd)`` — where ``input_rdd`` is the
    previous step's (key, value) pair RDD, or ``None`` for step 0 with no
    pair input — and returns a new pair RDD."""

    spark: Callable
    jobconf: dict = field(default_factory=dict)

    def description(self, step_num: int = 0) -> dict:
        return {"type": "spark", "step_num": step_num}


def spool_stdin(job, input_paths: list) -> list:
    """Replace ``'-'`` entries with a temp file holding stdin's contents.

    The reference dumps stdin to a local file before any step runs
    (``mrjob/runner.py:1069-1088``) so that path-consuming first steps —
    ``mapper_raw``, :class:`JarStep`, :class:`SparkScriptStep`, Hadoop
    input formats — see a real file instead of silently reading nothing.
    Both runners call this once up front; ``sandbox()``-replaced
    ``job.stdin`` is honored, stdin is read exactly once even if ``'-'``
    repeats, and the returned list is a copy.
    """
    if "-" not in input_paths:
        return list(input_paths)
    import sys
    import tempfile

    fh = getattr(job, "stdin", None)
    data = fh.read() if fh is not None else sys.stdin.buffer.read()
    if isinstance(data, str):
        data = data.encode("utf-8")
    tmp = tempfile.NamedTemporaryFile(
        prefix="mrjob_spark_stdin_", suffix=".txt", delete=False
    )
    tmp.write(data)
    tmp.close()
    out, seen = [], False
    for p in input_paths:
        if p == "-":
            if not seen:
                out.append(tmp.name)
                seen = True
        else:
            out.append(p)
    return out


# ---------------------------------------------------------------------------
# Protocol-position plan (the reference's pick_protocols semantics)
# ---------------------------------------------------------------------------


def script_substep_indexes(steps) -> dict:
    """Index the job's SCRIPT (Python) substeps in order, exactly like the
    reference's ``_script_step_mapping`` (``mrjob/job.py:983-1004`` over
    ``mrjob/step.py:301-321`` descriptions):

    * only ``mapper`` and ``reducer`` substeps are indexed (combiners
      never are — they borrow the mapper's output protocol);
    * a step's mapper counts when the description renders one: step 0,
      any explicit mapper slot, or any explicit combiner slot (the
      reference injects an identity *script* mapper in those cases so
      combiners sit on a protocol-stable wire) — EXCEPT when it is a
      ``mapper_cmd`` (type ``command``, not indexed);
    * a ``reducer_cmd`` is likewise type ``command``, not indexed.

    Returns ``{(step_num, 'mapper'|'reducer'): script_index}``. Protocol
    choice then follows ``_pick_protocol_instances``
    (``mrjob/job.py:1017-1050``): the LAST index writes OUTPUT_PROTOCOL
    (even when cmd substeps follow — their transformed bytes ARE the job
    output), the FIRST reads INPUT_PROTOCOL, all others read/write
    INTERNAL_PROTOCOL. ``*_cmd`` substeps just transform bytes on
    whatever wire they sit on.
    """
    mapping: dict = {}
    idx = 0
    for i, step in enumerate(steps):
        if not isinstance(step, MRStep):
            continue
        renders_mapper = i == 0 or step.has_mapper or step.has_combiner
        if renders_mapper and step.mapper_cmd is None:
            mapping[(i, "mapper")] = idx
            idx += 1
        if step.has_reducer and step.reducer_cmd is None:
            mapping[(i, "reducer")] = idx
            idx += 1
    return mapping


class ProtocolPlan:
    """Per-job wire-protocol assignment for the three runners.

    Collapses the reference's byte wires into what a native-pairs engine
    needs at each edge:

    * ``write_for(step_num, kind)`` — the protocol a script mapper/reducer
      ENCODES with (what any cmd/combiner/shuffle after it receives);
    * ``read_for(step_num, kind)`` — the protocol it DECODES its input
      bytes with (INPUT for the job's first script substep — which is how
      a script reducer behind a cmd-only mapper sees raw ``(None, line)``
      pairs — INTERNAL otherwise);
    * ``mapper_output(step_num)`` — the combiner wire: the step's mapper
      output protocol, or RawValue when the mapper is a cmd
      (``mrjob/job.py:1006-1015``);
    * ``cmd_decode(step_num)`` — how to interpret bytes leaving a cmd
      substep: the read protocol of the NEXT script substep anywhere
      later in the job, else OUTPUT (the bytes are job output).
    """

    def __init__(self, job, steps):
        self._job = job
        self._map = script_substep_indexes(steps)
        self._n = len(self._map)
        self._steps = steps
        # one instance per wire position, built once: protocol __init__
        # can be non-trivial (_LibJSONProtocol re-imports its json lib),
        # and local.py rebuilds the plan inside every task (ADVICE r6)
        self._protos = {
            "input": job.INPUT_PROTOCOL(),
            "internal": job.INTERNAL_PROTOCOL(),
            "output": job.OUTPUT_PROTOCOL(),
        }

    def _proto(self, which: str):
        return self._protos[which]

    def has_script(self, step_num: int, kind: str) -> bool:
        """Whether the step renders a SCRIPT mapper/reducer substep."""
        return (step_num, kind) in self._map

    def write_for(self, step_num: int, kind: str):
        idx = self._map.get((step_num, kind))
        if idx is None:
            return None  # command substep: transforms bytes, no protocol
        return self._proto("output" if idx == self._n - 1 else "internal")

    def read_for(self, step_num: int, kind: str):
        idx = self._map.get((step_num, kind))
        if idx is None:
            return None
        return self._proto("input" if idx == 0 else "internal")

    def mapper_output(self, step_num: int):
        if (step_num, "mapper") in self._map:
            return self.write_for(step_num, "mapper")
        # cmd (or absent) mapper: combiners sit on a raw-value wire
        from .protocols import RawValueProtocol

        return RawValueProtocol()

    def cmd_decode(self, step_num: int, after: str = "mapper"):
        """Protocol for bytes leaving the (step_num, after) cmd substep:
        the next script substep's read protocol, else OUTPUT."""
        order = {"mapper": 0, "reducer": 1}
        here = (step_num, order[after])
        nxt = None
        for (i, kind), idx in sorted(
            self._map.items(), key=lambda kv: (kv[0][0], order[kv[0][1]])
        ):
            if (i, order[kind]) > here:
                nxt = (i, kind)
                break
        if nxt is None:
            return self._proto("output")
        return self.read_for(*nxt)


# ---------------------------------------------------------------------------
# Hadoop streaming's stderr side-channel (A8 for shell substeps)
# ---------------------------------------------------------------------------

#: ``reporter:counter:<group>,<name>,<amount>`` / ``reporter:status:<msg>``
#: — the wire protocol Hadoop streaming's PipeMapRed reads from every task
#: process's stderr (see ``incrCounter()`` in hadoop-streaming's
#: PipeMapRed.java; the reference parses the same lines in
#: ``mrjob/parse.py:111-150`` for its sim runners). A ``*_cmd`` substep
#: has no other way to reach ``runner.counters()``.
_REPORTER_COUNTER_RE = None
_REPORTER_STATUS_RE = None


def parse_reporter_stderr(stderr, add=None) -> tuple:
    """Split a task's stderr bytes into (counters, statuses, other lines).

    ``counters`` is ``{group: {name: amount}}``; when ``add`` (a counter
    sink with the accumulator's ``.add(dict)`` surface) is given, each
    counter line is ALSO pushed there. ``other`` lines are the task's
    real diagnostics — callers forward them to their own stderr so user
    debugging output is not eaten with the protocol lines.
    """
    global _REPORTER_COUNTER_RE, _REPORTER_STATUS_RE
    import re

    if _REPORTER_COUNTER_RE is None:
        _REPORTER_COUNTER_RE = re.compile(
            rb"^reporter:counter:([^,]*),([^,]*),(-?\d+)\s*$"
        )
        _REPORTER_STATUS_RE = re.compile(rb"^reporter:status:(.*)$")

    counters: dict = {}
    statuses: list = []
    other: list = []
    for line in (stderr or b"").splitlines():
        m = _REPORTER_COUNTER_RE.match(line)
        if m:
            group = m.group(1).decode("utf-8", "replace")
            name = m.group(2).decode("utf-8", "replace")
            amount = int(m.group(3))
            counters.setdefault(group, {})
            counters[group][name] = counters[group].get(name, 0) + amount
            if add is not None:
                add({group: {name: amount}})
            continue
        m = _REPORTER_STATUS_RE.match(line)
        if m:
            statuses.append(m.group(1).decode("utf-8", "replace"))
            continue
        other.append(line)
    return counters, statuses, other
