"""Probable-cause extraction for failed dataflow jobs.

A Python mapper that raises surfaces as a ``Py4JJavaError`` whose message
is a several-hundred-line Java stack with the worker's Python traceback
embedded (usually more than once). The reference solves the same problem
for Hadoop log streams — ``mrjob/logs/errors.py:25-212`` collects errors
across step/history/task logs, prefers the Spark error that carries a
Python traceback (``_pick_spark_errors``), and prints a concise
"Probable cause of failure" with its source location (``_format_error`` /
``_describe_source``). This module is that surface for the Spark-native
runner: parse the embedded Python tracebacks out of the exception text,
prefer the one that reaches USER code (non-pyspark/py4j frames), and
report its final exception line plus the deepest user frame.

Driver-side and post-hoc only: nothing here touches the execution path —
:meth:`SparkMRJobRunner.run` attaches the summary as an exception note so
the raw error stays fully intact underneath.
"""

from __future__ import annotations

import re

_TB_HEADER = "Traceback (most recent call last):"

#: Frames from these paths are plumbing, not the user's job code — the
#: same spirit as the reference skipping Hadoop framework lines when it
#: formats a task error.
_INTERNAL_MARKERS = (
    "/pyspark/",
    "/py4j/",
    "pyspark/worker.py",
    "pyspark/serializers.py",
    "pyspark/util.py",
    "/runpy.py",
    # our own execution plumbing is not the user's job code either
    "mrjob_spark/dataflow/runner.py",
    "mrjob_spark/dataflow/inline.py",
)

_FRAME_RE = re.compile(r'\s+File "(?P<path>.+?)", line (?P<line>\d+), in (?P<func>.+)')


def _parse_tracebacks(text: str) -> list[dict]:
    """Every complete Python traceback embedded in ``text``, as
    ``{"frames": [(path, line, func), ...], "message": str}``."""
    out: list[dict] = []
    lines = text.splitlines()
    i = 0
    n = len(lines)
    while i < n:
        # the header often rides on the Java exception line, e.g.
        # 'org.apache.spark.api.python.PythonException: Traceback (...):'
        if not lines[i].strip().endswith(_TB_HEADER):
            i += 1
            continue
        frames: list[tuple[str, int, str]] = []
        message = None
        j = i + 1
        while j < n:
            line = lines[j]
            m = _FRAME_RE.match(line)
            if m:
                frames.append(
                    (m.group("path"), int(m.group("line")), m.group("func").strip())
                )
                j += 1
                continue
            if line.startswith((" ", "\t")) or not line.strip():
                # source-code echo under a frame, '    ...' elision, blanks
                j += 1
                continue
            # first non-indented line after the frames = the exception line
            message = line.strip()
            break
        if frames and message:
            out.append({"frames": frames, "message": message})
        i = j if j > i else i + 1
    return out


def _user_frames(tb: dict) -> list[tuple[str, int, str]]:
    return [
        f
        for f in tb["frames"]
        if not any(m in f[0].replace("\\", "/") for m in _INTERNAL_MARKERS)
    ]


# ---------------------------------------------------------------------------
# Hadoop/JVM/Spark task-log patterns (reference ``mrjob/logs/task.py:33-96,
# 252-440`` and ``mrjob/logs/spark.py:30-117``): when a failure carries no
# embedded Python traceback, the cause is usually one of the shapes below —
# the difference between "step failed" and "killed for exceeding memory
# limits" on a real cluster.
# ---------------------------------------------------------------------------

#: a JVM stack frame — ``task.py:33-36`` (``_JAVA_TRACEBACK_RE``), widened
#: with the Unknown Source/Native Method forms real stacks carry
_JAVA_FRAME_RE = re.compile(
    r"^\s+at .+\((?:.+\.(?:java|scala):\d+|Native Method|Unknown Source)\)",
    re.MULTILINE,
)

#: YARN's container-over-memory-limit kill notice (the canonical
#: "is running beyond physical/virtual memory limits ... Killing container")
_CONTAINER_MEMORY_RE = re.compile(
    r"Container \[pid=\d+,\s*containerID=(?P<cid>\S+?)\] is running "
    r"(?:[0-9.]+\s*[KMGT]?B\s+)?beyond (?P<kind>physical|virtual) memory "
    r"limits\.(?P<detail>[^\n]*)"
)

#: NodeManager's kill acknowledgment with the exit code
_CONTAINER_KILLED_RE = re.compile(
    r"^Container killed on request\. Exit code is (?P<code>\d+)", re.MULTILINE
)

_CONTAINER_EXIT_RE = re.compile(
    r"Container exited with a non-zero exit code (?P<code>\d+)"
)

#: Hadoop streaming's subprocess-failure stack head — ``task.py:77-80``
_SUBPROCESS_FAILED_RE = re.compile(
    r"^(?:Error: )?"  # jhist attempt errors carry this prefix
    r"java\.lang\.RuntimeException: PipeMapRed\.waitOutputThreads\(\):"
    r" subprocess failed with code (?P<code>\d+)",
    re.MULTILINE,
)

#: Spark ApplicationMaster's app-death notice — ``task.py:38-40``; the
#: reference matches the log4j record's message, so a raw-dump line may
#: still carry the timestamp/logger prefix in front
_SPARK_APP_EXITED_RE = re.compile(
    r"User application exited with status (?P<code>\d+)\s*$", re.MULTILINE
)


def classify_exit_code(code: int) -> str:
    """One-line classification of a task/container exit code (Hadoop's
    convention: 128 + signal number for signal deaths)."""
    known = {
        1: "generic task failure (see the task's own stderr)",
        134: "SIGABRT (native abort — JVM or native library assertion)",
        137: "SIGKILL — killed by the kernel OOM killer or a forced kill;"
             " raise container/executor memory",
        139: "SIGSEGV (native segmentation fault)",
        143: "SIGTERM — container killed on request (memory limit"
             " exceeded, preemption, or job kill)",
    }
    if code in known:
        return known[code]
    if code > 128:
        return f"killed by signal {code - 128}"
    return "nonzero exit"


def _java_traceback_cause(text: str) -> str | None:
    """The JVM exception headline above the first stack frame, plus a few
    frames for orientation (the reference reports the whole log4j record;
    plain dumps have no record structure, so reconstruct the head)."""
    m = _JAVA_FRAME_RE.search(text)
    if not m:
        return None
    lines = text.splitlines(keepends=False)
    # index of the line containing the first frame
    upto = text[: m.start()].count("\n")
    head = upto - 1
    while head >= 0 and (
        not lines[head].strip()
        or lines[head].lstrip().startswith(("at ", "... "))
    ):
        head -= 1
    if head < 0:
        head = upto
    frames = [ln for ln in lines[upto:] if _JAVA_FRAME_RE.match(ln)][:3]
    return "\n".join([lines[head].strip(), *frames])


#: accepted log4j layouts (reference ``mrjob/logs/log4j.py:22-39``
#: documents both): ``TIMESTAMP LEVEL logger (thread): message`` and
#: ``TIMESTAMP LEVEL [thread] logger (caller): message``, with '`` - ``'
#: as an alternative message separator. The level is restricted to the
#: real log4j levels so arbitrary prose can't false-match.
_LOG4J_RE = re.compile(
    r"^\s*(?P<timestamp>.+?)"
    r"\s+(?P<level>TRACE|DEBUG|INFO|WARN|ERROR|FATAL)"
    r"(?:\s+\[(?P<thread_b>[^\]]*)\])?"
    r"\s+(?P<logger>\S+)"
    r"(?:\s+\((?P<caller>[^)]*)\))?"
    r"(?: - |: )(?P<message>.*)$"
)


def parse_log4j_records(lines: list[str]) -> list[dict]:
    """Group raw syslog lines into log4j records (the reference's
    ``_parse_hadoop_log4j_records`` contract, ``mrjob/logs/log4j.py:
    44-71``): a line matching the header starts a record; non-matching
    lines continue the previous record's multi-line message (this is how
    a Java stack trace stays attached to its headline); leading
    non-log4j lines become level-less fake records. Each record carries
    ``start_line``/``num_lines`` so a cause can cite its source span."""
    recs: list[dict] = []
    for i, raw in enumerate(lines):
        line = raw.rstrip("\r\n")
        m = _LOG4J_RE.match(line)
        if m:
            recs.append(
                dict(
                    level=m.group("level"),
                    logger=m.group("logger"),
                    thread=m.group("thread_b") or "",
                    message=m.group("message"),
                    start_line=i,
                    num_lines=1,
                )
            )
        elif recs:
            r = recs[-1]
            r["message"] += "\n" + line
            r["num_lines"] = i - r["start_line"] + 1
        else:
            recs.append(
                dict(level="", logger="", thread="", message=line,
                     start_line=i, num_lines=1)
            )
    return recs


def hadoop_cause_with_span(text: str) -> tuple[str, int, int] | None:
    """Record-aware cause extraction: parse log4j records and match the
    failure shapes per record (the reference's ``_parse_task_syslog_
    records`` walk), returning ``(cause, start_line, num_lines)`` so the
    caller can report ``lines M-N`` provenance (``_describe_source``
    shape). Falls back to whole-text matching (span = the matching
    region's line) when the log has no log4j structure."""
    lines = text.splitlines()
    recs = parse_log4j_records(lines)
    if any(r["level"] for r in recs):
        for r in recs:
            cause = _hadoop_cause_text(r["message"])
            if cause:
                return cause, r["start_line"], r["num_lines"]
        return None
    cause = _hadoop_cause_text(text)
    if cause is None:
        return None
    return cause, 0, len(lines)


def _hadoop_cause_text(text: str) -> str | None:
    """Pattern-match the non-Python failure shapes, most specific first."""
    m = _CONTAINER_MEMORY_RE.search(text)
    if m:
        out = (
            f"container {m.group('cid')} killed for running beyond "
            f"{m.group('kind')} memory limits"
        )
        detail = m.group("detail").strip()
        if detail:
            out += f" ({detail})"
        return out + "\n\nraise the container/executor memory limit"
    m = _CONTAINER_KILLED_RE.search(text) or _CONTAINER_EXIT_RE.search(text)
    if m:
        code = int(m.group("code"))
        return (
            f"container exited with code {code}: {classify_exit_code(code)}"
        )
    m = _SUBPROCESS_FAILED_RE.search(text)
    if m:
        code = int(m.group("code"))
        return (
            f"streaming task subprocess failed with code {code}: "
            f"{classify_exit_code(code)} — the command's own stderr "
            "holds the real error"
        )
    jt = _java_traceback_cause(text)
    if jt:
        return jt
    m = _SPARK_APP_EXITED_RE.search(text)
    if m:
        code = int(m.group("code"))
        return (
            f"Spark application exited with status {code}: "
            f"{classify_exit_code(code)} — check the driver stdout for "
            "the application's own error"
        )
    return None


def extract_probable_cause(text: str) -> str | None:
    """The concise cause line (plus user-code source location) from a raw
    Spark/py4j/Hadoop error dump, or None when nothing recognizable is
    embedded.

    Selection mirrors the reference's ``_pick_spark_errors`` ordering: a
    Python traceback reaching user code beats a framework-only one; among
    those, the shortest exception message wins (the innermost re-raise —
    outer wrappers accrete "... caused by ..." prefixes). With no Python
    traceback at all, fall through the reference's task-log pattern
    library (``_hadoop_cause``): container memory kills, exit-code
    classification, JVM stack traces, Spark app death."""
    tbs = _parse_tracebacks(text)
    if not tbs:
        got = hadoop_cause_with_span(text)
        return got[0] if got else None
    tbs.sort(key=lambda tb: (bool(_user_frames(tb)), -len(tb["message"])), reverse=True)
    best = tbs[0]
    user = _user_frames(best)
    if user:
        path, lineno, func = user[-1]
        # the reference's _describe_source shape: 'line N of <path>'
        return f"{best['message']}\n\n(from line {lineno} of {path}, in {func})"
    return best["message"]


def explain_failure(exc: BaseException) -> str:
    """Concise probable-cause text for a failed dataflow run.

    Walks the exception and its ``__cause__``/``__context__`` chain (a
    py4j error's Java-side text rides on ``str(exc)``), extracts embedded
    Python tracebacks, and falls back to the exception's own last line
    when nothing is embedded — so this never returns an empty answer."""
    seen: set[int] = set()
    texts: list[str] = []
    cur: BaseException | None = exc
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        texts.append(str(cur))
        # Py4JJavaError: str() is only the summary line; the worker's
        # Python traceback lives in the Java exception's rendered stack
        jexc = getattr(cur, "java_exception", None)
        if jexc is not None:
            try:
                texts.append(str(jexc))
            except Exception:
                pass
        cur = cur.__cause__ or cur.__context__
    cause = extract_probable_cause("\n".join(texts))
    if cause:
        return cause
    first = str(exc).strip().splitlines()
    return f"{type(exc).__name__}: {first[0] if first else ''}".strip(": ")
