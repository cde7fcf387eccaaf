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


def extract_probable_cause(text: str) -> str | None:
    """The concise cause line (plus user-code source location) from a raw
    Spark/py4j error dump, or None if no Python traceback is embedded.

    Selection mirrors the reference's ``_pick_spark_errors`` ordering:
    a traceback reaching user code beats a framework-only one; among
    those, the shortest exception message wins (the innermost re-raise —
    outer wrappers accrete "... caused by ..." prefixes)."""
    tbs = _parse_tracebacks(text)
    if not tbs:
        return None
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
