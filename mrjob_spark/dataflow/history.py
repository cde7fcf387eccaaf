"""YARN job-history (``.jhist``) parsing — counters and per-attempt
errors, the reference's history-file correlation surface
(``mrjob/logs/history.py:143-284``).

A ``.jhist`` file is a stream of one-JSON-object-per-line "Avro-Json"
records (after a non-JSON header line). Three record families matter for
diagnosis:

* ``*_ATTEMPT_FAILED`` events carry the task attempt's error text plus
  its ``taskid``/``attemptId`` — the correlation key back to the
  container logs;
* ``attemptId``/``containerId`` pairs on any event build the
  attempt → container map used to find the right task log;
* ``TASK_FINISHED`` / ``JOB_FINISHED`` events carry Avro-shaped counter
  groups. A successful job reports ``totalCounters`` once; for a FAILED
  job the reference reconstructs totals by summing the counters of the
  tasks that did succeed — so do we.

Pre-YARN (Hadoop-1.x escaped ``KEY="value"`` line) history files parse
through :func:`parse_pre_yarn_history` into the same result shape
(reference ``mrjob/logs/history.py:288-440``), so ``diagnose`` reads
either vintage. Everything here parses defensively — a malformed record
is skipped, never fatal, matching the reference's "dealing gracefully
with unexpected data structures" contract.
"""

from __future__ import annotations

import json


def looks_like_jhist(text: str) -> bool:
    """Cheap sniff: an Avro-Json header or a first JSON line carrying the
    jhist ``type``/``event`` shape."""
    for line in text.splitlines()[:5]:
        if line.startswith("Avro-Json"):
            return True
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                return False
            return isinstance(rec, dict) and "type" in rec and "event" in rec
    return False


def _counters_from(counters_record) -> dict:
    """Avro counter groups → ``{group: {counter: amount}}`` (reference
    ``_extract_yarn_counters``, history.py:242-284). Zero amounts are
    kept — YARN reports them and the hadoop CLI prints them."""
    out: dict = {}
    if not isinstance(counters_record, dict):
        return out
    for group_record in counters_record.get("groups") or []:
        if not isinstance(group_record, dict):
            continue
        group = group_record.get("displayName")
        if not isinstance(group, str):
            continue
        for c in group_record.get("counts") or []:
            if not isinstance(c, dict):
                continue
            name, amount = c.get("displayName"), c.get("value")
            if isinstance(name, str) and isinstance(amount, int):
                out.setdefault(group, {})
                out[group][name] = out[group].get(name, 0) + amount
    return out


def _sum_counters(*counter_dicts: dict) -> dict:
    total: dict = {}
    for d in counter_dicts:
        for group, counters in d.items():
            for name, amount in counters.items():
                total.setdefault(group, {})
                total[group][name] = total[group].get(name, 0) + amount
    return total


def parse_jhist(lines) -> dict:
    """Parse a YARN history stream into::

        {
          "counters": {group: {counter: amount}},
          "errors": [{"message", "task_id", "attempt_id", "start_line"}],
          "attempt_to_container_id": {attempt_id: container_id},
        }

    Counter source priority matches the reference: ``JOB_FINISHED
    totalCounters`` when present, else the sum over ``TASK_FINISHED``
    counters (the failed-job reconstruction)."""
    result: dict = {"errors": [], "attempt_to_container_id": {}}
    task_to_counters: dict = {}

    for line_num, raw in enumerate(lines):
        line = raw.rstrip("\r\n") if isinstance(raw, str) else raw.decode(
            "utf-8", "replace").rstrip("\r\n")
        if not line.startswith("{"):
            continue
        try:
            record = json.loads(line)
        except ValueError:
            continue
        rtype = record.get("type")
        event_record = record.get("event")
        if not isinstance(rtype, str) or not isinstance(event_record, dict):
            continue
        events = [e for e in event_record.values() if isinstance(e, dict)]

        for event in events:
            att, cont = event.get("attemptId"), event.get("containerId")
            if isinstance(att, str) and isinstance(cont, str):
                result["attempt_to_container_id"][att] = cont

        if rtype.endswith("_ATTEMPT_FAILED"):
            for event in events:
                msg = event.get("error")
                if not (msg and isinstance(msg, str)):
                    continue
                err = {"message": msg, "start_line": line_num}
                if isinstance(event.get("taskid"), str):
                    err["task_id"] = event["taskid"]
                if isinstance(event.get("attemptId"), str):
                    err["attempt_id"] = event["attemptId"]
                result["errors"].append(err)
        elif rtype == "TASK_FINISHED":
            for event in events:
                tid = event.get("taskid")
                if isinstance(tid, str) and isinstance(
                    event.get("counters"), dict
                ):
                    task_to_counters[tid] = _counters_from(event["counters"])
        elif rtype == "JOB_FINISHED":
            for event in events:
                if isinstance(event.get("totalCounters"), dict):
                    result["counters"] = _counters_from(
                        event["totalCounters"]
                    )

    if "counters" not in result and task_to_counters:
        result["counters"] = _sum_counters(*task_to_counters.values())
    return result


# ---------------------------------------------------------------------------
# Pre-YARN (Hadoop 1.x) history files — round 12, closing the last
# COVERAGE.md out-of-scope note. The format is space-separated
# KEY="value" pairs after a record-type word, each record terminated by
# a lone " ." (records may span lines, e.g. Java stack traces inside
# ERROR values); backslash escapes any character, and COUNTERS fields
# are a nested {(id)(name)[(id)(name)(amount)]...} encoding whose names
# are escaped a second time. Reference: mrjob/logs/history.py:288-440.
# ---------------------------------------------------------------------------

import re as _re

_KV_RE = _re.compile(r'(\w+)="((?:\\.|[^"\\])*)"')
_RECORD_RE = _re.compile(r'^(\w+)((?: ' + _KV_RE.pattern + r')*) \.$',
                         _re.MULTILINE)
_COUNTER_GROUP_RE = _re.compile(
    r'\{\('
    r'(?:\\.|[^)}\\])*'              # group id (class name) — unused
    r'\)\('
    r'((?:\\.|[^)}\\])*)'            # group display name
    r'\)'
    r'(\[(?:\\.|[^}\\])*\])'         # the counter list
    r'\}'
)
_COUNTER_RE = _re.compile(
    r'\[\('
    r'(?:\\.|[^)\\])*'               # counter id — unused
    r'\)\('
    r'((?:\\.|[^)\\])*)'             # counter display name
    r'\)\('
    r'(\d+)'                         # amount
    r'\)\]'
)


def _unescape(s: str) -> str:
    return _re.sub(r"\\(.)", r"\1", s)


def looks_like_pre_yarn_history(text: str) -> bool:
    """Cheap sniff: the first record of a Hadoop-1.x history file is
    ``Meta VERSION="1" .`` and every record line ends in `` .``."""
    for line in text.splitlines()[:5]:
        if not line.strip():
            continue
        return bool(_RECORD_RE.match(line)) and "=\"" in line
    return False


def _pre_yarn_counters(counters_field: str) -> dict:
    """``{(gid)(gname)[(cid)(cname)(n)]...}...`` → {group: {name: n}}.
    Names are escaped once more inside the COUNTERS encoding."""
    out: dict = {}
    for gname, counter_list in _COUNTER_GROUP_RE.findall(counters_field):
        group = _unescape(gname)
        for cname, amount in _COUNTER_RE.findall(counter_list):
            out.setdefault(group, {})
            name = _unescape(cname)
            out[group][name] = out[group].get(name, 0) + int(amount)
    return out


def parse_pre_yarn_history(lines) -> dict:
    """Parse a pre-YARN history stream into the same shape as
    :func:`parse_jhist` (``attempt_to_container_id`` stays empty —
    Hadoop 1.x has no containers; task logs key on the attempt id).

    Counter source priority matches the reference: the ``Job`` record's
    ``COUNTERS`` when the job finished, else the sum over successful
    ``Task`` records' counters (the failed-job reconstruction). Errors
    are ``MapAttempt``/``ReduceAttempt`` records with
    ``TASK_STATUS="FAILED"`` and a non-blank ``ERROR`` — KILLED
    attempts and blank errors are noise, not causes."""
    result: dict = {"errors": [], "attempt_to_container_id": {}}
    task_to_counters: dict = {}

    record_lines: list = []
    start_line = 0
    for line_num, raw in enumerate(lines):
        line = raw if isinstance(raw, str) else raw.decode(
            "utf-8", "replace")
        record_lines.append(line)
        if not line.rstrip("\r\n").endswith(" ."):
            continue  # an unterminated trailing record is dropped whole
        record_str = "".join(record_lines).rstrip("\r\n")
        n_lines = len(record_lines)
        record_lines, first_line = [], start_line
        start_line = line_num + 1

        m = _RECORD_RE.match(record_str)
        if not m:
            continue
        rtype = m.group(1)
        fields = {
            k: _unescape(v) for k, v in _KV_RE.findall(m.group(2))
        }

        if rtype == "Job" and "COUNTERS" in fields:
            result["counters"] = _pre_yarn_counters(fields["COUNTERS"])
        elif rtype == "Task" and "COUNTERS" in fields and \
                "TASKID" in fields:
            task_to_counters[fields["TASKID"]] = _pre_yarn_counters(
                fields["COUNTERS"])
        elif rtype in ("MapAttempt", "ReduceAttempt") and \
                fields.get("TASK_STATUS") == "FAILED" and \
                fields.get("ERROR") and "TASK_ATTEMPT_ID" in fields:
            err = {
                "message": fields["ERROR"],
                "attempt_id": fields["TASK_ATTEMPT_ID"],
                "start_line": first_line,
                "num_lines": n_lines,
            }
            if "TASKID" in fields:
                err["task_id"] = fields["TASKID"]
            result["errors"].append(err)

    if "counters" not in result and task_to_counters:
        result["counters"] = _sum_counters(*task_to_counters.values())
    return result
