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

Pre-YARN (escaped key="value" line) history files are out of scope: the
sandbox targets Hadoop-2+ semantics everywhere else, and the reference
itself labels that format legacy. Everything here parses defensively —
a malformed record is skipped, never fatal, matching the reference's
"dealing gracefully with unexpected data structures" contract.
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
