"""Registry hygiene: the driver differentially checks only the first 50
registration-order queries per round, so window composition IS coverage
policy (VERDICT r2 "what's wrong" #1). These tests make the policy
un-regressable without touching Spark at all.
"""

from __future__ import annotations

import json
import os

from mrjob_spark import queries as q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _driver_checked_names() -> set[str]:
    seen: set[str] = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(REPO, fname)
        if os.path.exists(path):
            seen |= set(json.load(open(path)))
    return seen


def test_every_priority_name_is_registered():
    # a typo'd priority entry silently falls out of the window
    missing = [n for n in q._DRIVER_PRIORITY if n not in q.REGISTRY]
    assert missing == [], f"priority names not in registry: {missing}"


def test_priority_list_fits_the_driver_window():
    assert len(q._DRIVER_PRIORITY) <= WINDOW


def test_no_unverified_query_hides_beyond_the_window():
    # every name outside the first 50 must have been driver-green in a
    # previous round; anything never checked must sit inside the window
    names = list(q.REGISTRY)
    seen = _driver_checked_names()
    if not seen:  # fresh clone without correctness files
        return
    hidden = [n for n in names[WINDOW:] if n not in seen]
    assert hidden == [], (
        f"never-driver-checked queries outside the 50-entry window: {hidden}"
        " — add them to _DRIVER_PRIORITY"
    )


def test_oracle_sql_types_and_column_alias_discipline():
    for name, spec in q.REGISTRY.items():
        if spec.sql is not None:
            assert isinstance(spec.sql, str) and spec.sql.strip(), name
