#!/usr/bin/env python
"""Render a BASELINE.md basis table from a bench.py JSON line.

The §21 light-tail refresh (VERDICT r10 task 2) re-records EVERY
registry query's basis in one at-rest full-registry run; this tool turns
bench.py's stdout into the §10-style three-pairs-per-row markdown table
so the record is mechanical, not hand-copied.

Usage::

    python bench.py > /tmp/bench_r11.json        # at rest!
    python tools/basis_table.py /tmp/bench_r11.json >> BASELINE.md
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    data = json.load(open(sys.argv[1]))
    q = data["queries"]
    names = [n for n in q if q[n] is not None]
    rows = []
    for i in range(0, len(names), 3):
        cells = []
        for n in names[i:i + 3]:
            cells += [n, "%.3f" % q[n]]
        while len(cells) < 6:
            cells += ["", ""]
        rows.append("| " + " | ".join(cells) + " |")
    print("| query | sec | query | sec | query | sec |")
    print("|---|---|---|---|---|---|")
    print("\n".join(rows))
    failed = [n for n in q if q[n] is None]
    if failed:
        print("\nFAILED: %s" % ", ".join(failed), file=sys.stderr)
        return 1
    print(
        "\nTotal: %.1f s / %d queries." % (data["value"], data["n_queries"])
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
