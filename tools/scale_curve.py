"""Fit the SCALE.md §10 scaling curve from per-sf bench runs.

Feeds on bench.py's one-line JSON outputs, one per scale factor::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_BENCH_RUNS=3 \
      SPARK_GRAFT_BENCH_ONLY=<list> python bench.py > sf0.01.json
    SPARK_GRAFT_SF_DIR=fixtures/sf1 ... python bench.py > sf1.json
    python tools/scale_curve.py sf0.001.json sf0.01.json sf0.1.json sf1.json

and prints the §10 markdown table plus, per query, the fitted scaling
exponent over the top decade.

Model: t(sf) = c + m·sf^b. At small sf the constant c (planning, stage
scheduling, task launch) dominates and hides the data term, so a naive
log-log fit over all points understates growth. We therefore estimate

* c ≈ t(smallest sf) (the fixed per-query session cost),
* b from the LAST TWO points on (t - c), the decade where the data term
  is visible: b = log(Δt_hi/Δt_lo) / log(sf_hi/sf_lo), clamped at 0 when
  the marginal is still inside noise (<0.15 s), reported as "flat".

b ≈ 1 is linear scaling (what a cluster parallelizes away); b > 1.2 is
flagged super-linear and deserves a plan audit.
"""

from __future__ import annotations

import argparse
import json
import math
import re
import sys


def load(path: str) -> tuple[float, dict[str, float]]:
    d = json.load(open(path))
    sf = d.get("sf") or float(re.search(r"sf([0-9.]+)", path).group(1))
    qs = {k: v for k, v in d["queries"].items() if isinstance(v, (int, float))}
    failed = [k for k, v in d["queries"].items() if v is None]
    if failed:
        print(f"WARNING {path}: failed queries {failed}", file=sys.stderr)
    return float(sf), qs


NOISE_S = 0.15  # marginal below this is session noise, not a data term


def fit(points: list[tuple[float, float]]) -> tuple[float | None, str]:
    """(exponent, label) for t(sf) points sorted by sf."""
    if len(points) < 3:
        return None, "n/a"
    c = points[0][1]
    (sf_a, t_a), (sf_b, t_b) = points[-2], points[-1]
    da, db = t_a - c, t_b - c
    if db < NOISE_S:
        return 0.0, "flat (overhead-bound)"
    if da < NOISE_S:
        # data term only emerged at the last point: bound it by assuming
        # the previous marginal sat right at the noise floor
        da = NOISE_S
        b = math.log(db / da) / math.log(sf_b / sf_a)
        return b, f"≤{b:.2f}"
    b = math.log(db / da) / math.log(sf_b / sf_a)
    return b, f"{b:.2f}"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+", help="bench.py JSON outputs, any order")
    args = ap.parse_args()

    runs = sorted(load(p) for p in args.files)
    sfs = [sf for sf, _ in runs]
    names = [n for n in runs[-1][1] if all(n in qs for _, qs in runs)]

    hdr = " | ".join(f"sf{sf:g}" for sf in sfs)
    print(f"| query | {hdr} | t(max)/t(min) | exponent b |")
    print("|---" * (len(sfs) + 3) + "|")
    flagged = []
    for n in names:
        pts = [(sf, qs[n]) for sf, qs in runs]
        ratio = pts[-1][1] / pts[0][1]
        b, label = fit(pts)
        cells = " | ".join(f"{t:.2f} s" for _, t in pts)
        print(f"| {n} | {cells} | {ratio:.1f}× | {label} |")
        if b is not None and b > 1.2:
            flagged.append((n, b))
    if flagged:
        print("\nSUPER-LINEAR (b > 1.2), audit these plans:")
        for n, b in flagged:
            print(f"  {n}: b={b:.2f}")
    else:
        print("\nNo query scales super-linearly (all b ≤ 1.2).")


if __name__ == "__main__":
    main()
