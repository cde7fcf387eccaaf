#!/usr/bin/env python
"""Reproduce SCALE.md §12: the tight-radius (cosine ≥ 0.5) embedding
near-dup tier with SF-adaptive IVF cells.

A bit-identical numpy replica of ``operators/clustering.kmeans_assign``
(fixed-point quantization, k-smallest-id seeds, one exact-integer Lloyd
round, top-``probe`` assignment with (dist, cluster) tie-break) is run at
each SF with k = max(16, ceil(n / 125)); candidates are same-cell pairs,
recall is scored against the EXACT all-pairs truth at the threshold, and
the table prints the candidate-count scaling exponent between the last
two SFs. Also prints the geometry row (median true-pair / 1-NN / random
distances) behind the ρ ≥ 1/(2c²−1) lower-bound argument.

Usage::

    python tools/tight_tier.py [--threshold 0.5] [--probe 4]
        [--sf-dirs /root/testdata/sf0.01,/root/testdata/sf0.1,fixtures/sf1]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from collections import defaultdict

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load(path):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{path}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return (
        np.array([r[0] for r in rows]),
        np.array([r[1] for r in rows], dtype=np.float64),
    )


def kmeans_topn(Q, ids, k, probe, iters=1):
    """Replica of kmeans_assign: returns {vec_id: set(top-probe clusters)}."""
    C = Q[:k].copy()
    labels = ids[:k].copy()
    for _ in range(iters):
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(2)
        order = np.argsort(labels, kind="stable")
        assign = labels[order][np.argmin(d[:, order], 1)]
        newC, newL = [], []
        for c in np.unique(assign):
            m = assign == c
            newC.append(np.floor(Q[m].sum(0) / m.sum() + 0.5).astype(np.int64))
            newL.append(c)
        C, labels = np.array(newC), np.array(newL)
    d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(2)
    order = np.argsort(labels, kind="stable")
    d2, lab2 = d[:, order], labels[order]
    return {
        ids[i]: set(lab2[np.lexsort((lab2, d2[i]))[:probe]])
        for i in range(len(ids))
    }


def plant_twins(ids, V, every=20, zero_mod=5, offset=1_000_000_000):
    """The l2_embedding_neardup_planted derivation: every ``every``-th
    vector gains a twin with coords at 0-based positions ≡ 0 (mod
    ``zero_mod``) zeroed (~1/zero_mod of squared mass → cosine ≈
    √(1−1/zero_mod)), id offset to stay disjoint. Exact — no float
    arithmetic."""
    sel = ids % every == 0
    twins = V[sel].copy()
    twins[:, ::zero_mod] = 0.0
    return (
        np.concatenate([ids, ids[sel] + offset]),
        np.concatenate([V, twins]),
    )


def run_sf(path, threshold, probe, plant=False):
    ids, V = load(path)
    if plant:
        ids, V = plant_twins(ids, V)
    n = len(ids)
    Q = np.floor(V * 1000 + 0.5).astype(np.int64)
    k = max(16, math.ceil(n / 125))
    assign = kmeans_topn(Q, ids, k, probe)
    cells = defaultdict(list)
    for vid, cs in assign.items():
        for c in cs:
            cells[c].append(vid)
    cand = set()
    for members in cells.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    norms = np.linalg.norm(V, axis=1)
    S = (V @ V.T) / np.outer(norms, norms)
    iu = np.triu_indices(n, 1)
    true = {
        (ids[i], ids[j]) for i, j in zip(*iu) if S[i, j] >= threshold
    }
    recall = (
        sum(1 for p in true if p in cand) / len(true) if true else float("nan")
    )
    allp = n * (n - 1) // 2
    # geometry row (lower-bound argument)
    mask = S[iu] >= threshold
    pair_d = np.median(
        np.linalg.norm(V[iu[0][mask]] - V[iu[1][mask]], axis=1)
    ) if mask.any() else float("nan")
    rand_d = np.median(
        np.linalg.norm(V[iu[0][::997]] - V[iu[1][::997]], axis=1)
    )
    D2 = 2 - 2 * S + 1e-12
    np.fill_diagonal(D2, np.inf)
    nn_d = np.median(np.sqrt(D2.min(1)))
    print(
        f"{path}: n={n} k={k} probe={probe} true={len(true)} "
        f"recall={recall:.3f} cand={len(cand)} ({len(cand)/allp:.3f}x allpairs) "
        f"| med dist: pair={pair_d:.3f} 1nn={nn_d:.3f} random={rand_d:.3f}"
    )
    return len(cand)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--probe", type=int, default=4)
    ap.add_argument(
        "--plant", action="store_true",
        help="union in the deterministic perturbed twins and measure"
             " the true near-duplicate regime"
             " (l2_embedding_neardup_planted; use --threshold 0.8)",
    )
    ap.add_argument(
        "--sf-dirs",
        default="/root/testdata/sf0.01,/root/testdata/sf0.1,fixtures/sf1",
    )
    args = ap.parse_args()
    counts = [
        run_sf(p, args.threshold, args.probe, plant=args.plant)
        for p in args.sf_dirs.split(",")
    ]
    if len(counts) >= 2 and counts[-2]:
        b = math.log(counts[-1] / counts[-2]) / math.log(10)
        print(f"candidate exponent (last two SFs, per 10x): b = {b:.2f}")


if __name__ == "__main__":
    main()
