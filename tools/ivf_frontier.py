#!/usr/bin/env python
"""Measure the IVF near-dup recall-vs-cost frontier (VERDICT r5 task 2).

Sweeps (k, probe, iters) over the embeddings fixture and reports, for each
configuration of the deterministic fixed-point k-means IVF
(operators/clustering.py — this script replicates it bit-for-bit in
vectorized numpy, the same replica test_properties.py::_kmeans_reference
pins the Spark operator against):

* recall  — |candidate ∩ truth| / |truth| where truth is the exact global
            all-pairs set at cosine ≥ 0.4 (the l2_embedding_neardup
            threshold, rounded to 1e-6 like the queries do);
* work    — candidate-pair count as a fraction of n·(n-1)/2 (the all-pairs
            cost the bucketing exists to avoid). This is the right cost
            proxy because the verify step (cosine per candidate) dominates
            at scale and is linear in candidates.

The frontier picks the production operating point: the cheapest config
with recall ≥ 0.7 (the r5 verdict's floor). Results land in SCALE.md.

Usage::

    python tools/ivf_frontier.py [--sf-dir /root/testdata/sf0.1]
                                 [--threshold 0.4]
"""

from __future__ import annotations

import argparse
import itertools
import math
import sys
import time

import numpy as np
import pyarrow.parquet as pq

SCALE = 1000  # FIXED_POINT_SCALE


def load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    order = np.argsort(ids)
    return ids[order], emb[order]


def truth_pairs(emb: np.ndarray, threshold: float) -> np.ndarray:
    """Exact global truth: unordered index pairs (encoded i*n+j, i<j) with
    rounded cosine ≥ t. Blocked so the sim matrix never fully materializes."""
    n = len(emb)
    norms = np.linalg.norm(emb, axis=1)
    unit = emb / norms[:, None]
    out = []
    step = 2048
    for s in range(0, n, step):
        sims = unit[s : s + step] @ unit.T
        sims = np.floor(sims * 1e6 + 0.5) / 1e6  # rnd(cosine, 6)
        ii, jj = np.nonzero(sims >= threshold)
        ii = ii + s
        keep = ii < jj
        out.append(ii[keep].astype(np.int64) * n + jj[keep])
    return np.unique(np.concatenate(out))


def kmeans_cells(emb: np.ndarray, k: int, iters: int, probe: int) -> np.ndarray:
    """Replicates kmeans_assign(): returns (n, probe) int array of cell ids
    per vector under the final centroids (ties on (dist, cluster))."""
    q = np.floor(emb * SCALE + 0.5).astype(np.int64)  # quantize_fixed_point
    # seed: the k smallest vec_ids == first k rows (ids are sorted)
    cents = q[:k].copy()
    cent_ids = np.arange(k, dtype=np.int64)  # cluster id = seed vec_id index

    def dists(c):
        # exact integer squared L2 (n, m), blocked over rows so the
        # (n, k, dim) intermediate never materializes at sf1
        out = np.empty((len(q), len(c)), dtype=np.int64)
        step = 4096
        for s in range(0, len(q), step):
            d = q[s : s + step, None, :] - c[None, :, :]
            out[s : s + step] = (d * d).sum(axis=2)
        return out

    for _ in range(iters):
        d = dists(cents)
        # argmin with tie → lowest cluster id: argmin returns first minimal
        # index, and cent_ids is ascending, so plain argmin matches
        a = cent_ids[np.argmin(d, axis=1)]
        keep, new_cents, new_ids = [], [], []
        for c in np.unique(a):
            sel = q[a == c]
            new_cents.append(np.floor(sel.sum(axis=0) / len(sel) + 0.5).astype(np.int64))
            new_ids.append(c)
        cents = np.stack(new_cents)
        cent_ids = np.asarray(new_ids, dtype=np.int64)

    d = dists(cents)
    # top-probe by (dist, cluster): cent_ids ascending makes lexsort on
    # dist alone stable-correct via argsort(kind="stable")
    orderd = np.argsort(d, axis=1, kind="stable")[:, :probe]
    return cent_ids[orderd]


def candidates(cells: np.ndarray, n: int) -> np.ndarray:
    """Pairs sharing ≥1 cell (the self-join on the exploded assignment),
    encoded i*n+j with i<j, deduplicated — fully vectorized."""
    chunks = []
    for c in np.unique(cells):
        members = np.unique(np.nonzero((cells == c).any(axis=1))[0]).astype(np.int64)
        m = len(members)
        if m < 2:
            continue
        ii = np.repeat(members, m)
        jj = np.tile(members, m)
        keep = ii < jj
        chunks.append(ii[keep] * n + jj[keep])
    if not chunks:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(chunks))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument("--floor", type=float, default=0.7)
    ap.add_argument("--ks", default="5,10,20,40,63",
                    help="comma list of cell counts to sweep")
    args = ap.parse_args()

    ids, emb = load(args.sf_dir)
    n = len(ids)
    total_pairs = n * (n - 1) // 2
    truth = truth_pairs(emb, args.threshold)
    print(f"n={n} dim={emb.shape[1]} truth_pairs={len(truth)} "
          f"({len(truth)/total_pairs:.3f} of all pairs)", file=sys.stderr)

    rows = []
    for k in (int(x) for x in args.ks.split(",")):
        if k >= n:
            continue
        for iters in (1, 2):
            for probe in (1, 2, 3, 4):
                t0 = time.time()
                cells = kmeans_cells(emb, k, iters, probe)
                cand = candidates(cells, n)
                hits = np.intersect1d(cand, truth, assume_unique=True)
                recall = len(hits) / len(truth) if len(truth) else 1.0
                work = len(cand) / total_pairs
                rows.append((k, iters, probe, recall, work,
                             len(cand), time.time() - t0))

    print(f"{'k':>3} {'iters':>5} {'probe':>5} {'recall':>7} {'work':>7} "
          f"{'cand':>9} {'sec':>6}")
    for k, it, p, r, w, c, s in rows:
        print(f"{k:>3} {it:>5} {p:>5} {r:>7.3f} {w:>7.3f} {c:>9} {s:>6.1f}")

    ok = [r for r in rows if r[3] >= args.floor]
    if ok:
        best = min(ok, key=lambda r: r[4])
        print(f"\nbest ≥{args.floor} recall: k={best[0]} iters={best[1]} "
              f"probe={best[2]} recall={best[3]:.3f} work={best[4]:.3f}")
    else:
        print(f"\nno config reached recall ≥ {args.floor}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
