"""Generate a larger scale-factor copy of the driver's synthetic testdata.

The driver materializes `/root/testdata/sf{0.001,0.01,0.1}` (TESTDATA.md,
seed=42) but nothing larger, and `/root/testdata` is read-only.  SCALE.md §10's
scaling curve needs an sf1 point (lineitem 6M rows — a 1000x range versus
sf0.001), so this script regenerates the SAME schema and distribution family
at an arbitrary scale factor, writing under the repo (gitignored).

Distribution family was profiled from the driver's own parquet at sf0.1
(DuckDB, see SCALE.md §10 notes) and matches on:

- table row counts per sf (region/nation fixed; others linear; documents
  plateau below sf0.1 mirrored);
- every column's type (pyarrow schema matches the driver files exactly),
  value range, and categorical domain (mktsegments, brands, p_type,
  orderstatus/priority, returnflag/linestatus, event types, langs, sources);
- structural facts the queries exercise: lineitem.l_orderkey uniform over
  orders (Poisson(4) fanout, ~e^-4 childless orders), shipdate independent
  uniform, p_retailprice = 900 + (p_partkey % 1000)/10 deterministic,
  events sorted by ts with exponential(mean 50) values and {"k": 0..99}
  JSON props, documents drawn from the 31-word vocab with 10..100 words and
  a ~0.16% exact-duplicate tail, embeddings 64-dim unit-norm with 10
  label-aligned clusters.

It is NOT bit-identical to the driver's RNG stream — sf1 rows are a fresh
seed-42 draw from the same family.  That is the right contract for a scaling
curve (marginal-cost measurements need the same *distribution*, not the same
rows); oracle correctness checks stay on the driver's own sf0.01 files.

Usage: python tools/gen_sf.py [--sf 1] [--out fixtures/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
ORDERSTATUS = ["O", "P", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000  # microseconds per day


def _counts(sf: float) -> dict[str, int]:
    """Row counts per table, matching the driver's sf0.001/0.01/0.1 points."""
    return {
        "region": 5,
        "nation": 25,
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "lineitem": int(6_000_000 * sf),
        "events": int(1_000_000 * sf),
        # documents plateau at 500 below sf0.1 in the driver files
        "documents": max(500, int(50_000 * sf)),
        "embeddings": max(500, int(20_000 * sf)),
    }


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"wrote {path}: {table.num_rows} rows")


def _days_ts(rng: np.random.Generator, n: int, start: str, end: str) -> pa.Array:
    """Uniform midnight timestamps in [start, end] (both dates inclusive)."""
    lo = np.datetime64(start).astype("datetime64[D]").astype(np.int64)
    hi = np.datetime64(end).astype("datetime64[D]").astype(np.int64)
    days = rng.integers(lo, hi + 1, n)
    return pa.array(days * DAY_US, type=pa.timestamp("us"))


def gen(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(SEED)
    n = _counts(sf)
    os.makedirs(out_dir, exist_ok=True)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": REGIONS,
    }))

    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25, dtype=np.int32) % 5),
    }))

    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
        "c_mktsegment": pa.array(np.array(MKTSEGMENTS)[rng.integers(0, 5, nc)]),
    }))

    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
    }))

    np_ = n["part"]
    pk = np.arange(np_, dtype=np.int64)
    adj = np.array(P_ADJ)[rng.integers(0, 8, np_)]
    noun = np.array(P_NOUN)[rng.integers(0, 8, np_)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(pk),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, np_)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, np_)]),
        "p_size": pa.array(rng.integers(1, 51, np_).astype(np.int32)),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }))

    no = n["orders"]
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, nc, no)),
        "o_orderstatus": pa.array(np.array(ORDERSTATUS)[rng.integers(0, 3, no)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
        "o_orderdate": _days_ts(rng, no, "1995-01-01", "2001-08-01"),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, no)]),
    }))

    nl = n["lineitem"]
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, no, nl)),
        "l_partkey": pa.array(rng.integers(0, np_, nl)),
        "l_suppkey": pa.array(rng.integers(0, ns, nl)),
        "l_linenumber": pa.array(rng.integers(1, 8, nl).astype(np.int32)),
        "l_quantity": rng.integers(1, 51, nl).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, nl), 2),
        "l_discount": rng.integers(0, 11, nl) / 100.0,
        "l_tax": rng.integers(0, 9, nl) / 100.0,
        "l_returnflag": pa.array(np.array(RETURNFLAGS)[rng.integers(0, 3, nl)]),
        "l_linestatus": pa.array(np.array(LINESTATUS)[rng.integers(0, 2, nl)]),
        "l_shipdate": _days_ts(rng, nl, "1995-01-02", "2001-11-04"),
    }))

    ne = n["events"]
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    span = 30 * DAY_US
    ts = np.sort(t0 + rng.integers(0, span, ne))
    n_users = max(1, ne // 667)  # 1500 users per 1M events at sf0.1 ratio
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, ne)),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, ne)]),
        "value": np.round(rng.exponential(50.0, ne), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, ne)]),
    }))

    nd = n["documents"]
    vocab = np.array(DOC_VOCAB)
    lens = rng.integers(10, 101, nd)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens]
    # exact-duplicate tail (~0.16% like the driver files) for the dedup ops
    for i in rng.integers(nd // 2, nd, max(1, nd // 625)):
        texts[i] = texts[i - nd // 2]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, nd, p=LANG_P)),
        "source": pa.array([f"src{i % 20}" for i in range(nd)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    nv = n["embeddings"]
    labels = rng.integers(0, 10, nv).astype(np.int32)
    centers = rng.normal(0, 1, (10, 64)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[labels] + rng.normal(0, 0.6, (nv, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    }))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None, help="output dir (default fixtures/sf<sf>)")
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", f"sf{args.sf:g}")
    gen(args.sf, out)


if __name__ == "__main__":
    main()
