#!/usr/bin/env python
"""Local simulation of the driver's CORRECTNESS gate, stricter on dtypes.

The driver runs each registered query on Spark AND its DuckDB oracle at
sf0.01, then hash-compares values. Its hash is *representation sensitive*:
round 3's only red row (`l2_span_dedup`) was DuckDB's integer ``sum()``
returning HUGEINT (arrow decimal128) against Spark's int64 — equal values,
different hashes — which the test-suite canonicalizer silently coerced.

This tool closes that gap locally: for the first N registry entries (the
driver checks a 50-slot window in registry order) it reports

* row-count match,
* column-set match,
* canonical value match (same rules as tests/test_oracle.py), and
* **dtype-class match** between the Spark schema and the DuckDB arrow
  schema — any column whose type class differs (int vs decimal, int vs
  float, int32 vs int64, ...) is flagged even when the values compare
  equal, because the driver's hash may still diverge.

Usage::

    python tools/driver_sim.py [--sf-dir /root/testdata/sf0.01]
                               [--limit 50] [--only a,b,c]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

from mrjob_spark.queries import REGISTRY  # noqa: E402
from mrjob_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon_val(v):
        if v is None:
            return ("_null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("_nan",)
            return ("f", round(v, 9))
        if hasattr(v, "isoformat"):
            return ("t", v.isoformat())
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    return sorted(tuple(canon_val(r[i]) for i in order) for r in rows)


def _arrow_class(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)


def _spark_class(dt) -> str:
    name = dt.simpleString()
    return {
        "bigint": "int64",
        "int": "int32",
        "smallint": "int16",
        "tinyint": "int8",
        "double": "float",
        "float": "float",
        "boolean": "bool",
        "string": "string",
        "binary": "binary",
        "date": "date",
    }.get(name) or (
        "timestamp"
        if name.startswith("timestamp")
        else "decimal"
        if name.startswith("decimal")
        else "list"
        if name.startswith("array")
        else "struct"
        if name.startswith("struct")
        else name
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=50)
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    names = list(REGISTRY)[: args.limit]
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in REGISTRY if n in keep]

    spark = get_spark(
        app_name="driver_sim",
        master="local[8]",
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_bad = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.monotonic()
        try:
            sdf = spec.fn(spark, args.sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_types = {
                f.name.lower(): _spark_class(f.dataType) for f in sdf.schema.fields
            }
            spark_rows = [tuple(r) for r in sdf.collect()]

            if spec.sql is None:
                results[name] = {
                    "rows_only": True,
                    "spark_rows": len(spark_rows),
                    "sec": round(time.monotonic() - t0, 2),
                }
                print(f"[sim] {name}: rows-only, {len(spark_rows)} rows")
                continue

            atab = duck.execute(spec.sql).arrow()
            duck_cols = [c.lower() for c in atab.column_names]
            duck_types = {
                c.lower(): _arrow_class(atab.schema.field(i).type)
                for i, c in enumerate(atab.column_names)
            }
            duck_rows = list(
                zip(*[atab.column(i).to_pylist() for i in range(atab.num_columns)])
            ) if atab.num_columns else []

            cols_match = sorted(spark_cols) == sorted(duck_cols)
            rows_match = len(spark_rows) == len(duck_rows)
            vals_match = (
                cols_match
                and rows_match
                and _canon(spark_rows, spark_cols) == _canon(duck_rows, duck_cols)
            )
            dtype_flags = {}
            dtype_warns = {}
            if cols_match:
                for c in spark_cols:
                    sc, dc = spark_types.get(c), duck_types.get(c)
                    if sc == dc:
                        continue
                    # integer-width-only differences are proven driver-safe
                    # (j7_star_join and l8_sequence_packing were driver-green
                    # with spark int32 vs duck int64) — warn, don't fail.
                    if (sc or "").startswith("int") and (dc or "").startswith("int"):
                        dtype_warns[c] = f"spark={sc} duck={dc}"
                    else:
                        dtype_flags[c] = f"spark={sc} duck={dc}"
            ok = cols_match and rows_match and vals_match and not dtype_flags
            results[name] = {
                "cols_match": cols_match,
                "rows_match": rows_match,
                "vals_match": vals_match,
                "dtype_flags": dtype_flags,
                "spark_rows": len(spark_rows),
                "oracle_rows": len(duck_rows),
                "sec": round(time.monotonic() - t0, 2),
            }
            flag = "OK " if ok else "BAD"
            n_bad += 0 if ok else 1
            extra = f" dtype:{dtype_flags}" if dtype_flags else ""
            if dtype_warns:
                extra += f" width-warn:{dtype_warns}"
            print(
                f"[sim] {flag} {name}: rows {len(spark_rows)}/{len(duck_rows)}"
                f" vals={vals_match}{extra}"
            )
        except Exception as exc:  # noqa: BLE001
            n_bad += 1
            results[name] = {"err": f"{type(exc).__name__}: {exc}"}
            print(f"[sim] ERR {name}: {type(exc).__name__}: {exc}")

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
    print(f"[sim] {len(names)} queries, {n_bad} flagged")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
