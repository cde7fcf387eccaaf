#!/usr/bin/env python
"""Streaming THROUGHPUT measurement (SCALE.md §5 — numbers, not claims).

Drives each core streaming operator from a ``rate`` source (in-JVM row
generator, so the source is never the bottleneck) into a ``noop`` sink
and reads Spark's own ``processedRowsPerSecond`` from the query progress
feed — the same metric a production monitor watches. Per operator:

* pump at ``--rows-per-sec`` (default 2M/s) for ``--seconds``,
* discard the first ``--warmup`` progress entries (state-store open +
  codegen),
* report the median and max processed-rows/sec over the rest, plus the
  total stateful rows handled.

Operators measured (the registry's streaming surface minus the
environment-gated transformWithState):

* ``tumbling``  — watermarked tumbling-window count/sum per key
* ``sliding``   — 2× overlap sliding window (fan-out priced in)
* ``session``   — session_window with gap merge
* ``dedup``     — dropDuplicatesWithinWatermark per key+payload
* ``running``   — applyInPandasWithState custom running totals (the
                  Python/Arrow stateful path — expected slowest)
* ``ss_join``   — stream-stream inner join on key within a time bound

Usage::

    python tools/stream_bench.py [--rows-per-sec 2000000] [--seconds 20]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mrjob_spark.session import get_spark  # noqa: E402


def _rate(spark, rows_per_sec: int, n_keys: int = 1000):
    # value → (key, ts, v): keys cycle, event time = processing time
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 8)
        .load()
        .select(
            (F.col("value") % n_keys).alias("k"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 97).cast("double").alias("v"),
        )
    )


def _measure(q, seconds: int, warmup: int) -> dict:
    rates: list[float] = []
    rows = 0
    deadline = time.monotonic() + seconds
    seen = 0
    last_ts = None
    while time.monotonic() < deadline:
        time.sleep(0.5)
        p = q.lastProgress
        if not p or p.get("timestamp") == last_ts:
            continue
        last_ts = p.get("timestamp")
        seen += 1
        if seen <= warmup:
            continue
        r = p.get("processedRowsPerSecond")
        n = p.get("numInputRows", 0)
        if r and n:
            rates.append(r)
            rows += n
    q.stop()
    if not rates:
        return {"median_rows_per_sec": None, "rows": rows}
    return {
        "median_rows_per_sec": int(statistics.median(rates)),
        "max_rows_per_sec": int(max(rates)),
        "batches": len(rates),
        "rows": rows,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-sec", type=int, default=2_000_000)
    ap.add_argument("--seconds", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="stream_bench", master="local[32]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from mrjob_spark.streaming.ops import (
        session_window_agg,
        sliding_window_agg,
        stateful_running_totals,
        stream_dedup,
        stream_stream_join,
        tumbling_window_agg,
    )

    def start(df, name, mode="update"):
        return (
            df.writeStream.format("noop")
            .queryName(name)
            .option("checkpointLocation", f"/tmp/stream_bench_ckpt/{name}_{os.getpid()}")
            .outputMode(mode)
            .start()
        )

    cases = {
        "tumbling": lambda: start(
            tumbling_window_agg(
                _rate(spark, args.rows_per_sec), "ts", "10 seconds", ["k"],
                [F.count("*").alias("n"), F.sum("v").alias("s")],
                watermark="5 seconds",
            ),
            "tumbling",
        ),
        "sliding": lambda: start(
            sliding_window_agg(
                _rate(spark, args.rows_per_sec), "ts", "10 seconds",
                "5 seconds", ["k"],
                [F.count("*").alias("n")], watermark="5 seconds",
            ),
            "sliding",
        ),
        "session": lambda: start(
            session_window_agg(
                _rate(spark, args.rows_per_sec), "ts", "5 seconds", ["k"],
                [F.count("*").alias("n")], watermark="5 seconds",
            ),
            "session",
            mode="append",  # session windows finalize on watermark
        ),
        "dedup": lambda: start(
            stream_dedup(
                # halved: per-row state lookups; 5M offered falls behind
                _rate(spark, args.rows_per_sec // 2), ["k", "v"],
                ts_col="ts", watermark="5 seconds",
            ),
            "dedup",
        ),
        "running": lambda: start(
            stateful_running_totals(
                # the Python/Arrow path: rate capped 10× lower — measuring
                # the boundary, not drowning it
                _rate(spark, max(args.rows_per_sec // 10, 1000))
                .withWatermark("ts", "5 seconds"),
                "k", "v",
            ),
            "running",
        ),
        "ss_join": lambda: start(
            stream_stream_join(
                # join state holds BOTH sides for the full time bound and
                # every same-key pair within it matches (~rate²·window/
                # keys output rows): 100k keys keeps matching sparse so
                # the measurement is the join machinery, not an
                # intentionally-exploded output volume
                _rate(spark, args.rows_per_sec // 4, n_keys=100_000),
                _rate(spark, args.rows_per_sec // 4, n_keys=100_000).select(
                    F.col("k"), F.col("ts").alias("rts"),
                    F.col("v").alias("rv"),
                ),
                key="k", left_ts="ts", right_ts="rts",
                within="10 seconds",
                watermark="5 seconds",
            ),
            "ss_join",
            mode="append",  # stream-stream joins emit on match+eviction
        ),
    }
    if args.only:
        keep = set(args.only.split(","))
        cases = {k: v for k, v in cases.items() if k in keep}

    results: dict[str, dict] = {}
    for name, mk in cases.items():
        try:
            q = mk()
            results[name] = _measure(q, args.seconds, args.warmup)
            print(f"[stream] {name}: {results[name]}", file=sys.stderr,
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"[stream] {name}: ERR {exc}", file=sys.stderr, flush=True)

    print(json.dumps({
        "rows_per_sec_offered": args.rows_per_sec,
        "seconds": args.seconds,
        "cpus": 32,
        "operators": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
