"""Exposed partitioning / in-partition-sort / file-count operators
(SURVEY.md §2.4 O1, O2, O8).

These are implicit inside every groupBy/join, but the reference exposes
them as user-controllable knobs (pluggable partitioner ``mrjob/job.py:
1390-1408``, shuffle sort ``mrjob/local.py:205-227``, ``mapreduce.job.
reduces``/``max_output_files`` ``mrjob/spark/harness.py:149-151,266-268``),
so the engine exposes them as first-class operators too. The scale story:
pre-partitioning by a join/agg key lets several downstream stages reuse one
shuffle; in-partition sort + hash layout is the write-side of bucketed
tables.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def repartition_by_key(df: DataFrame, num_partitions: int, *cols: str) -> DataFrame:
    """O1: hash-partition on ``cols`` into exactly ``num_partitions``.

    Deterministic for fixed inputs (Murmur3 on the columns). Downstream
    groupBy/join on the same key reuses this exchange instead of adding one.
    """
    return df.repartition(num_partitions, *cols)


def sort_within_partitions(df: DataFrame, *cols: str) -> DataFrame:
    """O2: in-partition sort, no shuffle — Hadoop's reducer-input contract
    (each partition's records arrive key-sorted) without a global order."""
    return df.sortWithinPartitions(*cols)


def coalesce_output(df: DataFrame, max_files: int) -> DataFrame:
    """O8/S11: cap output file count without a shuffle (coalesce merges
    partitions in place; use repartition when balance matters more than
    avoiding the shuffle)."""
    return df.coalesce(max_files)


def partition_audit(df: DataFrame, key_col: str) -> DataFrame:
    """Per-partition audit rows: (rows, distinct-ish min/max key, sorted?).

    One output row per physical partition via mapInPandas (the iterator
    spans every Arrow batch of one partition, so cross-batch order is
    checked too). Used by the o1_o2 registry query to PROVE the partition
    layout: summing ``rows`` must give the table count and every partition
    must report ``sorted=1`` after sort_within_partitions.
    """
    schema = T.StructType(
        [
            T.StructField("rows", T.LongType()),
            T.StructField("min_key", T.LongType()),
            T.StructField("max_key", T.LongType()),
            T.StructField("is_sorted", T.IntegerType()),
        ]
    )

    def audit(batches: Iterator) -> Iterator:
        import pandas as pd

        n, mn, mx, sorted_ok, prev_last = 0, None, None, 1, None
        for pdf in batches:
            ks = pdf[key_col]
            if len(ks) == 0:
                continue
            n += len(ks)
            bmn, bmx = int(ks.min()), int(ks.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
            if not ks.is_monotonic_increasing:
                sorted_ok = 0
            if prev_last is not None and int(ks.iloc[0]) < prev_last:
                sorted_ok = 0
            prev_last = int(ks.iloc[-1])
        if n:
            yield pd.DataFrame(
                [{"rows": n, "min_key": mn, "max_key": mx, "is_sorted": sorted_ok}]
            )

    return df.mapInPandas(audit, schema=schema)


def parallelize_narrow_scan(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a compute-heavy input whose scan produced
    fewer partitions than the cluster has cores.

    Unsplittable inputs — single-row-group parquet files, gzip text — give
    the scan 1 task per file no matter how large the cluster is, so every
    per-row-heavy operator downstream (shingling, 64-way minhash, per-byte
    hashing) runs at file parallelism, not cluster parallelism. The fix is
    one cheap shuffle of the narrow projection (id + text) before the
    expensive math. At real scale the file count supplies the parallelism
    and this is a structural no-op: when the scan already has >= target
    partitions the input is returned untouched, so the repartition only
    ever triggers exactly in the degenerate layouts that need it.
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
