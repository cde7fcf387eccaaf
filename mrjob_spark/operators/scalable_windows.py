"""Skew-proof window operators (W1/W4 at scale).

Plain ``Window.partitionBy(k)`` puts ALL rows of a key into one task. When
the key has low cardinality (w1 partitions ``customer`` on 5 market
segments; w4 partitions ``orders`` on 5 priorities) every task sorts ~20%
of the table — at 100 TB that is a straggler/OOM, not a plan.

Both operators here split each logical partition with a *value-range
sub-bucket* derived from the ORDER BY column, do the heavy window work
inside the (key, bucket) partitions — cardinality = keys x buckets, so the
sort parallelizes — and then reconcile global semantics with metadata that
is tiny (one row per (key, bucket)):

- ``bucketed_ranking``: local row_number/rank/dense_rank + a broadcast
  cumulative-offset join. Ties share a bucket (buckets are value ranges),
  so ``offset + local_rank`` IS the global rank, bit-for-bit.
- ``bucketed_range_frame``: a bounded RANGE frame only ever reaches
  ``range_width`` behind the current value, i.e. at most one bucket back
  when ``bucket_width >= range_width``. Each row is therefore duplicated
  once as a read-only "ghost" into the next bucket, and a plain range
  window inside (key, bucket) sees exactly the global frame.

The registered queries ``w1_ranking_scalable`` / ``w4_range_frame_scalable``
(queries/windows.py) run these against the SAME oracle SQL as the naive
single-partition forms — the driver's hash match is the proof that the
two-phase plans are value-identical to the textbook window.

Reference parity: mrjob has no window functions at all; its closest idiom
is SORT_VALUES + a running accumulator in the reducer
(mrjob/examples/mr_next_word_stats.py:76-95), which single-threads each key
exactly like the naive plan these operators replace.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def bucketed_ranking(
    df: DataFrame,
    partition_col: str,
    value_col: str,
    tie_col: str,
    bucket_width: float,
    ntile_n: int = 4,
    descending: bool = True,
) -> DataFrame:
    """row_number / rank / dense_rank / ntile over ``partition_col`` ordered
    by ``value_col`` (then ``tie_col``), computed without ever materializing
    a whole key in one task.

    Output columns: the input columns plus ``rn``, ``rnk``, ``drnk``,
    ``quartile`` (all LongType), matching
    ``row_number/rank/dense_rank/ntile(ntile_n) OVER (PARTITION BY p ORDER
    BY v [DESC], tie)``.

    Assumes ``value_col`` is non-null (rank order on nulls is
    engine-specific anyway). ``bucket_width`` trades parallelism for
    metadata size: (keys x buckets) rows of offsets, broadcast-joined.
    """
    v = F.col(value_col)
    # Bucket index ascending in ORDER BY direction; equal values always
    # share a bucket, which is what makes local rank/dense_rank mergeable.
    bucket = F.floor((-v if descending else v) / F.lit(float(bucket_width)))
    order = [v.desc() if descending else v.asc(), F.col(tie_col).asc()]

    data = df.withColumn("__bucket", bucket)

    w_local = Window.partitionBy(partition_col, "__bucket").orderBy(*order)
    local = data.select(
        "*",
        F.row_number().over(w_local).alias("__lrn"),
        F.rank().over(w_local).alias("__lrnk"),
        F.dense_rank().over(w_local).alias("__ldrnk"),
    )

    # Tiny per-(key, bucket) stats -> cumulative offsets. Rank peers are
    # rows equal in the ENTIRE ordering tuple (value, tie) — Spark and the
    # SQL standard agree — so the dense offset counts distinct tuples, not
    # distinct values. Safe per-bucket because a value (hence any tuple
    # containing it) belongs to exactly one bucket.
    stats = data.groupBy(partition_col, "__bucket").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.countDistinct(value_col, tie_col).alias("__dcnt"),
    )
    w_cum = (
        Window.partitionBy(partition_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(partition_col)
    offsets = stats.select(
        partition_col,
        "__bucket",
        F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0)).alias("__off"),
        F.coalesce(F.sum("__dcnt").over(w_cum), F.lit(0)).alias("__doff"),
        F.sum("__cnt").over(w_tot).alias("__n"),
    )

    merged = local.join(
        F.broadcast(offsets), on=[partition_col, "__bucket"], how="inner"
    )

    rn = (F.col("__off") + F.col("__lrn")).cast("long")
    rnk = (F.col("__off") + F.col("__lrnk")).cast("long")
    drnk = (F.col("__doff") + F.col("__ldrnk")).cast("long")

    # ntile(k) from the global row number: the first n % k tiles get
    # n/k + 1 rows, the rest n/k (SQL-standard, what Spark and DuckDB do).
    n, k = F.col("__n"), F.lit(ntile_n)
    q, r = (n / k).cast("long"), n % k
    big_span = r * (q + F.lit(1))
    tile = (
        F.when(rn <= big_span, ((rn - 1) / (q + 1)).cast("long") + 1)
        .otherwise(r + ((rn - big_span - 1) / q).cast("long") + 1)
        .cast("long")
    )

    return merged.select(
        *df.columns,
        rn.alias("rn"),
        rnk.alias("rnk"),
        drnk.alias("drnk"),
        tile.alias("quartile"),
    )


def bucketed_range_frame(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    range_width: float,
    agg_exprs: Sequence,
    bucket_width: float | None = None,
) -> DataFrame:
    """Aggregates over ``RANGE BETWEEN range_width PRECEDING AND CURRENT
    ROW`` without single-tasking each partition key.

    ``agg_exprs`` is a sequence of callables ``window -> Column`` (each
    returns an already-aliased aggregate over the window it is given).
    Requires ``bucket_width >= range_width`` (default: equal) so a frame
    spans at most the current and previous bucket.
    """
    if bucket_width is None:
        bucket_width = range_width
    if bucket_width < range_width:
        raise ValueError("bucket_width must be >= range_width")

    v = F.col(order_col)
    bucket = F.floor(v / F.lit(float(bucket_width)))

    # Real rows live in their own bucket; each also ghosts into the next
    # bucket so trailing frames there can see it. Ghosts feed the window
    # but are dropped from the output.
    targets = df.select("*", bucket.alias("__bucket"), F.lit(1).alias("__is_target"))
    ghosts = df.select(
        "*", (bucket + 1).alias("__bucket"), F.lit(0).alias("__is_target")
    )
    both = targets.unionByName(ghosts)

    # Window.rangeBetween only accepts long boundaries through the py4j
    # API; integral widths are the common case (and what the oracle SQL
    # states), so pass them as ints.
    start = -int(range_width) if float(range_width).is_integer() else -range_width
    w = (
        Window.partitionBy(partition_col, "__bucket")
        .orderBy(order_col)
        .rangeBetween(start, Window.currentRow)
    )
    out = both.select("*", *[mk(w) for mk in agg_exprs])
    agg_names = [c for c in out.columns if c not in both.columns]
    return out.filter(F.col("__is_target") == 1).select(*df.columns, *agg_names)


def bucketed_running_sum(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    bucket_width: float,
    out_col: str = "cum",
) -> DataFrame:
    """``sum(value) OVER (PARTITION BY p ORDER BY o ROWS UNBOUNDED
    PRECEDING)`` without single-tasking each partition key — the skew-proof
    twin of the running-sum window behind sequence packing (a per-source
    stream at 100 TB is exactly the low-cardinality-key trap the W1/W4
    twins above solve for ranking and range frames).

    Same recipe: sub-bucket each key by ``order_col`` range (the bucket
    index is monotone in the ordering, so cross-bucket order is free),
    run the local running sum inside (key, bucket) partitions, and add the
    broadcast per-(key, bucket) prefix totals — ``offset + local_cum`` IS
    the global running sum, bit-for-bit for integer/decimal values.

    Requires ``order_col`` values unique per key (packing orders by a
    unique id; general ties would need the tuple-ordering treatment used
    by ``bucketed_ranking``).

    ``bucket_width`` trades parallelism for metadata size exactly like
    ``bucketed_ranking``: the broadcast offsets table has one row per
    (key, bucket), i.e. ~``order_range / bucket_width`` rows per key. A
    FIXED width therefore grows the broadcast linearly with the corpus —
    at 10^10 rows a width of 64 is a 10^8-row "broadcast". Callers must
    scale width with corpus size (a fixed TARGET BUCKET COUNT, width =
    order_range / target) so keys x buckets stays broadcast-small at any
    scale; ``l8_sequence_packing_scalable`` derives it that way.
    """
    bucket = F.floor(F.col(order_col) / F.lit(float(bucket_width)))
    data = df.withColumn("__bucket", bucket)

    w_local = (
        Window.partitionBy(partition_col, "__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = data.withColumn("__lcum", F.sum(value_col).over(w_local))

    w_cum = (
        Window.partitionBy(partition_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        data.groupBy(partition_col, "__bucket")
        .agg(F.sum(value_col).alias("__btot"))
        .select(
            partition_col,
            "__bucket",
            F.coalesce(F.sum("__btot").over(w_cum), F.lit(0)).alias("__off"),
        )
    )

    return (
        local.join(F.broadcast(offsets), on=[partition_col, "__bucket"], how="inner")
        .withColumn(out_col, F.col("__off") + F.col("__lcum"))
        .drop("__bucket", "__lcum", "__off")
    )
