"""Relational core queries (SURVEY.md §2.1-2.8: S/P/A/O/J/U/F families).

Each query is idiomatic DataFrame code — filters and projections are written
so Catalyst pushes them into the parquet scan, joins carry explicit
``broadcast()`` hints for fixed-cardinality dims, and no Python executes per
row anywhere.

Scale notes (100 TB design target) are in the individual docstrings where a
choice is non-obvious.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from mrjob_spark.functions.rounding import rnd, dsum, davg
from pyspark.sql.window import Window

from mrjob_spark.queries import Tables, query

# ---------------------------------------------------------------------------
# S: scans / sources (S7 parquet is the primary path; S1/S2 text scans are
# exercised by the dataflow tests, not the oracle).
# ---------------------------------------------------------------------------


@query(
    "s7_parquet_scan_pushdown",
    sql="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_size >= 30 AND p_brand = 'Brand#1'
    """,
)
def s7_parquet_scan_pushdown(spark, sf_dir):
    """Projection + predicate that must reach the parquet reader as
    PushedFilters/ReadSchema — at 100 TB this is the difference between
    scanning 3 columns of a few row groups and scanning everything."""
    t = Tables(spark, sf_dir)
    return (
        t.part.where((F.col("p_size") >= 30) & (F.col("p_brand") == "Brand#1"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# P: projections / filters / row transforms
# ---------------------------------------------------------------------------


@query(
    "p3_filter_predicate",
    sql="""
    SELECT l_orderkey, l_linenumber,
           (floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100) AS disc_price
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount BETWEEN 0.05 AND 0.07
    """,
)
def p3_filter_predicate(spark, sf_dir):
    """P3 filter + computed projection (reference idiom: user filter inside a
    mapper, mr_most_used_word.py:52-58)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.where(
            (F.col("l_quantity") > 45) & F.col("l_discount").between(0.05, 0.07)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            rnd(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "disc_price"
            ),
        )
    )


@query(
    "p7_project_rename",
    sql="""
    SELECT c_custkey AS id, upper(c_mktsegment) AS segment,
           (floor((c_acctbal / 100.0) * 10000 + 0.5) / 10000) AS bal_hundreds
    FROM customer
    """,
)
def p7_project_rename(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.customer.select(
        F.col("c_custkey").alias("id"),
        F.upper("c_mktsegment").alias("segment"),
        rnd(F.col("c_acctbal") / 100.0, 4).alias("bal_hundreds"),
    )


# ---------------------------------------------------------------------------
# A: aggregations
# ---------------------------------------------------------------------------


@query(
    "a1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           (floor((CAST(sum(CAST((l_quantity) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100)                                    AS sum_qty,
           (floor((CAST(sum(CAST((l_extendedprice) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100)                               AS sum_base_price,
           (floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100)            AS sum_disc_price,
           (floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS sum_charge,
           (floor(((CAST(sum(CAST((l_quantity) AS DECIMAL(38,6))) AS DOUBLE) / count(l_quantity))) * 10000 + 0.5) / 10000)                                    AS avg_qty,
           (floor(((CAST(sum(CAST((l_extendedprice) AS DECIMAL(38,6))) AS DOUBLE) / count(l_extendedprice))) * 10000 + 0.5) / 10000)                               AS avg_price,
           (floor(((CAST(sum(CAST((l_discount) AS DECIMAL(38,6))) AS DOUBLE) / count(l_discount))) * 10000 + 0.5) / 10000)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1-style pricing summary (A1/A2/A3/A7). Catalyst emits
    partial+final hash aggregation — the map-side combine the reference
    implements by hand via combineByKey (mrjob/spark/harness.py:439-509).

    The DECIMAL(38,6)-exact partial aggregation is the per-row cost here,
    so the scan must enter at cluster parallelism: a single-row-group
    parquet file gives the partial agg ONE task (measured 2.0 s -> 1.1 s
    at sf0.1 on 32 cores from the narrow-scan fan-out; structural no-op
    whenever the layout already fills the machine)."""
    from mrjob_spark.operators.partitioning import parallelize_narrow_scan

    t = Tables(spark, sf_dir)
    li = parallelize_narrow_scan(
        t.lineitem.select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(dsum("l_quantity"), 2).alias("sum_qty"),
            rnd(dsum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(dsum(disc_price), 2).alias("sum_disc_price"),
            rnd(dsum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            rnd(davg("l_quantity"), 4).alias("avg_qty"),
            rnd(davg("l_extendedprice"), 4).alias("avg_price"),
            rnd(davg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "a3_count_per_group",
    sql="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def a3_count_per_group(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "a4_global_agg",
    sql="""
    SELECT count(*) AS n, (floor((CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS total,
           (floor(((CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE) / count(o_totalprice))) * 10000 + 0.5) / 10000) AS avg_price,
           (floor((min(o_totalprice)) * 100 + 0.5) / 100) AS min_price,
           (floor((max(o_totalprice)) * 100 + 0.5) / 100) AS max_price
    FROM orders
    """,
)
def a4_global_agg(spark, sf_dir):
    """A4: the reference's single-reducer pattern (yield None, v →
    reduce-all, mr_most_used_word.py:65-77) is just an ungrouped agg."""
    t = Tables(spark, sf_dir)
    return t.orders.agg(
        F.count(F.lit(1)).alias("n"),
        rnd(dsum("o_totalprice"), 2).alias("total"),
        rnd(davg("o_totalprice"), 4).alias("avg_price"),
        rnd(F.min("o_totalprice"), 2).alias("min_price"),
        rnd(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "a5_argmax_per_group",
    sql="""
    SELECT c_mktsegment, (floor((max(c_acctbal)) * 100 + 0.5) / 100) AS max_bal,
           min(c_custkey) FILTER (WHERE is_max) AS top_custkey
    FROM (
        SELECT c_mktsegment, c_acctbal, c_custkey,
               c_acctbal = max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS is_max
        FROM customer
    ) GROUP BY c_mktsegment
    """,
)
def a5_argmax_per_group(spark, sf_dir):
    """A5 argmax with deterministic tie-break (min custkey among maxima) —
    mirrors max(word_count_pairs) in mr_most_used_word.py:71-77."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment")
    return (
        t.customer.withColumn(
            "is_max", F.col("c_acctbal") == F.max("c_acctbal").over(w)
        )
        .groupBy("c_mktsegment")
        .agg(
            rnd(F.max("c_acctbal"), 2).alias("max_bal"),
            F.min(F.when(F.col("is_max"), F.col("c_custkey"))).alias("top_custkey"),
        )
    )


@query(
    "a6_distinct",
    sql="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def a6_distinct(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.orders.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "a7_stats_per_group",
    sql="""
    SELECT l_returnflag,
           count(*) AS n,
           (floor(((CAST(sum(CAST((l_quantity) AS DECIMAL(38,6))) AS DOUBLE) / count(l_quantity))) * 10000 + 0.5) / 10000) AS avg_qty,
           (floor((stddev_samp(l_quantity)) * 10000 + 0.5) / 10000) AS sd_qty,
           (floor((min(l_extendedprice)) * 100 + 0.5) / 100) AS min_price,
           (floor((max(l_extendedprice)) * 100 + 0.5) / 100) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a7_stats_per_group(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(davg("l_quantity"), 4).alias("avg_qty"),
        rnd(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        rnd(F.min("l_extendedprice"), 2).alias("min_price"),
        rnd(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@query(
    "a9_rollup",
    sql="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           (floor((CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def a9_rollup(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(dsum("o_totalprice"), 2).alias("total"),
    )


@query(
    "a9_cube",
    sql="""
    SELECT o_orderstatus, year(o_orderdate) AS order_year, count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, year(o_orderdate))
    """,
)
def a9_cube(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return (
        t.orders.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .cube("o_orderstatus", "order_year")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("o_orderstatus", "order_year", "n")
    )


@query(
    "a10_approx_count_distinct",
    sql="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a10_approx_count_distinct(spark, sf_dir):
    """A10: HLL++ sketch, driver-checked via a tolerance oracle (VERDICT r4
    task 1): different engines' sketches give different estimates, so the
    estimate itself has no DuckDB twin — instead emit the exact
    ``count(DISTINCT)`` plus a Spark-computed ``|approx-exact|/exact <= 5%``
    boolean the oracle states as literal TRUE (measured relative error at
    rsd=0.01 is 0.5-0.7% across sf0.001-0.1, so only a broken sketch flips
    the hash). The exact count here is the audit harness; the 100 TB
    production path is the sketch alone — count-distinct without the giant
    exact-distinct shuffle.

    Plan shape (round-5 sf1 screen): mixing ``countDistinct`` with
    ``approx_count_distinct`` in ONE aggregate forces the Expand-based
    distinct rewrite, where every intermediate (group, key) row carries
    its own rsd=0.01 HLL buffer — measured 54 s at sf1 vs 4.2 + 2.1 s
    for the parts separately. Deduplicating (group, key) pairs FIRST
    then aggregating is identical by construction: the exact count is
    the pair count, and HLL is duplicate-insensitive, so the sketch over
    deduped keys produces the same registers and the same estimate.
    61 → 2.3 s at sf1, one distinct shuffle + one tiny agg."""
    t = Tables(spark, sf_dir)
    pairs = t.lineitem.select("l_returnflag", "l_partkey").distinct()
    return pairs.groupBy("l_returnflag").agg(
        F.count("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.01)
                - F.count("l_partkey")
            )
            / F.count("l_partkey")
            <= F.lit(0.05)
        ).alias("within_5pct"),
    )


@query(
    "a11_exact_percentiles",
    sql="""
    SELECT event_type,
           (floor((quantile_cont(value, 0.25)) * 1000000 + 0.5) / 1000000) AS p25,
           (floor((quantile_cont(value, 0.50)) * 1000000 + 0.5) / 1000000) AS p50,
           (floor((quantile_cont(value, 0.90)) * 1000000 + 0.5) / 1000000) AS p90
    FROM events
    GROUP BY event_type
    """,
)
def a11_exact_percentiles(spark, sf_dir):
    """A11 (EXT): exact linearly-interpolated percentiles per group —
    Spark's ``percentile`` matches ANSI ``quantile_cont``/
    ``percentile_cont`` semantics, so the values oracle-check exactly
    (both engines sort the same doubles and interpolate the same two
    neighbors). Scale note: exact percentiles require the per-group value
    sets at one place — the group-keyed shuffle is intrinsic and the keys
    here are low-cardinality, which is precisely why the sketch-based
    ``a10``/``percentile_approx`` path exists as the 100 TB default; this
    query is the labeled exact baseline for bounded groups."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        rnd(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        rnd(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        rnd(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
    )


@query(
    "a12_approx_percentiles",
    sql="""
    SELECT event_type,
           (floor((quantile_cont(value, 0.50)) * 1000000 + 0.5) / 1000000) AS p50,
           (floor((quantile_cont(value, 0.90)) * 1000000 + 0.5) / 1000000) AS p90,
           (floor((quantile_cont(value, 0.99)) * 1000000 + 0.5) / 1000000) AS p99,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def a12_approx_percentiles(spark, sf_dir):
    """A12 (EXT): sketch percentiles — the unbounded-cardinality path a11's
    docstring defers to. ``percentile_approx`` (Greenwald-Khanna quantile
    summary) holds O(accuracy · log n) state per group and merges
    map-side, so the shuffle carries fixed-size sketches instead of every
    value — at 100 TB the exact form must materialize each group's full
    value set in one task, the sketch never does. Same tolerance-oracle
    contract as a10: the sketch estimate has no cross-engine twin, so the
    query emits the EXACT percentiles (the audit harness) plus a
    Spark-computed RANK-error boolean the oracle states as literal TRUE.
    The gate is rank-based, not value-based, because that is the G-K
    guarantee: the sketch returns a real sample whose rank is within
    ±1/accuracy of the target — in a heavy tail that sample can sit far
    away in VALUE at small group sizes (measured: p99 24% off at 200
    rows/group) while being exactly on-contract in rank. So the audit
    asserts approx ∈ [percentile(p-0.05), percentile(p+0.05)] — at
    accuracy=10000 the rank error is ≤1e-4, orders of magnitude inside
    the ±5% rank window, so only a broken sketch flips the hash."""
    t = Tables(spark, sf_dir)

    def _within(p: float):
        lo = F.expr(f"percentile(value, {max(p - 0.05, 0.0)})")
        hi = F.expr(f"percentile(value, {min(p + 0.05, 1.0)})")
        approx = F.expr(f"percentile_approx(value, {p}, 10000)")
        return (approx >= lo) & (approx <= hi)

    return t.events.groupBy("event_type").agg(
        rnd(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        rnd(F.expr("percentile(value, 0.90)"), 6).alias("p90"),
        rnd(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        (_within(0.50) & _within(0.90) & _within(0.99)).alias("within_5pct"),
    )


# ---------------------------------------------------------------------------
# O: sort / limit / top-k / sampling
# ---------------------------------------------------------------------------


@query(
    "o4_global_sort_limit",
    sql="""
    SELECT o_orderkey, (floor((o_totalprice) * 100 + 0.5) / 100) AS o_totalprice
    FROM orders ORDER BY orders.o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def o4_global_sort_limit(spark, sf_dir):
    """O4+O5: Spark compiles orderBy+limit to TakeOrderedAndProject — a
    per-partition top-k then a tiny driver merge; no global sort at scale."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("o_orderkey", rnd("o_totalprice", 2).alias("o_totalprice"))
    )


@query(
    "o6_topk_per_group",
    sql="""
    SELECT c_mktsegment, c_custkey, (floor((c_acctbal) * 100 + 0.5) / 100) AS c_acctbal, rn AS rank_in_seg
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def o6_topk_per_group(spark, sf_dir):
    """O5/O6 head-per-group (reference: reducer breaks after n values,
    mr_log_sampler.py:100-113). Window + filter; AQE handles skew."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        t.customer.withColumn("rank_in_seg", F.row_number().over(w).cast("long"))
        .where(F.col("rank_in_seg") <= 3)
        .select(
            "c_mktsegment",
            "c_custkey",
            rnd("c_acctbal", 2).alias("c_acctbal"),
            "rank_in_seg",
        )
    )


@query(
    "o7_deterministic_sample",
    sql="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
)
def o7_deterministic_sample(spark, sf_dir):
    """O7 seeded sampling, engine-portable: hash-based ~10% Bernoulli sample
    (md5 prefix) instead of engine-specific RNG (mr_log_sampler.py:83-113
    attaches a random seed; we make the 'seed' the row key itself)."""
    t = Tables(spark, sf_dir)
    return t.orders.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).select("o_orderkey", "o_orderstatus")


# ---------------------------------------------------------------------------
# J: joins
# ---------------------------------------------------------------------------


@query(
    "j1_join_agg",
    sql="""
    SELECT o_orderpriority,
           (floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def j1_join_agg(spark, sf_dir):
    """J1 reduce-side join (reference idiom: tag + co-group in one reducer,
    mr_text_classifier.py:148-160). Both sides large → shuffle join on the
    key; AQE picks sort-merge vs shuffled-hash at runtime."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            rnd(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "j2_broadcast_star",
    sql="""
    SELECT r_name, n_name,
           (floor((CAST(sum(CAST((c_acctbal) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS total_bal, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def j2_broadcast_star(spark, sf_dir):
    """J2 map-side broadcast join: nation/region are fixed-cardinality dims
    (25/5 rows at ANY scale factor) — explicit broadcast() is always correct,
    the reference's distributed-cache side-file idiom (mrjob/job.py:1131-1179)."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            rnd(dsum("c_acctbal"), 2).alias("total_bal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "j3_semi_join",
    sql="""
    SELECT c_mktsegment, count(*) AS n_active
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def j3_semi_join(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "j3_anti_join",
    sql="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def j3_anti_join(spark, sf_dir):
    """J3 anti join — the reference's stop-words membership filter
    (mr_most_used_word.py:52-58) generalized."""
    t = Tables(spark, sf_dir)
    return t.customer.join(
        t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "j4_left_outer_join",
    sql="""
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           (floor((coalesce(CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE), 0)) * 100 + 0.5) / 100) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def j4_left_outer_join(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            rnd(F.coalesce(dsum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@query(
    "j5_range_join",
    baseline_of="j5_range_join_bucketed",
    sql="""
    SELECT s_suppkey, count(*) AS n_close_customers
    FROM supplier JOIN customer
      ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
    GROUP BY s_suppkey
    """,
)
def j5_range_join(spark, sf_dir):
    """J5 non-equi (band) join. Supplier side is tiny → broadcast
    nested-loop is the right physical plan; at larger dims you'd bucketize
    the band into an equi-join key first."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.supplier),
            F.col("c_acctbal").between(
                F.col("s_acctbal") - 100, F.col("s_acctbal") + 100
            ),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_close_customers"))
    )


@query(
    "j7_star_join",
    sql="""
    SELECT r_name, year(o_orderdate) AS order_year,
           (floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, year(o_orderdate)
    """,
)
def j7_star_join(spark, sf_dir):
    """J7 multi-way star join: one shuffle join for the two fact tables,
    broadcast for every dim; Catalyst+AQE reorder and pick strategies."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", F.year("o_orderdate").alias("order_year"))
        .agg(
            rnd(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# U: set operations
# ---------------------------------------------------------------------------


@query(
    "u1_union",
    sql="""
    SELECT kind, nationkey, count(*) AS n FROM (
        SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier
    ) GROUP BY kind, nationkey
    """,
)
def u1_union(spark, sf_dir):
    """U1: multi-input concatenation (reference: multiple -input paths,
    sc.union in mrjob/spark/harness.py:236-241) → unionByName."""
    t = Tables(spark, sf_dir)
    c = t.customer.select(
        F.lit("customer").alias("kind"), F.col("c_nationkey").alias("nationkey")
    )
    s = t.supplier.select(
        F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("kind", "nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "u2_intersect",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def u2_intersect(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "u2_except",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def u2_except(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "u2_except_all",
    sql="""
    SELECT l_returnflag AS flag FROM lineitem
    EXCEPT ALL
    SELECT l_returnflag FROM lineitem WHERE l_linestatus = 'F'
    """,
)
def u2_except_all(spark, sf_dir):
    """U2 bag semantics: EXCEPT ALL subtracts MULTIPLICITIES (each 'F' row
    cancels one occurrence of its flag), where DISTINCT except would
    collapse to at most three rows — a genuinely different operator, not a
    flag on the same one. Spark plans ``exceptAll`` as a generate-over-
    counts rewrite (sum of +1/-1 per side, then replicate), so the shuffle
    carries one row per distinct value per partition, not per input row —
    the same partial-agg shape as any groupBy at 100 TB."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(F.col("l_returnflag").alias("flag")).exceptAll(
        t.lineitem.where(F.col("l_linestatus") == "F").select(
            F.col("l_returnflag").alias("flag")
        )
    )


# ---------------------------------------------------------------------------
# F: scalar function families
# ---------------------------------------------------------------------------


@query(
    "f1_string_funcs",
    sql="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           length(p_name) AS name_len,
           substr(p_brand, 1, 5) AS brand_prefix,
           regexp_extract(p_type, '([a-z]+)$', 1) AS type_suffix,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
)
def f1_string_funcs(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_brand", 1, 5).alias("brand_prefix"),
        F.regexp_extract("p_type", "([a-z]+)$", 1).alias("type_suffix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "f2_math_funcs",
    sql="""
    SELECT l_orderkey, l_linenumber,
           (floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100) AS charge,
           (floor((ln(l_quantity + 1)) * 1000000 + 0.5) / 1000000) AS log_qty,
           (floor((sqrt(l_extendedprice)) * 1000000 + 0.5) / 1000000) AS sqrt_price,
           abs((floor((l_discount - 0.05) * 10000 + 0.5) / 10000)) AS disc_dev
    FROM lineitem WHERE l_quantity <= 5
    """,
)
def f2_math_funcs(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.lineitem.where(F.col("l_quantity") <= 5).select(
        "l_orderkey",
        "l_linenumber",
        rnd(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            2,
        ).alias("charge"),
        rnd(F.log(F.col("l_quantity") + 1), 6).alias("log_qty"),
        rnd(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.abs(rnd(F.col("l_discount") - 0.05, 4)).alias("disc_dev"),
    )


@query(
    "f3_conditional",
    sql="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                ELSE 'cold' END AS urgency,
           count(*) AS n, (floor(((CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE) / count(o_totalprice))) * 10000 + 0.5) / 10000) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def f3_conditional(spark, sf_dir):
    t = Tables(spark, sf_dir)
    urgency = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
    )
    return t.orders.groupBy(urgency.alias("urgency")).agg(
        F.count(F.lit(1)).alias("n"),
        rnd(davg("o_totalprice"), 4).alias("avg_price"),
    )


@query(
    "f4_datetime",
    sql="""
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           count(*) AS n,
           CAST(min(date_diff('day', TIMESTAMP '2024-01-01', o_orderdate)) AS BIGINT)
               AS min_days_since_epoch_start
    FROM orders GROUP BY 1, 2
    """,
)
def f4_datetime(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.orders.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.datediff("o_orderdate", F.lit("2024-01-01")))
        .cast("bigint")
        .alias("min_days_since_epoch_start"),
    )


@query(
    "f5_array_funcs",
    sql="""
    SELECT p_partkey,
           len(words) AS n_words,
           list_contains(words, 'green') AS has_green,
           list_sort(words)[1] AS first_word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    """,
)
def f5_array_funcs(spark, sf_dir):
    t = Tables(spark, sf_dir)
    words = F.split(F.col("p_name"), " ")
    return t.part.select(
        "p_partkey",
        F.size(words).cast("long").alias("n_words"),
        F.array_contains(words, "green").alias("has_green"),
        F.sort_array(words).getItem(0).alias("first_word"),
    )


@query(
    "f6_json",
    sql="""
    SELECT event_type,
           (floor((avg(CAST(json_extract_string(props, '$.k') AS DOUBLE))) * 10000 + 0.5) / 10000) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def f6_json(spark, sf_dir):
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k")
    return t.events.groupBy("event_type").agg(
        rnd(F.avg(k.cast("double")), 4).alias("avg_k"),
        F.max(k.cast("int")).cast("long").alias("max_k"),
    )


@query(
    "f7_hash_funcs",
    sql="""
    SELECT c_custkey, md5(c_name) AS name_md5,
           substr(md5(concat(c_name, ':', CAST(c_custkey AS VARCHAR))), 1, 8) AS salt8
    FROM customer WHERE c_custkey <= 100
    """,
)
def f7_hash_funcs(spark, sf_dir):
    """F7: md5-based deterministic hashing (reference uses SHA1-of-text for
    train/test splits, mr_text_classifier.py:40-43)."""
    t = Tables(spark, sf_dir)
    return t.customer.where(F.col("c_custkey") <= 100).select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.substring(
            F.md5(F.concat_ws(":", "c_name", F.col("c_custkey").cast("string"))), 1, 8
        ).alias("salt8"),
    )


@query(
    "q3_shipping_priority",
    sql="""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           (floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate  > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """Composite workload: TPC-H Q3 shape — selective filters on THREE
    tables feed a join chain, grouped revenue, global top-10. What it
    proves at scale: every filter is written pre-join so it reaches the
    scans (pushdown prunes both fact sides before the shuffle), and the
    final ORDER BY + LIMIT compiles to TakeOrderedAndProject, not a global
    sort. Declarative composition — Catalyst picks the join order."""
    t = Tables(spark, sf_dir)
    cutoff = "1995-03-15"
    cust = t.customer.where(F.col("c_mktsegment") == "BUILDING")
    orders = t.orders.where(F.col("o_orderdate") < cutoff)
    li = t.lineitem.where(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            rnd(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    sql="""
    SELECT n_name,
           (floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """Composite workload: TPC-H Q5 shape — a six-table join whose graph
    has a CYCLE (customer's nation must equal supplier's nation), the case
    that separates a join planner from a star template. The region filter
    prunes through two broadcast dims before touching facts; the
    nation-equality rides the supplier join as a second key rather than a
    post-join filter, shrinking the join output at the operator."""
    t = Tables(spark, sf_dir)
    asia_nations = (
        F.broadcast(t.nation)
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .select("n_nationkey", "n_name")
    )
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            rnd(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_ANSI_SQL_PORTABLE = """
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_orders,
           (floor((CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE))
                  * 100 + 0.5) / 100) AS revenue
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
"""


@query("sql1_ansi_interface", sql=_ANSI_SQL_PORTABLE)
def sql1_ansi_interface(spark, sf_dir):
    """The pure-SQL entry point: fixture tables registered as temp views,
    the query submitted as an ANSI string through ``spark.sql`` — and the
    SAME string is the DuckDB oracle, so this proves the engine's SQL
    dialect surface (join, group, decimal-exact aggregation, the portable
    rounding expression) is genuinely ANSI-portable, not DataFrame-only.
    Catalyst plans it identically to the DataFrame formulation (broadcast
    customer join into one grouped aggregate)."""
    from mrjob_spark.catalog import register_temp_views

    # touch Tables first so session conf (nanosAsLong etc.) is applied
    Tables(spark, sf_dir)
    register_temp_views(spark, sf_dir)
    return spark.sql(_ANSI_SQL_PORTABLE)


@query(
    "q18_large_volume_customer",
    sql="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
               AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customer): an aggregated HAVING
    subquery feeding a semi-join back into the fact table, then a second
    aggregation over the joined result. The planner pattern this proves:
    the subquery aggregates lineitem ONCE with map-side partial agg, its
    (small) surviving key set semi-joins the fact scan, and the customer
    dimension rides a broadcast. Quantities accumulate in DECIMAL(38,6)
    so the HAVING cut and the output sums are bit-identical across
    engines — a double sum near the threshold could otherwise flip rows
    in or out of the result."""
    t = Tables(spark, sf_dir)
    lineitem, orders, customer = t.lineitem, t.orders, t.customer
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("qty"))
        .where(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(dsum("l_quantity").alias("total_qty"))
    )


_CORRELATED_SQL = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT 1.5 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(38,6)))
                           AS DOUBLE) / count(*))
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
"""


@query("sql2_correlated_subquery", sql=_CORRELATED_SQL)
def sql2_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery — each order compared against 1.5x its
    own customer's average price. Catalyst decorrelates this into one
    aggregate of orders joined back to orders (no per-row re-execution,
    no nested loop — the plan test pins it); DuckDB runs the IDENTICAL
    string as the oracle. The per-customer average accumulates in
    DECIMAL(38,6) so the comparison threshold is bit-identical across
    engines — a plain double avg could flip boundary rows."""
    from mrjob_spark.catalog import register_temp_views

    Tables(spark, sf_dir)
    register_temp_views(spark, sf_dir)
    return spark.sql(_CORRELATED_SQL)


@query(
    "q7_volume_shipping",
    sql="""
    SELECT supp_nation, cust_nation, l_year,
           (floor((CAST(sum(CAST(volume AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """Composite workload: TPC-H Q7 shape — bilateral trade volume between
    two nations by year. The disjunctive nation-pair predicate is the
    planner trap: evaluated post-join it forces full fact-fact joins first.
    Here both dimension sides are pre-filtered to the two nations (broadcast
    semi-reduction), so supplier and customer shrink BEFORE the fact joins,
    and the disjunction collapses to ``supp_nation != cust_nation`` over a
    two-value domain. At 100 TB the join graph's facts arrive pre-pruned by
    the only selective predicate available."""
    t = Tables(spark, sf_dir)
    pair = ("NATION_1", "NATION_2")
    n1 = F.broadcast(
        t.nation.where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        t.nation.where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    )
    supp = t.supplier.join(n1, F.col("s_nationkey") == F.col("s_nkey"))
    cust = t.customer.join(n2, F.col("c_nationkey") == F.col("c_nkey"))
    li = t.lineitem.where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    return (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    sql="""
    SELECT c_custkey, c_name, n_name,
           (floor((CAST(sum(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """Composite workload: TPC-H Q10 shape — lost-revenue ranking of
    customers who returned goods in one quarter. The returnflag filter is
    on the fact, the date window on orders; both are written pre-join so
    they reach the scans. nation broadcasts; top-20 compiles to
    TakeOrderedAndProject (no global sort of the aggregate). Tiebreak on
    c_custkey makes the LIMIT row set deterministic."""
    t = Tables(spark, sf_dir)
    orders = t.orders.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t.lineitem.where(F.col("l_returnflag") == "R")
    return (
        t.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            rnd(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    sql="""
    SELECT (floor((100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                       AS DECIMAL(38,6))) AS DOUBLE)
            / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(38,6))) AS DOUBLE)) * 10000 + 0.5) / 10000) AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """Composite workload: TPC-H Q14 shape — promo share of one month's
    revenue: a conditional aggregate over a fact-dim join reduced to a
    single row. The month filter prunes lineitem at the scan; part joins
    broadcast (it carries only p_partkey/p_type after pruning). Both sums
    accumulate in DECIMAL(38,6) before the division so the ratio is
    bit-identical across engines."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            F.broadcast(t.part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            rnd(
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
                / dsum(vol),
                4,
            ).alias("promo_pct")
        )
    )


_PORTABLE_WINDOW_SQL = """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           (floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w
                        AS DOUBLE)) * 100 + 0.5) / 100) AS running_spend
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING)
"""


@query("sql3_portable_windows", sql=_PORTABLE_WINDOW_SQL)
def sql3_portable_windows(spark, sf_dir):
    """Third pure-SQL entry point: window functions through ``spark.sql``
    with the IDENTICAL string as the DuckDB oracle — named WINDOW clause,
    ranking + running decimal-exact frame aggregate, deterministic
    (date, orderkey) ordering. With sql1 (join/group) and sql2
    (correlated subquery) this pins that the ANSI surface extends to
    analytic functions, not just relational core."""
    from mrjob_spark.catalog import register_temp_views

    Tables(spark, sf_dir)
    register_temp_views(spark, sf_dir)
    return spark.sql(_PORTABLE_WINDOW_SQL)


@query(
    "a9_grouping_sets",
    sql="""
    SELECT o_orderpriority, o_orderstatus, count(*) AS n,
           (floor((CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def a9_grouping_sets(spark, sf_dir):
    """A9 completed: arbitrary GROUPING SETS through the native
    ``DataFrame.groupingSets`` API (Spark 4) — rollup and cube are its
    fixed special cases, this is the general form (two one-dimension
    marginals plus the grand total in ONE pass). Catalyst plans it as a
    single Expand + hash aggregate: the scan happens once however many
    sets are requested, which is the whole point versus unioning three
    aggregates at 100 TB."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(dsum("o_totalprice"), 2).alias("revenue"),
        )
    )
