"""Window-function queries (SURVEY.md §2.7 W1-W4), the as-of join (J6), and
the batch-equivalent forms of the streaming operators (§2.10) — tumbling /
sliding / session windows run here over the static ``events`` table with
identical semantics to their Structured Streaming counterparts in
``mrjob_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from mrjob_spark.functions.rounding import rnd, dsum, davg
from pyspark.sql.window import Window

from mrjob_spark.operators.asof import asof_join
from mrjob_spark.operators.scalable_windows import (
    bucketed_ranking,
    bucketed_range_frame,
)
from mrjob_spark.queries import Tables, query


@query(
    "w1_ranking",
    sql="""
    SELECT c_mktsegment, c_custkey,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def w1_ranking(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return t.customer.select(
        "c_mktsegment",
        "c_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "w2_lag_lead",
    sql="""
    SELECT event_id, user_id,
           (floor((lag(value) OVER w) * 10000 + 0.5) / 10000) AS prev_value,
           (floor((lead(value) OVER w) * 10000 + 0.5) / 10000) AS next_value,
           first_value(event_type) OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w2_lag_lead(spark, sf_dir):
    """W2 analytic functions — the reference's next-word pairing
    (mr_next_word_stats.py:38-54) is lag() in disguise."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.select(
        "event_id",
        "user_id",
        rnd(F.lag("value").over(w), 4).alias("prev_value"),
        rnd(F.lead("value").over(w), 4).alias("next_value"),
        F.first("event_type").over(w).alias("first_type"),
    )


@query(
    "w3_running_total",
    sql="""
    SELECT o_custkey, o_orderkey,
           (floor((CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND CURRENT ROW) AS DOUBLE)) * 100 + 0.5) / 100) AS running_total,
           (floor((o_totalprice / CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) OVER (PARTITION BY o_custkey) AS DOUBLE)) * 1000000 + 0.5) / 1000000)
               AS share_of_customer
    FROM orders
    """,
)
def w3_running_total(spark, sf_dir):
    """W3 running aggregate + share-of-total (the reference hand-rolls this
    with SORT_VALUES + an accumulator, mr_next_word_stats.py:76-95)."""
    t = Tables(spark, sf_dir)
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("o_custkey")
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        rnd(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w_run).cast("double"), 2).alias("running_total"),
        rnd(
            F.col("o_totalprice") / F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w_all).cast("double"), 6
        ).alias("share_of_customer"),
    )


@query(
    "w4_range_frame",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           CAST(count(*) OVER w AS BIGINT) AS n_in_band,
           (floor(((CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) OVER w AS DOUBLE) / count(o_totalprice) OVER w)) * 10000 + 0.5) / 10000) AS avg_in_band
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
    """,
)
def w4_range_frame(spark, sf_dir):
    """W4 RANGE frame: value-based window (all peers of equal sort value are
    in-frame, so the result is deterministic despite ties)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-100, Window.currentRow)
    )
    return t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.count(F.lit(1)).over(w).alias("n_in_band"),
        rnd((F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double") / F.count(F.col("o_totalprice")).over(w)), 4).alias("avg_in_band"),
    )


@query(
    "w1_ranking_scalable",
    sql="""
    SELECT c_mktsegment, c_custkey,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def w1_ranking_scalable(spark, sf_dir):
    """W1 at 100 TB: same result as w1_ranking (identical oracle — the
    driver's hash match proves it) but no task ever holds a whole market
    segment. See operators/scalable_windows.py for the range-bucket +
    offset-merge construction."""
    t = Tables(spark, sf_dir)
    return bucketed_ranking(
        t.customer.select("c_mktsegment", "c_custkey", "c_acctbal"),
        partition_col="c_mktsegment",
        value_col="c_acctbal",
        tie_col="c_custkey",
        bucket_width=500.0,
    ).select("c_mktsegment", "c_custkey", "rn", "rnk", "drnk", "quartile")


@query(
    "w4_range_frame_scalable",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           CAST(count(*) OVER w AS BIGINT) AS n_in_band,
           (floor(((CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) OVER w AS DOUBLE) / count(o_totalprice) OVER w)) * 10000 + 0.5) / 10000) AS avg_in_band
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
    """,
)
def w4_range_frame_scalable(spark, sf_dir):
    """W4 at 100 TB: bounded RANGE frame via ghost-row bucketing — each row
    duplicates once into the next value-bucket, so a plain range window
    inside (priority, bucket) sees exactly the global frame. Same oracle as
    w4_range_frame."""
    t = Tables(spark, sf_dir)
    aggs = [
        lambda w: F.count(F.lit(1)).over(w).alias("n_in_band"),
        lambda w: rnd(
            (
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w).cast("double")
                / F.count(F.col("o_totalprice")).over(w)
            ),
            4,
        ).alias("avg_in_band"),
    ]
    return bucketed_range_frame(
        t.orders.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        partition_col="o_orderpriority",
        order_col="o_totalprice",
        range_width=100.0,
        agg_exprs=aggs,
    ).select("o_orderkey", "o_orderpriority", "n_in_band", "avg_in_band")


@query(
    "j6_asof_join",
    sql="""
    SELECT event_id, user_id, ts, asof_orderkey, asof_total FROM (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey AS asof_orderkey,
               (floor((o.o_totalprice) * 100 + 0.5) / 100) AS asof_total,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def j6_asof_join(spark, sf_dir):
    """J6: for each event, the user's most recent order at event time.
    Implemented with the union-merge asof operator (one shuffle, no
    range-join blowup — see operators/asof.py); the oracle states the same
    semantics as a range join + row_number."""
    t = Tables(spark, sf_dir)
    orders = t.orders.select(
        "o_custkey",
        "o_orderdate",
        F.col("o_orderkey").alias("asof_orderkey"),
        rnd("o_totalprice", 2).alias("asof_total"),
    )
    events = t.events.select("event_id", "user_id", "ts")
    return asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_value_cols=["asof_orderkey", "asof_total"],
        tie_break="asof_orderkey",
        how="inner",
    )


# ---------------------------------------------------------------------------
# §2.10 streaming operators, batch-equivalent form (the Structured Streaming
# wrappers in mrjob_spark.streaming share these exact semantics).
# ---------------------------------------------------------------------------


@query(
    "st1_tumbling_window",
    sql="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS wstart, event_type,
           count(*) AS n, (floor((CAST(sum(CAST((value) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def st1_tumbling_window(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(dsum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("wstart"), "event_type", "n", "sum_value")
    )


@query(
    "st2_sliding_window",
    sql="""
    SELECT wstart, count(*) AS n, (floor(((CAST(sum(CAST((value) AS DECIMAL(38,6))) AS DOUBLE) / count(value))) * 10000 + 0.5) / 10000) AS avg_value FROM (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS wstart, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
        FROM events
    ) GROUP BY wstart
    """,
)
def st2_sliding_window(spark, sf_dir):
    """10-minute windows sliding every 5 — each event lands in exactly two
    windows; the oracle materializes both window starts explicitly."""
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(davg("value"), 4).alias("avg_value"),
        )
        .select(F.col("w.start").alias("wstart"), "n", "avg_value")
    )


@query(
    "st3_sessionization",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, event_id, value,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                                    AND CURRENT ROW) AS BIGINT)
                   AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq, min(ts) AS session_start,
           count(*) AS n_events, (floor((CAST(sum(CAST((value) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS sum_value
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def st3_sessionization(spark, sf_dir):
    """Session windows (30-min inactivity gap) in batch form: lag-gap flag +
    running sum assigns session ids in one pass — the batch twin of
    F.session_window in the streaming module."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # interval arithmetic, not cast-to-double: TIMESTAMP_NTZ (what Spark 4
    # infers for tz-less parquet timestamps) refuses numeric casts, and
    # ts - lag(ts) > INTERVAL is the oracle SQL's own formulation
    prev = F.lag("ts").over(w)
    gap_over = (F.col("ts") - prev) > F.expr("INTERVAL '30' MINUTE")
    flagged = t.events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(prev.isNull() | gap_over, 1).otherwise(0).alias("new_session"),
    )
    numbered = flagged.withColumn("session_seq", F.sum("new_session").over(w_run))
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        rnd(dsum("value"), 2).alias("sum_value"),
    )
