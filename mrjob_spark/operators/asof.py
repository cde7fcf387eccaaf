"""As-of (point-in-time) join — SURVEY.md §2.5 J6.

Spark has no ASOF JOIN; the scalable formulation is the union-merge: tag both
streams, union, then carry the most recent right-side row forward with a
running ``last(..., ignorenulls=True)`` window per key. One shuffle on
``(key, time)`` total — no range-join blowup, no per-row subquery, and it
survives 100 TB because each key's timeline is processed as one sorted run
(AQE handles key skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_value_cols: list[str],
    tie_break: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time <= left_time`` for the same key.

    Ties on ``right_time`` are broken by the greatest ``tie_break`` column
    (defaults to the first value column) so results are deterministic.
    ``how='inner'`` drops left rows with no prior right row; ``'left'``
    keeps them with nulls.
    """
    tie = tie_break or right_value_cols[0]

    r = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("__rv"),
    )
    l = left.select(
        "*",
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
    )
    # Right rows sort before left rows at equal time (inclusive match);
    # among equal-time right rows the greatest tie column wins because
    # last() takes the latest non-null in window order.
    unioned = l.select(r.columns + [F.struct(*left.columns).alias("__lrow")]).unionByName(
        r.select("*", F.lit(None).cast(
            l.select(F.struct(*left.columns).alias("__lrow")).schema["__lrow"].dataType
        ).alias("__lrow"))
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t"), F.col("__is_left"), F.col(f"__rv.{tie}"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
        .where(F.col("__is_left") == 1)
        .select(
            F.col("__lrow.*"),
            *[F.col(f"__match.{c}").alias(c) for c in right_value_cols],
        )
    )
    if how == "inner":
        matched = matched.where(F.col(right_value_cols[0]).isNotNull())
    return matched
