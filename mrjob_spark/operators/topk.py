"""Top-k operators (SURVEY.md §2.4 O5/O6)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Head-per-group via row_number (reference idiom: reducer breaks after n
    values, mr_log_sampler.py:100-113). Callers must include a unique
    tie-break column in ``order_cols`` for determinism.

    Scale note: this is one shuffle on the group key; rank-filter pushes no
    extra pass. For tiny k over huge groups Spark's WindowGroupLimit
    optimization (Spark 3.5+) keeps only k rows per group per partition
    before the shuffle — verify with explain().
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
