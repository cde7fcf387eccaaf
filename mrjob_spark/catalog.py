"""Table catalog over the driver's parquet fixtures (TESTDATA.md).

Scans S7 (SURVEY.md §2.1): parquet is the primary columnar path — Catalyst
gets predicate pushdown, column pruning and partition pruning for free on
these reads; verify with ``df.explain('formatted')`` → ``PushedFilters`` /
``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrjob_spark.session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor — region
#: and nation are fixed-cardinality (5 / 25 rows) in TPC-H-style schemas, so
#: broadcasting them is correct even at 100 TB.
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_session(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
    # for; nanosAsLong (set in RUNTIME_CONFS) reads it as int64 nanos and we
    # truncate to microseconds — the same truncation DuckDB applies, so
    # oracle comparisons agree.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame; keys are table names."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
