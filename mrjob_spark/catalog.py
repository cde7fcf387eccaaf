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

# NOTE on leaf scan parallelism (round 13): every fixture is a single
# parquet file with ONE row group, so a leaf scan admits exactly one
# task no matter the core count (byte-range splits beyond the row-group
# count are no-ops). A catalog-level round-robin fan-out of every table
# was built and A/B-measured here: it won only where the per-row work
# on the scan is genuinely heavy (a1's DECIMAL partials: 2.0 -> 1.1 s)
# and LOST 0.1-1.1 s/query across the multi-join relational tier, the
# Python-boundary stages and the loop-shaped queries (extra exchange +
# 32-way width on tiny data). Scan-parallelism recovery therefore stays
# an explicit per-operator decision via
# operators.partitioning.parallelize_narrow_scan — a structural no-op
# whenever the layout already fills the machine.


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
