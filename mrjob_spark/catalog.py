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

#: Scale-adaptive leaf fan-out (round 13, guide §2 "derive partitioning
#: from input size, not a constant"): a parquet file parallelizes at most
#: one task per ROW GROUP — byte-range splits beyond that are no-ops
#: (each row group is read by whichever split holds its midpoint), and
#: every fixture here is a single file with ONE row group, so without
#: intervention every leaf scan (and the compute-dense tokenize/shingle/
#: vector first stage fused onto it) runs as a single task at any core
#: count. When the physical layout cannot fill the machine, an explicit
#: round-robin repartition to ``defaultParallelism`` moves that first
#: stage onto all cores for the price of one small shuffle (the optimizer
#: still pushes filters and column pruning below the exchange, so only
#: pruned, filtered rows are shuffled). At production scale the layout
#: has row groups >= cores and this is structurally a no-op — the
#: condition is derived from the footer, not tuned to local[32].
#: Disable per-session with spark.mrjob_spark.input_fanout=false (the
#: at-scale plan-shape tests pin their invariants with it off).
_FANOUT_FLOOR_BYTES = 32 * 1024

#: (path, mtime, size) -> achievable parallel units from the footer.
_fanout_splits_cache: dict[tuple[str, float, int], int] = {}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _achievable_splits(path: str) -> int:
    """Upper bound on scan parallelism the file layout admits: one unit
    per parquet row group (summed across files for a directory)."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        files = [path]
    else:
        files = [
            os.path.join(root, f)
            for root, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]
    total = 0
    for f in files:
        st = os.stat(f)
        key = (f, st.st_mtime, st.st_size)
        n = _fanout_splits_cache.get(key)
        if n is None:
            n = max(1, pq.ParquetFile(f).metadata.num_row_groups)
            _fanout_splits_cache[key] = n
        total += n
    return total


def _adaptive_fanout(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    if spark.conf.get("spark.mrjob_spark.input_fanout", "true") != "true":
        return df
    try:
        if os.path.isfile(path):
            nbytes = os.path.getsize(path)
        else:
            nbytes = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, fs in os.walk(path)
                for f in fs
            )
        if nbytes < _FANOUT_FLOOR_BYTES:
            return df  # broadcast-class dims: scheduling would cost more
        cores = spark.sparkContext.defaultParallelism
        if _achievable_splits(path) >= cores:
            return df  # the layout already fills the machine
    except Exception:
        return df  # unreadable footer/path: never fail a read over a hint
    # explicit numPartitions => AQE will not coalesce it back down
    return df.repartition(cores)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_session(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    # events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
    # for; nanosAsLong (set in RUNTIME_CONFS) reads it as int64 nanos and we
    # truncate to microseconds — the same truncation DuckDB applies, so
    # oracle comparisons agree.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _adaptive_fanout(spark, df, table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame; keys are table names."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all tables as temp views for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
