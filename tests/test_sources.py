"""Source/sink + partitioning operator tests (SURVEY.md §2.1, §2.4)."""

from __future__ import annotations

import glob
import io
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mrjob_spark.operators.partitioning import (
    partition_audit,
    repartition_by_key,
    sort_within_partitions,
)
from mrjob_spark.sources import (
    cat_output,
    read_csv,
    read_hadoop_input_format,
    read_json,
    write_table,
)


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [Row(pid=i, grp=f"g{i % 3}", score=float(i) / 2) for i in range(30)]
    )


def test_csv_roundtrip_with_schema(spark, people, tmp_path):
    path = str(tmp_path / "csv")
    write_table(people, path, fmt="csv", max_output_files=2)
    back = read_csv(spark, path, schema=people.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, people.collect()))
    parts = glob.glob(os.path.join(path, "part-*"))
    assert len(parts) <= 2  # S11 file-count control


def test_json_roundtrip(spark, people, tmp_path):
    path = str(tmp_path / "json")
    write_table(people, path, fmt="json")
    back = read_json(spark, path, schema=people.schema).select(*people.columns)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, people.collect()))


def test_partitioned_sink_layout_and_pruning(spark, people, tmp_path):
    path = str(tmp_path / "bykey")
    write_table(people, path, partition_by=["grp"], max_output_files=1)
    # Hive layout on disk
    assert sorted(
        d for d in os.listdir(path) if d.startswith("grp=")
    ) == ["grp=g0", "grp=g1", "grp=g2"]
    back = cat_output(spark, path)
    assert back.count() == 30
    # partition pruning: a filter on the partition col reads one directory
    plan = back.filter("grp = 'g1'")._jdf.queryExecution().executedPlan().toString()
    assert "g1" in plan


def test_compressed_sink(spark, people, tmp_path):
    path = str(tmp_path / "gz")
    write_table(people, path, fmt="csv", compression="gzip", max_output_files=1)
    assert glob.glob(os.path.join(path, "part-*.csv.gz"))
    back = read_csv(spark, path, schema=people.schema)
    assert back.count() == 30


def test_hadoop_input_format_scan(spark, tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    rdd = read_hadoop_input_format(spark, str(p))
    pairs = sorted(rdd.collect())
    assert [v for _, v in pairs] == ["alpha", "beta", "gamma"]
    assert pairs[0][0] == 0  # keys are byte offsets (LongWritable)


def test_repartition_and_sort_layout(spark, people):
    laid = sort_within_partitions(repartition_by_key(people, 4, "pid"), "pid")
    audit = partition_audit(laid, "pid").collect()
    assert sum(r["rows"] for r in audit) == 30
    assert all(r["is_sorted"] == 1 for r in audit)
    assert len(audit) <= 4


def test_partition_audit_detects_unsorted(spark, people):
    # rows materialized in descending pid order, single partition (a sort
    # before a repartition would be optimized away — order the SOURCE)
    unsorted = spark.createDataFrame(
        [Row(pid=i) for i in range(29, -1, -1)]
    ).coalesce(1)
    audit = partition_audit(unsorted, "pid").collect()
    assert audit[0]["rows"] == 30
    assert audit[0]["is_sorted"] == 0


def test_stdin_source(spark, monkeypatch):
    """S3: '-' input path drains driver stdin into the dataflow plan."""
    from mrjob_spark.dataflow.examples import MRWordFreqCount
    from mrjob_spark.dataflow.runner import SparkJobRunner

    class FakeStdin:
        buffer = io.BytesIO(b"hello world\nhello spark\n")

    monkeypatch.setattr("sys.stdin", FakeStdin)
    with SparkJobRunner(MRWordFreqCount(), spark=spark, input_paths=["-"]) as r:
        got = dict(r.output_pairs().collect())
    assert got == {"hello": 2, "world": 1, "spark": 1}


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """The co-located-join contract: two tables bucketed identically on the
    join key sort-merge-join with ZERO exchanges — the shuffle was paid at
    write time. This is the plan property that makes recurring fact-dim
    joins affordable at scale."""
    from mrjob_spark.sources import write_bucketed_table

    left = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn(
        "lv", F.col("k") * 2
    )
    right = spark.range(0, 1000, 3).withColumnRenamed("id", "k").withColumn(
        "rv", F.col("k") + 1
    )
    write_bucketed_table(
        left, spark, "bt_left", buckets=4, bucket_cols=["k"],
        sort_cols=["k"], path=str(tmp_path / "bt_left"),
    )
    write_bucketed_table(
        right, spark, "bt_right", buckets=4, bucket_cols=["k"],
        sort_cols=["k"], path=str(tmp_path / "bt_right"),
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bt_left").join(spark.table("bt_right"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan
            # and the values are right
            assert joined.count() == 334  # ceil(1000/3)
            got = {(r["k"], r["lv"], r["rv"]) for r in joined.collect()}
            assert (0, 0, 1) in got and (999, 1998, 1000) in got
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_left")
        spark.sql("DROP TABLE IF EXISTS bt_right")


def test_bucketed_aggregation_skips_exchange(spark, tmp_path):
    from mrjob_spark.sources import write_bucketed_table

    df = spark.range(0, 1000).withColumn("k", F.col("id") % 50).select(
        "k", F.col("id").alias("v")
    )
    write_bucketed_table(
        df, spark, "bt_agg", buckets=4, bucket_cols=["k"],
        path=str(tmp_path / "bt_agg"),
    )
    try:
        agg = spark.table("bt_agg").groupBy("k").sum("v")
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_agg")
