from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("MRJOB_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mrjob_spark.session import get_spark

    s = get_spark(
        app_name="mrjob_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()
