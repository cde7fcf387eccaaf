"""Declared query surface — the correctness/bench contract.

Every operator family from SURVEY.md §2 is exercised by at least one named
query here. Each query is a ``(spark, sf_dir) -> DataFrame`` callable built
with the DataFrame API (Catalyst optimizes it), paired with an ANSI-SQL
oracle string that DuckDB runs over the same parquet fixtures.

Determinism rules (FIXTURES.md §C): floating aggregates are rounded before
comparison; ranking/top-k queries always carry a unique-key tiebreak; the
driver's value hash is order-insensitive so no global ORDER BY is required,
but LIMIT queries still sort explicitly to make the *row set* deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from mrjob_spark.catalog import load_table
from mrjob_spark.session import configure_session


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None):
    """Register a query under ``name`` with its DuckDB oracle SQL."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=fn.__doc__ or "")
        return fn

    return deco


class Tables:
    """Lazy per-query table accessor: ``t.lineitem`` reads the parquet scan
    (column pruning + filter pushdown happen in the plan that uses it)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = configure_session(spark)
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        from mrjob_spark.catalog import TABLES

        if name not in TABLES:
            # dunder probes / typos must raise AttributeError, not surface a
            # confusing AnalysisException on a nonexistent parquet path
            raise AttributeError(
                f"no fixture table {name!r} (have: {', '.join(TABLES)})"
            )
        return load_table(self._spark, self._sf_dir, name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}


# Populate the registry.
from mrjob_spark.queries import relational  # noqa: E402,F401
from mrjob_spark.queries import windows  # noqa: E402,F401
from mrjob_spark.queries import llm  # noqa: E402,F401
from mrjob_spark.queries import dataflow_queries  # noqa: E402,F401
from mrjob_spark.queries import streaming_queries  # noqa: E402,F401
from mrjob_spark.queries import io_queries  # noqa: E402,F401
from mrjob_spark.queries import udf_queries  # noqa: E402,F401
