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
    #: set when this query is a CORRECTNESS BASELINE whose physical form is
    #: known super-linear at scale — the value names the registered
    #: production twin that IS the shippable form. Machine-readable "don't
    #: ship this plan" (VERDICT r5 task 4); tests/test_registry.py asserts
    #: every baseline's twin exists.
    baseline_of: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None, baseline_of: str | None = None):
    """Register a query under ``name`` with its DuckDB oracle SQL.

    ``baseline_of="twin_name"`` marks the query as a labeled correctness
    baseline (quadratic/cartesian/uncapped form kept for oracle parity and
    honest cost comparison); ``twin_name`` is the linear-regime production
    query that replaces it at scale.
    """

    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, sql=sql, doc=fn.__doc__ or "",
            baseline_of=baseline_of,
        )
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
from mrjob_spark.queries import composites  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Driver-visibility ordering. The correctness driver differentially checks
# the first 50 registry entries per round. As of round 4 every registered
# query has been driver-green at least once (VERDICT r4), so the window's
# job flips from first-time coverage to FRESHNESS (VERDICT r4 task 2):
# lead with queries that are new/changed this round, then the queries
# whose only green dates from rounds 1-2 — those were checked under the
# pre-environment-shift runtime (BASELINE.md §8 documents engine-behavior
# drift mid-history), making them the weakest greens on the board — then
# fill with the r3-era greens that ride the dataflow runner code changed
# this round. tests/test_registry.py enforces the staleness invariant from
# the CORRECTNESS_r*.json files themselves. Names listed here but not
# (yet) registered are ignored, so the list can lead the code.
# ---------------------------------------------------------------------------

_DRIVER_PRIORITY = [
    # new or semantically changed in round 7: the -r hadoop, -r emr and
    # -r dataproc runners' control-plane queries (wordcount through
    # hadoop jar / pooled EMR steps / the Dataproc jobs API against the
    # executing mock clusters), the tight-radius (≥0.8 cosine) embedding
    # near-dup production query (VERDICT r6 task 4) and q8_market_share,
    # whose fixture-pinned fact-table broadcasts were dropped for the
    # q9/q12 scale-adaptive policy (VERDICT r6 task 2)
    "mr_dataproc_topword",
    "mr_emr_wordfreq",
    "mr_hadoop_wordfreq",
    "l2_embedding_neardup_tight",
    "q8_market_share",
    # the 10 r3-greens past the freshness horizon (VERDICT r6 task 1):
    # the 7 the tripwire names plus the 3 whose one-round rotation-queue
    # deferral is spent
    "l2_minhash_lsh_pairs",
    "l1_dedup_clusters",
    "x6_spark_step",
    "s7_json_roundtrip",
    "o1_o2_partition_layout",
    "s10_partitioned_sink",
    "s6_hadoop_input_format",
    "s7_orc_roundtrip",
    "x1_udtf_tokenize",
    "x2_udaf_quantiles",
    # r4-greens, next-stalest on the board (registration order). 38 of 46
    # fit; the 8 deferred (p3_filter_predicate, p7_project_rename,
    # a3_count_per_group, a4_global_agg, a5_argmax_per_group, a6_distinct,
    # a7_stats_per_group, u2_except_all) are single-operator relational
    # queries with no join/window/Python machinery — still inside the
    # freshness horizon today, first in line for the round-8 window when
    # CORRECTNESS_r07 advances it
    "s7_parquet_scan_pushdown",
    "a1_pricing_summary",
    "a9_rollup",
    "a9_cube",
    "a11_exact_percentiles",
    "o4_global_sort_limit",
    "o6_topk_per_group",
    "o7_deterministic_sample",
    "j1_join_agg",
    "q10_returned_items",
    "q14_promo_revenue",
    "sql3_portable_windows",
    "a9_grouping_sets",
    "l2_span_dedup",
    "l2_span_dedup_capped",
    "l5_repetition_filter",
    "l4_vocab_coverage",
    "l8_token_mask",
    "l8_global_shuffle",
    "l8_pipeline_end_to_end",
    "l8_sequence_packing_scalable",
    "l3_embedding_quantize",
    "l3_knn_two_stage",
    "l4_bigram_lm",
    "l5_lm_perplexity",
    "l8_epoch_schedule",
    "x7_jar_step",
    "a8_o3_counters_sorted",
    "st10_stream_pipeline",
    "s9_compressed_sink",
    "s13_bucketed_join",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q15_top_supplier",
    # q22_sales_opportunity, q19_disjunctive_join and
    # q17_small_quantity_revenue (all r4-green) yielded their slots to
    # the round-7 mr_hadoop_wordfreq / mr_emr_wordfreq /
    # mr_dataproc_topword leads; still inside the freshness horizon,
    # first in line with the 8 deferred r4 singles for the round-8
    # window
]


#: Queries that do NOT fit the current 50-entry driver window. Listing them
#: here is an explicit acknowledgment, enforced by tests/test_registry.py:
#: a query may sit beyond the window ONLY if it was driver-green before or
#: is queued here — so displacement is always a choice, never an accident
#: (VERDICT r2 "what's wrong" #1). Round 7: empty — the three round-6
#: queue entries rejoined the window (their one-round deferral is spent)
#: and every other out-of-window query's latest green is inside the
#: freshness horizon, so nothing needs an acknowledgment slot.
_ROTATION_QUEUE: list[str] = []


#: Registration (module) order, preserved before the driver-priority
#: reorder. bench.py iterates THIS order so per-query timings stay
#: position-comparable with BASELINE.md §4, which was recorded in module
#: order — heavy dataflow/RDD queries late, micro relational queries in a
#: fresh session. (Session state accumulated by earlier queries adds a
#: measurable fixed cost to later ones, so order changes masquerade as
#: per-query regressions.)
MODULE_ORDER: list[str] = []


def _reorder_registry() -> None:
    global REGISTRY
    MODULE_ORDER.extend(REGISTRY)
    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY = ordered


_reorder_registry()
