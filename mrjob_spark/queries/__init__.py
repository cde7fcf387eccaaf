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
    # NEW in round 11: MinHash-band near-dup admission ingest (st11's
    # exact-hash admission composed with the LSH band machinery; the
    # streamed form replays cross-micro-batch against a growing parquet
    # band index in tests/test_streaming.py)
    "st12_incremental_neardup",
    # the full round-10 rotation queue — the 27 r7-greens, the stalest
    # cohort on the board — rejoins the window next (VERDICT r10 task
    # 3): after this round no green predates r8
    "l8_epoch_schedule",
    "l8_token_mask",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "a9_rollup",
    "a9_cube",
    "a9_grouping_sets",
    "s7_json_roundtrip",
    "s7_orc_roundtrip",
    "s7_parquet_scan_pushdown",
    "s9_compressed_sink",
    "o4_global_sort_limit",
    "o6_topk_per_group",
    "o7_deterministic_sample",
    "a11_exact_percentiles",
    "a1_pricing_summary",
    "j1_join_agg",
    "x1_udtf_tokenize",
    "x2_udaf_quantiles",
    "o1_o2_partition_layout",
    "s10_partitioned_sink",
    "s6_hadoop_input_format",
    # 22 of the 50 r8-greens (the next-stalest cohort once r11 lands)
    # fill the remaining slots — preferring queries that ride code
    # touched this round (the minhash/dedup family shares the
    # _band_structs refactor and the new signature route's neighbors;
    # the EMR control-plane rows ride the spot-bid request changes; the
    # stale-basis §10 composites q11/q20/q21 get fresh in-run readings
    # alongside their §21 basis refresh); the 28 stable-path r8-greens
    # sit in _ROTATION_QUEUE as the explicit ordered backlog that LEADS
    # the round-12 window
    "l2_minhash_lsh_capped",
    "l2_jaccard_pairs",
    "l1_exact_dedup",
    "l1_normalized_dedup",
    "l2_semdedup_prune",
    "l2_simhash",
    "l2_embedding_neardup_planted",
    "l3_knn_lsh",
    "l4_bpe_train",
    "mr_emr_reference_differential",
    "x6_spark_script",
    "x7_jar_step_emr",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st3_sessionization",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_priority_class",
    "q17_small_quantity_revenue",
    "q19_disjunctive_join",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
]


#: Queries that do NOT fit the current 50-entry driver window. Listing them
#: here is an explicit acknowledgment, enforced by tests/test_registry.py:
#: a query may sit beyond the window ONLY if it was driver-green before or
#: is queued here — so displacement is always a choice, never an accident
#: (VERDICT r2 "what's wrong" #1). Round 11: the queue is the STRUCTURAL
#: overflow the registry size forces — 175 queries cycle through a
#: 50-slot window against a 3-round staleness horizon, so
#: registry − 3×window = 25 greens must sit out each round (cap 29 with
#: the +4 slack). The 28 names below are the r8-greens that didn't fit
#: behind the returning 27 r7-greens: stable-path queries untouched this
#: round — single-operator relational/window rows, the dataflow-runner
#: micro family, io scans, and the l3/l4 rows whose heavier siblings are
#: in-window. They LEAD the round-12 window.
_ROTATION_QUEUE: list[str] = [
    "q22_sales_opportunity",
    "a3_count_per_group",
    "a4_global_agg",
    "a5_argmax_per_group",
    "a6_distinct",
    "a7_stats_per_group",
    "a8_dataflow_counters",
    "j2_broadcast_star",
    "j6_asof_join",
    "l3_kmeans_assign",
    "l3_knn_bruteforce",
    "l3_knn_bucketed",
    "l4_token_stats",
    "l8_dsir_select",
    "mr_next_word_stats",
    "mr_text_classifier",
    "o3_dataflow_sorted_dates",
    "o5_dataflow_head_per_group",
    "p3_filter_predicate",
    "p7_project_rename",
    "s1_s2_gzip_text_scan",
    "s4_s5_file_attribution",
    "u2_except_all",
    "w1_ranking_scalable",
    "w4_range_frame_scalable",
    "x1_dataflow_wordcount",
    "x2_dataflow_most_used_word",
    "x5_dataflow_pipe_grep",
]


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
