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
from mrjob_spark.queries import composites  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Driver-visibility ordering. The correctness driver differentially checks
# the first 50 registry entries per round; rounds 1-2 only ever saw the
# first 50 registration-order names, leaving the dataflow/IO/UDF/streaming
# surface and the l4-l7 tail locally-verified but never driver-checked
# (VERDICT r2 "what's wrong" #1). Reorder so those land inside the window
# first; everything else (green in r1/r2) fills the remaining slots in its
# original order. Names listed here but not (yet) registered are ignored,
# so the list can lead the code.
# ---------------------------------------------------------------------------

_DRIVER_PRIORITY = [
    # never driver-checked through round 2
    "x1_dataflow_wordcount",
    "x2_dataflow_most_used_word",
    "o3_dataflow_sorted_dates",
    "x5_dataflow_pipe_grep",
    "a8_dataflow_counters",
    "x1_udtf_tokenize",
    "x2_udaf_quantiles",
    "s7_csv_roundtrip",
    "s7_json_roundtrip",
    "o1_o2_partition_layout",
    "s10_partitioned_sink",
    "s4_s5_file_attribution",
    "s1_s2_gzip_text_scan",
    "st4_session_window",
    "st5_stream_dedup",
    "l4_doc_fingerprint",
    "l5_lang_id",
    "l6_multimodal_bytes",
    "l6_media_features",
    "l7_quality_profile",
    "mr_wordcount",
    "mr_most_used_word",
    # q7 was queued past the window; r1-green l3_knn_lsh (rows-only, plan
    # unchanged) gave up its slot so one more never-checked query fits
    "q7_volume_shipping",
    # new in round 4: the two most novel execution paths get window slots
    # (the remaining round-4 queries sit just past the window and rotate in
    # next round; l3_knn_bucketed / l4_token_stats gave up their slots —
    # both r1-green with unchanged plans)
    "st9_foreachbatch_sink",
    "l2_span_dedup",
    # new in round 3
    "s6_hadoop_input_format",
    "x6_spark_step",
    "l8_weighted_mixture",
    "l8_quality_filter",
    "l8_sequence_packing",
    "skew_salted_collect_set",
    "st6_stateful_running_totals",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "l4_ngrams",
    "l4_tfidf",
    "l5_text_classifier",
    "mr_next_word_stats",
    "l8_decontaminate",
    "st7_stream_enrich_window",
    "l4_bpe_token_count",
    "sql1_ansi_interface",
    "o5_dataflow_head_per_group",
    "st8_stream_stream_join",
    "q18_large_volume_customer",
    "sql2_correlated_subquery",
    "st8_stream_stream_left_outer",
    "s7_orc_roundtrip",
    # changed in round 3 (localCheckpoint intermediates / CC rewrite) —
    # keep inside the window so the driver re-verifies the new plans
    "l2_minhash_lsh_pairs",
    "l1_dedup_clusters",
]


#: Round-4/5 additions that do NOT fit the current 50-entry driver window
#: (46 never-checked + 2 changed-plan re-verifies + 2 new already fill it).
#: Listing them here is an explicit acknowledgment, enforced by
#: tests/test_registry.py: a query may sit beyond the window ONLY if it was
#: driver-green before or is queued here — so displacement is always a
#: choice, never an accident (VERDICT r2 "what's wrong" #1). Rotate these
#: into _DRIVER_PRIORITY next round, when this round's 46 go green —
#: ordering suggestion: the capstone (l8_pipeline_end_to_end) and the
#: q-series first, they prove the most composition per slot.
_ROTATION_QUEUE = [
    "q10_returned_items",
    "q14_promo_revenue",
    "l5_repetition_filter",
    "l4_vocab_coverage",
    "l8_token_mask",
    # round-5 composites (queries/composites.py): the q-series completions
    # feasible on this schema (no partsupp / commit-receipt dates / phone)
    "q4_order_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_join",
    "q22_sales_opportunity",
    "l8_global_shuffle",
    "a11_exact_percentiles",
    "l8_pipeline_end_to_end",
    "sql3_portable_windows",
    "l8_sequence_packing_scalable",
    "a9_grouping_sets",
    "u2_except_all",
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
