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
    # NEW in round 12: the L6 multimodal deepening (VERDICT r11 task 5)
    # — cross-modal exact dedup over BinaryType and corpus-scale media
    # metadata extraction through the real header sniffer
    "l6_cross_modal_dedup",
    "l6_media_metadata_extract",
    "l1_url_dedup",
    "l7_source_divergence",
    "st13_incremental_embedding_neardup",
    # the full round-11 rotation queue — the 28 r8-greens, the stalest
    # cohort on the board — leads the window (VERDICT r11 task 4): after
    # this round no green predates r9
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
    # 20 of the 47 r9-greens (the next-stalest cohort once r12 lands)
    # fill the remaining slots — preferring queries that ride code
    # touched this round (the l6 family gains two siblings in
    # multimodal.py; l1_dedup_clusters_capped rides the dedup.py persist-
    # handle change; the st4-st9 streaming family rides streaming/ops.py,
    # where the near-dup ingest sink and release path changed) plus the
    # heavy ANN rows whose bases deserve fresh in-run readings
    "l6_media_features",
    "l6_multimodal_bytes",
    "l1_dedup_clusters_capped",
    "st4_session_window",
    "st5_stream_dedup",
    "st6_stateful_running_totals",
    "st7_stream_enrich_window",
    "st8_stream_stream_join",
    "st8_stream_stream_left_outer",
    "st8_stream_stream_full_outer",
    "st9_foreachbatch_sink",
    "l2_embedding_neardup_ivf",
    "l2_embedding_neardup_ivf_hi",
    "l3_knn_pq",
    "j3_semi_join",
    "j3_anti_join",
    "j4_left_outer_join",
]


#: Queries that do NOT fit the current 50-entry driver window. Listing them
#: here is an explicit acknowledgment, enforced by tests/test_registry.py:
#: a query may sit beyond the window ONLY if it was driver-green before or
#: is queued here — so displacement is always a choice, never an accident
#: (VERDICT r2 "what's wrong" #1). Round 12: the queue is the STRUCTURAL
#: overflow the registry size forces — 180 queries cycle through a
#: 50-slot window against a 3-round staleness horizon, so
#: registry − 3×window = 30 greens must sit out each round (cap 34 with
#: the +4 slack). The 30 names below are the r9-greens that didn't fit
#: behind the returning 28 r8-greens and the two new l6 rows:
#: stable-path queries untouched this round — single-operator
#: relational/window/set rows, the l4/l5/l7/l8 families whose heavier
#: siblings are in-window, and the io/sql micro rows. They LEAD the
#: round-13 window.
_ROTATION_QUEUE: list[str] = [
    "j5_range_join_bucketed",
    "j7_star_join",
    "sql1_ansi_interface",
    "a10_approx_count_distinct",
    "l4_bpe_token_count",
    "l4_doc_fingerprint",
    "l4_ngrams",
    "l4_tfidf",
    "l5_lang_id",
    "l5_text_classifier",
    "l7_quality_profile",
    "l8_balanced_sample",
    "l8_decontaminate",
    "l8_decontaminate_bloom",
    "l8_quality_filter",
    "l8_sequence_packing",
    "l8_stratified_split",
    "l8_temperature_mixture",
    "l8_weighted_mixture",
    "l9_pii_redaction",
    "q16_supplier_part_counts",
    "q9_product_type_profit",
    "s7_csv_roundtrip",
    "sql2_correlated_subquery",
    "u2_except",
    "u2_intersect",
    "w1_ranking",
    "w2_lag_lead",
    "w3_running_total",
    "w4_range_frame",
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
