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
    # NEW in round 9: paragraph-level dedup with a canonical survivor
    # (the CCNet cleaning step), temperature-scaled domain mixture
    # (weights computed FROM corpus stats, integer-deterministic), and
    # the product-quantization ANN tier (recall-floor audited like
    # l3_knn_lsh)
    "l2_paragraph_dedup",
    "l8_temperature_mixture",
    "l3_knn_pq",
    "l4_bpe_encode",
    "st8_stream_stream_full_outer",
    "l10_ccnet_clean",
    # the 14 r5-greens deferred one round in the round-8 rotation queue
    # (horizon 6 since CORRECTNESS_r08): they rejoin the window FIRST,
    # as the queue's contract promised
    "a10_approx_count_distinct",
    "j3_semi_join",
    "j3_anti_join",
    "j4_left_outer_join",
    "j7_star_join",
    "u2_intersect",
    "u2_except",
    "w1_ranking",
    "w2_lag_lead",
    "w3_running_total",
    "w4_range_frame",
    "l1_dedup_clusters_capped",
    "j5_range_join_bucketed",
    "l2_embedding_neardup_ivf",
    # the 50 r6-greens cross the freshness horizon the moment
    # CORRECTNESS_r09 lands (horizon advances to 7); 33 fit the
    # remaining slots (registration order), the rest sit in
    # _ROTATION_QUEUE as the explicit ordered backlog for round 10
    "s7_csv_roundtrip",
    "st4_session_window",
    "st5_stream_dedup",
    "l4_doc_fingerprint",
    "l5_lang_id",
    "l6_multimodal_bytes",
    "l6_media_features",
    "l7_quality_profile",
    "st9_foreachbatch_sink",
    "l8_weighted_mixture",
    "l8_quality_filter",
    "l8_sequence_packing",
    "st6_stateful_running_totals",
    "l4_ngrams",
    "l4_tfidf",
    "l5_text_classifier",
    "l8_decontaminate",
    "st7_stream_enrich_window",
    "l4_bpe_token_count",
    "sql1_ansi_interface",
    "st8_stream_stream_join",
    "sql2_correlated_subquery",
    "st8_stream_stream_left_outer",
    "q9_product_type_profit",
    "q16_supplier_part_counts",
    "l9_pii_redaction",
    "l8_stratified_split",
    "l8_balanced_sample",
    "l2_embedding_neardup_ivf_hi",
    "l8_decontaminate_bloom",
]


#: Queries that do NOT fit the current 50-entry driver window. Listing them
#: here is an explicit acknowledgment, enforced by tests/test_registry.py:
#: a query may sit beyond the window ONLY if it was driver-green before or
#: is queued here — so displacement is always a choice, never an accident
#: (VERDICT r2 "what's wrong" #1). Round 9: the round-8 queue's 14
#: r5-greens all rejoined the window; 64 names (14 r5 + 50 r6) compete
#: for the non-new slots, so 20 r6-greens defer one round — the labeled
#: baselines whose production twins ARE in-window (j5_range_join /
#: l2_embedding_neardup), the seven pure-expression function registries
#: (f1-f7, zero-shuffle maps on the stable relational.py path), the
#: dataflow wordcount pair shadowed by the r8-fresh control-plane runs
#: of the same jobs, and four q-series composites on join/agg shapes
#: the in-window q9/q16 also exercise. They rejoin the round-10 window
#: first.
_ROTATION_QUEUE: list[str] = [
    "l1_incremental_dedup",
    "st11_incremental_ingest",
    "a12_approx_percentiles",
    "j5_range_join",
    "l2_embedding_neardup",
    "u1_union",
    "f1_string_funcs",
    "f2_math_funcs",
    "f3_conditional",
    "f4_datetime",
    "f5_array_funcs",
    "f6_json",
    "f7_hash_funcs",
    "mr_wordcount",
    "mr_most_used_word",
    "skew_salted_collect_set",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q18_large_volume_customer",
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
