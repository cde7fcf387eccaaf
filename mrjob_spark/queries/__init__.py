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
    # NEW in round 8: plain JarStep routed through the -r emr control
    # plane (VERDICT r7 task 2), the planted true-near-duplicate ANN
    # regime at cosine ≥ 0.8 (VERDICT r7 task 4), SemDeDup-style
    # semantic pruning verdicts, and DSIR-style hashed-feature
    # importance selection
    "x7_jar_step_emr",
    "l2_embedding_neardup_planted",
    "l2_semdedup_prune",
    "l8_dsir_select",
    "l4_bpe_train",
    "mr_emr_reference_differential",
    # the 11 stale r4-greens the freshness tripwire names (VERDICT r7
    # task 1): the 8 single-operator relational queries deferred in round
    # 7 plus the 3 q-series rows that yielded their slots to the round-7
    # control-plane leads
    "p3_filter_predicate",
    "p7_project_rename",
    "a3_count_per_group",
    "a4_global_agg",
    "a5_argmax_per_group",
    "a6_distinct",
    "a7_stats_per_group",
    "u2_except_all",
    "q17_small_quantity_revenue",
    "q19_disjunctive_join",
    "q22_sales_opportunity",
    # the 47 r5-greens cross the freshness horizon the moment
    # CORRECTNESS_r08 lands (horizon advances to 6), so the rest of the
    # window is r5 re-verification, registration order; the overflow that
    # cannot fit sits in _ROTATION_QUEUE as the explicit ordered backlog
    # for round 9
    "j2_broadcast_star",
    "j6_asof_join",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st3_sessionization",
    "l1_exact_dedup",
    "l1_normalized_dedup",
    "l2_simhash",
    "l2_jaccard_pairs",
    "l3_knn_bruteforce",
    "l3_knn_bucketed",
    "l3_knn_lsh",
    "l4_token_stats",
    "w1_ranking_scalable",
    "w4_range_frame_scalable",
    "x1_dataflow_wordcount",
    "x2_dataflow_most_used_word",
    "o3_dataflow_sorted_dates",
    "x5_dataflow_pipe_grep",
    "a8_dataflow_counters",
    "s4_s5_file_attribution",
    "s1_s2_gzip_text_scan",
    "mr_next_word_stats",
    "o5_dataflow_head_per_group",
    "l3_kmeans_assign",
    "mr_text_classifier",
    "x6_spark_script",
    "l2_minhash_lsh_capped",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_priority_class",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
]


#: Queries that do NOT fit the current 50-entry driver window. Listing them
#: here is an explicit acknowledgment, enforced by tests/test_registry.py:
#: a query may sit beyond the window ONLY if it was driver-green before or
#: is queued here — so displacement is always a choice, never an accident
#: (VERDICT r2 "what's wrong" #1). Round 8: 58 names (11 r4 + 47 r5) go
#: stale at the r08 horizon but only 50 fit the window, so the overflow —
#: micro set-op/window/join queries riding the stable relational.py and
#: windows.py paths, each shadowed by an in-window query on the same code
#: path (u2_except_all, w1/w4 *_scalable twins, j4/j7) — is deferred one
#: round and rejoins the round-9 window first.
_ROTATION_QUEUE: list[str] = [
    # displaced by the round-8 SemDeDup/DSIR/BPE leads; ivf's k-means +
    # candidate-join machinery stays in-window via l2_semdedup_prune and
    # j5's bucketed-band machinery via the in-window range/asof family
    "l2_embedding_neardup_ivf",
    "j5_range_join_bucketed",
    "l1_dedup_clusters_capped",
    "u2_intersect",
    "u2_except",
    "j3_semi_join",
    "j3_anti_join",
    "j4_left_outer_join",
    "j7_star_join",
    "w1_ranking",
    "w2_lag_lead",
    "w3_running_total",
    "w4_range_frame",
    "a10_approx_count_distinct",
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
