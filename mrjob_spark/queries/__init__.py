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
    # ROUND 13 (VERDICT r12 "Next round" item 1): lead with the queries the
    # round-12 optimizations TOUCHED but the r12 oracle window rotated away
    # from — their semantic-preservation evidence is repo-internal until the
    # driver re-checks them. st13 joins the set because round 13 touches its
    # index-probe path (VERDICT item 5) and its round-12 provenance was a
    # mid-round feature (VERDICT gate note).
    "l2_embedding_neardup_tight",
    "l2_embedding_neardup_planted",
    "l2_semdedup_prune",
    "l3_knn_lsh",
    "l3_knn_ivf_pq",
    "l10_ccnet_clean",
    "l4_bpe_train",
    "l4_bpe_encode",
    "mr_hadoop_wordfreq",
    "mr_emr_wordfreq",
    "mr_dataproc_topword",
    "x6_spark_script",
    "x7_jar_step_emr",
    "st12_incremental_neardup",
    "mr_emr_reference_differential",
    "st13_incremental_embedding_neardup",
    # the full round-12 rotation queue — the 30 r9-greens, the stalest
    # cohort on the board (horizon: r10 once CORRECTNESS_r12 is the newest
    # file) — fills the middle, as the r12 queue comment promised
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
    # 4 r10-greens that ride code touched THIS round close the window:
    # l2_embedding_neardup + l2_minhash_lsh_pairs ride the arrow_cosine_
    # verify ragged-row fix and the bench persist-release hygiene change;
    # x6_spark_step / x7_jar_step ride the subprocess tier
    "l2_embedding_neardup",
    "l2_minhash_lsh_pairs",
    "x6_spark_step",
    "x7_jar_step",
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
#: stable-path queries untouched this round. Round 13: at the current
#: horizon (r10, with CORRECTNESS_r12 the newest file) every stale green
#: sits INSIDE the window, so nothing strictly requires queueing; the 34
#: names below are the r10-greens the 50-slot window cannot also hold,
#: acknowledged ahead of the horizon advancing when CORRECTNESS_r13
#: lands. Five r10-greens (f1-f5 scalar micro rows) overflow even the
#: queue cap and must LEAD the next reshuffle together with this list.
_ROTATION_QUEUE: list[str] = [
    "a12_approx_percentiles",
    "j5_range_join",
    "u1_union",
    "f6_json",
    "f7_hash_funcs",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "q7_volume_shipping",
    "sql3_portable_windows",
    "l1_incremental_dedup",
    "l1_dedup_clusters",
    "skew_salted_collect_set",
    "mr_wordcount",
    "mr_most_used_word",
    "l2_span_dedup",
    "l2_span_dedup_capped",
    "l2_paragraph_dedup",
    "l2_substring_dedup",
    "l2_substring_dedup_clean",
    "l5_repetition_filter",
    "l4_vocab_coverage",
    "l8_global_shuffle",
    "l8_pipeline_end_to_end",
    "l8_sequence_packing_scalable",
    "l3_embedding_quantize",
    "l3_knn_two_stage",
    "l4_bigram_lm",
    "l5_lm_perplexity",
    "a8_o3_counters_sorted",
    "st6_transform_with_state",
    "st10_stream_pipeline",
    "st11_incremental_ingest",
    "s13_bucketed_join",
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
