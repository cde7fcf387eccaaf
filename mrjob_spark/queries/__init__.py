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
    # NEW in round 10: maximal duplicated-substring dedup (Lee et al.
    # 2022 shingle-anchor form) and IVFADC (IVF prune × PQ compression,
    # the FAISS billion-scale composition, recall-floor audited)
    "l2_substring_dedup",
    "l2_substring_dedup_clean",
    "l3_knn_ivf_pq",
    "st6_transform_with_state",
    # CHANGED in round 10 — re-verify under the new oracles/shared core:
    # paragraph dedup + the CCNet capstone moved to the overflow-proof
    # min(ROW(doc_id, para_idx)) struct oracle, BPE-encode's m-chain got
    # the dry-round LEFT JOIN guard, and l5_lm_perplexity now rides the
    # extracted _bigram_logp helper the capstone shares
    "l2_paragraph_dedup",
    "l10_ccnet_clean",
    "l4_bpe_encode",
    "l5_lm_perplexity",
    # the 20 r6-greens cross the freshness horizon with CORRECTNESS_r09
    # on disk (horizon 7): the full round-9 rotation queue rejoins the
    # window, closing the full-registry refresh cycle — after this round
    # no green predates r7
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
    # 22 of the 50 r7-greens (the next-stalest cohort once r10 lands)
    # fill the remaining slots — preferring the queries that ride code
    # touched this round (the similarity/dedup/LLM families, the heavy
    # runner paths); the 26 stable-path r7-greens (epoch-schedule and token-mask
    # joined them when the st6 Spark-4 twin and the substring-clean
    # query took their slots) sit in _ROTATION_QUEUE
    # as the explicit ordered backlog that LEADS the round-11 window
    "l2_span_dedup",
    "l2_span_dedup_capped",
    "l2_minhash_lsh_pairs",
    "l2_embedding_neardup_tight",
    "l1_dedup_clusters",
    "l3_embedding_quantize",
    "l3_knn_two_stage",
    "l4_bigram_lm",
    "l4_vocab_coverage",
    "l5_repetition_filter",
    "l8_global_shuffle",
    "l8_pipeline_end_to_end",
    "l8_sequence_packing_scalable",
    "a8_o3_counters_sorted",
    "mr_dataproc_topword",
    "mr_emr_wordfreq",
    "mr_hadoop_wordfreq",
    "s13_bucketed_join",
    "st10_stream_pipeline",
    "x6_spark_step",
    "x7_jar_step",
    "sql3_portable_windows",
]


#: Queries that do NOT fit the current 50-entry driver window. Listing them
#: here is an explicit acknowledgment, enforced by tests/test_registry.py:
#: a query may sit beyond the window ONLY if it was driver-green before or
#: is queued here — so displacement is always a choice, never an accident
#: (VERDICT r2 "what's wrong" #1). Round 10: the queue is now the
#: STRUCTURAL overflow the registry size forces — 172 queries cycle
#: through a 50-slot window against a 3-round staleness horizon, so
#: registry − 3×window = 22 greens must sit out each round even before
#: this round's 3 new + 4 changed-query slots displace more. The 26
#: names below are the r7-greens that didn't fit (plus epoch-schedule,
#: displaced by the st6 Spark-4 twin): stable-path queries untouched
#: this round —
#: q-series composites on join/agg shapes the in-window capstones also
#: exercise, the a9 grouping family, io roundtrips, and single-operator
#: relational rows. They LEAD the round-11 window.
_ROTATION_QUEUE: list[str] = [
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
