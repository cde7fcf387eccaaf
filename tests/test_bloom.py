"""Bloom filter operator (operators/bloom.py): the structural guarantees
the decontamination query's oracle story rests on.

The bloom tier claims value-identity with the exact form because the
filter is a pure pre-filter — zero false negatives.  That property (and
the FP rate staying a *rate*, not a flood) is what these tests pin;
the end-to-end value identity itself is checked two ways: the in-test
differential against ``l8_decontaminate`` here, and the driver's DuckDB
oracle (the bloom query registers the exact form's SQL verbatim).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mrjob_spark.operators.bloom import bloom_build, bloom_filter_maybe

_vals = st.lists(
    st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=60
)


@given(bench=_vals, corpus=_vals)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_no_false_negatives(spark, bench, corpus):
    # every corpus value that IS in the bench set must survive the probe —
    # the property that makes the bloom tier value-identical to the exact
    # join (a false negative would silently drop a contaminated doc)
    m_bits, k = 1 << 14, 5
    bench_df = spark.createDataFrame([(v,) for v in bench], "h bigint")
    corpus_df = spark.createDataFrame([(v,) for v in corpus], "h bigint")
    bitmap = bloom_build(bench_df, "h", m_bits=m_bits, k=k)
    kept = {
        r["h"]
        for r in bloom_filter_maybe(
            corpus_df, "h", bitmap, m_bits=m_bits, k=k
        ).collect()
    }
    true_members = set(corpus) & set(bench)
    assert true_members <= kept


def test_false_positive_rate_is_a_rate(spark):
    # 2k inserted values in a 2^17-bit map, k=5: theoretical FP ~ 1e-5.
    # Probe 20k disjoint values and require < 1% through — an order of
    # magnitude of slack so the test pins "filter works", not the exact
    # constant.
    m_bits, k = 1 << 17, 5
    bench = spark.range(0, 2000).selectExpr("id AS h")
    probe = spark.range(1_000_000, 1_020_000).selectExpr("id AS h")
    bitmap = bloom_build(bench, "h", m_bits=m_bits, k=k)
    n_fp = bloom_filter_maybe(probe, "h", bitmap, m_bits=m_bits, k=k).count()
    assert n_fp < 200


def test_build_state_is_bitmap_sized(spark):
    # driver state = m_bits/64 words regardless of input size; duplicate
    # inputs need no pre-distinct (bit_or is idempotent)
    m_bits = 1 << 10
    df = spark.range(0, 5000).selectExpr("pmod(id, 7) AS h")  # heavy dups
    bitmap = bloom_build(df, "h", m_bits=m_bits, k=3)
    assert len(bitmap) == m_bits // 64
    n_set = sum(bin(w & (2**64 - 1)).count("1") for w in bitmap)
    assert 0 < n_set <= 7 * 3  # ≤ distinct_values × k bits ever set


def test_probe_filters_before_any_exchange(spark):
    # the probed stream must reach the bloom Filter map-side: the only
    # join in the probe plan is the one-row bitmap broadcast (BNLJ), and
    # no Exchange may appear below the Filter in the probed branch
    bench = spark.range(0, 100).selectExpr("id AS h")
    probe = spark.range(0, 1000).selectExpr("id AS h")
    bitmap = bloom_build(bench, "h", m_bits=1 << 14, k=5)
    plan = (
        bloom_filter_maybe(probe, "h", bitmap, m_bits=1 << 14, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    # the only Exchange is the one-row bitmap broadcast; the probed stream
    # itself never shuffles
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_bloom_decontaminate_matches_exact_form(spark, sf_dir):
    # end-to-end differential: the bloom tier and the exact form produce
    # identical rows on the fixture corpus
    from mrjob_spark.queries import REGISTRY

    exact = {
        tuple(r)
        for r in REGISTRY["l8_decontaminate"].fn(spark, sf_dir).collect()
    }
    bloom = {
        tuple(r)
        for r in REGISTRY["l8_decontaminate_bloom"].fn(spark, sf_dir).collect()
    }
    assert bloom == exact
