"""Property-based tests (hypothesis) — the reference's probe-job testing
idea generalized: instead of fixed fixtures, random inputs checked against
an independent reference implementation or an algebraic invariant.

Driver-only properties (protocols, canonical encoding) run at full example
counts; Spark-backed properties use a handful of examples each — a Spark
job per example is the cost floor, and the value is the random structure,
not the volume.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# protocols: write→read is the identity on the supported value domain
# ---------------------------------------------------------------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4),
    ),
    max_leaves=10,
)


@given(key=json_values, value=json_values)
@settings(max_examples=150, deadline=None)
def test_json_protocol_roundtrip(key, value):
    from mrjob_spark.dataflow import JSONProtocol

    p = JSONProtocol()
    k2, v2 = p.read(p.write(key, value))
    assert k2 == key and v2 == value


@given(key=json_values, value=json_values)
@settings(max_examples=100, deadline=None)
def test_pickle_protocol_roundtrip(key, value):
    from mrjob_spark.dataflow import PickleProtocol

    p = PickleProtocol()
    line = p.write(key, value)
    assert b"\n" not in line  # must stay one line in a text file
    k2, v2 = p.read(line)
    assert k2 == key and v2 == value


@given(
    key=st.text(max_size=30).filter(lambda s: "\t" not in s and "\n" not in s),
    value=st.text(max_size=30).filter(lambda s: "\t" not in s and "\n" not in s),
)
@settings(max_examples=100, deadline=None)
def test_text_protocol_roundtrip(key, value):
    from mrjob_spark.dataflow import TextProtocol

    p = TextProtocol()
    k2, v2 = p.read(p.write(key, value))
    assert (k2, v2) == (key, value)


@given(d=st.dictionaries(st.text(max_size=8), st.integers(), max_size=6))
@settings(max_examples=100, deadline=None)
def test_canonical_bytes_is_key_order_insensitive(d):
    """Shuffle grouping must treat equal dicts as equal keys regardless of
    insertion order — the encoding the shuffle partitions on."""
    from mrjob_spark.dataflow.protocols import _canonical_bytes

    reordered = dict(reversed(list(d.items())))
    assert _canonical_bytes(d) == _canonical_bytes(reordered)
    # and distinct values must not collide trivially
    assert json.loads(_canonical_bytes(d)) == d


# ---------------------------------------------------------------------------
# connected components vs a pure-python union-find reference
# ---------------------------------------------------------------------------


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min node id reachable
    labels = {}
    for node in list(parent):
        root = find(node)
        labels.setdefault(root, root)
        labels[root] = min(labels[root], node)
    return {node: labels[find(node)] for node in parent}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, edges):
    from mrjob_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _union_find_components(edges)


# ---------------------------------------------------------------------------
# dataflow: combiner presence must never change results
# ---------------------------------------------------------------------------


@given(
    lines=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_wordcount_combiner_is_transparent(spark, lines):
    from mrjob_spark.dataflow import SparkMRJob

    class MRWith(SparkMRJob):
        def mapper(self, _, line):
            for w in line.split():
                yield w, 1

        def combiner(self, w, counts):
            yield w, sum(counts)

        def reducer(self, w, counts):
            yield w, sum(counts)

    class MRWithout(SparkMRJob):
        def mapper(self, _, line):
            for w in line.split():
                yield w, 1

        def reducer(self, w, counts):
            yield w, sum(counts)

    rdd = spark.sparkContext.parallelize([(None, l) for l in lines], 3)
    with MRWith().make_runner(spark, input_rdd=rdd) as r1:
        a = dict(r1.cat_output())
    rdd = spark.sparkContext.parallelize([(None, l) for l in lines], 3)
    with MRWithout().make_runner(spark, input_rdd=rdd) as r2:
        b = dict(r2.cat_output())
    assert a == b


# ---------------------------------------------------------------------------
# dsum order-independence: the foundation of every cross-engine float
# aggregate (classifier scores, windowed sums). Exact decimal accumulation
# must be bit-identical under any partitioning; plain double sum is not
# guaranteed to be (that's WHY dsum exists).
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=60,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dsum_bit_identical_across_partitionings(spark, xs):
    from decimal import ROUND_HALF_UP, Decimal

    from mrjob_spark.functions.rounding import dsum

    df = spark.createDataFrame([(float(x),) for x in xs], ["v"])
    got = {
        df.repartition(n).agg(dsum("v").alias("s")).collect()[0]["s"]
        for n in (1, 3, 7)
    }
    assert len(got) == 1, f"dsum varied with partitioning: {got}"
    # and it equals exact decimal accumulation done in plain Python
    q = Decimal("0.000001")
    want = float(
        sum(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP) for x in xs)
    )
    assert got == {want}


# ---------------------------------------------------------------------------
# Composite-query semantics, driven through the REAL registered queries over
# synthetic parquet fixtures (the q-functions only see an sf_dir path, so
# hypothesis can feed them arbitrary tiny worlds).
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=5),
                  st.sampled_from(["1-URGENT", "5-LOW"])),
        min_size=0, max_size=30,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_q13_outer_join_counts_zero_order_customers(spark, tmp_path_factory, orders):
    """q13's priority predicate lives in the JOIN CONDITION: customers with
    only urgent (or no) orders must land in the c_count=0 bucket, exactly
    as a plain-Python computation says — a WHERE would drop them."""
    from collections import Counter

    from mrjob_spark.queries import REGISTRY

    d = tmp_path_factory.mktemp("q13")
    custkeys = list(range(6))
    spark.createDataFrame(
        [(c, f"Customer#{c}") for c in custkeys], "c_custkey long, c_name string"
    ).write.parquet(str(d / "customer.parquet"))
    spark.createDataFrame(
        [(i, c, p) for i, (c, p) in enumerate(orders)],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))

    per_cust = Counter(c for c, p in orders if p != "1-URGENT")
    want = Counter(per_cust.get(c, 0) for c in custkeys)

    got = {
        r["c_count"]: r["custdist"]
        for r in REGISTRY["q13_customer_distribution"].fn(spark, str(d)).collect()
    }
    assert got == dict(want)


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),
                  st.integers(min_value=1, max_value=50)),
        min_size=1, max_size=30,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_q15_all_tied_max_suppliers_surface(spark, tmp_path_factory, items):
    """q15 keeps EVERY supplier whose (rounded) revenue equals the max —
    ties must all surface, deterministically, per plain-Python truth."""
    from collections import defaultdict

    from mrjob_spark.queries import REGISTRY

    d = tmp_path_factory.mktemp("q15")
    import datetime as dt

    ship = dt.datetime(1996, 2, 1)
    spark.createDataFrame(
        [(s, ship, float(p), 0.0) for s, p in items],
        "l_suppkey long, l_shipdate timestamp_ntz, l_extendedprice double, l_discount double",
    ).write.parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(
        [(s, f"Supplier#{s}") for s in range(5)], "s_suppkey long, s_name string"
    ).write.parquet(str(d / "supplier.parquet"))

    totals = defaultdict(float)
    for s, p in items:
        totals[s] += float(p)
    mx = max(totals.values())
    want = {s for s, t in totals.items() if t == mx}

    rows = REGISTRY["q15_top_supplier"].fn(spark, str(d)).collect()
    assert {r["s_suppkey"] for r in rows} == want
    assert all(r["total_revenue"] == mx for r in rows)


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2),   # source key
                  st.integers(min_value=0, max_value=500), # order id
                  st.integers(min_value=0, max_value=100)),# value
        min_size=1, max_size=40, unique_by=lambda t: (t[0], t[1]),
    ),
    st.sampled_from([1.0, 7.0, 64.0, 1000.0]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucketed_running_sum_matches_naive_window(spark, rows, width):
    """The two-phase running sum must equal the textbook window bit-for-bit
    for any bucket width — including width 1 (one row per bucket) and a
    width larger than the whole domain (one bucket per key)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mrjob_spark.operators.scalable_windows import bucketed_running_sum

    df = spark.createDataFrame(rows, "k long, o long, v long")
    naive_w = (
        Window.partitionBy("k").orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        (r["k"], r["o"]): r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(naive_w)).collect()
    }
    got = {
        (r["k"], r["o"]): r["cum"]
        for r in bucketed_running_sum(df, "k", "o", "v", bucket_width=width).collect()
    }
    assert got == naive


# ---------------------------------------------------------------------------
# span dedup: the capped (hash-agg + join-back) plan must agree with an
# independent Python reference for ANY corpus and cap
# ---------------------------------------------------------------------------


def _span_dedup_reference(docs, span_w, cap):
    """Independent per-doc (n_spans, n_dup_spans) using plain Python."""
    import hashlib
    import re

    per_doc = {}
    for doc_id, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]
        spans = {
            hashlib.md5(
                " ".join(toks[j * span_w : (j + 1) * span_w]).encode()
            ).hexdigest()
            for j in range((len(toks) + span_w - 1) // span_w)
        }
        per_doc[doc_id] = spans
    df_count: dict = {}
    for spans in per_doc.values():
        for h in spans:
            df_count[h] = df_count.get(h, 0) + 1
    return {
        doc_id: (
            len(spans),
            sum(1 for h in spans if 2 <= df_count[h] <= cap),
        )
        for doc_id, spans in per_doc.items()
    }


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=1,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    cap=st.integers(min_value=2, max_value=12),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_dedup_capped_matches_python_reference(spark, texts, cap):
    from pyspark.sql import Row

    from mrjob_spark.operators.dedup import span_dedup

    span_w = 3  # small spans so short random docs produce collisions
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in span_dedup(
            df, "doc_id", "text", span_w=span_w, max_span_df=cap
        ).collect()
    }
    assert got == _span_dedup_reference(docs, span_w, cap)


# ---------------------------------------------------------------------------
# k-means: the broadcast-centroid Spark loop must agree with an independent
# Python Lloyd's implementation for ANY vectors, k, and iteration count —
# including rounds beyond the single update the SQL oracle checks
# ---------------------------------------------------------------------------


def _kmeans_reference(vecs, k, iters, scale=1000):
    """Independent fixed-point Lloyd's: returns {vec_id: (cluster, dist)}."""
    import math

    q = {
        i: [math.floor(x * scale + 0.5) for x in v] for i, v in vecs
    }
    centroids = {i: list(q[i]) for i in sorted(q)[:k]}

    def assign(cents):
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, cv)), c)
                for c, cv in cents.items()
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(iters):
        asg = assign(centroids)
        sums: dict = {}
        for i, (c, _d) in asg.items():
            acc = sums.setdefault(c, [[0] * len(q[i]), 0])
            acc[0] = [a + b for a, b in zip(acc[0], q[i])]
            acc[1] += 1
            sums[c] = acc
        centroids = {
            c: [math.floor(s / n + 0.5) for s in sv] for c, (sv, n) in sums.items()
        }
    return assign(centroids)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=4,
        max_size=12,
    ),
    k=st.integers(min_value=2, max_value=4),
    iters=st.integers(min_value=1, max_value=3),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kmeans_assign_matches_python_reference(spark, vecs, k, iters):
    from pyspark.sql import Row

    from mrjob_spark.operators.clustering import kmeans_assign

    rows = [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows)
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_assign(df, k=k, iters=iters).collect()
    }
    want = _kmeans_reference(list(enumerate(vecs)), k, iters)
    assert got == want


def _kmeans_reference_topn(vecs, k, iters, probe, scale=1000):
    """Top-``probe`` final assignment under the reference's final
    centroids, ties on (dist, cluster) — the IVF multi-probe contract."""
    import math

    q = {i: [math.floor(x * scale + 0.5) for x in v] for i, v in vecs}
    centroids = {i: list(q[i]) for i in sorted(q)[:k]}

    def assign1(cents):
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, cv)), c)
                for c, cv in cents.items()
            )
            out[i] = best[1]
        return out

    for _ in range(iters):
        asg = assign1(centroids)
        sums: dict = {}
        for i, c in asg.items():
            acc = sums.setdefault(c, [[0] * len(q[i]), 0])
            acc[0] = [a + b for a, b in zip(acc[0], q[i])]
            acc[1] += 1
            sums[c] = acc
        centroids = {
            c: [math.floor(s / n + 0.5) for s in sv] for c, (sv, n) in sums.items()
        }
    out = {}
    for i, v in q.items():
        scored = sorted(
            (sum((a - b) * (a - b) for a, b in zip(v, cv)), c)
            for c, cv in centroids.items()
        )
        out[i] = {(c, d) for d, c in scored[:probe]}
    return out


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=5,
        max_size=12,
    ),
    k=st.integers(min_value=3, max_value=4),
    iters=st.integers(min_value=1, max_value=2),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kmeans_probe2_matches_python_reference(spark, vecs, k, iters):
    # the multi-probe (probe=2) path: per-vector top-2 rows must equal the
    # reference's two nearest final centroids, including (dist, cluster)
    # tie-breaks — the sort_array(collect_list) aggregate must never lose
    # or reorder a candidate (empty clusters may leave < 2 cells total,
    # in which case both engines emit the same reduced set)
    from pyspark.sql import Row

    from mrjob_spark.operators.clustering import kmeans_assign

    rows = [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows)
    got: dict = {}
    for r in kmeans_assign(df, k=k, iters=iters, probe=2).collect():
        got.setdefault(r["vec_id"], set()).add((r["cluster"], r["dist"]))
    want = _kmeans_reference_topn(list(enumerate(vecs)), k, iters, probe=2)
    assert got == want
