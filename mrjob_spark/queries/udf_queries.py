"""Oracle-checked queries for the DataFrame-native UDF surface (SURVEY.md
§2.9) and counters (§2.3 A8).

The dataflow engine already exercises X1-X5 through the RDD path
(dataflow_queries.py); these cover the OTHER half of SURVEY §2.9's Spark
mapping — Arrow-batched Pandas UDFs, which is what a user reaches for when
the per-record logic genuinely can't be a built-in expression:

- ``x1_udtf_tokenize``: flat-map UDTF via ``mapInPandas`` (one input row →
  0..n output rows), the vectorized twin of a generator ``mapper``
  (``mrjob/job.py:260-277``).
- ``x2_udaf_quantiles``: grouped UDAF via ``applyInPandas`` (whole group →
  one row), the vectorized twin of a generator ``reducer``
  (``mrjob/job.py:279-293``).
- ``a8_dataflow_counters``: the counters side channel surfaced as a
  DataFrame so the driver can hash-check accumulator values against SQL.

Cross-engine exactness: the UDAF converts balances to integer cents before
interpolating quantiles — linear interpolation at quarter positions is then
exact in binary floating point, so numpy and DuckDB's ``quantile_cont``
agree bit-for-bit and no rounding fudge is needed.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mrjob_spark.dataflow.examples import MRWordCountWithCounters
from mrjob_spark.queries import Tables, query

_WORD_RE = re.compile(r"[a-z]+")


@query(
    "x1_udtf_tokenize",
    sql="""
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents
    """,
)
def x1_udtf_tokenize(spark, sf_dir):
    """X1 UDTF through ``mapInPandas``: rows cross to Python in Arrow
    batches, each batch flat-maps to a variable number of output rows. The
    plan stays fully distributed — no collect, no driver loop — and the
    scan prunes to the two referenced columns."""
    import pandas as pd

    def tokenize(batches):
        for pdf in batches:
            # Vectorized flat-map: pandas' str accessor runs the regex over
            # the whole Arrow batch, explode() expands the per-row match
            # lists, and the (duplicated) index carries doc_id — no per-row
            # Python loop.
            words = (
                pdf.set_index("doc_id")["text"]
                .str.lower()
                .str.findall(_WORD_RE)
                .explode()
                .dropna()
            )
            yield pd.DataFrame(
                {"doc_id": words.index.to_numpy(), "word": words.to_numpy()}
            )

    from mrjob_spark.operators.partitioning import parallelize_narrow_scan

    t = Tables(spark, sf_dir)
    return parallelize_narrow_scan(
        t.documents.select("doc_id", "text")
    ).mapInPandas(tokenize, "doc_id bigint, word string")


@query(
    "x2_udaf_quantiles",
    sql="""
    SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_sup,
           quantile_cont(CAST(round(s_acctbal * 100) AS BIGINT), 0.5) / 100.0
               AS median_bal,
           (quantile_cont(CAST(round(s_acctbal * 100) AS BIGINT), 0.75)
            - quantile_cont(CAST(round(s_acctbal * 100) AS BIGINT), 0.25)) / 100.0
               AS iqr
    FROM supplier GROUP BY s_nationkey
    """,
)
def x2_udaf_quantiles(spark, sf_dir):
    """X2 UDAF through ``applyInPandas``: per-nation median and IQR of
    supplier balances — order statistics, the textbook case where no
    built-in aggregate composition suffices and a grouped Pandas UDF is the
    right tool. One shuffle on the group key; each group materializes in
    one Arrow batch (fine for bounded groups; for giant groups use the
    two-phase sketch aggregates instead)."""
    import numpy as np
    import pandas as pd

    def quantiles(pdf):
        cents = np.rint(pdf["s_acctbal"].to_numpy(dtype=float) * 100).astype(
            np.int64
        )
        q1, q2, q3 = np.percentile(cents, [25, 50, 75])  # linear, == quantile_cont
        return pd.DataFrame(
            [
                [
                    int(pdf["s_nationkey"].iloc[0]),
                    len(cents),
                    q2 / 100.0,
                    (q3 - q1) / 100.0,
                ]
            ],
            columns=["s_nationkey", "n_sup", "median_bal", "iqr"],
        )

    t = Tables(spark, sf_dir)
    out_schema = T.StructType(
        [
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("n_sup", T.LongType()),
            T.StructField("median_bal", T.DoubleType()),
            T.StructField("iqr", T.DoubleType()),
        ]
    )
    return (
        t.supplier.select("s_nationkey", "s_acctbal")
        .groupBy("s_nationkey")
        .applyInPandas(quantiles, out_schema)
    )


@query(
    "a8_dataflow_counters",
    sql="""
    SELECT 'stats' AS grp, 'lines' AS counter,
           CAST(count(*) AS BIGINT) AS amount
    FROM documents
    UNION ALL
    SELECT 'stats', 'words',
           CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT)
    FROM documents
    """,
)
def a8_dataflow_counters(spark, sf_dir):
    """A8 counters, driver-checkable: a dataflow job increments accumulator
    counters per record (``mrjob/job.py:547-583``; Spark-accumulator
    design per ``mrjob/spark/harness.py:125-139``), the run materializes
    them, and the totals come back as rows the oracle recomputes in SQL.
    Counter traffic is O(tasks), not O(records) — accumulators merge
    per-task dicts on the driver."""
    from mrjob_spark.queries.dataflow_queries import _doc_lines

    t = Tables(spark, sf_dir)
    runner = MRWordCountWithCounters().make_runner(
        spark, input_rdd=_doc_lines(t)
    )
    runner.run()
    counters = runner.counters()
    runner.__exit__()  # drop the persisted output RDD; only counters matter
    rows = [
        (grp, name, int(amount))
        for grp, inner in sorted(counters.items())
        for name, amount in sorted(inner.items())
    ]
    schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("counter", T.StringType()),
            T.StructField("amount", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
