"""Registry queries that execute through the DATAFLOW engine (SURVEY.md
§2.9 X1-X5, §2.4 O3) — real ``SparkMRJob`` runs whose outputs are bridged to
DataFrames and checked against DuckDB oracles, proving the mapper/combiner/
reducer path end-to-end, not just the relational surface.

The tokenizer is the engine-portable ``[a-z]+``-on-lowered-text family
(``mrjob_spark.dataflow.examples.WORD_RE``) so every job here has an exact
SQL twin.
"""

from __future__ import annotations

from pyspark.sql import types as T

from mrjob_spark.dataflow.examples import (
    MRCustomerOrderDates,
    MRFilterGrep,
    MRMostUsedWord,
    MRWordFreqCount,
    MRWordFreqSparkFilter,
)
from mrjob_spark.dataflow.job import SparkMRJob
from mrjob_spark.queries import Tables, query

_WORDS_SQL = (
    "SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word "
    "FROM documents"
)


def _doc_lines(t: Tables):
    """documents.text as (None, line) pairs — the DataFrame→dataflow bridge.
    Newlines inside a document are collapsed so one document == one record,
    matching what a text-file source would deliver per line. The narrow
    projection is widened to cluster parallelism first: a single-row-group
    file otherwise feeds every Python mapper from ONE task (2x total job
    cost at sf0.1; no-op when the scan parallelizes on its own)."""
    from mrjob_spark.operators.partitioning import parallelize_narrow_scan

    return parallelize_narrow_scan(t.documents.select("text")).rdd.map(
        lambda r: (None, r.text.replace("\n", " "))
    )


@query(
    "x1_dataflow_wordcount",
    sql=f"""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM ({_WORDS_SQL}) GROUP BY word
    """,
)
def x1_dataflow_wordcount(spark, sf_dir):
    """X1+X2+X3: generator mapper, combiner and reducer over real text —
    the canonical wordcount (``mrjob/examples/mr_word_freq_count.py``)
    executed by the dataflow engine, not a relational translation."""
    t = Tables(spark, sf_dir)
    runner = MRWordFreqCount().make_runner(spark, input_rdd=_doc_lines(t))
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    return runner.to_dataframe(schema)


@query(
    "x2_dataflow_most_used_word",
    sql=f"""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM ({_WORDS_SQL}) GROUP BY word
    ORDER BY cnt DESC, word DESC LIMIT 1
    """,
)
def x2_dataflow_most_used_word(spark, sf_dir):
    """Two-step dataflow chain (wordcount → global argmax) compiled into one
    lazy plan (``mrjob/examples/mr_most_used_word.py:33-77``); the reducer's
    max-by-(count, word) tiebreak mirrors the SQL ORDER BY exactly."""
    t = Tables(spark, sf_dir)
    runner = MRMostUsedWord().make_runner(spark, input_rdd=_doc_lines(t))
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    # job emits ((count, word), None); flatten to (word, count) rows
    return runner.to_dataframe(schema, row_fn=lambda k, v: (k[1], k[0]))


@query(
    "o3_dataflow_sorted_dates",
    sql="""
    SELECT o_custkey,
           string_agg(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), ','
                      ORDER BY strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) AS dates
    FROM orders GROUP BY o_custkey
    """,
)
def o3_dataflow_sorted_dates(spark, sf_dir):
    """O3 SORT_VALUES secondary sort: values reach the reducer pre-sorted by
    encoded bytes (``mrjob/job.py:1567-1593``), provable because the reducer
    just concatenates what it is handed."""
    from mrjob_spark.operators.partitioning import parallelize_narrow_scan

    t = Tables(spark, sf_dir)
    # 150k rows cross the Python serde boundary here; without the widen a
    # single-row-group file funnels them all through one task
    pairs = parallelize_narrow_scan(
        t.orders.select("o_custkey", "o_orderdate")
    ).rdd.map(
        lambda r: (r.o_custkey, r.o_orderdate.strftime("%Y-%m-%d %H:%M:%S"))
    )
    runner = MRCustomerOrderDates().make_runner(spark, input_rdd=pairs)
    schema = T.StructType(
        [
            T.StructField("o_custkey", T.LongType()),
            T.StructField("dates", T.StringType()),
        ]
    )
    return runner.to_dataframe(schema, row_fn=lambda k, v: (int(k), v))


@query(
    "x6_spark_step",
    sql=f"""
    SELECT upper(word) AS word, cnt FROM (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM ({_WORDS_SQL}) GROUP BY word
    ) WHERE cnt >= 5
    """,
)
def x6_spark_step(spark, sf_dir):
    """X6 Spark escape hatch (``mrjob/job.py:478-493``): an MRStep wordcount
    chained into a free-form SparkStep (filter + rekey on the native pair
    RDD), all still ONE lazy plan — proving step composition crosses the
    generator/Spark boundary without a materialization barrier."""
    t = Tables(spark, sf_dir)
    runner = MRWordFreqSparkFilter(min_count=5).make_runner(
        spark, input_rdd=_doc_lines(t)
    )
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    return runner.to_dataframe(schema)


@query(
    "x7_jar_step",
    sql=f"""
    SELECT upper(word) AS word, CAST(count(*) AS BIGINT) AS cnt
    FROM ({_WORDS_SQL}) GROUP BY upper(word)
    """,
)
def x7_jar_step(spark, sf_dir):
    """X7 JVM jar step — the last SURVEY §2 row, previously scoped out:
    wordcount → a REAL jar (compiled from embedded Java source on first
    use, cached) uppercasing the INTERNAL-encoded stream as a driver-side
    JVM process → a reducer re-aggregating on the uppercased keys. The
    oracle twin states the same thing relationally (upper() is injective
    on lowercase tokens, so counts survive). Parity note: the reference
    executes jar steps ONLY on its Hadoop cluster runner
    (``mrjob/step.py:421-460``, ``mrjob/runner.py:971-990``); its own
    local/inline runners refuse them, so a driver-side subprocess over
    materialized step IO is strictly more than local-mode parity. The
    materialization is an explicit barrier, like Hadoop's between-step
    HDFS writes."""
    from mrjob_spark.dataflow.examples import MRWordFreqJarUpper
    from mrjob_spark.dataflow.jartools import (
        UPPERCASE_LINES_JAVA,
        compile_jar,
    )

    t = Tables(spark, sf_dir)
    jar = compile_jar(UPPERCASE_LINES_JAVA, "UpperCaseLines")
    runner = MRWordFreqJarUpper(jar).make_runner(
        spark, input_rdd=_doc_lines(t)
    )
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    return runner.to_dataframe(schema)


@query(
    "x5_dataflow_pipe_grep",
    sql="""
    SELECT replace(text, chr(10), ' ') AS line FROM documents
    WHERE contains(replace(text, chr(10), ' '), 'data')
    """,
)
def x5_dataflow_pipe_grep(spark, sf_dir):
    """X5/P5 external-process substep: the mapper stage is a literal
    ``grep -F`` subprocess over raw lines via ``rdd.pipe``
    (``mrjob/examples/mr_grep.py:22-37``)."""
    t = Tables(spark, sf_dir)
    runner = MRFilterGrep("data").make_runner(spark, input_rdd=_doc_lines(t))
    schema = T.StructType([T.StructField("line", T.StringType())])
    return runner.to_dataframe(schema, row_fn=lambda k, v: (v,))


@query(
    "mr_next_word_stats",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(l) AS word, generate_subscripts(l, 1) AS pos
        FROM (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
            FROM documents
        )
    ), pairs AS (
        SELECT word AS prev_word,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS word
        FROM tok
    ), pc AS (
        SELECT prev_word, word, CAST(count(*) AS BIGINT) AS cnt
        FROM pairs WHERE word IS NOT NULL GROUP BY prev_word, word
    ), tot AS (
        SELECT prev_word, CAST(sum(cnt) AS BIGINT) AS total
        FROM pc GROUP BY prev_word
    )
    SELECT pc.prev_word, pc.word, tot.total, pc.cnt,
           (floor((100.0 * pc.cnt / tot.total) * 1000000 + 0.5) / 1000000)
               AS percent
    FROM pc JOIN tot ON tot.prev_word = pc.prev_word
    """,
)
def mr_next_word_stats(spark, sf_dir):
    """O3 in anger: the reference's SORT_VALUES demo job
    (``mrjob/examples/mr_next_word_stats.py``) run through the dataflow
    engine — two chained steps, a combiner, tagged values, and a stateful
    streaming reducer whose correctness depends on encoded-value order.
    The oracle recomputes the same stats relationally (lead window +
    two grouped counts)."""
    from mrjob_spark.dataflow.examples import MRNextWordStats

    t = Tables(spark, sf_dir)
    runner = MRNextWordStats().make_runner(spark, input_rdd=_doc_lines(t))
    schema = T.StructType(
        [
            T.StructField("prev_word", T.StringType()),
            T.StructField("word", T.StringType()),
            T.StructField("total", T.LongType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("percent", T.DoubleType()),
        ]
    )
    return runner.to_dataframe(
        schema, row_fn=lambda k, v: (k[0], k[1], v[0], v[1], v[2])
    )


@query(
    "a8_o3_counters_sorted",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(l) AS word, generate_subscripts(l, 1) AS pos
        FROM (
            SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS l
            FROM documents
        )
    ), pairs AS (
        SELECT word AS prev_word,
               lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS word
        FROM tok
    ), pc AS (
        SELECT prev_word, word, count(*) AS cnt
        FROM pairs WHERE word IS NOT NULL GROUP BY prev_word, word
    ), tot AS (
        SELECT prev_word, CAST(sum(cnt) AS BIGINT) AS total
        FROM pc GROUP BY prev_word
    )
    SELECT 'stats' AS grp, 'lines' AS counter,
           CAST(count(*) AS BIGINT) AS amount FROM documents
    UNION ALL
    SELECT 'stats', 'pairs', CAST(count(*) AS BIGINT)
    FROM pairs WHERE word IS NOT NULL
    UNION ALL
    SELECT 'output', 'groups', CAST(count(*) AS BIGINT) FROM tot
    UNION ALL
    SELECT 'output', 'rows', CAST(count(*) AS BIGINT) FROM pc
    UNION ALL
    SELECT 'output', 'pct_micros',
           CAST(sum(floor((100.0 * pc.cnt / tot.total) * 1000000 + 0.5))
                AS BIGINT)
    FROM pc JOIN tot ON tot.prev_word = pc.prev_word
    """,
)
def a8_o3_counters_sorted(spark, sf_dir):
    """A8×O3 combined (r3 verdict #6): counters incremented in both the
    mapper and the ORDER-DEPENDENT second-step reducer of the SORT_VALUES
    showcase job, surfaced as oracle-checked rows. ``pct_micros`` is an
    integer checksum over every percentage the streaming reducer emits —
    it matches SQL only if each group's total arrived before its stats
    records (encoded-byte value order), so this one query pins the
    counter side channel AND the secondary-sort contract interacting in
    a single multi-step run (the reference exercises them together,
    ``tests/spark/test_harness.py:457-504``). Counter traffic stays
    O(tasks): per-task dicts merge on the driver."""
    from mrjob_spark.dataflow.examples import MRNextWordStatsCounted

    t = Tables(spark, sf_dir)
    runner = MRNextWordStatsCounted().make_runner(
        spark, input_rdd=_doc_lines(t)
    )
    runner.run()
    counters = runner.counters()
    runner.__exit__()  # drop the persisted output RDD; counters carry it
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


@query(
    "o5_dataflow_head_per_group",
    sql="""
    SELECT o_custkey, string_agg(d, ',' ORDER BY d) AS dates FROM (
        SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS d,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
               ) AS rn
        FROM orders
    ) WHERE rn <= 3 GROUP BY o_custkey
    """,
)
def o5_dataflow_head_per_group(spark, sf_dir):
    """O5 in dataflow form: first three order dates per customer. The
    reducer islices the SORT_VALUES-sorted lazy value stream; the oracle
    states the same thing as a row_number window. (Date ties at the cut
    are value-identical, so the first-3 multiset is deterministic even
    though row_number's choice among equal dates is not.)"""
    from mrjob_spark.dataflow.examples import MRFirstOrderDates
    from mrjob_spark.operators.partitioning import parallelize_narrow_scan

    t = Tables(spark, sf_dir)
    pairs = parallelize_narrow_scan(
        t.orders.select("o_custkey", "o_orderdate")
    ).rdd.map(
        lambda r: (r.o_custkey, r.o_orderdate.strftime("%Y-%m-%d %H:%M:%S"))
    )
    runner = MRFirstOrderDates().make_runner(spark, input_rdd=pairs)
    schema = T.StructType(
        [
            T.StructField("o_custkey", T.LongType()),
            T.StructField("dates", T.StringType()),
        ]
    )
    return runner.to_dataframe(schema, row_fn=lambda k, v: (int(k), v))



@query(
    "mr_hadoop_wordfreq",
    sql=f"""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM ({_WORDS_SQL}) GROUP BY word
    """,
)
def mr_hadoop_wordfreq(spark, sf_dir):
    """The canonical wordcount executed by the ``-r hadoop`` runner
    (``mrjob/hadoop.py:324-482``) against the in-repo EXECUTING mock
    cluster (:mod:`mrjob_spark.testing.mockhadoop`): the documents table
    is written out as text by Spark, uploaded to the mock HDFS with
    ``hadoop fs -put``, the runner renders and launches real ``hadoop
    jar <streaming jar>`` commands, the mock executes the rendered
    mapper/combiner/reducer task processes with Hadoop streaming's
    semantics, and the output is read back through ``hadoop fs -cat`` —
    so this row oracle-checks the fourth runner's whole control plane
    (command rendering, uploads, shuffle grouping, wire protocols,
    counter block parsing), not a relational translation. Costed like
    the x6/x7 external-process family: each task is a separate Python
    re-entry (the reference's own per-task cost on a real cluster).

    Scale note: on a real cluster the driver moves only command lines
    and counters; job data stays on HDFS end to end. Task parallelism
    here is bounded by the mock's sequential executor — the per-task
    re-entry price is the measured quantity, deliberately."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mrjob_spark.testing.cluster import MockHadoopCluster

    t = Tables(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mrjob-spark-hadoop-q-")
    try:
        in_dir = os.path.join(tmp, "in")
        (
            t.documents.select(
                F.regexp_replace("text", r"[\r\n]+", " ").alias("value")
            )
            .repartition(2)
            .write.text(in_dir)
        )
        cluster = MockHadoopCluster(tmp)
        runner = cluster.runner(
            MRWordFreqCount(),
            input_paths=[os.path.join(in_dir, "part-*")],
            num_reducers=2,
        )
        with runner:
            rows = [(w, int(c)) for w, c in runner.cat_output()]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "mr_emr_wordfreq",
    sql=f"""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt, TRUE AS same_cluster
    FROM ({_WORDS_SQL}) GROUP BY word
    """,
)
def mr_emr_wordfreq(spark, sf_dir):
    """The wordcount executed by the ``-r emr`` runner (``mrjob/emr.py``
    + ``mrjob/pool.py``) against the in-repo EXECUTING mock EMR/S3
    service (:mod:`mrjob_spark.testing.mockemr`) — with CLUSTER POOLING
    made oracle-visible: the corpus is split into two halves, each half
    runs as its own pooled EMR job, and the ``same_cluster`` column
    asserts the second job reused the cluster the first left WAITING
    (the mrjob/pool.py tag+lock protocol). The per-word counts are the
    SUM across the two jobs, so they must equal the whole-corpus counts
    regardless — if pooling regressed, the boolean flips the hash; if
    step rendering / uploads / shuffle / counter plumbing regressed, the
    counts do. Each job drives the full control plane for real: uploads
    to the on-disk S3 store, run_job_flow / add_job_flow_steps / the
    describe_step poll loop, streaming-step execution through the
    mockhadoop engine, and counter fetch from the step's stderr.gz in
    the EMR S3 log layout. Costed like mr_hadoop_wordfreq (per-task
    Python re-entry is the reference's own cluster cost).

    Scale note: on real EMR the driver moves command lines and counters;
    data stays on S3/HDFS end to end. Pooling is the 100-TB-fleet win
    this query pins — reusing a WAITING cluster skips the multi-minute
    provision+bootstrap per job."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mrjob_spark.dataflow.emr import EMRJobRunner
    from mrjob_spark.testing.mockemr import MockEMRService

    t = Tables(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mrjob-spark-emr-q-")
    try:
        svc = MockEMRService(os.path.join(tmp, "emr"))
        lines = t.documents.select(
            F.regexp_replace("text", r"[\r\n]+", " ").alias("value"),
            (F.crc32(F.col("doc_id").cast("string")) % 2).alias("half"),
        )
        counts: dict = {}
        cluster_ids = []
        for half in (0, 1):
            in_dir = os.path.join(tmp, "in-%d" % half)
            (
                lines.filter(F.col("half") == half).select("value")
                .repartition(1).write.text(in_dir)
            )
            runner = EMRJobRunner(
                MRWordFreqCount(),
                input_paths=[os.path.join(in_dir, "part-*")],
                emr_client=svc.emr_client(),
                s3_client=svc.s3_client(),
                cloud_tmp_dir="s3://mrjob-spark-tmp/",
                pool_clusters=True,
                check_cluster_every=0.0,
                num_reducers=2,
            )
            with runner:
                for w, c in runner.cat_output():
                    counts[w] = counts.get(w, 0) + int(c)
                cluster_ids.append(runner.get_cluster_id())
        same_cluster = (
            len(set(cluster_ids)) == 1 and len(svc.clusters) == 1
        )
        rows = [(w, c, same_cluster) for w, c in counts.items()]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("same_cluster", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "x7_jar_step_emr",
    sql=f"""
    SELECT upper(word) AS word, CAST(count(*) AS BIGINT) AS cnt
    FROM ({_WORDS_SQL}) GROUP BY upper(word)
    """,
)
def x7_jar_step_emr(spark, sf_dir):
    """X7 on the cloud (VERDICT r7 task 2): the streaming → jar →
    streaming chain from ``x7_jar_step`` routed through the ``-r emr``
    control plane against the executing mock EMR service. The user's
    jar is uploaded to S3 and submitted AS the HadoopJarStep jar — the
    reference's plain ``'jar'`` step shape (``mrjob/emr.py``
    ``_build_step``; Dataproc twin per ``mrjob/dataproc.py:594-614``,
    covered by test_dataproc_runner.py) — with INPUT/OUTPUT sentinels
    interpolated to the S3 step-output URIs, MainClass passed through,
    and the mock resolving ``s3://`` operands the way cluster-side
    EMRFS would before running the REAL JVM. The oracle states the
    jar's observable effect relationally: upper() is injective on
    lowercase tokens, so regrouping on the uppercased keys preserves
    counts.

    Scale note: the jar runs ON the cluster between two streaming
    shuffles; the driver moves step descriptions and counters only —
    job data crosses steps through S3, never the driver."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mrjob_spark.dataflow.emr import EMRJobRunner
    from mrjob_spark.dataflow.examples import MRWordFreqJarUpper
    from mrjob_spark.dataflow.jartools import (
        UPPERCASE_LINES_JAVA,
        compile_jar,
    )
    from mrjob_spark.testing.mockemr import MockEMRService

    t = Tables(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mrjob-spark-emr-jar-q-")
    try:
        in_dir = os.path.join(tmp, "in")
        (
            t.documents.select(
                F.regexp_replace("text", r"[\r\n]+", " ").alias("value")
            )
            .repartition(2)
            .write.text(in_dir)
        )
        svc = MockEMRService(os.path.join(tmp, "emr"))
        jar = compile_jar(UPPERCASE_LINES_JAVA, "UpperCaseLines")
        runner = EMRJobRunner(
            MRWordFreqJarUpper(jar),
            input_paths=[os.path.join(in_dir, "part-*")],
            emr_client=svc.emr_client(),
            s3_client=svc.s3_client(),
            cloud_tmp_dir="s3://mrjob-spark-tmp/",
            check_cluster_every=0.0,
            num_reducers=2,
        )
        with runner:
            rows = [(w, int(c)) for w, c in runner.cat_output()]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


class MRTopWord(SparkMRJob):
    """wordcount → global argmax, the 2-step chain shape: step 1's
    output crosses the cloud store into step 2's input."""

    def steps(self):
        from mrjob_spark.dataflow.step import MRStep

        return [
            MRStep(mapper=self.wc_map, reducer=self.wc_reduce),
            MRStep(reducer=self.top_reduce),
        ]

    def wc_map(self, _, line):
        import re as _re

        for w in _re.findall(r"[a-z]+", line.lower()):
            yield w, 1

    def wc_reduce(self, w, counts):
        yield None, (sum(counts), w)

    def top_reduce(self, _, pairs):
        yield max(pairs)


@query(
    "mr_dataproc_topword",
    sql=f"""
    SELECT CAST(cnt AS BIGINT) AS cnt, word FROM (
        SELECT word, count(*) AS cnt FROM ({_WORDS_SQL}) GROUP BY word
    ) ORDER BY cnt DESC, word DESC LIMIT 1
    """,
)
def mr_dataproc_topword(spark, sf_dir):
    """A TWO-step job through the ``-r dataproc`` runner
    (``mrjob/dataproc.py``) against the executing mock service
    (:mod:`mrjob_spark.testing.mockdataproc`): wordcount, then a global
    argmax whose input is the first job's output ON THE CLOUD STORE —
    so this row oracle-checks the jobs-API control plane end to end
    (GCS uploads, cluster create→RUNNING poll, one ``hadoopJob``
    per step with the shared streaming-arg body, the chunked
    ``driveroutput.*`` incremental reader, counter parsing from the
    driver log, and step-output chaining between jobs). The argmax
    tie-break (max count, then lexicographically greatest word) is
    stated identically in the oracle's ORDER BY.

    Scale note: like the other cloud runners, the driver moves command
    lines, driver-log chunks, and counters; per-task Python re-entry is
    the reference's own cluster cost, priced here deliberately."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mrjob_spark.dataflow.dataproc import DataprocJobRunner
    from mrjob_spark.testing.mockdataproc import MockDataprocService

    t = Tables(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mrjob-spark-dataproc-q-")
    try:
        svc = MockDataprocService(os.path.join(tmp, "dataproc"))
        in_dir = os.path.join(tmp, "in")
        (
            t.documents.select(
                F.regexp_replace("text", r"[\r\n]+", " ").alias("value")
            )
            .repartition(2)
            .write.text(in_dir)
        )
        runner = DataprocJobRunner(
            MRTopWord(),
            input_paths=[os.path.join(in_dir, "part-*")],
            cluster_client=svc.cluster_client(),
            job_client=svc.job_client(),
            storage_client=svc.storage_client(),
            logging_client=svc.logging_client(),
            check_cluster_every=0.0,
            num_reducers=2,
        )
        with runner:
            rows = [(int(cnt), w) for cnt, w in runner.cat_output()]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("cnt", T.LongType()),
            T.StructField("word", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "mr_emr_reference_differential",
    sql=f"""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM ({_WORDS_SQL}) GROUP BY word
    """,
)
def mr_emr_reference_differential(spark, sf_dir):
    """The strongest compatibility claim, driver-checked EVERY round:
    the REFERENCE's own unmodified ``EMRJobRunner`` runs the wordcount
    against OUR executing mock EMR service — through the just-enough
    boto3/botocore shim (:mod:`mrjob_spark.testing.fakeboto3`) — and its
    output must equal the SQL tokenizer oracle. The subprocess drives
    the reference's whole control plane for real: uploads through the
    s3 resource surface, run_job_flow, pool tags, the describe_step
    poll loop, streaming execution via mockhadoop, counter fetch from
    the step syslog in the S3 log layout, output streaming, cleanup,
    and cluster termination. A regression in the mock's EMR fidelity,
    the shim, or the streaming engine flips this row red.

    Costed like the other control-plane rows (per-task Python re-entry,
    plus one extra interpreter for the reference driver itself). The
    reference tree is required — this row is exactly as portable as
    the repo's reference-differential test suite."""
    import json
    import os
    import shutil
    import subprocess
    import sys
    import tempfile

    from pyspark.sql import functions as F

    reference = os.environ.get("MRJOB_REFERENCE_PATH", "/root/reference")
    script = os.path.join(
        reference, "mrjob", "examples", "mr_word_freq_count.py"
    )
    if not os.path.isfile(script):
        raise FileNotFoundError(
            "reference tree not found at %r (set MRJOB_REFERENCE_PATH)"
            % reference
        )
    import mrjob_spark

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(
        mrjob_spark.__file__)))
    fakeboto3 = os.path.join(
        repo_root, "mrjob_spark", "testing", "fakeboto3"
    )

    t = Tables(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mrjob-spark-refemr-q-")
    try:
        in_dir = os.path.join(tmp, "in")
        (
            t.documents.select(
                F.regexp_replace("text", r"[\r\n]+", " ").alias("value")
            )
            .repartition(2)
            .write.text(in_dir)
        )
        inputs = sorted(
            os.path.join(in_dir, n) for n in os.listdir(in_dir)
            if n.startswith("part-")
        )
        env = dict(
            os.environ,
            MOCK_EMR_BASE_DIR=os.path.join(tmp, "emr"),
            PYTHONPATH=os.pathsep.join(
                [fakeboto3, reference, repo_root,
                 os.environ.get("PYTHONPATH", "")]
            ),
        )
        proc = subprocess.run(
            [
                sys.executable, script, "-r", "emr", "--no-conf",
                "--iam-instance-profile", "EMR_EC2_DefaultRole",
                "--iam-service-role", "EMR_DefaultRole",
                "--cloud-tmp-dir", "s3://mrjob-ref-tmp/tmp/",
                "--check-cluster-every", "0",
                "--cloud-fs-sync-secs", "0",
                "--no-bootstrap-mrjob",
                "--python-bin", sys.executable,
                "--jobconf", "mapreduce.job.reduces=2",
            ] + inputs,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            timeout=600,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                "reference EMR run failed (rc=%d):\n%s"
                % (proc.returncode,
                   proc.stderr.decode("utf-8", "replace")[-4000:])
            )
        rows = [
            (json.loads(k), int(json.loads(v)))
            for k, v in (
                line.split(b"\t")
                for line in proc.stdout.splitlines() if line
            )
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
