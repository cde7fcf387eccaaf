"""Oracle-checked IO queries: CSV/JSON scans (S7-rest) and sink controls
(S10/S11/S12).

Each query round-trips a fixture table through the format under test in a
scratch directory, reads it back, and aggregates — so a hash match against
the DuckDB oracle (which reads the ORIGINAL parquet) proves the write+read
path preserved every value. Scratch lives under /tmp keyed by scale factor;
overwrite mode makes reruns idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mrjob_spark.functions.rounding import rnd, dsum
from mrjob_spark.queries import Tables, query
from mrjob_spark.sources import cat_output, read_csv, read_json, write_table


def _scratch(sf_dir: str, name: str) -> str:
    # PID-scoped: concurrent processes (bench beside a driver run) must
    # not overwrite each other's live roundtrip directories
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/mrjob_spark_io/{tag}/{os.getpid()}/{name}"


@query(
    "s7_csv_roundtrip",
    sql="""
    SELECT n_regionkey, count(*) AS n_nations,
           min(n_name) AS first_name,
           CAST(sum(length(n_name)) AS BIGINT) AS name_chars
    FROM nation GROUP BY n_regionkey
    """,
)
def s7_csv_roundtrip(spark, sf_dir):
    """S7 CSV: nation → csv (header, explicit schema on re-read: inference
    at scale means a second full pass) → aggregate. Hash match vs the
    parquet-reading oracle proves lossless csv serde."""
    t = Tables(spark, sf_dir)
    nation = t.nation
    path = _scratch(sf_dir, "nation_csv")
    write_table(nation, path, fmt="csv", max_output_files=1)
    back = read_csv(spark, path, schema=nation.schema)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
        F.sum(F.length("n_name")).alias("name_chars"),
    )


@query(
    "s7_json_roundtrip",
    sql="""
    SELECT s_nationkey, count(*) AS n_sup,
           (floor((CAST(sum(CAST((s_acctbal) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS sum_bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def s7_json_roundtrip(spark, sf_dir):
    """S7 JSON-lines: supplier → json → aggregate; schema passed explicitly
    on re-read (JSON inference is another full pass at scale)."""
    t = Tables(spark, sf_dir)
    supplier = t.supplier
    path = _scratch(sf_dir, "supplier_json")
    write_table(supplier, path, fmt="json", max_output_files=2)
    back = read_json(spark, path, schema=supplier.schema)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_sup"),
        rnd(dsum("s_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "s9_compressed_sink",
    sql="""
    SELECT c_mktsegment, count(*) AS n_cust,
           min(c_name) AS first_name,
           (floor((CAST(sum(CAST((c_acctbal) AS DECIMAL(38,6))) AS DOUBLE))
                  * 100 + 0.5) / 100) AS sum_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def s9_compressed_sink(spark, sf_dir):
    """S9 compressed sink (r3 verdict #5): customer → gzip CSV → read back
    → aggregate. The reference compresses streaming output the same way
    (``mrjob/spark/runner.py:446-454`` hands the codec to Hadoop's output
    format; here the DataFrame writer's ``compression`` option does).
    The query VERIFIES the codec actually engaged — every part file must
    carry the ``.gz`` suffix — before re-reading, so a silent fallback to
    plain text can't masquerade as a pass. Hash match vs the
    parquet-reading oracle proves write→compress→decompress→read is
    lossless. Scale note: gzip parts are unsplittable on re-read (one
    task per file), the deliberate trade for network/storage cost —
    splittable codecs swap in via the same option."""
    import glob
    import os

    t = Tables(spark, sf_dir)
    customer = t.customer
    path = _scratch(sf_dir, "customer_csv_gz")
    write_table(
        customer, path, fmt="csv", compression="gzip", max_output_files=2
    )
    parts = glob.glob(os.path.join(path, "part-*"))
    bad = [p for p in parts if not p.endswith(".csv.gz")]
    if not parts or bad:
        raise AssertionError(f"gzip codec did not engage: {bad or 'no parts'}")
    back = read_csv(spark, path, schema=customer.schema)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.min("c_name").alias("first_name"),
        rnd(dsum("c_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "o1_o2_partition_layout",
    sql="""
    SELECT CAST(8 AS BIGINT) AS n_partitions,
           count(*) AS total_rows,
           CAST(8 AS BIGINT) AS n_sorted,
           min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
    FROM lineitem
    """,
)
def o1_o2_partition_layout(spark, sf_dir):
    """O1+O2 as first-class operators: hash-repartition lineitem on
    l_orderkey into 8 partitions, sort within each, then AUDIT the physical
    layout with a per-partition mapInPandas pass (operators/partitioning.py).
    The oracle pins the claim: exactly 8 non-empty partitions, every one
    key-sorted, no row lost. This layout (same exchange reused by downstream
    same-key stages) is the write-side of bucketing at scale."""
    from mrjob_spark.operators.partitioning import (
        partition_audit,
        repartition_by_key,
        sort_within_partitions,
    )

    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey")
    laid_out = sort_within_partitions(
        repartition_by_key(li, 8, "l_orderkey"), "l_orderkey"
    )
    audit = partition_audit(laid_out, "l_orderkey")
    return audit.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("rows").alias("total_rows"),
        F.sum("is_sorted").cast("long").alias("n_sorted"),
        F.min("min_key").alias("min_key"),
        F.max("max_key").alias("max_key"),
    )


@query(
    "s10_partitioned_sink",
    sql="""
    SELECT o_orderpriority, count(*) AS n,
           (floor((CAST(sum(CAST((o_totalprice) AS DECIMAL(38,6))) AS DOUBLE)) * 100 + 0.5) / 100) AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def s10_partitioned_sink(spark, sf_dir):
    """S10+S11+S12: orders written Hive-partitioned by o_orderpriority with
    a file-count cap, then cat back and aggregate per partition value.
    The re-read restores the partition column from directory names, so a
    hash match proves layout + values both survived. Downstream filters on
    o_orderpriority would prune whole directories — the scale payoff."""
    t = Tables(spark, sf_dir)
    path = _scratch(sf_dir, "orders_by_priority")
    write_table(
        t.orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        path,
        partition_by=["o_orderpriority"],
        max_output_files=4,
    )
    back = cat_output(spark, path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(dsum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "s4_s5_file_attribution",
    sql="""
    SELECT lang, count(*) AS n_lines,
           CAST(sum(length(txt)) AS BIGINT) AS n_chars
    FROM (SELECT lang, replace(text, chr(10), ' ') AS txt FROM documents)
    GROUP BY lang
    """,
)
def s4_s5_file_attribution(spark, sf_dir):
    """S4+S5: documents written as TEXT files Hive-partitioned by lang, read
    back as raw lines with ``F.input_file_name()`` attribution, the lang
    recovered FROM THE FILE PATH (``lang=xx/part-*``), and aggregated per
    attributed file group. This is the reference's
    ``mapreduce.map.input.file`` jobconf / ``mapper_raw`` surface
    (``mrjob/sim.py:386-389``, ``mrjob/spark/harness.py:306-325``) —
    the oracle hash proves no line lost its provenance. Newlines are
    collapsed before writing so one document stays one text record."""
    t = Tables(spark, sf_dir)
    path = _scratch(sf_dir, "docs_text_by_lang")
    write_table(
        t.documents.select(
            F.regexp_replace("text", "\n", " ").alias("value"), "lang"
        ),
        path,
        fmt="text",
        partition_by=["lang"],
    )
    lines = spark.read.text(path, pathGlobFilter="part-*", recursiveFileLookup=True)
    attributed = lines.select(
        "value", F.input_file_name().alias("src_file")
    ).select(
        "value",
        F.regexp_extract("src_file", r"lang=([^/]+)/", 1).alias("lang"),
    )
    return attributed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("n_chars"),
    )


@query(
    "s6_hadoop_input_format",
    sql="""
    SELECT count(*) AS n_lines,
           CAST(sum(length(txt)) AS BIGINT) AS n_chars,
           CAST(sum(len(regexp_extract_all(lower(txt), '[a-z]+'))) AS BIGINT)
               AS n_words
    FROM (SELECT replace(text, chr(10), ' ') AS txt FROM documents)
    """,
)
def s6_hadoop_input_format(spark, sf_dir):
    """S6 arbitrary Hadoop InputFormat scan: documents dumped to text, read
    back through ``newAPIHadoopFile`` + ``TextInputFormat`` (the reference
    hands ``-inputformat`` to Hadoop streaming the same way,
    ``mrjob/job.py:1313-1322``), and aggregated. The (offset, line) pair RDD
    crosses into DataFrame-land once; the hash match vs the parquet oracle
    proves the InputFormat path loses no line. FileInputFormat skips
    ``_``/``.`` files by convention, so the committed _SUCCESS marker is
    transparent."""
    from mrjob_spark.sources import read_hadoop_input_format

    t = Tables(spark, sf_dir)
    path = _scratch(sf_dir, "docs_text_s6")
    write_table(
        t.documents.select(F.regexp_replace("text", "\n", " ").alias("value")),
        path,
        fmt="text",
        max_output_files=2,
    )
    pairs = read_hadoop_input_format(spark, path)
    lines = pairs.map(lambda kv: (kv[1],)).toDF(["txt"])
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("txt")).alias("n_chars"),
        F.sum(
            F.size(F.regexp_extract_all(F.lower("txt"), F.lit("[a-z]+"), 0))
        ).alias("n_words"),
    )


@query(
    "s1_s2_gzip_text_scan",
    sql="""
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(regexp_extract_all(lower(replace(text, chr(10), ' ')),
                                           '[a-z]+')) AS word
          FROM documents)
    GROUP BY word
    """,
)
def s1_s2_gzip_text_scan(spark, sf_dir):
    """S1+S2+S8 through the REAL text source: documents dumped to gzipped
    text part-files, then a dataflow wordcount runs with ``input_paths``
    (``sc.textFile`` — Spark decompresses ``.gz`` by extension, one task
    per file since gzip is unsplittable, exactly the reference's rule
    ``mrjob/cat.py:78-104``/``mrjob/sim.py:443-463``). Hash match vs SQL
    over the original parquet proves the text write→compress→scan→dataflow
    path loses nothing."""
    import glob
    import gzip
    import os

    from pyspark.sql import types as T

    from mrjob_spark.dataflow.examples import MRWordFreqCount

    t = Tables(spark, sf_dir)
    path = _scratch(sf_dir, "docs_text_gz")
    write_table(
        t.documents.select(F.regexp_replace("text", "\n", " ").alias("value")),
        path,
        fmt="text",
        max_output_files=4,
    )
    # compress the part files the way a log producer would
    for part in glob.glob(os.path.join(path, "part-*")):
        if part.endswith(".gz"):
            continue
        with open(part, "rb") as fin, gzip.open(part + ".gz", "wb") as fout:
            fout.write(fin.read())
        os.remove(part)

    runner = MRWordFreqCount().make_runner(
        spark, input_paths=[os.path.join(path, "part-*.gz")]
    )
    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("cnt", T.LongType()),
        ]
    )
    return runner.to_dataframe(schema)


@query(
    "s7_orc_roundtrip",
    sql="""
    SELECT p_brand, count(*) AS n_parts,
           CAST(min(p_size) AS BIGINT) AS min_size,
           CAST(max(p_size) AS BIGINT) AS max_size,
           (floor((CAST(sum(CAST((p_retailprice) AS DECIMAL(38,6)))
                        AS DOUBLE)) * 100 + 0.5) / 100) AS sum_price
    FROM part GROUP BY p_brand
    """,
)
def s7_orc_roundtrip(spark, sf_dir):
    """S7 ORC: part → ORC (the other columnar format a Spark shop meets in
    the wild — Hive-era warehouses) → aggregate. Columnar, predicate-
    pushdown-capable, and schema'd on disk, so unlike csv/json no explicit
    re-read schema is needed. The oracle reads the parquet original: a
    hash match proves lossless ORC serde including doubles."""
    from mrjob_spark.functions.rounding import dsum, rnd

    t = Tables(spark, sf_dir)
    part = t.part
    path = _scratch(sf_dir, "part_orc")
    write_table(part, path, fmt="orc", max_output_files=2)
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_size").cast("long").alias("min_size"),
        F.max("p_size").cast("long").alias("max_size"),
        rnd(dsum("p_retailprice"), 2).alias("sum_price"),
    )


@query(
    "s13_bucketed_join",
    sql="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
           (floor((CAST(sum(CAST((o.o_totalprice) AS DECIMAL(38,6)))
                   AS DOUBLE)) * 100 + 0.5) / 100) AS sum_price
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def s13_bucketed_join(spark, sf_dir):
    """Bucketed-layout co-located join (the recurring-big-big-join answer
    at 100 TB): orders and customer are written hash-clustered into the
    SAME bucket layout on the customer key (``write_bucketed_table``,
    sources.py), then joined and aggregated — and because bucketing
    metadata lives in the catalog, the join plans with ZERO exchanges on
    either side (pinned in test_plans.py): every task reads matching
    bucket files from both tables. The shuffle is paid once at write time
    instead of on every query; an aggregation keyed on the bucket column
    skips its exchange the same way. The oracle runs the identical
    join+agg relationally over the original tables, proving the bucketed
    round-trip loses nothing."""
    import os

    from mrjob_spark.sources import write_bucketed_table

    t = Tables(spark, sf_dir)
    tag = "".join(
        ch for ch in (os.path.basename(os.path.normpath(sf_dir)) or "sf")
        if ch.isalnum()
    )
    o_name, c_name = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    write_bucketed_table(
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        spark,
        o_name,
        buckets=8,
        bucket_cols=["o_custkey"],
        sort_cols=["o_custkey"],
        path=_scratch(sf_dir, "bkt_orders"),
    )
    write_bucketed_table(
        t.customer.select("c_custkey", "c_mktsegment"),
        spark,
        c_name,
        buckets=8,
        bucket_cols=["c_custkey"],
        sort_cols=["c_custkey"],
        path=_scratch(sf_dir, "bkt_customer"),
    )
    orders = spark.table(o_name)
    customer = spark.table(c_name)
    joined = orders.join(
        customer.hint("merge"),
        orders["o_custkey"] == customer["c_custkey"],
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        rnd(dsum("o_totalprice"), 2).alias("sum_price"),
    )
