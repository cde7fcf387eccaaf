"""mrjob_spark — a PySpark-native analytics engine with the capabilities of
Yelp/mrjob, rebuilt Spark-first.

Two surfaces:

* A relational/DataFrame engine (``mrjob_spark.queries`` + operator modules)
  covering the operator inventory in SURVEY.md §2: scans, projections,
  aggregations, joins, set ops, windows, scalar families, plus the
  LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns).

* An MRJob-compatible dataflow API (``mrjob_spark.dataflow``): subclass
  :class:`~mrjob_spark.dataflow.job.SparkMRJob`, define
  ``mapper``/``combiner``/``reducer`` generators, and run multi-step
  pipelines as one lazy Spark plan (cf. reference ``mrjob/job.py:260-309``).

* A Structured Streaming surface (``mrjob_spark.streaming``): event-time
  tumbling/sliding/session windows, watermarked late-data handling, and
  stateful dedup — batch/stream-agnostic plans validated by differential
  tests (SURVEY.md §2.10).

Design: everything internal is a typed DataFrame plan optimized by Catalyst;
protocols/serde exist only at the edges (SURVEY.md §1.2); RDDs are used only
for the arbitrary-Python-object dataflow API where DataFrame semantics cannot
express lazy per-key value iterators (SURVEY.md §7.3).
"""

__version__ = "0.1.0"

from mrjob_spark.session import get_spark, configure_session  # noqa: F401
from mrjob_spark.catalog import load_tables, TABLES  # noqa: F401
