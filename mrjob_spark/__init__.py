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

# PEP 562 lazy exports: importing the package must NOT pull pyspark.
# Every mock-hadoop / local-runner task container is a fresh Python
# process that imports `mrjob_spark.dataflow.*`; with the old eager
# `from mrjob_spark.session import ...` each task paid ~0.35 s of
# pyspark+numpy import for a module it never uses (measured round 12 —
# the dominant fixed cost of the subprocess tier's task spawns).
_LAZY_EXPORTS = {
    "get_spark": ("mrjob_spark.session", "get_spark"),
    "configure_session": ("mrjob_spark.session", "configure_session"),
    "load_tables": ("mrjob_spark.catalog", "load_tables"),
    "TABLES": ("mrjob_spark.catalog", "TABLES"),
}


def __getattr__(name: str):
    try:
        mod_name, attr = _LAZY_EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(list(globals()) + list(_LAZY_EXPORTS))
