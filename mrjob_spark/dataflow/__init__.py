"""MRJob-compatible dataflow API, compiled to Spark plans.

The reference's core capability is the ``MRJob`` authoring surface: subclass,
define ``mapper``/``combiner``/``reducer`` generators (and ``*_init``/
``*_final`` hooks, command substeps, counters, SORT_VALUES), chain steps, and
let a runner execute them (reference ``mrjob/job.py:260-338``,
``mrjob/step.py:180-207``). This package re-expresses that surface natively
on Spark:

* :class:`~mrjob_spark.dataflow.job.SparkMRJob` — the user-facing job class.
* :class:`~mrjob_spark.dataflow.step.MRStep` — one map/combine/reduce stage.
* :mod:`~mrjob_spark.dataflow.protocols` — serde at the edges only
  (SURVEY.md §1.2): internally everything is Python pairs on RDDs, the same
  optimization the reference's own Spark harness calls
  ``--skip-internal-protocol`` (``mrjob/spark/harness.py:118-124``).
* :class:`~mrjob_spark.dataflow.runner.SparkJobRunner` — compiles the step
  chain into ONE lazy RDD plan (no per-step materialization, unlike every
  reference runner, ``mrjob/sim.py:144-195``).

Scale notes (100 TB design target):

* Reducer input is a **lazy per-key value iterator** built from
  ``repartitionAndSortWithinPartitions`` + ``itertools.groupby`` — no
  per-key list materialization, so a hot key streams through one task
  instead of OOMing it. This improves on the reference harness, which
  materializes each key's values via ``rdd.groupBy``
  (``mrjob/spark/harness.py:568-576``).
* Combiners run as ``combineByKey`` (map-side partial aggregation before
  the shuffle), matching ``mrjob/spark/harness.py:439-509`` semantics
  including combiners that yield 0 or ≥2 pairs.
* Counters are a Spark accumulator with a nested-dict merge, the same
  shape the reference prototypes (``mrjob/spark/harness.py:125-139``).
"""

# PEP 562 lazy exports (round 12): a task container imports
# `mrjob_spark.dataflow.job` / `.hstream` to unpickle its spool; the old
# eager `from .runner import SparkJobRunner` pulled pyspark into every
# such process (~0.35 s per task, the subprocess tier's dominant fixed
# cost). Job/step/protocol classes resolve from their light modules;
# the runners only load when actually referenced (driver side).
_LAZY_MODULES = {
    "SparkMRJob": "mrjob_spark.dataflow.job",
    "SparkJobRunner": "mrjob_spark.dataflow.runner",
    "InlineJobRunner": "mrjob_spark.dataflow.inline",
}
for _name in (
    "GENERIC_ARGS", "INPUT", "OUTPUT", "JarStep", "MRStep",
    "SparkJarStep", "SparkScriptStep", "SparkStep",
):
    _LAZY_MODULES[_name] = "mrjob_spark.dataflow.step"
for _name in ("jobconf_from_dict", "jobconf_from_env", "translate_jobconf"):
    _LAZY_MODULES[_name] = "mrjob_spark.dataflow.compat"
for _name in (
    "BytesProtocol", "BytesValueProtocol", "JSONProtocol",
    "JSONValueProtocol", "PickleProtocol", "PickleValueProtocol",
    "RapidJSONProtocol", "RapidJSONValueProtocol", "RawProtocol",
    "RawValueProtocol", "ReprProtocol", "ReprValueProtocol",
    "SimpleJSONProtocol", "SimpleJSONValueProtocol",
    "StandardJSONProtocol", "StandardJSONValueProtocol", "TextProtocol",
    "TextValueProtocol", "UltraJSONProtocol", "UltraJSONValueProtocol",
):
    _LAZY_MODULES[_name] = "mrjob_spark.dataflow.protocols"
del _name


def __getattr__(name: str):
    try:
        mod_name = _LAZY_MODULES[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    return getattr(importlib.import_module(mod_name), name)


def __dir__():
    return sorted(list(globals()) + list(_LAZY_MODULES))
