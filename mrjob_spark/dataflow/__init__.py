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

from mrjob_spark.dataflow.job import SparkMRJob  # noqa: F401
from mrjob_spark.dataflow.step import (  # noqa: F401
    GENERIC_ARGS,
    INPUT,
    OUTPUT,
    JarStep,
    MRStep,
    SparkJarStep,
    SparkScriptStep,
    SparkStep,
)
from mrjob_spark.dataflow.runner import SparkJobRunner  # noqa: F401
from mrjob_spark.dataflow.inline import InlineJobRunner  # noqa: F401
from mrjob_spark.dataflow.compat import (  # noqa: F401
    jobconf_from_dict,
    jobconf_from_env,
    translate_jobconf,
)
from mrjob_spark.dataflow.protocols import (  # noqa: F401
    BytesProtocol,
    BytesValueProtocol,
    JSONProtocol,
    JSONValueProtocol,
    PickleProtocol,
    PickleValueProtocol,
    RapidJSONProtocol,
    RapidJSONValueProtocol,
    RawProtocol,
    RawValueProtocol,
    ReprProtocol,
    ReprValueProtocol,
    SimpleJSONProtocol,
    SimpleJSONValueProtocol,
    StandardJSONProtocol,
    StandardJSONValueProtocol,
    TextProtocol,
    TextValueProtocol,
    UltraJSONProtocol,
    UltraJSONValueProtocol,
)
