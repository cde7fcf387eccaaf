"""SparkSession factory and scale-oriented configuration.

The reference exposes ``num_cores``/``sort_bin``/``max_output_files``/
``mapreduce.job.reduces`` knobs (reference ``mrjob/options.py:1026,1234,967``,
``mrjob/spark/runner.py:456-459``); here the equivalents are Spark confs.

Defaults are chosen for the 100 TB design target, scaled down to local mode:

* AQE on (runtime re-planning, skew-join handling, partition coalescing) —
  at 1000 executors AQE is what keeps shuffle partition counts sane without
  hand-tuning per query.
* ``spark.sql.shuffle.partitions`` left to AQE coalescing locally; on a real
  cluster you would set it to ~2-3x total cores and let AQE shrink.
* Arrow enabled for every pandas UDF boundary.
* Session timezone pinned to UTC so timestamp semantics are deterministic
  and match naive-UTC parquet storage everywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to *any* session handed to us (the
#: correctness driver owns its own SparkSession; these are safe to set late).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The events fixture stores TIMESTAMP(NANOS); Spark reads it as int64
    # under this flag and the catalog converts to microsecond timestamps.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


#: Confs whose absence silently breaks correctness (not just performance):
#: nanosAsLong gates reading the events fixture's TIMESTAMP(NANOS) column;
#: the session timezone pins timestamp semantics for oracle comparison.
_LOAD_BEARING_CONFS = (
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.session.timeZone",
)


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Performance confs are best-effort, but load-bearing ones are verified
    after the attempt and a loud warning names any that did not take effect
    (an externally-owned session may reject late conf sets; swallowing that
    silently produced undiagnosable events-table failures — ADVICE r1).
    """
    import warnings

    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    for k in _LOAD_BEARING_CONFS:
        try:
            actual = spark.conf.get(k)
        except Exception:
            actual = None
        if actual != RUNTIME_CONFS[k]:
            warnings.warn(
                f"load-bearing Spark conf {k}={RUNTIME_CONFS[k]!r} did not "
                f"take effect (session reports {actual!r}); reading the "
                "events fixture may fail or mismatch the oracle",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark


def get_spark(
    app_name: str = "mrjob_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    # before the JVM exists: make google.protobuf importable (vendored
    # shim; no-op where a real protobuf is installed) and put the shim on
    # PYTHONPATH so forked Python workers inherit it — this is what lets
    # transformWithStateInPandas execute in this container
    from mrjob_spark.compat_pb import ensure_protobuf_compat

    ensure_protobuf_compat()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return configure_session(builder.getOrCreate())
