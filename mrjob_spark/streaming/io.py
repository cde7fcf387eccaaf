"""Streaming sources/sinks: ``readStream`` → plan → ``writeStream``.

The file source replays a directory of parquet files as micro-batches —
exactly how a production pipeline tails an ingest directory at scale
(each new file becomes a batch; ``maxFilesPerTrigger`` throttles). The
memory sink + ``Trigger.AvailableNow`` pair is the test harness: drain
everything currently in the source, then stop — which makes streaming
output directly comparable to the batch twin's result.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream_parquet(
    spark: SparkSession,
    path: str,
    *,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a parquet directory as a streaming source.

    The file source requires an explicit schema; when none is given we
    infer it from a one-off batch read of the same path. Mirrors
    ``catalog.load_table``'s nanosecond-timestamp handling so the events
    fixture streams with the same ``ts`` type it has in batch.
    """
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # The file source's basePath must be a directory; a single-file fixture
    # (e.g. events.parquet) streams via its parent dir + a name filter.
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # watermarks/event-time require TIMESTAMP (LTZ); Spark 4 infers NTZ
        # for tz-less parquet timestamps. Session tz is pinned UTC
        # (session.py), so this cast is a deterministic relabel, and both
        # types collect to the same naive UTC wall clock for comparisons.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def run_available_now(
    sdf: DataFrame,
    *,
    output_mode: str = "update",
    query_name: str | None = None,
) -> DataFrame:
    """Drain the stream with ``Trigger.AvailableNow`` into a memory sink and
    return the sink's contents as a batch DataFrame.

    The memory sink is driver-resident — a TEST harness, never a production
    sink (at scale use ``write_stream_parquet``). In ``update`` mode the
    sink holds every emitted version of a group; callers that want final
    values aggregate with max/last per key.
    """
    name = query_name or f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def write_stream_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    *,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Production-shaped sink: parquet files + checkpoint for exactly-once.

    Checkpointing the offsets/state directory is what makes restart-safe,
    exactly-once file output work on a real cluster; a sink without one
    cannot recover. Returns the StreamingQuery (caller awaits/stops).
    """
    writer = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_overwrite(path: str, partition_col: str = "batch_id"):
    """Idempotent ``foreachBatch`` sink: the exactly-once file-output
    pattern for when the built-in checkpointed parquet sink isn't enough
    (per-batch post-processing, MERGE-style upserts, multiple sinks).

    Each micro-batch lands in its own ``batch_id=N`` partition with DYNAMIC
    partition overwrite, so a replayed batch — Structured Streaming
    re-delivers the whole batch after a failure between foreachBatch and
    offset commit — overwrites its own partition instead of appending
    duplicates. Consumers read the directory and take the highest
    ``batch_id`` version per key.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(partition_col, F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )

    return write_batch
