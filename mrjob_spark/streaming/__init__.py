"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only (SURVEY §1.4): mrjob's "streaming" is Hadoop
Streaming's stdin/stdout piping, not a streaming data model. This package is
the EXT surface the blueprint declares on top of it: event-time windowed
aggregation (tumbling / sliding / session), watermark-driven late-data
handling, and stateful dedup — all built on ``readStream`` →
transformations → ``writeStream``.

Design rule: every transform here is **engine-agnostic** — it accepts either
a batch or a streaming DataFrame and builds the identical logical plan, so
the DuckDB oracle can check the batch twin while ``tests/test_streaming.py``
replays the same plan through real micro-batch execution (file source →
``Trigger.AvailableNow`` → memory sink) and asserts batch/stream
equivalence. That mirrors the reference's own differential-testing strategy
(``tests/spark/test_harness.py`` runs one job through two engines and
compares).
"""

from mrjob_spark.streaming.ops import (
    session_window_agg,
    sliding_window_agg,
    stateful_running_totals,
    transform_with_state_stats,
    stream_dedup,
    stream_static_enrich,
    stream_stream_join,
    tumbling_window_agg,
    with_watermark,
)
from mrjob_spark.streaming.io import (
    read_stream_parquet,
    run_available_now,
    write_stream_parquet,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stateful_running_totals",
    "transform_with_state_stats",
    "with_watermark",
    "stream_dedup",
    "stream_static_enrich",
    "stream_stream_join",
    "read_stream_parquet",
    "run_available_now",
    "write_stream_parquet",
]
