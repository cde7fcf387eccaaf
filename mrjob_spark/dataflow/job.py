"""SparkMRJob — the user-facing job class.

API-compatible in spirit with the reference's ``MRJob``
(``mrjob/job.py:89-136,260-338``): subclass, override generator methods,
optionally override :meth:`steps` for multi-step pipelines, set protocol
class attributes and :attr:`SORT_VALUES`, call :meth:`increment_counter`
from any substep. Execution happens through
:class:`~mrjob_spark.dataflow.runner.SparkJobRunner`, which compiles all
steps into one lazy Spark plan.

Example (wordcount, cf. ``mrjob/examples/mr_word_freq_count.py:20-33``)::

    class MRWordFreqCount(SparkMRJob):
        def mapper(self, _, line):
            for word in re.findall(r"[a-z']+", line.lower()):
                yield word, 1

        def combiner(self, word, counts):
            yield word, sum(counts)

        def reducer(self, word, counts):
            yield word, sum(counts)

    with MRWordFreqCount().make_runner(spark, input_paths=[...]) as r:
        r.run()
        for key, value in r.cat_output():
            ...
"""

from __future__ import annotations

from mrjob_spark.dataflow.protocols import (
    JSONProtocol,
    RawValueProtocol,
)
from mrjob_spark.dataflow.step import MRStep, SparkStep


def _is_overridden(obj, name: str) -> bool:
    return getattr(type(obj), name) is not getattr(SparkMRJob, name)


class SparkMRJob:
    """Subclassable MapReduce-style job compiled to Spark.

    Class-level knobs (same names/meaning as the reference):

    * ``INPUT_PROTOCOL`` — decodes input lines into ``(key, value)``
      (default :class:`RawValueProtocol`: key=None, value=line text;
      ``mrjob/job.py:1270``).
    * ``INTERNAL_PROTOCOL`` — NOT used for data movement (pairs stay native
      Python between steps); supplies the canonical byte encoding for
      shuffle grouping and SORT_VALUES ordering (``mrjob/job.py:1282``).
    * ``OUTPUT_PROTOCOL`` — encodes final pairs into output lines
      (default :class:`JSONProtocol`; ``mrjob/job.py:1291``).
    * ``SORT_VALUES`` — deliver each key's values sorted by their encoded
      bytes (``mrjob/job.py:1567-1593``).
    * ``JOBCONF`` — engine knobs; ``mapreduce.job.reduces`` maps to shuffle
      partition count (``mrjob/spark/runner.py:456-459``).
    * ``FILES`` — paths shipped to every task via ``SparkContext.addFile``
      (``mrjob/job.py:1410-1430``).
    """

    INPUT_PROTOCOL = RawValueProtocol
    INTERNAL_PROTOCOL = JSONProtocol
    OUTPUT_PROTOCOL = JSONProtocol
    SORT_VALUES = False
    JOBCONF: dict = {}
    FILES: list = []

    def __init__(self):
        # Counter sink; the runner swaps in a Spark accumulator before
        # compiling the plan (cf. mrjob/spark/harness.py:202-229).
        self._counter_acc = None

    # ------------------------------------------------------------------
    # overridable substeps (single-step jobs)
    # ------------------------------------------------------------------

    def mapper(self, key, value):
        raise NotImplementedError

    def mapper_init(self):
        raise NotImplementedError

    def mapper_final(self):
        raise NotImplementedError

    def mapper_raw(self, local_path, uri):
        raise NotImplementedError

    def combiner(self, key, values):
        raise NotImplementedError

    def combiner_init(self):
        raise NotImplementedError

    def combiner_final(self):
        raise NotImplementedError

    def reducer(self, key, values):
        raise NotImplementedError

    def reducer_init(self):
        raise NotImplementedError

    def reducer_final(self):
        raise NotImplementedError

    def spark(self, spark_session, input_rdd):
        raise NotImplementedError

    # command substeps are class attributes on the instance level:
    mapper_cmd: str | None = None
    reducer_cmd: str | None = None
    mapper_pre_filter: str | None = None
    combiner_pre_filter: str | None = None
    reducer_pre_filter: str | None = None

    # ------------------------------------------------------------------
    # steps
    # ------------------------------------------------------------------

    def steps(self) -> list:
        """Default: one step assembled from whichever substep methods the
        subclass overrides (``mrjob/job.py:497-545``). Override to chain
        multiple :class:`MRStep` / :class:`SparkStep` objects."""
        if _is_overridden(self, "spark"):
            return [SparkStep(spark=self.spark, jobconf=dict(self.JOBCONF))]

        kwargs = {}
        for slot in (
            "mapper", "mapper_init", "mapper_final", "mapper_raw",
            "combiner", "combiner_init", "combiner_final",
            "reducer", "reducer_init", "reducer_final",
        ):
            if _is_overridden(self, slot):
                kwargs[slot] = getattr(self, slot)
        for slot in (
            "mapper_cmd", "reducer_cmd",
            "mapper_pre_filter", "combiner_pre_filter", "reducer_pre_filter",
        ):
            if getattr(self, slot):
                kwargs[slot] = getattr(self, slot)
        if not kwargs:
            raise ValueError(
                f"{type(self).__name__} defines no substeps and does not "
                "override steps()"
            )
        kwargs["jobconf"] = dict(self.JOBCONF)
        return [MRStep(**kwargs)]

    # ------------------------------------------------------------------
    # counters / status (A8; mrjob/job.py:547-597)
    # ------------------------------------------------------------------

    def increment_counter(self, group: str, counter: str, amount: int = 1):
        """Increment a global counter, readable after the run via
        ``runner.counters()``. Implemented as a Spark accumulator add —
        exactly-once per *successful* task, same caveat as Hadoop."""
        if self._counter_acc is not None:
            self._counter_acc.add({str(group): {str(counter): int(amount)}})

    def set_status(self, msg: str):
        """Status messages are advisory; Spark has no per-task status
        channel, so this is a no-op hook kept for API compatibility."""

    # ------------------------------------------------------------------
    # runner
    # ------------------------------------------------------------------

    def make_runner(self, spark, **kwargs):
        """Build a :class:`SparkJobRunner` for this job.

        :param spark: an active ``SparkSession``.
        :param kwargs: see :class:`SparkJobRunner` (``input_paths``,
            ``input_rdd``, ``output_dir``, ``num_reducers``, ...).
        """
        from mrjob_spark.dataflow.runner import SparkJobRunner

        return SparkJobRunner(self, spark, **kwargs)
