"""Worker-side task entry for the ``-r hadoop`` runner.

Hadoop streaming runs one OS process per task and speaks newline-delimited
bytes on stdin/stdout; counters ride the ``reporter:counter:`` stderr
side-channel (PipeMapRed's protocol). This module is that process:

    python -m mrjob_spark.dataflow.hstream --kind mapper --step-num 0 job.pkl

The job object travels as a cloudpickle spool shipped through the
distributed cache (``-files``), the same transport the ``-r local`` runner
uses — unlike the reference, which re-invokes the user's *script* with
``--mapper``-style flags (``mrjob/job.py:671-687``), so programmatic jobs
(class defined in a test module, no script file) run under ``-r hadoop``
unchanged. The script-style re-entry flags exist too; see
``SparkMRJob.execute``.

Wire semantics are the protocol-POSITION plan shared with the other three
runners (:class:`~mrjob_spark.dataflow.step.ProtocolPlan`); reducer/combiner
grouping is Hadoop's own contract — consecutive runs of the bytes BEFORE
THE FIRST TAB of each (already sorted) input line — so a value-only wire
yields one group per distinct line, exactly as the job-shape differential
pins for the other runners.
"""

from __future__ import annotations

import argparse
import itertools
import sys

from mrjob_spark.dataflow.protocols import (
    memoized_line_reader,
    memoized_pair_writer,
)


class StderrReporter:
    """Counter sink that speaks PipeMapRed's stderr protocol; the
    framework (real Hadoop or the executing mock) aggregates the lines
    into job counters."""

    def __init__(self, stream=None):
        self._stream = stream or sys.stderr.buffer

    def add(self, update: dict) -> None:
        for group, names in (update or {}).items():
            for name, amount in names.items():
                self._stream.write(
                    b"reporter:counter:%s,%s,%d\n"
                    % (
                        str(group).encode("utf-8"),
                        str(name).encode("utf-8"),
                        int(amount),
                    )
                )
        self._stream.flush()


def _load_job(path: str):
    # plain pickle.load: by-reference spools (any importable job class —
    # cloudpickle only by-values __main__/unimportable classes) never
    # touch pyspark, and by-VALUE streams carry `pyspark.cloudpickle...`
    # global refs that pickle imports on demand — the old eager
    # `import pyspark.cloudpickle` cost every task container ~0.35 s of
    # pyspark import it usually never needed (round 12)
    import pickle

    with open(path, "rb") as fh:
        return pickle.load(fh)


def _in_lines(stream) -> "itertools.chain":
    return (ln.rstrip(b"\r\n") for ln in stream if ln.rstrip(b"\r\n"))


def _with_hooks(step, kind: str, body):
    """init → body → final, flattening each hook's optional pair yield
    (the overridable-substep contract, ``mrjob/job.py:798-835``)."""
    init = getattr(step, f"{kind}_init")
    final = getattr(step, f"{kind}_final")

    def gen():
        if init:
            yield from init() or ()
        yield from body()
        if final:
            yield from final() or ()

    return gen()


def run_task(job, kind: str, step_num: int, stdin=None, stdout=None) -> None:
    from mrjob_spark.dataflow.local import _plan_for

    stdin = stdin or sys.stdin.buffer
    stdout = stdout or sys.stdout.buffer
    job._counter_acc = StderrReporter()

    steps = job.steps()
    step = steps[step_num]
    plan = _plan_for(job)
    lines = _in_lines(stdin)

    if kind == "mapper":
        in_wire = plan.read_for(step_num, "mapper")
        out_wire = plan.write_for(step_num, "mapper")
        fn = step.mapper

        def body():
            for line in lines:
                key, value = in_wire.read(line)
                if fn is not None:
                    yield from fn(key, value) or ()
                else:
                    yield key, value

        pairs = _with_hooks(step, "mapper", body)

    elif kind in ("combiner", "reducer"):
        if kind == "combiner":
            in_wire = out_wire = plan.mapper_output(step_num)
        else:
            in_wire = plan.read_for(step_num, "reducer")
            out_wire = plan.write_for(step_num, "reducer")
        fn = getattr(step, kind)

        def body():
            # group on the raw byte key — Hadoop's bytes-before-first-tab
            # contract (a value-only wire has no key field, so each
            # distinct line is its own group even though every pair
            # decodes to key=None)
            read = in_wire.read
            # sorted task input repeats each encoded line once per
            # map-side occurrence — decode each distinct line once and
            # share the (byte_key, pair) result for immutable pairs
            decode = memoized_line_reader(
                lambda line: (line.split(b"\t", 1)[0], read(line)),
                pair_of=lambda out: out[1],
            )
            decoded = (decode(line) for line in lines)
            for _, group in itertools.groupby(decoded, key=lambda it: it[0]):
                _, (key, first_v) = next(group)
                values = itertools.chain(
                    (first_v,), (kv[1] for _, kv in group)
                )
                if fn is not None:
                    yield from fn(key, values) or ()
                else:
                    yield key, first_v
                    yield from ((key, v) for v in values)

        pairs = _with_hooks(step, kind, body)

    else:
        raise ValueError(f"bad task kind: {kind!r}")

    # task output repeats a small distinct-pair vocabulary (wordcount
    # emits (word, 1) per occurrence) — encode each distinct scalar pair
    # once instead of two json dumps per occurrence
    write = memoized_pair_writer(out_wire.write)
    for key, value in pairs:
        stdout.write(write(key, value) + b"\n")
    stdout.flush()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="hstream")
    parser.add_argument("--kind", required=True,
                        choices=("mapper", "combiner", "reducer"))
    parser.add_argument("--step-num", type=int, required=True)
    parser.add_argument("job_pkl", help="cloudpickled job spool "
                        "(localized into the task cwd via -files)")
    args = parser.parse_args(argv)

    job = _load_job(args.job_pkl)
    run_task(job, args.kind, args.step_num)
    return 0


if __name__ == "__main__":
    sys.exit(main())
