"""The ``mrjob`` umbrella command (reference ``mrjob/cmd.py``).

The reference ships a tiny subcommand dispatcher (``mrjob/cmd.py:23-68``:
a name→function map with aligned-help usage text) whose subcommands are
mostly EMR cluster tooling — out of scope here by environment (SURVEY
§1.4). This port keeps the dispatcher contract and the two subcommands
that make sense for this engine:

* ``run <script.py> [job args...]`` — launch a job script exactly as
  ``python script.py args`` would (the script's ``MRMyJob.run()`` main),
  so shell pipelines can say ``python -m mrjob_spark run wc.py -r local
  in.txt`` regardless of where the script lives.
* ``diagnose [file|-]`` — the reference's ``mrjob diagnose`` reshaped for
  Spark: feed it a captured error log / traceback dump (file or stdin)
  and it prints the probable root cause, using the same extraction the
  runners attach to failed jobs (``dataflow/errors.py``, the port of
  ``mrjob/logs/errors.py:25-212``).
* ``spark-submit [-r runner] [options] <script.py|app.jar> [args]`` — the
  reference's drop-in spark-submit replacement with mrjob extras
  (``mrjob/tools/spark_submit.py``); see :mod:`mrjob_spark.spark_submit`.
* the EMR cluster-admin tools (``mrjob/tools/emr/*`` →
  :mod:`mrjob_spark.emr_tools`): ``create-cluster``,
  ``terminate-cluster``, ``terminate-idle-clusters``,
  ``audit-emr-usage``, ``report-long-jobs``, ``s3-tmpwatch``.

Invoke as ``python -m mrjob_spark <subcommand>`` (``__main__.py``).
"""

from __future__ import annotations

import sys

#: name -> (description, function(args) -> int)
_COMMANDS: dict = {}


def _command(name: str, description: str):
    def deco(fn):
        _COMMANDS[name] = (description, fn)
        return fn

    return deco


def _usage(msg: str | None = None) -> int:
    if msg:
        print(msg, file=sys.stderr)
    print("usage: python -m mrjob_spark {subcommand|--help}\n\nsubcommands:",
          file=sys.stderr)
    width = max(len(n) for n in _COMMANDS)
    for name in sorted(_COMMANDS):
        desc, _ = _COMMANDS[name]
        print(f"  {name}:{' ' * (width - len(name))} {desc}", file=sys.stderr)
    return 2


@_command("run", "Run an MRJob script (args passed through)")
def _run(args: list) -> int:
    if not args:
        print("usage: python -m mrjob_spark run <script.py> [args...]",
              file=sys.stderr)
        return 2
    script, job_args = args[0], args[1:]
    import runpy

    old_argv = sys.argv
    sys.argv = [script] + list(job_args)
    try:
        runpy.run_path(script, run_name="__main__")
        return 0
    except SystemExit as e:
        return int(e.code or 0)
    finally:
        sys.argv = old_argv


@_command("spark-submit",
          "Submit a Spark app (script or jar) with mrjob extras")
def _spark_submit(args: list) -> int:
    from mrjob_spark.spark_submit import main as spark_submit_main

    return spark_submit_main(args)


def _emr_tool(name: str, description: str, fn_name: str):
    @_command(name, description)
    def tool(args: list, _fn_name=fn_name, _name=name) -> int:
        import mrjob_spark.emr_tools as emr_tools

        try:
            return getattr(emr_tools, _fn_name)(args)
        except emr_tools.UsageError as ex:
            print("mrjob %s: %s" % (_name, ex), file=sys.stderr)
            return 2

    return tool


_emr_tool("create-cluster",
          "Create a persistent pooled EMR cluster (prints its id)",
          "create_cluster_main")
_emr_tool("terminate-cluster", "Terminate an EMR cluster by id",
          "terminate_cluster_main")
_emr_tool("terminate-idle-clusters",
          "Reap WAITING EMR clusters idle past a threshold",
          "terminate_idle_clusters_main")
_emr_tool("audit-emr-usage", "Per-cluster and per-pool usage report",
          "audit_usage_main")
_emr_tool("report-long-jobs",
          "EMR steps pending/running longer than a threshold",
          "report_long_jobs_main")
_emr_tool("s3-tmpwatch", "Delete S3 objects older than an age",
          "s3_tmpwatch_main")
_emr_tool("boss", "Run a command on every node of an EMR cluster",
          "boss_main")
_emr_tool("describe-base-emr-images",
          "List Amazon Linux AMIs usable as EMR custom-AMI bases",
          "describe_base_emr_images_main")


@_command("diagnose", "Extract the probable cause from a failed job's log")
def _diagnose(args: list) -> int:
    from mrjob_spark.dataflow.errors import (
        extract_probable_cause,
        hadoop_cause_with_span,
    )

    from mrjob_spark.dataflow.history import (
        looks_like_jhist,
        looks_like_pre_yarn_history,
        parse_jhist,
        parse_pre_yarn_history,
    )

    if not args or args[0] == "-":
        src, text = "<stdin>", sys.stdin.read()
    else:
        src = args[0]
        with open(src, errors="replace") as fh:
            text = fh.read()

    if looks_like_jhist(text) or looks_like_pre_yarn_history(text):
        # history-file correlation (reference mrjob/logs/history.py):
        # report the first failed attempt's error with its task/attempt
        # ids and the container to go read task logs from, plus a
        # one-line counter summary. Both vintages parse to one shape —
        # YARN Avro-Json .jhist and the Hadoop-1.x KEY="value" format.
        hist = (
            parse_jhist(text.splitlines())
            if looks_like_jhist(text)
            else parse_pre_yarn_history(text.splitlines(True))
        )
        errors = hist.get("errors") or []
        if errors:
            err = errors[0]
            print("Probable cause of failure:\n")
            cause = extract_probable_cause(err["message"]) or err["message"]
            print(cause)
            ids = [
                f"{k}={err[k]}" for k in ("task_id", "attempt_id") if k in err
            ]
            cont = hist["attempt_to_container_id"].get(err.get("attempt_id"))
            if cont:
                ids.append(f"container={cont}")
            if ids:
                print(f"\n({', '.join(ids)}; from line "
                      f"{err['start_line'] + 1} of {src})")
            n_counters = sum(len(v) for v in hist.get("counters", {}).values())
            if n_counters:
                print(f"\n{n_counters} counters recovered from history")
            return 0
        print("no failed attempt recorded in the history file",
              file=sys.stderr)
        return 1

    cause = extract_probable_cause(text)
    if cause:
        print("Probable cause of failure:\n")
        print(cause)
        # source-span provenance for log4j-structured causes — the
        # reference's _describe_source 'lines M-N of <path>' shape
        # (mrjob/logs/errors.py:197-210)
        got = hadoop_cause_with_span(text)
        if got and got[0] == cause:
            _, start, n = got
            span = (
                f"line {start + 1}" if n == 1
                else f"lines {start + 1}-{start + n}"
            )
            print(f"\n(from {span} of {src})")
        return 0
    print("no probable cause found in the given log", file=sys.stderr)
    return 1


def main(argv: list | None = None) -> int:
    args = list(sys.argv if argv is None else argv)
    if not args[1:] or args[1] in ("-h", "--help"):
        return _usage()
    if args[1] not in _COMMANDS:
        return _usage(f"{args[1]!r} is not a command")
    _, fn = _COMMANDS[args[1]]
    return fn(args[2:])


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
