"""``mrjob spark-submit`` — a drop-in :command:`spark-submit` front-end
that adds mrjob's conveniences (reference ``mrjob/tools/spark_submit.py``).

Usage::

    python -m mrjob_spark spark-submit [-r <runner>] [options] \\
        <python file | app jar> [app arguments]

Same contract as the reference tool:

* every standard spark-submit switch is accepted and forwarded **in its
  original command-line order**;
* the positional target is classified by suffix — ``.jar`` becomes a
  :class:`~mrjob_spark.dataflow.step.SparkJarStep` (with ``--class``),
  ``.py``/``.pyc``… a :class:`~mrjob_spark.dataflow.step.SparkScriptStep`,
  anything else is an error (``mrjob/tools/spark_submit.py:437-456``);
* mrjob extras the stock launcher lacks: ``--cmdenv`` (exported into the
  driver environment AND as ``spark.executorEnv.*`` / — on YARN —
  ``spark.yarn.appMasterEnv.*`` confs, the reference's
  ``mrjob/bin.py:925-928`` move), ``--setup`` (shell lines run in the
  launch shell before exec'ing spark-submit; on ``local[*]`` masters the
  executors share the driver host, so driver-side setup IS task setup),
  ``--dirs`` (each directory tarred and appended to ``--archives`` under
  its basename), and mrjob.conf layering (``-c``/``--no-conf``; the
  ``runners: <alias>`` section contributes cmdenv/setup/uploads/jobconf/
  spark_master under everything explicit).

Runner aliases (the reference's set minus the cloud, SURVEY §1.4):

* ``spark`` (default) — render and exec spark-submit; master defaults to
  ``$SPARK_GRAFT_MASTER`` / conf ``spark_master`` / ``local[*]``.
* ``local`` — same, but the master is pinned to ``local[*]`` (the
  reference's local runner hard-codes a local master too).
* ``hadoop`` — master defaults to ``yarn``.
* ``inline`` — routes through :class:`InlineJobRunner` with a one-step
  job, so the app launches exactly like an ``X6`` step inside a job
  (this engine's addition; the reference has no inline spark-submit).
"""

from __future__ import annotations

import os
import sys
import tarfile
import tempfile
from dataclasses import dataclass, field

#: spark-submit switches forwarded verbatim, in command-line order.
#: value = number of operands (0 = boolean flag).
_PASSTHRU_SWITCHES = {
    "--name": 1,
    "--jars": 1,
    "--packages": 1,
    "--exclude-packages": 1,
    "--repositories": 1,
    "--py-files": 1,
    "--properties-file": 1,
    "--driver-memory": 1,
    "--driver-java-options": 1,
    "--driver-library-path": 1,
    "--driver-class-path": 1,
    "--executor-memory": 1,
    "--proxy-user": 1,
    "--driver-cores": 1,
    "--supervise": 0,
    "--total-executor-cores": 1,
    "--executor-cores": 1,
    "--queue": 1,
    "--num-executors": 1,
    "--principal": 1,
    "--keytab": 1,
    "--deploy-mode": 1,
}

#: switches the tool interprets itself (not forwarded blindly)
_TOOL_SWITCHES = {
    "-r": 1, "--runner": 1,
    "--class": 1,
    "--master": 1,
    "--conf": 1,
    "--cmdenv": 1,
    "--setup": 1,
    "--files": 1,
    "--archives": 1,
    "--dirs": 1,
    "-c": 1, "--conf-path": 1,
    "--no-conf": 0,
    "-q": 0, "--quiet": 0,
    "-v": 0, "--verbose": 0,
    "-h": 0, "--help": 0,
    "--deprecated": 0,
}

_RUNNERS = ("spark", "inline", "local", "hadoop", "emr")
_DEFAULT_RUNNER = "spark"

_USAGE = (
    "usage: python -m mrjob_spark spark-submit [-r <runner>] [options]"
    " <python file | app jar> [app arguments]"
)


class UsageError(ValueError):
    pass


@dataclass
class SubmitPlan:
    """Everything needed to launch (or assert about) one submission."""

    runner: str
    target: str                 # script or jar path
    main_class: str | None
    app_args: list
    spark_args: list            # passthru switches, original order
    master: str
    jobconf: dict               # --conf + conf-file jobconf
    cmdenv: dict
    setup: list
    files: list
    archives: list              # includes tarred --dirs entries
    py_files: list = field(default_factory=list)
    quiet: bool = False
    verbose: bool = False

    @property
    def is_jar(self) -> bool:
        return self.target.lower().endswith(".jar")

    def submit_argv(self, submit_bin: str | None = None) -> list:
        """The full spark-submit argv this plan renders to."""
        import shutil

        submit = submit_bin or shutil.which("spark-submit") or os.path.join(
            os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
        )
        argv = [submit, "--master", self.master]
        argv += [str(a) for a in self.spark_args]
        if self.files:
            argv += ["--files", ",".join(self.files)]
        if self.archives:
            argv += ["--archives", ",".join(self.archives)]
        if self.py_files:
            argv += ["--py-files", ",".join(self.py_files)]
        for k in sorted(self.jobconf):
            argv += ["--conf", f"{k}={self.jobconf[k]}"]
        # cmdenv reaches executors as executorEnv confs (and the YARN AM
        # when the master is yarn) — mrjob/bin.py:925-928
        for k in sorted(self.cmdenv):
            argv += ["--conf", f"spark.executorEnv.{k}={self.cmdenv[k]}"]
            if self.master.split("[")[0] == "yarn":
                argv += [
                    "--conf", f"spark.yarn.appMasterEnv.{k}={self.cmdenv[k]}"
                ]
        if self.is_jar and self.main_class:
            argv += ["--class", self.main_class]
        argv += [self.target] + [str(a) for a in self.app_args]
        return argv

    def child_env(self) -> dict:
        env = dict(os.environ)
        env.update({str(k): str(v) for k, v in self.cmdenv.items()})
        return env

    def shell_command(self, submit_bin: str | None = None) -> list:
        """The command actually exec'd: a plain argv, or — with setup
        lines — an ``sh -c`` wrapper running them in the SAME shell first
        (the repo-wide setup contract)."""
        import shlex

        argv = self.submit_argv(submit_bin)
        if not self.setup:
            return argv
        script = "; ".join(self.setup) + "; exec " + " ".join(
            shlex.quote(a) for a in argv
        )
        return ["/bin/sh", "-c", script]

    def build_step(self, include_master: bool = True):
        """The X6 step this submission is equivalent to (used by the
        inline and EMR routes and available for embedding into larger
        jobs). ``include_master=False`` leaves the master to the target
        runner (EMR hard-codes ``yarn``/``cluster`` itself)."""
        from mrjob_spark.dataflow.step import SparkJarStep, SparkScriptStep

        spark_args = (
            ["--master", self.master] if include_master else []
        ) + [str(a) for a in self.spark_args]
        if self.files:
            spark_args += ["--files", ",".join(self.files)]
        if self.archives:
            spark_args += ["--archives", ",".join(self.archives)]
        if self.py_files:
            spark_args += ["--py-files", ",".join(self.py_files)]
        for k in sorted(self.cmdenv):
            spark_args += [
                "--conf", f"spark.executorEnv.{k}={self.cmdenv[k]}"
            ]
        if self.is_jar:
            return SparkJarStep(
                jar=self.target, main_class=self.main_class,
                args=list(self.app_args), jobconf=dict(self.jobconf),
                spark_args=spark_args,
            )
        return SparkScriptStep(
            script=self.target, args=list(self.app_args),
            jobconf=dict(self.jobconf), spark_args=spark_args,
        )


def _kv(item: str, switch: str) -> tuple:
    key, sep, value = item.partition("=")
    if not sep or not key:
        raise UsageError(f"{switch} wants NAME=VALUE, got {item!r}")
    return key, value


def _csv(value: str) -> list:
    return [p for p in value.split(",") if p]


def _tar_dir(path: str) -> str:
    """Tar a --dirs entry so it ships like an archive aliased to its
    basename (the runner DIRS contract, mrjob/job.py:1448-1464)."""
    base = os.path.basename(os.path.normpath(path))
    out = os.path.join(
        tempfile.mkdtemp(prefix="mrjob_spark_submit_dir_"), base + ".tar.gz"
    )
    with tarfile.open(out, "w:gz") as tf:
        tf.add(path, arcname=".")
    return f"{out}#{base}"


def parse_spark_submit_args(cl_args: list) -> SubmitPlan:
    """Pure parser+renderer: argv (after the ``spark-submit`` subcommand
    word) → :class:`SubmitPlan`. Raises :class:`UsageError` on bad usage;
    a plan with ``target=''`` means "print help"."""
    i = 0
    runner = None
    main_class = None
    master = None
    conf_paths: list | None = None
    no_conf = False
    quiet = verbose = want_help = False
    spark_args: list = []
    cli_jobconf: dict = {}
    cli_cmdenv: dict = {}
    cli_setup: list = []
    cli_files: list = []
    cli_archives: list = []
    cli_dirs: list = []
    py_files: list = []
    target = None
    app_args: list = []

    def operand(switch):
        nonlocal i
        i += 1
        if i >= len(cl_args):
            raise UsageError(f"{switch} needs an argument")
        return cl_args[i]

    while i < len(cl_args):
        arg = cl_args[i]
        if target is not None:
            app_args.append(arg)
        elif arg in ("-r", "--runner"):
            runner = operand(arg)
            if runner not in _RUNNERS:
                raise UsageError(
                    f"unknown runner {runner!r} (choose from"
                    f" {', '.join(_RUNNERS)})"
                )
        elif arg == "--class":
            main_class = operand(arg)
        elif arg == "--master":
            master = operand(arg)
        elif arg == "--conf":
            cli_jobconf.__setitem__(*_kv(operand(arg), "--conf"))
        elif arg == "--cmdenv":
            cli_cmdenv.__setitem__(*_kv(operand(arg), "--cmdenv"))
        elif arg == "--setup":
            cli_setup.append(operand(arg))
        elif arg == "--files":
            cli_files += _csv(operand(arg))
        elif arg == "--archives":
            cli_archives += _csv(operand(arg))
        elif arg == "--dirs":
            cli_dirs += _csv(operand(arg))
        elif arg == "--py-files":
            py_files += _csv(operand(arg))
        elif arg in ("-c", "--conf-path"):
            conf_paths = (conf_paths or []) + [operand(arg)]
        elif arg == "--no-conf":
            no_conf = True
        elif arg in ("-q", "--quiet"):
            quiet = True
        elif arg in ("-v", "--verbose"):
            verbose = True
        elif arg in ("-h", "--help"):
            want_help = True
        elif arg == "--deprecated":
            pass
        elif arg in _PASSTHRU_SWITCHES:
            spark_args.append(arg)
            for _ in range(_PASSTHRU_SWITCHES[arg]):
                spark_args.append(operand(arg))
        elif arg.startswith("-") and arg != "-":
            raise UsageError(f"unknown switch {arg!r}\n{_USAGE}")
        else:
            target = arg
        i += 1

    runner = runner or _DEFAULT_RUNNER
    if want_help or target is None:
        return SubmitPlan(
            runner=runner, target="", main_class=None, app_args=[],
            spark_args=[], master="", jobconf={}, cmdenv={}, setup=[],
            files=[], archives=[],
        )

    suffix = target.lower().rsplit(".", 1)[-1]
    if not (target.lower().endswith(".jar") or suffix.startswith("py")):
        raise UsageError(
            f"{target} appears not to be a JAR or Python script"
        )
    if main_class and not target.lower().endswith(".jar"):
        raise UsageError("--class only makes sense with a JAR target")

    # mrjob.conf sits UNDER everything explicit (same layering as
    # _build_runner, dataflow/job.py)
    from mrjob_spark.dataflow.conf import (
        combine_envs,
        combine_jobconfs,
        load_runner_opts,
    )

    conf = {} if no_conf else load_runner_opts(runner, conf_paths=conf_paths)
    jobconf = combine_jobconfs(conf.get("jobconf"), cli_jobconf)
    cmdenv = combine_envs(conf.get("cmdenv"), cli_cmdenv)
    setup = list(conf.get("setup") or []) + cli_setup
    files = list(
        conf.get("upload_files") or conf.get("files") or []
    ) + cli_files
    archives = list(
        conf.get("upload_archives") or conf.get("archives") or []
    ) + cli_archives
    dirs = list(conf.get("upload_dirs") or conf.get("dirs") or []) + cli_dirs
    archives += [_tar_dir(d) for d in dirs]

    if runner == "local":
        master = "local[*]"        # local runner pins a local master
    elif master is None:
        if runner == "hadoop":
            master = "yarn"
        else:
            master = (
                os.environ.get("SPARK_GRAFT_MASTER")
                or conf.get("spark_master")
                or "local[*]"
            )

    return SubmitPlan(
        runner=runner, target=target, main_class=main_class,
        app_args=app_args, spark_args=spark_args, master=master,
        jobconf=jobconf, cmdenv=cmdenv, setup=setup, files=files,
        archives=archives, py_files=py_files, quiet=quiet, verbose=verbose,
    )


def _print_help() -> None:
    groups = [
        ("all runners", [
            ("-r, --runner {spark,inline,local,hadoop}",
             f'where to run (default: "{_DEFAULT_RUNNER}")'),
            ("--class MAIN_CLASS", "main class (Java/Scala apps)"),
            ("--cmdenv NAME=VALUE",
             "env var for the driver + every executor (repeatable)"),
            ("--setup CMD",
             "shell line run in the launch shell before spark-submit"
             " (repeatable)"),
            ("--dirs D1,D2", "directories tarred + shipped like archives"),
            ("--conf PROP=VALUE", "Spark configuration property"),
            ("-c, --conf-path PATH", "alternate mrjob.conf (repeatable)"),
            ("--no-conf", "skip mrjob.conf files"),
            ("-q / -v", "quiet / verbose"),
            ("-h, --help", "show this message and exit"),
        ]),
        ("forwarded to spark-submit (original order kept)", [
            (sw + (" X" if n else ""), "") for sw, n in sorted(
                _PASSTHRU_SWITCHES.items()
            )
        ]),
        ("spark and hadoop runners", [
            ("--master URL",
             "spark master (default: local[*] on spark/local, yarn on"
             " hadoop)"),
        ]),
    ]
    print(_USAGE + "\n")
    for title, rows in groups:
        print(f"{title}:")
        for flag, helptext in rows:
            print(f"  {flag:44s} {helptext}".rstrip())
        print()


def main(cl_args: list | None = None) -> int:
    """CLI entry: parse, then launch via the chosen runner."""
    import subprocess

    try:
        plan = parse_spark_submit_args(
            list(sys.argv[1:] if cl_args is None else cl_args)
        )
    except UsageError as e:
        print(str(e), file=sys.stderr)
        return 2
    if not plan.target:
        _print_help()
        return 0

    if plan.runner == "emr":
        # submit as an EMR step: command-runner.jar spark-submit with
        # the EMR-hard-coded yarn/cluster mode (the reference's
        # spark-submit -r emr path); clients come from
        # $MOCK_EMR_BASE_DIR or boto3 (same dual path as -r emr jobs)
        from mrjob_spark.dataflow.emr import EMRJobRunner
        from mrjob_spark.dataflow.job import SparkMRJob
        from mrjob_spark.emr_tools import _clients

        step = plan.build_step(include_master=False)

        class _SubmitJob(SparkMRJob):
            def steps(self):
                return [step]

        emr_client, s3_client, _now = _clients()
        runner = EMRJobRunner(
            _SubmitJob(), input_paths=[os.devnull],
            emr_client=emr_client, s3_client=s3_client,
            cmdenv=plan.cmdenv, setup=plan.setup,
            check_cluster_every=(
                0.001 if os.environ.get("MOCK_EMR_BASE_DIR") else 30.0
            ),
        )
        try:
            with runner:
                runner.run()
                if not plan.quiet:
                    print(
                        "ran %s as step %s on cluster %s" % (
                            plan.target, runner._step_ids[-1],
                            runner.get_cluster_id(),
                        ),
                        file=sys.stderr,
                    )
            return 0
        except RuntimeError as e:
            print(str(e), file=sys.stderr)
            return 1

    if plan.runner == "inline":
        # route through the inline runner as a one-step X6 job: same
        # launch path an embedded SparkScriptStep/SparkJarStep takes
        from mrjob_spark.dataflow.inline import InlineJobRunner
        from mrjob_spark.dataflow.job import SparkMRJob

        step = plan.build_step()

        class _SubmitJob(SparkMRJob):
            def steps(self):
                return [step]

        runner = InlineJobRunner(
            _SubmitJob(), input_paths=[os.devnull], cmdenv=plan.cmdenv,
            setup=plan.setup,
        )
        try:
            with runner:
                runner.run()
                if not plan.quiet and getattr(
                    runner, "spark_submit_stdout", ""
                ):
                    sys.stdout.write(runner.spark_submit_stdout)
                if plan.verbose and getattr(
                    runner, "spark_submit_stderr", ""
                ):
                    sys.stderr.write(runner.spark_submit_stderr)
            return 0
        except RuntimeError as e:
            print(str(e), file=sys.stderr)
            return 1

    cmd = plan.shell_command()
    if plan.verbose:
        print("+ " + " ".join(cmd), file=sys.stderr)
    proc = subprocess.run(cmd, env=plan.child_env())
    return proc.returncode
