"""``mrjob spark-submit`` tool (reference ``mrjob/tools/spark_submit.py``)
and the :class:`SparkJarStep` step type it introduces.

The launch seam is exercised end-to-end against a FAKE ``spark-submit``
binary on PATH that records its argv + environment — the real
spark-submit cold start is already priced once in the registry
(``x6_spark_script``); these tests pin the *contract*: switch
forwarding order, target classification, cmdenv/setup/dirs extras, conf
layering, and the inline-runner route through a one-step X6 job."""

import os
import stat
import subprocess
import sys
import tarfile

import pytest

from mrjob_spark.spark_submit import (
    SubmitPlan,
    UsageError,
    main,
    parse_spark_submit_args,
)


def _parse(*args):
    return parse_spark_submit_args(["--no-conf", *args])


# ---------------------------------------------------------------------
# parsing + rendering (pure)
# ---------------------------------------------------------------------


def test_script_target_defaults():
    plan = _parse("app.py", "arg1", "arg2")
    assert plan.runner == "spark"
    assert plan.target == "app.py"
    assert not plan.is_jar
    assert plan.app_args == ["arg1", "arg2"]
    assert plan.master == "local[*]" or plan.master.startswith("local")


def test_passthru_switches_keep_command_line_order():
    plan = _parse(
        "--executor-memory", "2G", "--name", "myapp", "--supervise",
        "--num-executors", "4", "app.py",
    )
    assert plan.spark_args == [
        "--executor-memory", "2G", "--name", "myapp", "--supervise",
        "--num-executors", "4",
    ]
    argv = plan.submit_argv(submit_bin="spark-submit")
    # order preserved, target last-but-app-args
    em = argv.index("--executor-memory")
    nm = argv.index("--name")
    sup = argv.index("--supervise")
    assert em < nm < sup < argv.index("app.py")


def test_jar_target_gets_class():
    plan = _parse("--class", "com.yelp.Main", "app.jar", "in", "out")
    assert plan.is_jar
    argv = plan.submit_argv(submit_bin="spark-submit")
    i = argv.index("--class")
    assert argv[i + 1] == "com.yelp.Main"
    assert argv[i + 2] == "app.jar"
    assert argv[-2:] == ["in", "out"]


def test_app_switches_after_target_not_interpreted():
    # switches AFTER the script belong to the app, not the tool
    plan = _parse("app.py", "--name", "appflag")
    assert plan.app_args == ["--name", "appflag"]
    assert plan.spark_args == []


def test_non_jar_or_py_target_rejected():
    with pytest.raises(UsageError):
        _parse("app.sh")


def test_class_on_script_rejected():
    with pytest.raises(UsageError):
        _parse("--class", "Main", "app.py")


def test_unknown_switch_rejected():
    with pytest.raises(UsageError):
        _parse("--bogus", "app.py")


def test_runner_masters():
    assert _parse("-r", "local", "--master", "spark://h:7077",
                  "app.py").master == "local[*]"  # local pins local
    assert _parse("-r", "hadoop", "app.py").master == "yarn"
    assert _parse("--master", "spark://h:7077", "app.py").master == \
        "spark://h:7077"


def test_cmdenv_becomes_executor_env_conf():
    plan = _parse("--cmdenv", "TZ=UTC", "app.py")
    argv = plan.submit_argv(submit_bin="spark-submit")
    assert "spark.executorEnv.TZ=UTC" in argv
    # non-yarn master: no AM env conf
    assert not any("appMasterEnv" in a for a in argv)
    assert plan.child_env()["TZ"] == "UTC"


def test_cmdenv_on_yarn_also_sets_app_master_env():
    plan = _parse("-r", "hadoop", "--cmdenv", "TZ=UTC", "app.py")
    argv = plan.submit_argv(submit_bin="spark-submit")
    assert "spark.executorEnv.TZ=UTC" in argv
    assert "spark.yarn.appMasterEnv.TZ=UTC" in argv


def test_conf_switch_becomes_conf_pairs():
    plan = _parse("--conf", "spark.sql.shuffle.partitions=7", "app.py")
    argv = plan.submit_argv(submit_bin="spark-submit")
    i = argv.index("--conf")
    assert argv[i + 1] == "spark.sql.shuffle.partitions=7"


def test_dirs_are_tarred_into_archives(tmp_path):
    d = tmp_path / "assets"
    d.mkdir()
    (d / "model.txt").write_text("weights")
    plan = _parse("--dirs", str(d), "app.py")
    assert len(plan.archives) == 1
    tar_path, _, alias = plan.archives[0].partition("#")
    assert alias == "assets"
    with tarfile.open(tar_path) as tf:
        names = tf.getnames()
    assert any(n.endswith("model.txt") for n in names)


def test_setup_wraps_in_same_shell():
    plan = _parse("--setup", "export FOO=1", "app.py")
    cmd = plan.shell_command(submit_bin="spark-submit")
    assert cmd[:2] == ["/bin/sh", "-c"]
    assert "export FOO=1; exec spark-submit" in cmd[2]


def test_conf_file_layering(tmp_path):
    conf = tmp_path / "mrjob.conf"
    conf.write_text(
        "runners:\n"
        "  spark:\n"
        "    cmdenv:\n"
        "      TZ: UTC\n"
        "      PYTHONPATH: /opt/libs\n"
        "    setup:\n"
        "      - echo hi\n"
        "    jobconf:\n"
        "      spark.x: conf\n"
    )
    plan = parse_spark_submit_args(
        ["-c", str(conf), "--cmdenv", "PYTHONPATH=/my/libs",
         "--conf", "spark.x=cli", "app.py"]
    )
    # CLI *PATH cmdenv PREPENDS to the conf value (combine_envs)
    assert plan.cmdenv["PYTHONPATH"] == "/my/libs:/opt/libs"
    assert plan.cmdenv["TZ"] == "UTC"
    assert plan.setup == ["echo hi"]
    assert plan.jobconf["spark.x"] == "cli"  # CLI wins


def test_build_step_types():
    from mrjob_spark.dataflow.step import SparkJarStep, SparkScriptStep

    s = _parse("app.py", "a").build_step()
    assert isinstance(s, SparkScriptStep) and s.args == ["a"]
    j = _parse("--class", "M", "app.jar").build_step()
    assert isinstance(j, SparkJarStep) and j.main_class == "M"
    assert j.submit_target() == ["--class", "M", "app.jar"]
    d = j.description(2)
    assert d["type"] == "spark_jar" and d["step_num"] == 2


def test_help_plan_and_exit():
    plan = parse_spark_submit_args(["--no-conf", "--help"])
    assert plan.target == ""
    assert main(["--no-conf", "--help"]) == 0
    assert main(["--no-conf"]) == 0   # no target → help, rc 0
    assert main(["--no-conf", "--bogus", "x.py"]) == 2


# ---------------------------------------------------------------------
# launch seam: fake spark-submit binary on PATH
# ---------------------------------------------------------------------


@pytest.fixture
def fake_submit(tmp_path, monkeypatch):
    """A spark-submit that records argv (one per line) + selected env."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    record = tmp_path / "record.txt"
    exe = bindir / "spark-submit"
    exe.write_text(
        "#!/bin/sh\n"
        f'printf "%s\\n" "$@" > {record}\n'
        f'echo "env FOO=$FOO" >> {record}\n'
        f'echo "env TZ=$TZ" >> {record}\n'
        'echo "fake submit ran"\n'
    )
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return record


def test_main_spark_runner_launches(fake_submit, tmp_path, capfd):
    app = tmp_path / "app.py"
    app.write_text("print('hi')")
    rc = main(["--no-conf", "--name", "demo", "--cmdenv", "TZ=UTC",
               str(app), "argA"])
    assert rc == 0
    lines = fake_submit.read_text().splitlines()
    assert "--name" in lines and "demo" in lines
    assert lines.index("--name") + 1 == lines.index("demo")
    assert str(app) in lines and "argA" in lines
    assert "env TZ=UTC" in lines          # cmdenv reached the child env
    out = capfd.readouterr().out
    assert "fake submit ran" in out       # stdio inherited


def test_main_setup_runs_in_launch_shell(fake_submit, tmp_path):
    app = tmp_path / "app.py"
    app.write_text("")
    rc = main(["--no-conf", "--setup", "export FOO=fromsetup", str(app)])
    assert rc == 0
    assert "env FOO=fromsetup" in fake_submit.read_text().splitlines()


def test_main_propagates_child_rc(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "spark-submit"
    exe.write_text("#!/bin/sh\nexit 3\n")
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    app = tmp_path / "app.py"
    app.write_text("")
    assert main(["--no-conf", str(app)]) == 3


def test_inline_route_runs_one_step_job(fake_submit, tmp_path, capfd):
    app = tmp_path / "app.py"
    app.write_text("")
    rc = main(["--no-conf", "-r", "inline", "--executor-memory", "1G",
               str(app), "argZ"])
    assert rc == 0
    lines = fake_submit.read_text().splitlines()
    assert "--executor-memory" in lines and "1G" in lines
    assert "argZ" in lines
    # the inline route pins the plan's master into step spark_args
    assert "--master" in lines
    # captured child stdout is echoed after the run
    assert "fake submit ran" in capfd.readouterr().out


def test_inline_route_jar_with_class(fake_submit, tmp_path):
    jar = tmp_path / "app.jar"
    jar.write_bytes(b"PK")
    rc = main(["--no-conf", "-r", "inline", "--class", "com.x.Main",
               str(jar), "a1"])
    assert rc == 0
    lines = fake_submit.read_text().splitlines()
    i = lines.index("--class")
    assert lines[i + 1] == "com.x.Main"
    assert lines[i + 2] == str(jar)
    assert "a1" in lines


def test_umbrella_dispatch(fake_submit, tmp_path):
    """python -m mrjob_spark spark-submit <app.py> works end-to-end."""
    app = tmp_path / "app.py"
    app.write_text("")
    proc = subprocess.run(
        [sys.executable, "-m", "mrjob_spark", "spark-submit", "--no-conf",
         "--name", "viaumbrella", str(app)],
        capture_output=True, text=True,
        env={**os.environ, "PATH": os.environ["PATH"]},
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr
    assert "viaumbrella" in fake_submit.read_text()


# ---------------------------------------------------------------------
# SparkJarStep inside a streaming chain (the X6 jar-app form)
# ---------------------------------------------------------------------


def test_spark_jar_step_in_chain_inline(tmp_path, monkeypatch):
    """A SparkJarStep mid-chain gets INPUT/OUTPUT interpolation and its
    output decoded on the INTERNAL wire — same contract as
    SparkScriptStep, proven against a fake spark-submit that uppercases
    the value column."""
    import json

    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "spark-submit"
    # the fake app: read every file under INPUT (arg after the jar),
    # uppercase JSON values, write OUTPUT/part-00000
    exe.write_text(
        "#!/bin/sh\n"
        "# last two args are INPUT OUTPUT (after --master M --class C jar)\n"
        'eval "IN=\\${$(($#-1))}"; eval "OUT=\\${$#}"\n'
        'mkdir -p "$OUT"\n'
        'cat "$IN"/* | tr a-z A-Z > "$OUT/part-00000"\n'
    )
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.step import (
        INPUT,
        OUTPUT,
        MRStep,
        SparkJarStep,
    )

    class MRJarChain(SparkMRJob):
        def steps(self):
            return [
                MRStep(mapper=self.m),
                SparkJarStep(jar="fake.jar", main_class="X",
                             args=[INPUT, OUTPUT]),
            ]

        def m(self, key, value):
            yield "k", value

    src = tmp_path / "in.txt"
    src.write_text("abc\n")
    with MRJarChain().make_inline_runner(
        input_paths=[str(src)]
    ) as runner:
        runner.run()
        got = list(runner.cat_output())
    # INTERNAL JSON, uppercased by the "jar": ["K", "ABC"]
    assert got == [("K", "ABC")], got
    assert json  # silence lint


def test_free_form_app_skips_io_materialization(tmp_path, monkeypatch):
    """No INPUT/OUTPUT sentinels (the spark-submit tool's shape): the
    runner must not try to read an output dir the app never wrote."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    exe = bindir / "spark-submit"
    exe.write_text("#!/bin/sh\necho ok\n")
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.step import SparkScriptStep

    class MRFreeForm(SparkMRJob):
        def steps(self):
            return [SparkScriptStep(script="app.py", args=["x"])]

    with MRFreeForm().make_inline_runner(
        input_paths=[os.devnull]
    ) as runner:
        runner.run()
        assert list(runner.cat_output()) == []
        assert "ok" in runner.spark_submit_stdout


def test_submit_plan_is_picklable_shape():
    # the plan is a plain dataclass — cheap to embed in job descriptions
    plan = _parse("app.py")
    assert isinstance(plan, SubmitPlan)
    d = plan.build_step().description(0)
    assert d["type"] == "spark_script"


def test_emr_route_submits_command_runner_step(
    fake_submit, tmp_path, monkeypatch, capsys,
):
    """-r emr: the tool runs the app as an EMR step (command-runner
    spark-submit). The mock cluster executes it through the PATH
    spark-submit with --master rewritten local and s3:// operands
    mapped into the on-disk store."""
    monkeypatch.setenv("MOCK_EMR_BASE_DIR", str(tmp_path / "emr"))
    app = tmp_path / "app.py"
    app.write_text("print('hi')")
    rc = main(["--no-conf", "-r", "emr", "--name", "viaemr",
               str(app), "argQ"])
    assert rc == 0
    lines = fake_submit.read_text().splitlines()
    i = lines.index("--master")
    assert lines[i + 1] == "local[2]"          # rewritten by the mock
    assert "--deploy-mode" not in lines        # dropped locally
    assert "viaemr" in lines and "argQ" in lines
    # the app path the child saw is the S3 object mapped into the
    # on-disk store (the runner's cleanup removes it after the run)
    mapped = [ln for ln in lines if ln.endswith("app.py")]
    assert mapped and str(tmp_path / "emr") in mapped[0]
    assert "/s3/" in mapped[0]
    err = capsys.readouterr().err
    assert "on cluster j-" in err
