"""mrjob.conf config-file parity (dataflow/conf.py vs mrjob/conf.py).

Unit tests pin the combiner semantics (include precedence, dict/list/env
combination, the ``!clear`` tag); the end-to-end tests drive a job through
``execute()`` with ``-c`` and assert the conf's ``cmdenv``/``jobconf``
actually reach a shell substep — under the inline runner AND the Spark
runner (the ``rdd.pipe`` path), which must behave identically.
"""

from __future__ import annotations

import os

from mrjob_spark.dataflow.conf import (
    combine_envs,
    combine_jobconfs,
    combine_lists,
    combine_opts,
    combine_values,
    find_mrjob_conf,
    load_runner_opts,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


# ---------------------------------------------------------------------------
# combiners
# ---------------------------------------------------------------------------


def test_combine_values_last_non_none_wins():
    assert combine_values(1, None, 3) == 3
    assert combine_values(None, None) is None
    assert combine_values(False, None) is False


def test_combine_lists_concats_and_wraps_scalars():
    assert combine_lists([1, 2], None, 3, [4]) == [1, 2, 3, 4]
    assert combine_lists("ab", ["cd"]) == ["ab", "cd"]


def test_combine_jobconfs_java_strings_and_none_blanks():
    out = combine_jobconfs(
        {"a": 1, "b": True, "c": "keep"}, {"c": None, "d": 2.5}
    )
    assert out == {"a": "1", "b": "true", "d": "2.5"}


def test_combine_envs_prepends_path_vars():
    out = combine_envs(
        {"PATH": "/usr/bin", "FOO": "base"},
        {"PATH": "/opt/bin", "FOO": "override"},
    )
    assert out == {"PATH": "/opt/bin:/usr/bin", "FOO": "override"}


def test_combine_opts_routes_by_option_name():
    out = combine_opts(
        {"jobconf": {"x": 1}, "setup": ["a"], "num_reducers": 4},
        {"jobconf": {"y": 2}, "setup": ["b"], "num_reducers": 8},
    )
    assert out["jobconf"] == {"x": "1", "y": "2"}
    assert out["setup"] == ["a", "b"]
    assert out["num_reducers"] == 8


# ---------------------------------------------------------------------------
# discovery + include chain
# ---------------------------------------------------------------------------


def test_find_mrjob_conf_honors_env_var(tmp_path, monkeypatch):
    conf = _write(tmp_path, "custom.conf", "runners: {}\n")
    monkeypatch.setenv("MRJOB_CONF", conf)
    assert find_mrjob_conf() == conf


def test_include_chain_precedence(tmp_path):
    base = _write(
        tmp_path,
        "base.conf",
        """
runners:
  spark:
    num_reducers: 4
    compression: gzip
    jobconf:
      mapreduce.map.memory.mb: "1024"
      only.in.base: "yes"
    upload_files:
      - /data/base.txt
""",
    )
    main = _write(
        tmp_path,
        "main.conf",
        f"""
include: {base}
runners:
  spark:
    num_reducers: 16
    jobconf:
      mapreduce.map.memory.mb: "4096"
    upload_files:
      - /data/main.txt
""",
    )
    opts = load_runner_opts("spark", conf_paths=[main])
    # including file wins scalars, dict-merges jobconf, concats lists
    # (base first — mrjob/conf.py:287-305)
    assert opts["num_reducers"] == 16
    assert opts["compression"] == "gzip"
    assert opts["jobconf"] == {
        "mapreduce.map.memory.mb": "4096",
        "only.in.base": "yes",
    }
    assert opts["upload_files"] == ["/data/base.txt", "/data/main.txt"]


def test_clear_tag_discards_inherited_value(tmp_path):
    base = _write(
        tmp_path,
        "base.conf",
        """
runners:
  spark:
    cmdenv:
      KEEP: base
      DROP: base
    upload_files: [/data/base.txt]
""",
    )
    main = _write(
        tmp_path,
        "main.conf",
        f"""
include: {base}
runners:
  spark:
    cmdenv:
      DROP: !clear null
    upload_files: !clear [/data/only.txt]
""",
    )
    opts = load_runner_opts("spark", conf_paths=[main])
    assert opts["cmdenv"] == {"KEEP": "base"}
    assert opts["upload_files"] == ["/data/only.txt"]


def test_missing_runner_alias_is_empty(tmp_path):
    conf = _write(tmp_path, "c.conf", "runners:\n  emr:\n    pool_clusters: true\n")
    assert load_runner_opts("spark", conf_paths=[conf]) == {}


def test_symlink_cycle_loads_once(tmp_path):
    a = tmp_path / "a.conf"
    b = tmp_path / "b.conf"
    a.write_text(
        f"include: {b}\nrunners:\n  spark:\n    upload_files: [/a]\n"
    )
    b.write_text(
        f"include: {a}\nrunners:\n  spark:\n    upload_files: [/b]\n"
    )
    opts = load_runner_opts("spark", conf_paths=[str(a)])
    # each file once: b (the include) first, a (including file) wins order
    assert opts["upload_files"] == ["/b", "/a"]


# ---------------------------------------------------------------------------
# end-to-end: conf reaches the job's substeps
# ---------------------------------------------------------------------------

_GREP_ENV_JOB = """
runners:
  {alias}:
    cmdenv:
      NEEDLE: "{needle}"
    jobconf:
      my.marker: "from-conf"
"""


class _MREnvGrep:
    """Defined lazily to avoid importing dataflow at module load."""

    def __new__(cls):
        from mrjob_spark.dataflow import RawValueProtocol, SparkMRJob

        class MREnvGrep(SparkMRJob):
            INPUT_PROTOCOL = RawValueProtocol
            INTERNAL_PROTOCOL = RawValueProtocol
            OUTPUT_PROTOCOL = RawValueProtocol

            def __init__(self):
                super().__init__()
                # $NEEDLE comes from cmdenv (conf file), expanded by the
                # sh -c wrapper both runners use
                self.mapper_cmd = 'grep -F "$NEEDLE"'

        return MREnvGrep()


def _run_cli(runner, conf_text, tmp_path, capsys, spark=None):
    conf = _write(tmp_path, "job.conf", conf_text)
    inp = _write(tmp_path, "input.txt", "alpha keep\nbeta drop\ngamma keep\n")
    job = _MREnvGrep()
    job.execute(
        args=[inp, "-r", runner, "-c", conf],
        **({"spark": spark} if spark is not None else {}),
    )
    out = capsys.readouterr().out
    return sorted(line for line in out.splitlines() if line)


def test_conf_cmdenv_reaches_inline_cmd_substep(tmp_path, capsys):
    lines = _run_cli(
        "inline", _GREP_ENV_JOB.format(alias="inline", needle="keep"),
        tmp_path, capsys,
    )
    assert lines == ["alpha keep", "gamma keep"]


def test_conf_cmdenv_reaches_spark_pipe(tmp_path, capsys, spark):
    lines = _run_cli(
        "spark", _GREP_ENV_JOB.format(alias="spark", needle="keep"),
        tmp_path, capsys, spark=spark,
    )
    assert lines == ["alpha keep", "gamma keep"]


def test_cli_cmdenv_beats_conf(tmp_path, capsys):
    conf = _write(
        tmp_path, "job.conf",
        _GREP_ENV_JOB.format(alias="inline", needle="keep"),
    )
    inp = _write(tmp_path, "input.txt", "alpha keep\nbeta drop\n")
    job = _MREnvGrep()
    job.execute(
        args=[inp, "-r", "inline", "-c", conf, "--cmdenv", "NEEDLE=drop"]
    )
    out = capsys.readouterr().out
    assert sorted(line for line in out.splitlines() if line) == ["beta drop"]


def test_no_conf_skips_config(tmp_path, capsys, monkeypatch):
    # a default conf that would break the job if loaded
    conf = _write(
        tmp_path, "default.conf",
        _GREP_ENV_JOB.format(alias="inline", needle="nothing-matches"),
    )
    monkeypatch.setenv("MRJOB_CONF", conf)
    monkeypatch.setenv("NEEDLE", "keep")  # from ambient env instead
    inp = _write(tmp_path, "input.txt", "alpha keep\nbeta drop\n")
    job = _MREnvGrep()
    job.execute(args=[inp, "-r", "inline", "--no-conf"])
    out = capsys.readouterr().out
    assert sorted(line for line in out.splitlines() if line) == ["alpha keep"]


def test_conf_jobconf_reaches_task_env(tmp_path):
    # jobconf keys surface to substeps as dotted->underscored env vars
    from mrjob_spark.dataflow import RawValueProtocol, SparkMRJob

    class MREnvEcho(SparkMRJob):
        INPUT_PROTOCOL = RawValueProtocol
        INTERNAL_PROTOCOL = RawValueProtocol
        OUTPUT_PROTOCOL = RawValueProtocol

        def __init__(self):
            super().__init__()
            self.mapper_cmd = 'sed "s/^/$my_marker /"'

    conf = _write(
        tmp_path, "job.conf",
        'runners:\n  inline:\n    jobconf:\n      my.marker: "tagged"\n',
    )
    inp = _write(tmp_path, "input.txt", "line\n")
    job = MREnvEcho()
    runner = job.execute(args=[inp, "-r", "inline", "-c", conf, "-o",
                               str(tmp_path / "out"), "--no-cat-output"])
    got = [v for _, v in runner.cat_output()]
    assert got == ["tagged line"]


def test_setup_lines_precede_cmd_in_same_shell(tmp_path, capsys):
    # an `export` from a conf setup line must be visible to the command —
    # same-shell semantics (the reference's setup wrapper, bin.py:545-653)
    conf = _write(
        tmp_path, "job.conf",
        'runners:\n  inline:\n    setup:\n      - export NEEDLE=keep\n',
    )
    inp = _write(tmp_path, "input.txt", "alpha keep\nbeta drop\n")
    job = _MREnvGrep()
    job.execute(args=[inp, "-r", "inline", "-c", conf])
    out = capsys.readouterr().out
    assert sorted(line for line in out.splitlines() if line) == ["alpha keep"]


def test_setup_lines_on_spark_pipe(tmp_path, capsys, spark):
    inp = _write(tmp_path, "input.txt", "alpha keep\nbeta drop\n")
    job = _MREnvGrep()
    job.execute(
        args=[inp, "-r", "spark", "--no-conf", "--setup",
              "export NEEDLE=keep"],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert sorted(line for line in out.splitlines() if line) == ["alpha keep"]


def test_setup_reaches_python_substeps(tmp_path, spark):
    # the reference wraps Python tasks in the setup script too
    # (mrjob/bin.py:545-653); here that contract is the flock'd
    # once-per-node-per-run prologue: exports replay into the Python
    # worker's os.environ, side effects run exactly once per job run
    from mrjob_spark.dataflow import SparkMRJob

    marker = tmp_path / "setup_ran.log"

    class MREnvMapper(SparkMRJob):
        def mapper(self, key, value):
            yield os.environ.get("SETUP_TOKEN", "MISSING"), 1

        def reducer(self, key, values):
            yield key, sum(values)

    inp = _write(tmp_path, "input.txt", "a\nb\nc\nd\n")
    job = MREnvMapper()
    with job.make_runner(
        spark,
        input_paths=[inp],
        setup=[
            f'echo ran >> "{marker}"',
            "export SETUP_TOKEN=from-setup",
        ],
    ) as runner:
        runner.run()
        out = dict(runner.cat_output())
    assert out == {"from-setup": 4}
    # side effect ran once for this job run (flock + captured-env cache),
    # not once per task/partition
    assert marker.read_text().splitlines() == ["ran"]


def test_class_jobconf_beats_conf_file_but_not_cli(tmp_path):
    # precedence: CLI --jobconf > class JOBCONF > conf file (mrjob/conf.py);
    # a key set in both the class and the conf file must resolve to the
    # CLASS value (this used to invert)
    from mrjob_spark.dataflow import RawValueProtocol, SparkMRJob

    class MRMarked(SparkMRJob):
        INPUT_PROTOCOL = RawValueProtocol
        INTERNAL_PROTOCOL = RawValueProtocol
        OUTPUT_PROTOCOL = RawValueProtocol
        JOBCONF = {"my.marker": "classval"}

        def __init__(self):
            super().__init__()
            self.mapper_cmd = 'sed "s/^/$my_marker /"'

    conf = _write(
        tmp_path, "job.conf",
        'runners:\n  inline:\n    jobconf:\n      my.marker: "confval"\n',
    )
    inp = _write(tmp_path, "input.txt", "line\n")

    runner = MRMarked().execute(
        args=[inp, "-r", "inline", "-c", conf, "-o",
              str(tmp_path / "o1"), "--no-cat-output"])
    assert [v for _, v in runner.cat_output()] == ["classval line"]

    runner = MRMarked().execute(
        args=[inp, "-r", "inline", "-c", conf, "--jobconf",
              "my.marker=clival", "-o", str(tmp_path / "o2"),
              "--no-cat-output"])
    assert [v for _, v in runner.cat_output()] == ["clival line"]


def test_cli_path_cmdenv_prepends_to_conf_value(tmp_path):
    # *PATH cmdenv vars combine with ':' between layers (combine_envs), so
    # a CLI value PREPENDS to the conf value instead of replacing it
    from mrjob_spark.dataflow import RawValueProtocol, SparkMRJob

    class MRPathEcho(SparkMRJob):
        INPUT_PROTOCOL = RawValueProtocol
        INTERNAL_PROTOCOL = RawValueProtocol
        OUTPUT_PROTOCOL = RawValueProtocol

        def __init__(self):
            super().__init__()
            self.mapper_cmd = 'sed "s|^|$MYPATH |"'

    conf = _write(
        tmp_path, "job.conf",
        'runners:\n  inline:\n    cmdenv:\n      MYPATH: /from/conf\n',
    )
    inp = _write(tmp_path, "input.txt", "line\n")
    runner = MRPathEcho().execute(
        args=[inp, "-r", "inline", "-c", conf, "--cmdenv",
              "MYPATH=/from/cli", "-o", str(tmp_path / "out"),
              "--no-cat-output"])
    assert [v for _, v in runner.cat_output()] == ["/from/cli:/from/conf line"]


def test_repeat_runner_builds_do_not_duplicate_uploads(tmp_path):
    # building a runner twice from ONE job instance (execute() after
    # make_runner(), or two execute() calls) must not ship the same
    # FILES/file-arg entries twice — the lists are recomputed from the
    # class attributes each build
    from mrjob_spark.dataflow import RawValueProtocol, SparkMRJob

    shipped = _write(tmp_path, "lookup.txt", "x\n")

    class MRWithFile(SparkMRJob):
        INPUT_PROTOCOL = RawValueProtocol
        INTERNAL_PROTOCOL = RawValueProtocol
        OUTPUT_PROTOCOL = RawValueProtocol
        FILES = [shipped]

        def configure_args(self, parser):
            super().configure_args(parser)
            self.add_file_arg("--lookup")

        def mapper(self, key, value):
            yield key, value

    inp = _write(tmp_path, "input.txt", "line\n")
    job = MRWithFile(
        [inp, "-r", "inline", "--no-conf", "--lookup", shipped]
    )
    for _ in range(2):
        with job.make_runner() as runner:
            runner.run()
    assert job.FILES.count(shipped) == 2  # class entry + file arg, once each
    assert len(job.FILES) == 2


# ---------------------------------------------------------------------------
# differential: our combiners vs the reference's own mrjob.conf functions
# (imported from the read-only reference checkout, like compare_reference.py)
# ---------------------------------------------------------------------------

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_conf():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from mrjob import conf as ref_conf
    except ImportError:
        pytest.skip("reference mrjob not importable")
    return ref_conf


scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-99, 99), st.text(max_size=8)
)
dicts = st.dictionaries(st.text(min_size=1, max_size=6), scalars, max_size=5)
envs = st.dictionaries(
    st.sampled_from(["PATH", "PYTHONPATH", "FOO", "BAR", "X"]),
    st.text(min_size=1, max_size=8),
    max_size=4,
)
lists = st.one_of(
    st.none(),
    st.lists(st.one_of(st.integers(-9, 9), st.text(max_size=6)), max_size=4),
    st.text(max_size=6),
)


@given(st.lists(st.one_of(st.none(), dicts), max_size=4))
@settings(max_examples=200, deadline=None)
def test_combine_dicts_matches_reference(ds):
    assert combine_opts.__module__  # module imported
    from mrjob_spark.dataflow.conf import combine_dicts

    assert combine_dicts(*ds) == _ref_conf().combine_dicts(*ds)


@given(st.lists(st.one_of(st.none(), envs), max_size=4))
@settings(max_examples=200, deadline=None)
def test_combine_envs_matches_reference(es):
    from mrjob_spark.dataflow.conf import combine_envs as mine

    assert mine(*es) == _ref_conf().combine_envs(*es)


@given(st.lists(lists, max_size=4))
@settings(max_examples=200, deadline=None)
def test_combine_lists_matches_reference(ls):
    from mrjob_spark.dataflow.conf import combine_lists as mine

    assert mine(*ls) == _ref_conf().combine_lists(*ls)


@given(st.lists(scalars, max_size=4))
@settings(max_examples=200, deadline=None)
def test_combine_values_matches_reference(vs):
    from mrjob_spark.dataflow.conf import combine_values as mine

    assert mine(*vs) == _ref_conf().combine_values(*vs)
