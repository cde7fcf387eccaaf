"""``-r hadoop`` runner tests against the executing mock cluster.

Strategy (the reference's own: ``tests/mockhadoop.py`` drives its
``-r hadoop`` tests with a fake binary, ``tests/test_hadoop.py``): every
test here runs the full control plane — binary/jar discovery, ``hadoop
fs`` uploads, streaming-command rendering, ``hadoop jar`` launch, log4j
stderr interpretation, counter extraction, HDFS output cat — against
:mod:`mrjob_spark.testing.mockhadoop`, which EXECUTES the rendered task
commands with Hadoop streaming's semantics instead of playing back canned
output. Differentials assert the hadoop path agrees with the inline and
``-r local`` runners pair-for-pair and counter-for-counter, and one case
runs the REFERENCE's own HadoopJobRunner against the same mock cluster
(imported and executed, never copied) to prove the mock is a faithful
enough Hadoop that both engines produce identical job output through it.
"""

from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys

import pytest

from mrjob_spark.dataflow.examples import (
    MRFilterGrep,
    MRNextWordStats,
    MRPreFilterWords,
    MRWordCountWithCounters,
    MRWordFreqCount,
)
from mrjob_spark.dataflow.hadoop import HadoopJobRunner
from mrjob_spark.dataflow.hdfs import (
    HadoopClientFS,
    fully_qualify_hdfs_path,
)
from mrjob_spark.dataflow.job import SparkMRJob
from mrjob_spark.dataflow.step import MRStep

MOCK_BIN = [sys.executable, "-m", "mrjob_spark.testing.mockhadoop"]

LINES = [
    "one fish two fish",
    "red fish blue fish",
    "one red union two blue",
    "unusual unions u u",
]


# the shipped mock-cluster harness (mrjob_spark/testing/cluster.py) —
# registry queries stand one up too
from mrjob_spark.testing.cluster import MockHadoopCluster


@pytest.fixture()
def cluster(tmp_path):
    return MockHadoopCluster(tmp_path)


@pytest.fixture()
def input_txt(tmp_path):
    p = tmp_path / "input.txt"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def _run_hadoop(cluster, job, input_paths, **kwargs):
    with cluster.runner(job, input_paths=input_paths, **kwargs) as r:
        r.run()
        return sorted(tuple(kv) for kv in r.cat_output()), r.counters()


def _run_inline(job, input_paths):
    with job.make_inline_runner(input_paths=input_paths) as r:
        r.run()
        return sorted(tuple(kv) for kv in r.cat_output()), r.counters()


def _run_local(job, input_paths):
    with job.make_local_runner(input_paths=input_paths) as r:
        r.run()
        return sorted(tuple(kv) for kv in r.cat_output()), r.counters()


def _user_counters(counters: dict) -> dict:
    """Strip the framework groups real Hadoop adds; the sim runners only
    have user counters."""
    return {
        g: dict(names) for g, names in counters.items()
        if g not in ("Map-Reduce Framework", "Job Counters")
    }


# ---------------------------------------------------------------------------
# HDFS client against the mock fs
# ---------------------------------------------------------------------------


class TestHadoopClientFS:
    def test_put_ls_cat_rm_roundtrip(self, cluster, tmp_path):
        fs = cluster.fs()
        src = tmp_path / "hello.txt"
        src.write_bytes(b"alpha\nbeta\n")
        fs.mkdir("hdfs:///data")
        fs.put(str(src), "hdfs:///data/hello.txt")
        assert fs.exists("hdfs:///data/hello.txt")
        assert fs.ls("hdfs:///data") == ["hdfs:///data/hello.txt"]
        assert list(fs.cat_lines("hdfs:///data/hello.txt")) == [
            b"alpha", b"beta",
        ]
        assert fs.du("hdfs:///data/hello.txt") == {
            "hdfs:///data/hello.txt": 11
        }
        fs.rm("hdfs:///data")
        assert not fs.exists("hdfs:///data")

    def test_ls_missing_is_empty_not_error(self, cluster):
        assert cluster.fs().ls("hdfs:///no/such/dir") == []

    def test_version_and_yarn_gate(self, cluster):
        fs = cluster.fs()
        assert fs.get_version() == "3.3.6"
        assert fs.uses_yarn()
        env1 = dict(cluster.env, MOCK_HADOOP_VERSION="1.2.1")
        fs1 = HadoopClientFS(MOCK_BIN, env=env1)
        assert fs1.get_version() == "1.2.1"
        assert not fs1.uses_yarn()

    def test_fully_qualify(self):
        assert fully_qualify_hdfs_path("hdfs://nn:8020/x") == \
            "hdfs://nn:8020/x"
        assert fully_qualify_hdfs_path("/x/y") == "hdfs:///x/y"
        assert fully_qualify_hdfs_path("t/u", user="alice") == \
            "hdfs:///user/alice/t/u"


# ---------------------------------------------------------------------------
# end-to-end differentials vs the inline and local runners
# ---------------------------------------------------------------------------


class TestHadoopDifferential:
    def test_word_freq_three_way(self, cluster, input_txt):
        h_out, _ = _run_hadoop(cluster, MRWordFreqCount(), [input_txt])
        i_out, _ = _run_inline(MRWordFreqCount(), [input_txt])
        l_out, _ = _run_local(MRWordFreqCount(), [input_txt])
        assert h_out == i_out == l_out
        assert h_out  # non-trivial

    def test_counters_match_inline(self, cluster, input_txt):
        h_out, h_cnt = _run_hadoop(
            cluster, MRWordCountWithCounters(), [input_txt]
        )
        i_out, i_cnt = _run_inline(MRWordCountWithCounters(), [input_txt])
        assert h_out == i_out
        assert _user_counters(h_cnt) == i_cnt
        # the framework groups exist too, like real Hadoop
        assert h_cnt["Map-Reduce Framework"]["Map input records"] == \
            len(LINES)

    def test_sort_values_multi_step(self, cluster, input_txt):
        """MRNextWordStats is ONLY correct if SORT_VALUES ordering holds
        through the shuffle (the 'A: total' record must precede every
        'B: stats' record) and step chaining works — so agreement here
        pins the partitioner/jobconf translation and the two-step HDFS
        handoff."""
        h_out, _ = _run_hadoop(cluster, MRNextWordStats(), [input_txt])
        i_out, _ = _run_inline(MRNextWordStats(), [input_txt])
        assert h_out == i_out
        jar_argvs = cluster.jar_argvs()
        assert len(jar_argvs) == 2  # one hadoop jar run per step
        first = jar_argvs[0]
        assert "-partitioner" in first
        assert first[first.index("-partitioner") + 1] == (
            "org.apache.hadoop.mapred.lib.KeyFieldBasedPartitioner"
        )
        assert "-D" in first and (
            "stream.num.map.output.key.fields=2"
            in [first[i + 1] for i, a in enumerate(first) if a == "-D"]
        )

    def test_cmd_substep(self, cluster, input_txt):
        h_out, _ = _run_hadoop(cluster, MRFilterGrep("fish"), [input_txt])
        i_out, _ = _run_inline(MRFilterGrep("fish"), [input_txt])
        assert h_out == i_out
        assert all("fish" in v for _, v in h_out)
        # the cmd IS the streaming -mapper, not a re-entry wrapper
        (jar_argv,) = cluster.jar_argvs()
        assert jar_argv[jar_argv.index("-mapper") + 1] == "grep -F fish"

    def test_pre_filter(self, cluster, input_txt):
        h_out, _ = _run_hadoop(cluster, MRPreFilterWords(), [input_txt])
        i_out, _ = _run_inline(MRPreFilterWords(), [input_txt])
        assert h_out == i_out
        (jar_argv,) = cluster.jar_argvs()
        mapper = jar_argv[jar_argv.index("-mapper") + 1]
        assert mapper.startswith("/bin/sh -ex -c ")
        assert "grep -i u |" in mapper

    def test_map_only_step(self, cluster, input_txt):
        class MRShout(SparkMRJob):
            def mapper(self, key, line):
                yield None, line.upper()

        h_out, _ = _run_hadoop(cluster, MRShout(), [input_txt])
        i_out, _ = _run_inline(MRShout(), [input_txt])
        assert h_out == i_out
        (jar_argv,) = cluster.jar_argvs()
        # map-only: reducers shut off ahead of other -D args
        # (mrjob/bin.py:318-326)
        d_vals = [jar_argv[i + 1] for i, a in enumerate(jar_argv)
                  if a == "-D"]
        assert "mapreduce.job.reduces=0" in d_vals
        assert "-reducer" not in jar_argv

    def test_gz_input_and_two_input_files(self, cluster, tmp_path):
        p1 = tmp_path / "a.txt"
        p1.write_text("\n".join(LINES[:2]) + "\n")
        p2 = tmp_path / "b.txt.gz"
        p2.write_bytes(gzip.compress(("\n".join(LINES[2:]) + "\n").encode()))
        paths = [str(p1), str(p2)]
        h_out, h_cnt = _run_hadoop(cluster, MRWordFreqCount(), paths)
        i_out, _ = _run_inline(MRWordFreqCount(), paths)
        assert h_out == i_out
        # compressed input is unsplittable: one map task per file
        assert h_cnt["Job Counters"]["Launched map tasks"] == 2

    def test_num_reducers_controls_part_files(self, cluster, input_txt):
        job = MRWordFreqCount()
        with cluster.runner(
            job, input_paths=[input_txt], num_reducers=3
        ) as r:
            r.run()
            parts = [
                u for u in r.fs.ls(r.output_dir)
                if u.rsplit("/", 1)[-1].startswith("part-")
            ]
            assert len(parts) == 3
            assert sorted(r.cat_output()) == \
                _run_inline(MRWordFreqCount(), [input_txt])[0]

    def test_explicit_output_dir_survives_cleanup(self, cluster, input_txt):
        job = MRWordFreqCount()
        out_uri = "hdfs:///results/wf"
        with cluster.runner(
            job, input_paths=[input_txt], output_dir=out_uri
        ) as r:
            r.run()
        fs = cluster.fs()
        assert fs.exists("/results/wf/_SUCCESS")
        # scratch tmp dir is gone
        assert fs.ls("hdfs:///user") == [] or not any(
            "tmp/mrjob" in u for u in fs.ls("hdfs:///user/*/tmp/mrjob/*")
        )


# ---------------------------------------------------------------------------
# command construction details
# ---------------------------------------------------------------------------


class TestStreamingArgs:
    def _argv_for(self, cluster, job, input_txt, **kwargs):
        _run_hadoop(cluster, job, [input_txt], **kwargs)
        return cluster.jar_argvs()[-1]

    def test_reference_arg_order(self, cluster, input_txt):
        """The documented streaming-arg order (``mrjob/bin.py:307-352``):
        -files … [-D reduces] … -D jobconf … -cmdenv … -input … -output
        -mapper [-combiner] [-reducer]."""
        argv = self._argv_for(
            cluster, MRWordFreqCount(), input_txt,
            jobconf={"mapreduce.map.memory.mb": "2048"},
        )
        order = [argv.index(a) for a in
                 ("-files", "-D", "-cmdenv", "-input", "-output",
                  "-mapper", "-combiner", "-reducer")]
        assert order == sorted(order)
        d_vals = [argv[i + 1] for i, a in enumerate(argv) if a == "-D"]
        assert "mapreduce.map.memory.mb=2048" in d_vals
        files = argv[argv.index("-files") + 1].split(",")
        assert any(f.endswith("#job.pkl") for f in files)
        assert any(f.endswith("#mrjob_spark.zip") for f in files)

    def test_jobconf_sorted_and_cmdenv(self, cluster, input_txt):
        argv = self._argv_for(
            cluster, MRWordFreqCount(), input_txt,
            jobconf={"zz.last": "1", "aa.first": "2"},
            cmdenv={"MY_VAR": "hello"},
        )
        d_vals = [argv[i + 1] for i, a in enumerate(argv) if a == "-D"]
        assert d_vals.index("aa.first=2") < d_vals.index("zz.last=1")
        cmdenvs = [argv[i + 1] for i, a in enumerate(argv)
                   if a == "-cmdenv"]
        assert "MY_VAR=hello" in cmdenvs
        assert any(c.startswith("PYTHONPATH=") for c in cmdenvs)

    def test_user_jobconf_translates_to_cluster_dialect(
            self, cluster, input_txt):
        """A job written against Hadoop 1 (`mapred.reduce.tasks`) still
        configures a modern cluster: the user key is combined with its
        current-dialect name (the reference's translate_jobconf_dict),
        original preserved."""
        argv = self._argv_for(
            cluster, MRWordFreqCount(), input_txt,
            jobconf={"mapred.reduce.tasks": "3"},
        )
        d_vals = [argv[i + 1] for i, a in enumerate(argv) if a == "-D"]
        assert "mapred.reduce.tasks=3" in d_vals
        assert "mapreduce.job.reduces=3" in d_vals

    def test_user_jobconf_translates_down_on_pre_yarn(
            self, cluster, input_txt):
        """And the converse: a modern key gains its pre-YARN twin on a
        Hadoop 1.x cluster."""
        env = dict(cluster.env, MOCK_HADOOP_VERSION="1.2.1")
        argv = self._argv_for(
            cluster, MRWordFreqCount(), input_txt, env=env,
            jobconf={"mapreduce.map.java.opts": "-Xmx1g"},
        )
        d_vals = [argv[i + 1] for i, a in enumerate(argv) if a == "-D"]
        assert "mapreduce.map.java.opts=-Xmx1g" in d_vals
        assert "mapred.map.child.java.opts=-Xmx1g" in d_vals

    def test_pre_yarn_jobconf_translation(self, cluster, input_txt):
        """On Hadoop 1.x our emitted keys use the pre-YARN names
        (``mrjob/compat.py`` translation behavior for the keys this
        runner emits)."""
        env = dict(cluster.env, MOCK_HADOOP_VERSION="1.2.1")
        argv = self._argv_for(
            cluster, MRNextWordStats(), input_txt, env=env,
        )
        d_vals = [argv[i + 1] for i, a in enumerate(argv) if a == "-D"]
        assert any(
            v.startswith("mapred.text.key.partitioner.options=")
            for v in d_vals
        )
        assert not any(
            v.startswith("mapreduce.partition.keypartitioner.options=")
            for v in d_vals
        )

    def test_setup_lines_wrap_task_command(self, cluster, input_txt):
        argv = self._argv_for(
            cluster, MRWordFreqCount(), input_txt,
            setup=["export GREETING=hi"],
        )
        mapper = argv[argv.index("-mapper") + 1]
        assert mapper.startswith("/bin/sh -ex -c ")
        assert "export GREETING=hi; " in mapper

    def test_hadoop_extra_args_spliced(self, cluster, input_txt):
        argv = self._argv_for(
            cluster, MRWordFreqCount(), input_txt,
            jobconf={"mapreduce.map.memory.mb": "2048"},
            hadoop_extra_args=["-inputformat",
                               "org.example.MyInputFormat"],
        )
        assert "-inputformat" in argv
        # extra args come after the -D block (mrjob/bin.py:281-283)
        last_d = max(i for i, a in enumerate(argv) if a == "-D")
        assert argv.index("-inputformat") > last_d


# ---------------------------------------------------------------------------
# discovery
# ---------------------------------------------------------------------------


class TestDiscovery:
    def test_streaming_jar_search_prefers_shallow_short(
        self, cluster, tmp_path, monkeypatch
    ):
        lib = os.path.join(cluster.home, "share", "hadoop", "tools", "lib")
        deep = os.path.join(lib, "sub")
        os.makedirs(deep)
        open(os.path.join(deep, "hadoop-streaming-2.8.5-amzn-1.jar"),
             "wb").close()
        open(os.path.join(lib, "hadoop-streaming-3.3.6-sources.jar"),
             "wb").close()
        monkeypatch.setenv("HADOOP_HOME", cluster.home)
        r = HadoopJobRunner(
            MRWordFreqCount(), input_paths=["x"], hadoop_bin=MOCK_BIN,
            env=cluster.env,
        )
        assert r.get_hadoop_streaming_jar() == cluster.jar

    def test_find_hadoop_bin_via_hadoop_home(self, tmp_path, monkeypatch):
        from mrjob_spark.dataflow.hdfs import find_hadoop_bin

        bin_dir = tmp_path / "bin"
        bin_dir.mkdir()
        fake = bin_dir / "hadoop"
        fake.write_text("#!/bin/sh\nexit 0\n")
        fake.chmod(0o755)
        monkeypatch.setenv("HADOOP_HOME", str(tmp_path))
        assert find_hadoop_bin() == [str(fake)]


# ---------------------------------------------------------------------------
# failure interpretation
# ---------------------------------------------------------------------------


class MRBoom(SparkMRJob):
    def mapper(self, key, line):
        raise ValueError("BOOM: exploding mapper for failure test")
        yield  # pragma: no cover


class TestFailure:
    def test_failed_task_surfaces_probable_cause(self, cluster, input_txt):
        from mrjob_spark.dataflow.errors import explain_failure

        with cluster.runner(MRBoom(), input_paths=[input_txt]) as r:
            with pytest.raises(RuntimeError) as excinfo:
                r.run()
        msg = str(excinfo.value)
        assert "Probable cause of failure" in msg
        assert "BOOM: exploding mapper" in msg
        # the diagnose surface reads the same exception
        assert "BOOM" in explain_failure(excinfo.value)

    def test_output_exists_is_an_error(self, cluster, input_txt):
        fs = cluster.fs()
        fs.mkdir("hdfs:///taken")
        with cluster.runner(
            MRWordFreqCount(), input_paths=[input_txt],
            output_dir="hdfs:///taken",
        ) as r:
            with pytest.raises(RuntimeError):
                r.run()


# ---------------------------------------------------------------------------
# CLI entry
# ---------------------------------------------------------------------------


class TestCLI:
    def test_dash_r_hadoop(self, cluster, input_txt, monkeypatch,
                           capsysbinary):
        for k, v in cluster.env.items():
            monkeypatch.setenv(k, v)
        job = MRWordFreqCount([
            "-r", "hadoop", "--no-conf",
            "--hadoop-bin", " ".join(MOCK_BIN),
            "--hadoop-streaming-jar", str(cluster.jar),
            input_txt,
        ])
        job.execute()
        out = capsysbinary.readouterr().out
        pairs = sorted(
            tuple(json.loads(f) for f in ln.split(b"\t"))
            for ln in out.splitlines() if ln
        )
        assert pairs == _run_inline(MRWordFreqCount(), [input_txt])[0]


# ---------------------------------------------------------------------------
# the reference's own hadoop runner against the same mock cluster
# ---------------------------------------------------------------------------


REFERENCE = os.environ.get("MRJOB_REFERENCE_PATH", "/root/reference")


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "mrjob")),
    reason="reference not available",
)
class TestReferenceRunnerOnMock:
    def test_reference_hadoop_runner_agrees(self, cluster, input_txt,
                                            monkeypatch):
        """Run the REFERENCE mrjob's HadoopJobRunner against our
        executing mock cluster: its rendered streaming commands re-enter
        the reference's own script, our mock executes them, and the
        output must equal both the reference's inline run and our
        ``-r hadoop`` run of the ported job. Passing proves (a) the mock
        is a faithful-enough Hadoop for the reference to run on
        unmodified, and (b) both engines' hadoop control planes compute
        the same job."""
        for k, v in cluster.env.items():
            monkeypatch.setenv(k, v)
        script = os.path.join(
            REFERENCE, "mrjob", "examples", "mr_word_freq_count.py"
        )
        proc = subprocess.run(
            [sys.executable, script,
             "-r", "hadoop", "--no-conf",
             "--hadoop-bin", " ".join(MOCK_BIN),
             "--hadoop-streaming-jar", str(cluster.jar),
             "--python-bin", sys.executable,
             input_txt],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=dict(
                os.environ,
                **dict(
                    cluster.env,
                    PYTHONPATH=REFERENCE + os.pathsep
                    + cluster.env["PYTHONPATH"],
                ),
            ),
            timeout=120,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-4000:]
        ref_pairs = sorted(
            tuple(json.loads(f) for f in ln.split(b"\t"))
            for ln in proc.stdout.splitlines() if ln
        )
        ours, _ = _run_hadoop(cluster, MRWordFreqCount(), [input_txt])
        assert ref_pairs == ours
