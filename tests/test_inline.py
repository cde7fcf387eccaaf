"""InlineJobRunner differential tests: the same probe jobs through the
inline (single-process) and Spark runners must produce identical output —
the reference's strategy for validating engines against each other
(``tests/spark/test_harness.py:244-300``).
"""

from __future__ import annotations

import gzip
import os

import pytest

from mrjob_spark.dataflow import SparkMRJob
from mrjob_spark.dataflow.examples import (
    MRCustomerOrderDates,
    MRFilterGrep,
    MRMostUsedWord,
    MRNextWordStats,
    MRPreFilterWords,
    MRWordCountWithCounters,
    MRWordFreqCount,
)

LINES = [
    "the quick brown fox jumps over the lazy dog",
    "the dog barks",
    "The Fox and the Hound",
]


def _spark_out(spark, job_factory, lines):
    rdd = spark.sparkContext.parallelize([(None, l) for l in lines], 3)
    with job_factory().make_runner(spark, input_rdd=rdd) as r:
        return sorted(r.cat_output())


def _inline_out(job_factory, lines):
    with job_factory().make_inline_runner(
        input_pairs=[(None, l) for l in lines]
    ) as r:
        r.run()
        return sorted(r.cat_output())


@pytest.mark.parametrize(
    "job_factory",
    [MRWordFreqCount, MRMostUsedWord, MRPreFilterWords,
     lambda: MRFilterGrep("dog"), MRNextWordStats],
    ids=["wordcount", "two_step_argmax", "pre_filter", "cmd_grep",
         "sort_values_stats"],
)
def test_inline_matches_spark(spark, job_factory):
    assert _inline_out(job_factory, LINES) == _spark_out(
        spark, job_factory, LINES
    )


def test_inline_sort_values(spark):
    pairs = [(1, "b"), (1, "a"), (2, "z"), (1, "c"), (2, "y")]
    with MRCustomerOrderDates().make_inline_runner(input_pairs=pairs) as r:
        out = dict(r.cat_output())
    assert out == {1: "a,b,c", 2: "y,z"}


def test_inline_counters():
    with MRWordCountWithCounters().make_inline_runner(
        input_pairs=[(None, l) for l in LINES]
    ) as r:
        r.run()
        counters = r.counters()
    assert counters["stats"]["lines"] == 3
    assert counters["stats"]["words"] == 17


def test_inline_reads_text_and_gzip(tmp_path):
    (tmp_path / "a.txt").write_text("x y\n")
    with gzip.open(tmp_path / "b.txt.gz", "wb") as fh:
        fh.write(b"y z\n")
    with MRWordFreqCount().make_inline_runner(
        input_paths=[str(tmp_path / "a.txt"), str(tmp_path / "b.txt.gz")]
    ) as r:
        out = dict(r.cat_output())
    assert out == {"x": 1, "y": 2, "z": 1}


def test_inline_output_dir_and_protocol(tmp_path):
    out_dir = str(tmp_path / "out")
    with MRWordFreqCount().make_inline_runner(
        input_pairs=[(None, "a b a")], output_dir=out_dir
    ) as r:
        r.run()
    read = MRWordFreqCount.OUTPUT_PROTOCOL().read
    with open(os.path.join(out_dir, "part-00000"), "rb") as fh:
        got = dict(read(l.rstrip(b"\n")) for l in fh)
    assert got == {"a": 2, "b": 1}


def test_inline_cli_runner_flag(tmp_path, capsysbinary):
    inp = tmp_path / "in.txt"
    inp.write_text("a b a\n")
    MRWordFreqCount.run(args=[str(inp), "-r", "inline"])
    captured = capsysbinary.readouterr().out
    read = MRWordFreqCount.OUTPUT_PROTOCOL().read
    assert dict(read(l) for l in captured.splitlines() if l) == {"a": 2, "b": 1}


def test_inline_init_final_hooks():
    class MRBracketed(SparkMRJob):
        def mapper_init(self):
            yield "init", 1

        def mapper(self, _, line):
            yield "data", 1

        def mapper_final(self):
            yield "final", 1

        def reducer(self, key, values):
            yield key, sum(values)

    with MRBracketed().make_inline_runner(
        input_pairs=[(None, "x"), (None, "y")]
    ) as r:
        out = dict(r.cat_output())
    # inline = ONE task, so hooks run once (vs once per partition on Spark)
    assert out == {"init": 1, "data": 2, "final": 1}


def test_inline_jar_step_matches_spark_runner(spark):
    """X7 differential: the inline runner executes a jar-bearing chain
    with the same result as the Spark runner (the reference's inline
    runner refuses jar steps; ours runs them, keeping inline a faithful
    dev twin)."""
    import pytest

    from mrjob_spark.dataflow.examples import MRWordFreqJarUpper
    from mrjob_spark.dataflow.jartools import (
        UPPERCASE_LINES_JAVA,
        compile_jar,
        have_jdk,
    )

    if not have_jdk():
        pytest.skip("no JDK (javac/jar) on PATH")
    jar = compile_jar(UPPERCASE_LINES_JAVA, "UpperCaseLines")
    pairs = [(None, "apple banana apple"), (None, "banana cherry")]

    with MRWordFreqJarUpper(jar).make_inline_runner(input_pairs=pairs) as r:
        r.run()
        inline_out = dict(r.cat_output())

    rdd = spark.sparkContext.parallelize(pairs, 2)
    with MRWordFreqJarUpper(jar).make_runner(spark, input_rdd=rdd) as r:
        spark_out = dict(r.collect_output())

    assert inline_out == spark_out == {"APPLE": 2, "BANANA": 2, "CHERRY": 1}


def test_jar_step_generic_args_splice():
    """GENERIC_ARGS expands to the -D property list at its position in
    args (program args); without it the properties ride as JVM flags."""
    import pytest

    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.jartools import compile_jar, have_jdk
    from mrjob_spark.dataflow.step import (
        GENERIC_ARGS,
        INPUT,
        OUTPUT,
        JarStep,
    )

    if not have_jdk():
        pytest.skip("no JDK (javac/jar) on PATH")

    # a jar that echoes its argv, one per line, into OUTPUT/part-00000
    src = """
import java.io.*;
import java.nio.file.*;

public class EchoArgs {
    public static void main(String[] args) throws IOException {
        Path out = Paths.get(args[args.length - 1]);
        Files.createDirectories(out);
        try (BufferedWriter w =
                Files.newBufferedWriter(out.resolve("part-00000"))) {
            for (String a : args) { w.write(a); w.newLine(); }
        }
    }
}
"""
    jar = compile_jar(src, "EchoArgs")

    class MRJarEcho(SparkMRJob):
        from mrjob_spark.dataflow.protocols import RawValueProtocol

        INTERNAL_PROTOCOL = RawValueProtocol
        OUTPUT_PROTOCOL = RawValueProtocol

        def steps(self):
            return [
                JarStep(
                    jar=jar,
                    main_class="EchoArgs",
                    args=[GENERIC_ARGS, INPUT, OUTPUT],
                    jobconf={"my.prop": "42"},
                )
            ]

    with MRJarEcho().make_inline_runner(
        input_pairs=[(None, "x")]
    ) as r:
        r.run()
        lines = [v for _, v in r.cat_output()]
    assert lines[0] == "-Dmy.prop=42"  # spliced as a program arg
    assert len(lines) == 3


def test_spark_script_step_inline_matches_spark(spark, tmp_path):
    # differential: the external-script step produces identical output
    # under the inline and Spark runners
    import textwrap

    from mrjob_spark.dataflow import (
        INPUT,
        OUTPUT,
        MRStep,
        SparkMRJob,
        SparkScriptStep,
    )

    script = tmp_path / "upper.py"
    script.write_text(textwrap.dedent("""
        import sys
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
        (spark.sparkContext.textFile(sys.argv[1])
            .map(lambda line: line.upper())
            .saveAsTextFile(sys.argv[2]))
        spark.stop()
    """))

    class MRWordsUpper(SparkMRJob):
        def steps(self):
            return [
                MRStep(mapper=self.m, reducer=self.r),
                SparkScriptStep(script=str(script), args=[INPUT, OUTPUT]),
            ]

        def m(self, _, line):
            for w in line.split():
                yield w, 1

        def r(self, w, counts):
            yield w, sum(counts)

    inp = tmp_path / "in.txt"
    inp.write_text("apple banana apple\n")

    inline = MRWordsUpper().make_inline_runner(input_paths=[str(inp)])
    inline.run()
    spark_runner = MRWordsUpper().make_runner(spark, input_paths=[str(inp)])
    spark_runner.run()
    assert sorted(inline.cat_output()) == sorted(spark_runner.cat_output())


def test_inline_workdir_mirrors_archives_and_dirs(tmp_path):
    # the reference's task working-dir contract (mrjob/sim.py): ARCHIVES
    # unpack into an '#alias' directory and DIRS appear under their
    # basename, both reachable by BARE RELATIVE PATH from task code —
    # round 5's inline workdir mirror (InlineJobRunner._make_workdir)
    import tarfile

    src = tmp_path / "bundle_src"
    src.mkdir()
    (src / "stopwords.txt").write_text("the\na\n")
    tar_path = str(tmp_path / "bundle.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(str(src / "stopwords.txt"), arcname="stopwords.txt")

    keep_dir = tmp_path / "keeplist"
    keep_dir.mkdir()
    (keep_dir / "keep.txt").write_text("fox\ndog\n")

    inp = tmp_path / "in.txt"
    inp.write_text("the quick fox\na quick dog\n")

    class MRArchiveDirJob(SparkMRJob):
        ARCHIVES = [tar_path + "#stopbundle"]
        DIRS = [str(keep_dir)]

        def mapper_init(self):
            with open("stopbundle/stopwords.txt") as fh:
                self._stop = set(fh.read().split())
            with open("keeplist/keep.txt") as fh:
                self._keep = set(fh.read().split())

        def mapper(self, _, line):
            for w in line.lower().split():
                if w in self._keep and w not in self._stop:
                    yield w, 1

        def reducer(self, word, counts):
            yield word, sum(counts)

    with MRArchiveDirJob().make_inline_runner(
        input_paths=[str(inp)]
    ) as r:
        r.run()
        assert sorted(r.cat_output()) == [("dog", 1), ("fox", 1)]


def test_inline_run_twice_reaps_previous_workdir(tmp_path):
    # run() without the context manager is supported; a second run() on the
    # same runner must remove the first run's task-workdir mirror instead
    # of orphaning it (ADVICE r5)
    import glob
    import tempfile

    inp = tmp_path / "in.txt"
    inp.write_text("x\n")
    side = tmp_path / "side.txt"
    side.write_text("ok\n")

    class MRSideJob(SparkMRJob):
        FILES = [str(side)]

        def mapper(self, _, line):
            with open("side.txt") as fh:
                yield fh.read().strip(), 1

    r = MRSideJob().make_inline_runner(input_paths=[str(inp)])
    r.run()
    first_wd = r._workdir
    assert first_wd and os.path.isdir(first_wd)
    r.run()
    assert not os.path.exists(first_wd), "previous run's workdir leaked"
    second_wd = r._workdir
    assert second_wd != first_wd and os.path.isdir(second_wd)
    r.__exit__(None, None, None)
    assert not os.path.exists(second_wd)


def test_inline_archive_tar_slip_rejected(tmp_path):
    # a tar member with a ../ path must not escape the workdir (PEP 706
    # data filter; ADVICE r5)
    import io
    import tarfile

    import pytest

    evil = str(tmp_path / "evil.tar")
    with tarfile.open(evil, "w") as tar:
        data = b"pwned\n"
        info = tarfile.TarInfo(name="../escape.txt")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))

    inp = tmp_path / "in.txt"
    inp.write_text("x\n")

    class MREvilJob(SparkMRJob):
        ARCHIVES = [evil + "#bundle"]

        def mapper(self, _, line):
            yield line, 1

    with pytest.raises(Exception):  # tarfile filter raises OutsideDestinationError
        MREvilJob().make_inline_runner(input_paths=[str(inp)]).run()
    assert not (tmp_path / "escape.txt").exists()
