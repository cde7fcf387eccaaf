"""The subprocess-per-task local runner (``-r local``, round 6): the
guarantees that distinguish it from ``-r inline`` — real process
isolation, per-task working directories and env, external-sort shuffle —
plus the runner-contract basics (counters, part files, CLI wiring).
Cross-engine output equality is covered by test_reference_differential.py
(all eight cases assert reference == inline == local)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mrjob_spark.dataflow import SparkMRJob  # noqa: E402


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_hard_crash_in_task_is_contained(tmp_path):
    # the runner exists for THIS: os._exit bypasses every Python cleanup,
    # so under -r inline it would kill the test process itself; under
    # -r local it kills one task subprocess and the runner reports it
    inp = _write(tmp_path, "in.txt", "x\n")

    class MRBoom(SparkMRJob):
        def mapper_init(self):
            os._exit(42)

        def mapper(self, _, line):
            yield line, 1

    with pytest.raises(RuntimeError, match=r"mapper task .* rc=42"):
        MRBoom().make_local_runner(input_paths=[inp]).run()
    # and the runner process is demonstrably still alive to assert this


def test_task_env_and_cwd_are_isolated(tmp_path):
    # each task runs in its own scratch cwd with jobconf/cmdenv exposed as
    # env vars; mutations stay in the task process
    inp = _write(tmp_path, "in.txt", "x\n")

    class MREnv(SparkMRJob):
        JOBCONF = {"my.app.knob": "17"}

        def mapper(self, _, line):
            os.environ["LEAKED"] = "yes"  # dies with the task process
            yield "knob", os.environ.get("my_app_knob")
            yield "extra", os.environ.get("EXTRA_VAR")
            yield "cwd_is_scratch", "mrjob_spark_local_" in os.getcwd()

    with MREnv().make_local_runner(
        input_paths=[inp], cmdenv={"EXTRA_VAR": "hi"}, num_mappers=1
    ) as r:
        r.run()
        out = dict(r.cat_output())
    assert out == {"knob": "17", "extra": "hi", "cwd_is_scratch": True}
    assert "LEAKED" not in os.environ


def test_side_files_mirror_in_task_workdir(tmp_path):
    side = _write(tmp_path, "keep.txt", "fox\ndog\n")
    inp = _write(tmp_path, "in.txt", "the quick fox\na lazy dog ran\n")

    class MRKeep(SparkMRJob):
        FILES = [side]

        def mapper_init(self):
            with open("keep.txt") as fh:  # bare relative name, per contract
                self._keep = set(fh.read().split())

        def mapper(self, _, line):
            for w in line.split():
                if w in self._keep:
                    yield w, 1

        def reducer(self, w, counts):
            yield w, sum(counts)

    with MRKeep().make_local_runner(input_paths=[inp]) as r:
        r.run()
        assert sorted(r.cat_output()) == [("dog", 1), ("fox", 1)]


def test_counters_aggregate_across_task_processes(tmp_path):
    inp = _write(tmp_path, "in.txt", "a b\nc d\ne f\ng h\n")

    class MRCount(SparkMRJob):
        def mapper(self, _, line):
            self.increment_counter("m", "lines")
            for w in line.split():
                yield w, 1

        def reducer(self, w, counts):
            self.increment_counter("r", "keys")
            yield w, sum(counts)

    with MRCount().make_local_runner(
        input_paths=[inp], num_mappers=4, num_reducers=3
    ) as r:
        r.run()
        assert r.counters() == {"m": {"lines": 4}, "r": {"keys": 8}}


def test_sort_values_orders_values_within_key(tmp_path):
    inp = _write(tmp_path, "in.txt", "k:3\nk:1\nk:2\nj:9\nj:0\n")

    class MRSorted(SparkMRJob):
        SORT_VALUES = True

        def mapper(self, _, line):
            k, v = line.split(":")
            yield k, v

        def reducer(self, k, values):
            yield k, ",".join(values)  # order = encoded-byte value order

    with MRSorted().make_local_runner(input_paths=[inp]) as r:
        r.run()
        out = dict(r.cat_output())
    assert out == {"k": "1,2,3", "j": "0,9"}


def test_part_file_count_and_merge(tmp_path):
    inp = _write(tmp_path, "in.txt", "".join(f"w{i}\n" for i in range(20)))
    out_dir = str(tmp_path / "out")

    class MRWc(SparkMRJob):
        def mapper(self, _, line):
            yield line, 1

        def reducer(self, w, counts):
            yield w, sum(counts)

    with MRWc().make_local_runner(
        input_paths=[inp], output_dir=out_dir, num_reducers=4
    ) as r:
        r.run()
        parts = sorted(p for p in os.listdir(out_dir) if p.startswith("part-"))
        # reference split sizing (mrjob/sim.py:510-512): task count is
        # ~2× num_reducers, data-dependent at key boundaries — one part
        # file per reducer TASK, contiguous and numbered densely
        assert parts == [f"part-{i:05d}" for i in range(len(parts))]
        assert 4 <= len(parts) <= 2 * 4 + 1
        assert len(list(r.cat_output())) == 20

    out2 = str(tmp_path / "out2")
    with MRWc().make_local_runner(
        input_paths=[inp], output_dir=out2, num_reducers=4, max_output_files=1
    ) as r:
        r.run()
        parts = sorted(p for p in os.listdir(out2) if p.startswith("part-"))
        assert parts == ["part-00000"]
        assert len(list(r.cat_output())) == 20


def test_multi_step_chain_and_gzip_input(tmp_path):
    import gzip

    gz = str(tmp_path / "in.txt.gz")
    with gzip.open(gz, "wt") as fh:
        fh.write("b a b\nc b a\n")

    from mrjob_spark.dataflow import MRStep

    class MRTop(SparkMRJob):
        def steps(self):
            return [
                MRStep(mapper=self.m1, reducer=self.r1),
                MRStep(reducer=self.r2),
            ]

        def m1(self, _, line):
            for w in line.split():
                yield w, 1

        def r1(self, w, counts):
            yield None, (sum(counts), w)

        def r2(self, _, pairs):
            yield max(pairs), None

    with MRTop().make_local_runner(input_paths=[gz]) as r:
        r.run()
        ((key, _),) = list(r.cat_output())
        assert key == [3, "b"]


def test_cli_dash_r_local(tmp_path, capsysbinary):
    inp = _write(tmp_path, "in.txt", "a b a\n")

    class MRWc(SparkMRJob):
        def mapper(self, _, line):
            for w in line.split():
                yield w, 1

        def reducer(self, w, counts):
            yield w, sum(counts)

    job = MRWc(args=["-r", "local", "--no-conf", inp])
    with job.make_runner() as r:
        r.run()
        assert sorted(r.cat_output()) == [("a", 2), ("b", 1)]


def test_umbrella_command_run_and_diagnose(tmp_path):
    # the reference's `mrjob` subcommand dispatcher (mrjob/cmd.py:23-68),
    # here as `python -m mrjob_spark run|diagnose`
    import subprocess

    script = tmp_path / "wc.py"
    script.write_text(
        "from mrjob_spark.dataflow import SparkMRJob\n"
        "class MRWc(SparkMRJob):\n"
        "    def mapper(self, _, line):\n"
        "        for w in line.split():\n"
        "            yield w, 1\n"
        "    def reducer(self, w, counts):\n"
        "        yield w, sum(counts)\n"
        "if __name__ == '__main__':\n"
        "    MRWc.run()\n"
    )
    inp = tmp_path / "in.txt"
    inp.write_text("a b a\n")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "mrjob_spark", "run", str(script),
         "-r", "local", "--no-conf", str(inp)],
        capture_output=True, text=True, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert sorted(proc.stdout.splitlines()) == ['"a"\t2', '"b"\t1']

    log = tmp_path / "err.log"
    log.write_text(
        "26/08/14 Lost task 0.3 in stage 1.0\n"
        "Traceback (most recent call last):\n"
        '  File "wc.py", line 4, in mapper\n'
        "    for w in line.split():\n"
        "ValueError: boom\n"
    )
    proc = subprocess.run(
        [sys.executable, "-m", "mrjob_spark", "diagnose", str(log)],
        capture_output=True, text=True, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-300:]
    assert "ValueError: boom" in proc.stdout


def _reporter_job():
    # a mapper_cmd that passes lines through AND talks the Hadoop
    # streaming stderr protocol: counters + a status + a real log line
    class MRReporter(SparkMRJob):
        from mrjob_spark.dataflow.protocols import RawValueProtocol

        INPUT_PROTOCOL = RawValueProtocol
        INTERNAL_PROTOCOL = RawValueProtocol
        OUTPUT_PROTOCOL = RawValueProtocol

        mapper_cmd = (
            'cat; echo "reporter:counter:shell,lines,3" >&2; '
            'echo "reporter:counter:shell,lines,2" >&2; '
            'echo "reporter:status:halfway" >&2; '
            'echo "plain diagnostics" >&2'
        )

    return MRReporter


def test_reporter_counters_from_cmd_inline_and_local(tmp_path):
    # Hadoop streaming's stderr side-channel (mrjob/parse.py:111-150):
    # reporter:counter lines from a *_cmd reach runner.counters() on
    # every runner; per-map-task on local (2 tasks → doubled)
    inp = _write(tmp_path, "in.txt", "a\nb\n")
    MRReporter = _reporter_job()

    with MRReporter().make_inline_runner(input_paths=[inp]) as r:
        r.run()
        assert sorted(kv[1] for kv in r.cat_output()) == ["a", "b"]
        assert r.counters() == {"shell": {"lines": 5}}

    with MRReporter().make_local_runner(
        input_paths=[inp], num_mappers=2
    ) as r:
        r.run()
        assert sorted(kv[1] for kv in r.cat_output()) == ["a", "b"]
        # one cmd invocation per map task
        assert r.counters() == {"shell": {"lines": 10}}


def test_reporter_counters_match_reference_local_runner(tmp_path):
    # differential: the same reporter-emitting cmd job through the
    # REFERENCE's local runner (its inline runner refuses cmds) and ours
    REFERENCE = os.environ.get("MRJOB_REFERENCE_PATH", "/root/reference")
    if not os.path.isdir(os.path.join(REFERENCE, "mrjob")):
        pytest.skip("reference not available")
    sys.path.insert(0, REFERENCE)
    from mrjob.job import MRJob
    from mrjob.protocol import RawValueProtocol as RefRaw

    # the reference's local runner shlex-splits cmds (no shell), so the
    # differential uses a single script file both sides can exec
    script = tmp_path / "reporter.sh"
    script.write_text(
        "#!/bin/sh\ncat\necho 'reporter:counter:shell,lines,7' >&2\n"
    )
    script.chmod(0o755)
    cmd = str(script)

    class RefReporter(MRJob):
        INPUT_PROTOCOL = RefRaw
        INTERNAL_PROTOCOL = RefRaw
        OUTPUT_PROTOCOL = RefRaw

        def steps(self):
            from mrjob.step import MRStep

            return [MRStep(mapper_cmd=cmd)]

    inp = _write(tmp_path, "in.txt", "x\ny\n")
    job = RefReporter(args=["-r", "local", "--no-conf", inp])
    with job.make_runner() as r:
        r.run()
        ref_out = sorted(job.parse_output(r.cat_output()))
        ref_counters: dict = {}
        for step in r.counters():
            for g, names in step.items():
                for n, amt in names.items():
                    ref_counters.setdefault(g, {})
                    ref_counters[g][n] = ref_counters[g].get(n, 0) + amt

    from mrjob_spark.dataflow import MRStep as OurStep

    class OurReporter(SparkMRJob):
        from mrjob_spark.dataflow.protocols import RawValueProtocol

        INPUT_PROTOCOL = RawValueProtocol
        INTERNAL_PROTOCOL = RawValueProtocol
        OUTPUT_PROTOCOL = RawValueProtocol

        def steps(self):
            return [OurStep(mapper_cmd=cmd)]

    # the reference local runner forks a cmd per input split; pin both
    # sides to the same task count so per-task counters compare equal
    ref_tasks = ref_counters.get("shell", {}).get("lines", 0) // 7
    with OurReporter().make_local_runner(
        input_paths=[inp], num_mappers=max(1, ref_tasks)
    ) as r:
        r.run()
        ours_out = sorted(tuple(kv) for kv in r.cat_output())
        # the reference's to_lines/RawValueProtocol keeps each line's
        # trailing \n in parse_output (mrjob/util.py:256-281); our
        # cat_output strips terminators before decoding — normalize
        assert [v for _, v in ours_out] == [
            v.rstrip("\n") for _, v in ref_out
        ]
        assert r.counters() == ref_counters


def test_setup_exports_reach_python_substeps(tmp_path):
    # the reference wraps EVERY task in the setup script (mrjob/bin.py:
    # 545-653); under -r local a setup `export` must be visible to Python
    # mapper code, and the side effect must run once per job run (flock'd
    # disk guard), not once per task
    inp = _write(tmp_path, "in.txt", "a\nb\nc\nd\n")
    marker = tmp_path / "ran_count"

    class MRSetup(SparkMRJob):
        def mapper(self, _, line):
            yield line, os.environ.get("SETUP_TOKEN")

    setup = [
        f'echo x >> "{marker}"',
        "export SETUP_TOKEN=s3cr3t",
    ]
    with MRSetup().make_local_runner(
        input_paths=[inp], num_mappers=4, setup=setup
    ) as r:
        r.run()
        out = dict(r.cat_output())
    assert out == {k: "s3cr3t" for k in "abcd"}
    assert marker.read_text().count("x") == 1  # once per run, not per task


def test_partition_splits_respect_key_boundaries(tmp_path):
    # reference split parity (VERDICT r6 task 7; mrjob/sim.py:510-537):
    # the sorted run splits into ~2×num_reducers contiguous task files,
    # breaking ONLY at key changes — a group larger than the split size
    # must land whole in one task file.
    class MRNoop(SparkMRJob):
        def reducer(self, k, vs):
            yield k, sum(vs)

    r = MRNoop().make_local_runner(input_paths=["unused"], num_reducers=2)
    step_dir = tmp_path / "stepdir"
    step_dir.mkdir()
    sorted_path = tmp_path / "sorted"
    # composite hex lines like the shuffle writes: key field = hex bytes
    # before the first tab. One hot key ('kk') dominating the byte budget
    # plus several singleton keys on either side (sorted order).
    def comp(key: str, payload: str) -> bytes:
        return key.encode().hex().encode() + b"\t" + payload.encode().hex().encode() + b"\n"

    lines = [comp("aa", "x")]
    lines += [comp("kk", f"value-{i:04d}") for i in range(200)]
    lines += [comp(z, "x") for z in ("pp", "qq", "rr", "ss")]
    sorted_path.write_bytes(b"".join(lines))

    files = r._partition(str(sorted_path), str(step_dir))
    # ~2 splits per reducer slot (slop at key boundaries), never 1-per-key
    assert 2 <= len(files) <= 6
    # the hot group must sit whole in exactly one file
    hot = "kk".encode().hex().encode() + b"\t"
    holders = [
        f for f in files
        if any(ln.startswith(hot) for ln in open(f, "rb"))
    ]
    assert len(holders) == 1
    n_hot = sum(
        1 for ln in open(holders[0], "rb") if ln.startswith(hot)
    )
    assert n_hot == 200
    # files are contiguous ranges: concatenation reproduces the sorted run
    cat = b"".join(open(f, "rb").read() for f in files)
    assert cat == sorted_path.read_bytes()
