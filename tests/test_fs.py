"""Driver-side fs helper tests (mrjob/fs/base.py:26-150 surface) on local
paths through the Hadoop FileSystem API."""

from __future__ import annotations

import hashlib

import pytest

from mrjob_spark.fs import HadoopFilesystem


def test_exists_mkdir_rm(spark, tmp_path):
    fs = HadoopFilesystem(spark)
    d = str(tmp_path / "a" / "b")
    assert not fs.exists(d)
    fs.mkdir(d)
    assert fs.exists(d)
    fs.rm(str(tmp_path / "a"))
    assert not fs.exists(d)
    fs.rm(d)  # idempotent on missing paths


def test_du_and_ls_recursive(spark, tmp_path):
    fs = HadoopFilesystem(spark)
    (tmp_path / "sub").mkdir()
    (tmp_path / "x.bin").write_bytes(b"12345")
    (tmp_path / "sub" / "y.bin").write_bytes(b"1234567")
    assert fs.du(str(tmp_path)) == 12
    names = sorted(p.rsplit("/", 1)[1] for p in fs.ls(str(tmp_path)))
    assert names == ["x.bin", "y.bin"]


def test_md5sum_and_cat(spark, tmp_path):
    fs = HadoopFilesystem(spark)
    p = tmp_path / "data.bin"
    payload = b"hello fs" * 1000
    p.write_bytes(payload)
    assert fs.md5sum(str(p)) == hashlib.md5(payload).hexdigest()
    assert b"".join(fs.cat(str(p))) == payload


def test_touchz(spark, tmp_path):
    import pytest

    fs = HadoopFilesystem(spark)
    p = str(tmp_path / "marker")
    fs.touchz(p)
    assert fs.exists(p)
    fs.touchz(p)  # empty existing file: ok
    (tmp_path / "full").write_bytes(b"x")
    with pytest.raises(OSError):
        fs.touchz(str(tmp_path / "full"))


def test_put_get_roundtrip(spark, tmp_path):
    fs = HadoopFilesystem(spark)
    src = tmp_path / "src.txt"
    src.write_text("round trip")
    dest = str(tmp_path / "dest.txt")
    fs.put(str(src), dest)
    back = tmp_path / "back.txt"
    fs.get(dest, str(back))
    assert back.read_text() == "round trip"


# ---------------------------------------------------------------------------
# retry-with-backoff (mrjob/retry.py parity)
# ---------------------------------------------------------------------------


def test_retry_call_backs_off_then_succeeds():
    from mrjob_spark.retry import retry_call

    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise IOError("connection reset by peer")
        return "done"

    got = retry_call(
        flaky,
        retry_if=lambda e: "connection reset" in str(e),
        backoff=1.0,
        multiplier=2.0,
        max_backoff=3.0,
        sleep=sleeps.append,
    )
    assert got == "done"
    assert calls["n"] == 4
    # exponential backoff, capped by max_backoff
    assert sleeps == [1.0, 2.0, 3.0]


def test_retry_call_raises_non_retriable_immediately():
    from mrjob_spark.retry import retry_call

    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        raise ValueError("logic error, not transient")

    with pytest.raises(ValueError):
        retry_call(boom, retry_if=lambda e: False, sleep=lambda s: None)
    assert calls["n"] == 1


def test_retry_call_exhausts_max_tries():
    from mrjob_spark.retry import retry_call

    calls = {"n": 0}

    def always():
        calls["n"] += 1
        raise IOError("503 slow down")

    with pytest.raises(IOError):
        retry_call(
            always,
            retry_if=lambda e: True,
            max_tries=3,
            backoff=0.1,
            sleep=lambda s: None,
        )
    assert calls["n"] == 3


def test_retry_wrapper_proxies_and_retries():
    from mrjob_spark.retry import RetryWrapper

    class Client:
        label = "plain attribute"

        def __init__(self):
            self.n = 0

        def fetch(self):
            self.n += 1
            if self.n < 3:
                raise IOError("throttled: please slow down")
            return self.n

    wrapped = RetryWrapper(
        Client(),
        retry_if=lambda e: "slow down" in str(e),
        backoff=0.1,
        sleep=lambda s: None,
    )
    assert wrapped.label == "plain attribute"  # non-callables untouched
    assert wrapped.fetch() == 3


def test_fs_retrying_facade_works(spark, tmp_path):
    fs = HadoopFilesystem(spark).retrying(backoff=0.1, sleep=lambda s: None)
    p = str(tmp_path / "x.txt")
    assert not fs.exists(p)
    (tmp_path / "x.txt").write_text("hello")
    assert fs.exists(p)
    assert fs.du(p) == 5


def test_runner_fs_property(spark, tmp_path):
    # the reference's runner.fs surface (mrjob/runner.py): driver-side
    # filesystem helpers hanging off the runner
    from mrjob_spark.dataflow.examples import MRWordFreqCount

    inp = tmp_path / "in.txt"
    inp.write_text("a b\n")
    runner = MRWordFreqCount().make_runner(spark, input_paths=[str(inp)])
    assert runner.fs.exists(str(inp))
    assert not runner.fs.exists(str(tmp_path / "nope"))
