"""Driver-side fs helper tests (mrjob/fs/base.py:26-150 surface) on local
paths through the Hadoop FileSystem API."""

from __future__ import annotations

import hashlib

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
