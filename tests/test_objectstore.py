"""ObjectStoreFS — the cloud runners' ``runner.fs`` surface
(reference ``mrjob/fs/s3.py`` / ``mrjob/fs/gcs.py``), over the mock
object client."""

import gzip

import pytest

from mrjob_spark.dataflow.objectstore import ObjectStoreFS
from mrjob_spark.testing.mockemr import MockS3Client


@pytest.fixture
def fs(tmp_path):
    client = MockS3Client(str(tmp_path / "store"))
    client.create_bucket(Bucket="b")
    client.put_object(Bucket="b", Key="data/part-00000", Body=b"a\nb\n")
    client.put_object(Bucket="b", Key="data/part-00001", Body=b"c\n")
    client.put_object(Bucket="b", Key="data/_SUCCESS", Body=b"")
    client.put_object(Bucket="b", Key="other/x.txt", Body=b"x")
    client.put_object(
        Bucket="b", Key="zip/lines.txt.gz",
        Body=gzip.compress(b"z1\nz2\n"),
    )
    return ObjectStoreFS(client, scheme="s3")


def test_ls_prefix_and_glob(fs):
    assert sorted(fs.ls("s3://b/data/")) == [
        "s3://b/data/_SUCCESS",
        "s3://b/data/part-00000",
        "s3://b/data/part-00001",
    ]
    assert sorted(fs.ls("s3://b/data/part-*")) == [
        "s3://b/data/part-00000", "s3://b/data/part-00001",
    ]
    assert fs.can_handle_path("s3://b/x")
    assert not fs.can_handle_path("hdfs:///x")


def test_exists_du_cat_lines_md5(fs):
    assert fs.exists("s3://b/data/part-00000")
    assert not fs.exists("s3://b/data/part-9*")
    assert fs.du("s3://b/data/part-*") == 6
    assert list(fs.cat_lines("s3://b/data/part-*")) == [b"a", b"b", b"c"]
    import hashlib

    assert fs.md5sum("s3://b/data/part-00001") == hashlib.md5(
        b"c\n"
    ).hexdigest()


def test_gz_transparent(fs):
    assert list(fs.cat_lines("s3://b/zip/lines.txt.gz")) == [b"z1", b"z2"]


def test_put_get_touchz_rm(fs, tmp_path):
    src = tmp_path / "up.txt"
    src.write_text("uploaded")
    fs.put(str(src), "s3://b/in/")          # trailing slash → basename
    assert fs.exists("s3://b/in/up.txt")
    dst = tmp_path / "down.txt"
    fs.get("s3://b/in/up.txt", str(dst))
    assert dst.read_text() == "uploaded"

    fs.touchz("s3://b/flags/_DONE")
    assert fs.exists("s3://b/flags/_DONE")

    # rm of a 'directory' URI sweeps the prefix
    fs.rm("s3://b/data")
    assert not fs.exists("s3://b/data/part-*")
    assert fs.exists("s3://b/other/x.txt")   # untouched


def test_runner_fs_property(tmp_path):
    from mrjob_spark.dataflow.emr import EMRJobRunner
    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.step import MRStep
    from mrjob_spark.testing.mockemr import MockEMRService

    class MRWC(SparkMRJob):
        def steps(self):
            return [MRStep(mapper=self.m)]

        def m(self, _, line):
            yield line, 1

    svc = MockEMRService(tmp_path / "emr")
    runner = EMRJobRunner(
        MRWC(), input_paths=["x"],
        emr_client=svc.emr_client(), s3_client=svc.s3_client(),
    )
    runner.fs.mkdir("s3://mybucket/")
    runner.fs.touchz("s3://mybucket/a")
    assert runner.fs.exists("s3://mybucket/a")
    # retry facade proxies through (same contract as HadoopFilesystem)
    wrapped = runner.fs.retrying(retry_if=lambda e: False)
    assert wrapped.exists("s3://mybucket/a")
