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


# ---------------------------------------------------------------------
# pagination + prefix-boundary (ADVICE r7: real S3 caps listings at
# 1000 keys/page; non-glob prefix listings must not match sibling keys)
# ---------------------------------------------------------------------


def test_listing_paginates(tmp_path):
    client = MockS3Client(str(tmp_path / "store"))
    client.create_bucket(Bucket="b")
    for i in range(7):
        client.put_object(Bucket="b", Key="out/part-%05d" % i, Body=b"x\n")
    client.page_size = 2  # 7 keys → 4 pages; a single-call consumer sees 2
    fs = ObjectStoreFS(client, scheme="s3")

    assert len(list(fs.ls("s3://b/out/"))) == 7
    assert len(list(fs.ls("s3://b/out/part-*"))) == 7
    assert fs.du("s3://b/out/") == 14
    assert len(list(fs.cat("s3://b/out/"))) == 7
    fs.rm("s3://b/out")
    assert not fs.exists("s3://b/out/part-*")


def test_mock_pagination_contract(tmp_path):
    # the mock's wire shape itself: IsTruncated + NextContinuationToken
    client = MockS3Client(str(tmp_path / "store"))
    client.create_bucket(Bucket="b")
    for key in ("a", "b", "c"):
        client.put_object(Bucket="b", Key=key, Body=b"1")
    page1 = client.list_objects_v2(Bucket="b", MaxKeys=2)
    assert [o["Key"] for o in page1["Contents"]] == ["a", "b"]
    assert page1["IsTruncated"]
    page2 = client.list_objects_v2(
        Bucket="b", ContinuationToken=page1["NextContinuationToken"]
    )
    assert [o["Key"] for o in page2["Contents"]] == ["c"]
    assert not page2["IsTruncated"]
    assert "NextContinuationToken" not in page2


def test_ls_and_rm_respect_path_boundary(tmp_path):
    # mrjob/fs/s3.py:142-162: ls of s3://b/out matches out and out/*,
    # never the sibling out-old/* — so rm of a trailing-slash-less
    # output dir can't delete unrelated data
    from mrjob_spark.dataflow.objectstore import key_within

    # the boundary predicate itself (file-backed mock can't hold an
    # object at `out` AND under `out/` simultaneously)
    assert key_within("out", "out")
    assert key_within("out/part-0", "out")
    assert key_within("out/part-0", "out/")
    assert not key_within("out-old/part-0", "out")
    assert not key_within("output2/part-0", "out")
    assert key_within("anything/x", "")  # bucket root

    client = MockS3Client(str(tmp_path / "store"))
    client.create_bucket(Bucket="b")
    client.put_object(Bucket="b", Key="out/part-00000", Body=b"x")
    client.put_object(Bucket="b", Key="out-old/part-00000", Body=b"keep")
    client.put_object(Bucket="b", Key="output2/part-00000", Body=b"keep")
    fs = ObjectStoreFS(client, scheme="s3")

    assert sorted(fs.ls("s3://b/out")) == ["s3://b/out/part-00000"]
    assert fs.du("s3://b/out") == 1
    fs.rm("s3://b/out")
    assert not fs.exists("s3://b/out")
    assert fs.exists("s3://b/out-old/part-00000")
    assert fs.exists("s3://b/output2/part-00000")


def test_runner_rm_prefix_respects_boundary(tmp_path):
    # the spot-loss retry path rm's output_dir without a trailing slash
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
    s3 = svc.s3_client()
    s3.create_bucket(Bucket="b")
    for i in range(5):
        s3.put_object(Bucket="b", Key="run/out/p-%d" % i, Body=b"x")
    s3.put_object(Bucket="b", Key="run/out-keep/p", Body=b"keep")
    s3.page_size = 2
    runner = EMRJobRunner(
        MRWC(), input_paths=["x"],
        emr_client=svc.emr_client(), s3_client=s3,
    )
    assert len(list(runner._s3_ls("s3://b/run/out"))) == 5
    runner._s3_rm_prefix("s3://b/run/out")
    assert list(runner._s3_ls("s3://b/run/out")) == []
    assert list(runner._s3_ls("s3://b/run/out-keep")) == [
        "s3://b/run/out-keep/p"
    ]
