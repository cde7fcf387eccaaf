"""``-r dataproc`` against the executing mock Dataproc/GCS service
(:mod:`mrjob_spark.testing.mockdataproc`).

Behavioral contract: reference ``mrjob/dataproc.py`` — the jobs API
(one ``hadoopJob`` per step), the chunked ``driveroutput.*``
incremental reader, counter parsing from the driver log, the
Cloud-Logging diagnosis path, and cluster create/join/idle-delete. The
mock executes streaming jobs for real through the mockhadoop engine
over an on-disk GCS store."""

import pytest

from mrjob_spark.dataflow.dataproc import (
    DataprocJobRunner,
    _DriverOutputReader,
)
from mrjob_spark.dataflow.job import SparkMRJob
from mrjob_spark.dataflow.step import MRStep
from mrjob_spark.testing.mockdataproc import MockDataprocService


class MRWordFreq(SparkMRJob):
    def steps(self):
        return [MRStep(mapper=self.m, combiner=self.r, reducer=self.r)]

    def m(self, _, line):
        for w in line.split():
            yield w.lower(), 1

    def r(self, w, counts):
        yield w, sum(counts)


class MRTwoStepTop(SparkMRJob):
    def steps(self):
        return [
            MRStep(mapper=self.m, reducer=self.r),
            MRStep(reducer=self.top),
        ]

    def m(self, _, line):
        for w in line.split():
            yield w.lower(), 1

    def r(self, w, counts):
        yield None, (sum(counts), w)

    def top(self, _, pairs):
        yield max(pairs)


class MRBoom(SparkMRJob):
    def steps(self):
        return [MRStep(mapper=self.m, reducer=self.r)]

    def m(self, _, line):
        yield "k", line

    def r(self, key, values):
        raise ValueError("dataproc reducer detonated")


@pytest.fixture
def svc(tmp_path):
    return MockDataprocService(tmp_path / "dataproc")


@pytest.fixture
def input_file(tmp_path):
    p = tmp_path / "in.txt"
    p.write_text("apple Banana apple\ncherry banana APPLE\n")
    return str(p)


def _runner(svc, job, input_file, **kwargs):
    kwargs.setdefault("cluster_client", svc.cluster_client())
    kwargs.setdefault("job_client", svc.job_client())
    kwargs.setdefault("storage_client", svc.storage_client())
    kwargs.setdefault("logging_client", svc.logging_client())
    kwargs.setdefault("check_cluster_every", 0.0)
    return DataprocJobRunner(job, input_paths=[input_file], **kwargs)


def test_wordcount_matches_inline(svc, input_file):
    with _runner(svc, MRWordFreq(), input_file, num_reducers=2) as r:
        got = sorted(r.cat_output())
    inline = MRWordFreq().make_inline_runner(input_paths=[input_file])
    inline.run()
    assert got == sorted(inline.cat_output())


def test_two_step_chain_is_two_jobs(svc, input_file):
    with _runner(svc, MRTwoStepTop(), input_file) as r:
        got = list(r.cat_output())
        job_ids = list(r._job_ids)
    assert got == [(3, "apple")]
    assert len(job_ids) == 2
    # the reference's job-id naming: <cleansed key>---step-0000N-of-0000M
    assert job_ids[0].endswith("---step-00001-of-00002")
    assert job_ids[1].endswith("---step-00002-of-00002")
    assert "." not in job_ids[0]  # GCP id charset: [a-zA-Z0-9_-]


def test_counters_parsed_from_chunked_driver_output(svc, input_file):
    with _runner(svc, MRWordFreq(), input_file) as r:
        r.run()
        counters = r.counters()
        job_id = r._job_ids[0]
    assert counters["Map-Reduce Framework"]["Map input records"] == 2
    # the driver log really is chunked on GCS (small chunk size in the
    # mock guarantees >1 object), and the reader walked every chunk
    job = svc.jobs[job_id]
    bucket, prefix = job["driverOutputResourceUri"].split("://", 1)[1] \
        .split("/", 1)
    chunks = svc.storage.list_objects_v2(
        Bucket=bucket, Prefix=prefix
    )["Contents"]
    assert len(chunks) > 1


def test_driver_output_reader_is_incremental(tmp_path):
    from mrjob_spark.testing.mockemr import MockS3Client

    storage = MockS3Client(str(tmp_path / "store"))
    storage.create_bucket(Bucket="b")
    reader = _DriverOutputReader(storage, "gs://b/out")
    assert reader.new_lines() == []
    storage.put_object(Bucket="b", Key="out/driveroutput.000000000",
                       Body=b"line1\nli")
    assert reader.new_lines() == ["line1"]
    # the chunk grows in place (Dataproc appends): only NEW bytes return
    storage.put_object(Bucket="b", Key="out/driveroutput.000000000",
                       Body=b"line1\nline2\n")
    assert reader.new_lines() == ["line2"]
    # a new chunk supersedes the old one
    storage.put_object(Bucket="b", Key="out/driveroutput.000000001",
                       Body=b"line3\n")
    assert reader.new_lines() == ["line3"]
    assert "line2" in reader.text and "line3" in reader.text


def test_cluster_created_then_deleted_on_cleanup(svc, input_file):
    r = _runner(svc, MRWordFreq(), input_file)
    r.run()
    name = r.get_cluster_id()
    assert name.startswith("mrjob-us-central1-")
    assert svc.clusters[name]["status"]["state"] == "RUNNING"
    r.cleanup()
    assert svc.clusters[name]["status"]["state"] == "DELETING"
    svc.sleep(1)
    assert name not in svc.clusters  # DELETING resolves to gone


def test_join_existing_cluster_not_deleted_on_cleanup(svc, input_file):
    svc.api_create_cluster("mock-project", "us-central1",
                           {"clusterName": "shared-cluster"})
    svc.sleep(1)  # CREATING → RUNNING
    with _runner(svc, MRWordFreq(), input_file,
                 cluster_name="shared-cluster") as r:
        r.run()
        got = sorted(r.cat_output())
    assert got[0] == ("apple", 3)
    # joined, not created → left alone at cleanup
    assert svc.clusters["shared-cluster"]["status"]["state"] == "RUNNING"


def test_idle_cluster_self_deletes_via_lifecycle_ttl(svc, input_file):
    with _runner(svc, MRWordFreq(), input_file, max_mins_idle=1.0,
                 leave_cluster_running=True) as r:
        r.run()
        name = r.get_cluster_id()
    ttl = svc.clusters[name]["config"]["lifecycleConfig"]["idleDeleteTtl"]
    assert ttl == "60s"
    svc.sleep(2 * 60)
    svc.sleep(1)
    assert name not in svc.clusters


def test_failed_job_diagnosed_from_logging_entries(svc, input_file):
    r = _runner(svc, MRBoom(), input_file)
    with pytest.raises(RuntimeError) as exc_info:
        r.run()
    msg = str(exc_info.value)
    assert "ERROR" in msg
    assert "Probable cause of failure" in msg
    assert "dataproc reducer detonated" in msg
    # the cause came through Cloud-Logging-style yarn-userlogs entries
    entries = svc.logging_client().list_entries(
        filter_={"job_id": r._job_ids[0]}
    )
    assert any("detonated" in e["textPayload"] for e in entries)
    r.cleanup()


def test_clients_required_in_this_environment(input_file):
    with pytest.raises(ImportError):
        DataprocJobRunner(MRWordFreq(), input_paths=[input_file])


def test_cluster_name_charset_enforced_by_mock(svc):
    with pytest.raises(ValueError):
        svc.api_create_cluster("p", "r", {"clusterName": "Bad.Name"})


def test_cli_runner_dataproc_with_mock_env(tmp_path, input_file,
                                           monkeypatch):
    monkeypatch.setenv(
        "MOCK_DATAPROC_BASE_DIR", str(tmp_path / "dataproc-cli")
    )
    job = MRWordFreq([
        "-r", "dataproc", "--no-conf", input_file, "--num-reducers", "1",
    ])
    runner = job.make_runner()
    assert isinstance(runner, DataprocJobRunner)
    with runner:
        runner.run()
        got = sorted(runner.cat_output())
    assert got[0] == ("apple", 3)


# ---------------------------------------------------------------------
# plain JarStep on Dataproc (VERDICT r7 task 2; reference
# mrjob/dataproc.py:594-614 _jar_step_job_kwarg)
# ---------------------------------------------------------------------


def _jar_upper_job():
    from mrjob_spark.dataflow.examples import MRWordFreqJarUpper
    from mrjob_spark.dataflow.jartools import (
        UPPERCASE_LINES_JAVA,
        compile_jar,
        have_jdk,
    )

    if not have_jdk():
        pytest.skip("no JDK in this environment")
    return MRWordFreqJarUpper(
        compile_jar(UPPERCASE_LINES_JAVA, "UpperCaseLines")
    )


def test_jar_step_job_shape_on_dataproc(svc, input_file):
    """mainClass + jarFileUris (the API forbids mainClass alongside
    mainJarFileUri), INPUT/OUTPUT interpolated to GCS URIs."""
    r = _runner(svc, _jar_upper_job(), input_file)
    r.run()
    jar_job = svc.jobs[r._job_ids[1]]["hadoopJob"]
    assert jar_job["mainClass"] == "UpperCaseLines"
    assert "mainJarFileUri" not in jar_job
    (jar_uri,) = jar_job["jarFileUris"]
    assert jar_uri.startswith("gs://") and jar_uri.endswith(".jar")
    in_arg, out_arg = jar_job["args"]
    assert in_arg.startswith("gs://") and "step-output/0000" in in_arg
    assert out_arg.startswith("gs://") and "step-output/0001" in out_arg
    # the next streaming job reads the jar's output
    step3 = svc.jobs[r._job_ids[2]]["hadoopJob"]
    assert step3["args"][step3["args"].index("-input") + 1] == out_arg
    r.cleanup()


def test_jar_step_without_main_class_uses_main_jar_file_uri(
        svc, input_file):
    from mrjob_spark.dataflow.step import INPUT, OUTPUT, JarStep

    runner = _runner(svc, MRWordFreq(), input_file)
    hadoop_job = runner._jar_step_hadoop_job(
        JarStep(jar="gs://apps/tool.jar", args=[INPUT, OUTPUT],
                jobconf={"k": "v"}),
        ["gs://b/in"], "gs://b/out",
    )
    assert hadoop_job["mainJarFileUri"] == "gs://apps/tool.jar"
    assert "mainClass" not in hadoop_job
    assert hadoop_job["args"] == ["gs://b/in", "gs://b/out"]


def test_jar_step_executes_end_to_end_on_dataproc(svc, input_file):
    job = _jar_upper_job()
    with _runner(svc, job, input_file) as r:
        got = sorted(r.cat_output())
    inline = _jar_upper_job().make_inline_runner(
        input_paths=[input_file]
    )
    inline.run()
    assert got == sorted(inline.cat_output())
    assert got[0] == ("APPLE", 3)


def test_cloud_part_size_builds_a_transfer_config(svc, input_file):
    """ADVICE r11: the Dataproc runner must wrap cloud_part_size_mb in a
    boto3-compatible TransferConfig for its storage uploads, exactly like
    the EMR twin (emr.py:_s3_put_file) — a raw int fails inside a real
    S3Transfer, and chunk size AND threshold must both ride the option."""
    with _runner(svc, MRWordFreq(), input_file,
                 cloud_part_size_mb=5) as r:
        r.run()
    configs = list(svc.storage.upload_configs.values())
    assert configs, "no uploads recorded"
    assert all(
        c is not None
        and c.multipart_chunksize == 5 * 1024 * 1024
        and c.multipart_threshold == 5 * 1024 * 1024
        for c in configs
    )

    # disabled: the huge sentinel keeps multipart from ever triggering
    svc2 = MockDataprocService(svc.base_dir + "_partoff")
    with _runner(svc2, MRWordFreq(), input_file,
                 cluster_client=svc2.cluster_client(),
                 job_client=svc2.job_client(),
                 storage_client=svc2.storage_client(),
                 logging_client=svc2.logging_client(),
                 cloud_part_size_mb=None) as r2:
        r2.run()
    assert all(
        c.multipart_threshold >= 2 ** 64
        for c in svc2.storage.upload_configs.values()
    )
