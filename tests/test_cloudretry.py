"""Throttle-aware cloud-API retries (reference ``mrjob/aws.py:215-268``
``_wrap_aws_client``): classification unit tests plus end-to-end runs
where the mock services throttle mid-job and the runners ride it out."""

import socket
import ssl

import pytest

from mrjob_spark.dataflow.cloudretry import (
    CLOUD_MAX_TRIES,
    client_error_code,
    client_error_status,
    is_retriable_cloud_error,
    wrap_cloud_client,
)
from mrjob_spark.dataflow.emr import EMRJobRunner
from mrjob_spark.dataflow.job import SparkMRJob
from mrjob_spark.dataflow.step import MRStep
from mrjob_spark.testing.mockemr import MockClientError, MockEMRService


class FakeClientError(Exception):
    """boto3 ClientError shape: carries a .response dict."""

    def __init__(self, code="", status=None, meta_status=None):
        super().__init__(code or str(status))
        self.response = {"Error": {}}
        if code:
            self.response["Error"]["Code"] = code
        if status is not None:
            self.response["Error"]["HTTPStatusCode"] = status
        if meta_status is not None:
            self.response["ResponseMetadata"] = {
                "HTTPStatusCode": meta_status
            }


class FakeGoogleError(Exception):
    def __init__(self, code):
        super().__init__("google %s" % code)
        self.code = code


# ---------------------------------------------------------------------
# classification
# ---------------------------------------------------------------------


@pytest.mark.parametrize("ex", [
    FakeClientError(code="ThrottlingException"),
    FakeClientError(code="Throttled"),
    FakeClientError(code="RequestExpired"),
    FakeClientError(code="RequestTimeout"),
    FakeClientError(code="InternalError", status=505),
    FakeClientError(code="SlowDown", meta_status=503),
    FakeGoogleError(429),
    FakeGoogleError(503),
    ssl.SSLError("The read operation timed out"),
    ConnectionResetError(104, "Connection reset by peer"),
    socket.timeout(),
    OSError(110, "Connection timed out"),
])
def test_retriable(ex):
    assert is_retriable_cloud_error(ex)


@pytest.mark.parametrize("ex", [
    FakeClientError(code="NoSuchKey", status=404),
    FakeClientError(code="ValidationException", status=400),
    FakeGoogleError(404),
    MockClientError("no such cluster: j-X"),
    ValueError("boom"),
    OSError(13, "Permission denied"),
    ssl.SSLError("certificate verify failed"),
])
def test_not_retriable(ex):
    assert not is_retriable_cloud_error(ex)


def test_code_and_status_extractors():
    ex = FakeClientError(code="Throttling", status=400)
    assert client_error_code(ex) == "Throttling"
    assert client_error_status(ex) == 400
    assert client_error_code(ValueError()) == ""
    assert client_error_status(ValueError()) is None


def test_wrapper_retries_then_succeeds():
    class Flaky:
        calls = 0

        def describe(self, **kw):
            Flaky.calls += 1
            if Flaky.calls < 3:
                raise FakeClientError(code="ThrottlingException")
            return {"ok": True}

    naps = []
    client = wrap_cloud_client(Flaky(), backoff=0.001,
                               sleep=naps.append)
    assert client.describe() == {"ok": True}
    assert Flaky.calls == 3
    assert len(naps) == 2
    assert naps[1] > naps[0]  # exponential


def test_wrapper_gives_up_after_max_tries():
    class AlwaysThrottled:
        calls = 0

        def describe(self):
            AlwaysThrottled.calls += 1
            raise FakeClientError(code="ThrottlingException")

    client = wrap_cloud_client(AlwaysThrottled(), backoff=0.001,
                               sleep=lambda s: None)
    with pytest.raises(FakeClientError):
        client.describe()
    assert AlwaysThrottled.calls == CLOUD_MAX_TRIES


def test_wrapper_passes_nonretriable_through_once():
    class Broken:
        calls = 0

        def describe(self):
            Broken.calls += 1
            raise MockClientError("no such cluster")

    client = wrap_cloud_client(Broken(), backoff=0.001)
    with pytest.raises(MockClientError):
        client.describe()
    assert Broken.calls == 1


# ---------------------------------------------------------------------
# end-to-end: mock services throttle mid-job, the runner rides it out
# ---------------------------------------------------------------------


class MRWordFreq(SparkMRJob):
    def steps(self):
        return [MRStep(mapper=self.m, reducer=self.r)]

    def m(self, _, line):
        for w in line.split():
            yield w.lower(), 1

    def r(self, w, counts):
        yield w, sum(counts)


class ThrottlingProxy:
    """Raises a ThrottlingException-shaped error on every Nth call of
    the named methods, like a rate-limited account under fleet load."""

    def __init__(self, inner, methods, every=2):
        self._inner = inner
        self._methods = set(methods)
        self._every = every
        self.calls = {}
        self.throttles = 0

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if name.startswith("_") or not callable(attr) \
                or name not in self._methods:
            return attr
        proxy = self

        def maybe_throttled(*args, **kw):
            n = proxy.calls.get(name, 0) + 1
            proxy.calls[name] = n
            if n % proxy._every == 1:
                proxy.throttles += 1
                raise FakeClientError(code="ThrottlingException")
            return attr(*args, **kw)

        return maybe_throttled


def test_emr_job_survives_throttling(tmp_path):
    """describe_step/describe_cluster/put_object throttling at 50%
    does not kill the job; output and counters are intact."""
    inp = tmp_path / "in.txt"
    inp.write_text("apple Banana apple\ncherry banana APPLE\n")
    svc = MockEMRService(tmp_path / "emr")
    emr = ThrottlingProxy(
        svc.emr_client(),
        ["describe_step", "describe_cluster", "add_job_flow_steps"],
    )
    s3 = ThrottlingProxy(
        svc.s3_client(), ["put_object", "list_objects_v2"]
    )
    r = EMRJobRunner(
        MRWordFreq(), input_paths=[str(inp)],
        emr_client=emr, s3_client=s3,
        check_cluster_every=0.0, cloud_api_backoff=1e-4,
    )
    with r:
        got = sorted(r.cat_output())
        counters = r.counters()
    assert got[0] == ("apple", 3)
    assert counters["Map-Reduce Framework"]["Map input records"] == 2
    assert emr.throttles > 0 and s3.throttles > 0


def test_dataproc_job_survives_throttling(tmp_path):
    from mrjob_spark.dataflow.dataproc import DataprocJobRunner
    from mrjob_spark.testing.mockdataproc import MockDataprocService

    inp = tmp_path / "in.txt"
    inp.write_text("apple Banana apple\ncherry banana APPLE\n")
    svc = MockDataprocService(tmp_path / "dp")
    jobs = ThrottlingProxy(
        svc.job_client(), ["submit_job", "get_job"]
    )
    r = DataprocJobRunner(
        MRWordFreq(), input_paths=[str(inp)],
        cluster_client=svc.cluster_client(),
        job_client=jobs,
        storage_client=svc.storage_client(),
        check_cluster_every=0.0, cloud_api_backoff=1e-4,
    )
    with r:
        got = sorted(r.cat_output())
    assert got[0] == ("apple", 3)
    assert jobs.throttles > 0


def test_documented_retry_horizon_is_three_and_a_half_hours():
    """The module docstring claims the reference's '20 s -> 20 min'
    pacing; the constants' comment claims ~3.6 hours total. Pin the
    arithmetic so neither drifts from the actual RetryWrapper behavior
    (round-8 ADVICE: the old comment said '~a day', which is what the
    reference's source COMMENT says but not what its 1200 s per-sleep
    cap actually does)."""
    from mrjob_spark.dataflow.cloudretry import (
        CLOUD_BACKOFF,
        CLOUD_BACKOFF_MULTIPLIER,
        CLOUD_MAX_TRIES,
    )
    from mrjob_spark.retry import DEFAULT_MAX_BACKOFF

    wait = CLOUD_BACKOFF
    total = 0.0
    for _ in range(CLOUD_MAX_TRIES - 1):  # sleeps between tries
        total += min(wait, DEFAULT_MAX_BACKOFF)
        wait = min(wait * CLOUD_BACKOFF_MULTIPLIER, DEFAULT_MAX_BACKOFF)
    assert DEFAULT_MAX_BACKOFF == 1200  # the 20-minute per-sleep cap
    assert 3.0 * 3600 < total < 4.0 * 3600  # ~3.6 h, nowhere near a day
