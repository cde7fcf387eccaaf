"""Throttle-aware retries for cloud control-plane clients.

At fleet concurrency the cloud APIs WILL throttle: a thousand drivers
each polling ``describe_step`` every 30 s is ~33 req/s against an
account-level rate limit, so ``ThrottlingException`` is a steady-state
condition, not an anomaly. The reference wraps every boto3 client it
builds in a retry proxy for exactly this reason
(``mrjob/aws.py:215-268`` ``_wrap_aws_client``: retry on
Throttl*/RequestExpired/Timeout codes, spurious load-balancer 505s, and
socket/SSL timeouts, with 20 s → 20 min exponential backoff); without
it, one throttled describe call kills a job that has hours of cluster
work behind it.

This wrapper is duck-typed where the reference imports botocore: a
retriable error is recognized by its SHAPE (a boto3 ``ClientError``
carries ``.response`` with ``Error.Code``; Google API errors carry
``.code``), so the same proxy serves the EMR, S3, Dataproc, and GCS
clients — real or the executing mocks — and the classifier is unit-
testable without either SDK installed.

The DATA path never routes through this: Spark's own task retry covers
executor-side transience, and S3 object reads/writes retry at the
transfer layer. This is for the control-plane calls whose failure
otherwise aborts a healthy job.
"""

from __future__ import annotations

import socket
import ssl

from mrjob_spark.retry import RetryWrapper

#: the reference's throttle pacing (mrjob/aws.py:215-218). With the
#: 1200 s per-sleep cap both RetryWrappers apply (theirs,
#: mrjob/retry.py:29, and ours), 20 tries at 20 s × 1.5^k totals
#: ~3.6 HOURS before giving up — a throttled fleet clears well inside
#: that, a dead API doesn't. (The reference's own "about a day" comment
#: overstates its behavior: it, too, caps each sleep at 20 minutes.)
CLOUD_BACKOFF = 20.0
CLOUD_BACKOFF_MULTIPLIER = 1.5
CLOUD_MAX_TRIES = 20

#: HTTP statuses that mean "try again": throttling (429), transient
#: server errors (500/502/503/504), and the load-balancer 505s the
#: reference special-cases (mrjob/aws.py:240-242)
_RETRIABLE_STATUSES = {429, 500, 502, 503, 504, 505}


def client_error_code(ex: BaseException) -> str:
    """The AWS error code of a ClientError-shaped exception ('' when
    the shape doesn't match)."""
    response = getattr(ex, "response", None)
    if not isinstance(response, dict):
        return ""
    return (response.get("Error") or {}).get("Code", "") or ""


def client_error_status(ex: BaseException):
    """The HTTP status of a ClientError-shaped exception (None when
    the shape doesn't match)."""
    response = getattr(ex, "response", None)
    if not isinstance(response, dict):
        return None
    return (response.get("Error") or {}).get("HTTPStatusCode") or (
        response.get("ResponseMetadata") or {}
    ).get("HTTPStatusCode")


def is_retriable_cloud_error(ex: BaseException) -> bool:
    """Should a cloud control-plane call that raised *ex* be retried?

    AWS shape: code contains Throttl/RequestExpired/Timeout (the
    'Throttl' prefix catches Throttled AND Throttling), or a retriable
    HTTP status. Google shape: ``.code`` in the retriable statuses
    (429 = rateLimitExceeded). Transport: timed-out SSL reads/writes
    and reset/timed-out sockets (mrjob/aws.py:234-255)."""
    code = client_error_code(ex)
    if code:
        if any(c in code for c in ("Throttl", "RequestExpired",
                                   "Timeout")):
            return True
        return client_error_status(ex) in _RETRIABLE_STATUSES
    status = client_error_status(ex)
    if status is not None:
        return status in _RETRIABLE_STATUSES
    gcode = getattr(ex, "code", None)
    if isinstance(gcode, int):
        return gcode in _RETRIABLE_STATUSES
    if isinstance(ex, ssl.SSLError):
        return any(
            isinstance(arg, str) and "timed out" in arg for arg in ex.args
        )
    if isinstance(ex, (ConnectionResetError, socket.timeout)):
        return True
    if isinstance(ex, OSError):
        return ex.args in (
            (104, "Connection reset by peer"),
            (110, "Connection timed out"),
        )
    return False


def wrap_cloud_client(raw_client, min_backoff: float = 0.0,
                      backoff: float = None, sleep=None) -> RetryWrapper:
    """Wrap a cloud client so throttles and transient faults retry with
    exponential backoff instead of killing the job (the reference's
    ``_wrap_aws_client``). ``min_backoff`` can only raise the floor
    (the reference's contract); ``backoff`` overrides it outright
    (tests pace the loop down instead of sleeping real minutes)."""
    return RetryWrapper(
        raw_client,
        retry_if=is_retriable_cloud_error,
        backoff=(backoff if backoff is not None
                 else max(CLOUD_BACKOFF, min_backoff or 0)),
        multiplier=CLOUD_BACKOFF_MULTIPLIER,
        max_tries=CLOUD_MAX_TRIES,
        **({"sleep": sleep} if sleep is not None else {}),
    )
