"""Transparent retry-with-backoff for transient errors.

Parity surface for the reference's ``mrjob/retry.py`` (RetryWrapper:
wrap any object; retriable exceptions back off exponentially and the call
repeats until success, a non-retriable error, or max_tries). The use case
is the same here: driver-side control-plane calls against remote
filesystems / object stores (:class:`mrjob_spark.fs.HadoopFilesystem`)
where 5xx/throttle errors are routine. The DATA path never goes through
this — Spark's own task retry (``spark.task.maxFailures``) covers
executor-side transience; wrapping bulk reads in driver retries would be
the wrong layer.

Implementation is original: a proxy via ``__getattr__`` plus a
``retry_call`` primitive that is also usable standalone.
"""

from __future__ import annotations

import logging
import time
from typing import Callable

log = logging.getLogger(__name__)

DEFAULT_BACKOFF = 15.0
DEFAULT_MULTIPLIER = 1.5
DEFAULT_MAX_TRIES = 10
DEFAULT_MAX_BACKOFF = 1200.0  # 20 minutes, like the reference


def retry_call(
    fn: Callable,
    retry_if: Callable[[BaseException], bool],
    *,
    backoff: float = DEFAULT_BACKOFF,
    multiplier: float = DEFAULT_MULTIPLIER,
    max_tries: int = DEFAULT_MAX_TRIES,
    max_backoff: float = DEFAULT_MAX_BACKOFF,
    sleep: Callable[[float], None] = time.sleep,
):
    """Call ``fn()``; on an exception where ``retry_if(exc)`` is true,
    sleep and try again with exponential backoff. ``max_tries=0`` retries
    forever. The final attempt's exception propagates unchanged."""
    if backoff <= 0:
        raise ValueError("backoff must be positive")
    if multiplier < 1:
        raise ValueError("multiplier must be at least one")
    tries = 0
    wait = backoff
    while True:
        try:
            return fn()
        except Exception as ex:
            tries += 1
            last = max_tries and tries >= max_tries
            if last or not retry_if(ex):
                raise
            log.info("got retriable error: %r; backing off %.1fs", ex, wait)
            sleep(wait)
            wait = min(wait * multiplier, max_backoff)


#: Substrings that mark an exception as probably-transient for driver-side
#: control-plane IO — connection blips, timeouts, and object-store
#: throttle/5xx responses (the errors the reference built RetryWrapper
#: around for its cloud fs clients).
_TRANSIENT_MARKERS = (
    "connection reset",
    "connection refused",
    "broken pipe",
    "timed out",
    "timeout",
    "eofexception",
    "503",
    "slow down",
    "throttl",
    "temporarily unavailable",
    "service unavailable",
)


def is_transient_io_error(ex: BaseException) -> bool:
    """Heuristic transience test over the exception text (py4j-raised
    Java IO errors only surface as text)."""
    text = str(ex).lower()
    return any(m in text for m in _TRANSIENT_MARKERS)


class RetryWrapper:
    """Proxy that behaves like the wrapped object, but retries method
    calls whose exceptions ``retry_if`` deems transient
    (``mrjob/retry.py:32-128`` contract). Non-callable attributes pass
    through untouched."""

    def __init__(
        self,
        wrapped,
        retry_if: Callable[[BaseException], bool],
        *,
        backoff: float = DEFAULT_BACKOFF,
        multiplier: float = DEFAULT_MULTIPLIER,
        max_tries: int = DEFAULT_MAX_TRIES,
        max_backoff: float = DEFAULT_MAX_BACKOFF,
        sleep: Callable[[float], None] = time.sleep,
    ):
        if backoff <= 0:
            raise ValueError("backoff must be positive")
        if multiplier < 1:
            raise ValueError("multiplier must be at least one")
        self.__wrapped = wrapped
        self.__kwargs = dict(
            retry_if=retry_if,
            backoff=backoff,
            multiplier=multiplier,
            max_tries=max_tries,
            max_backoff=max_backoff,
            sleep=sleep,
        )

    def __getattr__(self, name):
        attr = getattr(self.__wrapped, name)
        if not callable(attr):
            return attr
        kwargs = self.__kwargs

        def call_with_retries(*args, **kw):
            return retry_call(lambda: attr(*args, **kw), **kwargs)

        return call_with_retries
