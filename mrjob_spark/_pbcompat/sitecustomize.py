"""Protobuf-runtime compatibility shim, auto-run at interpreter start
when this directory is on PYTHONPATH (the stdlib `site` module imports
any importable `sitecustomize` — that is how the shim reaches pyspark's
forked DAEMON/WORKER processes, whose interpreters we never touch
directly).

Why: pyspark's ``transformWithStateInPandas`` state protocol is protobuf
(``pyspark/sql/streaming/proto/StateMessage_pb2``), but this container
has no ``google-protobuf`` distribution and no pip. The Google Cloud SDK
baked into the image DOES ship a pure-Python protobuf runtime (Apache
2.0, version 4.23.2), rewritten to live under the ``cloudsdk.google``
namespace. ``install()`` aliases that runtime back to ``google.protobuf``
and stubs the ``runtime_version`` module (added in protobuf 5.27, so the
4.23 runtime predates it) with a no-op validator.

The version validation being skipped is the generated-code check
"gencode 6.33.0 needs runtime >= 6.33": StateMessage.proto is plain
proto3 (no editions, no extensions), its serialized FileDescriptorProto
loads cleanly in the 4.23 descriptor pool, and the full
request/response round-trip is exercised by tests/test_streaming.py's
REAL transformWithStateInPandas runs — the shim is validated by
execution, not by trusting the skipped check.

The shim only engages when ``google.protobuf`` is not otherwise
importable: with a real protobuf installed this module is a no-op.
"""

_SDK_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"


def install() -> bool:
    """Alias cloudsdk's vendored protobuf as ``google.protobuf`` if (and
    only if) no real one is importable. Returns True when the alias (or a
    real protobuf) is in place."""
    import importlib.util
    import os
    import sys
    import types

    try:
        # probe a REAL runtime module, not the package: in pyspark
        # workers the spark-core JAR sits on sys.path and its bundled
        # .proto resources make `google.protobuf` resolve as an EMPTY
        # namespace-package portion (no python in it) — find_spec on the
        # package alone reads as "installed" and masks the missing
        # runtime. `descriptor` only resolves when python code exists.
        if importlib.util.find_spec("google.protobuf.descriptor") is not None:
            return True  # real protobuf (or an earlier install): done
    except (ModuleNotFoundError, ImportError):
        pass  # no 'google' namespace at all

    pb_dir = os.path.join(_SDK_THIRD_PARTY, "cloudsdk", "google", "protobuf")
    if not os.path.isdir(pb_dir):
        return False  # no vendorable runtime on this host either

    if _SDK_THIRD_PARTY not in sys.path:
        # cloudsdk protobuf modules import each other absolutely
        # (``from cloudsdk.google.protobuf.internal import ...``)
        sys.path.append(_SDK_THIRD_PARTY)
    import cloudsdk.google as _cg
    import cloudsdk.google.protobuf as _cpb

    # ONE module instance under both names — a separate re-load under the
    # google.* name would give two descriptor-pool singletons. Plain
    # assignment, not setdefault: the probe above may have left the
    # jar-resource namespace stub imported under these names.
    sys.modules["google"] = _cg
    sys.modules["google.protobuf"] = _cpb

    if not hasattr(_cpb, "runtime_version"):
        rv = types.ModuleType("google.protobuf.runtime_version")

        class Domain:
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        rv.Domain = Domain
        rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        rv.__doc__ = (
            "no-op stand-in for protobuf>=5.27's gencode/runtime version "
            "check; see sitecustomize module docstring"
        )
        sys.modules["google.protobuf.runtime_version"] = rv
        _cpb.runtime_version = rv
    return True


install()
