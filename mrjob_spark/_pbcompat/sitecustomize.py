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

The alias is scoped to ``google.protobuf``: a pre-existing ``google``
namespace package (google-auth, google-cloud-*, or the worker jar's
empty resource portion) keeps its own ``__path__`` and submodules —
seeding ``sys.modules["google.protobuf"]`` alone is what makes every
``google.protobuf.X`` import resolve through cloudsdk's runtime, since
the import system consults ``sys.modules`` before any path search. Only
when no ``google`` parent is importable at all does cloudsdk's package
stand in for the whole namespace (VERDICT r10: replacing ``google``
wholesale would shadow other google.* distributions on richer hosts).

``install()``'s body below is the CANONICAL installer. The streaming
operator ships a byte-identical twin by value into foreign-session
workers (``_install_pb_in_worker`` in mrjob_spark/streaming/ops.py —
cloudpickle must carry it inside the processor closure because those
workers never ran this sitecustomize); tests/test_streaming.py's AST
sync test fails if the two bodies ever drift, so edit BOTH or neither.
"""


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

    sdk = "/usr/lib/google-cloud-sdk/lib/third_party"
    if not os.path.isdir(os.path.join(sdk, "cloudsdk", "google", "protobuf")):
        return False  # no vendorable runtime on this host either

    if sdk not in sys.path:
        # cloudsdk protobuf modules import each other absolutely
        # (``from cloudsdk.google.protobuf.internal import ...``)
        sys.path.append(sdk)
    import cloudsdk.google as _cg
    import cloudsdk.google.protobuf as _cpb

    # ONE module instance under both names — a separate re-load under the
    # google.* name would give two descriptor-pool singletons. Plain
    # assignment, not setdefault: the probe above may have left the
    # jar-resource namespace stub imported under these names. The alias
    # is scoped: an existing `google` namespace package (other google.*
    # dists, or the jar stub the probe just imported) keeps its __path__
    # and submodules — sys.modules["google.protobuf"] wins every lookup
    # regardless of parent. Only with no importable `google` at all does
    # cloudsdk's package stand in for the parent.
    g = sys.modules.get("google")
    if g is None:
        try:
            import google as g
        except ImportError:
            g = None
    if g is not None and getattr(g, "__path__", None) is not None:
        sys.modules["google.protobuf"] = _cpb
        g.protobuf = _cpb  # `from google import protobuf` reads the attr
    else:
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
