"""Driver-side entry to the protobuf compatibility shim.

``mrjob_spark/_pbcompat/sitecustomize.py`` holds the actual installer
(self-contained, because worker interpreters import it via PYTHONPATH
before any of this package is importable). This module exposes it to the
engine: :func:`ensure_protobuf_compat` installs the alias in THIS
process and, when called before the JVM launches (session.py does),
prepends the shim directory to ``PYTHONPATH`` so every pyspark
daemon/worker the JVM forks runs the same installer at startup.
"""

from __future__ import annotations

import importlib.util
import os

_PBCOMPAT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "_pbcompat")


def _load_installer():
    spec = importlib.util.spec_from_file_location(
        "mrjob_spark._pbcompat_sitecustomize",
        os.path.join(_PBCOMPAT_DIR, "sitecustomize.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # import side effect: installs in-process
    return mod


def ensure_protobuf_compat() -> bool:
    """Best-effort: make ``google.protobuf`` importable here and in future
    Python workers. Returns True when protobuf (real or shimmed) is
    available in this process."""
    ok = _load_installer().install()
    if ok:
        # workers fork from the JVM's env: put the shim dir on PYTHONPATH
        # so their interpreters run sitecustomize too. Harmless with a
        # real protobuf (the installer no-ops), and a no-op if the JVM is
        # already up — callers that need worker coverage must run before
        # the first SparkSession, which session.get_spark() does.
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if _PBCOMPAT_DIR not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [_PBCOMPAT_DIR] + [p for p in parts if p]
            )
    return ok
