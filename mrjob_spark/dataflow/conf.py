"""mrjob.conf-compatible config files (``mrjob/conf.py``).

A real mrjob user carries a ``~/.mrjob.conf`` that sets jobconf knobs,
task environment variables, and files to ship for every job; switching
engines must not orphan it. This module reproduces the reference's
config *behavior* on the dataflow CLI:

* discovery: ``$MRJOB_CONF`` → ``~/.mrjob.conf`` → ``/etc/mrjob.conf``
  (``mrjob/conf.py:42-69``);
* YAML (or JSON — a YAML subset) with a ``runners: {<alias>: {...}}``
  layout; opts are read for the runner alias in use;
* ``include:`` (string or list), resolved relative to the *real* path of
  the including file, loaded depth-first with the including file taking
  precedence, later includes beating earlier ones, and each real path
  loaded at most once even through symlink cycles
  (``mrjob/conf.py:263-305``);
* option-type-aware combination (``mrjob/conf.py:378-540``): plain values
  take the last non-``None``; list opts concatenate (base config's
  entries first); ``jobconf`` dict-merges with values coerced to
  Java-style strings and ``None`` deleting a key; ``cmdenv`` dict-merges
  with ``*PATH`` variables *prepended* with ``:`` instead of replaced;
  the ``!clear`` YAML tag deletes an inherited value instead of merging
  with it.

Precedence overall: CLI switch > job class attribute > config file (the
reference's documented order). The engine-level knobs a config can set
are exactly the :class:`SparkJobRunner` kwargs plus the reference's
``upload_files``/``upload_archives``/``upload_dirs`` spellings.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Optional

__all__ = [
    "ClearedValue",
    "combine_dicts",
    "combine_envs",
    "combine_jobconfs",
    "combine_lists",
    "combine_opts",
    "combine_values",
    "find_mrjob_conf",
    "load_runner_opts",
]


class ClearedValue:
    """Wrapper produced by the ``!clear`` YAML tag: replace/delete the
    inherited value instead of combining with it (``mrjob/conf.py``'s
    ClearedValue)."""

    def __init__(self, value: Any):
        self.value = value

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"ClearedValue({self.value!r})"


def _expand(path: str) -> str:
    return os.path.expanduser(os.path.expandvars(path))


def find_mrjob_conf() -> Optional[str]:
    """First existing config among ``$MRJOB_CONF``, ``~/.mrjob.conf``,
    ``/etc/mrjob.conf`` — or ``None`` (auto-configuration)."""
    candidates = []
    if "MRJOB_CONF" in os.environ:
        candidates.append(_expand(os.environ["MRJOB_CONF"]))
    candidates.append(_expand(os.path.join("~", ".mrjob.conf")))
    candidates.append("/etc/mrjob.conf")
    for path in candidates:
        if os.path.exists(path):
            return path
    return None


def _parse_conf(path: str) -> dict:
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _clear(loader, node):
        if isinstance(node, yaml.ScalarNode):
            v = loader.construct_scalar(node)
            return ClearedValue(None if v in ("", "null", "~", None) else v)
        if isinstance(node, yaml.SequenceNode):
            return ClearedValue(loader.construct_sequence(node, deep=True))
        return ClearedValue(loader.construct_mapping(node, deep=True))

    _Loader.add_constructor("!clear", _clear)
    with open(path) as fh:
        data = yaml.load(fh, Loader=_Loader)
    if not isinstance(data, dict):
        raise ValueError(f"{path}: expected a mapping at top level")
    return data


def _load_chain(
    runner_alias: str, conf_path: str, seen: list[str]
) -> list[dict]:
    """Opts dicts lowest-precedence first: includes, then this file."""
    real = os.path.realpath(conf_path)
    if real in seen:
        return []
    seen.append(real)
    conf = _parse_conf(conf_path)

    runners = conf.get("runners") or {}
    values = runners.get(runner_alias) or {}

    includes = conf.get("include") or []
    if isinstance(includes, str):
        includes = [includes]
    # includes are lower precedence than this file; among themselves,
    # later includes win. Like the reference (mrjob/conf.py:292-301), walk
    # them in REVERSE for dedup (a file shared between two includes counts
    # at its higher-precedence position) while keeping the emitted chain
    # in original include order.
    chain: list[dict] = []
    for inc in reversed(includes):
        inc_path = os.path.join(os.path.dirname(real), _expand(inc))
        chain = _load_chain(runner_alias, inc_path, seen) + chain
    chain.append(values)
    return chain


# ---------------------------------------------------------------------------
# combiners (mrjob/conf.py:378-540 semantics)
# ---------------------------------------------------------------------------


def _strip(v: Any) -> Any:
    return v.value if isinstance(v, ClearedValue) else v


def combine_values(*values: Any) -> Any:
    """Last non-``None`` value wins (the default combiner)."""
    out = None
    for v in values:
        if isinstance(v, ClearedValue):
            out = v.value
        elif v is not None:
            out = v
    return out


def combine_lists(*seqs: Any) -> list:
    """Concatenate (``None`` skipped; scalars/strings/dicts are single
    items; a ``!clear`` entry drops everything inherited so far)."""
    out: list = []
    for seq in seqs:
        if isinstance(seq, ClearedValue):
            out = []
            seq = seq.value
        if seq is None:
            continue
        if isinstance(seq, (str, bytes, dict)):
            out.append(seq)
        else:
            try:
                out.extend(seq)
            except TypeError:
                out.append(seq)
    return out


def combine_dicts(*dicts: Any) -> dict:
    """Per-key merge, later dicts win; ``!clear null`` deletes a key."""
    out: dict = {}
    for d in dicts:
        if isinstance(d, ClearedValue):
            out = {}
            d = d.value
        if not d:
            continue
        for k, v in d.items():
            if isinstance(v, ClearedValue) and v.value is None:
                out.pop(k, None)
            else:
                out[k] = _strip(v)
    return out


def combine_envs(*envs: Any) -> dict:
    """Like :func:`combine_dicts`, but ``*PATH`` values PREPEND with ``:``
    instead of replacing (``mrjob/conf.py:457-505``), so a job-level PATH
    extends the config-level one."""
    out: dict = {}
    for env in envs:
        if isinstance(env, ClearedValue):
            out = {}
            env = env.value
        if not env:
            continue
        for k, v in env.items():
            if isinstance(v, ClearedValue):
                if v.value is None:
                    out.pop(k, None)
                else:
                    out[k] = v.value
            elif k.endswith("PATH") and out.get(k):
                out[k] = f"{v}:{out[k]}"
            else:
                out[k] = v
    return out


def _java_str(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def combine_jobconfs(*jobconfs: Any) -> dict:
    """Dict merge with Java-readable string coercion; ``None`` values
    blank their key out (``mrjob/conf.py:508-516``)."""
    merged = combine_dicts(*jobconfs)
    return {k: _java_str(v) for k, v in merged.items() if v is not None}


def _combine_path_lists(*seqs: Any) -> list:
    out: list = []
    for path in combine_lists(*seqs):
        expanded = _expand(path)
        out.extend(sorted(glob.glob(expanded)) or [expanded])
    return out


#: opt name -> combiner. Everything else uses combine_values.
_OPT_COMBINERS = {
    "jobconf": combine_jobconfs,
    "cmdenv": combine_envs,
    "upload_files": _combine_path_lists,
    "upload_archives": _combine_path_lists,
    "upload_dirs": _combine_path_lists,
    "files": _combine_path_lists,
    "archives": _combine_path_lists,
    "dirs": _combine_path_lists,
    "py_files": _combine_path_lists,
    "setup": combine_lists,
}


def combine_opts(*opt_dicts: dict) -> dict:
    """Combine whole opt dicts, choosing the right combiner per option."""
    keys: list[str] = []
    for d in opt_dicts:
        for k in d or {}:
            if k not in keys:
                keys.append(k)
    return {
        k: _OPT_COMBINERS.get(k, combine_values)(
            *[(d or {}).get(k) for d in opt_dicts]
        )
        for k in keys
    }


def load_runner_opts(
    runner_alias: str, conf_paths: Optional[list[str]] = None
) -> dict:
    """The combined opts for one runner alias.

    ``conf_paths=None`` → auto-discover (:func:`find_mrjob_conf`; missing
    = ``{}``). An explicit list loads left-to-right with later paths
    taking precedence, includes resolved beneath each.
    """
    if conf_paths is None:
        found = find_mrjob_conf()
        conf_paths = [found] if found else []
    seen: list[str] = []
    chain: list[dict] = []
    # reversed for dedup, original order for precedence — same move as
    # includes (mrjob/conf.py:306-340)
    for path in reversed(conf_paths):
        chain = _load_chain(runner_alias, _expand(path), seen) + chain
    return combine_opts(*chain)
