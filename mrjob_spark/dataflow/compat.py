"""Hadoop-version jobconf compatibility (reference ``mrjob/compat.py``).

Hadoop 2 renamed nearly every configuration property
(``mapred.reduce.tasks`` → ``mapreduce.job.reduces``); clusters accept
their own dialect and silently ignore the other. The reference keeps a
generated two-way table and (a) translates every user-supplied jobconf
key to the target cluster's dialect, warning about what changed
(``translate_jobconf_dict``), and (b) lets task code look a variable up
under ANY of its historical names (``jobconf_from_env`` — the idiom a
mapper uses to learn its input file). This module re-expresses that
contract.

The table here is a curated job-facing subset of the public Hadoop
"deprecated properties" mapping: the MR-space keys job authors actually
set or read through ``jobconf`` (task counts, memory/JVM opts,
compression, speculative execution, split sizes, streaming
partitioner/comparator options, task-identity variables). The
reference vendors the full ~260-row table including HDFS/daemon admin
keys (``dfs.*``); those are cluster-operator surface, not job surface,
and a job runner translating them would only mask misconfiguration —
unknown keys pass through untouched, exactly like the reference's
behavior for unrecognized names.

Scale note: translation is driver-side string work on a dict of a few
dozen entries; nothing here touches the data plane.
"""

from __future__ import annotations

import logging
import os
import re

_log = logging.getLogger(__name__)

#: (Hadoop 1.x name, Hadoop 2.x+ name) — public Hadoop
#: DeprecatedProperties mapping, job-facing subset
_JOBCONF_RENAMES = [
    # job shape
    ("mapred.map.tasks", "mapreduce.job.maps"),
    ("mapred.reduce.tasks", "mapreduce.job.reduces"),
    ("mapred.job.name", "mapreduce.job.name"),
    ("mapred.job.queue.name", "mapreduce.job.queuename"),
    ("mapred.job.priority", "mapreduce.job.priority"),
    ("mapred.jar", "mapreduce.job.jar"),
    ("user.name", "mapreduce.job.user.name"),
    # task execution
    ("mapred.task.timeout", "mapreduce.task.timeout"),
    ("mapred.map.max.attempts", "mapreduce.map.maxattempts"),
    ("mapred.reduce.max.attempts", "mapreduce.reduce.maxattempts"),
    ("mapred.map.tasks.speculative.execution", "mapreduce.map.speculative"),
    ("mapred.reduce.tasks.speculative.execution",
     "mapreduce.reduce.speculative"),
    ("mapred.job.reuse.jvm.num.tasks", "mapreduce.job.jvm.numtasks"),
    ("mapred.reduce.slowstart.completed.maps",
     "mapreduce.job.reduce.slowstart.completedmaps"),
    ("keep.failed.task.files", "mapreduce.task.files.preserve.failedtasks"),
    ("mapred.userlog.limit.kb", "mapreduce.task.userlog.limit.kb"),
    # memory / JVM
    ("mapred.map.child.java.opts", "mapreduce.map.java.opts"),
    ("mapred.reduce.child.java.opts", "mapreduce.reduce.java.opts"),
    ("mapred.job.map.memory.mb", "mapreduce.map.memory.mb"),
    ("mapred.job.reduce.memory.mb", "mapreduce.reduce.memory.mb"),
    ("io.sort.mb", "mapreduce.task.io.sort.mb"),
    ("io.sort.factor", "mapreduce.task.io.sort.factor"),
    # compression
    ("mapred.compress.map.output", "mapreduce.map.output.compress"),
    ("mapred.map.output.compression.codec",
     "mapreduce.map.output.compress.codec"),
    ("mapred.output.compress",
     "mapreduce.output.fileoutputformat.compress"),
    ("mapred.output.compression.codec",
     "mapreduce.output.fileoutputformat.compress.codec"),
    ("mapred.output.compression.type",
     "mapreduce.output.fileoutputformat.compress.type"),
    # input/output paths + splits
    ("mapred.input.dir", "mapreduce.input.fileinputformat.inputdir"),
    ("mapred.output.dir", "mapreduce.output.fileoutputformat.outputdir"),
    ("mapred.work.output.dir", "mapreduce.task.output.dir"),
    ("mapred.min.split.size",
     "mapreduce.input.fileinputformat.split.minsize"),
    ("mapred.max.split.size",
     "mapreduce.input.fileinputformat.split.maxsize"),
    # streaming sort/partition options (the SORT_VALUES machinery)
    ("mapred.text.key.partitioner.options",
     "mapreduce.partition.keypartitioner.options"),
    ("mapred.text.key.comparator.options",
     "mapreduce.partition.keycomparator.options"),
    ("mapred.output.key.comparator.class",
     "mapreduce.job.output.key.comparator.class"),
    # task-identity variables tasks READ (jobconf_from_env)
    ("mapred.job.id", "mapreduce.job.id"),
    ("mapred.task.id", "mapreduce.task.attempt.id"),
    ("mapred.tip.id", "mapreduce.task.id"),
    ("mapred.task.partition", "mapreduce.task.partition"),
    ("mapred.task.is.map", "mapreduce.task.ismap"),
    ("map.input.file", "mapreduce.map.input.file"),
    ("map.input.start", "mapreduce.map.input.start"),
    ("map.input.length", "mapreduce.map.input.length"),
    # distributed cache
    ("mapred.cache.files", "mapreduce.job.cache.files"),
    ("mapred.cache.archives", "mapreduce.job.cache.archives"),
    ("mapred.create.symlink", "mapreduce.job.cache.symlink.create"),
    # cluster addresses occasionally set per-job
    ("mapred.job.tracker", "mapreduce.jobtracker.address"),
    ("fs.default.name", "fs.defaultFS"),
    ("mapred.local.dir", "mapreduce.cluster.local.dir"),
    ("jobclient.output.filter", "mapreduce.client.output.filter"),
]

#: any historical name -> {"1.0": old, "2.0": new}
_COMPAT_MAP: dict = {}
for _old, _new in _JOBCONF_RENAMES:
    _entry = {"1.0": _old, "2.0": _new}
    _COMPAT_MAP[_old] = _entry
    _COMPAT_MAP[_new] = _entry


_VERSION_PART_RE = re.compile(r"(\d+)")


def _version_key(version: str) -> tuple:
    """Numeric-part tuple for comparison ('2.7.1' -> (2, 7, 1));
    non-numeric fragments are ignored (the job surface only needs
    major.minor.patch ordering, not full LooseVersion semantics)."""
    return tuple(int(p) for p in _VERSION_PART_RE.findall(version or ""))


def version_gte(version: str, cmp_version: str) -> bool:
    """``version >= cmp_version`` with zero-padded numeric comparison
    ('2' == '2.0.0' at the boundary — the emr.py release-label rule)."""
    a, b = _version_key(version), _version_key(cmp_version)
    width = max(len(a), len(b))
    return a + (0,) * (width - len(a)) >= b + (0,) * (width - len(b))


def uses_yarn(version: str) -> bool:
    """Hadoop 2+ runs YARN; so does the 0.23 series where YARN
    originated (the reference's exact gate)."""
    return version_gte(version, "2") or (
        version_gte(version, "0.23") and not version_gte(version, "1")
    )


def map_version(version: str, version_map: dict):
    """The value from *version_map* (version-string -> value) whose key
    is the newest one at or below *version*; below every key, the
    earliest entry wins."""
    if version is None:
        raise TypeError("version must be a string")
    if not version_map:
        raise ValueError("empty version_map")
    items = sorted(version_map.items(), key=lambda kv: _version_key(kv[0]))
    chosen = items[0][1]
    for key, value in items:
        if version_gte(version, key):
            chosen = value
    return chosen


def translate_jobconf(variable: str, version: str) -> str:
    """*variable* in the dialect Hadoop *version* accepts; unknown
    names pass through unchanged."""
    if version is None:
        raise TypeError("version must be a string")
    entry = _COMPAT_MAP.get(variable)
    if not entry:
        return variable
    return map_version(version, entry)


def translate_jobconf_for_all_versions(variable: str) -> list:
    """Every known name for *variable*, sorted (itself included)."""
    return sorted({variable, *(_COMPAT_MAP.get(variable) or {}).values()})


def translate_jobconf_dict(jobconf: dict, hadoop_version: str | None = None,
                           ) -> dict:
    """User jobconf plus the names the target cluster actually reads.

    With a known *hadoop_version*, each recognized key gains its
    translation for that version (and a warning names what changed —
    the reference's behavior, so a user setting ``mapred.reduce.tasks``
    against Hadoop 3 learns why it also appears as
    ``mapreduce.job.reduces``). With no version, every known variant is
    added, so whichever dialect the cluster speaks finds its name.
    Original keys are always preserved."""
    out = dict(jobconf)
    warnings = {}
    for variable, value in jobconf.items():
        if hadoop_version:
            variants = [translate_jobconf(variable, hadoop_version)]
        else:
            variants = translate_jobconf_for_all_versions(variable)
        for variant in variants:
            if variant in jobconf:
                continue
            out[variant] = value
            if hadoop_version:
                warnings[variable] = variant
    if warnings:
        _log.warning(
            "jobconf names translated for hadoop %s: %s",
            hadoop_version,
            ", ".join("%s -> %s" % kv for kv in sorted(warnings.items())),
        )
    return out


def jobconf_from_env(variable: str, default=None):
    """A jobconf variable from the task's environment (Hadoop exports
    jobconf with dots mapped to underscores), trying every historical
    name — ``jobconf_from_env('map.input.file')`` works on any cluster
    generation."""
    for name in [variable] + [
        v for v in (_COMPAT_MAP.get(variable) or {}).values()
        if v != variable
    ]:
        env_name = name.replace(".", "_")
        if env_name in os.environ:
            return os.environ[env_name]
    return default


def jobconf_from_dict(jobconf: dict, name: str, default=None):
    """Like :func:`jobconf_from_env` over an explicit dict."""
    if name in jobconf:
        return jobconf[name]
    for variant in (_COMPAT_MAP.get(name) or {}).values():
        if variant in jobconf:
            return jobconf[variant]
    return default
