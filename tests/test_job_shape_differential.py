"""Enumerated job-SHAPE differential against the reference runner.

test_reference_differential.py pins hand-picked protocol-position cases;
this file closes the combinatorial gap: a small grammar of step shapes
(script/cmd mapper × combiner × script/cmd reducer, one and two steps)
crossed with INTERNAL/OUTPUT protocol choices and SORT_VALUES, with BOTH
sides rendered from the SAME class-body template — so the only degree of
freedom is each engine's wire plumbing (``ProtocolPlan`` /
``pick_protocols``, reference ``mrjob/job.py:983-1050``). The job's
functions are type-observing (they record ``type(value).__name__``
into the output), so a wrong or missing wire crossing — tuple surviving
where JSON must have turned it into a list, a cmd decoded with the
wrong protocol — flips actual output values, not just bytes.

Each case asserts reference(-r local) == ours(inline) == ours(local);
a Spark-runner spot-check covers three representative shapes (the full
matrix would pay ~3 s of job setup per case for plumbing already pinned
by the shared ``_compile_step`` decisions these runners mirror).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import pytest

REFERENCE = os.environ.get("MRJOB_REFERENCE_PATH", "/root/reference")

if not os.path.isdir(os.path.join(REFERENCE, "mrjob")):  # pragma: no cover
    pytest.skip("reference not available", allow_module_level=True)

LINES = [
    "apple banana apple",
    "Cherry date",
    "banana!  apple",
    "",
    "dog Cat apple cat",
]

# The shared class body. xmapper tokenizes raw lines (str value <=> the
# pair came off a RawValue/INPUT wire) and passes anything else through
# with a type observation; xcombiner is associative/commutative (safe
# under any spill/merge schedule) and records the wire type it saw;
# xreducer aggregates order-invariantly and observes both value and key
# types. All three therefore produce identical results across task
# placements but DIFFERENT results across wire-protocol choices — which
# is the thing under test.
_BODY = """\
    def xmapper(self, key, value):
        if isinstance(value, str):
            for w in value.split():
                yield w.lower(), (1, "m")
        else:
            yield key, (value[0], type(value).__name__)

    def xcombiner(self, key, values):
        tot, tags = 0, []
        for v in values:
            tot += int(v[0])
            tags.append(type(v).__name__)
        yield key, (tot, min(tags))

    def xreducer(self, key, values):
        vs = list(values)
        if vs and isinstance(vs[0], str):
            yield key, [len(vs), min(vs), type(key).__name__]
        else:
            tot = sum(int(v[0]) for v in vs)
            tag = min(type(v).__name__ for v in vs)
            yield key, [tot, tag, type(key).__name__]
"""

_SHAPE_STEPS = {
    "M": "MRStep(mapper=self.xmapper)",
    "MC": "MRStep(mapper=self.xmapper, combiner=self.xcombiner)",
    "MR": "MRStep(mapper=self.xmapper, reducer=self.xreducer)",
    "MCR": (
        "MRStep(mapper=self.xmapper, combiner=self.xcombiner, "
        "reducer=self.xreducer)"
    ),
    "R": "MRStep(reducer=self.xreducer)",
    "CM": "MRStep(mapper_cmd='sed -n /a/p')",
    "CM_R": "MRStep(mapper_cmd='sed -n /a/p', reducer=self.xreducer)",
    # plain `sort`: the reference's local runner exec's cmds WITHOUT a
    # shell (no env-prefix syntax); both engines inherit this process's
    # locale so collation is identical on both sides anyway
    "M_CR": "MRStep(mapper=self.xmapper, reducer_cmd='sort')",
    "PFM_R": ("MRStep(mapper=self.xmapper, mapper_pre_filter='sed -n /a/p',"
              " reducer=self.xreducer)"),
    "M_PFR": ("MRStep(mapper=self.xmapper, reducer=self.xreducer,"
              " reducer_pre_filter='sed -n /a/p')"),
}

_REF_TEMPLATE = """\
from mrjob.job import MRJob
from mrjob.protocol import (
    JSONProtocol, JSONValueProtocol, PickleProtocol, PickleValueProtocol,
    ReprProtocol, ReprValueProtocol,
)
from mrjob.step import MRStep


class GenJob(MRJob):
    {input_decl}
    INTERNAL_PROTOCOL = {internal}
    OUTPUT_PROTOCOL = {output}
    SORT_VALUES = {sort_values}

{body}
    def steps(self):
        return [{steps}]


if __name__ == '__main__':
    GenJob.run()
"""

_OURS_TEMPLATE = """\
from mrjob_spark.dataflow.job import SparkMRJob
from mrjob_spark.dataflow.protocols import (
    JSONProtocol, JSONValueProtocol, PickleProtocol, PickleValueProtocol,
    ReprProtocol, ReprValueProtocol,
)
from mrjob_spark.dataflow.step import MRStep


class GenJob(SparkMRJob):
    {input_decl}
    INTERNAL_PROTOCOL = {internal}
    OUTPUT_PROTOCOL = {output}
    SORT_VALUES = {sort_values}

{body}
    def steps(self):
        return [{steps}]
"""


def _render(template: str, shapes, internal: str, output: str,
            sort_values: bool, in_proto: str = "default") -> str:
    return template.format(
        input_decl=(
            "# default INPUT (RawValue)" if in_proto == "default"
            else f"INPUT_PROTOCOL = {in_proto}"
        ),
        internal=internal,
        output=output,
        sort_values=sort_values,
        body=_BODY,
        steps=", ".join(_SHAPE_STEPS[s] for s in shapes),
    )


def _our_job_cls(shapes, internal, output, sort_values,
                 in_proto: str = "default"):
    ns: dict = {}
    exec(_render(_OURS_TEMPLATE, shapes, internal, output, sort_values,
                 in_proto), ns)
    return ns["GenJob"]


def _out_proto(output: str):
    from mrjob_spark.dataflow import protocols as p

    return {"JSONProtocol": p.JSONProtocol,
            "JSONValueProtocol": p.JSONValueProtocol,
            "PickleProtocol": p.PickleProtocol,
            "PickleValueProtocol": p.PickleValueProtocol,
            "ReprProtocol": p.ReprProtocol,
            "ReprValueProtocol": p.ReprValueProtocol}[output]()


def _render_input_lines(in_proto: str) -> list[str]:
    if in_proto == "JSONValueProtocol":
        import json as _json

        return [_json.dumps(ln) for ln in LINES]
    return LINES


def _run_reference(shapes, internal, output, sort_values,
                   in_proto: str = "default"):
    src = _render(_REF_TEMPLATE, shapes, internal, output, sort_values,
                  in_proto)
    d = tempfile.mkdtemp(prefix="refshape_")
    script = os.path.join(d, "gen_job.py")
    with open(script, "w") as fh:
        fh.write(src)
    inp = os.path.join(d, "input.txt")
    with open(inp, "w") as fh:
        fh.write("\n".join(_render_input_lines(in_proto)) + "\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = REFERENCE + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, script, "-r", "local", "--no-conf", inp],
        capture_output=True, env=env, timeout=180,
    )
    assert proc.returncode == 0, proc.stderr.decode("utf-8", "replace")
    read = _out_proto(output).read
    return sorted(
        (read(ln) for ln in proc.stdout.splitlines() if ln), key=repr
    )


def _input_file(tmp_path, in_proto: str = "default"):
    p = tmp_path / "input.txt"
    p.write_text("\n".join(_render_input_lines(in_proto)) + "\n")
    return str(p)


def _run_ours(job_cls, path, make: str):
    job = job_cls()
    runner_factory = getattr(job, f"make_{make}_runner")
    with runner_factory(input_paths=[path]) as r:
        r.run()
        return sorted((tuple(kv) for kv in r.cat_output()), key=repr)


# (shapes, INTERNAL, OUTPUT, SORT_VALUES) — chosen to cover: every shape
# at least once; script substeps in first/middle/last protocol position;
# cmds before, between, and after script substeps; tuple-preserving
# (Pickle/Repr) vs tuple-flattening (JSON) wires; SORT_VALUES on the
# combiner and plain paths. Cmd-bearing cases stay on JSON wires: the
# two engines' pickle BYTES may differ legitimately (pickle protocol
# version), so content-sensitive shell filters only see JSON, which IS
# byte-pinned (test_json_protocol_bytes_match_reference).
CASES = [
    (("M",), "JSONProtocol", "JSONProtocol", False),
    (("M",), "PickleProtocol", "ReprProtocol", False),
    (("R",), "JSONProtocol", "JSONProtocol", False),
    # NOT here: terminal ("MC",) — a combiner with no reducer emits
    # per-task PARTIAL aggregates, so its output depends on task
    # placement by the reference's own semantics (its inline and local
    # runners disagree with each other); only compositions that
    # re-aggregate downstream, like (MC, MR) below, are differentiable.
    (("MR",), "JSONProtocol", "JSONProtocol", True),
    (("MCR",), "PickleProtocol", "JSONProtocol", False),
    (("MCR",), "JSONProtocol", "ReprProtocol", True),
    (("M_CR",), "JSONProtocol", "JSONProtocol", False),
    (("CM_R",), "JSONProtocol", "JSONProtocol", False),
    (("MR", "MR"), "JSONProtocol", "JSONProtocol", False),
    (("MR", "MR"), "PickleProtocol", "ReprProtocol", False),
    (("MR", "R"), "JSONProtocol", "JSONProtocol", False),
    (("MCR", "MR"), "JSONProtocol", "JSONProtocol", True),
    (("M", "MR"), "PickleProtocol", "JSONProtocol", False),
    (("MR", "M"), "JSONProtocol", "ReprProtocol", False),
    (("MR", "CM"), "JSONProtocol", "JSONProtocol", False),
    (("CM", "MR"), "JSONProtocol", "JSONProtocol", False),
    (("M_CR", "R"), "JSONProtocol", "JSONProtocol", False),
    (("MR", "M_CR"), "JSONProtocol", "ReprProtocol", False),
    (("R", "R"), "JSONProtocol", "JSONProtocol", False),
    (("MR", "CM_R"), "JSONProtocol", "JSONProtocol", False),
    (("MC", "MR"), "JSONProtocol", "JSONProtocol", False),
    # value-only wires (ADVICE r6: these crossings ERASE the key). A
    # value-only INTERNAL makes the byte group key the written VALUE, so
    # cases stay combiner-free with placement-invariant value bytes
    # (xmapper emits the same (1, "m") for every word → one reduce
    # group); a value-only OUTPUT is the exact cat_output repro that
    # caught PickleValueProtocol's inherited identity roundtrip.
    (("MR",), "JSONProtocol", "PickleValueProtocol", False),
    (("MR",), "JSONValueProtocol", "JSONProtocol", False),
    (("MR", "MR"), "PickleValueProtocol", "ReprValueProtocol", False),
    (("MR",), "ReprValueProtocol", "JSONValueProtocol", True),
]

_IDS = [
    "+".join(shapes) + f"-{i[:-8].lower()}-{o[:-8].lower()}"
    + ("-sv" if sv else "")
    for shapes, i, o, sv in CASES
]


@pytest.mark.parametrize(
    "shapes,internal,output,sort_values", CASES, ids=_IDS
)
def test_job_shape_matches_reference(
    tmp_path, shapes, internal, output, sort_values
):
    ref = _run_reference(shapes, internal, output, sort_values)
    cls = _our_job_cls(shapes, internal, output, sort_values)
    path = _input_file(tmp_path)
    ours_inline = _run_ours(cls, path, "inline")
    assert ours_inline == ref, "inline diverged from reference"
    ours_local = _run_ours(cls, path, "local")
    assert ours_local == ref, "local diverged from reference"


_SPARK_CASES = [
    (("MCR",), "PickleProtocol", "JSONProtocol", False),
    (("CM", "MR"), "JSONProtocol", "JSONProtocol", False),
    (("MR", "M_CR"), "JSONProtocol", "ReprProtocol", False),
    # the Spark runner applies the same crossing()/roundtrip at task
    # boundaries — a value-only wire must erase keys there too (the
    # ADVICE r6 fix rides Protocol.roundtrip, shared by all runners)
    (("MR",), "PickleValueProtocol", "JSONValueProtocol", False),
]


@pytest.mark.parametrize(
    "shapes,internal,output,sort_values",
    _SPARK_CASES,
    ids=["+".join(c[0]) for c in _SPARK_CASES],
)
def test_job_shape_spark_matches_reference(
    spark, tmp_path, shapes, internal, output, sort_values
):
    ref = _run_reference(shapes, internal, output, sort_values)
    cls = _our_job_cls(shapes, internal, output, sort_values)
    path = _input_file(tmp_path)
    with cls().make_runner(spark, input_paths=[path]) as r:
        r.run()
        ours = sorted((tuple(kv) for kv in r.cat_output()), key=repr)
    assert ours == ref, "spark runner diverged from reference"


# Extended cases: non-default INPUT protocol (the job's first script
# substep decodes real JSON values instead of raw lines) and shell
# pre-filters in raw (step-0), reducer-input, and mid-job (step-1
# INTERNAL-encoded lines) positions. Cmd filters stay on JSON wires —
# byte-pinned across engines — per the same policy as CASES.
CASES_EXT = [
    (("M",), "JSONProtocol", "JSONProtocol", False, "JSONValueProtocol"),
    (("MR",), "JSONProtocol", "JSONProtocol", False, "JSONValueProtocol"),
    (("MCR", "MR"), "PickleProtocol", "JSONProtocol", False,
     "JSONValueProtocol"),
    (("PFM_R",), "JSONProtocol", "JSONProtocol", False, "default"),
    (("M_PFR",), "JSONProtocol", "JSONProtocol", False, "default"),
    (("MR", "PFM_R"), "JSONProtocol", "JSONProtocol", True, "default"),
]

_IDS_EXT = [
    "+".join(shapes) + f"-in_{ip[:-8].lower() if ip != 'default' else 'raw'}"
    + ("-sv" if sv else "")
    for shapes, i, o, sv, ip in CASES_EXT
]


@pytest.mark.parametrize(
    "shapes,internal,output,sort_values,in_proto", CASES_EXT, ids=_IDS_EXT
)
def test_job_shape_ext_matches_reference(
    tmp_path, shapes, internal, output, sort_values, in_proto
):
    ref = _run_reference(shapes, internal, output, sort_values, in_proto)
    cls = _our_job_cls(shapes, internal, output, sort_values, in_proto)
    path = _input_file(tmp_path, in_proto)
    ours_inline = _run_ours(cls, path, "inline")
    assert ours_inline == ref, "inline diverged from reference"
    ours_local = _run_ours(cls, path, "local")
    assert ours_local == ref, "local diverged from reference"


# -r hadoop spot-check (round 7): the same grammar through the fourth
# runner against the executing mock cluster. Representative shapes only
# (each case pays several seconds of sequential task re-entry in the
# mock): a combiner chain on a tuple-preserving internal wire, a cmd
# mapper feeding a script reducer, a two-step chain with a cmd reducer
# in the middle, a value-only wire crossing (key erasure must survive
# Hadoop's byte shuffle), and the SORT_VALUES path (partitioner +
# key-fields jobconf really changing grouping).
_HADOOP_CASES = [
    (("MCR",), "PickleProtocol", "JSONProtocol", False),
    (("CM_R",), "JSONProtocol", "JSONProtocol", False),
    (("MR", "M_CR"), "JSONProtocol", "ReprProtocol", False),
    (("MR",), "JSONValueProtocol", "JSONProtocol", False),
    (("MR",), "JSONProtocol", "JSONProtocol", True),
]


@pytest.mark.parametrize(
    "shapes,internal,output,sort_values",
    _HADOOP_CASES,
    ids=["+".join(c[0]) + ("-sv" if c[3] else "") for c in _HADOOP_CASES],
)
def test_job_shape_hadoop_matches_reference(
    tmp_path, shapes, internal, output, sort_values
):
    from mrjob_spark.testing.cluster import MockHadoopCluster

    ref = _run_reference(shapes, internal, output, sort_values)
    cls = _our_job_cls(shapes, internal, output, sort_values)
    path = _input_file(tmp_path)
    cluster = MockHadoopCluster(tmp_path / "cluster")
    with cluster.runner(cls(), input_paths=[path]) as r:
        r.run()
        ours = sorted((tuple(kv) for kv in r.cat_output()), key=repr)
    assert ours == ref, "hadoop runner diverged from reference"
