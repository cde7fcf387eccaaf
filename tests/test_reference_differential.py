"""Property-based differential tests against the REFERENCE implementation.

`compare_reference.py` proves output equality on the fixture corpus;
these tests prove it on ADVERSARIAL inputs: hypothesis generates small
random documents and the same job runs through the reference's own
inline runner (imported from ``$MRJOB_REFERENCE_PATH``, executed — never
copied) and through this engine's inline runner, asserting identical
output pairs. The reference is the executable specification here — any
divergence in tokenization, combiner algebra, or multi-step plumbing
surfaces as a failing example, minimized by hypothesis.

Scope note: the reference jobs used are its own examples
(``mrjob/examples/mr_word_freq_count.py``); our side runs the
semantically identical port from ``dataflow/examples.py``. The
reference's inline runner is pure single-process Python, so these cases
are fast enough for property testing; the Spark-runner equivalence is
covered separately by test_inline.py's ours-vs-ours differentials.
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

REFERENCE = os.environ.get("MRJOB_REFERENCE_PATH", "/root/reference")

if not os.path.isdir(os.path.join(REFERENCE, "mrjob")):  # pragma: no cover
    pytest.skip("reference not available", allow_module_level=True)

sys.path.insert(0, REFERENCE)


def _run_reference(job_cls, lines: list[str], runner: str = "inline") -> list[tuple]:
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
        path = fh.name
    try:
        job = job_cls(args=["-r", runner, "--no-conf", path])
        with job.make_runner() as r:
            r.run()
            return sorted(job.parse_output(r.cat_output()))
    finally:
        os.unlink(path)


def _run_ours_inline(job_cls, lines: list[str]) -> list[tuple]:
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
        path = fh.name
    try:
        with job_cls().make_inline_runner(input_paths=[path]) as r:
            r.run()
            return sorted(tuple(kv) for kv in r.cat_output())
    finally:
        os.unlink(path)


def _run_ours_local(job_cls, lines: list[str]) -> list[tuple]:
    """Same differential through the subprocess-per-task LOCAL runner
    (round 6) — the third runner beside reference-inline and ours-inline;
    every case asserts all three agree."""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
        path = fh.name
    try:
        with job_cls().make_local_runner(input_paths=[path]) as r:
            r.run()
            return sorted(tuple(kv) for kv in r.cat_output())
    finally:
        os.unlink(path)


# printable-ish lines: words, digits, punctuation, apostrophes — the
# space where tokenizer semantics can diverge
_line = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
        + list("0123456789")
        + list(" '.,-_!?:;")
    ),
    max_size=60,
)


@given(lines=st.lists(_line, max_size=12))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_wordcount_matches_reference_on_random_text(lines):
    # the flagship example: mapper + combiner + reducer. The reference's
    # WORD_RE is [\w']+ — our port in compare_reference-style parity form
    # must produce identical (word, count) pairs for ANY input text
    from mrjob.examples.mr_word_freq_count import MRWordFreqCount as RefWC

    from mrjob_spark.dataflow import SparkMRJob

    import re

    word_re = re.compile(r"[\w']+")

    class OurWC(SparkMRJob):
        def mapper(self, _, line):
            for word in word_re.findall(line):
                yield word.lower(), 1

        def combiner(self, word, counts):
            yield word, sum(counts)

        def reducer(self, word, counts):
            yield word, sum(counts)

    ref = _run_reference(RefWC, lines)
    assert ref == _run_ours_inline(OurWC, lines)
    assert ref == _run_ours_local(OurWC, lines)


@given(lines=st.lists(_line, min_size=1, max_size=8))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_most_used_word_matches_reference_on_random_text(lines):
    # two-step chain (count → global argmax) with the REFERENCE's own
    # stop-word side file shipped via FILES and loaded in mapper_init:
    # exercises multi-step plumbing, file shipping, and max() tie
    # behavior end-to-end. The parity twin replicates the reference
    # exactly (its example crashes on all-stopword input — max of [] —
    # so inputs guarantee one token). The reference's JSONValueProtocol
    # output keeps only the VALUE (the word), so values are compared.
    import re

    from mrjob.examples.mr_most_used_word import MRMostUsedWord as RefMUW

    from mrjob_spark.dataflow import MRStep, SparkMRJob

    stop_path = os.path.join(REFERENCE, "mrjob", "examples", "stop_words.txt")
    stop_words = {l.strip() for l in open(stop_path)}
    word_re = re.compile(r"[\w']+")

    has_token = any(
        w.lower() not in stop_words
        for line in lines
        for w in word_re.findall(line)
    )
    if not has_token:
        lines = lines + ["zebra"]

    class OurMUW(SparkMRJob):
        FILES = [stop_path]

        def steps(self):
            return [
                MRStep(
                    mapper_init=self.mapper_init,
                    mapper=self.mapper_get_words,
                    combiner=self.combiner_count_words,
                    reducer=self.reducer_count_words,
                ),
                MRStep(reducer=self.reducer_find_max_word),
            ]

        def mapper_init(self):
            with open("stop_words.txt") as f:
                self.stop_words = set(line.strip() for line in f)

        def mapper_get_words(self, _, line):
            for word in word_re.findall(line):
                word = word.lower()
                if word not in self.stop_words:
                    yield (word, 1)

        def combiner_count_words(self, word, counts):
            yield (word, sum(counts))

        def reducer_count_words(self, word, counts):
            yield None, (sum(counts), word)

        def reducer_find_max_word(self, _, word_count_pairs):
            try:
                yield max(word_count_pairs)
            except ValueError:
                pass

    ref = _run_reference(RefMUW, lines)
    ours = _run_ours_inline(OurMUW, lines)
    assert [v for _k, v in ref] == [v for _k, v in ours]
    ours_local = _run_ours_local(OurMUW, lines)
    assert [v for _k, v in ref] == [v for _k, v in ours_local]


@given(lines=st.lists(_line, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_next_word_stats_matches_reference_on_random_text(lines):
    # the reference's SORT_VALUES showcase: two chained steps, combiner,
    # tagged values, and a streaming reducer whose correctness depends on
    # encoded-byte value ordering delivering the 'A: total' record before
    # every 'B: stats' record. Byte-order divergence between the engines'
    # secondary sorts shows up as wrong percentages or a crash here.
    import re

    from mrjob.examples.mr_next_word_stats import MRNextWordStats as RefNWS

    from mrjob_spark.dataflow.examples import MRNextWordStats

    ref_word_re = re.compile(r"[\w']+")

    class OurNWS(MRNextWordStats):
        # parity twin: the repo port's registered query deliberately uses
        # the repo-wide [a-z]+ tokenizer (its oracle encodes it); the
        # differential overrides ONLY the tokenizer to the reference's
        # [\w']+ so the SORT_VALUES machinery is what's compared
        def m_find_words(self, _, line):
            prev = None
            for word in ref_word_re.findall(line):
                word = word.lower()
                if prev is not None:
                    yield (prev, "*"), 1
                    yield (prev, word), 1
                prev = word

    ref = _run_reference(RefNWS, lines)
    ours = _run_ours_inline(OurNWS, lines)
    # two representation deltas to normalize, neither semantic: the
    # reference's JSON protocol round-trips tuples to LISTS (ours keeps
    # native tuples in-memory), and percentages are raw doubles there vs
    # floor-rounded-to-6 here (documented portable-rounding choice)
    def canon(x):
        if isinstance(x, (list, tuple)):
            return [canon(i) for i in x]
        if isinstance(x, float):
            return round(x, 6)
        return x

    assert canon(ref) == canon(ours)
    assert canon(ref) == canon(_run_ours_local(OurNWS, lines))


# JSON-safe nested values: the space both JSONProtocols must agree on
_json_vals = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**31), max_value=2**31)
    | st.text(max_size=12),
    lambda children: st.lists(children, max_size=3)
    | st.dictionaries(st.text(max_size=6), children, max_size=3),
    max_leaves=6,
)


@given(key=_json_vals, value=_json_vals)
@settings(max_examples=50, deadline=None)
def test_json_protocol_bytes_match_reference(key, value):
    # byte-level wire parity of the default INTERNAL/OUTPUT protocol:
    # what jar steps, script steps, and any downstream consumer of a
    # job's output files actually see. The encodings must be mutually
    # readable AND canonically identical (tab-separated compact JSON),
    # or a reference-written step boundary misparses here and vice versa
    from mrjob.protocol import JSONProtocol as RefJSON

    from mrjob_spark.dataflow.protocols import JSONProtocol as OurJSON

    ref, ours = RefJSON(), OurJSON()
    ref_line = ref.write(key, value)
    our_line = ours.write(key, value)
    # cross-read: each engine parses the other's bytes to the same pair
    assert ref.read(our_line) == (key, value)
    assert ours.read(ref_line) == (key, value)


@given(
    lines=st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abcdefguU") + list(" '\t.,!\\\"$`")
            ),
            max_size=30,
        ),
        max_size=6,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pre_filter_matches_reference_on_adversarial_text(lines):
    # the shell pre-filter path (P4): raw lines flow through `grep -i u`
    # in a real /bin/sh pipeline on BOTH engines before the mapper. The
    # alphabet deliberately includes tabs, quotes, backslashes, backticks
    # and dollar signs — the characters that break naive shell quoting or
    # tab-splitting of raw streams. The reference's INLINE runner refuses
    # pre-filters (NotImplementedError), so its LOCAL runner
    # (multiprocessing + real pipes) is the specification here.
    import re

    from mrjob.examples.mr_words_containing_u_freq_count import (
        MRWordsContainingUFreqCount as RefU,
    )

    from mrjob_spark.dataflow import SparkMRJob

    u_word_re = re.compile(r"[\w']*u[\w']*", re.I)

    class OurU(SparkMRJob):
        mapper_pre_filter = "grep -i u"

        def mapper(self, _, line):
            for word in u_word_re.findall(line):
                yield word.lower(), 1

        def combiner(self, word, counts):
            yield word, sum(counts)

        def reducer(self, word, counts):
            yield word, sum(counts)

    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
        path = fh.name
    try:
        job = RefU(args=["-r", "local", "--no-conf", path])
        with job.make_runner() as r:
            r.run()
            ref = sorted(job.parse_output(r.cat_output()))
    finally:
        os.unlink(path)

    ours = _run_ours_inline(OurU, lines)
    assert ref == ours
    assert ref == _run_ours_local(OurU, lines)


_text_field = st.text(
    alphabet=st.characters(blacklist_characters="\n\r", codec="utf-8"),
    max_size=20,
)


@given(key=_text_field, value=_text_field)
@settings(max_examples=50, deadline=None)
def test_text_protocol_bytes_match_reference(key, value):
    # TextProtocol wire parity: UTF-8 fields tab-joined, read splits on
    # the FIRST tab (value keeps embedded tabs). Hadoop streaming's text
    # convention — the format *_cmd substeps and text sinks speak.
    from mrjob.protocol import TextProtocol as RefText

    from mrjob_spark.dataflow.protocols import TextProtocol as OurText

    ref, ours = RefText(), OurText()
    assert ref.write(key, value) == ours.write(key, value)
    line = ours.write(key, value)
    assert ref.read(line) == ours.read(line)


@given(lines=st.lists(_line, max_size=8))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_counters_match_reference_on_random_text(lines):
    # A8 differential: increment_counter calls from mapper AND reducer
    # must produce the same nested {group: {name: amount}} totals the
    # reference's inline runner reports for the same input
    import re
    import tempfile

    from mrjob.job import MRJob

    from mrjob_spark.dataflow import SparkMRJob

    word_re = re.compile(r"[\w']+")

    class RefCounted(MRJob):
        def mapper(self, _, line):
            self.increment_counter("input", "lines")
            for w in word_re.findall(line):
                self.increment_counter("input", "words")
                yield w.lower(), 1

        def reducer(self, word, counts):
            self.increment_counter("output", "distinct", 2)
            yield word, sum(counts)

    class OurCounted(SparkMRJob):
        def mapper(self, _, line):
            self.increment_counter("input", "lines")
            for w in word_re.findall(line):
                self.increment_counter("input", "words")
                yield w.lower(), 1

        def reducer(self, word, counts):
            self.increment_counter("output", "distinct", 2)
            yield word, sum(counts)

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
        path = fh.name
    try:
        job = RefCounted(args=["-r", "inline", "--no-conf", path])
        with job.make_runner() as r:
            r.run()
            ref_counters = r.counters()
    finally:
        os.unlink(path)
    ref_total: dict = {}
    for step in ref_counters:
        for group, names in step.items():
            for name, amount in names.items():
                ref_total.setdefault(group, {})
                ref_total[group][name] = (
                    ref_total[group].get(name, 0) + amount
                )

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
        path = fh.name
    try:
        with OurCounted().make_inline_runner(input_paths=[path]) as r:
            r.run()
            ours = r.counters()
    finally:
        os.unlink(path)

    assert ref_total == {g: dict(n) for g, n in ours.items()}

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
        path = fh.name
    try:
        with OurCounted().make_local_runner(input_paths=[path]) as r:
            r.run()
            local_counters = r.counters()
    finally:
        os.unlink(path)
    assert ref_total == {g: dict(n) for g, n in local_counters.items()}


@given(
    contents=st.lists(
        st.text(
            alphabet=st.sampled_from(list("abc \t.")), max_size=25
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mapper_raw_matches_reference_on_random_files(contents):
    # the whole-file path (S4, mapper_raw): each input FILE is handed to
    # the mapper as a local path + URI. Both engines must deliver every
    # file exactly once with identical bytes — divergence in file
    # delivery, trailing-newline handling, or per-file isolation shows up
    # as differing digests. One temp file per hypothesis-generated text.
    import hashlib
    import tempfile

    from mrjob.job import MRJob

    from mrjob_spark.dataflow import SparkMRJob

    class RefRaw(MRJob):
        def mapper_raw(self, path, uri):
            with open(path, "rb") as fh:
                data = fh.read()
            yield hashlib.md5(data).hexdigest(), len(data)

        def reducer(self, digest, sizes):
            yield digest, sum(sizes)

    class OurRaw(SparkMRJob):
        def mapper_raw(self, path, uri):
            with open(path, "rb") as fh:
                data = fh.read()
            yield hashlib.md5(data).hexdigest(), len(data)

        def reducer(self, digest, sizes):
            yield digest, sum(sizes)

    paths = []
    try:
        for text in contents:
            fh = tempfile.NamedTemporaryFile(
                "w", suffix=".txt", delete=False
            )
            fh.write(text)
            fh.close()
            paths.append(fh.name)

        job = RefRaw(args=["-r", "inline", "--no-conf"] + paths)
        with job.make_runner() as r:
            r.run()
            ref = sorted(job.parse_output(r.cat_output()))

        with OurRaw().make_inline_runner(input_paths=list(paths)) as r:
            r.run()
            ours = sorted(tuple(kv) for kv in r.cat_output())

        with OurRaw().make_local_runner(input_paths=list(paths)) as r:
            r.run()
            ours_local = sorted(tuple(kv) for kv in r.cat_output())
    finally:
        for p in paths:
            os.unlink(p)

    assert ref == ours
    assert ref == ours_local


@given(lines=st.lists(_line, min_size=1, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_wire_type_semantics_match_reference(lines):
    # the INTERNAL wire normalizes Python types (JSON: tuple→list, int
    # dict keys→str) and user code CAN observe that — this job yields
    # tuple values and a dict with an int key from the mapper, and the
    # reducer reports exactly what types arrive. The reference serializes
    # at every task boundary; our -r local moves real bytes; inline and
    # the Spark runner apply Protocol.roundtrip at the same boundaries.
    # All three of ours must agree with the reference.
    from mrjob.job import MRJob

    from mrjob_spark.dataflow.job import SparkMRJob

    class RefTypes(MRJob):
        def mapper(self, _, line):
            for w in line.split():
                yield w.lower(), (1, {1: len(w)})

        def combiner(self, word, vals):
            vals = list(vals)
            yield word, (len(vals), vals[0][1])

        def reducer(self, word, vals):
            vals = list(vals)
            yield word, [
                type(vals[0]).__name__,
                type(vals[0][1]).__name__,
                sorted(vals[0][1].keys()),
                sum(v[0] for v in vals),
            ]

    class OurTypes(SparkMRJob):
        mapper = RefTypes.mapper
        combiner = RefTypes.combiner
        reducer = RefTypes.reducer

    ref = _run_reference(RefTypes, lines)
    ours_inline = _run_ours_inline(OurTypes, lines)
    ours_local = _run_ours_local(OurTypes, lines)
    assert ours_inline == ref
    assert ours_local == ref


_picklable = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**40), max_value=2**40)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=10)
    | st.binary(max_size=8),
    lambda c: st.lists(c, max_size=3)
    | st.tuples(c, c)
    | st.dictionaries(st.integers(min_value=0, max_value=9) | st.text(max_size=4), c, max_size=3),
    max_leaves=5,
)


@given(key=_picklable, value=_picklable)
@settings(max_examples=50, deadline=None)
def test_pickle_protocol_cross_reads_reference(key, value):
    # wire COMPATIBILITY (not byte identity — pickle has many valid
    # encodings per object): intermediate data written by a reference job
    # with PickleProtocol must read back identically through ours, and
    # vice versa — including the types JSON can't carry (tuples, bytes,
    # int dict keys)
    from mrjob.protocol import PickleProtocol as RefPickle

    from mrjob_spark.dataflow.protocols import PickleProtocol as OurPickle

    ref, ours = RefPickle(), OurPickle()
    assert ref.read(ours.write(key, value)) == (key, value)
    assert ours.read(ref.write(key, value)) == (key, value)


_reprable = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**40), max_value=2**40)
    | st.text(max_size=8)
    | st.binary(max_size=6),
    lambda c: st.lists(c, max_size=3) | st.tuples(c, c),
    max_leaves=5,
)


@given(key=_reprable, value=_reprable)
@settings(max_examples=50, deadline=None)
def test_repr_protocol_bytes_match_reference(key, value):
    # repr is canonical per Python version, so this one IS byte-identical
    # both ways, and each side parses the other's bytes
    from mrjob.protocol import ReprProtocol as RefRepr

    from mrjob_spark.dataflow.protocols import ReprProtocol as OurRepr

    ref, ours = RefRepr(), OurRepr()
    ref_line, our_line = ref.write(key, value), ours.write(key, value)
    assert ref_line == our_line
    assert ref.read(our_line) == (key, value)
    assert ours.read(ref_line) == (key, value)


@given(lines=st.lists(_line, min_size=1, max_size=6))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_map_only_pickle_output_matches_reference(lines):
    # a FINAL map-only step writes straight through OUTPUT_PROTOCOL — no
    # INTERNAL crossing — so with pickle output a tuple value survives
    # end-to-end even though INTERNAL=JSON would turn it into a list.
    # The reference's map task picks the step-position protocol
    # (mrjob/job.py pick_protocols); all three of our runners must do
    # the same.
    from mrjob.job import MRJob
    from mrjob.protocol import PickleProtocol as RefPickle

    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.protocols import PickleProtocol

    class RefMapOnly(MRJob):
        OUTPUT_PROTOCOL = RefPickle

        def mapper(self, _, line):
            for w in line.split():
                yield w.lower(), (len(w), (w[:1],))

    class OurMapOnly(SparkMRJob):
        OUTPUT_PROTOCOL = PickleProtocol
        mapper = RefMapOnly.mapper

    ref = _run_reference(RefMapOnly, lines)
    ours_inline = _run_ours_inline(OurMapOnly, lines)
    ours_local = _run_ours_local(OurMapOnly, lines)
    # tuples must arrive intact (the whole point), so compare raw
    assert ours_inline == ref
    assert ours_local == ref
    assert all(isinstance(v, tuple) for _, v in ref)


def _run_reference_script(source: str, lines: list, out_proto) -> list:
    """Run a reference job as a REAL script through its ``-r local``
    runner (cmd substeps need task subprocesses; the reference's inline
    runner refuses them, mrjob/inline.py:96) and parse its stdout with
    ``out_proto.read``."""
    import subprocess
    import tempfile

    d = tempfile.mkdtemp(prefix="refscript_")
    script = os.path.join(d, "ref_job.py")
    with open(script, "w") as fh:
        fh.write(source)
    inp = os.path.join(d, "input.txt")
    with open(inp, "w") as fh:
        fh.write("\n".join(lines) + ("\n" if lines else ""))
    env = dict(os.environ)
    env["PYTHONPATH"] = REFERENCE + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, script, "-r", "local", "--no-conf", inp],
        capture_output=True, env=env, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr.decode("utf-8", "replace")
    return sorted(
        out_proto.read(ln) for ln in proc.stdout.splitlines() if ln
    )


_REF_REDUCER_CMD_SRC = """\
from mrjob.job import MRJob
from mrjob.protocol import RawValueProtocol
from mrjob.step import MRStep


class RefCmd(MRJob):
    OUTPUT_PROTOCOL = RawValueProtocol

    def mapper(self, _, line):
        for w in line.split():
            yield None, w.lower()

    def steps(self):
        return [MRStep(mapper=self.mapper, reducer_cmd='uniq')]


if __name__ == '__main__':
    RefCmd.run()
"""


@given(lines=st.lists(_line, min_size=1, max_size=6))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_final_step_reducer_cmd_raw_output_matches_reference(lines):
    # the protocol-position rule end-to-end (mrjob/job.py:983-1050): the
    # mapper here is the job's LAST script substep, so it writes
    # OUTPUT_PROTOCOL (RawValue — bare words, no JSON) INTO the reducer
    # cmd, and the cmd's stdout IS the job output byte-for-byte. An
    # engine that encoded the cmd's stdin with INTERNAL (JSON) would
    # dedup '"word"' lines instead of 'word' lines and emit JSON-quoted
    # output where the reference emits bare text.
    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.protocols import RawValueProtocol
    from mrjob_spark.dataflow.step import MRStep

    class OurCmd(SparkMRJob):
        OUTPUT_PROTOCOL = RawValueProtocol

        def mapper(self, _, line):
            for w in line.split():
                yield None, w.lower()

        def steps(self):
            return [MRStep(mapper=self.mapper, reducer_cmd="uniq")]

    ref = _run_reference_script(
        _REF_REDUCER_CMD_SRC, lines, RawValueProtocol())
    ours_inline = _run_ours_inline(OurCmd, lines)
    ours_local = _run_ours_local(OurCmd, lines)
    assert ours_inline == ref
    assert ours_local == ref


_REF_CMD_MAPPER_SRC = """\
from mrjob.job import MRJob
from mrjob.step import MRStep


class RefCmdMap(MRJob):
    # INPUT default RawValue(text): the script reducer is the job's FIRST
    # script substep, so it reads INPUT_PROTOCOL — raw (None, line) pairs
    # out of the mapper cmd, all under one None key
    def reducer(self, key, values):
        yield key, sorted(values)

    def steps(self):
        return [MRStep(mapper_cmd='sed -n /a/p', reducer=self.reducer)]


if __name__ == '__main__':
    RefCmdMap.run()
"""


@given(lines=st.lists(_line, min_size=1, max_size=6))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cmd_mapper_script_reducer_reads_input_protocol(lines):
    # protocol-position rule, read side: behind a cmd-only mapper the
    # script reducer is the job's first script substep and parses the
    # cmd's stdout with INPUT_PROTOCOL (RawValue) — one None-key group of
    # raw lines — NOT with INTERNAL (JSON would crash on grep output)
    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.step import MRStep

    class OurCmdMap(SparkMRJob):
        def reducer(self, key, values):
            yield key, sorted(values)

        def steps(self):
            return [MRStep(mapper_cmd="sed -n /a/p", reducer=self.reducer)]

    from mrjob_spark.dataflow.protocols import JSONProtocol

    ref = _run_reference_script(_REF_CMD_MAPPER_SRC, lines, JSONProtocol())
    ours_inline = _run_ours_inline(OurCmdMap, lines)
    ours_local = _run_ours_local(OurCmdMap, lines)
    assert ours_inline == ref
    assert ours_local == ref


_REF_TWO_STEP_CMD_SRC = """\
from mrjob.job import MRJob
from mrjob.protocol import ReprProtocol
from mrjob.step import MRStep


class RefTwoStep(MRJob):
    # the step-0 reducer is the job's LAST script substep (step 1 is a
    # cmd-only mapper), so it writes OUTPUT_PROTOCOL (repr) even though
    # it is not in the last step; the step-1 cmd transforms those repr
    # bytes and its stdout is the job output
    OUTPUT_PROTOCOL = ReprProtocol

    def mapper(self, _, line):
        for w in line.split():
            yield w.lower(), 1

    def reducer(self, word, counts):
        yield word, (sum(counts), word[:1])

    def steps(self):
        return [
            MRStep(mapper=self.mapper, reducer=self.reducer),
            MRStep(mapper_cmd='sed -n p'),
        ]


if __name__ == '__main__':
    RefTwoStep.run()
"""


@given(lines=st.lists(_line, min_size=1, max_size=6))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mid_job_last_script_substep_writes_output_protocol(lines):
    # protocol-position rule, write side: the LAST script substep writes
    # OUTPUT_PROTOCOL even from a non-final step, because only cmd
    # substeps (byte transformers) follow it — repr tuples must survive
    # the step-1 sed pass-through byte-for-byte
    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.protocols import ReprProtocol
    from mrjob_spark.dataflow.step import MRStep

    class OurTwoStep(SparkMRJob):
        OUTPUT_PROTOCOL = ReprProtocol

        def mapper(self, _, line):
            for w in line.split():
                yield w.lower(), 1

        def reducer(self, word, counts):
            yield word, (sum(counts), word[:1])

        def steps(self):
            return [
                MRStep(mapper=self.mapper, reducer=self.reducer),
                MRStep(mapper_cmd="sed -n p"),
            ]

    ref = _run_reference_script(_REF_TWO_STEP_CMD_SRC, lines, ReprProtocol())
    ours_inline = _run_ours_inline(OurTwoStep, lines)
    ours_local = _run_ours_local(OurTwoStep, lines)
    assert ours_inline == ref
    assert ours_local == ref


@pytest.mark.parametrize(
    "proto_name", ["JSONValueProtocol", "PickleValueProtocol", "ReprValueProtocol"]
)
@given(lines=st.lists(_line, min_size=1, max_size=5))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_value_only_internal_wire_erases_keys_like_reference(proto_name, lines):
    # ADVICE r6 (medium): a value-only INTERNAL wire writes NO key field,
    # so crossing it ERASES the key — the reference's reducer observes
    # key=None and groups by the raw value bytes. PickleValueProtocol
    # inherited pickle's identity roundtrip and the libjson value family
    # inherited JSON's key-preserving fast path, so our reducers (and
    # cat_output under a value-only OUTPUT wire) saw keys the reference
    # wire erases. The reducer here reports the key it receives and the
    # arriving value type; all three of our runners must match the
    # reference exactly. (The ujson/simplejson/rapidjson variants are
    # unusable in this container on the REFERENCE side — libs absent, its
    # classes don't fall back — so their shared roundtrip is pinned
    # ours-only in test_dataflow.py.)
    import mrjob.protocol as refp
    from mrjob.job import MRJob

    from mrjob_spark.dataflow import protocols as ourp
    from mrjob_spark.dataflow.job import SparkMRJob

    class RefVal(MRJob):
        INTERNAL_PROTOCOL = getattr(refp, proto_name)
        OUTPUT_PROTOCOL = getattr(refp, proto_name)

        def mapper(self, _, line):
            for w in line.split():
                yield w.lower(), (1, w.lower())

        def reducer(self, key, vals):
            vals = list(vals)
            yield key, [
                key is None,
                type(vals[0]).__name__,
                len(vals),
                list(vals[0]),
            ]

    class OurVal(SparkMRJob):
        INTERNAL_PROTOCOL = getattr(ourp, proto_name)
        OUTPUT_PROTOCOL = getattr(ourp, proto_name)
        mapper = RefVal.mapper
        reducer = RefVal.reducer

    ref = _run_reference(RefVal, lines)
    ours_inline = _run_ours_inline(OurVal, lines)
    ours_local = _run_ours_local(OurVal, lines)
    assert ours_inline == ref
    assert ours_local == ref


_REF_PRE_FILTER_SRC = """\
from mrjob.job import MRJob
from mrjob.protocol import JSONProtocol
from mrjob.step import MRStep


class RefPreFilter(MRJob):
    # cmd-only mapper, so the script reducer is the job's FIRST script
    # substep and reads INPUT_PROTOCOL (JSON pairs, some with int
    # values); its pre-filter runs on exactly those byte lines
    INPUT_PROTOCOL = JSONProtocol

    def reducer(self, key, values):
        yield key, sorted(values, key=repr)

    def steps(self):
        return [MRStep(mapper_cmd='sed -n /a/p',
                       reducer_pre_filter='grep -v q',
                       reducer=self.reducer)]


if __name__ == '__main__':
    RefPreFilter.run()
"""


@given(words=st.lists(
    st.text(alphabet=list("abcdqxyz"), min_size=1, max_size=8),
    min_size=1, max_size=8,
))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_reducer_pre_filter_sits_on_reducer_read_wire(words):
    # ADVICE r6 (low): a reducer pre-filter sits on the bytes the reducer
    # READS (r_read = INPUT_PROTOCOL here, behind a cmd-only mapper) —
    # not on the mapper-output wire. Re-encoding the already-decoded
    # pairs with m_out (RawValue for a cmd mapper) crashes on the int
    # values this job carries and filters the wrong bytes; the reference
    # local runner filters the reducer task's input lines.
    import json as _json

    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.protocols import JSONProtocol
    from mrjob_spark.dataflow.step import MRStep

    lines = [
        _json.dumps(w) + "\t" + _json.dumps(len(w)) for w in words
    ]

    class OurPreFilter(SparkMRJob):
        INPUT_PROTOCOL = JSONProtocol

        def reducer(self, key, values):
            yield key, sorted(values, key=repr)

        def steps(self):
            return [MRStep(mapper_cmd="sed -n /a/p",
                           reducer_pre_filter="grep -v q",
                           reducer=self.reducer)]

    ref = _run_reference_script(_REF_PRE_FILTER_SRC, lines, JSONProtocol())
    ours_inline = _run_ours_inline(OurPreFilter, lines)
    ours_local = _run_ours_local(OurPreFilter, lines)
    assert ours_inline == ref
    assert ours_local == ref


@pytest.mark.parametrize("ext,opener", [("gz", "gzip"), ("bz2", "bz2")])
def test_compressed_input_three_way(ext, opener):
    # VERDICT r6 task 5: extension-transparent decompression must hold on
    # EVERY runner (reference contract mrjob/cat.py:78-104) — round 6
    # shipped an asymmetry where .bz2 worked under -r local and Spark but
    # crashed under -r inline. Reference inline vs ours inline vs ours
    # local on the same compressed file.
    import bz2 as bz2lib
    import gzip as gziplib
    import tempfile

    from mrjob.job import MRJob

    from mrjob_spark.dataflow.job import SparkMRJob

    codec = {"gzip": gziplib, "bz2": bz2lib}[opener]
    lines = ["apple banana apple", "cherry banana", "apple"]

    class RefWC(MRJob):
        def mapper(self, _, line):
            for w in line.split():
                yield w, 1

        def reducer(self, word, counts):
            yield word, sum(counts)

    class OurWC(SparkMRJob):
        mapper = RefWC.mapper
        reducer = RefWC.reducer

    with tempfile.NamedTemporaryFile(suffix=f".txt.{ext}", delete=False) as fh:
        path = fh.name
    data = ("\n".join(lines) + "\n").encode()
    with codec.open(path, "wb") as fh:
        fh.write(data)
    try:
        job = RefWC(args=["-r", "inline", "--no-conf", path])
        with job.make_runner() as r:
            r.run()
            ref = sorted(job.parse_output(r.cat_output()))
        with OurWC().make_inline_runner(input_paths=[path]) as r:
            r.run()
            ours_inline = sorted(tuple(kv) for kv in r.cat_output())
        with OurWC().make_local_runner(input_paths=[path]) as r:
            r.run()
            ours_local = sorted(tuple(kv) for kv in r.cat_output())
    finally:
        os.unlink(path)

    assert ref == [("apple", 3), ("banana", 2), ("cherry", 1)]
    assert ours_inline == ref
    assert ours_local == ref


_REF_HOT_KEY_SRC = """\
from mrjob.job import MRJob


class RefHotKey(MRJob):
    def mapper(self, _, line):
        for w in line.split():
            yield w, 1

    def reducer(self, word, counts):
        yield word, sum(counts)


if __name__ == '__main__':
    RefHotKey.run()
"""


def test_reducer_split_never_breaks_a_key_group_three_way():
    # VERDICT r6 task 7: the local runner's reducer-input splitting is
    # size-based (~2 splits per reducer slot, mrjob/sim.py:491-537) but
    # must never break at a mid-group boundary. One hot key contributes
    # far more bytes than any split, so a splitter that cut on size alone
    # would hand the group to two reducer tasks and emit two partial
    # counts for it. Reference local == ours local == ours inline, and
    # every key appears exactly once.
    from mrjob_spark.dataflow.job import SparkMRJob
    from mrjob_spark.dataflow.protocols import JSONProtocol

    lines = ["hot " * 40] * 10 + ["aa bb cc dd ee ff gg hh"]

    class OurHotKey(SparkMRJob):
        def mapper(self, _, line):
            for w in line.split():
                yield w, 1

        def reducer(self, word, counts):
            yield word, sum(counts)

    ref = _run_reference_script(_REF_HOT_KEY_SRC, lines, JSONProtocol())
    ours_inline = _run_ours_inline(OurHotKey, lines)
    ours_local = _run_ours_local(OurHotKey, lines)
    assert ours_inline == ref
    assert ours_local == ref
    keys = [k for k, _ in ours_local]
    assert len(keys) == len(set(keys)), "a reduce group spanned two tasks"
    assert dict(ours_local)["hot"] == 400
