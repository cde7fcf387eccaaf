"""Edge serde: translate lines of bytes <-> (key, value) Python pairs.

Protocol semantics follow the reference (``mrjob/protocol.py:17-27``): a
protocol has ``read(line) -> (key, value)`` and ``write(key, value) ->
line`` (bytes, no trailing newline); pair protocols join two encoded fields
with a tab, value protocols carry only the value with ``key=None``.

Unlike the reference, protocols here appear ONLY at job edges (input files
and output files). Between steps the engine keeps typed Python pairs on
RDDs — the reference's own ``--skip-internal-protocol`` fast path
(``mrjob/spark/harness.py:118-124``) made the default and only path.

The internal protocol survives in one place: :meth:`Protocol.encode_sort_key`
supplies the canonical byte encoding used for (a) shuffle grouping of
arbitrary (possibly unhashable) keys and (b) SORT_VALUES secondary sort,
which the reference defines as a sort on *encoded* values
(``mrjob/job.py:1569-1584``, ``mrjob/sim.py:764-767``).
"""

from __future__ import annotations

import json
import pickle


def _canonical_bytes(obj) -> bytes:
    """Deterministic byte encoding of a JSON-ish Python value, used for
    grouping and secondary sort. Dict keys are sorted so two equal dicts
    always group together (stricter than the reference, which groups by
    whatever byte order ``json.dumps`` emitted)."""
    try:
        return json.dumps(obj, sort_keys=True, default=repr).encode("utf-8")
    except (TypeError, ValueError):
        return repr(obj).encode("utf-8")


#: Exact types safe to key an ENCODE memo on. The memo key carries the
#: types, so equal-but-distinct values like ``1``/``True`` or ``"1"``/``1``
#: can never collide. ``float`` is deliberately absent: ``-0.0 == 0.0``
#: hashes equal but serializes differently, so a float could return
#: another float's cached bytes.
_ENC_MEMO_TYPES = frozenset((str, int, bool, bytes, type(None)))

#: Exact types a DECODE memo may hand out by reference. Byte-equal input
#: lines always decode equal (no collision risk), so the only constraint
#: is immutability of the shared result — ``float`` is fine here.
_DEC_MEMO_TYPES = frozenset((str, int, bool, float, bytes, type(None)))

_MEMO_CAP = 1 << 16


def memoized_pair_writer(build, cap=_MEMO_CAP):
    """Wrap a deterministic ``(key, value) -> bytes`` encoder with a
    bounded per-task memo over scalar pairs. MapReduce task output is
    dominated by a small distinct-pair vocabulary re-encoded per
    occurrence (wordcount emits ``(word, 1)`` once per occurrence);
    caching the built line collapses the per-pair json/hex work to a
    dict hit. Byte-identical by construction: ``build`` is a pure
    function of ``(type, key, type, value)`` for the admitted scalar
    types, and non-scalar or cap-overflow pairs fall through to
    ``build`` unchanged. The memo lives only for this writer's task —
    no cross-run state."""
    memo = {}

    def write_pair(key, value):
        tk = type(key)
        tv = type(value)
        if tk in _ENC_MEMO_TYPES and tv in _ENC_MEMO_TYPES:
            mk = (tk, key, tv, value)
            out = memo.get(mk)
            if out is None:
                out = build(key, value)
                if len(memo) < cap:
                    memo[mk] = out
            return out
        return build(key, value)

    return write_pair


def memoized_line_reader(decode, pair_of=None, cap=_MEMO_CAP):
    """Wrap a deterministic ``line -> result`` decoder with a bounded
    per-task memo. Reducer/combiner input repeats the same encoded line
    once per map-side occurrence; byte-equal lines decode equal, so the
    cached result can be shared — but only when the decoded pair is
    immutable (a shared list a consumer mutates would alias).
    ``pair_of(result)`` extracts the ``(key, value)`` pair to guard; it
    defaults to the result itself."""
    memo = {}
    if pair_of is None:
        pair_of = lambda result: result  # noqa: E731

    def read_line(line):
        out = memo.get(line)
        if out is None:
            out = decode(line)
            kv = pair_of(out)
            if (
                len(memo) < cap
                and type(kv[0]) in _DEC_MEMO_TYPES
                and type(kv[1]) in _DEC_MEMO_TYPES
            ):
                memo[line] = out
        return out

    return read_line


class Protocol:
    """Base: tab-joined encoded key/value fields."""

    def _loads(self, field: bytes):
        raise NotImplementedError

    def _dumps(self, obj) -> bytes:
        raise NotImplementedError

    def read(self, line: bytes):
        key_field, _, value_field = line.partition(b"\t")
        return self._loads(key_field), self._loads(value_field)

    def write(self, key, value) -> bytes:
        return self._dumps(key) + b"\t" + self._dumps(value)

    # -- engine-internal canonical encodings (not part of the file format) --

    def encode_sort_key(self, obj) -> bytes:
        """Byte encoding used for shuffle grouping / SORT_VALUES ordering."""
        return _canonical_bytes(obj)

    def group_key(self, key, value) -> bytes:
        """The byte-level shuffle/group key for a pair sitting on this
        wire. Hadoop streaming partitions and groups reducer input on the
        bytes BEFORE THE FIRST TAB of each line, and the reference's
        local runner splits reducer tasks only at changes of exactly that
        field (``mrjob/sim.py:525-527``) — so a reducer group never spans
        two distinct byte keys. For keyed protocols the first tab field
        IS the encoded key, so this defaults to ``encode_sort_key(key)``;
        value-only protocols override it (their line carries no key
        field, so the byte key is the written VALUE up to the first tab:
        distinct raw lines are distinct reduce groups even though every
        line decodes to ``key=None`` — differential-pinned in
        test_job_shape_differential.py)."""
        return self.encode_sort_key(key)

    def roundtrip(self, key, value):
        """What one task-boundary wire crossing does to a pair:
        ``read(write(key, value))``.

        The reference serializes pairs through INTERNAL_PROTOCOL at every
        task boundary (mapper → combiner → reducer → next step), so user
        code there observes post-wire values — a tuple yielded by a mapper
        arrives at the reducer as a LIST under JSON, int dict keys arrive
        as strings, and a value-only protocol drops the key.  This engine
        keeps pairs native Python between tasks for speed, so runners
        apply ``roundtrip`` at exactly the boundaries the reference
        serializes; without it, type-observing user code diverges
        (caught by test_reference_differential.py's tuple-observer case).
        Subclasses whose wire is type-faithful (pickle) override this to
        the identity; JSON overrides it with an allocation-light
        canonicalizer.
        """
        return self.read(self.write(key, value))


def _json_wire(x):
    """Allocation-light equivalent of ``json.loads(json.dumps(x))`` for the
    common shapes; raises TypeError for anything it can't prove faithful
    (caller falls back to the real codec, which errors exactly like the
    reference wire would on unencodable types)."""
    t = type(x)
    if x is None or t is str or t is int or t is bool:
        return x
    if t is float:
        # repr-roundtrip-exact in Python; NaN/Inf pass through json too
        return x
    if t is list or t is tuple:
        return [_json_wire(i) for i in x]
    if t is dict:
        if all(type(k) is str for k in x):
            return {k: _json_wire(v) for k, v in x.items()}
        raise TypeError("non-string dict keys take the slow path")
    raise TypeError(f"exotic type {t.__name__} takes the slow path")


def crossing(write_proto, read_proto):
    """Pair transform for one wire crossing written with ``write_proto``
    and read with ``read_proto`` (the reference's substeps can sit on
    wires where the two differ — e.g. a combiner writing the mapper's
    output protocol feeding a reducer that reads INPUT_PROTOCOL when it
    is the job's first script substep). Same-protocol crossings take the
    protocol's own fast ``roundtrip``."""
    if type(write_proto) is type(read_proto):
        return write_proto.roundtrip
    w, r = write_proto.write, read_proto.read

    def cross(key, value):
        return r(w(key, value))

    return cross



class _ValueOnlyGroupKey:
    """Mixin for value-only protocols: the wire line has no key field, so
    the Hadoop byte-level group key is the written value up to the first
    tab (see :meth:`Protocol.group_key`)."""

    def group_key(self, key, value) -> bytes:
        return self.write(key, value).split(b"\t", 1)[0]

    def roundtrip(self, key, value):
        # a value-only wire has no key field, so crossing it ERASES the
        # key: read(write(k, v)) == (None, v′) — the reference's inline
        # runner yields (None, v) from such wires. Defined on the mixin
        # (first in every value-only MRO) so no subclass can inherit a
        # key-PRESERVING fast path from its pair-protocol parent (ADVICE
        # r6: PickleValueProtocol inherited pickle's identity roundtrip
        # and the libjson value family inherited JSONProtocol's
        # key-preserving canonicalizer). Codec-faithful subclasses
        # override with a (None, value)-shaped fast path.
        return self.read(self.write(key, value))


class JSONProtocol(Protocol):
    """key and value as two JSONs joined by a tab — the reference's default
    INTERNAL/OUTPUT protocol (``mrjob/job.py:1282,1291``)."""

    def _loads(self, field: bytes):
        return json.loads(field.decode("utf-8"))

    def _dumps(self, obj) -> bytes:
        return json.dumps(obj).encode("utf-8")

    def roundtrip(self, key, value):
        try:
            return _json_wire(key), _json_wire(value)
        except TypeError:
            # int/float/bool/None dict keys (json coerces to strings),
            # str/int subclasses, unencodable types: defer to the codec
            return self.read(self.write(key, value))


class JSONValueProtocol(_ValueOnlyGroupKey, Protocol):
    """Value-only JSON; key reads as ``None``."""

    def read(self, line: bytes):
        return None, json.loads(line.decode("utf-8"))

    def write(self, key, value) -> bytes:
        return json.dumps(value).encode("utf-8")

    def roundtrip(self, key, value):
        try:
            return None, _json_wire(value)
        except TypeError:
            return self.read(self.write(key, value))


class BytesProtocol(Protocol):
    """Raw bytes key/value joined by a tab; ``None`` fields are omitted and
    a tabless line reads as ``(line, None)``."""

    def read(self, line: bytes):
        if b"\t" in line:
            k, _, v = line.partition(b"\t")
            return k, v
        return line, None

    def write(self, key, value) -> bytes:
        return b"\t".join(f for f in (key, value) if f is not None)

    def encode_sort_key(self, obj) -> bytes:
        return obj if isinstance(obj, bytes) else _canonical_bytes(obj)


class BytesValueProtocol(_ValueOnlyGroupKey, Protocol):
    """Whole line (bytes) as the value; key is ``None``."""

    def read(self, line: bytes):
        return None, line

    def write(self, key, value) -> bytes:
        return value

    def encode_sort_key(self, obj) -> bytes:
        return obj if isinstance(obj, bytes) else _canonical_bytes(obj)


def _decode_text(field: bytes) -> str:
    try:
        return field.decode("utf-8")
    except UnicodeDecodeError:
        return field.decode("latin-1")


class TextProtocol(Protocol):
    """UTF-8 text key/value joined by a tab (latin-1 read fallback, matching
    ``mrjob/protocol.py:393-420``)."""

    def read(self, line: bytes):
        text = _decode_text(line)
        if "\t" in text:
            k, _, v = text.partition("\t")
            return k, v
        return text, None

    def write(self, key, value) -> bytes:
        return b"\t".join(f.encode("utf-8") for f in (key, value) if f is not None)

    def encode_sort_key(self, obj) -> bytes:
        return obj.encode("utf-8") if isinstance(obj, str) else _canonical_bytes(obj)


class TextValueProtocol(_ValueOnlyGroupKey, Protocol):
    """Whole line as a unicode value; the reference's default INPUT protocol
    on Python 3 (``mrjob/protocol.py:423-451``)."""

    def read(self, line: bytes):
        return None, _decode_text(line)

    def write(self, key, value) -> bytes:
        return value.encode("utf-8")

    def encode_sort_key(self, obj) -> bytes:
        return obj.encode("utf-8") if isinstance(obj, str) else _canonical_bytes(obj)


class PickleProtocol(Protocol):
    """String-escaped pickles — works for any picklable type
    (``mrjob/protocol.py:284-340``)."""

    def _loads(self, field: bytes):
        return pickle.loads(field.decode("unicode_escape").encode("latin-1"))

    def _dumps(self, obj) -> bytes:
        return (
            pickle.dumps(obj, protocol=2)
            .decode("latin-1")
            .encode("unicode_escape")
        )

    def encode_sort_key(self, obj) -> bytes:
        try:
            return _canonical_bytes(obj)
        except Exception:
            return pickle.dumps(obj, protocol=2)

    def roundtrip(self, key, value):
        # pickle's wire is type-faithful: crossing it is the identity
        # (modulo object copies, which generator-shaped task chains never
        # observe) — skip the serde entirely
        return key, value


class PickleValueProtocol(_ValueOnlyGroupKey, PickleProtocol):
    def read(self, line: bytes):
        return None, self._loads(line)

    def write(self, key, value) -> bytes:
        return self._dumps(value)

    def roundtrip(self, key, value):
        # pickle is type-faithful on the value; the wire erases the key
        return None, value


class ReprProtocol(Protocol):
    """``repr()`` round-tripped with a restricted literal eval
    (``mrjob/protocol.py:465-502``)."""

    def _loads(self, field: bytes):
        import ast

        return ast.literal_eval(field.decode("utf-8"))

    def _dumps(self, obj) -> bytes:
        return repr(obj).encode("utf-8")


class ReprValueProtocol(_ValueOnlyGroupKey, ReprProtocol):
    def read(self, line: bytes):
        return None, self._loads(line)

    def write(self, key, value) -> bytes:
        return self._dumps(value)


class _LibJSONProtocol(JSONProtocol):
    """JSON protocol backed by a named third-party json library, falling
    back to stdlib ``json`` when the library isn't installed — the
    reference's UltraJSON/SimpleJSON/RapidJSON family
    (``mrjob/protocol.py:160-281``). All variants are byte-compatible on
    the JSON subset the engine emits (the reference documents the same
    whitespace-level differences between libraries)."""

    _LIB = "json"

    def __init__(self):
        import importlib

        try:
            self._json = importlib.import_module(self._LIB)
        except ImportError:
            self._json = json

    def _loads(self, field: bytes):
        return self._json.loads(field.decode("utf-8"))

    def _dumps(self, obj) -> bytes:
        return self._json.dumps(obj).encode("utf-8")


class _LibJSONValueProtocol(_ValueOnlyGroupKey, _LibJSONProtocol):
    def read(self, line: bytes):
        return None, self._loads(line)

    def write(self, key, value) -> bytes:
        return self._dumps(value)

    def roundtrip(self, key, value):
        try:
            return None, _json_wire(value)
        except TypeError:
            return self.read(self.write(key, value))


class UltraJSONProtocol(_LibJSONProtocol):
    """ujson-backed pair protocol (``mrjob/protocol.py:170-199``)."""

    _LIB = "ujson"


class UltraJSONValueProtocol(_LibJSONValueProtocol):
    _LIB = "ujson"


class SimpleJSONProtocol(_LibJSONProtocol):
    """simplejson-backed pair protocol (``mrjob/protocol.py:202-228``)."""

    _LIB = "simplejson"


class SimpleJSONValueProtocol(_LibJSONValueProtocol):
    _LIB = "simplejson"


class RapidJSONProtocol(_LibJSONProtocol):
    """rapidjson-backed pair protocol (``mrjob/protocol.py:231-259``)."""

    _LIB = "rapidjson"


class RapidJSONValueProtocol(_LibJSONValueProtocol):
    _LIB = "rapidjson"


#: The reference's ``JSONProtocol`` picks the fastest available json
#: library at import time (``mrjob/protocol.py:262-281``); the stdlib-based
#: class above is the deterministic default, and this alias names it the
#: way the reference names its stdlib variant.
StandardJSONProtocol = JSONProtocol
StandardJSONValueProtocol = JSONValueProtocol

# Python-3 aliases (``mrjob/protocol.py:454-462``).
RawProtocol = TextProtocol
RawValueProtocol = TextValueProtocol
