"""Adversarial property coverage of the vendored protobuf mini-runtime
(etl_process_spark/vendor/google/protobuf/_mini_runtime.py): Spark 4's
transformWithState worker protocol rides this 850-LoC codec, so it gets
hypothesis round-trips over RANDOM descriptors and messages, an
INDEPENDENT test-local wire encoder (so descriptor parsing is checked
against a second implementation of the public spec, not against itself),
and garbage/truncation/mutation decoding that must raise DecodeError —
never mis-parse, never leak a struct.error/UnicodeDecodeError/TypeError.

Complements the golden-vector + generated-module tests in
test_protobuf_shim.py.
"""

from __future__ import annotations

import hashlib
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_process_spark.vendor import ensure_protobuf

pytestmark = pytest.mark.skipif(
    not ensure_protobuf(), reason="vendored protobuf failed to activate"
)

from google.protobuf._mini_runtime import (  # noqa: E402
    DecodeError,
    L_OPTIONAL,
    L_REPEATED,
    T_BOOL,
    T_BYTES,
    T_DOUBLE,
    T_ENUM,
    T_FIXED32,
    T_FIXED64,
    T_FLOAT,
    T_INT32,
    T_INT64,
    T_MESSAGE,
    T_SFIXED32,
    T_SFIXED64,
    T_SINT32,
    T_SINT64,
    T_STRING,
    T_UINT32,
    T_UINT64,
    message_class_for,
    parse_file_descriptor,
)

# ---------------------------------------------------------------------------
# Independent wire encoder (test-local, written directly from the public
# spec) — deliberately NOT the runtime's enc_* helpers, so agreement is a
# two-implementation cross-check.
# ---------------------------------------------------------------------------


def _ivint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        out.append((v & 0x7F) | (0x80 if v > 0x7F else 0))
        v >>= 7
        if not v:
            return bytes(out)


def _irec_varint(fno: int, v: int) -> bytes:
    return _ivint(fno << 3) + _ivint(v)


def _irec_len(fno: int, payload: bytes) -> bytes:
    return _ivint((fno << 3) | 2) + _ivint(len(payload)) + payload


def _ifield(name, number, ftype, label, type_name=None, oneof_index=None,
            proto3_optional=False) -> bytes:
    b = (_irec_len(1, name.encode()) + _irec_varint(3, number)
         + _irec_varint(4, label) + _irec_varint(5, ftype))
    if type_name is not None:
        b += _irec_len(6, type_name.encode())
    if oneof_index is not None:
        b += _irec_varint(9, oneof_index)
    if proto3_optional:
        b += _irec_varint(17, 1)
    return b


def _imessage(name, fields, nested=(), enums=(), oneofs=()) -> bytes:
    b = _irec_len(1, name.encode())
    for f in fields:
        b += _irec_len(2, f)
    for nd in nested:
        b += _irec_len(3, nd)
    for ed in enums:
        b += _irec_len(4, ed)
    for oname in oneofs:
        b += _irec_len(8, _irec_len(1, oname.encode()))
    return b


def _ienum(name, values) -> bytes:
    b = _irec_len(1, name.encode())
    for vname, vnum in values:
        b += _irec_len(2, _irec_len(1, vname.encode()) + _irec_varint(2, vnum))
    return b


def _ifile(name, package, messages, enums=()) -> bytes:
    b = _irec_len(1, name.encode()) + _irec_len(2, package.encode())
    for m in messages:
        b += _irec_len(4, m)
    for e in enums:
        b += _irec_len(5, e)
    return b


# ---------------------------------------------------------------------------
# Schema + value strategies
# ---------------------------------------------------------------------------

SCALARS = [T_DOUBLE, T_FLOAT, T_INT64, T_UINT64, T_INT32, T_FIXED64,
           T_FIXED32, T_BOOL, T_STRING, T_BYTES, T_UINT32, T_SFIXED32,
           T_SFIXED64, T_SINT32, T_SINT64]


def _value_strategy(ftype: int):
    if ftype in (T_INT32, T_SFIXED32, T_SINT32):
        return st.integers(-(2**31), 2**31 - 1)
    if ftype in (T_INT64, T_SFIXED64, T_SINT64):
        return st.integers(-(2**63), 2**63 - 1)
    if ftype in (T_UINT32, T_FIXED32):
        return st.integers(0, 2**32 - 1)
    if ftype in (T_UINT64, T_FIXED64):
        return st.integers(0, 2**64 - 1)
    if ftype == T_BOOL:
        return st.booleans()
    if ftype == T_DOUBLE:
        return st.floats(allow_nan=False)
    if ftype == T_FLOAT:
        return st.floats(allow_nan=False, width=32)
    if ftype == T_STRING:
        return st.text(max_size=40)
    if ftype == T_BYTES:
        return st.binary(max_size=40)
    raise AssertionError(ftype)


# (number, type, repeated) triples with unique field numbers
_field_specs = st.lists(
    st.tuples(
        st.integers(1, 2**29 - 1),
        st.sampled_from(SCALARS),
        st.booleans(),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


def _build_class(spec):
    """Random schema -> FileDescriptorProto bytes (independent encoder)
    -> runtime parse -> concrete message class. The message name is
    derived from the spec so the runtime's per-name class cache never
    collides across hypothesis examples."""
    tag = hashlib.sha1(repr(spec).encode()).hexdigest()[:16]
    mname = f"M{tag}"
    fields = [
        _ifield(f"f{num}", num, ftype, L_REPEATED if rep else L_OPTIONAL)
        for num, ftype, rep in spec
    ]
    fd = parse_file_descriptor(
        _ifile(f"{mname}.proto", "fuzz", [_imessage(mname, fields)])
    )
    return message_class_for(fd.message_types_by_name[mname])


@settings(max_examples=200, deadline=None)
@given(spec=_field_specs, data=st.data())
def test_random_schema_roundtrip(spec, data):
    """serialize -> parse restores every field value (proto3 default
    collapse included: Python == equates -0.0 with the unsent 0.0), and
    serialization is canonical: ser(parse(ser(m))) == ser(m)."""
    cls = _build_class(spec)
    values = {}
    for num, ftype, rep in spec:
        vs = _value_strategy(ftype)
        values[f"f{num}"] = data.draw(
            st.lists(vs, max_size=5) if rep else vs
        )
    m = cls(**values)
    wire = m.SerializeToString()
    back = cls()
    back.ParseFromString(wire)
    for num, ftype, rep in spec:
        got = getattr(back, f"f{num}")
        want = values[f"f{num}"]
        if rep:
            assert list(got) == list(want), f"f{num} (type {ftype})"
        else:
            assert got == want, f"f{num} (type {ftype})"
    assert back.SerializeToString() == wire


@settings(max_examples=200, deadline=None)
@given(spec=_field_specs, data=st.data())
def test_unpacked_encoding_decodes_like_packed(spec, data):
    """For repeated numeric fields the runtime EMITS packed but must
    ACCEPT the per-element form; build the per-element bytes with the
    independent encoder and require identical decode results."""
    from google.protobuf._mini_runtime import _NUMERIC_TYPES, _enc_scalar

    cls = _build_class(spec)
    per_element = bytearray()
    expect = {}
    for num, ftype, rep in spec:
        if not rep or ftype not in _NUMERIC_TYPES:
            continue
        vals = data.draw(st.lists(_value_strategy(ftype), max_size=4))
        expect[f"f{num}"] = vals
        wt = {T_DOUBLE: 1, T_FIXED64: 1, T_SFIXED64: 1,
              T_FLOAT: 5, T_FIXED32: 5, T_SFIXED32: 5}.get(ftype, 0)
        for v in vals:
            per_element += _ivint((num << 3) | wt)
            per_element += _enc_scalar(ftype, v)
    m = cls()
    m.ParseFromString(bytes(per_element))
    for name, vals in expect.items():
        assert list(getattr(m, name)) == vals


# a fixed rich schema (every scalar type + enum + nested message + oneof +
# packed repeated) used by the decoder-robustness properties
def _rich_class():
    nested = _imessage(
        "Inner",
        [_ifield("x", 1, T_INT64, L_OPTIONAL),
         _ifield("s", 2, T_STRING, L_OPTIONAL)],
    )
    enum = _ienum("Kind", [("K0", 0), ("K1", 1), ("KNEG", -3)])
    fields = [
        _ifield(f"s{t}", i + 1, t, L_OPTIONAL)
        for i, t in enumerate(SCALARS)
    ] + [
        _ifield("reps", 30, T_INT64, L_REPEATED),
        _ifield("repd", 31, T_DOUBLE, L_REPEATED),
        _ifield("repstr", 32, T_STRING, L_REPEATED),
        _ifield("kind", 33, T_ENUM, L_OPTIONAL, type_name=".fuzz.Kind"),
        _ifield("inner", 34, T_MESSAGE, L_OPTIONAL,
                type_name=".fuzz.Rich.Inner"),
        _ifield("oa", 40, T_INT64, L_OPTIONAL, oneof_index=0),
        _ifield("ob", 41, T_STRING, L_OPTIONAL, oneof_index=0),
    ]
    msg = _imessage("Rich", fields, nested=[nested], oneofs=["choice"])
    fd = parse_file_descriptor(_ifile("rich.proto", "fuzz", [msg], [enum]))
    return message_class_for(fd.message_types_by_name["Rich"])


@settings(max_examples=400, deadline=None)
@given(buf=st.binary(max_size=120))
def test_garbage_bytes_never_misparse(buf):
    """Arbitrary bytes either raise DecodeError or parse cleanly into a
    reserializable message — no struct.error, UnicodeDecodeError,
    TypeError, AttributeError can escape the decoder."""
    cls = _rich_class()
    m = cls()
    try:
        m.ParseFromString(buf)
    except DecodeError:
        return
    m.SerializeToString()  # whatever parsed must be internally consistent


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_truncation_and_mutation_fail_loudly(data):
    """Take a real serialized message; any prefix truncation or
    single-byte mutation decodes to DecodeError or to a consistent
    message — never an uncaught exception."""
    cls = _rich_class()
    m = cls(
        s3=data.draw(_value_strategy(T_INT64)),
        s9=data.draw(_value_strategy(T_STRING)),
        reps=data.draw(st.lists(_value_strategy(T_INT64), max_size=4)),
        repstr=data.draw(st.lists(_value_strategy(T_STRING), max_size=3)),
    )
    inner_cls = type(m).Inner
    wire = m.SerializeToString()
    if not wire:
        return
    cut = data.draw(st.integers(0, len(wire) - 1))
    for corrupted in (
        wire[:cut],
        wire[:cut] + bytes([wire[cut] ^ data.draw(st.integers(1, 255))])
        + wire[cut + 1:],
    ):
        fresh = cls()
        try:
            fresh.ParseFromString(corrupted)
        except DecodeError:
            continue
        fresh.SerializeToString()
    assert inner_cls is not None  # nested class materialized


@settings(max_examples=300, deadline=None)
@given(buf=st.binary(max_size=200))
def test_descriptor_parser_never_misparses_garbage(buf):
    """parse_file_descriptor over arbitrary bytes: DecodeError or a
    well-formed FileDescriptor — wrong wire types inside descriptor
    submessages must not surface as AttributeError/TypeError."""
    try:
        fd = parse_file_descriptor(buf)
    except DecodeError:
        return
    for d in fd.message_types_by_name.values():
        for f in d.fields:
            assert isinstance(f.name, str) and isinstance(f.number, int)


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_oneof_last_writer_wins_through_roundtrip(data):
    """Randomized assignment sequences to a oneof: WhichOneof tracks the
    last write, exactly one member serializes, and the round trip
    preserves the active member and value."""
    cls = _rich_class()
    m = cls()
    seq = data.draw(st.lists(
        st.tuples(st.sampled_from(["oa", "ob"]), st.integers(0, 1000)),
        min_size=1, max_size=6,
    ))
    last_name, last_val = None, None
    for name, iv in seq:
        if name == "oa":
            m.oa = iv
            last_name, last_val = "oa", iv
        else:
            m.ob = f"v{iv}"
            last_name, last_val = "ob", f"v{iv}"
    assert m.WhichOneof("choice") == last_name
    back = cls()
    back.ParseFromString(m.SerializeToString())
    assert back.WhichOneof("choice") == last_name
    assert getattr(back, last_name) == last_val
    other = "ob" if last_name == "oa" else "oa"
    assert not back.HasField(other)


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_nested_message_and_enum_roundtrip(data):
    """Message-typed and enum-typed fields round-trip, including
    negative enum numbers (10-byte varints on the wire)."""
    cls = _rich_class()
    x = data.draw(_value_strategy(T_INT64))
    s = data.draw(_value_strategy(T_STRING))
    kind = data.draw(st.sampled_from([0, 1, -3]))
    m = cls(inner=cls.Inner(x=x, s=s), kind=kind)
    back = cls()
    back.ParseFromString(m.SerializeToString())
    assert back.HasField("inner")
    assert back.inner.x == x and back.inner.s == s
    assert back.kind == kind
