"""The vendored protobuf mini-runtime (etl_process_spark/vendor/google):
wire-format golden vectors from the PUBLIC spec, round-trips through the
actual protoc-generated StateMessage_pb2 module, and the presence/oneof
semantics Spark's transformWithState clients rely on.

No Spark session needed — this is the pure-Python layer under the
stream-vs-batch differential in test_streaming.py.
"""

from __future__ import annotations

import pytest

from etl_process_spark.vendor import ensure_protobuf

pytestmark = pytest.mark.skipif(
    not ensure_protobuf(), reason="vendored protobuf failed to activate"
)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


# ---------------------- wire primitives (spec golden) ----------------------

def test_varint_golden_vectors():
    from google.protobuf._mini_runtime import dec_varint, enc_varint

    # the canonical examples from the published encoding guide
    assert enc_varint(1) == b"\x01"
    assert enc_varint(150) == b"\x96\x01"
    assert enc_varint(300) == b"\xac\x02"
    # negative int64: 64-bit two's complement, always 10 bytes
    assert enc_varint(-1) == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    assert enc_varint(-5) == b"\xfb\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1):
        assert dec_varint(enc_varint(v), 0) == (v, len(enc_varint(v)))


def test_zigzag_golden_vectors():
    from google.protobuf._mini_runtime import zigzag_dec, zigzag_enc

    # published sint mapping: 0->0, -1->1, 1->2, -2->3, 2->4
    for raw, enc in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4), (-64, 127)]:
        assert zigzag_enc(raw) == enc
        assert zigzag_dec(enc) == raw


def test_canonical_message_encoding():
    """StateRequest(version=2, setHandleState(INITIALIZED)) must encode
    to the exact canonical bytes (hand-derived from the spec):
    08 02 (field1 varint 2) 12 04 (field2 len 4) 0a 02 (field1 len 2)
    08 02 (state=2)."""
    sm = _sm()
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        ),
    )
    assert req.SerializeToString() == bytes.fromhex("080212040a020802")


def test_proto3_defaults_not_emitted():
    sm = _sm()
    # all-default scalars serialize to nothing
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    # ...but parse back as defaults
    m = sm.StateResponse()
    m.ParseFromString(b"")
    assert (m.statusCode, m.errorMessage, m.value) == (0, "", b"")


# ------------------------- generated-module behavior -----------------------

def test_oneof_switching_and_whichoneof():
    sm = _sm()
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    assert req.WhichOneof("method") == "statefulProcessorCall"
    # setting another member of the oneof clears the first
    req2 = sm.StateRequest(
        timerRequest=sm.TimerRequest(
            timerValueRequest=sm.TimerValueRequest(
                getWatermark=sm.GetWatermark()
            )
        )
    )
    assert req2.WhichOneof("method") == "timerRequest"
    assert not req2.HasField("statefulProcessorCall")
    out = sm.StateRequest()
    out.ParseFromString(req2.SerializeToString())
    assert out.WhichOneof("method") == "timerRequest"
    assert out.timerRequest.timerValueRequest.WhichOneof("method") == "getWatermark"


def test_hasfield_presence_rules():
    sm = _sm()
    m = sm.StateResponse()
    # plain proto3 scalars have no presence: HasField must raise
    with pytest.raises(ValueError):
        m.HasField("statusCode")
    # proto3 optional (synthetic oneof) tracks presence even at default
    t = sm.TimerInfo(key=b"")
    assert t.HasField("key")
    t2 = sm.TimerInfo(timestampMs=5)
    assert not t2.HasField("key")
    rt = sm.TimerInfo()
    rt.ParseFromString(t.SerializeToString())
    assert rt.HasField("key") and rt.key == b""


def test_repeated_messages_and_bytes_roundtrip():
    sm = _sm()
    resp = sm.StateResponseWithTimer(statusCode=7, requireNextFetch=True)
    resp.timer.add(timestampMs=-5)
    resp.timer.add(key=b"k2", timestampMs=123456789012345)
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.HasField("key"), bytes(t.key), t.timestampMs) for t in back.timer] == [
        (False, b"", -5), (True, b"k2", 123456789012345),
    ]
    assert back.requireNextFetch is True

    lg = sm.StateResponseWithListGet(value=[b"a", b"", b"bb"])
    back2 = sm.StateResponseWithListGet()
    back2.ParseFromString(lg.SerializeToString())
    assert [bytes(v) for v in back2.value] == [b"a", b"", b"bb"]


def test_unknown_fields_are_skipped():
    sm = _sm()
    from google.protobuf._mini_runtime import enc_varint

    base = sm.StateResponse(statusCode=3).SerializeToString()
    # append an unknown field (#15, varint) and an unknown len-delimited (#14)
    extra = (
        enc_varint((15 << 3) | 0) + enc_varint(99)
        + enc_varint((14 << 3) | 2) + enc_varint(3) + b"xyz"
    )
    m = sm.StateResponse()
    m.ParseFromString(base + extra)
    assert m.statusCode == 3


def test_negative_int64_interop_shape():
    """Negative int64 must occupy 10 varint bytes (two's complement) —
    the encoding the JVM parser requires."""
    sm = _sm()
    data = sm.RegisterTimer(expiryTimestampMs=-1).SerializeToString()
    assert data == b"\x08" + b"\xff" * 9 + b"\x01"
    m = sm.RegisterTimer()
    m.ParseFromString(data)
    assert m.expiryTimestampMs == -1


def test_enum_wrapper_and_module_constants():
    sm = _sm()
    assert [sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.DATA_PROCESSED,
            sm.TIMER_PROCESSED, sm.CLOSED] == [0, 1, 2, 3, 4, 5]
    assert sm.HandleState.Name(2) == "INITIALIZED"
    assert sm.HandleState.Value("CLOSED") == 5


def test_packed_repeated_numeric_decode():
    """proto3 serializes repeated numerics packed; the decoder must read
    both packed and per-element forms. (StateMessage has no repeated
    numerics, so pin this on a hand-built descriptor.)"""
    from google.protobuf._mini_runtime import (
        Descriptor,
        FieldDescriptor,
        L_REPEATED,
        T_INT64,
        enc_varint,
        message_class_for,
    )

    d = Descriptor("Packed", ".test.Packed")
    d.add_field(FieldDescriptor("xs", 1, T_INT64, L_REPEATED))
    cls = message_class_for(d)
    m = cls(xs=[1, 150, 3])
    data = m.SerializeToString()
    # packed: tag(1,LEN) len payload
    assert data == enc_varint((1 << 3) | 2) + enc_varint(4) + b"\x01\x96\x01\x03"
    back = cls()
    back.ParseFromString(data)
    assert list(back.xs) == [1, 150, 3]
    # per-element (unpacked) form decodes identically
    unpacked = b"".join(enc_varint((1 << 3) | 0) + enc_varint(v) for v in (1, 150, 3))
    back2 = cls()
    back2.ParseFromString(unpacked)
    assert list(back2.xs) == [1, 150, 3]


def test_copyfrom_and_clear():
    sm = _sm()
    a = sm.StateCallCommand(stateName="s1", schema="x int")
    b = sm.StateCallCommand()
    b.CopyFrom(a)
    assert b.stateName == "s1" and b.schema == "x int"
    b.ClearField("schema")
    assert b.schema == ""
    b.Clear()
    assert b.stateName == ""


def test_real_install_preferred():
    """ensure_protobuf only injects the shim when google.protobuf is
    missing; if an import already succeeds it must change nothing."""
    import sys

    from etl_process_spark.vendor import VENDOR_DIR, ensure_protobuf

    assert ensure_protobuf()  # idempotent
    assert sys.path.count(VENDOR_DIR) <= 1
