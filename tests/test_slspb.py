"""SLS protobuf wire codec — known-byte vectors hand-derived from the public
protobuf spec + sls_logs.proto field numbers, plus the Spark decode operator."""

from __future__ import annotations

from loongcollector_spark.operators.slspb import (
    decode_log_group,
    encode_log,
    encode_log_group,
    parse_sls_pb,
)


def test_wire_bytes_known_answer():
    # Log{Time=1700000000, Contents=[("k","v")], Time_ns=7}:
    #   field1 varint: tag 0x08, 1700000000 = 0x6553F100 -> LEB128
    log = encode_log(1700000000, [("k", "v")], time_ns=7)
    assert log[0] == 0x08  # tag(1, varint)
    # 1700000000 LEB128 = 80 E2 CF AA 06
    assert log[1:6] == bytes([0x80, 0xE2, 0xCF, 0xAA, 0x06])
    # Contents: tag(2,len)=0x12, len=6, then Content{1:"k",2:"v"} =
    #   0A 01 6B 12 01 76
    assert log[6:14] == bytes([0x12, 0x06, 0x0A, 0x01, 0x6B, 0x12, 0x01, 0x76])
    # Time_ns fixed32: tag(4,5)=0x25 then little-endian 7
    assert log[14:] == bytes([0x25, 0x07, 0x00, 0x00, 0x00])

    grp = encode_log_group([log], category="store", tags=[("host", "h1")])
    g = decode_log_group(grp)
    assert g["category"] == "store" and g["tags"] == {"host": "h1"}
    assert g["logs"] == [{"time": 1700000000, "time_ns": 7, "fields": {"k": "v"}}]


def test_unknown_fields_skipped_and_errors_raise():
    import pytest

    # Log.values (field 3, repeated string) must be skipped, not rejected
    log = encode_log(5, [("a", "b")])
    extra = bytes([0x1A, 0x02, 0x78, 0x79])  # field 3, len 2, "xy"
    g = decode_log_group(encode_log_group([log + extra]))
    assert g["logs"][0]["fields"] == {"a": "b"}
    with pytest.raises(ValueError):
        decode_log_group(bytes([0x0A, 0xFF]))  # truncated length


def test_parse_sls_pb_operator(spark):
    blobs = []
    for i in range(3):
        logs = [
            encode_log(1700000000 + i * 10 + j, [("msg", f"m{i}-{j}"), ("lvl", "INFO")])
            for j in range(2)
        ]
        blobs.append(
            (i, encode_log_group(logs, category=f"store{i}", source="10.0.0.1",
                                 tags=[("env", "prod")]))
        )
    blobs.append((9, b"\x99garbage"))  # undecodable -> dropped
    df = spark.createDataFrame(blobs, "blob_id int, payload binary")
    out = parse_sls_pb(df)
    rows = {(r.blob_id, r.log_idx): r for r in out.collect()}
    assert len(rows) == 6
    r = rows[(1, 0)]
    assert r.category == "store1" and r.source == "10.0.0.1"
    assert r.tags == {"env": "prod"} and r.fields == {"msg": "m1-0", "lvl": "INFO"}
    assert r.time == 1700000010 and r.time_ns is None


def test_parse_sls_pb_rejects_colliding_carry_columns(spark):
    import pytest

    df = spark.createDataFrame(
        [("s1", b"\x00")], "source string, payload binary"
    )
    with pytest.raises(ValueError, match="collide"):
        parse_sls_pb(df)


def test_overwide_varint_truncates_like_proto2():
    # a wire-legal 10-byte varint can carry ~2^70; proto2 keeps the low 64
    # bits, and uint32 fields (Log.Time, sls_logs.proto:10) keep the low 32.
    # Before the mask this escaped the per-blob try/except as a Python bigint
    # and crashed the Arrow int64 conversion.
    from loongcollector_spark.operators.slspb import _w_str, decode_log_group

    huge_time = b"\x08" + b"\xff" * 9 + b"\x01"  # field 1 varint, 10 bytes
    # build a Log message: field 1 = huge varint, field 2 = one content kv
    kv = _w_str(1, "k") + _w_str(2, "v")
    log_msg = huge_time + b"\x12" + bytes([len(kv)]) + kv
    blob = b"\x0a" + bytes([len(log_msg)]) + log_msg + _w_str(2, "cat")
    g = decode_log_group(blob)
    assert g["category"] == "cat"
    assert len(g["logs"]) == 1
    t = g["logs"][0]["time"]
    assert 0 <= t <= 0xFFFFFFFF  # truncated into uint32 range, job survives
    assert g["logs"][0]["fields"] == {"k": "v"}
