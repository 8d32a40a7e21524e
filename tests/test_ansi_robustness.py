"""One crafted log line must never kill the job: Spark 4 runs ANSI mode by
default, where a plain `.cast()` on malformed/overflowing USER data throws
(CAST_INVALID_INPUT / CAST_OVERFLOW) instead of yielding null. These
regressions pin the try_cast guards on every string→numeric cast that user
payload bytes can reach: apsara epoch times (a 20-digit bracket crashed the
whole stage before the guard), OTLP uint64 nano strings (wire-legal above
2^63-1), metric_multi string values, and log_to_metric's time field whose
×1e9 can overflow long via Infinity.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from loongcollector_spark.operators.enrich import log_to_metric
from loongcollector_spark.operators.metric_multi import to_multi_metric
from loongcollector_spark.operators.otel import otel_trace_parse
from loongcollector_spark.operators.parse import parse_apsara


def test_apsara_oversized_epoch_is_null_time_not_error(spark):
    df = spark.createDataFrame(
        [
            (1, "[99999999999999999999]\tk:v"),     # > long range: threw before
            (2, "[99999999999999]\tk:v"),           # fits long, ×1e6 overflowed
            (3, "[1715829785]\tk:v"),               # sane epoch
            (4, "[253402300799]\tk:v"),             # bound itself (9999-12-31)
            (5, "[253402300800]\tk:v"),             # one past the bound
        ],
        "id int, content string",
    )
    out = {r["id"]: r for r in parse_apsara(df).collect()}
    for bad in (1, 2, 5):
        assert out[bad]["event_time"] is None, bad
        assert "microtime" not in out[bad]["fields"], bad
        assert out[bad]["fields"]["k"] == "v", bad  # kv tail still parses
    assert out[3]["event_time"] is not None
    assert out[3]["fields"]["microtime"] == "1715829785000000"
    assert out[4]["event_time"] is not None
    assert out[4]["fields"]["microtime"] == "253402300799000000"


def test_otlp_trace_uint64_nanos_degrade_to_zero(spark):
    span = {
        "traceId": "0af7651916cd43dd8448eb211c80319c",
        "spanId": "b7ad6b7169203331",
        "name": "op",
        "kind": 2,
        "startTimeUnixNano": "18446744073709551615",  # uint64 max > 2^63-1
        "endTimeUnixNano": "not-a-number",
        "events": [{"timeUnixNano": "99999999999999999999", "name": "e"}],
        "status": {"code": 0},
    }
    payload = json.dumps(
        {"resourceSpans": [{"resource": {}, "scopeSpans": [{"scope": {"name": "s"},
                                                            "spans": [span]}]}]}
    )
    df = spark.createDataFrame([(1, payload)], "id int, content string")
    rows = otel_trace_parse(df).collect()  # must not raise
    assert len(rows) == 1
    r = rows[0].asDict()
    # unconditional: the coalesce(..., 0) contract must hold — a regression to
    # NULL would slip through an isinstance-gated check
    for c in ("start", "end", "duration"):
        assert r[c] == 0, (c, r[c])


def test_multi_metric_non_numeric_value_is_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, "abc", "host1"), (2, "2.5", "host2")], "ts long, v string, host string"
    )
    out = {
        r["time"]: r
        for r in to_multi_metric(
            df, counters={"c": F.col("v")}, gauges={}, tag_cols=["host"], time_col="ts"
        ).collect()
    }
    assert out[1]["values"]["c"]["value"] is None
    assert out[2]["values"]["c"]["value"] == 2.5


def test_log_to_metric_overflowing_time_is_null_not_error(spark):
    df = spark.createDataFrame(
        [(1, {"n": "m1", "v": "2.5", "t": "1e300"}),
         (2, {"n": "m1", "v": "2.5", "t": "1715829785"})],
        "id int, fields map<string,string>",
    )
    out = {
        r["id"]: r
        for r in log_to_metric(
            df, metric_values={"n": "v"}, label_keys=["n"], time_key="t"
        ).collect()
    }
    assert out[1]["__time_nano__"] is None  # Infinity → null, not CAST_OVERFLOW
    assert out[2]["__time_nano__"] == 1715829785 * 10**9
