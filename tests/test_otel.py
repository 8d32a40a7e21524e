"""OTLP trace/metric decode (processor_otel_trace / processor_otel_metric).

Reference: plugins/processor/otel/processor_otel_trace.go:56-130 and
pkg/protocol/decoder/opentelemetry/otlp_trace_parser.go / otlp_metric_parser.go.
"""

from pyspark.sql import functions as F

from loongcollector_spark.operators.otel import (
    OTEL_METRIC_FIXTURE,
    OTEL_TRACE_FIXTURE,
    otel_metric_parse,
    otel_trace_parse,
)


def _trace_df(spark):
    return spark.createDataFrame(OTEL_TRACE_FIXTURE, "doc_id int, content string")


def test_otel_trace_span_rows(spark):
    rows = {r["spanID"]: r for r in otel_trace_parse(_trace_df(spark)).collect()}
    # doc 3 malformed + doc 4 empty resourceSpans → dropped; 4 spans survive
    assert len(rows) == 4
    a = rows["b7ad6b7169203331"]
    assert a["traceID"] == "0af7651916cd43dd8448eb211c80319c"  # lowercased hex
    assert a["parentSpanID"] == "eee19b7ec3c1b174"
    assert (a["host"], a["service"]) == ("node-1", "checkout")
    # host.name/service.name removed from the remainder, keys sorted like
    # Go json.Marshal of a map (otlp_trace_parser.go:61-97)
    assert a["resource"] == '{"debug":"true","env":"prod","replica":"3"}'
    assert (a["otlp_name"], a["otlp_version"]) == ("io.otel.http", "1.19.0")
    assert (a["kind"], a["statusCode"], a["statusMessage"]) == ("server", "OK", "")
    # µs integer division of the uint64 nano fields (:183-194)
    assert (a["start"], a["end"], a["duration"]) == (
        1700000001000000, 1700000001500000, 500000,
    )
    assert a["time"] == 1700000001  # epoch seconds of span end
    assert a["attribute"] == '{"http.method":"GET","http.status_code":"200"}'
    assert a["logs"] == '[{"attribute":{"tier":"l2"},"name":"cache.hit","time":1700000001200000000}]'
    assert a["links"] == (
        '[{"attribute":{"peer":"gw"},"spanID":"f067aa0ba902b7e3",'
        '"traceID":"4bf92f3577b34da6a3ce929d0e0e4736"}]'
    )
    b = rows["00f067aa0ba902b7"]
    assert (b["kind"], b["statusCode"], b["statusMessage"]) == ("client", "ERROR", "card declined")
    assert (b["parentSpanID"], b["links"], b["logs"], b["attribute"]) == ("", "[]", "[]", "{}")
    c = rows["2222222222222222"]
    assert (c["host"], c["service"], c["resource"]) == ("", "", '{"k8s.pod":"p-9"}')
    assert (c["kind"], c["statusCode"]) == ("producer", "UNSET")
    assert rows["3333333333333333"]["kind"] == ""  # unspecified kind


def test_otel_trace_rejects_protobuf(spark):
    import pytest

    with pytest.raises(ValueError):
        otel_trace_parse(_trace_df(spark), fmt="protobuf")


def test_otel_trace_no_python_in_plan(spark):
    plan = (
        otel_trace_parse(_trace_df(spark))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_otel_metric_rows(spark):
    df = spark.createDataFrame(OTEL_METRIC_FIXTURE, "doc_id int, content string")
    rows = otel_metric_parse(df).orderBy("__name__", "__labels__").collect()
    assert [r["__name__"] for r in rows] == ["cpu_usage", "http_requests", "http_requests"]
    g = rows[0]
    # labels = resource attrs + datapoint attrs, sorted, k#$#v|... (MetricLabels)
    assert g["__labels__"] == "core#$#0|region#$#eu-1|service.name#$#checkout"
    assert (g["__time_nano__"], g["__value__"]) == (1700000003500000000, 0.75)
    assert [r["__value__"] for r in rows[1:]] == [42.0, 7.0]  # asInt → double


def test_otel_metric_keeps_passthrough_columns(spark):
    df = spark.createDataFrame(OTEL_METRIC_FIXTURE, "doc_id int, content string").withColumn(
        "route", F.lit("sink_otel")
    )
    out = otel_metric_parse(df)
    assert "route" in out.columns and out.filter(F.col("route") == "sink_otel").count() == 3


def test_otel_duplicate_attr_keys_last_win(spark):
    """OTLP attribute lists may carry duplicate keys; the map build must
    last-win in original list order (Go's map-insert loop), not throw under
    mapKeyDedupPolicy=EXCEPTION."""
    from loongcollector_spark.operators.otel import otel_trace_parse

    payload = (
        '{"resourceSpans":[{"resource":{"attributes":['
        '{"key":"env","value":{"stringValue":"old"}},'
        '{"key":"env","value":{"stringValue":"new"}}]},'
        '"scopeSpans":[{"scope":{"name":"m"},"spans":['
        '{"traceId":"aa","spanId":"bb","name":"s","kind":1,'
        '"startTimeUnixNano":"1","endTimeUnixNano":"2"}]}]}]}'
    )
    df = spark.createDataFrame([(1, payload)], "doc_id int, content string")
    row = otel_trace_parse(df).collect()[0]
    assert row["resource"] == '{"env":"new"}'
