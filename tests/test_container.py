"""Container stdout parsing — fixtures mirror the reference's
ProcessorParseContainerLogNativeUnittest (TestContainerdLog,
TestDockerJsonLogLineParser) corner cases and the MergeLogsByFlag stitch."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401

from loongcollector_spark.operators.container import (
    merge_container_partials,
    parse_container_log,
)

T = "2024-01-05T23:28:06.818486411+08:00"


def test_containerd_corner_cases(spark):
    rows = [
        (1, f"{T} stdout P "),          # tag P + empty content → partial
        (2, f"{T} stdout P"),           # no 3rd space → content "P", NOT partial
        (3, f"{T} stdout "),            # empty content, ok
        (4, f"{T} stdout"),             # no 2nd space → parse fail, keep source
        (5, f"{T}stdout"),              # no 1st space → parse fail
        (6, f"{T} stdout P hello p"),   # partial with content
        (7, f"{T} stderr F full line"), # full tag
        (8, f"{T} stdout PP 1"),        # 2-char tag is content (ref corner case)
        (9, f"{T} badsrc F x"),         # invalid stream → fail, keep
        (10, f"{T} stdout no tag here"),# tagless content
    ]
    df = spark.createDataFrame(rows, "id int, content string")
    out = {r.id: r for r in parse_container_log(df, "containerd").collect()}
    assert (out[1]._time_, out[1].content, out[1].is_partial) == (T, "", True)
    assert (out[2].content, out[2].is_partial) == ("P", False)
    assert (out[3].content, out[3].parse_ok) == ("", True)
    assert (out[4].parse_ok, out[4].content, out[4]._time_) == (False, f"{T} stdout", None)
    assert out[5].parse_ok is False and out[5].content == f"{T}stdout"
    assert (out[6].content, out[6].is_partial) == ("hello p", True)
    assert (out[7]._source_, out[7].content, out[7].is_partial) == ("stderr", "full line", False)
    assert (out[8].content, out[8].is_partial) == ("PP 1", False)
    assert out[9].parse_ok is False and out[9]._source_ is None
    assert out[10].content == "no tag here"


def test_containerd_policies(spark):
    rows = [(1, f"{T} stdout F keep"), (2, f"{T} stderr F err"), (3, "bad line nospace?")]
    df = spark.createDataFrame(rows, "id int, content string")
    # no-second-space is actually 2 spaces here -> invalid stream "line";
    # row 3 fails either way
    assert parse_container_log(df, "containerd", ignoring_stdout=True).count() == 2
    assert parse_container_log(df, "containerd", ignoring_stderr=True).count() == 2
    kept = parse_container_log(df, "containerd", keeping_source=False)
    assert {r.id for r in kept.collect()} == {1, 2}


def test_docker_json_corner_cases(spark):
    rows = [
        (1, '{"log":"Hello \\"W\\"\\n","stream":"stdout","time":"2024-02-19T03:49:37.79Z"}'),
        (2, '{"log1":"x\\n","stream":"stdout","time":"t"}'),      # wrong key → fail
        (3, '{"log":"","stream":"stdout","time":"tt"}'),          # empty log ok
        (4, '{"log":1,"stream":"stdout","time":"t"}'),            # unquoted value → fail
        (5, '{"log":"a\\n","stream":"std","time":"t"}'),          # bad stream → fail
        (6, '{"log":"a\\n","stream":"stdout","time":""}'),        # empty time ok
        (7, "not json"),
        (8, '{"log":"u\\u00e9\\n","stream":"stderr","time":"t"}'),  # \\uXXXX escape
        (9, '{"log":"x\\n","stream":"stdout","time":"t","extra":"k"}'),  # extra key → fail
        (10, '{"time":"tt","log":"reordered\\n","stream":"stdout"}'),    # order-free
    ]
    df = spark.createDataFrame(rows, "id int, content string")
    out = {r.id: r for r in parse_container_log(df, "docker_json").collect()}
    assert (out[1].content, out[1]._source_, out[1]._time_) == (
        'Hello "W"', "stdout", "2024-02-19T03:49:37.79Z"
    )
    for bad in (2, 4, 5, 7, 9):
        assert out[bad].parse_ok is False and out[bad]._time_ is None, bad
        assert out[bad].content == rows[bad - 1][1]  # raw line kept
    assert out[3].content == "" and out[3].parse_ok is True
    assert out[6]._time_ == "" and out[6].content == "a"
    assert out[8].content == "ué" and out[8]._source_ == "stderr"
    assert out[10].content == "reordered"


def test_merge_partials_by_flag(spark):
    # P P notP → one event; lone notP → one event; trailing P-run flushes
    rows = [
        ("c1", 1, "Exce", True),
        ("c1", 2, "ption", True),
        ("c1", 3, " done", False),
        ("c1", 4, "solo", False),
        ("c1", 5, "tail", True),
        ("c2", 1, "other", False),
    ]
    df = spark.createDataFrame(rows, "stream_id string, line_no int, content string, is_partial boolean")
    out = {(r.stream_id, r.event_seq): r for r in merge_container_partials(df).collect()}
    assert out[("c1", 0)].content == "Exception done" and out[("c1", 0)].n_parts == 3
    assert out[("c1", 0)].complete is True and out[("c1", 0)].line_no == 1
    assert out[("c1", 1)].content == "solo"
    assert out[("c1", 2)].content == "tail" and out[("c1", 2)].complete is False
    assert out[("c2", 0)].content == "other"


def test_containerd_parse_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, f"{T} stdout F x")], "id int, content string")
    plan = (
        parse_container_log(df, "containerd")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_merge_partials_carries_leading_row_fields(spark):
    # carried columns (e.g. _time_/_source_ from parse_container_log) must
    # come from the FIRST row of each stitched event — the reference merges
    # into the leading event, which keeps its timestamp and metadata.
    rows = [
        ("c1", 1, "a", True, "t1"),
        ("c1", 2, "b", True, "t2"),
        ("c1", 3, "c", False, "t3"),
        ("c1", 4, "d", False, "t4"),
    ]
    df = spark.createDataFrame(
        rows, "stream_id string, line_no int, content string, is_partial boolean, _time_ string"
    )
    out = {r.event_seq: r for r in merge_container_partials(df).collect()}
    assert out[0].content == "abc" and out[0]._time_ == "t1"
    assert out[1].content == "d" and out[1]._time_ == "t4"


def test_parse_container_rejects_output_column_clash(spark):
    import pytest
    from loongcollector_spark.operators.container import parse_container_log

    df = spark.createDataFrame(
        [(1, True, "2024-01-01T00:00:00Z stdout F hi")],
        "id int, is_partial boolean, content string",
    )
    with pytest.raises(ValueError, match="collide"):
        parse_container_log(df)
