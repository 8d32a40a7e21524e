"""Parser unit fixtures mirroring the reference's unittest semantics
(core/unittest/processor/ProcessorParse*Unittest.cpp test lists): keep/discard
unmatched, key-count behavior, overflow/shorten policies, apsara field
classification, kv anomaly keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from loongcollector_spark.operators import parse as P


def _df(spark, lines: list[str]):
    return spark.createDataFrame([(i, s) for i, s in enumerate(lines)], "id int, content string")


def _fields(df):
    return [r["fields"] for r in df.orderBy("id").select("fields").collect()]


# ---- regex (ProcessorParseRegexNativeUnittest.cpp:31-38 case list) ---------

def test_regex_basic_and_unmatched(spark):
    df = _df(spark, ["127.0.0.1 GET 200", "no match here"])
    out = P.parse_regex(df, r"(\S+) (\S+) (\d+)", ["ip", "method", "status"])
    f = _fields(out)
    assert f[0] == {"ip": "127.0.0.1", "method": "GET", "status": "200"}
    assert f[1] == {"__raw_log__": "no match here"}  # KeepingSourceWhenParseFail
    assert [r[0] for r in out.orderBy("id").select(P.PARSE_OK).collect()] == [True, False]


def test_regex_discard_unmatched(spark):
    df = _df(spark, ["a 1", "nope"])
    out = P.parse_regex(
        df, r"(\w+) (\d+)", ["k", "v"], opts=P.ParserOptions(keep_source_on_fail=False)
    )
    assert out.count() == 1  # ShouldEraseEvent drops the unmatched row


def test_regex_keep_source_on_success(spark):
    df = _df(spark, ["a 1"])
    out = P.parse_regex(
        df, r"(\w+) (\d+)", ["k", "v"], opts=P.ParserOptions(keep_source_on_success=True)
    )
    assert _fields(out)[0] == {"k": "a", "v": "1", "__raw__": "a 1"}


def test_regex_whole_line_shortcircuit(spark):
    df = _df(spark, ["anything at all"])
    out = P.parse_regex(df, "(.*)", ["content2"])
    assert _fields(out)[0] == {"content2": "anything at all"}


def test_regex_full_match_anchoring(spark):
    # boost regex_match is whole-line: a partial match must FAIL
    df = _df(spark, ["prefix 127.0.0.1 suffix"])
    out = P.parse_regex(df, r"(\d+\.\d+\.\d+\.\d+)", ["ip"])
    assert [r[0] for r in out.select(P.PARSE_OK).collect()] == [False]


# ---- json (ProcessorParseJsonNative.cpp:140-202) ----------------------------

def test_json_top_level_stringify(spark):
    df = _df(spark, ['{"a": "x", "n": 42, "f": 0.5, "nested": {"b": 1}, "arr": [1,2]}'])
    f = _fields(P.parse_json(df))[0]
    assert f["a"] == "x"
    assert f["n"] == "42"
    assert f["f"] == "0.5"
    assert f["nested"] == '{"b":1}'
    assert f["arr"] == "[1,2]"


def test_json_failure_paths(spark):
    df = _df(spark, ["[1,2,3]", '{"truncated": ', "not json"])
    out = P.parse_json(df)
    assert [r[0] for r in out.orderBy("id").select(P.PARSE_OK).collect()] == [False, False, False]
    assert _fields(out)[0] == {"__raw_log__": "[1,2,3]"}


# ---- delimiter (ProcessorParseDelimiterNative.cpp:206-409) ------------------

def test_delimiter_exact(spark):
    df = _df(spark, ["a|b|c"])
    assert _fields(P.parse_delimiter(df, ["x", "y", "z"], "|"))[0] == {"x": "a", "y": "b", "z": "c"}


def test_delimiter_overflow_extend(spark):
    df = _df(spark, ["a|b|c|d|e"])
    f = _fields(P.parse_delimiter(df, ["x", "y", "z"], "|", overflow="extend"))[0]
    assert f == {"x": "a", "y": "b", "z": "c", "__column3__": "d", "__column4__": "e"}


def test_delimiter_overflow_keep_glued(spark):
    df = _df(spark, ["a|b|c|d|e"])
    f = _fields(P.parse_delimiter(df, ["x", "y", "z"], "|", overflow="keep"))[0]
    assert f == {"x": "a", "y": "b", "z": "c", "__column3__": "d|e"}


def test_delimiter_shortened(spark):
    df = _df(spark, ["a|b"])
    out_strict = P.parse_delimiter(df, ["x", "y", "z"], "|")
    assert [r[0] for r in out_strict.select(P.PARSE_OK).collect()] == [False]
    f = _fields(P.parse_delimiter(df, ["x", "y", "z"], "|", allow_shortened=True))[0]
    assert f == {"x": "a", "y": "b"}


def test_delimiter_trims_spaces(spark):
    df = _df(spark, [" a | b | c "])
    assert _fields(P.parse_delimiter(df, ["x", "y", "z"], "|"))[0] == {"x": "a", "y": "b", "z": "c"}


def test_delimiter_quoted(spark):
    df = _df(spark, ['a,"b,with,commas",c'])
    f = _fields(P.parse_delimiter(df, ["x", "y", "z"], ",", quote='"'))[0]
    assert f == {"x": "a", "y": "b,with,commas", "z": "c"}


# ---- apsara (ProcessorParseApsaraNativeUnittest.cpp) ------------------------

def test_apsara_full(spark):
    line = "[2024-08-16 12:34:56.123456]\t[ERROR]\t[12345]\t[/src/file.cpp:42]\tk1:v1\tk2:v2"
    df = _df(spark, [line])
    out = P.parse_apsara(df)
    f = _fields(out)[0]
    assert f["__LEVEL__"] == "ERROR"
    assert f["__THREAD__"] == "12345"
    assert f["__FILE__"] == "/src/file.cpp"
    assert f["__LINE__"] == "42"
    assert f["k1"] == "v1" and f["k2"] == "v2"
    assert f["microtime"] == "1723811696123456"
    ts = out.select("event_time").head()[0]
    assert ts.year == 2024 and ts.microsecond == 123456


def test_apsara_epoch_variant(spark):
    df = _df(spark, ["[1722850496]\t[INFO]\t[99]\tmsg:hello"])
    f = _fields(P.parse_apsara(df))[0]
    assert f["microtime"] == "1722850496000000"
    assert f["__LEVEL__"] == "INFO"
    assert f["msg"] == "hello"


def test_apsara_unmatched(spark):
    df = _df(spark, ["no brackets here"])
    out = P.parse_apsara(df)
    assert [r[0] for r in out.select(P.PARSE_OK).collect()] == [False]


# ---- kv (key_value_splitter.go) ---------------------------------------------

def test_kv_basic(spark):
    df = _df(spark, ["class:main\tuser:root\tcode:200"])
    assert _fields(P.split_key_value(df))[0] == {"class": "main", "user": "root", "code": "200"}


def test_kv_anomaly_keys(spark):
    df = _df(spark, ["a:1\t:noname\tjusttoken\t:again\tother"])
    f = _fields(P.split_key_value(df))[0]
    assert f["a"] == "1"
    assert f["empty_key_0"] == "noname"
    assert f["empty_key_1"] == "again"
    assert f["no_separator_key_0"] == "justtoken"
    assert f["no_separator_key_1"] == "other"


def test_kv_value_with_separator(spark):
    # value containing the separator: split on FIRST occurrence only
    df = _df(spark, ["url:http://x/y:z"])
    assert _fields(P.split_key_value(df))[0] == {"url": "http://x/y:z"}


# ---- timestamp ---------------------------------------------------------------

def test_parse_timestamp(spark):
    df = _df(spark, ["ignored"]).withColumn(
        "fields", F.create_map(F.lit("t"), F.lit("2022/07/07 10:43:30"))
    )
    out = P.parse_timestamp(df, "t", "yyyy/MM/dd HH:mm:ss")
    ts = out.select("event_time").head()[0]
    assert (ts.year, ts.month, ts.hour, ts.second) == (2022, 7, 10, 30)


def test_parse_timestamp_discard_old(spark):
    df = spark.createDataFrame(
        [(1, "2019-01-01 00:00:00"), (2, "2023-01-01 00:00:00")], "id int, t string"
    ).withColumn("fields", F.create_map(F.lit("t"), F.col("t")))
    out = P.parse_timestamp(df, "t", "yyyy-MM-dd HH:mm:ss", discard_before="2020-01-01")
    assert [r["id"] for r in out.collect()] == [2]
