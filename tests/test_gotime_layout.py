"""Go reference-layout translation (processor_gotime parity —
plugins/processor/gotime/processor_gotime.go takes Go layouts verbatim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from loongcollector_spark.operators.enrich import gotime
from loongcollector_spark.operators.gotime_layout import (
    go_layout_needs_pad_collapse,
    go_layout_to_spark,
)


def test_layout_translation_table():
    cases = {
        "2006-01-02 15:04:05": "yyyy-MM-dd HH:mm:ss",
        "2006-01-02T15:04:05Z07:00": "yyyy-MM-dd'T'HH:mm:ssXXX",  # RFC3339
        "Mon, 02 Jan 2006 15:04:05 -0700": "EEE, dd MMM yyyy HH:mm:ss xx",  # RFC1123Z
        "Mon Jan _2 15:04:05 2006": "EEE MMM d HH:mm:ss yyyy",  # ANSIC
        "02/Jan/2006:15:04:05 -0700": "dd/MMM/yyyy:HH:mm:ss xx",  # nginx CLF
        "2006-01-02 15:04:05.000": "yyyy-MM-dd HH:mm:ss.SSS",
        "2006-01-02 15:04:05.999999": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
        "3:04PM": "h:mma",
        "January 2, 2006": "MMMM d, yyyy",
        "15:04:05 MST": "HH:mm:ss zzz",
        "06-1-2": "yy-M-d",
        "002 2006": "DDD yyyy",  # day-of-year
    }
    for go, spark_pat in cases.items():
        assert go_layout_to_spark(go) == spark_pat, go
    assert go_layout_needs_pad_collapse("Mon Jan _2 15:04:05 2006")
    assert not go_layout_needs_pad_collapse("2006-01-02")


def test_literal_letters_are_quoted():
    # 'at' would otherwise be parsed as pattern letters by JDK
    assert go_layout_to_spark("2006 at 15:04") == "yyyy 'at' HH:mm"


def test_gotime_go_layout_end_to_end(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-03-09 14:05:06"),
            (2, "2024-12-31 23:59:59"),
            (3, "not a time"),
        ],
        "id int, t string",
    ).withColumn("fields", F.create_map(F.lit("t"), F.col("t")))
    out = gotime(
        df,
        "t",
        "2006-01-02 15:04:05",
        "t_fmt",
        "02/Jan/2006 03:04:05 PM",
        go_layout=True,
        set_time=False,
    )
    got = {r["id"]: r["fields"].get("t_fmt") for r in out.collect()}
    assert got[1] == "09/Mar/2024 02:05:06 PM"
    assert got[2] == "31/Dec/2024 11:59:59 PM"
    assert got[3] is None  # unparseable input leaves no dest key


def test_gotime_go_layout_space_padded_day(spark):
    # Go's ANSIC layout space-pads day: "Mon Mar  9 14:05:06 2024"
    df = spark.createDataFrame(
        [(1, "Sat Mar  9 14:05:06 2024")], "id int, t string"
    ).withColumn("fields", F.create_map(F.lit("t"), F.col("t")))
    out = gotime(
        df,
        "t",
        "Mon Jan _2 15:04:05 2006",
        "iso",
        "2006-01-02T15:04:05",
        go_layout=True,
        set_time=False,
    )
    assert out.collect()[0]["fields"]["iso"] == "2024-03-09T14:05:06"


def test_gotime_go_layout_offset_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "09/Mar/2024:14:05:06 +0100")], "id int, t string"
    ).withColumn("fields", F.create_map(F.lit("t"), F.col("t")))
    out = gotime(
        df,
        "t",
        "02/Jan/2006:15:04:05 -0700",
        "utc",
        "2006-01-02 15:04:05",
        go_layout=True,
        set_time=True,
    )
    row = out.collect()[0]
    assert row["fields"]["utc"] == "2024-03-09 13:05:06"
