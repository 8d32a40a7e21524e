"""Token codec: native and pandas decode agree; encode round-trips exactly
(the per-row token-array-equality invariant depends on this)."""

from __future__ import annotations

from pyspark.sql import functions as F

from loongcollector_spark.codec import (
    decode_tokens_native,
    decode_tokens_pandas,
    encode_string_pandas,
)
from loongcollector_spark.oracle import decode as py_decode


def test_native_matches_pandas(seq_df):
    d = seq_df.withColumn("c1", decode_tokens_native("tokens")).withColumn(
        "c2", decode_tokens_pandas(F.col("tokens"))
    )
    assert d.filter(F.col("c1") != F.col("c2")).count() == 0


def test_decode_matches_python(seq_df):
    rows = seq_df.withColumn("c", decode_tokens_native("tokens")).select("tokens", "c").head(50)
    for r in rows:
        assert r["c"] == py_decode(r["tokens"])


def test_round_trip(seq_df):
    d = (
        seq_df.withColumn("c", decode_tokens_native("tokens"))
        .withColumn("t2", encode_string_pandas(F.col("c")))
        .filter(F.col("t2") != F.col("tokens"))
    )
    assert d.count() == 0
